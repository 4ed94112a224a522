"""Custom aggregation / table-function surface: the two extension
points Spark offers beyond built-in expressions, each used where the
built-ins genuinely cannot express the semantics.

- ``applyInPandas`` grouped aggregation (UDAF shape): arbitrary
  per-group reductions with Arrow-batched pandas. Used for median
  absolute deviation — order statistics of order statistics, which no
  built-in aggregate composes. Scale: one hash shuffle on the group
  key (same as any groupBy); each group must fit in one worker's
  memory — fine for per-segment stats, wrong for power-law keys
  (those want the salted two-phase pattern in plans/advanced.py).
- Python UDTF (Spark 4): one row in, many typed rows out, when the
  expansion logic needs imperative code. Used for sentence expansion
  with per-sentence stats. (Pure splits should stay
  explode(split(...)) — see posexplode_embedding_head; the UDTF is
  the escape hatch, not the default.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_SCHEMA = "c_mktsegment string, n bigint, median double, mad double"


def _mad_kernel(pdf):
    import pandas as pd

    x = pdf["c_acctbal"]
    med = x.median()
    return pd.DataFrame(
        {
            "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
            "n": [len(x)],
            "median": [med],
            "mad": [(x - med).abs().median()],
        }
    )


def mad_by_group(
    df: DataFrame, group_col: str = "c_mktsegment", value_col: str = "c_acctbal"
) -> DataFrame:
    """Median absolute deviation per group via applyInPandas."""
    return (
        df.select(group_col, value_col)
        .groupBy(group_col)
        .applyInPandas(_mad_kernel, schema=MAD_SCHEMA)
    )


def sentence_udtf():
    """Python UDTF: text -> (sentence_idx, sentence, n_words) rows.

    Built lazily (the decorator needs an active session on some
    codepaths); returns the udtf object ready for registration or
    direct DataFrame use.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_idx int, sentence string, n_words int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, raw in enumerate(text.split(". ")):
                s = raw.strip().rstrip(".")
                if s:
                    yield i, s, len(s.split())

    return SentenceSplit


def split_sentences(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Lateral-join the sentence UDTF against a document table."""
    SentenceSplit = sentence_udtf()
    return df.lateralJoin(
        SentenceSplit(F.col(text_col).outer())
    ).select(id_col, "sentence_idx", "sentence", "n_words")
