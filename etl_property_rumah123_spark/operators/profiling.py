"""Dataset profiling: per-column statistics in ONE scan per table.

The data-quality gate every training-data pipeline runs before/after
ingest: row counts, null counts, distinct cardinalities, ranges. The
implementation computes ALL columns' aggregates in a single groupless
aggregation (one scan, map-side partial combine) and then reshapes the
one-row result to long format with ``stack`` — no per-column re-scan,
which is the difference between one pass and #columns passes at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, table_name: str, columns: dict[str, str]
) -> DataFrame:
    """Profile ``columns`` (name -> 'numeric' | 'string') of ``df``.

    Output (one row per column):
      col, n_rows, n_null, n_distinct (nulls excluded),
      min_s/max_s (string columns), min_v/max_v (numeric, rounded 6).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in columns.items():
        aggs.append(F.count(c).alias(f"__c_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__d_{c}"))
        if kind == "string":
            aggs.append(F.min(c).alias(f"__mn_{c}"))
            aggs.append(F.max(c).alias(f"__mx_{c}"))
        else:
            aggs.append(F.round(F.min(F.col(c).cast("double")), 6).alias(f"__mn_{c}"))
            aggs.append(F.round(F.max(F.col(c).cast("double")), 6).alias(f"__mx_{c}"))
    one = df.agg(*aggs)

    groups = []
    for c, kind in columns.items():
        vals = [
            f"'{table_name}.{c}'",
            "CAST(n_rows AS BIGINT)",
            f"CAST(n_rows - __c_{c} AS BIGINT)",
            f"CAST(__d_{c} AS BIGINT)",
        ]
        if kind == "string":
            vals += [f"__mn_{c}", f"__mx_{c}",
                     "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"]
        else:
            vals += ["CAST(NULL AS STRING)", "CAST(NULL AS STRING)",
                     f"__mn_{c}", f"__mx_{c}"]
        groups.append(", ".join(vals))
    stack = (
        f"stack({len(columns)}, {', '.join(groups)}) AS "
        "(col, n_rows, n_null, n_distinct, min_s, max_s, min_v, max_v)"
    )
    return one.select(F.expr(stack))
