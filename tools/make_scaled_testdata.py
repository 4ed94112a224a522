"""Synthesize a larger scale factor from an existing testdata dir by
replicating each table K times with key offsets — for THROUGHPUT
measurement beyond the largest generated SF (the driver provides up to
sf0.1; this builds a ~sf1 equivalent).

Key handling: every primary/foreign key family shifts by
``copy * (max_key + 1)`` so joins keep their original fan-out (copy i
of orders joins copy i of lineitem/customer); dimension tables
(region/nation/part/supplier) are NOT replicated — exactly how real
star schemas scale (facts grow, dims don't), which also preserves the
broadcast-ability the plans rely on. Content columns are left verbatim
by default: the result is valid for timing relational/join/window/text
plans, NOT for dedup timing (10x replication makes every doc a 10-way
near-dup — the PAIR OUTPUT then grows quadratically within each family,
which measures the data artifact, not the engine). ``--perturb``
appends a copy-unique token to each replicated document text, breaking
the artificial dup families so dedup queries scale like a real corpus
that grew 10x.

Usage:
    python tools/make_scaled_testdata.py [src_dir] [dst_dir] [k] [--perturb]
Defaults: /root/testdata/sf0.1 -> /tmp/sf1_synth, k=10.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_property_rumah123_spark.session import get_spark  # noqa: E402
from etl_property_rumah123_spark.sources.catalog import table  # noqa: E402

# table -> columns sharing each key family's offset
KEY_FAMILIES = {
    "custkey": {"customer": ["c_custkey"], "orders": ["o_custkey"]},
    "orderkey": {"orders": ["o_orderkey"], "lineitem": ["l_orderkey"]},
    "event": {"events": ["event_id"]},
    "user": {"events": ["user_id"]},
    "doc": {"documents": ["doc_id"]},
    "vec": {"embeddings": ["vec_id"]},
}
REPLICATED = ["customer", "orders", "lineitem", "events", "documents", "embeddings"]
DIMS = ["region", "nation", "part", "supplier"]


def main(src: str, dst: str, k: int, perturb: bool = False) -> None:
    spark = get_spark(app_name="make-scaled-testdata")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    # one pass to learn each family's stride
    strides: dict[str, int] = {}
    for fam, tabs in KEY_FAMILIES.items():
        tname, cols = next(iter(tabs.items()))
        strides[fam] = (
            table(spark, src, tname).agg(F.max(cols[0])).collect()[0][0] + 1
        )

    for t in DIMS:
        table(spark, src, t).write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet")
        )
        print("copied dim", t, flush=True)

    for t in REPLICATED:
        base = table(spark, src, t)
        shifted = []
        for i in range(k):
            df = base
            for fam, tabs in KEY_FAMILIES.items():
                for col in tabs.get(t, []):
                    df = df.withColumn(col, F.col(col) + F.lit(i * strides[fam]))
            if perturb and t == "documents" and i > 0:
                # copy-unique tokens INTERLEAVED every 3 words (the
                # dedup shingle width), not just suffixed: a lone
                # suffix leaves ~all word-3-gram shingles identical
                # across the k copies of a base doc, so at k=1000 the
                # MinHash bands still bucket whole 1000-copy families
                # and the candidate join measures the replication
                # artifact (quadratic in k), not the engine. Weaving a
                # copy-unique token through the text breaks ~2/3 of
                # shingles per copy -> Jaccard ~0.2 between copies ->
                # families split, like a corpus that truly grew k-fold.
                tok = F.concat(
                    F.lit(f" c{i}x"), F.col("doc_id").cast("string")
                )
                df = df.withColumn(
                    "text",
                    F.concat(
                        F.regexp_replace(
                            F.coalesce(F.col("text"), F.lit("")),
                            F.lit(r"((?:\S+\s+){3})"),
                            F.concat(F.lit("$1"), tok, F.lit(" ")),
                        ),
                        tok,
                    ),
                )
            shifted.append(df)
        out = shifted[0]
        for df in shifted[1:]:
            out = out.unionByName(df)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{t}.parquet"))
        print(f"replicated {t} x{k}", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--perturb"]
    perturb = "--perturb" in sys.argv[1:]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    dst = args[1] if len(args) > 1 else "/tmp/sf1_synth"
    k = int(args[2]) if len(args) > 2 else 10
    main(src, dst, k, perturb=perturb)
