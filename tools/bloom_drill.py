"""Parquet-bloom point-lookup drill: measure what the ``bloom_cols``
table property buys at scale (round 11).

Correctness and the skip mechanism are test-pinned
(tests/test_sinks.py: leaf-scan numOutputRows collapses under the
bloom); what this drill records is the CAPACITY number: wall-clock and
decoded-row ratio for a needle-in-haystack equality lookup on a
high-NDV, unsorted column — the shape where min/max stats (manifest
AND row-group) prune nothing because every file spans the whole
domain. The same table is committed twice, with and without
``bloom_cols``, from the same rows; the probe value is absent but
mid-domain, so stats alone can never exclude a single row group.

Usage:
    python tools/bloom_drill.py                 # 20M rows
    BLOOM_ROWS=5000000 python tools/bloom_drill.py

Prints one JSON line; the recorded run lands in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_property_rumah123_spark.session import get_spark  # noqa: E402
from etl_property_rumah123_spark.sinks import table_log  # noqa: E402

N_ROWS = int(os.environ.get("BLOOM_ROWS", "20000000"))
BASE = os.environ.get("BLOOM_DIR", "/tmp/bloom_drill")


def _leaf_scan_rows(df) -> int:
    df.collect()
    node = df._jdf.queryExecution().executedPlan()
    while node.children().size() > 0:
        node = node.children().apply(0)
    it = node.metrics().iterator()
    out = {}
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return int(out["numOutputRows"])


def main() -> int:
    spark = get_spark(
        app_name="bloom-drill",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get(
                "BLOOM_DRIVER_MEM", "16g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(BASE, ignore_errors=True)

    # high-NDV unsorted key: sha2 over row id — every file and row
    # group spans ~the full hex domain, exactly the stats-blind shape
    df = spark.range(N_ROWS).select(
        F.col("id"),
        F.sha2(F.col("id").cast("string"), 256).alias("key"),
        (F.col("id") % 97).alias("payload"),
    )
    t_plain, t_bloom = f"{BASE}/plain", f"{BASE}/bloom"
    table_log.commit_snapshot(df, t_plain)
    t0 = time.time()
    table_log.commit_snapshot(df, t_bloom, bloom_cols={"key": N_ROWS // 32})
    bloom_commit_s = round(time.time() - t0, 2)

    absent = "8" * 64  # mid-domain, cannot be excluded by min/max
    results: dict = {
        "metric": "bloom_point_lookup",
        "n_rows": N_ROWS,
        "bloom_commit_sec": bloom_commit_s,
    }
    for tag, path in (("plain", t_plain), ("bloom", t_bloom)):
        probe = table_log.read_snapshot(spark, path).filter(
            F.col("key") == absent
        )
        probe.collect()  # warm page cache for both alike
        t0 = time.time()
        decoded = _leaf_scan_rows(probe)
        results[f"{tag}_lookup_sec"] = round(time.time() - t0, 3)
        results[f"{tag}_decoded_rows"] = decoded
    results["speedup"] = round(
        results["plain_lookup_sec"] / max(results["bloom_lookup_sec"], 1e-9),
        1,
    )
    results["decode_ratio"] = round(
        results["bloom_decoded_rows"] / max(results["plain_decoded_rows"], 1),
        6,
    )
    print(json.dumps(results))
    shutil.rmtree(BASE, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
