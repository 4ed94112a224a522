"""Incremental-OPTIMIZE capacity drill: what the small-file compactor
costs vs the full rewrite it replaces (round 11).

Shape mirrors a streaming-ingest table: one well-sized head commit
plus hundreds of tiny tail appends (the files MoR merges and
micro-batches accrete). Two identical copies are then maintained two
ways — ``optimize_snapshot`` (fold ONLY the tiny files) vs
``compact_snapshot`` (rewrite the whole table) — and the drill
records wall time and bytes rewritten for each. The capacity claim
under test: optimize cost tracks the SMALL-FILE bytes, not the table
size, so it can run on every maintenance cadence at 100 TB where a
full rewrite cannot.

Usage:
    python tools/optimize_drill.py                 # 20M-row head, 300 tail appends
    OPT_HEAD_ROWS=5000000 OPT_TAIL_COMMITS=100 python tools/optimize_drill.py

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

HEAD_ROWS = int(os.environ.get("OPT_HEAD_ROWS", "20000000"))
TAIL_COMMITS = int(os.environ.get("OPT_TAIL_COMMITS", "300"))
TAIL_ROWS = int(os.environ.get("OPT_TAIL_ROWS", "200"))
BASE = os.environ.get("OPT_DIR", "/tmp/optimize_drill")


def _table_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(os.path.join(path, "data")):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    spark = get_spark(
        app_name="optimize-drill",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(BASE, ignore_errors=True)

    # head written as ~175 MB files (well above the 64 MB small-file
    # threshold at the default 128 MB target) — the shape the drill
    # needs: a right-sized head optimize must carry BY REFERENCE
    head = spark.range(HEAD_ROWS).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    ).repartition(8)
    paths = {m: f"{BASE}/{m}" for m in ("optimize", "compact")}
    for p in paths.values():
        table_log.commit_snapshot(head, p)
        for i in range(TAIL_COMMITS):
            lo = HEAD_ROWS + i * TAIL_ROWS
            table_log.commit_snapshot(
                spark.range(lo, lo + TAIL_ROWS)
                .select(
                    F.col("id").alias("k"),
                    F.sha2(F.col("id").cast("string"), 256).alias("pad"),
                )
                .coalesce(1),
                p,
            )

    out: dict = {
        "metric": "optimize_vs_compact",
        "head_rows": HEAD_ROWS,
        "tail_commits": TAIL_COMMITS,
        "table_bytes": _table_bytes(paths["optimize"]),
    }
    n_expected = HEAD_ROWS + TAIL_COMMITS * TAIL_ROWS

    t0 = time.time()
    v = table_log.optimize_snapshot(
        spark, paths["optimize"], target_file_bytes=128 << 20
    )
    out["optimize_sec"] = round(time.time() - t0, 2)
    m = table_log._manifest(spark, paths["optimize"], v)
    out["optimize_rewritten_bytes"] = m["optimized_bytes"]
    out["optimize_files_folded"] = m["optimized_files"]
    out["optimize_files_kept"] = m["kept_files"]
    assert table_log.count_snapshot(spark, paths["optimize"]) == n_expected

    t0 = time.time()
    table_log.compact_snapshot(spark, paths["compact"], target_files=8)
    out["compact_sec"] = round(time.time() - t0, 2)
    out["compact_rewritten_bytes"] = out["table_bytes"]
    assert table_log.count_snapshot(spark, paths["compact"]) == n_expected

    out["wall_ratio"] = round(out["compact_sec"] / max(out["optimize_sec"], 1e-9), 1)
    out["bytes_ratio"] = round(
        out["compact_rewritten_bytes"] / max(out["optimize_rewritten_bytes"], 1), 1
    )
    print(json.dumps(out))
    shutil.rmtree(BASE, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
