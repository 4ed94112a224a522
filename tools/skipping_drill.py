"""Data-skipping effectiveness drill: measure the manifest min/max
pruning RATIO at scale (VERDICT r9 task #6).

Correctness of pruning is hash-pinned (plans/advanced.py:
snapshot_scan_pruning — 3 files committed, 1 scanned); what this drill
records is the EFFECTIVENESS number a 100 TB capacity plan needs:
files-scanned / files-total for a selective predicate over a
realistically ingested table, plus the wall-clock delta against the
same query WITHOUT manifest skipping (plain filter over a full read —
parquet row-group stats still apply, so the delta isolates what the
manifest tier adds on top of parquet's own).

Setup mirrors incremental ingest: orders arrives in per-quarter
commits, then one quarter is read back TWO ways — by a numeric
yyyymmdd date key (the classic int-date pattern) and, since round 10,
by a NATIVE timestamp predicate directly on o_orderdate (footer stats
record INT64-micros timestamps; the engine session writes
TIMESTAMP_MICROS instead of stats-less INT96).

Usage:
    python tools/skipping_drill.py               # /tmp/sf10_synth
    SKIP_SF=/root/testdata/sf0.1 python tools/skipping_drill.py

Prints one JSON line; the recorded run lands in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_property_rumah123_spark.operators.common import scratch_base  # noqa: E402
from etl_property_rumah123_spark.session import get_spark  # noqa: E402
from etl_property_rumah123_spark.sinks import table_log  # noqa: E402
from etl_property_rumah123_spark.sources.catalog import table  # noqa: E402

SF = os.environ.get("SKIP_SF", "/tmp/sf10_synth")


def main() -> None:
    spark = get_spark(app_name="skipping_drill")
    spark.sparkContext.setLogLevel("ERROR")

    orders = table(spark, SF, "orders").withColumn(
        "date_int",
        (
            F.year("o_orderdate") * 10000
            + F.month("o_orderdate") * 100
            + F.dayofmonth("o_orderdate")
        ).cast("long"),
    )
    # quarter band id: the ingest grain (one commit per quarter)
    banded = orders.withColumn(
        "band",
        (F.year("o_orderdate") - 1995) * 4 + (F.quarter("o_orderdate") - 1),
    )
    bands = sorted(
        r[0] for r in banded.select("band").distinct().collect()
    )

    tdir = f"{scratch_base()}/skipping_drill"
    jvm, fs = table_log._fs(spark, tdir)
    fs.delete(jvm.org.apache.hadoop.fs.Path(tdir), True)

    t0 = time.perf_counter()
    for b in bands:
        table_log.commit_snapshot(
            banded.filter(F.col("band") == b).drop("band"),
            tdir,
            mode="append",
        )
    build_sec = time.perf_counter() - t0

    files_total = len(table_log.read_snapshot(spark, tdir).inputFiles())

    # one mid-range quarter: 1998 Q2
    lo, hi = 19980401, 19980630
    preds = [("date_int", ">=", lo), ("date_int", "<=", hi)]

    def run(df) -> tuple[float, int]:
        t = time.perf_counter()
        n = df.count()
        return time.perf_counter() - t, n

    # warm both paths once, then time
    pruned_df = table_log.read_snapshot(spark, tdir, predicates=preds).filter(
        (F.col("date_int") >= lo) & (F.col("date_int") <= hi)
    )
    unpruned_df = table_log.read_snapshot(spark, tdir).filter(
        (F.col("date_int") >= lo) & (F.col("date_int") <= hi)
    )
    run(pruned_df), run(unpruned_df)
    pruned_sec, n_pruned = run(pruned_df)
    unpruned_sec, n_unpruned = run(unpruned_df)
    assert n_pruned == n_unpruned, (n_pruned, n_unpruned)

    files_scanned = len(
        table_log.read_snapshot(spark, tdir, predicates=preds).inputFiles()
    )
    # native timestamp predicate over the same quarter (round 10)
    import datetime as dt

    ts_preds = [
        ("o_orderdate", ">=", dt.datetime(1998, 4, 1)),
        ("o_orderdate", "<", dt.datetime(1998, 7, 1)),
    ]
    ts_df = table_log.read_snapshot(spark, tdir, predicates=ts_preds)
    ts_files = len(ts_df.inputFiles())
    n_ts = ts_df.count()
    assert n_ts == n_pruned, (n_ts, n_pruned)
    out = {
        "metric": "data_skipping_ratio",
        "sf_dir": SF,
        "n_commits": len(bands),
        "files_total": files_total,
        "files_scanned": files_scanned,
        "files_scanned_ts_pred": ts_files,
        "skip_ratio": round(1 - files_scanned / files_total, 4),
        "rows_selected": n_pruned,
        "pruned_sec": round(pruned_sec, 3),
        "unpruned_sec": round(unpruned_sec, 3),
        "speedup": round(unpruned_sec / pruned_sec, 2) if pruned_sec else -1,
        "build_sec": round(build_sec, 1),
    }
    fs.delete(jvm.org.apache.hadoop.fs.Path(tdir), True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
