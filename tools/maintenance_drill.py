"""Lakehouse-maintenance decade drill (round 12, VERDICT #7): the
snapshot log's MAINTENANCE path — MoR delete -> MoR merge ->
incremental OPTIMIZE -> full COMPACT — timed across three decades of
table size, the same evidence regime the query shapes already have
(q3/q5/minhash at sf0.1 -> sf1 -> sf10 -> sf100 in BASELINE.md).

Shape per scale: a streaming-ingest table (right-sized head files +
``TAIL_COMMITS`` tiny tail appends), then:

1. ``delete_snapshot_dv``  — ~1% of rows (k % 97 = 3): scan-bound,
   expected ~linear per decade.
2. ``merge_snapshot_mor``  — a 1% upsert batch (position-DV variant):
   one live-view scan + O(batch) write, expected ~linear.
3. ``optimize_snapshot``   — folds ONLY the tail: expected ~FLAT per
   decade (cost tracks tail bytes, not table size) — this is the op
   whose 100 TB claim the drill exists to check.
4. ``count_snapshot``      — metadata only at every state: expected
   ~flat (driver-side sums + one tiny dv job).
5. ``compact_snapshot``    — the full rewrite optimize replaces:
   expected ~linear; its decade ratio is the denominator that makes
   optimize's flat curve meaningful.

Row counts are verified at every step (a fast drill that corrupts the
table would be worse than a slow one). Prints one JSON line per scale
plus a final ratios line; the recorded run lands in BASELINE.md
(§Round 12).

Usage:
    python tools/maintenance_drill.py                 # 2M / 20M / 200M rows
    MAINT_SCALES=2000000,20000000 python tools/maintenance_drill.py
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

SCALES = [
    int(s)
    for s in os.environ.get(
        "MAINT_SCALES", "2000000,20000000,200000000"
    ).split(",")
]
TAIL_COMMITS = int(os.environ.get("MAINT_TAIL_COMMITS", "50"))
TAIL_ROWS = int(os.environ.get("MAINT_TAIL_ROWS", "200"))
BASE = os.environ.get("MAINT_DIR", "/tmp/maintenance_drill")
#: ~bytes per row of (k bigint, 64-char sha pad) in parquet
ROW_BYTES = 72
TARGET_FILE_BYTES = 160 << 20


def rows_df(spark, lo: int, hi: int, n_files: int | None = None):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    return df.repartition(n_files) if n_files else df.coalesce(1)


def drill(spark, n_rows: int) -> dict:
    path = f"{BASE}/t{n_rows}"
    shutil.rmtree(path, ignore_errors=True)
    out: dict = {"rows": n_rows}

    n_head_files = max(4, (n_rows * ROW_BYTES) // TARGET_FILE_BYTES)
    t0 = time.time()
    table_log.commit_snapshot(
        rows_df(spark, 0, n_rows, n_head_files), path
    )
    for i in range(TAIL_COMMITS):
        lo = n_rows + i * TAIL_ROWS
        table_log.commit_snapshot(
            rows_df(spark, lo, lo + TAIL_ROWS), path, mode="append"
        )
    out["build_s"] = round(time.time() - t0, 2)
    total = n_rows + TAIL_COMMITS * TAIL_ROWS

    def timed(name, f):
        t = time.time()
        r = f()
        out[name] = round(time.time() - t, 2)
        return r

    # 1. MoR delete: ~1% of rows, spread over every head file
    timed("dv_delete_s", lambda: table_log.delete_snapshot_dv(
        spark, path, "k % 97 = 3"
    ))
    live1 = total - (total + 93) // 97  # |{k < total : k % 97 == 3}|

    # 2. MoR merge: 1% upsert batch (existing keys, new payload)
    batch = spark.range(0, n_rows, 100).select(
        F.col("id").alias("k"), F.lit("upserted").alias("pad")
    )
    timed("mor_merge_s", lambda: table_log.merge_snapshot_mor(
        batch, path, key="k"
    ))
    # upserted keys divisible by 100 are never k%97==3 casualties that
    # come back: count = live1 (matched rows re-marked) so live count
    # is unchanged EXCEPT previously-dv-deleted keys in the batch
    # re-enter: k%100==0 and k%97==3 -> k ≡ 9700m+... compute exactly:
    readd = sum(1 for k in range(0, n_rows, 100) if k % 97 == 3)
    live2 = live1 + readd

    # 3. metadata COUNT at the MoR-debt state
    c_meta = timed("count_s", lambda: table_log.count_snapshot(spark, path))
    assert c_meta == live2, (c_meta, live2)

    # 4. incremental OPTIMIZE: folds the tail (+ any small merge files)
    timed("optimize_s", lambda: table_log.optimize_snapshot(spark, path))
    c_opt = table_log.count_snapshot(spark, path)
    assert c_opt == live2, (c_opt, live2)

    # 5. full COMPACT: the rewrite optimize replaces
    timed("compact_s", lambda: table_log.compact_snapshot(
        spark, path, target_files=int(n_head_files)
    ))
    c_cmp = table_log.count_snapshot(spark, path)
    assert c_cmp == live2, (c_cmp, live2)

    out["live_rows"] = live2
    shutil.rmtree(path, ignore_errors=True)
    return out


def main() -> int:
    spark = get_spark(
        app_name="maintenance-drill",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get(
                "MAINT_DRIVER_MEM", "48g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(BASE, exist_ok=True)
    results = []
    for n in SCALES:
        r = drill(spark, n)
        results.append(r)
        print(json.dumps(r), flush=True)
    ratios = {}
    for a, b in zip(results, results[1:]):
        decade = f"{a['rows']}→{b['rows']}"
        ratios[decade] = {
            k: round(b[k] / a[k], 2)
            for k in ("build_s", "dv_delete_s", "mor_merge_s",
                      "count_s", "optimize_s", "compact_s")
            if a.get(k)
        }
    print(json.dumps({"ratios_per_decade": ratios}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
