"""ANN-index lifecycle decade drill (round 13, VERDICT #7): the
persisted IVF index's MAINTENANCE loop — build -> append -> probe ->
drift -> rebalance -> vacuum — timed across three decades of corpus
size (2M -> 20M -> 200M vectors), the same evidence regime the table
maintenance ops got in round 12 (tools/maintenance_drill.py) and the
query shapes have in BASELINE.md.

Expected shapes (fixed n_lists so per-op cost tracks data only):

1. ``write_ann_index``   — one corpus pass + one cell-layout shuffle:
   expected ~linear per decade.
2. ``append_ann_index``  — a 1% batch against frozen centroids:
   O(batch) assign + write, expected ~FLAT per decade (the design
   point: ingest cost independent of index size).
3. ``probe_ann_index``   — a 64-query batch, n_probe=2: reads
   ~n_probe/n_lists of the index via manifest cell-stats pruning,
   expected ~linear (probed bytes scale with the index).
4. ``ann_index_drift``   — sidecar + journal metadata: expected ~flat.
5. ``rebalance_ann_index`` — one pass over the index's own vectors
   (re-fit + re-assign + rewrite): expected ~linear; this is the op
   whose 100 TB claim the drill exists to check (its _cell_layout
   shuffle and single-pass re-assign are the super-linearity
   candidates named in the round-12 verdict).
6. ``vacuum`` (cells_log) + ``vacuum_ann_index`` — manifest-driven
   retention: expected ~flat.

Structural counts are asserted at every step (a fast drill that
corrupts the index would be worse than a slow one): exact n_vectors
through build/append/rebalance, k results per probe query, and the
old centroid generation actually dropped by the vacuum pair.

Vectors are generated JVM-side (xxhash64-derived doubles, no Python in
the data path); uniform vectors defeat ANN *recall* (see
tests/test_similarity_recall.py for the clustered recall anchors) but
time the data path exactly.

Usage:
    python tools/ann_drill.py                      # 2M / 20M / 200M
    ANN_SCALES=2000000,20000000 python tools/ann_drill.py
    ANN_TRANSACTIONAL=0 python tools/ann_drill.py  # plain-dir variant
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_property_rumah123_spark.operators import similarity  # noqa: E402
from etl_property_rumah123_spark.session import get_spark  # noqa: E402
from etl_property_rumah123_spark.sinks import table_log  # noqa: E402

SCALES = [
    int(s)
    for s in os.environ.get(
        "ANN_SCALES", "2000000,20000000,200000000"
    ).split(",")
]
DIM = int(os.environ.get("ANN_DIM", "16"))
N_LISTS = int(os.environ.get("ANN_LISTS", "64"))
TRANSACTIONAL = os.environ.get("ANN_TRANSACTIONAL", "1") == "1"
BASE = os.environ.get("ANN_DIR", "/tmp/ann_drill")


def vec_df(spark, lo: int, hi: int):
    """(vec_id, embedding[DIM]) generated entirely JVM-side: each
    component is an xxhash64 of (id, j) scaled to [0, 1)."""
    comps = [
        (
            F.pmod(
                F.xxhash64(F.col("id"), F.lit(j)), F.lit(1_000_000)
            ).cast("double")
            / 1_000_000.0
        )
        for j in range(DIM)
    ]
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )


def drill(spark, n: int) -> dict:
    path = f"{BASE}/idx{n}"
    shutil.rmtree(path, ignore_errors=True)
    out: dict = {"vectors": n, "transactional": TRANSACTIONAL}

    def timed(name, f):
        t = time.time()
        r = f()
        out[name] = round(time.time() - t, 2)
        return r

    built = timed("build_s", lambda: similarity.write_ann_index(
        vec_df(spark, 0, n), path, n_lists=N_LISTS,
        transactional=TRANSACTIONAL,
    ))
    assert built["n_vectors"] == n, built

    batch = max(1, n // 100)
    appended = timed("append_s", lambda: similarity.append_ann_index(
        vec_df(spark, n, n + batch), path
    ))
    assert appended["n_appended"] == batch, appended

    queries = vec_df(spark, 10_000_000_000, 10_000_000_064)
    probed = timed("probe_s", lambda: similarity.probe_ann_index(
        queries, path, k=10, n_probe=2
    ).groupBy("query_id").count().collect())
    assert len(probed) == 64 and all(r["count"] == 10 for r in probed)

    drift = timed("drift_s", lambda: similarity.ann_index_drift(
        spark, path
    ))
    assert drift["appended_n"] == batch, drift

    rebal = timed("rebalance_s", lambda: similarity.rebalance_ann_index(
        spark, path
    ))
    assert rebal["n_vectors"] == n + batch, rebal

    def vac():
        dropped = []
        if TRANSACTIONAL:
            table_log.vacuum(
                spark, f"{path}/cells_log", keep_last=1, min_age_s=0
            )
        dropped = similarity.vacuum_ann_index(spark, path)
        return dropped

    dropped = timed("vacuum_s", vac)
    assert f"{path}/centroids" in dropped, dropped  # old gen retired

    # post-maintenance probe answers against the rebalanced quantizer
    probed2 = similarity.probe_ann_index(
        queries, path, k=10, n_probe=2
    ).groupBy("query_id").count().collect()
    assert len(probed2) == 64 and all(r["count"] == 10 for r in probed2)

    shutil.rmtree(path, ignore_errors=True)
    return out


def main() -> int:
    spark = get_spark(
        app_name="ann-drill",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("ANN_DRIVER_MEM", "48g"),
            # the 200M scale shuffles ~25 GB per assignment pass; the
            # default 30-min periodic GC leaves the previous pass's
            # shuffle files on disk long enough to overlap the next
            # one and exhaust /tmp — collect dead shuffles promptly
            "spark.cleaner.periodicGC.interval": "90s",
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
        decade = f"{a['vectors']}→{b['vectors']}"
        # a flat metadata op can round to 0.0 s at the small decade —
        # emit null rather than dropping the key (a dropped key would
        # hide exactly the op whose flat-shape claim the drill checks)
        ratios[decade] = {
            k: (round(b[k] / a[k], 2) if a.get(k) else None)
            for k in ("build_s", "append_s", "probe_s", "drift_s",
                      "rebalance_s", "vacuum_s")
            if k in a and k in b
        }
    print(json.dumps({"ratios_per_decade": ratios}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
