"""Memory-pressure spill drill (VERDICT r9 task #5): run the heavy
shapes at sf10 under a deliberately undersized heap and record whether
they SPILL (degrade gracefully) or OOM (a scale bug).

Everything else in BASELINE.md is measured on a 128 GiB box with a
16 g local driver heap; nothing there pins the behavior when memory is
tight — which is the property that decides whether a 100 TB run
survives an under-provisioned executor. This drill boots a fresh JVM
with ``SPILL_MEM`` (default 4g — a quarter of the usual heap, shared
by all local[32] task threads), runs the sf10 headline set plus the
shuffle-heavy extras (LSH, star connected components), and reads each
query's spill bytes from the UI REST API (stage metrics:
memoryBytesSpilled / diskBytesSpilled deltas).

Usage:
    python tools/spill_drill.py                       # 4g, /tmp/sf10_synth
    SPILL_MEM=2g SPILL_SF=/tmp/sf1_synth python tools/spill_drill.py

Prints one JSON line; the recorded run lands in BASELINE.md. A query
that OOMs shows outcome="error" with the exception head — that is a
finding, not a tolerable result.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_property_rumah123_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPILL_SF", "/tmp/sf10_synth")
MEM = os.environ.get("SPILL_MEM", "4g")

EXTRA_PARTS = ["components_star_chain"]


def stage_spill(spark) -> tuple[int, int]:
    """Cumulative (memory, disk) spill bytes across all stages so far,
    via the UI REST API (the py4j statusStore surface has Scala
    default-arg signatures that do not cross the bridge cleanly)."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    data = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    mem = sum(s.get("memoryBytesSpilled", 0) for s in data)
    disk = sum(s.get("diskBytesSpilled", 0) for s in data)
    return mem, disk


def main() -> None:
    from etl_property_rumah123_spark.plans import PARTS, load_all

    spark = get_spark(
        app_name="spill_drill",
        extra_conf={
            "spark.driver.memory": MEM,
            "spark.ui.retainedStages": "5000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    specs = {n: s for n, s in registry.items() if s.headline}
    for p in EXTRA_PARTS:
        specs[p] = PARTS[p]

    results: dict[str, dict] = {}
    for name, spec in specs.items():
        t0 = time.perf_counter()
        try:
            m0, d0 = stage_spill(spark)
            spec.fn(spark, SF).write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 2)
            m1, d1 = stage_spill(spark)
            results[name] = {
                "outcome": "ok",
                "wall_sec": wall,
                "spill_mem_mb": round((m1 - m0) / 2**20),
                "spill_disk_mb": round((d1 - d0) / 2**20),
            }
        except Exception as ex:  # noqa: BLE001 — the drill records OOMs
            results[name] = {
                "outcome": "error",
                "wall_sec": round(time.perf_counter() - t0, 2),
                "error": f"{type(ex).__name__}: {ex}"[:300],
            }
            # a dead JVM (GC thrash abort) fails everything after it —
            # record the partial run instead of crashing the drill
            try:
                spark.sparkContext._jsc.sc().isStopped()
            except Exception:
                results[name]["error"] += " [JVM dead; drill aborted]"
                break

    print(
        json.dumps(
            {
                "metric": "spill_drill",
                "sf_dir": SF,
                "driver_memory": MEM,
                "queries": results,
                "n_errors": sum(
                    1 for r in results.values() if r["outcome"] != "ok"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
