"""Benchmark harness: time the headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly one JSON line:
  {"metric": "headline_wall_sec", "value": N, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop sink write (full execution,
no driver-side collect — the same action profile a cluster job has).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_property_rumah123_spark.plans import load_all  # noqa: E402
from etl_property_rumah123_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    registry = load_all()
    headline = {n: s for n, s in registry.items() if s.headline}
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query times measure the
    # plan, not first-touch class loading.
    for name, spec in headline.items():
        spec.fn(spark, SF_DIR).limit(1).write.format("noop").mode("overwrite").save()
        break

    timings: dict[str, float] = {}
    for name, spec in headline.items():
        best = float("inf")
        for _ in range(2):  # best-of-2: damps scheduler/GC noise
            t0 = time.perf_counter()
            spec.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "headline_wall_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_of(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
