"""Capture .explain("formatted") output for registered queries.

Usage:
    python tools/capture_plans.py OUTDIR [SUFFIX] [QUERY ...]

Writes OUTDIR/<query><SUFFIX>.txt (default SUFFIX "") with the
formatted physical plan for each named query (default: the 9 headline
queries) built against $SPARK_GRAFT_SF_DIR (default sf0.1). Plans are
captured pre-execution (AdaptiveSparkPlan isFinalPlan=false) — the
static shape the optimizer chose; the bench measures the runtime.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_property_rumah123_spark.plans import load_all  # noqa: E402
from etl_property_rumah123_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else ""
    registry = load_all()
    names = sys.argv[3:] or [n for n, s in registry.items() if s.headline]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = registry[name]
        df = spec.fn(spark, SF_DIR)
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(formatted_plan(spark, df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
