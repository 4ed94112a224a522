"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query (smoke, sf0.001)
queries()     -> name -> (spark, sf_dir) -> DataFrame, one per operator
                 from SURVEY.md §2 + the LLM-pipeline extension layer
oracle_sql()  -> matching DuckDB-runnable ANSI SQL (omitted for
                 non-SQL-expressible ops -> rows-only check)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_property_rumah123_spark.plans import load_all  # noqa: E402

_REGISTRY = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 3-way join -> agg ->
    top-k shipping-priority revenue (driver checks rows > 0)."""
    return _REGISTRY["q3_shipping_priority"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions)."""
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle
    }
