"""Query registry: every engine capability exposed as a named query.

Each entry pairs a Spark plan builder ``(spark, sf_dir) -> DataFrame``
with an optional ANSI-SQL oracle string DuckDB can run on the same
parquet tables — the driver's correctness gate (SURVEY §5.1). Ops that
are not SQL-expressible (LSH candidate generation, streaming state)
register with ``oracle=None`` and get rows-only checks.

Parity conventions (Spark vs DuckDB value-hash):
- money/double SUMs  -> ROUND(x, 0) cast BIGINT (fractional rounding of
  doubles diverges between BigDecimal-string and binary rounding)
- AVG / ratios       -> ROUND(x, 6)
- cosine scores      -> ROUND(x, 4)
- timestamps         -> formatted 'yyyy-MM-dd[ HH:mm:ss]' strings
- counts             -> BIGINT both sides
- every computed column aliased identically on both sides
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    headline: bool = False  # included in bench.py's timed set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, doc: str = "", headline: bool = False
):
    """Decorator: add a query builder to the global registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, headline=headline)
        return fn

    return wrap


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so REGISTRY is fully populated."""
    from etl_property_rumah123_spark.plans import (  # noqa: F401
        advanced,
        cleaning_queries,
        listing_queries,
        llm_queries,
        relational,
    )

    return REGISTRY
