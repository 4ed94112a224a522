"""etl_property_rumah123_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ETL pipeline
(rlukafiardi/etl-property-rumah123, a pandas scrape→clean→Postgres
pipeline) as lazy Spark DataFrame plans, plus the query surface and
LLM-data-pipeline operators a 100 TB training-data platform needs.

Public API mirrors the reference's three-function surface
(/root/reference/src/__init__.py:1-3) while everything inside is
Catalyst-compiled DataFrame transformations:

    extract  -> sources.listings (rate-limited paginated source)
    transform -> operators.cleaning.transform_data (pure Column exprs)
    load     -> sinks.jdbc_merge.load_to_postgres (staging + MERGE)
"""

from etl_property_rumah123_spark.session import get_spark
from etl_property_rumah123_spark.operators.cleaning import transform_data
from etl_property_rumah123_spark.sinks.jdbc_merge import load_to_postgres
from etl_property_rumah123_spark.config import (
    extract_config,
    load_config,
    read_config,
)

__all__ = [
    "get_spark",
    "transform_data",
    "load_to_postgres",
    "read_config",
    "extract_config",
    "load_config",
]

__version__ = "0.1.0"
