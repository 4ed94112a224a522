"""Pipeline runner (ops U2, O1-O3): the per-region extract ->
transform -> load composition as ONE lazy plan per region.

Replaces the reference's Airflow DAG factory + 4-task chain with CSV
handoffs (/root/reference/dags/dags.py:40-149): Catalyst pipelines the
stages, so the only materialization is at the sink; optional dated
Parquet checkpoints (``stage_dir``) keep the debuggability the CSV
files provided. Scheduling (the cron in configs) stays an orchestrator
concern — run this module from cron / Airflow SparkSubmitOperator /
anything that can invoke Python; task retry is safe because the sink
is an idempotent staged merge (sinks/jdbc_merge.py).

Region fan-out (op U2): each region keeps its own isolated plan
(matching the reference's one-DAG-per-region isolation) but
``extract_all_regions`` also offers the union-with-region-column form,
which at scale is usually better — one job, region as a partition
column, partition pruning on read.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_property_rumah123_spark.config import ExtractConfig, LoadConfig, RegionConfig
from etl_property_rumah123_spark.operators.cleaning import transform_data
from etl_property_rumah123_spark.operators.listing_parse import parse_cards
from etl_property_rumah123_spark.sinks import jdbc_merge, writers
from etl_property_rumah123_spark.sources.listing_source import ListingDataSource

logger = logging.getLogger(__name__)


def extract_region(
    spark: SparkSession,
    cfg: ExtractConfig,
    region: RegionConfig,
    source_options: dict[str, str] | None = None,
) -> DataFrame:
    """One region's raw listings: rumah123_listings source -> card
    parse. Returns RAW_LISTING_SCHEMA + no region column (matching
    extract_data's output, /root/reference/src/extract.py:119-201)."""
    try:
        spark.dataSource.register(ListingDataSource)
    except Exception:
        pass  # already registered
    reader = (
        spark.read.format("rumah123_listings")
        .option("ads_type", cfg.ads_type)
        .option("region", region.id)
        .option("property_type", cfg.property_type)
        .option("num_pages", str(cfg.num_pages))
    )
    for k, v in (source_options or {}).items():
        reader = reader.option(k, v)
    return parse_cards(reader.load(), region.admins)


def extract_all_regions(
    spark: SparkSession,
    cfg: ExtractConfig,
    source_options: dict[str, str] | None = None,
) -> DataFrame:
    """Op U2 as one plan: per-region reads unioned by name with a
    ``region`` literal column — the Spark-idiomatic fan-out (partition
    pruning + one shuffle budget instead of six jobs)."""
    frames = [
        extract_region(spark, cfg, region, source_options).withColumn(
            "region", F.lit(region.name)
        )
        for region in cfg.regions
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def run_region_pipeline(
    spark: SparkSession,
    cfg: ExtractConfig,
    load_cfg: LoadConfig,
    region: RegionConfig,
    jdbc_url: str | None = None,
    connection_factory: Callable | None = None,
    stage_dir: str | None = None,
    run_date: str | None = None,
    source_options: dict[str, str] | None = None,
) -> int:
    """extract >> transform >> load for one region, as one lazy plan
    (the reference's 4-task chain, /root/reference/dags/dags.py:136-143,
    without the CSV/XCom handoffs). Returns fresh-insert count, or -1
    when no sink is configured (dry runs / tests)."""
    raw = extract_region(spark, cfg, region, source_options)
    clean = transform_data(raw)
    if stage_dir and run_date:
        # optional debug checkpoint, the CSV-handoff observability analog
        writers.save_parquet(clean, f"listings_{region.name}", stage_dir, run_date)
    if jdbc_url and connection_factory:
        return jdbc_merge.load_to_postgres(
            clean,
            jdbc_url,
            connection_factory,
            load_cfg.stg_table,
            load_cfg.main_table,
            load_cfg.unique_key,
            batch_size=load_cfg.batch_size,
        )
    logger.info("dry run for region %s: %d clean rows", region.name, clean.count())
    return -1
