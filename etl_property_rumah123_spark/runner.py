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
    assert_unique_key: bool = False,
    pg_dsn: str | None = None,
) -> int:
    """extract >> transform >> load for one region, as one lazy plan
    (the reference's 4-task chain, /root/reference/dags/dags.py:136-143,
    without the CSV/XCom handoffs). Returns fresh-insert count, or -1
    when no sink is configured (dry runs / tests).

    ``assert_unique_key`` replays the guarantee the reference got from
    its PRIMARY KEY (init.sql:2): after transform, any duplicate
    ``unique_key`` fails the run BEFORE the sink — where the reference
    would have failed mid-insert. Off by default (T2 dedup makes
    in-run duplicates impossible by construction; the check is one
    extra shuffle of the key column, turn it on when the source is
    untrusted)."""
    raw = extract_region(spark, cfg, region, source_options)
    clean = transform_data(raw)
    if assert_unique_key:
        from etl_property_rumah123_spark.operators.profiling import check_unique

        dup = check_unique(clean, [load_cfg.unique_key]).limit(1).collect()
        if dup:
            raise ValueError(
                f"duplicate {load_cfg.unique_key} after transform: "
                f"{dup[0][load_cfg.unique_key]!r} x{dup[0]['n_rows']}"
            )
    if stage_dir and run_date:
        # optional debug checkpoint, the CSV-handoff observability analog
        writers.save_parquet(clean, f"listings_{region.name}", stage_dir, run_date)
    if pg_dsn:
        # wire-protocol path: real Postgres with no JDBC jar/psycopg2
        # (sinks/pgwire.py) — per-partition staged inserts + the
        # driver-transaction merge with xmax accounting
        from etl_property_rumah123_spark.sinks.pgwire import (
            load_to_postgres_wire,
        )
        from etl_property_rumah123_spark.sinks.writers import (
            _stringify_arrays,
        )

        # array<string> -> JSON text at the VARCHAR sink boundary
        # (SURVEY §1.4: arrays stay native in-engine, render at sinks)
        return load_to_postgres_wire(
            _stringify_arrays(clean),
            pg_dsn,
            load_cfg.stg_table,
            load_cfg.main_table,
            load_cfg.unique_key,
            batch_size=load_cfg.batch_size,
        )
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


def main(argv: list[str] | None = None) -> int:
    """Operational entry — the reference's Airflow-DAG surface as a
    submit-able command:

        spark-submit [...] -m etl_property_rumah123_spark.runner \\
            --extract-config configs/extract.yaml \\
            --load-config configs/load.yaml \\
            [--region jakarta ...] [--dry-run] [--stage-dir DIR] \\
            [--run-date YYYYMMDD] [--source-option k=v ...]

    One invocation per schedule tick (cron/Airflow own the cadence,
    exactly like the reference's per-region DAGs); each selected
    region runs its own isolated lazy plan. Without --jdbc-url the run
    is a dry run (extract+transform only, optional staged Parquet).
    Returns a process exit code: 0 on success.
    """
    import argparse

    from etl_property_rumah123_spark.config import (
        extract_config,
        load_config,
        read_config,
    )
    from etl_property_rumah123_spark.session import get_spark

    ap = argparse.ArgumentParser(prog="etl_property_rumah123_spark.runner")
    ap.add_argument("--extract-config", required=True)
    ap.add_argument("--load-config", required=True)
    ap.add_argument(
        "--region", action="append", default=None,
        help="region name(s) to run; default: all configured regions",
    )
    ap.add_argument("--jdbc-url", default=None)
    ap.add_argument(
        "--pg-dsn", default=None,
        help="Postgres unix-socket dir or host:port for the built-in "
        "wire-protocol sink (no JDBC jar/psycopg2 required)",
    )
    ap.add_argument("--stage-dir", default=None)
    ap.add_argument("--run-date", default=None, help="YYYYMMDD, injected (O3)")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument(
        "--source-option", action="append", default=[], metavar="K=V",
        help="reader options (e.g. fixture_dir=..., base_sleep=0.5)",
    )
    args = ap.parse_args(argv)

    cfg = extract_config(read_config(args.extract_config))
    lc = load_config(read_config(args.load_config))
    opts = dict(kv.split("=", 1) for kv in args.source_option)
    wanted = set(args.region) if args.region else None
    regions = [r for r in cfg.regions if wanted is None or r.name in wanted]
    if wanted and len(regions) != len(wanted):
        missing = wanted - {r.name for r in regions}
        ap.error(f"unknown region(s): {sorted(missing)}")

    connection_factory = None
    if args.jdbc_url and not args.dry_run:
        import psycopg2  # deferred: not needed for dry runs

        def connection_factory():
            return psycopg2.connect(args.jdbc_url)

    # get_spark is getOrCreate: only stop a session WE created, so an
    # embedding host's (or test harness's) session survives main().
    preexisting = SparkSession.getActiveSession()
    spark = get_spark(app_name="rumah123-runner")
    try:
        for region in regions:
            rc = run_region_pipeline(
                spark,
                cfg,
                lc,
                region,
                jdbc_url=args.jdbc_url if not args.dry_run else None,
                connection_factory=connection_factory,
                stage_dir=args.stage_dir,
                run_date=args.run_date,
                source_options=opts or None,
                pg_dsn=args.pg_dsn if not args.dry_run else None,
            )
            logger.info("region %s -> %s", region.name, rc)
    finally:
        if preexisting is None:
            spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
