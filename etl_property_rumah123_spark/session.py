"""SparkSession factory tuned for the engine.

Defaults are chosen for correctness-portability first (operators never
depend on session config — permissive casts are expressed with
``try_cast`` and friends), and for scale second:

- AQE on: runtime shuffle coalescing, skew-join splitting, and
  broadcast-join demotion/promotion are the main levers that let the
  same lazy plan run at sf0.001 and at 100 TB.
- Arrow on: every Pandas-UDF boundary (multimodal decode, custom
  stateful ops) moves columnar batches, not pickled rows.
- ``spark.sql.shuffle.partitions`` is only a local-mode default; on a
  real cluster AQE coalescing makes the initial number mostly
  irrelevant as long as it is not too small.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Local mode runs every executor thread inside the driver JVM, so Spark's
# 1g driver-heap default is ~32 MB per concurrent task at local[32] —
# enough for sf0.1, OOM at sf1. Sized here because the factory owns the
# local JVM; under spark-submit the JVM is already up and this is a no-op.
DEFAULT_LOCAL_DRIVER_MEMORY = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")


def cluster_profile(path: str | None = None) -> dict[str, str]:
    """Load the production cluster conf (configs/cluster.yaml) as a
    flat {spark key: value} dict — the documented 1000-executor /
    100 TB profile. Pass the result as ``extra_conf`` (or use
    ``get_spark(profile="cluster")``); keys the environment already
    pins (e.g. under spark-submit --conf) win because they are applied
    by the launcher, not the builder."""
    from etl_property_rumah123_spark.config import read_config

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs",
            "cluster.yaml",
        )
    return {str(k): str(v) for k, v in read_config(path).items()}


def get_spark(
    app_name: str = "etl-property-rumah123-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    profile: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when not
    attached to a cluster; pass an explicit master / leave None under
    spark-submit. ``profile="cluster"`` layers configs/cluster.yaml
    (the 1000-executor / 100 TB conf) under ``extra_conf``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Non-ANSI keeps CAST coerce-to-null semantics matching the
        # reference's pd.to_numeric(errors='coerce')
        # (/root/reference/src/transform.py:65). Operators still use
        # try_cast explicitly so they stay correct under ANSI sessions.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # INT64 micros instead of the legacy INT96: INT96 timestamps
        # carry NO parquet statistics, so snapshot tables written with
        # them can never prune on a timestamp predicate (the footer-
        # based manifest stats need the INT64 min/max). Also the
        # non-deprecated encoding every other engine reads natively.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    if master is None and not os.environ.get("SPARK_MASTER"):
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
        if master.startswith("local"):
            builder = builder.config(
                "spark.driver.memory", DEFAULT_LOCAL_DRIVER_MEMORY
            )
    merged: dict[str, str] = {}
    if profile == "cluster":
        merged.update(cluster_profile())
    elif profile is not None:
        raise ValueError(f"unknown session profile {profile!r}")
    merged.update(extra_conf or {})
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
