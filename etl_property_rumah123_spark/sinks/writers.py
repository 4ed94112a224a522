"""File writers (op L5): dated CSV/Parquet outputs.

Mirrors save_to_csv (/root/reference/utils/helper.py:42-63) with two
engine-grade changes: the run date is INJECTED (never datetime.now()
inside the operator — testability, and retries must not change the
path), and Parquet is the default (schema-carrying, splittable,
columnar) with CSV kept for reference-compatible handoff.

The array<string> ``additional_features`` column is stringified only
here, at the sink boundary (SURVEY §1.4): CSV/VARCHAR targets get a
JSON rendering; Parquet keeps the native array type.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stringify_arrays(df: DataFrame) -> DataFrame:
    out = df
    for f in df.schema.fields:
        if f.dataType.typeName() == "array":
            out = out.withColumn(f.name, F.to_json(F.col(f.name)))
    return out


def dated_path(base_path: str, filename: str, run_date: str, ext: str) -> str:
    """{base}/{filename}_{YYYYMMDD}.{ext} — same naming as the
    reference (/root/reference/utils/helper.py:58-59)."""
    return os.path.join(base_path, f"{filename}_{run_date}.{ext}")


def save_csv(df: DataFrame, filename: str, base_path: str, run_date: str) -> str:
    """Dated CSV directory write (header, overwrite-by-date so retries
    are idempotent). Arrays stringified at this boundary."""
    path = dated_path(base_path, filename, run_date, "csv")
    _stringify_arrays(df).write.mode("overwrite").option("header", True).csv(path)
    return path


def save_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table for co-located joins.

    Two tables bucketed by the same key into the same bucket count
    join with ZERO exchanges — the shuffle is paid once at write time
    and amortized over every subsequent join/aggregation on that key.
    At 100 TB this is the difference between an hourly fact-to-fact
    join re-shuffling both sides and one that streams bucket pairs.
    ``sortBy`` additionally removes the sort from sort-merge joins.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def save_parquet(
    df: DataFrame, filename: str, base_path: str, run_date: str,
    partition_by: list[str] | None = None,
) -> str:
    """Dated Parquet write; optional partition columns for downstream
    partition pruning (e.g. region/ads_type at production scale)."""
    path = dated_path(base_path, filename, run_date, "parquet")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def write_partitioned_dataset(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    dynamic_overwrite: bool = True,
) -> str:
    """Hive-partitioned Parquet dataset write with the two controls a
    100 TB table layout needs:

    - **Small-file control**: without it, every one of the N shuffle
      partitions writes its own file into every partition directory —
      N x |partitions| tiny files that crush the namenode/lister and
      downstream scan planning. Repartitioning on (partition_cols
      [+ salt]) first routes each output partition's rows to exactly
      ``files_per_partition`` tasks, so the directory gets exactly
      that many files. Raise it when single partitions are too large
      for one task (the salt spreads rows evenly).
    - **Dynamic partition overwrite**: ``INSERT OVERWRITE`` semantics
      per partition — a rerun/backfill replaces ONLY the partitions
      present in ``df``, leaving the rest of the table untouched.
      That makes per-date/per-region incremental jobs idempotent
      without truncating the world. The session conf is scoped
      (save/restore) like catalog.table's nanos setting.
    """
    spark = df.sparkSession
    if files_per_partition <= 1:
        routed = df.repartition(*[F.col(c) for c in partition_cols])
    else:
        salt = (F.rand(seed=42) * files_per_partition).cast("int")
        routed = df.repartition(
            *[F.col(c) for c in partition_cols], salt.alias("__salt")
        )
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic" if dynamic_overwrite else "static")
    try:
        routed.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return path
