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


def compact_partitions(
    path: str,
    partition_cols: list[str],
    spark,
    files_per_partition: int = 1,
    partition_filter=None,
) -> dict:
    """Bin-pack a partitioned dataset's small files — the maintenance
    op every long-lived 100 TB table needs after many incremental
    merges/appends have fragmented its partitions.

    Reads the dataset (optionally only partitions matching
    ``partition_filter``, a Column predicate on partition columns that
    prunes at planning time), localCheckpoints the rows off the input
    files, and rewrites the selected partitions with exactly
    ``files_per_partition`` files each via dynamic partition
    overwrite. Row content is unchanged — only layout. Returns
    ``{"path", "n_rows"}``. Delta ``OPTIMIZE`` / Iceberg
    ``rewrite_data_files`` are the manifest-tracked production
    equivalents.
    """
    df = spark.read.parquet(path)
    if partition_filter is not None:
        df = df.filter(partition_filter)
    df = df.localCheckpoint(eager=True)
    n_rows = df.count()
    write_partitioned_dataset(
        df, path, partition_cols,
        files_per_partition=files_per_partition, dynamic_overwrite=True,
    )
    return {"path": path, "n_rows": n_rows}


def _carry_frames(
    existing: DataFrame, batch: DataFrame, key_cols: list[str]
) -> tuple[DataFrame, DataFrame]:
    """The partition-merge carry joins, exposed for plan pinning:
    ``(carried, updated)`` — existing rows not in the batch, and
    existing rows the batch replaces. The batch-key side is small
    relative to the (already partition-pruned) existing rows, so it
    carries an explicit broadcast hint: the anti/semi joins probe in
    place instead of shuffling the touched partitions on the key
    columns. The hint is gated on SPARK_GRAFT_MAX_BROADCAST_KEYS
    (operators/common.py:gated_broadcast) — an over-cap batch
    degrades loudly to a shuffle join."""
    from etl_property_rumah123_spark.operators.common import gated_broadcast

    bkeys = gated_broadcast(
        batch.select(*key_cols), what="partition-merge batch key set"
    )
    return (
        existing.join(bkeys, on=key_cols, how="left_anti"),
        existing.join(bkeys, on=key_cols, how="left_semi"),
    )


def merge_into_partitioned(
    batch: DataFrame,
    path: str,
    key_cols: list[str],
    partition_cols: list[str],
    order_col: str | None = None,
    files_per_partition: int = 1,
    with_stats: bool = True,
    allow_schema_evolution: bool = False,
    max_touched_partitions: int = 10_000,
) -> dict:
    """MERGE (upsert) a batch into a hive-partitioned Parquet dataset —
    the reference's L3 full-row last-write-wins semantics
    (/root/reference/src/load.py:30-43) re-expressed file-natively for
    a table no single database holds:

    1. collect the batch's DISTINCT partition values (driver-side, but
       bounded by partitions-touched-per-run — a per-date/per-region
       incremental batch touches a handful, never the table);
    2. read ONLY those partitions of the existing dataset (the tuple
       predicate is on partition columns, so it prunes at planning
       time — untouched partitions are never listed, read, or
       rewritten);
    3. keep existing rows whose key is absent from the batch
       (LEFT ANTI), union the batch, and rewrite just the affected
       partitions under dynamic partition overwrite.

    This is copy-on-write MERGE at the affected-partition grain —
    the same cost model as Delta/Iceberg/Hudi CoW, minus their
    file-level (rather than partition-level) rewrite granularity and
    transactional manifest; swap in ``MERGE INTO`` on a lakehouse
    table format to get both. The merged slice is localCheckpointed
    before the write: it breaks plan lineage to the input files
    (Spark refuses to overwrite a path it is also reading) and
    pins the rows so the rewrite cannot observe its own output.

    In-batch duplicate keys: ``order_col`` picks the winner
    (keep-max, the cross-run analog of T2's keep-first-within-run);
    without it duplicates are dropped arbitrarily (documented, same
    as ``dropDuplicates``).

    ``allow_schema_evolution``: columns the batch adds (or drops)
    relative to the table are reconciled additively — the existing
    slice is read with ``mergeSchema`` and the union fills either
    side's missing columns with NULL (Delta's ``mergeSchema``
    semantics). Off by default: an unexpected batch schema should
    fail loudly unless drift is an accepted fact of the feed. Only
    the REWRITTEN partitions gain the new column's values; untouched
    partitions' files are schema-narrower until their next rewrite,
    which is why reads of an evolving table must also use
    ``mergeSchema`` (documented Delta/Iceberg behavior too — their
    manifests just hide it better).

    Returns ``{"path", "n_upserted", "n_carried", "n_partitions"}``
    (and, when ``with_stats``, ``n_updated``/``n_inserted`` — the
    reference's xmax=0 accounting, computed as a semi-join count
    against the pruned existing slice before it is replaced).

    ``max_touched_partitions`` bounds the driver-side collect of
    distinct partition tuples (same loud-guard pattern as the LSH
    ``max_bucket_size``): an incremental batch touches a handful of
    partitions, so a batch touching more than the cap almost always
    means the caller partitioned on a high-cardinality column (id,
    timestamp) and the "prune then rewrite" plan has silently become
    "rewrite the table through the driver". The collect itself is
    LIMIT-bounded, so the driver never materializes more than
    ``max_touched_partitions + 1`` tuples even when the batch would
    touch millions. Raise the cap explicitly for a genuine wide
    backfill.
    """
    spark = batch.sparkSession
    if order_col is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
        batch = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        batch = batch.dropDuplicates(key_cols)

    touched = [
        tuple(r)
        for r in batch.select(*partition_cols)
        .distinct()
        .limit(max_touched_partitions + 1)
        .collect()
    ]
    if len(touched) > max_touched_partitions:
        raise ValueError(
            f"batch touches more than max_touched_partitions="
            f"{max_touched_partitions} distinct {partition_cols} values; "
            "this rewrite would flood the driver and rewrite most of the "
            "table. Check that partition_cols is a low-cardinality "
            "partitioning column, or raise max_touched_partitions for a "
            "deliberate wide backfill."
        )
    if not touched:
        out = {"path": path, "n_upserted": 0, "n_carried": 0, "n_partitions": 0}
        if with_stats:
            out.update(n_updated=0, n_inserted=0)
        return out

    def tuple_pred(values):
        # Null-safe per value: a batch row with a NULL partition value
        # lands in the __HIVE_DEFAULT_PARTITION__ directory, and dynamic
        # overwrite WILL rewrite that directory — so its existing rows
        # must be read and carried like any other touched partition.
        # `==` never matches NULL and would silently drop them.
        preds = []
        for vals in values:
            p = F.lit(True)
            for c, v in zip(partition_cols, vals):
                p = p & (F.col(c).isNull() if v is None else F.col(c).eqNullSafe(F.lit(v)))
            preds.append(p)
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        return out

    # Missing path -> first write. Checked explicitly (Hadoop FS API,
    # so file:// hdfs:// s3a:// all work) rather than by catching the
    # read error: a CORRUPT existing dataset must fail loudly, not be
    # silently treated as absent and overwritten.
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    first_write = not fs.exists(hpath)
    if first_write:
        existing = None
    else:
        reader = spark.read
        if allow_schema_evolution:
            reader = reader.option("mergeSchema", "true")
        existing = reader.parquet(path).filter(tuple_pred(touched))
        if not allow_schema_evolution:
            if sorted(existing.columns) != sorted(batch.columns):
                raise ValueError(
                    "batch schema drifted from table schema "
                    f"(batch: {sorted(batch.columns)}, table: "
                    f"{sorted(existing.columns)}); pass "
                    "allow_schema_evolution=True to reconcile additively"
                )

    stats = {"path": path, "n_partitions": len(touched)}
    if first_write:
        merged = batch
        stats["n_carried"] = 0
        if with_stats:
            stats["n_updated"] = 0
    else:
        carried, updated = _carry_frames(existing, batch, key_cols)
        if with_stats:
            stats["n_updated"] = updated.count()
        merged = carried.unionByName(
            batch, allowMissingColumns=allow_schema_evolution
        )

    # Materialize off the input files before overwriting them.
    merged = merged.localCheckpoint(eager=True)
    n_rows = merged.count()
    stats["n_upserted"] = batch.count()
    stats["n_carried"] = n_rows - stats["n_upserted"]
    if with_stats:
        stats["n_inserted"] = stats["n_upserted"] - stats.get("n_updated", 0)
    write_partitioned_dataset(
        merged, path, partition_cols,
        files_per_partition=files_per_partition, dynamic_overwrite=True,
    )
    return stats


def zorder_layout(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    target_files: int = 8,
    bits: int = 16,
    scaling: str = "linear",
    rank_buckets: int = 256,
    rank_rel_err: float = 0.001,
) -> str:
    """Write ``df`` as Parquet laid out along a Z-order (Morton) curve
    over ``zorder_cols`` — the multi-dimensional data-skipping layout
    (Delta ``OPTIMIZE ZORDER BY``'s cost model).

    Why: sorting by one column makes that column's per-file min/max
    ranges tight and every other column's ranges full-domain, so
    predicates on the second column skip nothing. Interleaving the
    bits of all key columns gives every key moderately tight per-file
    ranges, so a selective predicate on ANY of them prunes most files
    via Parquet footer statistics.

    Mechanics, all JVM-side expressions: each (numeric) column is
    scaled to a ``bits``-bit integer, the bits are interleaved with
    shift/or expressions into a single long, and rows are
    range-partitioned + sorted by it, one file per range. Nulls scale
    to 0 (sort first). ``bits * len(cols)`` must stay < 63.

    ``scaling``:
    - ``'linear'`` — min-max scale (driver fetches one tiny min/max
      agg row). Cheap, but heavy skew concentrates the Morton curve:
      a lognormal column maps almost all rows to bucket 0 and data
      skipping on the OTHER columns collapses exactly when it matters.
    - ``'rank'`` — scale by the value's quantile bucket (Delta's
      OPTIMIZE ZORDER approach: each dimension range-partitioned on
      SAMPLED boundaries). ``rank_buckets - 1`` quantile cuts per
      column come from one ``approxQuantile`` pass (the driver holds
      a bounded boundary list, never the data); the per-row bucket is
      a codegen'd count over the literal boundary array. Equal-depth
      buckets are skew-immune by construction, so every dimension
      keeps tight per-file ranges under any distribution. ``bits``
      is derived from ``rank_buckets`` in this mode.
    """
    z = zorder_key_expr(
        df, zorder_cols, bits, scaling, rank_buckets, rank_rel_err
    )
    return _zorder_write(df, path, zorder_cols, target_files, z)


def zorder_key_expr(
    df: DataFrame,
    zorder_cols: list[str],
    bits: int = 16,
    scaling: str = "linear",
    rank_buckets: int = 256,
    rank_rel_err: float = 0.001,
):
    """The Morton-interleaved Z-order key as a Column over ``df`` —
    the reusable half of :func:`zorder_layout`, so other writers (the
    snapshot log's OPTIMIZE, bucketed exports) can lay data on the
    same curve without duplicating the scaling logic. See
    :func:`zorder_layout` for the linear-vs-rank scaling trade."""
    n = len(zorder_cols)
    if scaling not in ("linear", "rank"):
        raise ValueError(f"scaling must be 'linear' or 'rank', got {scaling!r}")
    if scaling == "rank":
        if rank_buckets < 2 or rank_buckets & (rank_buckets - 1):
            raise ValueError(
                f"rank_buckets must be a power of two >= 2, got {rank_buckets}"
            )
        bits = rank_buckets.bit_length() - 1
    if bits * n >= 63:
        raise ValueError(f"bits*cols = {bits * n} must stay < 63")
    top = (1 << bits) - 1
    scaled = []
    if scaling == "rank":
        probs = [i / rank_buckets for i in range(1, rank_buckets)]
        # ONE pass for all dimensions: approxQuantile takes a column
        # list, so N z-order columns still cost a single data scan.
        casts = df.select(
            *[F.col(c).cast("double").alias(f"__v{i}") for i, c in enumerate(zorder_cols)]
        )
        all_cuts = casts.approxQuantile(
            [f"__v{i}" for i in range(n)], probs, rank_rel_err
        )
        for c, cuts in zip(zorder_cols, all_cuts):
            # Strictly increasing boundaries: ties collapse buckets,
            # which is correct — a heavy-hitter value owns one bucket
            # and its neighbors stay equal-depth.
            barr = F.array(*[F.lit(float(b)) for b in sorted(set(cuts))])
            bucket = F.size(
                F.filter(barr, lambda b: b <= F.col(c).cast("double"))
            ).cast("long")
            scaled.append(F.coalesce(bucket, F.lit(0)))
    else:
        bounds = df.agg(
            *[F.min(c).alias(f"mn_{c}") for c in zorder_cols],
            *[F.max(c).alias(f"mx_{c}") for c in zorder_cols],
        ).first()
        for c in zorder_cols:
            mn = float(bounds[f"mn_{c}"]) if bounds[f"mn_{c}"] is not None else 0.0
            mx = float(bounds[f"mx_{c}"]) if bounds[f"mx_{c}"] is not None else 0.0
            span = (mx - mn) or 1.0
            scaled.append(
                F.coalesce(
                    F.floor(
                        (F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * F.lit(top)
                    ).cast("long"),
                    F.lit(0),
                )
            )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            bit = F.shiftright(s, i).bitwiseAND(F.lit(1)).cast("long")
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def _zorder_write(
    df: DataFrame, path: str, zorder_cols: list[str], target_files: int, z
) -> str:
    (
        df.withColumn("__z", z)
        .repartitionByRange(target_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path
