"""Deterministic sampling and sequence-packing operators for a
training-data pipeline.

Two families:

- **Hash-gate sampling** — admit a row iff a salted-md5-derived
  uniform in [0, 1) is below a (possibly per-row) rate. Reproducible
  across engines, runs, and partitionings, unlike ``DataFrame.sample``
  whose output depends on partition layout. This is the standard way a
  100 TB pipeline takes an exact-fraction slice or applies per-domain
  mixing weights: zero shuffles, evaluated inside the scan stage.

- **Greedy sequence packing** — assign documents, in a deterministic
  global order, to fixed token-budget bins (the concat-then-chunk
  accounting used when packing a pretraining corpus into fixed-length
  sequences). The global running sum is computed WITHOUT a
  single-partition window: range-repartition on the order key,
  per-partition running sums, then a tiny per-partition offset table
  (the classic two-phase distributed prefix sum). Cost at scale: one
  range shuffle + one hash shuffle of the (key, weight) projection;
  the offset table has one row per partition and is broadcast.

No counterpart in the reference (rlukafiardi/etl-property-rumah123
stops at scrape->clean->load); these extend the engine for LLM corpus
preparation, same charter as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def deterministic_uniform(key: Column, salt: str) -> Column:
    """A uniform double in [0, 1) derived from ``md5(key || salt)``.

    Uses the first 6 hex digits (24 bits) over 2^24: the dividend is an
    exact integer and the divisor a power of two, so the quotient is
    bit-identical in any IEEE-754 engine — DuckDB recomputes it as
    ``CAST(('0x' || substr(md5(k || salt), 1, 6)) AS BIGINT) / 16777216.0``.
    """
    h = F.conv(F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 6), 16, 10)
    return h.cast("double") / F.lit(16777216.0)


def hash_gate(df: DataFrame, rate: Column, key: Column, salt: str) -> DataFrame:
    """Keep rows where the deterministic uniform is below ``rate``.

    ``rate`` may be per-row (e.g. a per-language mixing weight) — the
    whole gate stays a scan-stage predicate Catalyst can push around.
    """
    return df.filter(deterministic_uniform(key, salt) < rate)


def global_running_sum(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    out_col: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive prefix sum of ``weight_col`` in global
    ``order_col`` order, distributed.

    The naive ``Window.orderBy(order_col)`` with no partition spec
    funnels the whole table through ONE task — the textbook scale
    killer. Instead:

    1. ``repartitionByRange(order_col)`` — partitions hold disjoint,
       ordered key ranges (boundaries come from sampling and may vary
       between runs, but the RESULT never depends on them: recomposing
       per-partition sums in range order reproduces the global order).
    2. a per-partition running sum (``Window.partitionBy(pid)``), which
       parallelizes across partitions;
    3. a one-row-per-partition totals table, prefix-summed on the
       driver-side-small scale (its unpartitioned window touches
       ``num_partitions`` rows, not data rows) and broadcast back.

    Result column ``out_col`` is the inclusive running sum.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__local", F.sum(weight_col).over(w_local))
    totals = d.groupBy("__pid").agg(F.sum(weight_col).alias("__ptot"))
    # num_partitions rows only — the unpartitioned window is bounded by
    # the partition count, never by the data.
    w_off = (
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__ptot").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        d.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__off")).cast("long"))
        .drop("__pid", "__local", "__off")
    )


def chunk_spans(
    df: DataFrame,
    size: int,
    stride: int,
    id_col: str = "doc_id",
    weight_col: str = "n_tok",
) -> DataFrame:
    """Retrieval-style chunk plan: one row per (doc, chunk) for fixed
    ``size``-token windows advancing by ``stride`` tokens (overlap =
    ``size - stride``). The last window is truncated at the document
    end; zero-token docs produce no chunks.

    Chunk count per doc is ``1 + ceil(max(n_tok - size, 0) / stride)``,
    computed in non-negative integer arithmetic ONLY — Spark's ``DIV``
    truncates toward zero while DuckDB's ``//`` floors, so a negative
    numerator would silently diverge between engine and oracle.

    Pure generate-and-explode over the token counts: no shuffle, no
    join; row expansion is ~n_tok/stride per doc, the output's
    intrinsic size.
    """
    extra = F.expr(
        f"CAST((GREATEST({weight_col} - {size}, 0) + {stride - 1}) "
        f"DIV {stride} AS BIGINT)"
    )
    exploded = (
        df.filter(F.col(weight_col) > 0)
        .select(id_col, weight_col, F.explode(F.sequence(F.lit(0), extra)).alias("chunk_idx"))
    )
    start = F.col("chunk_idx") * stride
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.least(start + size, F.col(weight_col)) - start)
        .cast("long")
        .alias("chunk_tokens"),
    )


def pack_token_bins(
    df: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    weight_col: str = "n_tok",
) -> DataFrame:
    """Concat-and-chunk packing accounting: documents are laid out in
    ``order_col`` order and the token stream is cut every ``budget``
    tokens; each document is assigned the bin in which it STARTS
    (``(running_sum_before_doc) div budget``).

    Deterministic given the order column, so a DuckDB single-node
    window recomputes it exactly — which is what makes the distributed
    prefix-sum path oracle-checkable. Returns per-bin accounting
    ``(bin, n_docs, n_tokens)``; the per-doc assignment is the
    intermediate ``select`` if a caller needs it.
    """
    r = global_running_sum(df, order_col, weight_col)
    assigned = r.select(
        order_col,
        weight_col,
        F.expr(f"CAST((running - {weight_col}) DIV {budget} AS BIGINT)").alias("bin"),
    )
    return assigned.groupBy("bin").agg(
        F.count("*").alias("n_docs"),
        F.sum(weight_col).cast("long").alias("n_tokens"),
    )


def shard_order(
    df: DataFrame,
    key_col: str = "doc_id",
    salt: str = "|shuffle42",
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic training-order shuffle + sharding.

    A pretraining run wants the corpus in a pseudo-random but
    REPRODUCIBLE order, split into shards each trainer rank reads
    independently. Both come from one salted md5: the first 12 hex
    digits (48 bits, always non-negative) are the global order key,
    and ``h mod n_shards`` is the shard. Changing the salt reshuffles;
    keeping it reproduces the exact epoch order on any engine or
    partitioning — ``DataFrame.sample``/``rand`` cannot promise that.

    Returns the input plus ``__h`` (order key) and ``shard``. The
    production write is ``repartition(n_shards, shard)`` +
    ``sortWithinPartitions(__h, key)`` — ONE hash shuffle at any
    scale, each shard file internally in epoch order. Accounting
    queries over the result (see plans) use the same window order.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 12
        ),
        16,
        10,
    ).cast("long")
    return df.withColumn("__h", h).withColumn(
        "shard", (F.col("__h") % n_shards).cast("long")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    salt: str = "|cap42",
) -> DataFrame:
    """Per-group document cap — the per-domain cap every web-scale
    corpus applies (no single domain may dominate training data):
    keep at most ``k`` rows per ``group_col``, chosen in deterministic
    salted-hash order (so the kept set is a reproducible pseudo-random
    sample, not scrape order, and survives any repartitioning).

    Returns the input plus ``__keep`` (1/0) so callers can filter or
    account. One shuffle on the group column (window rank). For a
    pathological mega-group where even ranking its members is too much
    state, pre-thin with :func:`hash_gate` at rate ~k/|group| first —
    the gate is shuffle-free — then apply the exact cap to the
    survivors.
    """
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    return df.withColumn(
        "__keep", (F.row_number().over(w) <= k).cast("int")
    )
