"""Structured Streaming pipelines over the events schema.

Each builder takes a streaming DataFrame (``spark.readStream`` from a
file/rate/kafka source with the events schema) and returns the
transformed streaming DataFrame — source- and sink-agnostic, so tests
drive them with file sources and production attaches Kafka + a
foreachBatch JDBC sink.

Scale/state design:
- every stateful op is bounded by a watermark — state for windows or
  dedup keys older than the watermark is evicted, so state size is
  O(keys within the lateness horizon), not O(stream history).
- session windows use the native ``F.session_window`` (state-store
  backed merge), not a custom applyInPandasWithState, unless custom
  semantics are needed (see ``value_ema_by_user`` for that shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame, window: str = "15 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data drop.

    Streaming twin of the batch ``events_tumbling_15min`` query —
    same alignment, same aggregates, plus the watermark bound.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_rates(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window event rates (overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "approx_users")
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Native session windows: 30-min inactivity gap per user.

    Streaming twin of the batch ``events_sessionize`` query; the state
    store merges adjacent sessions as events arrive.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame, key: str = "event_id", watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming T2: drop duplicate keys within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps the FIRST arrival of each
    key (matching the reference's keep-first dedup,
    /root/reference/src/transform.py:11) and evicts key state once the
    watermark passes — bounded state, unlike a global dropDuplicates.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark([key])


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
):
    """Test/debug helper: drain a stream into an in-memory table."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "60 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: purchases within ``max_gap`` after a
    click by the same user — the streaming twin of the batch
    ``range_join_followups`` query.

    Both sides are watermarked and the join condition bounds event
    time on BOTH ends, so the state store can evict: click state is
    held only ``max_gap`` past the watermark, purchase state only to
    the watermark. Without the two-sided time bound the join state
    grows forever — the canonical stream-stream join trap.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    cond = (
        (c.user_id == p.user_id)
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}"))
    )
    return c.join(p, cond).select(
        "click_id", "purchase_id", c.user_id.alias("user_id")
    )


def click_purchase_outer_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "60 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream join: every click, with its follow-up
    purchase where one exists within ``max_gap``, else NULLs — the
    abandonment-analysis twin of :func:`click_purchase_join`.

    Outer stream-stream joins have an extra semantic wrinkle the inner
    join doesn't: a null-extended row for an unmatched click can only
    be emitted once the watermark proves no matching purchase can
    still arrive — i.e. when the click's state expires at
    ``watermark + max_gap`` behind the max seen event time. Clicks
    near the stream's end therefore stay IN STATE at drain time and
    their null rows are withheld (not wrong, just not-yet-provable) —
    the integration test pins exactly this split. Same two-sided time
    bound as the inner join, so state stays evictable."""
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    cond = (
        (c.user_id == p.p_user_id)
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}"))
    )
    return c.join(p, cond, "left_outer").select(
        "click_id", "user_id", "click_ts", "purchase_id"
    )


def hourly_conversion_counts(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "60 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """CHAINED STATEFUL OPERATORS in one streaming query: the
    click->purchase interval join feeding a tumbling-hour conversion
    count — two state stores (join + aggregation) in a single plan,
    the Spark 4 multiple-stateful-operator capability (earlier
    releases refused this pipeline outright in append mode).

    Correctness hinges on WATERMARK PROPAGATION: the join delays its
    output watermark by the state it may still emit, and the window
    aggregate finalizes an hour bucket only when that *propagated*
    watermark passes the window end — the integration test brackets
    exactly which buckets a drain must and must not have emitted."""
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    cond = (
        (c.user_id == p.p_user_id)
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}"))
    )
    joined = c.join(p, cond).select("click_id", "purchase_id", "purchase_ts")
    return (
        joined.groupBy(F.window("purchase_ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_conversions"))
        .select(
            F.col("w.start").alias("hour_start"),
            "n_conversions",
        )
    )


#: Output schema of the per-user EMA stateful operator.
EMA_SCHEMA = "user_id long, n_events long, ema double"
#: State schema: running (count, ema).
_EMA_STATE_SCHEMA = "n long, ema double"


def value_ema_by_user(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Custom stateful operator: exponential moving average of ``value``
    per user via ``applyInPandasWithState``.

    This is the shape Spark's built-in windows can't express — state is
    an arbitrary reduction (here: (count, ema)) carried across
    micro-batches per key, updated with Arrow-batched pandas, emitted
    once per batch per active key. State size is O(active users) — two
    scalars per key — so a 100 TB stream with 10^9 users holds ~16 GB
    of state sharded across executors' state stores.

    Within-batch event order follows the batch frame order; for strict
    event-time ordering sort upstream per key (micro-batches preserve
    per-key grouping, not intra-key time order).
    """

    def update(key, pdfs, state):
        import pandas as pd

        n, ema = state.get if state.exists else (0, None)
        for pdf in pdfs:
            for v in pdf["value"]:
                if v is None:
                    continue
                v = float(v)
                ema = v if ema is None else alpha * v + (1 - alpha) * ema
                n += 1
        state.update((n, ema))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ema": [ema]}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=EMA_SCHEMA,
            stateStructType=_EMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


#: Output schema of the streaming dedup admission gate.
DEDUP_GATE_SCHEMA = "user_id long, event_id long, digest string"


def streaming_dedup_admission(
    events: DataFrame, n_recent: int = 128
) -> DataFrame:
    """Bounded-MEMORY streaming dedup gate: per user, an event is
    ADMITTED iff its content digest is not among that user's last
    ``n_recent`` admitted digests (FIFO eviction).

    Why this operator exists next to the built-ins:
    ``dropDuplicates`` keeps unbounded state, and
    ``dropDuplicatesWithinWatermark`` bounds state by TIME — neither
    can promise a per-key MEMORY bound. This gate's state is exactly
    ``n_recent`` digests per active user, the admission contract a
    production ingest gate runs with: a user replaying content within
    their recent horizon is dropped, and state never grows past
    n_recent x #active-users regardless of stream age.

    Implemented on ``applyInPandasWithState`` (state: one
    array<string> per key). Spark 4's successor API
    (``transformWithStateInPandas`` — typed state handles, timers,
    TTL) needs a protobuf runtime for its state-server protocol;
    round 4 unblocked it WITHOUT the package via a bounded
    reimplementation (streaming/protolite.py + state_proto_shim.py),
    and the same gate now ALSO runs on the new API —
    :func:`etl_property_rumah123_spark.streaming.tws.streaming_dedup_admission_tws`,
    pinned admission-identical to this form by the side-by-side
    integration test. This form stays as the no-RocksDB fallback.
    """

    def update(key, pdfs, state):
        from collections import deque

        import pandas as pd

        (seen,) = state.get if state.exists else ([],)
        seen = deque(seen, maxlen=n_recent)
        sset = set(seen)
        out_e, out_d = [], []
        for pdf in pdfs:
            for eid, dg in zip(pdf["event_id"], pdf["digest"]):
                if dg in sset:
                    continue
                if len(seen) == n_recent:  # FIFO eviction, inline so
                    sset.discard(seen[0])  # the bound holds mid-batch
                sset.add(dg)
                seen.append(dg)
                out_e.append(int(eid))
                out_d.append(dg)
        state.update((list(seen),))
        if out_e:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out_e),
                    "event_id": out_e,
                    "digest": out_d,
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = events.select(
        "user_id",
        "event_id",
        F.md5(F.coalesce(F.col("props"), F.lit(""))).alias("digest"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=DEDUP_GATE_SCHEMA,
        stateStructType="digests array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_profile(
    df: DataFrame, columns: dict[str, str], table_name: str = "stream"
) -> DataFrame:
    """Streaming data-quality monitor: the streaming twin of
    ``operators.profiling.profile_columns``.

    One global streaming aggregation maintains per-column row/null
    counts, ranges, and an approximate distinct sketch (exact COUNT
    DISTINCT is unbounded-state in a stream; HLL state is O(KB) per
    column), reshaped long with ``stack``. Run in ``complete`` output
    mode — the state is a single row of scalars+sketches, so complete
    mode re-emits a handful of rows per micro-batch, not the stream.

    This is the ingest-gate pattern: attach it alongside the main
    pipeline and alert when n_null jumps or a range walks out of
    bounds — the streaming analog of profiling a batch before
    training-data admission.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in columns.items():
        aggs.append(F.count(c).alias(f"__c_{c}"))
        aggs.append(F.approx_count_distinct(c, rsd=0.02).alias(f"__d_{c}"))
        if kind == "string":
            aggs.append(F.min(c).alias(f"__mn_{c}"))
            aggs.append(F.max(c).alias(f"__mx_{c}"))
        else:
            aggs.append(F.round(F.min(F.col(c).cast("double")), 6).alias(f"__mn_{c}"))
            aggs.append(F.round(F.max(F.col(c).cast("double")), 6).alias(f"__mx_{c}"))
    one = df.agg(*aggs)
    groups = []
    for c, kind in columns.items():
        vals = [
            f"'{table_name}.{c}'",
            "CAST(n_rows AS BIGINT)",
            f"CAST(n_rows - __c_{c} AS BIGINT)",
            f"CAST(__d_{c} AS BIGINT)",
        ]
        if kind == "string":
            vals += [f"__mn_{c}", f"__mx_{c}",
                     "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"]
        else:
            vals += ["CAST(NULL AS STRING)", "CAST(NULL AS STRING)",
                     f"__mn_{c}", f"__mx_{c}"]
        groups.append(", ".join(vals))
    stack = (
        f"stack({len(columns)}, {', '.join(groups)}) AS "
        "(col, n_rows, n_null, approx_distinct, min_s, max_s, min_v, max_v)"
    )
    return one.select(F.expr(stack))


def lsh_dedup_admitter(
    index_path: str,
    admitted_path: str | None = None,
    max_bucket_size: int | None = None,
    **lsh_kwargs,
):
    """foreachBatch handler: streaming corpus near-dup ADMISSION over
    a persisted LSH index — the production shape of streaming dedup,
    composing three existing artifacts: the bucket-table index
    (``dedup.write_lsh_index``), the per-batch probe join
    (``dedup.probe_lsh_index``), and foreachBatch delivery.

    Per micro-batch of documents (doc_id, text):

    1. **within-batch**: drop any doc sharing a band bucket with a
       smaller-id doc in the same batch (``lsh_candidate_pairs``; a
       doc whose only collision partner was itself dropped is still
       dropped — documented over-drop, conservative for dedup);
    2. **vs the standing index**: drop docs with any probe hit, AND
       docs whose doc_id is already indexed — the second clause is
       what makes REPLAY convergent: a redelivered batch finds its
       own ids in the index and admits nothing, so at-least-once
       delivery upgrades to effective exactly-once without any sink
       transaction;
    3. write the admitted rows (if ``admitted_path``) into a
       PER-BATCH subdirectory (``batch_id=N``, overwritten on replay
       — no duplicate rows), THEN append the admitted docs' band
       buckets to the index. This write order makes the two
       non-atomic writes convergent under retry: a crash between them
       re-runs the batch against the unchanged index, recomputes the
       same admitted set, overwrites the row directory identically,
       and completes the index append — whereas index-first would
       permanently lose the rows (the retry would find its ids
       already indexed and admit nothing).

    Scale: per-batch cost is proportional to the BATCH (only the
    batch is shingled/hashed; the corpus side is one bucket-table
    scan), the index grows monotonically by admitted docs only, and
    ``max_bucket_size`` guards the probe join against hot index
    buckets. State lives entirely in the index artifact — no
    streaming state store, so the gate survives query restarts and is
    shared by any number of ingest streams.
    """
    from etl_property_rumah123_spark.operators import common, dedup

    # Normalize the hash family ONCE: lsh_candidate_pairs defaults to
    # 'md5' while the index (write/probe) defaults to 'xxhash64' — left
    # unset, the within-batch dedup and the index probe would silently
    # use DIFFERENT bucket spaces. One explicit default keeps all three
    # calls in the same family; callers can still override it.
    lsh_kwargs.setdefault("hash_family", "xxhash64")

    def _path_exists(spark, path: str) -> bool:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(conf).exists(p)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs = batch_df.select("doc_id", "text")
        losers = (
            dedup.lsh_candidate_pairs(docs, **lsh_kwargs)
            .select(F.col("id_b").alias("doc_id"))
            .distinct()
        )
        keep = docs.join(losers, "doc_id", "left_anti")
        if _path_exists(spark, index_path):
            # ONE index read serves both the probe join and the
            # already-indexed clause (the index is the growing side —
            # scanning it twice per batch doubles the dominant cost)
            spark.catalog.refreshByPath(index_path)
            index_df = spark.read.parquet(index_path)
            hits = (
                dedup.probe_lsh_index(
                    keep, index_df, max_bucket_size, **lsh_kwargs
                )
                .select(F.col("new_id").alias("doc_id"))
                .distinct()
            )
            already = index_df.select("doc_id").distinct()
            keep = keep.join(hits, "doc_id", "left_anti").join(
                already, "doc_id", "left_anti"
            )
        # one computation feeds both writes
        admitted = common.materialize(keep)
        if admitted.isEmpty():
            return  # nothing admitted: no writes, directories untouched
        # Write ORDER makes the two non-atomic appends convergent under
        # retry: admitted rows land FIRST, in a per-batch subdirectory
        # OVERWRITTEN on replay (no duplicate rows), then the index
        # append. A crash between the two re-runs the batch with the
        # index unchanged -> the same admitted set is recomputed, the
        # row directory is overwritten identically, and the index
        # append completes. (Index-first ordering would instead LOSE
        # rows forever: the retried batch finds its ids already
        # indexed and admits nothing.)
        if admitted_path is not None:
            admitted.write.mode("overwrite").parquet(
                f"{admitted_path}/batch_id={batch_id}"
            )
        dedup.write_lsh_index(admitted, index_path, mode="append", **lsh_kwargs)

    return _apply


def foreach_batch_upsert(batch_writer):
    """Adapter for exactly-once-ish sink delivery: wrap a batch upsert
    function (e.g. sinks.jdbc_merge.load_to_postgres) for use with
    ``writeStream.foreachBatch``. The upsert's idempotence (merge on
    unique key) is what upgrades at-least-once delivery to effective
    exactly-once — same argument as the reference's truncate-staging +
    ON CONFLICT pattern (/root/reference/src/load.py:80-96)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_writer(batch_df, batch_id)

    return _apply
