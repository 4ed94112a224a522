"""Advanced / scale-pattern operators absent from both the reference
and (as built-ins) from Spark: as-of join, bucketed range join,
time-range window frames, salted two-phase aggregation, exact
percentiles, array table-functions.

Each has a genuinely independent oracle: DuckDB's native ASOF JOIN,
its inequality joins, RANGE frames, quantile_cont — different
algorithms, same semantics, so hash-equality is real evidence.

Scale notes are inline per operator; the common theme is "no
inequality join reaches the physical plan" — every op shuffles on an
equi-key (user, time bucket, salt) and does the inequality work
inside a partition or a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_property_rumah123_spark.plans import part, register
from etl_property_rumah123_spark.sources.catalog import table


# ---------------------------------------------------------------------------
# As-of join (events self-as-of: last strictly-prior click per user)
# ---------------------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: str,
    strict: bool = True,
    time_buckets: int | None = None,
) -> DataFrame:
    """Generic as-of join: for each left row, attach ``payload`` from
    the right row with the greatest ``right_ts`` <(=) ``left_ts``
    within the same ``on`` key.

    Spark has no ASOF JOIN; the naive inequality join degenerates to a
    per-key cross product. This is the **union + ordered window**
    rewrite: tag both sides, union by name, and carry the last non-null
    payload forward with ``last_value(ignorenulls)`` over
    (key, ts, side) ordering. One shuffle on the key — the same cost
    as a groupBy — and no pairwise comparisons at all, so it holds at
    100 TB where the key cardinality, not the time density, sets the
    partition count.

    ``side`` ordering encodes strictness: right rows sort AFTER left
    rows at equal ts when ``strict`` (payload at ts == left_ts is not
    yet visible), BEFORE when inclusive.

    **Skew**: the window partitions by the key, and AQE's skew-join
    split does NOT apply to window partitions — a key carrying 30% of
    the rows is one task doing 30% of the work (sort spills keep it
    alive, but it straggles). ``time_buckets=N`` switches to the
    SKEW-RESISTANT two-phase form: rows are range-bucketed by
    timestamp (one extra min/max job), a running last is computed per
    (key, bucket) — bounding any task at ~hot_key/N rows — bucket
    finals are rolled per key (N rows per key, never data volume),
    and each row coalesces its in-bucket running value with the
    carry-in from earlier buckets. Identical results by construction
    (equal timestamps share a bucket, so side-ordering still decides
    strictness); the trade is one extra aggregate + a co-partitioned
    join back.
    """
    r_side = F.lit(1 if strict else -1)
    lt = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(right.schema[payload].dataType).alias("__payload"),
        "*",
    )
    rt = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        r_side.alias("__side"),
        F.col(payload).alias("__payload"),
    )
    for c in left.columns:
        rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = lt.unionByName(rt)
    if time_buckets is None:
        w = (
            Window.partitionBy("__k")
            .orderBy("__ts", "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            unioned.withColumn(
                "__asof", F.last("__payload", ignorenulls=True).over(w)
            )
            .filter(F.col("__side") == 0)
            .drop("__k", "__ts", "__side", "__payload")
        )
    return _asof_bucketed(unioned, time_buckets)


def _asof_bucketed(unioned: DataFrame, time_buckets: int) -> DataFrame:
    """The two-phase skew-resistant body of :func:`asof_join` (see its
    docstring). Range buckets come from the GLOBAL ts min/max (one
    bounded aggregate job — two scalars to the driver); timestamps
    bucket on epoch micros, numerics on their own scale. NULL
    timestamps form their own bucket that sorts FIRST (matching the
    single-window form's null-first ordering: they see no carry-in and
    contribute none)."""
    t = unioned.schema["__ts"].dataType.typeName()
    ts_num = (
        F.unix_micros(F.col("__ts").cast("timestamp"))
        if t in ("timestamp", "timestamp_ntz", "date")
        else F.col("__ts").cast("double")
    )
    tagged = unioned.withColumn("__tsn", ts_num)
    mn, mx = tagged.agg(
        F.min("__tsn"), F.max("__tsn")
    ).first()
    if mn is None or mn == mx:
        bucket = F.lit(0)
    else:
        bucket = F.width_bucket(
            F.col("__tsn"), F.lit(mn), F.lit(mx) + 1, F.lit(time_buckets)
        )
    part1 = tagged.withColumn("__b", bucket).drop("__tsn")
    w1 = (
        Window.partitionBy("__k", "__b")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_run = part1.withColumn(
        "__run", F.last("__payload", ignorenulls=True).over(w1)
    )
    # bucket final = the running value at the bucket's last (ts, side)
    # row; max_by on the struct matches w1's ordering exactly
    finals = with_run.groupBy("__k", "__b").agg(
        F.max_by("__run", F.struct("__ts", "__side")).alias("__final")
    )
    w2 = (
        Window.partitionBy("__k")
        .orderBy(F.col("__b").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = finals.withColumn(
        "__carry", F.last("__final", ignorenulls=True).over(w2)
    ).select("__k", "__b", "__carry")
    return (
        with_run.join(carries, ["__k", "__b"], "left")
        .withColumn("__asof", F.coalesce("__run", "__carry"))
        .filter(F.col("__side") == 0)
        .drop("__k", "__ts", "__side", "__payload", "__b", "__run", "__carry")
    )


@register(
    "asof_join_last_click",
    """
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT e.event_id AS event_id, e.user_id AS user_id,
           c.click_id AS last_click_id
    FROM events e
    ASOF LEFT JOIN clicks c
      ON e.user_id = c.user_id AND e.ts > c.ts
    """,
    doc="As-of join via union+window (no inequality join in the plan), "
    "proven against DuckDB's native ASOF JOIN implementation.",
    headline=True,
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    joined = asof_join(
        e.select("event_id", "user_id", "ts"),
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload="click_id",
        strict=True,
    )
    return joined.select(
        "event_id", "user_id", F.col("__asof").alias("last_click_id")
    )


# ---------------------------------------------------------------------------
# Range join (bucketed: equi-join on time buckets, then exact filter)
# ---------------------------------------------------------------------------


@part(
    "range_join_followups",
    """
    SELECT a.event_id AS click_id, b.event_id AS followup_id,
           CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS delta_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 60 SECONDS
     AND a.event_type = 'click' AND b.event_type = 'purchase'
    """,
    doc="Range join (pairs within a 60s window) via the bucketed "
    "rewrite: equi-join on (user, minute bucket) with each left row "
    "probing bucket m and m+1, exact interval filter after. The "
    "oracle runs DuckDB's genuine inequality join; the Spark plan "
    "contains only hash equi-joins (work ~ bucket density, not n^2).",
)
def range_join_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("a_ts"),
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("followup_id"),
        F.col("user_id"),
        F.col("ts").alias("b_ts"),
        F.floor(F.unix_micros(F.col("ts")) / 60_000_000).alias("bucket"),
    )
    # each click probes its own minute bucket and the next one
    probes = clicks.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.floor(F.unix_micros(F.col("a_ts")) / 60_000_000),
                F.floor(F.unix_micros(F.col("a_ts")) / 60_000_000) + 1,
            )
        ),
    )
    delta = F.unix_micros(F.col("b_ts")) - F.unix_micros(F.col("a_ts"))
    return (
        probes.join(buys, ["user_id", "bucket"])
        .filter((delta > 0) & (delta <= 60_000_000))
        .select(
            "click_id",
            "followup_id",
            delta.alias("delta_us"),
        )
    )


@part(
    "interval_containment_join",
    """
    WITH daily AS (
      SELECT date_trunc('day', l_shipdate) AS d, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1
    )
    SELECT o.o_orderkey AS o_orderkey,
           CAST(COALESCE(SUM(daily.n), 0) AS BIGINT) AS n_shipped_in_window
    FROM orders o LEFT JOIN daily
      ON daily.d >= date_trunc('day', o.o_orderdate)
     AND daily.d < date_trunc('day', o.o_orderdate) + INTERVAL 7 DAY
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderkey
    """,
    doc="Uncorrelated interval-containment COUNT, day grain: every "
    "finished order's 7-day window counts ALL lineitem shipments "
    "whose ship day falls inside it (no shared key — the shape naive "
    "plans turn into |intervals| x |probes|). SCALE LESSON, measured: "
    "the first implementation bucket-joined raw probe ROWS to "
    "intervals — candidate volume n*m/#buckets, a PRODUCT, because "
    "the bucket count is fixed by the time range; 1.7M candidates at "
    "sf0.01 became ~174M at sf1 (430 s). The fix is aggregate-THEN-"
    "join: probes collapse to per-day counts first (one map-side-"
    "combining pass; the result is TIME-RANGE-sized, ~2400 rows at "
    "any SF, hence broadcastable), each interval explodes to exactly "
    "its 7 covered days, and the hash join carries counts, not rows "
    "— 350k candidates at sf1, 430 s -> ~2 s, and the join side "
    "stays constant-size at 100 TB. Windows with no shipments keep "
    "their zero via COALESCE over the LEFT join. Sub-day interval "
    "endpoints would add an exact per-row pass for the two boundary "
    "days (the standard decomposition); this part's semantics are "
    "day-grain by definition, stated in the oracle.",
)
def interval_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", F.date_trunc("day", "o_orderdate").alias("d0"))
    daily = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("day", "l_shipdate").alias("d"))
        .agg(F.count("*").alias("n"))
    )
    win = o.withColumn(
        "d",
        F.explode(
            F.sequence(
                F.col("d0"),
                F.col("d0") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ),
    )
    return (
        win.join(F.broadcast(daily), "d", "left")
        .groupBy("o_orderkey")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0))
            .cast("long")
            .alias("n_shipped_in_window")
        )
    )


@part(
    "interval_subday_count",
    """
    WITH iv AS (
      SELECT user_id, MIN(ts) AS s, MIN(ts) + INTERVAL 36 HOUR AS e
      FROM events GROUP BY user_id
    )
    SELECT iv.user_id AS user_id,
           CAST(COUNT(p.ts) AS BIGINT) AS n_in_window
    FROM iv LEFT JOIN events p ON p.ts >= iv.s AND p.ts < iv.e
    GROUP BY iv.user_id
    """,
    doc="Interval containment with SUB-DAY endpoints: each user's "
    "[first_event, +36h) window counts ALL events inside it (no "
    "shared key). The day-grain part above defines sub-day endpoints "
    "away; this one resolves them exactly via the boundary-day "
    "decomposition (operators/temporal.py): interior days from the "
    "broadcastable per-day aggregate, the <= 2 partial boundary days "
    "row-exactly after a day-bucketed join — candidate volume stays "
    "linear where the oracle's theta-join (DuckDB IEJoin) is free to "
    "be quadratic.",
)
def interval_subday_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.operators import temporal

    e = table(spark, sf_dir, "events")
    iv = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("s"))
        .withColumn("e", F.col("s") + F.expr("INTERVAL 36 HOURS"))
    )
    return temporal.interval_count_join(iv, e, "user_id", "s", "e", "ts")


@part(
    "pit_dimension_join",
    """
    WITH versions AS (
      SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal,
             TIMESTAMP '1992-01-01' AS valid_from,
             CASE WHEN c_custkey % 2 = 0 THEN TIMESTAMP '1996-07-01' END AS valid_to,
             CAST(1 AS BIGINT) AS version
      FROM customer
      UNION ALL
      SELECT c_custkey, ROUND(c_acctbal + 100.0, 2),
             TIMESTAMP '1996-07-01', NULL, 2
      FROM customer WHERE c_custkey % 2 = 0
    )
    SELECT o.o_orderkey AS o_orderkey, v.version AS version,
           v.acctbal AS acctbal_at_order
    FROM orders o JOIN versions v
      ON o.o_custkey = v.c_custkey
     AND o.o_orderdate >= v.valid_from
     AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
    """,
    doc="Point-in-time (PIT) dimension join — the warehouse temporal "
    "lookup: each fact row joins the SCD2 version whose validity "
    "interval contains the fact timestamp. The dimension here is a "
    "deterministic two-version history (even customers change balance "
    "at 1996-07-01). Plan shape: hash equi-join on the customer key "
    "with the interval predicate as a post-join filter — correct "
    "because versions-per-key is bounded and non-overlapping (each "
    "fact keeps exactly one), so candidate fan-out is versions-per-"
    "key, never data-sized; this is how Delta/Iceberg PIT lookups "
    "execute too. Exactly one output row per order, plan-gated "
    "against nested-loop degeneration.",
)
def pit_dimension_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    v1 = c.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("1992-01-01").cast("timestamp").alias("valid_from"),
        F.when(
            F.col("c_custkey") % 2 == 0,
            F.lit("1996-07-01").cast("timestamp"),
        ).alias("valid_to"),
        F.lit(1).cast("long").alias("version"),
    )
    v2 = c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("acctbal"),
        F.lit("1996-07-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(2).cast("long").alias("version"),
    )
    versions = v1.unionByName(v2)
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    active = (
        (F.col("o_orderdate") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("o_orderdate") < F.col("valid_to")))
    )
    return (
        o.join(versions, o["o_custkey"] == versions["c_custkey"])
        .filter(active)
        .select(
            "o_orderkey", "version", F.col("acctbal").alias("acctbal_at_order")
        )
    )


# ---------------------------------------------------------------------------
# Time-range window frame (rolling 30-day spend)
# ---------------------------------------------------------------------------


@part(
    "rolling_30d_spend",
    """
    SELECT o_orderkey AS o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
           ), 0) AS BIGINT) AS spend_30d
    FROM orders
    """,
    doc="RANGE window frame keyed by time: per-customer rolling 30-day "
    "spend. Spark expresses the interval frame as rangeBetween over "
    "epoch seconds; DuckDB uses a native INTERVAL RANGE frame. Money "
    "summed as DECIMAL(18,2) — same .5-knife-edge rationale as "
    "window_running_sum.",
)
def rolling_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    spend = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
    return o.select(
        "o_orderkey",
        F.round(spend, 0).cast("long").alias("spend_30d"),
    )


# ---------------------------------------------------------------------------
# Salted two-phase aggregation (skew pattern)
# ---------------------------------------------------------------------------


@part(
    "salted_agg_two_phase",
    """
    SELECT event_type AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(value), 0) AS BIGINT) AS total_value
    FROM events GROUP BY event_type
    """,
    doc="Skew-resistant aggregation: phase 1 groups by (key, salt) — "
    "16-way split of each hot key across partitions — phase 2 merges "
    "partials by key. Result identical to the plain groupBy (the "
    "oracle); the pattern is what survives a power-law key at 100 TB "
    "when AQE skew handling alone is not enough (e.g. for "
    "high-cardinality partial states).",
)
def salted_agg_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    salted = e.withColumn("__salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "__salt").agg(
        F.count("*").alias("pn"), F.sum("value").alias("pv")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pv"), 0).cast("long").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles per group
# ---------------------------------------------------------------------------


@part(
    "percentiles_by_segment",
    """
    SELECT c_mktsegment AS c_mktsegment,
           ROUND(quantile_cont(c_acctbal, 0.25), 4) AS p25,
           ROUND(quantile_cont(c_acctbal, 0.50), 4) AS p50,
           ROUND(quantile_cont(c_acctbal, 0.90), 4) AS p90
    FROM customer GROUP BY c_mktsegment
    """,
    doc="Exact linear-interpolation percentiles per group (Spark "
    "percentile vs DuckDB quantile_cont — independent exact "
    "implementations). At 100 TB swap for approx_percentile with a "
    "bounded error; the exact form is the correctness anchor.",
)
def percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.percentile("c_acctbal", 0.25), 4).alias("p25"),
        F.round(F.percentile("c_acctbal", 0.50), 4).alias("p50"),
        F.round(F.percentile("c_acctbal", 0.90), 4).alias("p90"),
    )


# ---------------------------------------------------------------------------
# Array lateral view / table function
# ---------------------------------------------------------------------------


@part(
    "posexplode_embedding_head",
    """
    SELECT vec_id AS vec_id,
           CAST(g.i - 1 AS INT) AS pos,
           ROUND(CAST(v.head[CAST(g.i AS INT)] AS DOUBLE), 6) AS val
    FROM (SELECT vec_id, embedding[1:4] AS head FROM embeddings WHERE vec_id < 50) v,
         generate_series(1, 4) AS g(i)
    WHERE CAST(g.i AS INT) <= len(v.head)
    """,
    doc="Lateral array expansion with ordinality: posexplode vs a "
    "DuckDB lateral generate_series index join over the first 4 dims.",
)
def posexplode_embedding_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return emb.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("pos", "v")
    ).select(
        "vec_id",
        F.col("pos").cast("int"),
        F.round(F.col("v").cast("double"), 6).alias("val"),
    )


@part(
    "array_functions_embeddings",
    """
    SELECT vec_id AS vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS vmax,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS vmin,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(CAST(list_reverse(embedding)[1] AS DOUBLE), 6) AS last_val,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
    FROM embeddings WHERE vec_id < 200
    """,
    doc="Array function suite over array<float>: size, min/max, "
    "element_at, reverse, higher-order filter count.",
)
def array_functions_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    arr = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(arr).alias("dim"),
        F.round(F.array_max(arr).cast("double"), 6).alias("vmax"),
        F.round(F.array_min(arr).cast("double"), 6).alias("vmin"),
        F.round(F.element_at(arr, 1).cast("double"), 6).alias("first_val"),
        F.round(F.element_at(F.reverse(arr), 1).cast("double"), 6).alias("last_val"),
        F.size(F.filter(arr, lambda x: x > 0)).alias("n_positive"),
    )


@part(
    "array_hof_semantics",
    """
    SELECT vec_id AS vec_id,
      CAST(CASE WHEN len(list_filter(embedding, x -> x > 0.9)) > 0
           THEN 1 ELSE 0 END AS BIGINT) AS has_big,
      CAST(CASE WHEN len(list_filter(embedding, x -> NOT (x > -10))) = 0
           THEN 1 ELSE 0 END AS BIGINT) AS all_sane,
      ROUND(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * x)), 4) AS sq_sum,
      ROUND(list_sum(list_transform(
            list_zip(embedding, list_reverse(embedding)),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 4) AS pal_dot
    FROM embeddings WHERE vec_id % 17 = 0
    """,
    doc="The higher-order-function family as SEMANTIC surface: "
    "exists / forall (quantifiers), aggregate (left fold), transform "
    "and zip_with (the palindromic self-dot exercises two-array "
    "lambdas) — oracled against DuckDB's list_* lambdas. NOTE the "
    "perf contract documented in cleaning.py/BASELINE.md: HOFs run "
    "interpreted and hot paths reformulate as explode + codegen'd "
    "aggregates; this part pins the semantics, not the plan shape.",
)
def array_hof_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 17 == 0)
    arr = F.col("embedding")
    dbl = lambda c: c.cast("double")  # noqa: E731
    return emb.select(
        "vec_id",
        F.exists(arr, lambda x: x > 0.9).cast("long").alias("has_big"),
        F.forall(arr, lambda x: x > -10).cast("long").alias("all_sane"),
        F.round(
            F.aggregate(arr, F.lit(0.0), lambda a, x: a + dbl(x) * dbl(x)), 4
        ).alias("sq_sum"),
        F.round(
            F.aggregate(
                F.zip_with(arr, F.reverse(arr), lambda a, b: dbl(a) * dbl(b)),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            4,
        ).alias("pal_dot"),
    )


# ---------------------------------------------------------------------------
# Approximate distinct (sketch; rows-only — algorithms differ by design)
# ---------------------------------------------------------------------------


@part(
    "approx_distinct_users",
    """
    SELECT event_type AS event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS INT) AS within_bound
    FROM events GROUP BY event_type
    """,
    doc="HyperLogLog++ approximate distinct users per event_type, "
    "oracle-checked as an error envelope: the sketch estimate is not "
    "portable across engines, so the query emits the exact count plus "
    "a within_bound flag (|approx-exact| <= max(3, 5% of exact)); the "
    "oracle asserts the flag is 1 for every group — a bound violation "
    "hash-mismatches and fails the row.",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", rsd=0.02)
    exact = F.count_distinct("user_id")
    bound = F.greatest(F.lit(3.0), 0.05 * exact)
    return e.groupBy("event_type").agg(
        exact.alias("exact_users"),
        (F.abs(approx - exact) <= bound).cast("int").alias("within_bound"),
    )


@part(
    "approx_percentile_envelope",
    """
    SELECT event_type AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(value, 0.5), 6) AS exact_p50,
           CAST(1 AS INT) AS within_bound
    FROM events GROUP BY event_type
    """,
    doc="Approximate percentiles (the GK-style mergeable quantile "
    "sketch behind percentile_approx — single-pass, partial-agg "
    "mergeable, the 100 TB quantile shape) oracle-checked as an error "
    "envelope like the HLL part: the sketch value is not portable "
    "across engines, so the query emits the EXACT p50 (linear "
    "interpolation — identical definition to DuckDB quantile_cont) "
    "plus a within_bound flag checked in RANK space: the sketch "
    "guarantees an element within n/accuracy ranks of the target, so "
    "each approx percentile's occupied rank interval [count(<)+1, "
    "count(<=)] must intersect [p*n - n/1000 - 1, p*n + n/1000 + 1] "
    "(the +-1 absorbs rank-definition ambiguity). A value-space "
    "envelope (exact percentiles at p +- eps) was wrong for groups "
    "under ~1.5/eps rows, where the interpolated bound can exclude "
    "every actual element; rank space is exact at any group size. "
    "The oracle asserts flag 1, so a sketch straying outside its "
    "guarantee hash-mismatches.",
)
def approx_percentile_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    pcts = [0.25, 0.5, 0.9]
    approx = e.groupBy("event_type").agg(
        F.percentile_approx("value", pcts, 1000).alias("ap")
    )
    joined = e.join(F.broadcast(approx), "event_type")
    conds = []
    for i in range(len(pcts)):
        a = F.element_at(F.col("ap"), i + 1)
        conds.append(
            F.sum((F.col("value") < a).cast("long")).alias(f"lt{i}")
        )
        conds.append(
            F.sum((F.col("value") <= a).cast("long")).alias(f"le{i}")
        )
    agg = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", 0.5), 6).alias("exact_p50"),
        *conds,
    )
    within = F.lit(True)
    for i, p in enumerate(pcts):
        target = F.lit(p) * F.col("n")
        slack = F.col("n") / F.lit(1000.0) + F.lit(1.0)
        # occupied rank interval [lt+1, le] vs target +- slack
        within = (
            within
            & (F.col(f"le{i}") >= target - slack)
            & (F.col(f"lt{i}") + 1 <= target + slack)
        )
    return agg.select(
        "event_type",
        "n",
        "exact_p50",
        within.cast("int").alias("within_bound"),
    )


@part(
    "lateral_topn_orders",
    """
    SELECT c.c_custkey AS c_custkey, t.o_orderkey AS o_orderkey,
           t.o_totalprice AS o_totalprice
    FROM customer c JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t ON TRUE
    """,
    doc="Correlated LATERAL top-N: each customer's two largest orders "
    "via a correlated ORDER BY ... LIMIT subquery — the lateral-join "
    "shape engines must decorrelate into a per-key ranked join "
    "(Catalyst rewrites the correlated limit; the naive plan would "
    "re-run the subquery per outer row). Deterministic (price, "
    "orderkey) tiebreak; same text runs verbatim on DuckDB's native "
    "LATERAL. The window row_number form elsewhere in the registry "
    "is the equivalent hand-rewrite — this part checks the engine's "
    "OWN decorrelation produces identical rows.",
)
def lateral_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.sources.catalog import register_views

    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey AS c_custkey, t.o_orderkey AS o_orderkey,
               t.o_totalprice AS o_totalprice
        FROM customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t ON TRUE
        """
    )


@part(
    "bitmap_distinct_users",
    """
    SELECT event_type AS event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="EXACT-but-mergeable distinct via bitmap aggregation — the "
    "bitmap-index counterpart to the HLL sketch: ids map to (bucket, "
    "bit position), bitmap_construct_agg builds one fixed-size bitmap "
    "per (group, bucket), bitmap_or_agg ORs buckets into the group "
    "bitmap, bitmap_count reads the answer. Like HLL the partial "
    "state is small, mergeable, and map-side combines — unlike HLL "
    "the count is exact, at the cost of state proportional to the id "
    "DOMAIN (32k bits per bucket), the right trade for dense integer "
    "key spaces. Spark's bitmap functions are 1-based (position "
    "(x-1) mod 32768), so ids shift by +1 — a bijection, count "
    "unchanged, without it user_id=0 would silently vanish. Oracle "
    "is the plain exact COUNT DISTINCT, so any dropped or "
    "double-counted id hash-mismatches.",
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") + 1).alias("__uid")
    )
    per_bucket = e.groupBy(
        "event_type", F.expr("bitmap_bucket_number(__uid)").alias("__bkt")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(__uid))").alias("__bm"))
    return per_bucket.groupBy("event_type").agg(
        F.expr("bitmap_count(bitmap_or_agg(__bm))").alias("n_users")
    )


@part(
    "sketch_heavy_hitters",
    """
    SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS est_count
    FROM events WHERE event_type IS NOT NULL GROUP BY event_type
    """,
    doc="Heavy hitters via approx_top_k: single-pass mergeable "
    "frequent-items sketch, k=100 over event_type. The exact-count "
    "oracle relies on distinct(event_type) <= k <= maxItemsTracked — "
    "k returns every type and under-capacity tracking makes the "
    "counts exact; k is set well above the testdata's cardinality so "
    "a testdata change degrades the envelope visibly rather than "
    "silently truncating the row set. Past capacity the sketch "
    "degrades gracefully to approximate top-k — the single-pass "
    "mergeable shape is what a 100 TB vocabulary/label scan needs "
    "(no second aggregation over the full data).",
)
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.agg(F.expr("approx_top_k(event_type, 100)").alias("tk"))
        .select(F.explode("tk").alias("x"))
        .select(
            F.col("x.item").alias("item"),
            F.col("x.count").cast("long").alias("est_count"),
        )
    )


@part(
    "sketch_hll_union",
    """
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_global,
           CAST(1 AS INT) AS within_bound
    FROM events
    """,
    doc="Sketch MERGEABILITY — the property that matters at 100 TB: "
    "per-group Apache DataSketches HLL sketches (hll_sketch_agg) "
    "union into a global estimate (hll_union_agg -> "
    "hll_sketch_estimate) without re-scanning rows, the same way "
    "partial aggregates merge across executors or daily partitions "
    "merge into a monthly rollup. Envelope oracle: the unioned "
    "estimate must land within max(3, 5%) of the exact global "
    "distinct, asserted via the within_bound flag.",
)
def sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    per_group = e.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    unioned = per_group.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    exact = e.agg(F.count_distinct("user_id").cast("long").alias("exact_global"))
    return exact.crossJoin(F.broadcast(unioned)).select(
        "exact_global",
        (
            F.abs(F.col("est") - F.col("exact_global"))
            <= F.greatest(F.lit(3.0), 0.05 * F.col("exact_global"))
        )
        .cast("int")
        .alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# Bag-semantics set ops, map functions, SQL-path EXISTS
# ---------------------------------------------------------------------------


@part(
    "set_ops_bag_semantics",
    """
    SELECT k AS k, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT o_custkey AS k FROM orders
      INTERSECT ALL
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    ) GROUP BY k
    """,
    doc="INTERSECT ALL (bag semantics: multiplicity = min of the two "
    "sides) — distinct from the set-semantics INTERSECT already "
    "covered; compiles to a counted join, one shuffle per side.",
)
def set_ops_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    left = o.select(F.col("o_custkey").alias("k"))
    right = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    )
    return left.intersectAll(right).groupBy("k").agg(F.count("*").alias("n"))


@part(
    "map_functions_events",
    """
    SELECT event_id AS event_id,
           CAST(cardinality(m) AS INT) AS n_keys,
           m['type'][1] AS type_val,
           array_to_string(map_keys(m), ',') AS keys_csv
    FROM (
      SELECT event_id,
             MAP(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)]) AS m
      FROM events WHERE event_id < 500
    )
    """,
    doc="MapType columns: construction from arrays, size, key lookup, "
    "key enumeration — Spark map_from_arrays/element_at vs DuckDB MAP.",
)
def map_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("uid")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    return e.select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.element_at(m, "type").alias("type_val"),
        F.concat_ws(",", F.map_keys(m)).alias("keys_csv"),
    )


@part(
    "variant_typed_extract",
    """
    SELECT event_id AS event_id,
           CAST(json_extract_string(j, '$.u') AS BIGINT) AS u_val,
           CAST(json_extract_string(j, '$.a[1]') AS BIGINT) AS a1_val,
           json_extract_string(j, '$.m.t') AS type_val,
           'OBJECT<a: ARRAY<BIGINT>, m: OBJECT<t: STRING>, u: BIGINT>'
             AS var_schema,
           CAST(NULL AS BIGINT) AS miss_val
    FROM (
      SELECT event_id,
             '{"u":' || CAST(user_id AS VARCHAR)
               || ',"m":{"t":"' || event_type
               || '"},"a":[' || json_extract_string(props, '$.k')
               || ',' || CAST(CAST(json_extract_string(props, '$.k')
                                   AS BIGINT) * 2 AS VARCHAR) || ']}' AS j
      FROM events WHERE event_id % 7 = 0
    )
    """,
    doc="Spark 4 VARIANT type: parse_json into an open semi-structured "
    "value, typed path extraction with variant_get (object fields, "
    "nested objects, array indexing), try_variant_get returning NULL "
    "on a missing path instead of throwing (ANSI-safe), and "
    "schema_of_variant inferring the per-row shape. The binary "
    "variant encoding stays JVM-side end to end — no UDF, no string "
    "re-parse per path. Oracle: DuckDB JSON extraction over the same "
    "synthesized document (the inferred-schema string is a constant "
    "because every row shares one shape).",
)
def variant_typed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    k = F.get_json_object("props", "$.k")
    j = F.concat(
        F.lit('{"u":'), F.col("user_id").cast("string"),
        F.lit(',"m":{"t":"'), F.col("event_type"),
        F.lit('"},"a":['), k,
        F.lit(","), (k.cast("long") * 2).cast("string"), F.lit("]}"),
    )
    v = F.parse_json(j)
    return e.select(
        "event_id",
        F.variant_get(v, "$.u", "bigint").alias("u_val"),
        F.variant_get(v, "$.a[1]", "bigint").alias("a1_val"),
        F.variant_get(v, "$.m.t", "string").alias("type_val"),
        F.schema_of_variant(v).alias("var_schema"),
        F.try_variant_get(v, "$.missing", "bigint").alias("miss_val"),
    )


@part(
    "variant_shredded_agg",
    """
    SELECT event_type AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6)
             AS k_avg
    FROM events GROUP BY event_type
    """,
    doc="VARIANT values flowing through aggregation: parse once, "
    "extract a typed numeric with variant_get, aggregate JVM-side "
    "(map-side partials intact — the variant column is pruned to the "
    "single extracted path before the shuffle, the shredded-read "
    "access pattern).",
)
def variant_shredded_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    kv = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        e.select("event_type", kv.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("k_sum"),
            F.round(F.avg("k"), 6).alias("k_avg"),
        )
    )


@part(
    "xml_roundtrip_extract",
    """
    SELECT p_partkey AS p_partkey,
           p_brand AS brand_struct,
           p_brand AS brand_xpath,
           CAST(p_size AS BIGINT) AS size_val,
           CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS price_cents
    FROM part WHERE p_partkey % 11 = 0
    """,
    doc="Spark 4 XML support: synthesize a per-row XML document from "
    "part columns, then recover typed fields BOTH ways — from_xml "
    "into a struct (attribute + element fields) and the xpath_* "
    "scalar family — all JVM-side expressions. The oracle states the "
    "ground truth straight from the source columns, so any drift in "
    "the build->parse->extract roundtrip (escaping, attribute "
    "handling, numeric coercion) breaks the hash.",
)
def xml_roundtrip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") % 11 == 0)
    xml = F.concat(
        F.lit('<part id="'), F.col("p_partkey").cast("string"),
        F.lit('"><brand>'), F.col("p_brand"),
        F.lit("</brand><size>"), F.col("p_size").cast("string"),
        F.lit("</size><price>"),
        F.round(F.col("p_retailprice"), 2).cast("string"),
        F.lit("</price></part>"),
    )
    parsed = F.from_xml(
        xml, "struct<_id: bigint, brand: string, size: bigint, price: double>"
    )
    return (
        table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 11 == 0)
        .select(
            parsed.alias("px"),
            F.xpath_string(xml, F.lit("/part/brand")).alias("brand_xpath"),
        )
        .select(
            F.col("px._id").alias("p_partkey"),
            F.col("px.brand").alias("brand_struct"),
            "brand_xpath",
            F.col("px.size").alias("size_val"),
            F.round(F.col("px.price") * 100, 0).cast("bigint").alias("price_cents"),
        )
    )


@part(
    "sql_udf_scalar",
    """
    SELECT band AS band,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents_sum
    FROM (
      SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                  WHEN o_totalprice < 250000 THEN 'mid'
                  ELSE 'high' END AS band,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 3 = 0
    ) GROUP BY band
    """,
    doc="Declarative SQL UDFs (Spark 4.1 CREATE FUNCTION ... RETURN) "
    "+ parameterized SQL: two scalar SQL functions (a CASE band and "
    "an exact-cents conversion) defined in SQL, invoked from a "
    "parameterized query bound via spark.sql(args=...) named "
    "parameters. SQL UDFs are inlined by Catalyst into the plan — "
    "whole-stage codegen, no Python boundary, unlike a Python UDF "
    "doing the same — so they cost nothing at 100 TB. The oracle "
    "inlines the function bodies by hand.",
)
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.sources.catalog import register_views

    register_views(spark, sf_dir, "orders")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sg_price_band(p DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN p < :lo THEN 'low' "
        "WHEN p < :hi THEN 'mid' ELSE 'high' END",
        args={"lo": 100000.0, "hi": 250000.0},
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sg_cents(p DOUBLE) "
        "RETURNS BIGINT RETURN CAST(ROUND(p * 100, 0) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS cents_sum
        FROM (SELECT sg_price_band(o_totalprice) AS band,
                     sg_cents(o_totalprice) AS cents
              FROM orders WHERE o_orderkey % :m = 0)
        GROUP BY band
        """,
        args={"m": 3},
    )


_RECURSIVE_ANCESTORS_SQL = """
    WITH RECURSIVE chain(leaf, node, depth) AS (
      SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey % 37 = 0
      UNION ALL
      SELECT c.leaf, CAST(FLOOR(c.node / 4.0) AS BIGINT), c.depth + 1
      FROM chain c WHERE c.node > 0
    )
    SELECT ch.leaf AS part_id,
           CAST(MAX(ch.depth) AS BIGINT) AS hops_to_root,
           CAST(COUNT(p.p_partkey) AS BIGINT) AS real_ancestors,
           CAST(ROUND(SUM(p.p_retailprice), 0) AS BIGINT) AS anc_price_sum
    FROM chain ch LEFT JOIN part p
      ON p.p_partkey = ch.node AND ch.depth > 0
    GROUP BY ch.leaf
    """


@part(
    "recursive_cte_ancestors",
    _RECURSIVE_ANCESTORS_SQL,
    doc="Recursive CTE (Spark 4.1 WITH RECURSIVE): walk the synthetic "
    "quaternary part hierarchy (parent = partkey div 4) from seed "
    "leaves to the root, then join the visited ancestor set back to "
    "part and roll up depth/coverage/price. The SAME statement text "
    "runs on DuckDB — iteration count is data-driven (log4 of the key "
    "space, so depth grows logarithmically with SF while the row "
    "count stays seeds x depth, linear-ish). Exercises the engine's "
    "iterative-plan execution (UnionLoop), not a window rewrite.",
)
def recursive_cte_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.sources.catalog import register_views

    register_views(spark, sf_dir, "part")
    return spark.sql(_RECURSIVE_ANCESTORS_SQL)


@part(
    "exists_subquery_sql",
    """
    SELECT c_custkey AS c_custkey, c_name AS c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
    """,
    doc="Correlated EXISTS / NOT EXISTS through the spark.sql parser "
    "path (decorrelated by Catalyst into semi/anti joins) — the same "
    "text runs verbatim on DuckDB.",
)
def exists_subquery_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.sources.catalog import register_views

    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey AS c_custkey, c_name AS c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
        """
    )


@part(
    "regexp_functions",
    """
    SELECT p_partkey AS p_partkey,
           CAST(len(regexp_extract_all(p_name, '[aeiou]+', 0)) AS INT) AS vowel_runs,
           regexp_extract(p_type, '^(\\w+)', 1) AS first_word,
           REGEXP_REPLACE(p_name, '\\s+', '-', 'g') AS dashed,
           CASE WHEN regexp_matches(p_name, '^[a-z]+ ') THEN 1 ELSE 0 END AS starts_word,
           split_part(p_type, ' ', 2) AS second_type_word
    FROM part WHERE p_partkey < 500
    """,
    doc="Regexp scalar-function breadth: count of pattern runs, group "
    "extraction, global replace, anchored match predicate (rlike), "
    "delimiter field pick — all JVM-side, all pushed-filter friendly.",
)
def regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]+"), F.lit(0))).alias(
            "vowel_runs"
        ),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r"\s+", "-").alias("dashed"),
        F.col("p_name").rlike("^[a-z]+ ").cast("int").alias("starts_word"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(2)).alias(
            "second_type_word"
        ),
    )


@part(
    "brand_cooccurrence",
    """
    WITH basket AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM basket a JOIN basket b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY a.p_brand, b.p_brand
    HAVING COUNT(*) >= 10
    """,
    doc="Market-basket co-occurrence: distinct (order, brand) baskets, "
    "self-join per order for brand pairs, support count with a "
    "frequency floor — the itemset-mining candidate step. The "
    "per-order self-join is bounded by basket width (brands per "
    "order), not corpus size, so work is sum(width^2) per order; the "
    "brand dimension joins broadcast.",
)
def brand_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    dim = F.broadcast(p.select("p_partkey", "p_brand"))
    basket = (
        li.join(dim, li["l_partkey"] == dim["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = basket.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = basket.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 10)
    )


@part(
    "cohort_retention",
    """
    WITH firsts AS (
      SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cohort
      FROM orders GROUP BY o_custkey
    ), activity AS (
      SELECT DISTINCT o.o_custkey, f.cohort,
             datediff('month', f.cohort, date_trunc('month', o.o_orderdate)) AS month_offset
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    )
    SELECT strftime(cohort, '%Y-%m') AS cohort_month,
           CAST(month_offset AS INT) AS month_offset,
           CAST(COUNT(*) AS BIGINT) AS active_customers
    FROM activity
    WHERE month_offset <= 6 AND cohort >= TIMESTAMP '1997-01-01'
                            AND cohort < TIMESTAMP '1998-01-01'
    GROUP BY cohort, month_offset
    """,
    doc="Cohort retention matrix: customers bucketed by first-order "
    "month, activity counted at each month offset — first-touch agg + "
    "broadcast-back join + distinct + matrix agg, the standard "
    "retention-analytics shape (all shuffles on o_custkey / the tiny "
    "cohort key).",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    activity = (
        o.join(firsts, "o_custkey")
        .select(
            "o_custkey",
            "cohort",
            F.months_between(
                F.date_trunc("month", F.col("o_orderdate")), F.col("cohort")
            )
            .cast("int")
            .alias("month_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(
            (F.col("month_offset") <= 6)
            & (F.col("cohort") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("cohort") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(
            F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
            "month_offset",
        )
        .agg(F.count("*").alias("active_customers"))
    )


@register(
    "window_function_suite",
    """
    SELECT o_orderkey AS o_orderkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drank,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS cheapest,
           ROUND(NTH_VALUE(o_totalprice, 3) OVER
             (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS third_cheapest
    FROM orders
    WHERE o_orderkey < 2000
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Ranking/distribution window functions beyond row_number: "
    "percent_rank, cume_dist, dense_rank, first_value, nth_value with "
    "an explicit rows frame — one sort per partition serves all six.",
)
def window_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.round(F.first_value("o_totalprice").over(w), 2).alias("cheapest"),
        F.round(F.nth_value("o_totalprice", 3).over(wf), 2).alias("third_cheapest"),
    )


@part(
    "scd2_customer_versions",
    """
    WITH updates AS (
      SELECT c_custkey,
             CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,1)), 2) AS DOUBLE) AS new_acctbal
      FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT c.c_custkey AS c_custkey, ver.acctbal AS acctbal,
           ver.valid_from AS valid_from, ver.is_current AS is_current
    FROM customer c
    LEFT JOIN updates u ON c.c_custkey = u.c_custkey, LATERAL (
      SELECT ROUND(c.c_acctbal, 2) AS acctbal, '2026-01-01' AS valid_from,
             CASE WHEN u.c_custkey IS NULL THEN 1 ELSE 0 END AS is_current
      UNION ALL
      SELECT u.new_acctbal, '2026-08-13', 1 WHERE u.c_custkey IS NOT NULL
    ) ver
    """,
    doc="SCD Type-2 versioning: applying an update batch to a "
    "dimension produces a closed historical row plus a current row per "
    "changed key, one unchanged current row otherwise — expressed as "
    "a left join + per-row version generator (no MERGE needed; "
    "re-expressible as Delta MERGE on a lakehouse). The simulated "
    "update (x1.1) multiplies in DECIMAL: double multiply-then-round "
    "hits .005 knife-edges where Spark's BigDecimal-repr rounding and "
    "binary rounding diverge (observed at sf0.1).",
)
def scd2_customer_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    bump = F.col("c_acctbal").cast("decimal(18,2)") * F.lit(1.1).cast("decimal(3,1)")
    updates = (
        c.filter(F.col("c_custkey") % 10 == 0)
        .select(
            F.col("c_custkey").alias("u_key"),
            F.round(bump, 2).cast("double").alias("new_acctbal"),
        )
    )
    joined = c.join(updates, c["c_custkey"] == updates["u_key"], "left")
    changed = joined.filter(F.col("u_key").isNotNull())
    unchanged = joined.filter(F.col("u_key").isNull())
    current_unchanged = unchanged.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("2026-01-01").alias("valid_from"),
        F.lit(1).alias("is_current"),
    )
    closed_old = changed.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("2026-01-01").alias("valid_from"),
        F.lit(0).alias("is_current"),
    )
    new_current = changed.select(
        "c_custkey",
        F.col("new_acctbal").alias("acctbal"),
        F.lit("2026-08-13").alias("valid_from"),
        F.lit(1).alias("is_current"),
    )
    return current_unchanged.unionByName(closed_old).unionByName(new_current)


@part(
    "salted_join_replicated",
    """
    SELECT o.o_orderkey AS o_orderkey, c.c_name AS c_name,
           CAST(ROUND(o.o_totalprice, 0) AS BIGINT) AS price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey < 3000
    """,
    doc="Explicit skew-salted join: the big (skewed) side salts its "
    "key with pmod(xxhash64(row-id), 8); the small side replicates "
    "each row across all 8 salt values; the join runs on "
    "(key, salt) so one hot key spreads over 8 partitions. Result "
    "identical to the plain join (the oracle). This is the manual "
    "fallback when AQE skew-split cannot help (e.g. the skewed side "
    "feeds a stateful op that pins partitioning).",
)
def salted_join_replicated(spark: SparkSession, sf_dir: str) -> DataFrame:
    SALT = 8
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    c = table(spark, sf_dir, "customer")
    big = o.withColumn("__salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(SALT)))
    small = c.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(SALT)]))
    )
    return (
        big.join(
            small,
            (big["o_custkey"] == small["c_custkey"])
            & (big["__salt"] == small["__salt"]),
        )
        .select(
            "o_orderkey",
            "c_name",
            F.round("o_totalprice", 0).cast("long").alias("price"),
        )
    )


@part(
    "unpivot_lineitem_measures",
    """
    SELECT l_orderkey AS l_orderkey, l_linenumber AS l_linenumber,
           measure AS measure, ROUND(val, 6) AS val
    FROM (
      UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
               FROM lineitem WHERE l_orderkey < 100)
      ON l_quantity, l_extendedprice, l_discount
      INTO NAME measure VALUE val
    )
    """,
    doc="Unpivot (wide -> long melt), the inverse of the pivot query: "
    "3 measure columns become (measure, val) rows — a zero-shuffle "
    "generator expansion in both engines.",
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    ).select(
        "l_orderkey", "l_linenumber", "measure", F.round("val", 6).alias("val")
    )


@part(
    "filtered_aggregates",
    """
    SELECT o_custkey AS o_custkey,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
           CAST(ROUND(SUM(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS BIGINT) AS urgent_spend
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 10
    """,
    doc="Conditional aggregation (SQL FILTER clause; count_if / "
    "sum(when) on the Spark side) — one pass, no per-condition "
    "subqueries or self-joins.",
)
def filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
            F.count_if(F.col("o_orderstatus") == "F").alias("n_filled"),
            F.round(
                F.sum(
                    F.when(
                        F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")
                    )
                ),
                0,
            )
            .cast("long")
            .alias("urgent_spend"),
            F.count("*").alias("__n"),
        )
        .filter(F.col("__n") >= 10)
        .drop("__n")
    )


@part(
    "value_histogram",
    """
    SELECT CAST(LEAST(GREATEST(FLOOR(value / 25.0), 0), 9) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(value), 6) AS lo,
           ROUND(MAX(value), 6) AS hi
    FROM events WHERE value IS NOT NULL
    GROUP BY 1
    """,
    doc="Fixed-width histogram (10 buckets of width 25, clamped) over "
    "event values — plain floor arithmetic so the binning is portable; "
    "one map-side-combining aggregation at any scale.",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bucket = F.least(
        F.greatest(F.floor(F.col("value") / 25.0), F.lit(0)), F.lit(9)
    ).cast("int")
    return e.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


@register(
    "null_semantics_suite",
    """
    SELECT event_id AS event_id,
           CASE WHEN props IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END AS props_null_safe,
           COALESCE(NULLIF(event_type, 'error'), 'recovered') AS coalesced_type,
           CASE WHEN value IS NULL THEN 'missing' ELSE 'present' END AS value_presence,
           CASE WHEN NULLIF(value, 0.0) IS NOT DISTINCT FROM NULLIF(value, 0.0)
                THEN 1 ELSE 0 END AS self_eq_null_safe
    FROM events WHERE event_id < 1000
    """,
    doc="Null-handling semantics: null-safe equality (<=> / IS NOT "
    "DISTINCT FROM), NULLIF, COALESCE, and three-valued-logic CASE — "
    "the subtle corners that diverge between engines if the planner "
    "simplifies them wrong.",
)
def null_semantics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    nz = F.nullif(F.col("value"), F.lit(0.0))
    return e.select(
        "event_id",
        F.col("props").eqNullSafe(F.lit(None)).cast("int").alias("props_null_safe"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("recovered")).alias(
            "coalesced_type"
        ),
        F.when(F.col("value").isNull(), "missing")
        .otherwise("present")
        .alias("value_presence"),
        nz.eqNullSafe(nz).cast("int").alias("self_eq_null_safe"),
    )


@part(
    "fuzzy_match_levenshtein",
    """
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE a.p_partkey < 300 AND b.p_partkey < 300
      AND levenshtein(a.p_name, b.p_name) <= 12
    """,
    doc="Fuzzy string matching: blocked self-join (equi-join on brand "
    "bounds the pair space — the record-linkage blocking pattern) with "
    "edit-distance verification. Both engines implement classic "
    "Levenshtein, so distances agree exactly.",
)
def fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    a = p.select(
        F.col("p_partkey").alias("id_a"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_a"),
    )
    b = p.select(
        F.col("p_partkey").alias("id_b"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_b"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "brand")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", dist)
        .filter(F.col("dist") <= 12)
        .select("id_a", "id_b", F.col("dist").cast("int"))
    )


# ---------------------------------------------------------------------------
# Custom aggregation (applyInPandas UDAF shape) + Python UDTF
# ---------------------------------------------------------------------------


@part(
    "udaf_mad_by_segment",
    """
    SELECT c_mktsegment AS c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MEDIAN(c_acctbal), 6) AS median,
           ROUND(MEDIAN(ABS(c_acctbal - m)), 6) AS mad
    FROM customer, (SELECT c_mktsegment AS seg, MEDIAN(c_acctbal) AS m
                    FROM customer GROUP BY 1) meds
    WHERE c_mktsegment = meds.seg
    GROUP BY c_mktsegment
    """,
    doc="Custom grouped aggregation (UDAF shape) via applyInPandas: "
    "median absolute deviation per segment — order statistics no "
    "built-in aggregate composes. Arrow-batched; one shuffle on the "
    "group key.",
)
def udaf_mad_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.operators.custom_agg import mad_by_group

    out = mad_by_group(table(spark, sf_dir, "customer"))
    return out.select(
        "c_mktsegment",
        "n",
        F.round("median", 6).alias("median"),
        F.round("mad", 6).alias("mad"),
    )


@part(
    "udtf_sentence_split",
    """
    SELECT doc_id AS doc_id,
           CAST(g.i - 1 AS INT) AS sentence_idx,
           rtrim(trim(parts[CAST(g.i AS INT)]), '.') AS sentence,
           CAST(len(string_split_regex(rtrim(trim(parts[CAST(g.i AS INT)]), '.'), '\\s+')) AS INT) AS n_words
    FROM (SELECT doc_id, string_split(text, '. ') AS parts
          FROM documents WHERE doc_id < 100) d,
         generate_series(1, 50) AS g(i)
    WHERE CAST(g.i AS INT) <= len(parts)
      AND rtrim(trim(parts[CAST(g.i AS INT)]), '.') <> ''
    """,
    doc="Python UDTF (Spark 4): one document row expands to typed "
    "(sentence_idx, sentence, n_words) rows via a lateral join; the "
    "oracle re-implements the expansion with SQL split+unnest.",
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.operators.custom_agg import split_sentences

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return split_sentences(d)


@part(
    "snapshot_table_lifecycle",
    """
    WITH o AS (SELECT * FROM orders WHERE o_orderkey % 2 = 1),
    f AS (SELECT * FROM o WHERE o_orderstatus = 'F'),
    fo AS (SELECT * FROM o WHERE o_orderstatus IN ('F', 'O')),
    urg AS (SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice
            FROM o WHERE o_orderpriority = '1-URGENT'),
    v2 AS (
      SELECT o_orderkey, o_totalprice FROM fo
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM urg)
      UNION ALL
      SELECT o_orderkey, o_totalprice FROM urg
    ),
    v3 AS (SELECT o_orderkey, o_totalprice FROM v2 WHERE o_orderkey % 10 <> 7),
    eq1 AS (SELECT o_orderkey FROM o
            WHERE o_orderpriority = '2-HIGH' AND o_orderkey % 3 = 0),
    eq2 AS (SELECT o_orderkey FROM o
            WHERE o_orderpriority = '3-MEDIUM' AND o_orderkey % 7 = 1),
    v4 AS (SELECT * FROM v3
           WHERE o_orderkey NOT IN (SELECT o_orderkey FROM eq1)),
    v5 AS (SELECT * FROM v4
           WHERE o_orderkey NOT IN (SELECT o_orderkey FROM eq2))
    SELECT 'v0' AS op, CAST(0 AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) AS total
    FROM f
    UNION ALL
    SELECT 'v1', 1, CAST(COUNT(*) AS BIGINT),
           CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) FROM fo
    UNION ALL
    SELECT 'v2', 2, CAST(COUNT(*) AS BIGINT),
           CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) FROM v2
    UNION ALL
    SELECT 'v3', 3, CAST(COUNT(*) AS BIGINT),
           CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) FROM v3
    UNION ALL
    SELECT 'v4', 4, CAST(COUNT(*) AS BIGINT),
           CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) FROM v4
    UNION ALL
    SELECT 'v5', 5, CAST(COUNT(*) AS BIGINT),
           CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) FROM v5
    UNION ALL
    SELECT 'vc', 6, CAST(COUNT(*) AS BIGINT),
           CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) FROM v5
    UNION ALL
    SELECT 'vo', 7, CAST(COUNT(*) AS BIGINT),
           CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) FROM v5
    """,
    doc="The snapshot-log lifecycle under the driver's value hash: "
    "commit filled orders (v0, declaring a PARQUET BLOOM FILTER on "
    "o_orderkey as a table property every later writer re-applies), "
    "append open orders (v1), file-grain "
    "COPY-ON-WRITE MERGE of urgent orders with +1000 totalprice (v2 "
    "— urgent rows replace or insert, untouched files carried by "
    "reference), MERGE-ON-READ deletion-vector delete of "
    "orderkey%10=7 (v3 — zero data files rewritten, readers apply "
    "the DV anti-join), two EQUALITY deletes (v4: high-priority "
    "key batch, v5: medium-priority — pure-metadata commits, "
    "per-entry broadcast key suppression on read), "
    "consolidate_eq_dvs (vc — the same-scope entries merge to one; "
    "the read must not change), then the incremental bin-packing "
    "OPTIMIZE (vo — every small file folds, outstanding DVs and eq "
    "entries MATERIALIZE into the packed files and their emptied "
    "entries drop; the read must again not change), TIME-TRAVELING "
    "every version and aggregating. Each eq-free version's n_rows is "
    "additionally cross-checked against count_snapshot — the "
    "METADATA-ONLY COUNT(*) from per-file manifest row counts with "
    "position-DV subtraction — a metadata/true-count divergence "
    "negates the row and fails the hash. The oracle restates all eight "
    "states in plain SQL over orders — any commit/merge/DV/"
    "eq-delete/consolidation/optimize/time-travel defect in "
    "sinks/table_log.py changes a version's rows and fails the hash.",
)
def snapshot_table_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from etl_property_rumah123_spark.sinks import table_log

    from etl_property_rumah123_spark.operators.common import scratch_base

    # 50% slice (odd orderkeys — every delete predicate still
    # intersects: %10=7 and %7=1 are odd-only, %3=0 keeps its odd
    # half): the lifecycle's correctness signal is per-OPERATION, not
    # per-byte, and the suite pays this part's commit phase on every
    # sweep — same cost rationale as the matview part's 25% slice.
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 2 == 1
    )
    tdir = (
        f"{scratch_base()}/sg_snapshot_part/"
        f"{os.path.basename(os.path.normpath(sf_dir))}"
    )
    jvm, fs = table_log._fs(spark, tdir)
    fs.delete(jvm.org.apache.hadoop.fs.Path(tdir), True)  # clean slate

    # the commit phase is many SMALL jobs over a scratch table —
    # right-size their shuffles (a 32-task join over a few thousand
    # rows is pure scheduling overhead; see common.scoped_conf)
    from etl_property_rumah123_spark.operators.common import scoped_conf

    with scoped_conf(spark, spark__sql__shuffle__partitions=4):
        table_log.commit_snapshot(
            orders.filter(F.col("o_orderstatus") == "F"), tdir,
            # table property: every later writer (merge/DV/eq/optimize)
            # re-applies the o_orderkey bloom to the files it writes
            bloom_cols=["o_orderkey"],
        )
        table_log.commit_snapshot(
            orders.filter(F.col("o_orderstatus") == "O"), tdir
        )
        urgent = orders.filter(
            F.col("o_orderpriority") == "1-URGENT"
        ).withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
        table_log.merge_snapshot(urgent, tdir, key="o_orderkey")
        table_log.delete_snapshot_dv(spark, tdir, "o_orderkey % 10 = 7")
        # v4 records per-file MATCHED counts (count_matched default):
        # the metadata-only COUNT(*) under an outstanding eq entry is
        # cross-checked below. v5 opts OUT — both commit shapes (one
        # key-column job vs pure metadata) stay under the driver hash,
        # without paying the matched job twice in the sweep.
        table_log.delete_snapshot_eq(
            spark, tdir, "o_orderkey",
            orders.filter(
                (F.col("o_orderpriority") == "2-HIGH")
                & (F.col("o_orderkey") % 3 == 0)
            ).select("o_orderkey"),
        )
        table_log.delete_snapshot_eq(
            spark, tdir, "o_orderkey",
            orders.filter(
                (F.col("o_orderpriority") == "3-MEDIUM")
                & (F.col("o_orderkey") % 7 == 1)
            ).select("o_orderkey"),
            count_matched=False,
        )
        # no appends between the two eq deletes -> identical scopes, so
        # consolidation MUST merge them into one entry and MUST NOT
        # change the read (the vc row pins exactly that)
        table_log.consolidate_eq_dvs(spark, tdir)
        # incremental bin-packing OPTIMIZE (vo): at these sizes every
        # file is sub-threshold, so all of them fold — materializing
        # the outstanding DVs/eq entries — and the read MUST not
        # change (content-identical op, pinned by the vo row)
        table_log.optimize_snapshot(
            spark, tdir,
            target_file_bytes=1 << 30, small_file_bytes=1 << 30,
        )

    # ONE multi-version scan instead of 8 unioned time-travel reads:
    # each distinct data file is read once and rows explode by the
    # versions they are live in (read_snapshot_multi) — at 100 TB the
    # 8-version audit costs ~1 table scan, not ~8. One groupBy
    # replaces the 8 per-version aggregates.
    labels = {
        0: "v0", 1: "v1", 2: "v2", 3: "v3", 4: "v4", 5: "v5",
        6: "vc", 7: "vo",
    }
    # METADATA-ONLY COUNT(*) cross-check: count_snapshot answers from
    # per-file manifest row counts (position-DV subtraction via one
    # tiny dv-parquet job) for the eq-free versions AND — round 12 —
    # for v4, whose single eq entry carries per-file MATCHED counts
    # (no job at all); folding it into n_rows (negate on mismatch)
    # pins metadata-count == true count under the same DuckDB hash —
    # append, CoW merge, DV delete, outstanding-eq, and post-optimize
    # states all covered. (v5/vc hold a count_matched=False entry and
    # take count_snapshot's documented scan fallback; that path is
    # unit-tested, not re-paid here.)
    meta = {
        v: table_log.count_snapshot(spark, tdir, v)
        for v in (0, 1, 2, 3, 4, 7)
    }
    meta_map = F.create_map(
        *[x for v, n in meta.items() for x in (F.lit(v), F.lit(n))]
    )
    op_map = F.create_map(
        *[x for v, op in labels.items() for x in (F.lit(v), F.lit(op))]
    )
    n_rows_checked = F.when(
        meta_map[F.col("version")].isNull()
        | (meta_map[F.col("version")] == F.col("n_rows")),
        F.col("n_rows"),
    ).otherwise(-F.col("n_rows"))
    multi = table_log.read_snapshot_multi(spark, tdir, sorted(labels))
    return (
        multi.groupBy(F.col("__version").alias("version"))
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("o_totalprice"), 0).cast("long").alias("total"),
        )
        .select(
            op_map[F.col("version")].alias("op"),
            F.col("version").cast("long").alias("version"),
            n_rows_checked.alias("n_rows"),
            "total",
        )
    )


@part(
    "matview_incremental_refresh",
    """
    WITH src AS (
      SELECT o_orderpriority, o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price_dec
      FROM orders
      WHERE o_orderkey % 4 = 2
        AND o_orderstatus IN ('F', 'O')
        AND NOT (o_orderpriority = '1-URGENT' AND o_orderkey % 10 = 0)
    )
    SELECT o_orderpriority AS o_orderpriority,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(price_dec) * 100 AS BIGINT) AS tot_cents,
           CAST(MIN(price_dec) * 100 AS BIGINT) AS lo_cents,
           CAST(MAX(price_dec) * 100 AS BIGINT) AS hi_cents,
           CAST(1 AS INT) AS avg_consistent
    FROM src GROUP BY o_orderpriority
    """,
    doc="Incrementally maintained aggregate under the driver's value "
    "hash: a source snapshot table goes through commit('F' orders) -> "
    "refresh (full build) -> append('O' orders) + delete(urgent "
    "orderkey%10=0) -> ONE refresh whose change feed spans both "
    "steps, so the four untouched priorities ride the ADDITIVE fold "
    "while the urgent group (extremes removed) takes the key-pruned "
    "EXACT recompute — both maintenance paths in a single catch-up. "
    "The oracle restates only the FINAL state in plain SQL — "
    "so the hash passes only if every intermediate delta (CDF diff, "
    "additive fold, dirty-group recompute, tombstoning) composed "
    "correctly. Sums/extremes ride DECIMAL cents end-to-end: exact "
    "and accumulation-order-free on both engines. The spec also "
    "maintains avg (stored sum/count decomposition) and the part "
    "pins the projection as a FLAG — read_aggregate's avg must equal "
    "the view's own sum/count ratio per group — because a direct "
    "cross-engine avg hash would ride decimal-division rounding "
    "knife-edges, while the components are value-hashed exactly "
    "(sinks/matview.py:refresh_aggregate,_expand_spec).",
)
def matview_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from etl_property_rumah123_spark.sinks import matview, table_log

    from etl_property_rumah123_spark.operators.common import scratch_base

    base = os.path.basename(os.path.normpath(sf_dir))
    root = f"{scratch_base()}/sg_matview_part/{base}"
    src_dir, mv_dir = f"{root}/src", f"{root}/mv"
    jvm, fs = table_log._fs(spark, src_dir)
    fs.delete(jvm.org.apache.hadoop.fs.Path(root), True)

    # 25% slice (o_orderkey % 4 = 2): every refresh path still runs —
    # all five priority groups survive, and % 4 = 2 intersects the
    # % 10 = 0 delete (keys = 10 mod 20), so the dirty-group recompute
    # is non-trivial — while the part's many small commits stay cheap
    # in the sweep (the refresh cost is job-count-bound, not
    # data-bound, at these sizes)
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 4 == 2)
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(18,2)").alias("price_dec"),
        )
    )
    spec = {
        "n_orders": ("count", "o_orderkey"),
        "tot": ("sum", "price_dec"),
        "lo": ("min", "price_dec"),
        "hi": ("max", "price_dec"),
        "avg_p": ("avg", "price_dec"),
    }
    group = ["o_orderpriority"]

    # small-table maintenance jobs: right-size their shuffles (see
    # snapshot_table_lifecycle / common.scoped_conf)
    from etl_property_rumah123_spark.operators.common import scoped_conf

    with scoped_conf(spark, spark__sql__shuffle__partitions=4):
        table_log.commit_snapshot(
            orders.filter(F.col("o_orderstatus") == "F"), src_dir
        )
        matview.refresh_aggregate(spark, src_dir, mv_dir, group, spec)
        table_log.commit_snapshot(
            orders.filter(F.col("o_orderstatus") == "O"),
            src_dir,
            mode="append",
        )
        table_log.delete_snapshot(
            spark, src_dir,
            "o_orderpriority = '1-URGENT' AND o_orderkey % 10 = 0",
        )
        matview.refresh_aggregate(spark, src_dir, mv_dir, group, spec)

    mv = matview.read_aggregate(spark, mv_dir)
    return mv.select(
        "o_orderpriority",
        F.col("n_orders").cast("long").alias("n_orders"),
        (F.col("tot") * 100).cast("long").alias("tot_cents"),
        (F.col("lo") * 100).cast("long").alias("lo_cents"),
        (F.col("hi") * 100).cast("long").alias("hi_cents"),
        # price_dec is never null here, so avg's own denominator
        # equals n_orders and the projection must equal tot/n exactly
        # (identical division semantics on both sides of the ==)
        (F.col("avg_p") == F.col("tot") / F.col("n_orders"))
        .cast("int")
        .alias("avg_consistent"),
    )


@part(
    "snapshot_scan_pruning",
    """
    SELECT CAST(3 AS BIGINT) AS n_files_total,
           CAST(1 AS BIGINT) AS n_files_scanned,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS tot_cents
    FROM customer WHERE c_custkey % 3 = 1
    """,
    doc="Manifest-level data skipping under the driver's value hash: "
    "customers are committed as three single-file snapshots by band "
    "(c_custkey % 3), then read back with a predicate on the band "
    "column. The output row carries the TOTAL file count, the count "
    "of files the pruned scan actually planned (DataFrame.inputFiles "
    "— 1 iff the committed [min, max] stats excluded the other two), "
    "and the surviving rows' exact decimal-cents aggregate; the "
    "oracle restates the file counts as literals and the aggregate "
    "in plain SQL, so a stats bug that stops pruning (3 files "
    "scanned) or over-prunes (wrong rows) fails the hash either way "
    "(sinks/table_log.py:_stats_for_files, read_snapshot).",
)
def snapshot_scan_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from etl_property_rumah123_spark.sinks import table_log

    base = os.path.basename(os.path.normpath(sf_dir))
    tdir = f"/tmp/sg_prune_part/{base}"
    jvm, fs = table_log._fs(spark, tdir)
    fs.delete(jvm.org.apache.hadoop.fs.Path(tdir), True)

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_custkey") % 3).alias("band"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal_dec"),
    )
    for band in (0, 1, 2):
        table_log.commit_snapshot(
            cust.filter(F.col("band") == band).coalesce(1),
            tdir,
            mode="append",
        )
    total = len(table_log.read_snapshot(spark, tdir).inputFiles())
    pruned = table_log.read_snapshot(spark, tdir, predicates=[("band", "=", 1)])
    scanned = len(pruned.inputFiles())
    return pruned.agg(
        F.lit(total).cast("long").alias("n_files_total"),
        F.lit(scanned).cast("long").alias("n_files_scanned"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum("bal_dec") * 100).cast("long").alias("tot_cents"),
    )
