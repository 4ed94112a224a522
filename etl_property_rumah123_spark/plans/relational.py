"""Relational query surface: scans, filters, joins, aggregations,
windows, set ops, scalar functions — the capability layer the reference
lacks entirely (SURVEY §2.7 'explicitly absent') expressed as
Catalyst-optimized DataFrame plans over the testdata star schema.

Scale notes, applied throughout:
- dimension joins hint ``broadcast`` only for tables that stay small at
  any scale factor (region: 5 rows, nation: 25 rows); everything else
  is left to AQE so the same plan survives 100 TB.
- aggregations are expressed declaratively so partial (map-side)
  aggregation happens before the shuffle.
- filters are plain Column predicates on scan columns so they reach the
  parquet reader (check .explain(): PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_property_rumah123_spark.plans import part, register
from etl_property_rumah123_spark.sources.catalog import table, tables


def _bigint_sum(col, alias: str):
    """Money-sum parity convention: ROUND(sum, 0) as BIGINT."""
    return F.round(F.sum(col), 0).cast("long").alias(alias)


# ---------------------------------------------------------------------------
# Aggregation core
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(l_quantity), 0) AS BIGINT) AS sum_qty,
           CAST(ROUND(SUM(l_extendedprice), 0) AS BIGINT) AS sum_base_price,
           CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS BIGINT) AS sum_disc_price,
           CAST(ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 0) AS BIGINT) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: filtered scan -> hash agg "
    "(map-side partial combine; one shuffle on the 2 grouping cols).",
    headline=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _bigint_sum(F.col("l_quantity"), "sum_qty"),
            _bigint_sum(F.col("l_extendedprice"), "sum_base_price"),
            _bigint_sum(disc_price, "sum_disc_price"),
            _bigint_sum(disc_price * (1 + F.col("l_tax")), "sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey AS l_orderkey,
           CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 0) AS BIGINT) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority AS o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY SUM(l.l_extendedprice * (1 - l.l_discount)) DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style: selective dim filter -> 3-way join -> agg -> "
    "top-k. Filters push to all three scans; AQE picks broadcast for "
    "the filtered customer side at small SF and shuffle-join at scale.",
    headline=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < cutoff)
    l = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    revenue_raw = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(revenue_raw, 0).cast("long").alias("revenue"),
            revenue_raw.alias("__rev_exact"),
        )
        .orderBy(F.col("__rev_exact").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


@register(
    "q5_region_volume",
    """
    SELECT n.n_name AS n_name,
           CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 0) AS BIGINT) AS revenue
    FROM region r
      JOIN nation n   ON n.n_regionkey = r.r_regionkey
      JOIN customer c ON c.c_nationkey = n.n_nationkey
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-style 6-way join, built SMALL SIDE FIRST: the "
    "region filter reaches customers through broadcast nation/region "
    "joins (cutting the customer side ~5x before anything shuffles), "
    "customers join the date-filtered orders, and only then does the "
    "fact table join — lineitem is shuffled exactly ONCE, against an "
    "already region-and-date-reduced build side. The naive "
    "lineitem-first order reshuffled the huge lineitem-orders "
    "intermediate a second time by custkey (sf100 drill: 182 s vs "
    "this shape — BASELINE.md §Round 11); at 100 TB that second "
    "shuffle is the bottleneck of the whole query.",
    headline=True,
)
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    asia_nations = F.broadcast(
        t["nation"].join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    cust = t["customer"].join(
        asia_nations, F.col("c_nationkey") == F.col("n_nationkey")
    )
    o = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    oc = o.join(cust, F.col("o_custkey") == F.col("c_custkey"))
    return (
        t["lineitem"]
        .join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0)
            .cast("long")
            .alias("revenue")
        )
    )


@part(
    "agg_having",
    """
    SELECT o_custkey AS o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
    doc="Group-by with post-aggregation HAVING filter.",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            _bigint_sum(F.col("o_totalprice"), "total_spend"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@part(
    "distinct_count_segments",
    """
    SELECT c_mktsegment AS c_mktsegment,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="COUNT DISTINCT (expands to two-phase agg; partials still "
    "combine map-side on the composite key).",
)
def distinct_count_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count("*").alias("n_customers"),
        )
    )


@part(
    "rollup_flag_status",
    """
    SELECT l_returnflag AS l_returnflag, l_linestatus AS l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals with GROUPING indicators "
    "disambiguating real NULL keys from subtotal rows.",
)
def rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
            F.count("*").alias("n"),
        )
    )


@part(
    "cube_status_priority",
    """
    SELECT o_orderstatus AS o_orderstatus, o_orderpriority AS o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) AS total
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two dimensions (2^2 grouping sets in one pass).",
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count("*").alias("n"),
            _bigint_sum(F.col("o_totalprice"), "total"),
        )
    )


@part(
    "grouping_sets_custom",
    """
    SELECT c_mktsegment AS c_mktsegment, c_nationkey AS c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(c_acctbal), 6) AS avg_bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
    doc="Arbitrary GROUPING SETS (not expressible as rollup/cube).",
)
def grouping_sets_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey,
               COUNT(*) AS n, ROUND(AVG(c_acctbal), 6) AS avg_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


# ---------------------------------------------------------------------------
# Filters / projections / sort / limit
# ---------------------------------------------------------------------------


@part(
    "filter_project_pushdown",
    """
    SELECT l_orderkey AS l_orderkey, l_linenumber AS l_linenumber,
           CAST(ROUND(l_extendedprice * (1 - l_discount), 0) AS BIGINT) AS net_price
    FROM lineitem
    WHERE l_quantity > 45 AND l_discount >= 0.05 AND l_returnflag = 'R'
    """,
    doc="Selective conjunctive filter + narrow projection. All three "
    "predicates and the 5-column ReadSchema push into the parquet scan.",
)
def filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_quantity") > 45)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_returnflag") == "R")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 0)
            .cast("long")
            .alias("net_price"),
        )
    )


@part(
    "topk_orders",
    """
    SELECT o_orderkey AS o_orderkey,
           CAST(ROUND(o_totalprice, 0) AS BIGINT) AS o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    doc="Top-k by value: Spark plans TakeOrderedAndProject — per-"
    "partition heaps then a k-row driver merge, never a full sort.",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 0).cast("long").alias("o_totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
    )


@part(
    "case_when_buckets",
    """
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(o_totalprice), 6) AS avg_price
    FROM orders GROUP BY 1
    """,
    doc="CASE WHEN bucketing histogram (constant-folded when-chain).",
)
def case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return (
        table(spark, sf_dir, "orders")
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@part(
    "semi_join_customers",
    """
    SELECT c_custkey AS c_custkey, c_name AS c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    doc="LEFT SEMI join (EXISTS): emits each customer at most once; "
    "only the join key crosses the shuffle from the probe side.",
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "customer", "orders")
    big = t["orders"].filter(F.col("o_totalprice") > 400000)
    return (
        t["customer"]
        .join(big, t["customer"].c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@part(
    "anti_join_customers",
    """
    SELECT c_custkey AS c_custkey, c_mktsegment AS c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="LEFT ANTI join (NOT EXISTS): customers that never ordered.",
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


@part(
    "left_join_order_counts",
    """
    SELECT c.c_custkey AS c_custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    doc="LEFT OUTER join preserving zero-order customers (COUNT(col) "
    "skips the null-extended rows).",
)
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@part(
    "nullsafe_join_counts",
    """
    WITH a AS (
      SELECT NULLIF(c_nationkey % 7, 0) AS k, CAST(COUNT(*) AS BIGINT) AS n_cust
      FROM customer GROUP BY 1
    ), b AS (
      SELECT NULLIF(s_nationkey % 7, 0) AS k, CAST(COUNT(*) AS BIGINT) AS n_supp
      FROM supplier GROUP BY 1
    )
    SELECT a.k AS k, a.n_cust AS n_cust, b.n_supp AS n_supp
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): both "
    "sides carry a planted NULL key group (NULLIF of bucket 0) that "
    "MUST match — plain equality would silently drop it. Null-safe "
    "equality is hashable, so the plan stays a hash/sort-merge "
    "equi-join, not a nested loop; the NULL row surviving into the "
    "output is what the oracle pins.",
)
def nullsafe_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "customer", "supplier")
    a = (
        t["customer"]
        .groupBy(F.nullif(F.col("c_nationkey") % 7, F.lit(0)).alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    b = (
        t["supplier"]
        .groupBy(F.nullif(F.col("s_nationkey") % 7, F.lit(0)).alias("k"))
        .agg(F.count("*").alias("n_supp"))
    )
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        a["k"].alias("k"), "n_cust", "n_supp"
    )


@part(
    "full_outer_nation_presence",
    """
    WITH cn AS (SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_cust
                FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_supp
                FROM supplier GROUP BY 1)
    SELECT COALESCE(cn.k, sn.k) AS nationkey,
           COALESCE(cn.n_cust, 0) AS n_cust,
           COALESCE(sn.n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
    """,
    doc="FULL OUTER join of two pre-aggregated sides with COALESCE "
    "null-filling. Pre-aggregating before the join shrinks both shuffle "
    "inputs to |nations| rows.",
)
def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "customer", "supplier")
    cn = t["customer"].groupBy(F.col("c_nationkey").alias("k")).agg(
        F.count("*").alias("n_cust")
    )
    sn = t["supplier"].groupBy(F.col("s_nationkey").alias("k")).agg(
        F.count("*").alias("n_supp")
    )
    # USING-style full outer join already emits k as coalesce(cn.k, sn.k)
    return cn.join(sn, "k", "full_outer").select(
        F.col("k").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@part(
    "broadcast_dim_join",
    """
    SELECT n.n_name AS n_name, r.r_name AS r_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(ROUND(SUM(c.c_acctbal), 0) AS BIGINT) AS total_bal
    FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    doc="Star-schema dim enrichment: explicit broadcast of the bounded "
    "dims makes this a zero-shuffle join (only the final agg shuffles).",
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "customer", "nation", "region")
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(
            F.count("*").alias("n_customers"),
            _bigint_sum(F.col("c_acctbal"), "total_bal"),
        )
    )


@part(
    "correlated_above_nation_avg",
    """
    SELECT c_custkey AS c_custkey, ROUND(c_acctbal, 6) AS c_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
    doc="Correlated scalar subquery: Catalyst de-correlates it into an "
    "aggregate + join — no per-row re-execution.",
)
def correlated_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    nation_avg = c.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("__avg"))
    return (
        c.join(nation_avg, "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .select("c_custkey", F.round("c_acctbal", 6).alias("c_acctbal"))
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@part(
    "window_rank_acctbal",
    """
    SELECT c_nationkey AS c_nationkey, c_custkey AS c_custkey,
           CAST(RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS BIGINT) AS bal_rank
    FROM customer
    QUALIFY bal_rank <= 3
    """,
    doc="Ranking window + QUALIFY-style post-filter: top 3 balances per "
    "nation. One shuffle on the partition key.",
)
def window_rank_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return (
        table(spark, sf_dir, "customer")
        .withColumn("bal_rank", F.rank().over(w).cast("long"))
        .filter(F.col("bal_rank") <= 3)
        .select("c_nationkey", "c_custkey", "bal_rank")
    )


@part(
    "window_running_sum",
    """
    SELECT o_custkey AS o_custkey, o_orderkey AS o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS running_spend
    FROM orders
    """,
    doc="Running total with an explicit ROWS frame and a deterministic "
    "tie-broken ordering (date, orderkey). The money column is summed "
    "as DECIMAL(18,2): a long running double sum lands on .5 rounding "
    "knife-edges (cent-grain values sum to exact halves) where 1 ulp "
    "of accumulation-order difference flips ROUND — observed as an "
    "off-by-one vs the oracle at sf0.1. Exact decimal accumulation is "
    "order-insensitive, so the parity holds at ANY scale.",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spend = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(spend, 0).cast("long").alias("running_spend"),
    )


@part(
    "window_lag_gap",
    """
    SELECT o_custkey AS o_custkey, o_orderkey AS o_orderkey,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    """,
    doc="LAG + date arithmetic: per-customer inter-order gap in days; "
    "first order yields null.",
)
def window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("days_since_prev"),
    )


@part(
    "window_ntile_share",
    """
    SELECT q AS q, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) AS spend
    FROM (SELECT o_totalprice,
                 CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS q
          FROM orders)
    GROUP BY q
    """,
    doc="NTILE quartiles then re-aggregation (global-order window; at "
    "scale prefer approx percentile buckets — kept for API parity).",
)
def window_ntile_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .select("o_totalprice", F.ntile(4).over(w).cast("long").alias("q"))
        .groupBy("q")
        .agg(F.count("*").alias("n"), _bigint_sum(F.col("o_totalprice"), "spend"))
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@part(
    "set_ops_custkeys",
    """
    SELECT k AS k FROM (
      SELECT c_custkey AS k FROM customer WHERE c_acctbal > 7000
      INTERSECT
      SELECT o_custkey AS k FROM orders
    )
    EXCEPT
    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    doc="INTERSECT + EXCEPT composition (both compile to aggregated "
    "semi/anti joins).",
)
def set_ops_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "customer", "orders")
    rich = t["customer"].filter(F.col("c_acctbal") > 7000).select(
        F.col("c_custkey").alias("k")
    )
    ordered = t["orders"].select(F.col("o_custkey").alias("k"))
    building = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    return rich.intersect(ordered).exceptAll(building).distinct()


@part(
    "union_all_keys",
    """
    SELECT k AS k, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey AS k FROM customer
      UNION ALL
      SELECT s_nationkey AS k FROM supplier
    ) GROUP BY k
    """,
    doc="UNION ALL (bag semantics) then aggregate — unionByName keeps "
    "column resolution by name, not position.",
)
def union_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "customer", "supplier")
    u = t["customer"].select(F.col("c_nationkey").alias("k")).unionByName(
        t["supplier"].select(F.col("s_nationkey").alias("k"))
    )
    return u.groupBy("k").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Scalar function families
# ---------------------------------------------------------------------------


@part(
    "string_functions",
    """
    SELECT p_partkey AS p_partkey,
           UPPER(p_name) AS upper_name,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           SUBSTRING(p_type, 1, 3) AS type_prefix,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_name, ' ', '_') AS snake_name,
           CAST(STRPOS(p_name, 'e') AS BIGINT) AS first_e
    FROM part WHERE p_size >= 25
    """,
    doc="String function family: upper/length/substring/concat/replace/"
    "position — all JVM-side codegen expressions.",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 25)
        .select(
            "p_partkey",
            F.upper("p_name").alias("upper_name"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_type", 1, 3).alias("type_prefix"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
            F.instr(F.col("p_name"), "e").cast("long").alias("first_e"),
        )
    )


@part(
    "date_functions",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mon,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
    doc="Calendar extraction + aggregation by (year, month).",
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mon"),
        )
        .agg(
            F.count("*").alias("n"),
            _bigint_sum(F.col("o_totalprice"), "revenue"),
        )
    )


@part(
    "math_functions",
    """
    SELECT l_orderkey AS l_orderkey, l_linenumber AS l_linenumber,
           CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS qty_bucket,
           ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 6) AS price_ln,
           CAST(ABS(l_quantity - 25) AS BIGINT) AS qty_dev,
           CAST(l_partkey % 10 AS BIGINT) AS part_mod
    FROM lineitem WHERE l_linenumber = 1 AND l_orderkey % 100 = 0
    """,
    doc="Math function family: ceil/sqrt/ln/abs/modulo.",
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 100 == 0))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.ceil(F.col("l_quantity") / 7.0).cast("long").alias("qty_bucket"),
            F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
            F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
            F.abs(F.col("l_quantity") - 25).cast("long").alias("qty_dev"),
            (F.col("l_partkey") % 10).cast("long").alias("part_mod"),
        )
    )


@part(
    "json_extract_events",
    """
    SELECT event_id AS event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events WHERE event_type = 'purchase'
    """,
    doc="JSON field extraction from a string column "
    "(get_json_object — no UDF, no full JSON parse).",
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        )
    )


@part(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority AS o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_cnt,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_cnt,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_cnt
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot (wide conditional aggregation); explicit value list keeps "
    "it one pass with no extra value-discovery job.",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("f_cnt"),
            F.coalesce(F.col("O"), F.lit(0)).alias("o_cnt"),
            F.coalesce(F.col("P"), F.lit(0)).alias("p_cnt"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H optimizer-stress shapes (adapted to the testdata columns)
# ---------------------------------------------------------------------------


@part(
    "q4_priority_exists",
    """
    SELECT o_orderpriority AS o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS carrying an inequality "
    "between the two sides (ship > order+30d) — decorrelates to a "
    "LEFT SEMI join on the order key with the inequality as a join-"
    "side predicate, never a per-row subquery.",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = t["lineitem"]
    cond = (o["o_orderkey"] == l["l_orderkey"]) & (
        l["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@part(
    "q6_forecast_revenue",
    """
    SELECT CAST(ROUND(SUM(l_extendedprice * l_discount), 0) AS BIGINT) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: the classic range-predicate scan benchmark — "
    "date range + discount band + quantity cap all push into the "
    "parquet scan; zero joins, one map-side-combining aggregate.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _bigint_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count("*").alias("n"),
        )
    )


@part(
    "q14_promo_ratio",
    """
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_ratio
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-06-01'
      AND l_shipdate < TIMESTAMP '1996-07-01'
    """,
    doc="TPC-H Q14 shape: conditional-revenue ratio over a month of "
    "shipments — one pass, both numerator and denominator as "
    "conditional aggregates of the same join (no self-join); the part "
    "dimension broadcast.",
)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    p = F.broadcast(table(spark, sf_dir, "part").select("p_partkey", "p_type"))
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.sum(F.when(F.col("p_type").like("PROMO%"), net).otherwise(0.0))
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .agg(F.round(100.0 * promo / F.sum(net), 6).alias("promo_ratio"))
    )


@part(
    "q19_bracket_revenue",
    """
    SELECT CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS BIGINT) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 16 AND 30
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#9' AND p_size BETWEEN 31 AND 50
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: disjunction of per-bracket conjunctions "
    "mixing columns from both join sides — the predicate the optimizer "
    "must split so the single-side conjuncts (brand/size, quantity) "
    "still push below the join instead of evaluating the whole OR "
    "post-join.",
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    )
    q = F.col("l_quantity")
    bracket = (
        ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(16, 30) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#9") & F.col("p_size").between(31, 50) & q.between(20, 30))
    )
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .filter(bracket)
        .agg(
            _bigint_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n"),
        )
    )


@part(
    "q2_max_bal_supplier",
    """
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
           CAST(s.s_nationkey AS BIGINT) AS s_nationkey,
           s.s_acctbal AS s_acctbal
    FROM supplier s
    WHERE s.s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = s.s_nationkey)
    """,
    doc="TPC-H Q2 shape: equality against a correlated scalar MAX "
    "(the min-supplycost pattern, adapted to supplier/acctbal since "
    "the testdata has no partsupp). Runs through the spark.sql parser "
    "so Catalyst's own decorrelation rewrites it to a per-group "
    "aggregate + join, never a per-row subquery. MAX selects an "
    "existing double (no arithmetic), so the equality is exact in "
    "both engines.",
)
def q2_max_bal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.sources.catalog import register_views

    register_views(spark, sf_dir, "supplier")
    return spark.sql(
        """
        SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
               CAST(s.s_nationkey AS BIGINT) AS s_nationkey,
               s.s_acctbal AS s_acctbal
        FROM supplier s
        WHERE s.s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
                             WHERE s2.s_nationkey = s.s_nationkey)
        """
    )


@part(
    "q13_order_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) per_cust
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: LEFT OUTER join with a predicate INSIDE the "
    "join condition (filtering it in WHERE would silently turn the "
    "join inner and drop zero-order customers), then a count-of-counts "
    "double aggregation. First agg shuffles on c_custkey, second on "
    "the tiny c_count domain.",
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "customer", "orders")
    c, o = t["customer"], t["orders"]
    cond = (c["c_custkey"] == o["o_custkey"]) & (
        o["o_orderpriority"] != "1-URGENT"
    )
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@part(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey,
             CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS BIGINT) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, r.total_rev AS total_rev
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    doc="TPC-H Q15 shape: top-revenue supplier(s) — an aggregated view "
    "consumed twice, once as the join side and once inside a scalar "
    "MAX subquery; ties all surface (deterministic set). Revenue is "
    "rounded to BIGINT before the comparison so the max-equality is "
    "exact across engines; the 1-row max side is a broadcast.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = l.groupBy("l_suppkey").agg(
        _bigint_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev["total_rev"] == mx["__mx"])
        .join(s, rev["l_suppkey"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_rev")
    )


@part(
    "q16_supplier_variety",
    """
    SELECT p.p_brand AS p_brand, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (1, 7, 14, 23, 36, 45)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    """,
    doc="TPC-H Q16 shape: NOT IN exclusion set (rewritten LEFT ANTI — "
    "s_suppkey is non-null so the null-aware subtlety collapses) "
    "feeding a COUNT DISTINCT over two grouping columns. The "
    "part-side IN-list and <> push into the scan; the anti join's "
    "build side is the filtered supplier subset, which scales with SF "
    "so it is left to AQE rather than hinted broadcast.",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "lineitem", "part", "supplier")
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 7, 14, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_size")
    l = t["lineitem"].select("l_partkey", "l_suppkey")
    return (
        l.join(bad, l["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(p, l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .select(
            "p_brand", F.col("p_size").cast("long").alias("p_size"), "supplier_cnt"
        )
    )


@part(
    "q18_large_volume",
    """
    SELECT c.c_name AS c_name, o.o_orderkey AS o_orderkey,
           CAST(ROUND(SUM(l.l_quantity), 0) AS BIGINT) AS total_qty
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    GROUP BY c.c_name, o.o_orderkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: IN over a grouped-HAVING subquery (a semi "
    "join against an aggregated relation — the aggregate must run "
    "before the probe), re-join to lineitem for the final per-order "
    "quantity, top-k with a deterministic (qty, orderkey) tiebreak. "
    "Quantities are integer-valued doubles, so the sums are exact.",
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sq"))
        .filter(F.col("__sq") > 250)
        .select("l_orderkey")
    )
    o = t["orders"].join(
        big, t["orders"]["o_orderkey"] == big["l_orderkey"], "left_semi"
    )
    return (
        o.join(t["customer"], o["o_custkey"] == t["customer"]["c_custkey"])
        .join(t["lineitem"], o["o_orderkey"] == t["lineitem"]["l_orderkey"])
        .groupBy("c_name", "o_orderkey")
        .agg(F.round(F.sum("l_quantity"), 0).cast("long").alias("total_qty"))
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(100)
    )


@part(
    "q21_late_sole_supplier",
    """
    WITH tagged AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F')
    SELECT s.s_name AS s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM tagged l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.late = 1
      AND EXISTS (SELECT 1 FROM tagged l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM tagged l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late = 1)
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape: the sole-late-supplier pattern — EXISTS and "
    "NOT EXISTS against the SAME relation with different correlated "
    "predicates, here over a late-tagged lineitem-orders join "
    "(lateness = shipped >60d after order; the testdata has no "
    "receipt/commit dates). The oracle states the semantics as the "
    "textbook EXISTS/NOT EXISTS pair; the Spark plan applies the "
    "scale rewrite a 100 TB run needs: ONE per-order aggregate "
    "(distinct suppliers, distinct late suppliers) joined back to the "
    "late rows on the same key — EXISTS other-supplier == "
    "n_supp > 1, NOT EXISTS other-late == n_late_supp = 1 (own row "
    "is late, so the late set is exactly {own}) — instead of the "
    "naive triple self-join that shuffles the tagged relation three "
    "times. The aggregate's output partitioning (l_orderkey) already "
    "satisfies the back-join requirement, so the join adds only the "
    "late-row side's single shuffle (verified: no exchange above the "
    "aggregate in the physical plan).",
)
def q21_late_sole_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "lineitem", "orders", "supplier")
    o = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate")
    tagged = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).cast("int").alias("late"),
    )
    per_order = tagged.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("__n_supp"),
        F.count_distinct(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("__n_late_supp"),
    )
    waiting = (
        tagged.filter(F.col("late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("__n_supp") > 1) & (F.col("__n_late_supp") == 1))
    )
    s = t["supplier"].select("s_suppkey", "s_name")
    return (
        waiting.join(s, waiting["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@part(
    "q7_nation_volume",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 0) AS BIGINT) AS revenue
    FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l.l_shipdate)
    """,
    doc="TPC-H Q7 shape: bidirectional nation-pair volume — the "
    "disjunctive cross-side pair predicate can only be applied after "
    "both nation joins, but each arm's nation membership (3 or 7) "
    "still prunes each broadcast side to 2 of 25 rows; the fact scan "
    "keeps its date range pushed down.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    names = ("NATION_3", "NATION_7")
    n1 = F.broadcast(
        t["nation"].filter(F.col("n_name").isin(*names))
        .select(F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = F.broadcast(
        t["nation"].filter(F.col("n_name").isin(*names))
        .select(F.col("n_nationkey").alias("__cn_key"), F.col("n_name").alias("cust_nation"))
    )
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("__sn_key"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("__cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(_bigint_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@part(
    "q8_market_share",
    """
    SELECT CAST(o_year AS BIGINT) AS o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
      SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: national market share — an 8-way join where "
    "ONE nation role (customer's, via region) filters rows while the "
    "OTHER (supplier's) only labels them for the conditional "
    "numerator; region/nation broadcast, the two nation joins must "
    "stay distinct aliases.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    r = F.broadcast(t["region"].filter(F.col("r_name") == "ASIA"))
    n_cust = F.broadcast(
        t["nation"].select(F.col("n_nationkey").alias("__cn_key"), "n_regionkey")
    )
    n_supp = F.broadcast(
        t["nation"].select(F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("nation"))
    )
    p = t["part"].filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(n_cust, F.col("c_nationkey") == F.col("__cn_key"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(n_supp, F.col("s_nationkey") == F.col("__sn_key"))
        .select(F.year("o_orderdate").cast("long").alias("o_year"), volume.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


@part(
    "q9_profit_by_nation_year",
    """
    SELECT nation, CAST(o_year AS BIGINT) AS o_year,
           CAST(ROUND(SUM(amount), 0) AS BIGINT) AS profit
    FROM (
      SELECT n.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.1 * p.p_retailprice * l.l_quantity AS amount
      FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape: product-line profit by supplier nation and "
    "order year. The testdata has no partsupp, so supply cost is "
    "proxied as 0.1 * p_retailprice * quantity — same plan shape "
    "(substring part filter feeding a 5-way join, profit expression "
    "mixing three tables' columns, two-level rollup key).",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    n = F.broadcast(
        t["nation"].select(F.col("n_nationkey").alias("__n_key"), F.col("n_name").alias("nation"))
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        t["lineitem"]
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("__n_key"))
        .select("nation", F.year("o_orderdate").cast("long").alias("o_year"), amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(_bigint_sum(F.col("amount"), "profit"))
    )


@part(
    "q10_returned_items",
    """
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 0) AS BIGINT) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY SUM(l.l_extendedprice * (1 - l.l_discount)) DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: lost-revenue-from-returns top-20 — quarter "
    "date range pushed to orders, returnflag pushed to lineitem, "
    "3-way join, per-customer aggregate, deterministic (revenue, "
    "custkey) top-k via TakeOrderedAndProject.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "customer", "orders", "lineitem")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = t["lineitem"].filter(F.col("l_returnflag") == "R")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(rev, 0).cast("long").alias("revenue"),
            rev.alias("__rev_exact"),
        )
        .orderBy(F.col("__rev_exact").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue")
    )


@part(
    "q11_important_parts",
    """
    SELECT l.l_partkey AS p_partkey,
           CAST(ROUND(SUM(p.p_retailprice * l.l_quantity), 0) AS BIGINT) AS value
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_2'
    GROUP BY l.l_partkey
    HAVING SUM(p.p_retailprice * l.l_quantity) > (
      SELECT 0.005 * SUM(p2.p_retailprice * l2.l_quantity)
      FROM lineitem l2 JOIN part p2 ON p2.p_partkey = l2.l_partkey
        JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      WHERE n2.n_name = 'NATION_2')
    """,
    doc="TPC-H Q11 shape: per-part value with HAVING against an "
    "UNCORRELATED scalar subquery that re-aggregates the same "
    "filtered join (the important-stock fraction test; partsupp value "
    "proxied as retailprice x shipped quantity). The scalar side runs "
    "once and broadcasts into the HAVING filter — never per group. "
    "Runs through spark.sql so Catalyst's own scalar-subquery "
    "planning is what's exercised.",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.sources.catalog import register_views

    register_views(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    return spark.sql(
        """
        SELECT l.l_partkey AS p_partkey,
               CAST(ROUND(SUM(p.p_retailprice * l.l_quantity), 0) AS BIGINT) AS value
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_2'
        GROUP BY l.l_partkey
        HAVING SUM(p.p_retailprice * l.l_quantity) > (
          SELECT 0.005 * SUM(p2.p_retailprice * l2.l_quantity)
          FROM lineitem l2 JOIN part p2 ON p2.p_partkey = l2.l_partkey
            JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
            JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          WHERE n2.n_name = 'NATION_2')
        """
    )


@part(
    "q12_late_priority_counts",
    """
    SELECT l.l_returnflag AS l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    """,
    doc="TPC-H Q12 shape: shipping-delay priority accounting — the "
    "single-side ship-year range pushes into the scan while the "
    "cross-side lateness inequality (ship > order+45d; the testdata "
    "has no commit/receipt dates) evaluates post-join, feeding the "
    "classic dual conditional counts.",
)
def q12_late_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir, "orders", "lineitem")
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = t["orders"]
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
    )


@part(
    "q17_small_quantity_revenue",
    """
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 6) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13' AND p.p_type = 'ECONOMY'
      AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q17 shape: small-quantity-order revenue — the scalar "
    "AVG subquery is CORRELATED on the join side's part key, the "
    "canonical decorrelation stress: Catalyst must rewrite it to a "
    "per-part aggregate joined back on l_partkey, never a per-row "
    "subquery. Quantities are integer-valued doubles, so avg = "
    "sum/count is bit-identical across engines and the 0.5x "
    "threshold comparison is exact.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.sources.catalog import register_views

    register_views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 6) AS avg_yearly
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#13' AND p.p_type = 'ECONOMY'
          AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
        """
    )


@part(
    "q20_part_promotion_suppliers",
    """
    SELECT s.s_name AS s_name, CAST(s.s_suppkey AS BIGINT) AS s_suppkey
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND s.s_suppkey IN (
        SELECT l.l_suppkey FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'small%')
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey
        HAVING SUM(l.l_quantity) > 100)
    """,
    doc="TPC-H Q20 shape: the nested IN chain — suppliers IN "
    "(aggregated lineitem HAVING qty threshold, itself filtered by "
    "parts IN (name-prefix subquery)); no partsupp, so the available-"
    "quantity gate becomes the shipped-quantity HAVING. Two stacked "
    "semi joins where the inner one must run before the aggregate; "
    "runs through spark.sql so Catalyst's own IN-to-semi-join "
    "decorrelation is exercised.",
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.sources.catalog import register_views

    register_views(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    return spark.sql(
        """
        SELECT s.s_name AS s_name, CAST(s.s_suppkey AS BIGINT) AS s_suppkey
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          AND s.s_suppkey IN (
            SELECT l.l_suppkey FROM lineitem l
            WHERE l.l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE 'small%')
              AND l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l.l_suppkey
            HAVING SUM(l.l_quantity) > 100)
        """
    )


@part(
    "q22_global_sales_opportunity",
    """
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(c_acctbal), 0) AS BIGINT) AS totacctbal
    FROM (
      SELECT substr(c.c_name, length(c.c_name) - 1, 2) AS cntrycode,
             c.c_acctbal
      FROM customer c
      WHERE substr(c.c_name, length(c.c_name) - 1, 2)
              IN ('01', '12', '23', '34', '45')
        AND c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_acctbal > 0.0
                             AND substr(c2.c_name, length(c2.c_name) - 1, 2)
                                   IN ('01', '12', '23', '34', '45'))
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey)
    ) custsale
    GROUP BY cntrycode
    """,
    doc="TPC-H Q22 shape: customers-without-orders by country code — "
    "code derived from the customer-name suffix (the testdata has no "
    "phone column), filtered to a code set, balance above an "
    "UNCORRELATED scalar AVG over the same code set, NOT EXISTS "
    "anti-join against orders. All three decorrelations (scalar agg, "
    "anti join, derived-key grouping) in one statement via spark.sql.",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.sources.catalog import register_views

    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(ROUND(SUM(c_acctbal), 0) AS BIGINT) AS totacctbal
        FROM (
          SELECT substr(c.c_name, length(c.c_name) - 1, 2) AS cntrycode,
                 c.c_acctbal
          FROM customer c
          WHERE substr(c.c_name, length(c.c_name) - 1, 2)
                  IN ('01', '12', '23', '34', '45')
            AND c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                               WHERE c2.c_acctbal > 0.0
                                 AND substr(c2.c_name, length(c2.c_name) - 1, 2)
                                       IN ('01', '12', '23', '34', '45'))
            AND NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey)
        ) custsale
        GROUP BY cntrycode
        """
    )
