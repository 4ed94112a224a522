"""Temporal interval operators.

``interval_count_join`` generalizes the day-grain interval-containment
count (plans/advanced.py:interval_containment_join) to SUB-DAY
interval endpoints. The first implementation resolved the two
boundary DAYS row-exactly after a day-bucketed join — and the
per-part sf1 timing rule caught it as a candidate-volume product:
every interval's boundary days concentrate on the same few calendar
days, so 1.5k intervals x ~33k probes/day ~= 100M candidates (17-23 s
at sf1). This version uses the PREFIX-COUNT decomposition instead:

    count[s, e) = C(e) - C(s),   C(t) = #probes with ts < t
    C(t) = D(day(t)) + H(day(t), hour(t)) + R(t)

- ``D`` — cumulative probes before the day — and ``H`` — cumulative
  probes in earlier hours of the same day — come from dense day/hour
  aggregate tables (TIME-RANGE-sized: 24x#days rows at any SF, hence
  broadcastable; the cumsum windows run over these tiny tables, never
  the data).
- ``R(t)`` — probes inside t's partial hour before t — is the only
  row-exact piece, and its join is HOUR-bucketed: each interval
  endpoint meets just its own hour's probes, so candidate volume is
  2 x |intervals| x probes-per-hour — linear in both inputs. sf1:
  17 s -> 3.7 s warm, same results (brute-force parity pinned in
  tests/test_advanced.py).

Endpoints are clamped to the probe time range (C is constant outside
it), so intervals beyond the data resolve without dense-table blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _prefix_tables(probes: DataFrame, ts_col: str):
    """Dense per-day and per-(day, hour) EXCLUSIVE cumulative counts
    over the probe time range, plus (min_day, sentinel_day). Both
    tables are time-range-sized — the single-partition cumsum windows
    are over #days and 24x#days rows, never over probes."""
    p = probes.select(
        F.date_trunc("day", F.col(ts_col)).alias("__d"),
        F.date_trunc("hour", F.col(ts_col)).alias("__h"),
    )
    bounds = p.agg(
        F.min("__d").alias("mn"), F.max("__d").alias("mx")
    ).first()
    day_counts = p.groupBy("__d").agg(F.count("*").alias("__n"))
    spark = probes.sparkSession
    dense_days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(bounds["mn"]),
                F.lit(bounds["mx"]) + F.expr("INTERVAL 1 DAY"),  # sentinel
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("__d")
    )
    wd = Window.orderBy("__d").rowsBetween(Window.unboundedPreceding, -1)
    day_cum = (
        dense_days.join(day_counts, "__d", "left")
        .select("__d", F.coalesce(F.col("__n"), F.lit(0)).alias("__n"))
        .withColumn("__cumd", F.coalesce(F.sum("__n").over(wd), F.lit(0)).cast("long"))
        .select("__d", "__cumd")
    )
    hour_counts = p.groupBy("__h").agg(F.count("*").alias("__n"))
    dense_hours = dense_days.select(
        "__d",
        F.explode(
            F.sequence(
                F.col("__d"),
                F.col("__d") + F.expr("INTERVAL 23 HOURS"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("__h"),
    )
    wh = (
        Window.partitionBy("__d").orderBy("__h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hour_cum = (
        dense_hours.join(hour_counts, "__h", "left")
        .select(
            "__d", "__h", F.coalesce(F.col("__n"), F.lit(0)).alias("__n")
        )
        .withColumn("__cumh", F.coalesce(F.sum("__n").over(wh), F.lit(0)).cast("long"))
        .select("__h", "__cumh")
    )
    return day_cum, hour_cum, bounds["mn"], bounds["mx"]


def interval_count_join(
    intervals: DataFrame,
    probes: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    ts_col: str,
) -> DataFrame:
    """Count probe rows with ``ts in [start, end)`` per interval, with
    exact sub-day endpoint semantics. Output: (key_col, n_in_window)
    — one row per interval, zero-count intervals kept; end <= start
    yields 0, and so does a NULL endpoint (SQL semantics: ts >= NULL
    / ts < NULL is never true — greatest/least would otherwise skip
    the NULL and silently clamp to the data edge). Interval rows must
    be unique per ``key_col``.
    """
    day_cum, hour_cum, mn_day, mx_day = _prefix_tables(probes, ts_col)
    sentinel = F.lit(mx_day) + F.expr("INTERVAL 1 DAY")

    null_ended = intervals.filter(
        F.col(start_col).isNull() | F.col(end_col).isNull()
    ).select(F.col(key_col), F.lit(0).cast("long").alias("n_in_window"))
    intervals = intervals.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    )

    # endpoint rows: (key, sign, t) with t clamped to [min_day, sentinel]
    ends = intervals.select(
        F.col(key_col),
        F.explode(
            F.array(
                F.struct(
                    F.lit(-1).alias("sign"), F.col(start_col).alias("t")
                ),
                F.struct(F.lit(1).alias("sign"), F.col(end_col).alias("t")),
            )
        ).alias("__ep"),
    ).select(
        key_col,
        F.col("__ep.sign").alias("__sign"),
        F.least(F.greatest(F.col("__ep.t"), F.lit(mn_day)), sentinel).alias(
            "__t"
        ),
    ).select(
        key_col,
        "__sign",
        "__t",
        F.date_trunc("day", "__t").alias("__d"),
        F.date_trunc("hour", "__t").alias("__h"),
    )

    with_cum = (
        ends.join(F.broadcast(day_cum), "__d", "left")
        .join(F.broadcast(hour_cum), "__h", "left")
        .select(
            key_col,
            "__sign",
            "__t",
            "__h",
            (F.coalesce("__cumd", F.lit(0)) + F.coalesce("__cumh", F.lit(0))).alias(
                "__DH"
            ),
        )
    )

    # R(t): row-exact count inside t's partial hour — hour-bucketed join
    ph = probes.select(
        F.col(ts_col).alias("__ts"),
        F.date_trunc("hour", F.col(ts_col)).alias("__h"),
    )
    partial = (
        with_cum.select(key_col, "__sign", "__t", "__h")
        .join(ph, "__h")
        .filter(F.col("__ts") < F.col("__t"))
        .groupBy(key_col, "__sign", "__t")
        .agg(F.count("*").alias("__R"))
    )

    per_end = with_cum.join(
        partial, [key_col, "__sign", "__t"], "left"
    ).select(
        key_col,
        (
            F.col("__sign")
            * (F.col("__DH") + F.coalesce(F.col("__R"), F.lit(0)))
        ).alias("__c"),
    )
    counted = per_end.groupBy(key_col).agg(
        F.greatest(F.sum("__c"), F.lit(0)).cast("long").alias("n_in_window")
    )
    return counted.unionByName(null_ended)
