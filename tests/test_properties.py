"""Property-based checks (SURVEY §5.3), batched: each hypothesis
example is a LIST of inputs run through ONE Spark job, keeping the
example count useful while paying Spark's per-job latency ~10 times,
not ~500.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_property_rumah123_spark.operators import cleaning

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

UNITS = {"triliun": 1e12, "miliar": 1e9, "juta": 1e6, "ribu": 1e3}


def parse_prices(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "price_rp string")
    out = cleaning.clean_price_column(df, "price_rp")
    return [r["price_rp"] for r in out.collect()]


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.01, max_value=999.0, allow_nan=False),
            st.sampled_from(sorted(UNITS)),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_price_parse_matches_unit_expansion(spark, cases):
    texts = [
        f"Rp {str(round(v, 2)).replace('.', ',')} {unit.capitalize()}"
        for v, unit in cases
    ]
    got = parse_prices(spark, texts)
    for (v, unit), parsed in zip(cases, got):
        expect = int(round(round(v, 2) * UNITS[unit]))
        assert parsed == expect


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=30,
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_price_parse_total_never_throws(spark, texts):
    """Garbage in -> null or long out, never an exception (the
    reference CRASHES on unit-less digit strings; our documented
    divergence is null)."""
    got = parse_prices(spark, texts)
    assert all(v is None or isinstance(v, int) for v in got)


@given(
    st.lists(
        st.floats(min_value=0.1, max_value=500.0, allow_nan=False),
        min_size=2,
        max_size=30,
        unique=True,
    )
)
@settings(**SETTINGS)
def test_price_parse_monotone_per_unit(spark, values):
    """Within one unit, larger numeric part => larger parsed price."""
    values = sorted(round(v, 2) for v in values)
    texts = [f"Rp {str(v).replace('.', ',')} Miliar" for v in values]
    got = parse_prices(spark, texts)
    assert all(a is not None for a in got)
    assert got == sorted(got)


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 10_000)),
        min_size=1,
        max_size=60,
    )
)
@settings(**SETTINGS)
def test_dedup_unique_keys_and_min_seq(spark, rows):
    """Dedup output: one row per key, and it is the MIN ingest_seq row
    (keep-first), for any key/seq multiset."""
    data = [(f"k{k}", s, i) for i, (k, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "link string, ingest_seq long, payload long")
    # make seq unique per row to have a well-defined winner
    df = df.withColumn("ingest_seq", F.col("ingest_seq") * 1000 + F.col("payload"))
    out = cleaning.dedupe_keep_first(df).collect()
    by_key = {}
    for link, seq, payload in [
        (f"k{k}", s * 1000 + i, i) for i, (k, s) in enumerate(rows)
    ]:
        if link not in by_key or seq < by_key[link][0]:
            by_key[link] = (seq, payload)
    assert len(out) == len(by_key)
    for r in out:
        assert r["payload"] == by_key[r["link"]][1]


@given(
    st.lists(
        st.text(alphabet="0123456789abc .,", max_size=12),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_int_coercion_never_throws_and_truncates(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "n_bedroom string")
    out = cleaning.coerce_int_columns(df, ["n_bedroom"]).collect()
    for raw, r in zip(texts, out):
        v = r["n_bedroom"]
        try:
            expect = int(float(raw))
            if math.isfinite(float(raw)) and abs(float(raw)) < 2**31:
                assert v == expect
        except (ValueError, OverflowError):
            assert v is None


def test_zorder_interleave_is_bijective_on_grid():
    """Pure-python mirror of zorder_layout's scale+interleave: on a
    b-bit grid the Morton code must be a bijection (no two cells
    collide, every code reversible) — the property that makes the
    curve a valid sort key."""
    bits = 5
    top = (1 << bits) - 1

    def z(x, y):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (i * 2)
            out |= ((y >> i) & 1) << (i * 2 + 1)
        return out

    codes = {z(x, y) for x in range(top + 1) for y in range(top + 1)}
    assert len(codes) == (top + 1) ** 2
    assert max(codes) < 1 << (2 * bits)


@given(
    st.lists(  # intervals: (key implicit, start minute, length minutes)
        st.tuples(
            st.integers(min_value=-2000, max_value=12000),
            st.integers(min_value=-100, max_value=5000),
        ),
        min_size=1,
        max_size=8,
    ),
    st.lists(  # probe timestamps as minute offsets
        st.integers(min_value=0, max_value=10000), min_size=1, max_size=120
    ),
)
@settings(**SETTINGS)
def test_interval_count_join_matches_bruteforce_property(spark, ivs, probe_mins):
    """The prefix-count decomposition equals the naive theta-join for
    ARBITRARY sub-day intervals and probe times — including negative
    lengths (empty windows), intervals straddling or outside the probe
    range, and exact-endpoint collisions."""
    import datetime as dt

    from etl_property_rumah123_spark.operators.temporal import (
        interval_count_join,
    )

    T = dt.datetime(2024, 5, 1)
    intervals = [
        (k, T + dt.timedelta(minutes=s), T + dt.timedelta(minutes=s + ln))
        for k, (s, ln) in enumerate(ivs)
    ]
    probes = [(i, T + dt.timedelta(minutes=m)) for i, m in enumerate(probe_mins)]
    iv = spark.createDataFrame(intervals, "k long, s timestamp, e timestamp")
    p = spark.createDataFrame(probes, "pid long, ts timestamp")
    got = {
        r["k"]: r["n_in_window"]
        for r in interval_count_join(iv, p, "k", "s", "e", "ts").collect()
    }
    expect = {
        k: sum(1 for _, ts in probes if s <= ts < e) for k, s, e in intervals
    }
    assert got == expect
