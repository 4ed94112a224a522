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


# ---------------------------------------------------------------------------
# XXH64 triple parity: Spark xxhash64 == Python reference == generated
# DuckDB SQL (functions/xxh64_sql.py) — the contract the round-4
# fast-family oracle stands on.
# ---------------------------------------------------------------------------


def test_xxh64_python_reference_matches_spark(spark):
    """Pin hash_str_py / hash_long_py / the multi-column seed chain to
    the live Spark engine across every code path: empty, <8, 8, <32,
    32, stripes+words+tail, multibyte UTF-8, long edge values."""
    from etl_property_rumah123_spark.functions import xxh64_sql as X

    strs = ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
            "abcdefghi", "0123456789abcde", "0123456789abcdef", "x" * 31,
            "x" * 32, "y" * 33, "z" * 40, "w" * 63, "v" * 64, "u" * 65,
            "t" * 100, "héllo wörld ünïcode ☃ test", "3|foo bar baz"]
    df = spark.createDataFrame([(s,) for s in strs], ["s"])
    for r in df.select("s", F.xxhash64("s").alias("h")).collect():
        assert r["h"] == X.signed(X.hash_str_py(r["s"])), r["s"]

    longs = [0, 1, -1, 42, 2**63 - 1, -(2**63), 123456789123456789]
    dfl = spark.createDataFrame([(x,) for x in longs], "x long")
    for r in dfl.select("x", F.xxhash64("x").alias("h")).collect():
        assert r["h"] == X.signed(X.hash_long_py(r["x"], X.SEED)), r["x"]

    # multi-column chain threads the running hash as the next seed
    dfc = spark.createDataFrame([(5, 7)], "a long, b long")
    row = dfc.select(
        F.xxhash64("a", "b").alias("ab"),
        F.xxhash64(F.lit(None).cast("string")).alias("null_only"),
        F.xxhash64("a", F.lit(None).cast("string")).alias("null_skip"),
        F.xxhash64(F.lit("abc"), F.col("b")).alias("str_long"),
    ).collect()[0]
    hl = X.hash_long_py
    assert row["ab"] == X.signed(hl(7, hl(5, X.SEED)))
    assert row["null_only"] == X.SEED  # null children leave the seed
    assert row["null_skip"] == X.signed(hl(5, X.SEED))
    assert row["str_long"] == X.signed(hl(7, X.hash_str_py("abc")))


def test_xxh64_generated_sql_matches_reference_fuzz():
    """The generated DuckDB expansion is bit-exact with the (Spark-
    pinned) Python reference over 500 random strings covering every
    length regime and multibyte chars, plus hash_long chains."""
    import random

    import duckdb

    from etl_property_rumah123_spark.functions import xxh64_sql as X

    rng = random.Random(99)
    alpha = "abcdefghijklmnop qrstuvwxyz0123456789|éü☃"
    fuzz = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 150)))
        for _ in range(500)
    ] + [None, ""]
    con = duckdb.connect()
    con.execute("CREATE TABLE f (i INT, s VARCHAR)")
    con.executemany("INSERT INTO f VALUES (?, ?)", list(enumerate(fuzz)))
    sql = X.xxh64_str_sql("SELECT i, s FROM f", "s", "h")
    for i, h in con.execute(f"SELECT i, h FROM ({sql})").fetchall():
        want = X.SEED if fuzz[i] is None else X.hash_str_py(fuzz[i])
        assert h == want, (i, fuzz[i])

    # hash_long chain levels (the seeded-min + band-key building block)
    con.execute("CREATE TABLE g AS SELECT * FROM (VALUES (0::HUGEINT), "
                "(42::HUGEINT), (9223372036854775807::HUGEINT), "
                "(9223372036854775808::HUGEINT), "
                "(18446744073709551615::HUGEINT)) v(u)")
    chain = X.wrap_levels(
        "SELECT u FROM g",
        X.hash_long_levels("h1", "u", X.SEED)
        + X.hash_long_levels("h2", 3, "h1"),
    )
    for u, h1, h2 in con.execute(
        f"SELECT u, h1, h2 FROM ({chain})"
    ).fetchall():
        assert h1 == X.hash_long_py(int(u), X.SEED)
        assert h2 == X.hash_long_py(3, h1)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.tuples(
        st.integers(1, 12),          # height
        st.integers(1, 12),          # width
        st.integers(1, 7),           # predictor
        st.sampled_from([2, 4, 8, 12, 16]),  # precision
        st.booleans(),               # arithmetic entropy path
        st.integers(0, 3),           # restart rows (0 = none)
        st.randoms(use_true_random=False),
    )
)
def test_lossless_jpeg_roundtrip_property(params):
    """PROPERTY: decode(encode(x)) == x bit-exactly for the lossless
    family across random shapes, every predictor, the full precision
    ladder, both entropy paths, and restart intervals — losslessness
    is the invariant, not a tolerance."""
    import numpy as np

    from etl_property_rumah123_spark.functions import jpeg_lossless as L

    h, w, predictor, precision, arith, rst, rnd = params
    px = np.array(
        [
            [
                [rnd.randrange(1 << precision) for _ in range(3)]
                for _ in range(w)
            ]
            for _ in range(h)
        ],
        dtype=np.uint16 if precision > 8 else np.uint8,
    )
    enc = (
        L.encode_jpeg_lossless_arithmetic if arith else L.encode_jpeg_lossless
    )
    data = enc(px, predictor=predictor, precision=precision, restart_rows=rst)
    out = L.decode_jpeg_lossless(data)
    assert out.shape == px.shape
    assert np.array_equal(out, px)
