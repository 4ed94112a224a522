"""Golden-input tests for the reference transform semantics.

Each case exercises a quirk from SURVEY §1.4 / FIXTURES.md A1: price
unit expansion with Indonesian decimal comma, first-digit-run size
extraction, coerce-to-null int casts, keep-first dedup, ''-vs-null
location, badge splitting.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_property_rumah123_spark.operators import cleaning
from etl_property_rumah123_spark.schemas import RAW_LISTING_SCHEMA


def raw_row(**kw):
    base = {
        "link": "rumah123.com/p/1",
        "name": "Rumah",
        "price_rp": "Rp 2,5 Miliar",
        "location": "Jakarta Selatan",
        "lot_size": "Tanah : 120 m²",
        "building_size": "Bangunan : 90 m²",
        "n_bedroom": "3",
        "n_bathroom": "2",
        "n_carport": "1",
        "additional_features": ["Garasi"],
        "ads_type": "jual",
        "property_type": "rumah",
        "ingest_seq": 1,
    }
    base.update(kw)
    return base


def run_transform(spark, rows):
    df = spark.createDataFrame(rows, RAW_LISTING_SCHEMA)
    return cleaning.transform_data(df)


# --- price parse (P7+P8): FIXTURES rows 3-8 -------------------------------

PRICE_CASES = [
    ("Rp 2,5 Miliar", 2_500_000_000),
    ("Rp 1,5 Triliun", 1_500_000_000_000),
    ("Rp 950 Juta", 950_000_000),
    ("Rp 500 Ribu", 500_000),
    ("Rp 850000000", None),  # unit-less: documented divergence -> null
    (None, None),
    ("hubungi kami", None),  # no digits, no unit
    ("Rp 1,75 Miliar", 1_750_000_000),
]


@pytest.mark.parametrize("raw,expected", PRICE_CASES)
def test_price_parse(spark, raw, expected):
    out = run_transform(spark, [raw_row(price_rp=raw)]).collect()
    assert len(out) == 1
    assert out[0]["price_rp"] == expected


# --- size extraction (P6): FIXTURES rows 9-10 ------------------------------


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Tanah : 120 m²", 120),
        ("Tanah : 1.200 m²", 1),  # first digit run only — quirk preserved
        ("no digits", None),
        (None, None),
    ],
)
def test_size_extraction(spark, raw, expected):
    out = run_transform(spark, [raw_row(lot_size=raw)]).collect()
    assert out[0]["lot_size"] == expected


# --- int coercion (P9): FIXTURES row 11 ------------------------------------


@pytest.mark.parametrize(
    "raw,expected",
    [("3", 3), ("3+1", None), ("", None), (None, None), ("2.5", 2)],
)
def test_int_coercion(spark, raw, expected):
    out = run_transform(spark, [raw_row(n_bedroom=raw)]).collect()
    assert out[0]["n_bedroom"] == expected


# --- F1 + T2: FIXTURES rows 1-2 --------------------------------------------


def test_null_link_dropped_then_keep_first_dedup(spark):
    rows = [
        raw_row(link=None, ingest_seq=0),
        raw_row(link="rumah123.com/p/9", name="first", ingest_seq=5),
        raw_row(link="rumah123.com/p/9", name="second", ingest_seq=9),
        raw_row(link="rumah123.com/p/8", name="only", ingest_seq=7),
    ]
    out = run_transform(spark, rows).orderBy("link").collect()
    assert [r["link"] for r in out] == ["rumah123.com/p/8", "rumah123.com/p/9"]
    by_link = {r["link"]: r["name"] for r in out}
    assert by_link["rumah123.com/p/9"] == "first"  # keep-first, not arbitrary


def test_dedup_deterministic_across_partition_layouts(spark):
    rows = [
        raw_row(link="rumah123.com/p/1", name=f"v{i}", ingest_seq=i)
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, RAW_LISTING_SCHEMA).repartition(16)
    out = cleaning.transform_data(df).collect()
    assert len(out) == 1 and out[0]["name"] == "v0"


# --- extract-side ops: P3 location pick, P4 badge split, P5 positional -----


def test_pick_location_first_match_else_empty(spark):
    df = spark.createDataFrame(
        [
            (["Dijual", "Cilandak, Jakarta Selatan", "Bekasi Barat"],),
            (["Dijual", "Surabaya"],),
        ],
        "spans: array<string>",
    )
    got = df.select(
        cleaning.pick_location(F.col("spans"), ["Jakarta", "Kepulauan Seribu"]).alias(
            "loc"
        )
    ).collect()
    assert got[0]["loc"] == "Cilandak, Jakarta Selatan"
    assert got[1]["loc"] == ""  # empty string, not null (src/extract.py:99-100)


def test_split_badges_matches_reference_semantics(spark):
    import re

    def reference_clean_badge_text(text):
        # mirrors /root/reference/src/extract.py:80-88 for oracle parity
        text = re.sub(r"(?<=[a-z])([A-Z])", r", \1", text)
        text = re.sub(r"([A-Z]{2,})([A-Z][a-z])", r"\1, \2", text)
        text = re.sub(r"([^\w\s])([A-Za-z])", r"\1, \2", text)
        text = re.sub(r"\s*,\s*", ", ", text).strip(", ")
        features = text.split(", ")
        return features[1:] if features else []

    samples = [
        "RumahKPRBaru",
        "ApartemenFully FurnishedSHM - Sertifikat Hak Milik",
        "Rumah",
        "KostVIPDekat Kampus",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "badge: string")
    got = [
        r["feats"]
        for r in df.select(
            cleaning.split_badges(F.col("badge")).alias("feats")
        ).collect()
    ]
    expected = [reference_clean_badge_text(s) for s in samples]
    assert got == expected


def test_positional_pick_null_out_of_range(spark):
    df = spark.createDataFrame([(["a", "b"],)], "arr: array<string>")
    row = df.select(
        cleaning.positional_pick(F.col("arr"), 0).alias("x0"),
        cleaning.positional_pick(F.col("arr"), 2).alias("x2"),
    ).collect()[0]
    assert row["x0"] == "a" and row["x2"] is None


def test_assemble_link_null_propagates(spark):
    df = spark.createDataFrame([("/p/1",), (None,)], "href: string")
    got = [
        r["link"]
        for r in df.select(cleaning.assemble_link(F.col("href")).alias("link")).collect()
    ]
    assert got == ["rumah123.com/p/1", None]


# --- property-based: parse_price monotone in numeric part per unit ---------


def test_price_parse_monotone(spark):
    vals = [f"Rp {n} Juta" for n in (1, 2, 10, 99, 500, 999)]
    rows = [raw_row(link=f"rumah123.com/p/{i}", price_rp=v, ingest_seq=i) for i, v in enumerate(vals)]
    out = run_transform(spark, rows).orderBy("link")
    prices = {r["link"]: r["price_rp"] for r in out.collect()}
    ordered = [prices[f"rumah123.com/p/{i}"] for i in range(len(vals))]
    assert ordered == sorted(ordered) and all(p is not None for p in ordered)


def test_jaccard_pair_sample_is_deterministic_unbiased_subset(spark):
    """pair_sample keeps a deterministic subset of the full pair
    output with EXACT scores (same rows, fewer of them), and the kept
    fraction lands near the requested rate."""
    from etl_property_rumah123_spark.operators import dedup
    from etl_property_rumah123_spark.sources.catalog import table

    d = table(spark, "/root/testdata/sf0.001", "documents")
    full = {
        (r["id_a"], r["id_b"]): (r["inter"], r["na"], r["nb"])
        for r in dedup.jaccard_pairs(d, threshold=0.02).collect()
    }
    kept = {
        (r["id_a"], r["id_b"]): (r["inter"], r["na"], r["nb"])
        for r in dedup.jaccard_pairs(d, threshold=0.02, pair_sample=0.5).collect()
    }
    again = {
        (r["id_a"], r["id_b"]): (r["inter"], r["na"], r["nb"])
        for r in dedup.jaccard_pairs(d, threshold=0.02, pair_sample=0.5).collect()
    }
    assert kept == again  # deterministic across runs
    assert set(kept) <= set(full)
    for k, v in kept.items():
        assert full[k] == v  # exact scores on the kept pairs
    frac = len(kept) / max(1, len(full))
    assert 0.25 < frac < 0.75, frac  # ~0.5 on a few-hundred-pair set


def test_simhash_pair_sample_mirrors_jaccard_contract(spark):
    """Same audit contract on the SimHash path: deterministic subset,
    exact hamming on kept pairs."""
    from etl_property_rumah123_spark.operators import dedup
    from etl_property_rumah123_spark.sources.catalog import table

    d = table(spark, "/root/testdata/sf0.001", "documents")
    kw = dict(max_hamming=24, prefix_bits=12)
    full = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_dups(d, **kw).collect()
    }
    kept = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_dups(d, pair_sample=0.5, **kw).collect()
    }
    assert set(kept) <= set(full)
    for k, v in kept.items():
        assert full[k] == v
    frac = len(kept) / max(1, len(full))
    assert 0.3 < frac < 0.7, frac


def test_pair_gate_algorithm_is_pinned(spark):
    """The audit gate's exact keep-set for a fixed input is pinned:
    any change to the salt, hash, or threshold arithmetic (which
    would silently reshuffle every recorded audit) fails here."""
    from pyspark.sql import functions as F

    from etl_property_rumah123_spark.operators.dedup import _pair_gate

    df = spark.createDataFrame(
        [(a, b) for a in range(1, 6) for b in range(a + 1, 7)], "a long, b long"
    )
    kept = sorted(
        (r["a"], r["b"])
        for r in df.filter(_pair_gate(F.col("a"), F.col("b"), 0.5)).collect()
    )
    # recorded from the current salted-md5 gate ('|'-joined, salt
    # 'pair-audit', top-48-bit threshold)
    assert kept == [
        (1, 3), (1, 4), (1, 6), (2, 3), (2, 4), (2, 6),
        (3, 4), (3, 5), (3, 6), (4, 5), (5, 6),
    ]
