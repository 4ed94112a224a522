"""Queries proving the listing-source surface (ops S1-S5, S3/P1-P5).

``listing_parse_cards`` is oracle-checked: card HTML is synthesized
from the ``part`` table *identically* in Spark and DuckDB SQL, then
each side runs its own regexp field extraction — an independent SQL
implementation of op S3's semantics.

``listing_pipeline_end_to_end`` is rows-only (DuckDB cannot run a
Spark Python DataSource): fixture pages -> rumah123_listings source ->
parse_cards -> transform_data, the reference's full
extract->transform path (/root/reference/src/__init__.py:1-3).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_property_rumah123_spark.operators import cleaning
from etl_property_rumah123_spark.operators import listing_parse as lp
from etl_property_rumah123_spark.operators.listing_parse import parse_cards
from etl_property_rumah123_spark.plans import part, register
from etl_property_rumah123_spark.sources.catalog import table
from etl_property_rumah123_spark.sources.fixtures import ADMINS, write_fixture_pages
from etl_property_rumah123_spark.sources.listing_source import ListingDataSource

#: Fixture pages are deterministic (pure function of seed 42) and
#: sf-independent; written at import so the DuckDB oracle — which
#: reads them via read_text() — works no matter whether the driver
#: runs the oracle or the Spark query first.
_FIXTURE_DIR = os.path.join(
    tempfile.gettempdir(), "spark_graft_listing_fixtures_v1"
)
write_fixture_pages(_FIXTURE_DIR, num_pages=4, cards_per_page=12, seed=42)

# Shared SQL fragments for the end-to-end oracle. The price parse and
# int coercion mirror operators/cleaning.py exactly (elif unit order,
# leading-space unit strip, round-then-try_cast, truncate-via-double).
_PRICE_SQL = """TRY_CAST(ROUND(CASE
      WHEN contains({p}, 'triliun') THEN TRY_CAST(trim(replace({p}, ' triliun', '')) AS DOUBLE) * 1000000000000.0
      WHEN contains({p}, 'miliar')  THEN TRY_CAST(trim(replace({p}, ' miliar', ''))  AS DOUBLE) * 1000000000.0
      WHEN contains({p}, 'juta')    THEN TRY_CAST(trim(replace({p}, ' juta', ''))    AS DOUBLE) * 1000000.0
      WHEN contains({p}, 'ribu')    THEN TRY_CAST(trim(replace({p}, ' ribu', ''))    AS DOUBLE) * 1000.0
    END, 0) AS BIGINT)"""

_INT_SQL = "CAST(TRUNC(TRY_CAST(NULLIF(regexp_extract({x}, '(\\d+)', 1), '') AS DOUBLE)) AS INT)"

# An independent DuckDB implementation of the WHOLE extract->transform
# pipeline: read_text() over the same fixture page files the Python
# DataSource reads, regexp card split (the fixture's cards end with
# the only adjacent '</div></div>' pair, so the non-greedy match is
# exact here; the Spark source uses a full div-depth walker), field
# extraction with the same RE2-portable patterns as
# operators/listing_parse.py, the 4-regex badge splitter (lookbehind
# rewritten capture-both — RE2 has no lookbehind), keep-first dedup
# via QUALIFY, and the per-region fan-out counts with per-(link,
# region) dedup.
_PIPELINE_ORACLE = r"""
WITH pages AS (
  SELECT CAST(regexp_extract(filename, 'page_(\d+)', 1) AS INT) AS page_num, content
  FROM read_text('__FIXTURE_GLOB__')
), cardlist AS (
  SELECT page_num,
         regexp_extract_all(content,
           '(?s)<div class="card-featured__middle-section">.*?</div></div>') AS cards
  FROM pages
), cards AS (
  SELECT page_num,
         generate_subscripts(cards, 1) - 1 AS card_idx,
         unnest(cards) AS card
  FROM cardlist
), fields AS (
  SELECT page_num, card_idx,
    page_num * 10000 + card_idx AS ingest_seq,
    'rumah123.com' || NULLIF(regexp_extract(
        COALESCE(list_filter(regexp_extract_all(card, '<a[^>]*>'),
                             a -> NOT contains(a, 'quick-label-badge'))[1], ''),
        'href="([^"]*)"', 1), '') AS link,
    NULLIF(trim(regexp_replace(regexp_replace(
        regexp_extract(card, '(?s)<h2[^>]*>(.*?)</h2>', 1),
        '<[^>]+>', '', 'g'), '\s+', ' ', 'g')), '') AS name,
    NULLIF(regexp_extract(card,
        '(?s)class="card-featured__middle-section__price"[^>]*>.*?<strong[^>]*>(.*?)</strong>',
        1), '') AS price_raw,
    list_transform(regexp_extract_all(card, '(?s)<span[^>]*>(.*?)</span>', 1),
        x -> trim(regexp_replace(regexp_replace(x, '<[^>]+>', '', 'g'), '\s+', ' ', 'g'))) AS spans,
    list_transform(regexp_extract_all(card, '(?s)<div class="attribute-info"[^>]*>(.*?)</div>', 1),
        x -> trim(regexp_replace(regexp_replace(x, '<[^>]+>', '', 'g'), '\s+', ' ', 'g'))) AS sizes,
    list_transform(regexp_extract_all(card, '(?s)<span class="attribute-text"[^>]*>(.*?)</span>', 1),
        x -> trim(regexp_replace(regexp_replace(x, '<[^>]+>', '', 'g'), '\s+', ' ', 'g'))) AS attrs,
    trim(regexp_replace(regexp_replace(
        regexp_extract(card, '(?s)<div class="card-featured__middle-section__header-badge"[^>]*>(.*?)</div>', 1),
        '<[^>]+>', '', 'g'), '\s+', ' ', 'g')) AS badge_text
  FROM cards
), badges AS (
  SELECT *, string_split(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        badge_text,
        '([a-z])([A-Z])', '\1, \2', 'g'),
        '([A-Z]{2,})([A-Z][a-z])', '\1, \2', 'g'),
        '([^\w\s])([A-Za-z])', '\1, \2', 'g'),
        '\s*,\s*', ', ', 'g'),
        '^[, ]+|[, ]+$', '', 'g'),
      ', ') AS badge_parts
  FROM fields
), parsed AS (
  SELECT page_num, card_idx, ingest_seq, link, name, price_raw,
    COALESCE(list_filter(spans, x -> len(list_filter(
        ['jakarta selatan', 'jakarta timur', 'bogor', 'depok', 'bekasi'],
        a -> contains(lower(x), a))) > 0)[1], '') AS location,
    sizes[1] AS lot_raw, sizes[2] AS building_raw,
    attrs[1] AS bed_raw,
    array_to_string(badge_parts[2:], '|') AS features
  FROM badges
), priced AS (
  SELECT *, trim(replace(replace(lower(price_raw), 'rp ', ''), ',', '.')) AS pnorm
  FROM parsed
), transformed AS (
  SELECT ingest_seq, link, name, location, features,
    __PRICE_PNORM__ AS price_rp,
    __LOT_INT__ AS lot_size,
    __BUILDING_INT__ AS building_size,
    __BED_INT__ AS n_bedroom
  FROM priced
  WHERE link IS NOT NULL
  QUALIFY row_number() OVER (PARTITION BY link ORDER BY ingest_seq) = 1
), fan AS (
  SELECT r.region, t.link, __PRICE_TNORM__ AS price_rp
  FROM priced t CROSS JOIN (VALUES ('jakarta'), ('bogor')) r(region)
  WHERE t.link IS NOT NULL AND t.page_num <= 2
  QUALIFY row_number() OVER (PARTITION BY r.region, t.link ORDER BY t.ingest_seq) = 1
), fanagg AS (
  SELECT region, COUNT(*) AS n_listings, COUNT(price_rp) AS n_priced
  FROM fan GROUP BY region
)
SELECT 'listing' AS part,
  CAST(link AS VARCHAR) AS link, CAST(name AS VARCHAR) AS name,
  CAST(price_rp AS VARCHAR) AS price_rp, CAST(location AS VARCHAR) AS location,
  CAST(lot_size AS VARCHAR) AS lot_size, CAST(building_size AS VARCHAR) AS building_size,
  CAST(n_bedroom AS VARCHAR) AS n_bedroom, CAST(features AS VARCHAR) AS features,
  CAST(NULL AS BIGINT) AS n1, CAST(NULL AS BIGINT) AS n2
FROM transformed
UNION ALL
SELECT 'region_fanout', region, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
  CAST(n_listings AS BIGINT), CAST(n_priced AS BIGINT)
FROM fanagg
"""
# Token replacement, not str.format: the SQL itself contains regex
# quantifier braces ({2,}) that format() would try to interpret.
_PIPELINE_ORACLE = (
    _PIPELINE_ORACLE
    .replace("__FIXTURE_GLOB__", os.path.join(_FIXTURE_DIR, "page_*.html"))
    .replace("__PRICE_PNORM__", _PRICE_SQL.format(p="pnorm"))
    .replace("__PRICE_TNORM__", _PRICE_SQL.format(p="t.pnorm"))
    .replace("__LOT_INT__", _INT_SQL.format(x="lot_raw"))
    .replace("__BUILDING_INT__", _INT_SQL.format(x="building_raw"))
    .replace("__BED_INT__", _INT_SQL.format(x="bed_raw"))
)


@register(
    "listing_parse_cards",
    """
    WITH card AS (
      SELECT p_partkey, p_name, p_size,
             '<div class="card-featured__middle-section">'
             || '<a class="quick-label-badge" href="/promo">ad</a>'
             || CASE WHEN p_partkey % 7 = 0 THEN ''
                     ELSE '<a href="/properti/' || CAST(p_partkey AS VARCHAR) || '">x</a>' END
             || '<h2>Listing ' || p_name || '</h2>'
             || '<div class="card-featured__middle-section__price"><strong>Rp '
             || CAST(p_size AS VARCHAR) || ',5 Juta</strong></div>'
             || '<span>Dijual</span><span>'
             || CASE p_partkey % 3 WHEN 0 THEN 'Jakarta Selatan' WHEN 1 THEN 'Bogor' ELSE 'Luar Kota' END
             || '</span>'
             || '<span class="attribute-text">3</span><span class="attribute-text">2</span>'
             || '<div class="attribute-info">Tanah : ' || CAST(p_size AS VARCHAR) || ' m2</div>'
             || '</div>' AS html
      FROM part
    )
    SELECT p_partkey AS p_partkey,
           CASE WHEN p_partkey % 7 = 0 THEN NULL
                ELSE 'rumah123.com/properti/' || CAST(p_partkey AS VARCHAR) END AS link,
           'Listing ' || p_name AS name,
           'Rp ' || CAST(p_size AS VARCHAR) || ',5 Juta' AS price_rp,
           COALESCE(list_filter(regexp_extract_all(html, '<span[^>]*>(.*?)</span>', 1),
                    x -> len(list_filter(['jakarta selatan', 'bogor', 'depok'],
                         a -> contains(lower(x), a))) > 0)[1], '') AS location,
           'Tanah : ' || CAST(p_size AS VARCHAR) || ' m2' AS lot_size,
           '3' AS n_bedroom
    FROM card
    """,
    doc="Op S3 — card-HTML field extraction as Column expressions, "
    "proven against DuckDB's independent regexp implementation on "
    "identically synthesized HTML. Ref: src/extract.py:91-116.",
)
def listing_parse_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    key_s = F.col("p_partkey").cast("string")
    size_s = F.col("p_size").cast("string")
    html = F.concat(
        F.lit('<div class="card-featured__middle-section">'),
        F.lit('<a class="quick-label-badge" href="/promo">ad</a>'),
        F.when(F.col("p_partkey") % 7 == 0, F.lit("")).otherwise(
            F.concat(F.lit('<a href="/properti/'), key_s, F.lit('">x</a>'))
        ),
        F.lit("<h2>Listing "), F.col("p_name"), F.lit("</h2>"),
        F.lit('<div class="card-featured__middle-section__price"><strong>Rp '),
        size_s, F.lit(",5 Juta</strong></div>"),
        F.lit("<span>Dijual</span><span>"),
        F.when(F.col("p_partkey") % 3 == 0, F.lit("Jakarta Selatan"))
        .when(F.col("p_partkey") % 3 == 1, F.lit("Bogor"))
        .otherwise(F.lit("Luar Kota")),
        F.lit("</span>"),
        F.lit('<span class="attribute-text">3</span><span class="attribute-text">2</span>'),
        F.lit('<div class="attribute-info">Tanah : '), size_s, F.lit(" m2</div>"),
        F.lit("</div>"),
    )
    cards = p.select("p_partkey", html.alias("card_html"))
    return _parse_with_key(cards)


def _parse_with_key(cards: DataFrame) -> DataFrame:
    """parse_cards' expressions keyed by p_partkey (select-level reuse;
    avoids a join just to carry the key through)."""
    card = F.col("card_html")
    sizes = F.transform(lp._extract_all(card, lp.SIZE_DIV), lp._strip_tags)
    attrs = F.transform(lp._extract_all(card, lp.ATTRIBUTE_SPAN), lp._strip_tags)
    return cards.select(
        "p_partkey",
        lp.card_link(card).alias("link"),
        lp._strip_tags(F.coalesce(lp._extract(card, lp.H2_TEXT), F.lit(""))).alias("name"),
        lp._extract(card, lp.PRICE_STRONG).alias("price_rp"),
        cleaning.pick_location(
            lp.card_spans(card), ["jakarta selatan", "bogor", "depok"]
        ).alias("location"),
        lp.positional_pick(sizes, 0).alias("lot_size"),
        lp.positional_pick(attrs, 0).alias("n_bedroom"),
    )


@register(
    "listing_pipeline_end_to_end",
    _PIPELINE_ORACLE,
    doc="Ops S1/S2/S4/S5 + S3 + F1/T2/P6-P9 + U2 — full extract->"
    "transform over fixture HTML through the rumah123_listings "
    "DataSource, with the multi-region fan-out's per-region counts "
    "appended as 'region_fanout'-tagged rows. Oracle: an independent "
    "DuckDB implementation of the ENTIRE pipeline — read_text() over "
    "the same fixture pages, regexp card split + field extraction, "
    "badge splitter, price/size transforms, QUALIFY keep-first dedup, "
    "per-region fan-out counts. Ref: src/__init__.py:1-3 "
    "(the library API surface) + dags/dags.py:40-149.",
)
def listing_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as FF

    listings = _listing_pipeline(spark, sf_dir).withColumn(
        "part", FF.lit("listing")
    ).withColumn("n1", FF.lit(None).cast("long")).withColumn(
        "n2", FF.lit(None).cast("long")
    )
    fanout = listing_region_fanout(spark, sf_dir)
    fanout_aligned = fanout.select(
        FF.lit("region_fanout").alias("part"),
        FF.col("region").alias("link"),
        *[FF.lit(None).cast("string").alias(c) for c in (
            "name", "price_rp", "location", "lot_size", "building_size",
            "n_bedroom", "features",
        )],
        FF.col("n_listings").cast("long").alias("n1"),
        FF.col("n_priced").cast("long").alias("n2"),
    )
    cast_listings = listings.select(
        "part",
        *[FF.col(c).cast("string").alias(c) for c in (
            "link", "name", "price_rp", "location", "lot_size",
            "building_size", "n_bedroom", "features",
        )],
        "n1",
        "n2",
    )
    return cast_listings.unionByName(fanout_aligned)


def _listing_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    fixture_dir = os.path.join(
        tempfile.gettempdir(), "spark_graft_listing_fixtures_v1"
    )
    write_fixture_pages(fixture_dir, num_pages=4, cards_per_page=12, seed=42)
    try:
        spark.dataSource.register(ListingDataSource)
    except Exception:
        pass  # already registered in this session
    raw = (
        spark.read.format("rumah123_listings")
        .option("fixture_dir", fixture_dir)
        .option("num_pages", "4")
        .option("pages_per_partition", "2")
        .option("base_sleep", "0.001")
        .option("min_sleep", "0.0")
        .load()
    )
    parsed = parse_cards(raw, ADMINS)
    out = cleaning.transform_data(parsed)
    return out.select(
        "link",
        "name",
        "price_rp",
        "location",
        "lot_size",
        "building_size",
        "n_bedroom",
        F.concat_ws("|", "additional_features").alias("features"),
    )


@part(
    "listing_region_fanout",
    None,  # Spark Python DataSource — not runnable in DuckDB
    doc="Op U2 — multi-region fan-out as ONE plan: per-region source "
    "reads unioned by name with a region literal column, then the "
    "shared transform. Ref: dags/dags.py:40-149 + configs/extract.yaml.",
)
def listing_region_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.config import ExtractConfig, RegionConfig
    from etl_property_rumah123_spark.runner import extract_all_regions

    fixture_dir = os.path.join(
        tempfile.gettempdir(), "spark_graft_listing_fixtures_v1"
    )
    write_fixture_pages(fixture_dir, num_pages=4, cards_per_page=12, seed=42)
    cfg = ExtractConfig(
        regions=[
            RegionConfig(name="jakarta", id="dki-jakarta", admins=ADMINS[:2]),
            RegionConfig(name="bogor", id="bogor", admins=ADMINS[2:]),
        ],
        num_pages=2,
    )
    raw = extract_all_regions(
        spark,
        cfg,
        source_options={
            "fixture_dir": fixture_dir,
            "pages_per_partition": "1",
            "base_sleep": "0.001",
            "min_sleep": "0.0",
        },
    )
    # Per-(link, region) dedup: the reference's regions are independent
    # DAG runs, so dedup never crosses regions — which also makes the
    # fan-out deterministic (cross-region dedup would tie on ingest_seq
    # for identical fixture cards and keep an arbitrary region's row).
    out = cleaning.transform_data(
        raw, drop_order_col=False, dedup_keys=["link", "region"]
    )
    return out.groupBy("region").agg(
        F.count("*").alias("n_listings"),
        F.count("price_rp").alias("n_priced"),
    )
