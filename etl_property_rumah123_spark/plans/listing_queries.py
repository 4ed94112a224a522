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
    None,  # Spark Python DataSource — not runnable in DuckDB
    doc="Ops S1/S2/S4/S5 + S3 + F1/T2/P6-P9 + U2 — full extract->"
    "transform over fixture HTML through the rumah123_listings "
    "DataSource, with the multi-region fan-out's per-region counts "
    "appended as 'region_fanout'-tagged rows. Ref: src/__init__.py:1-3 "
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
    out = cleaning.transform_data(raw, drop_order_col=False)
    return out.groupBy("region").agg(
        F.count("*").alias("n_listings"),
        F.count("price_rp").alias("n_priced"),
    )
