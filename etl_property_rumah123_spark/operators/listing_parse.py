"""Op S3 — listing-card HTML -> typed columns, as pure Column
expressions (no UDF, no Python in the hot path).

Mirrors ``parse_listing_card`` (/root/reference/src/extract.py:91-116)
field by field, but where the reference walks a BeautifulSoup tree per
card in Python, here every field is a regexp/higher-order expression
over the ``card_html`` string column — the whole projection compiles
into one WholeStageCodegen stage, and Catalyst prunes ``card_html``
away right after the projection.

Regex notes (patterns chosen to be portable to RE2/DuckDB for the
oracle): non-greedy spans, ``(?s)`` for tags whose text may wrap lines,
no lookbehind/lookahead anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_property_rumah123_spark.operators.cleaning import (
    assemble_link,
    pick_location,
    positional_pick,
    split_badges,
)

# field-level patterns (group 1 is the payload)
ANCHOR_TAG = r"(<a[^>]*>)"
HREF = r'href="([^"]*)"'
H2_TEXT = r"(?s)<h2[^>]*>(.*?)</h2>"
PRICE_STRONG = (
    r'(?s)class="card-featured__middle-section__price"[^>]*>.*?'
    r"<strong[^>]*>(.*?)</strong>"
)
ANY_SPAN = r"(?s)<span[^>]*>(.*?)</span>"
ATTRIBUTE_SPAN = r'(?s)<span class="attribute-text"[^>]*>(.*?)</span>'
SIZE_DIV = r'(?s)<div class="attribute-info"[^>]*>(.*?)</div>'
BADGE_DIV = r'(?s)<div class="card-featured__middle-section__header-badge"[^>]*>(.*?)</div>'
ANY_TAG = r"<[^>]+>"


def _extract(col: Column, pattern: str) -> Column:
    """regexp_extract with no-match '' folded to null (pandas-NaN
    analog; SURVEY §1.4)."""
    return F.nullif(F.regexp_extract(col, pattern, 1), F.lit(""))


def _extract_all(col: Column, pattern: str) -> Column:
    return F.regexp_extract_all(col, F.lit(pattern), F.lit(1))


def _strip_tags(col: Column) -> Column:
    """get_text() analog: drop nested tags, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.regexp_replace(col, ANY_TAG, ""), r"\s+", " "))


def card_link(card: Column) -> Column:
    """First anchor that is NOT the quick-label badge, its href prefixed
    with the site host (ops P1 + the ``a:not(.quick-label-badge)``
    selector, /root/reference/src/extract.py:93,104). No such anchor ->
    null link."""
    anchors = _extract_all(card, ANCHOR_TAG)
    real = F.filter(anchors, lambda a: ~a.contains("quick-label-badge"))
    href = _extract(F.get(real, 0), HREF)
    return assemble_link(href)


def card_spans(card: Column) -> Column:
    """All span texts in document order, stripped — the
    ``find_all('span')`` input to the location first-match (op P3)."""
    return F.transform(_extract_all(card, ANY_SPAN), _strip_tags)


def parse_cards(df: DataFrame, admin_list: list[str]) -> DataFrame:
    """(page_num, card_idx, card_html, ads_type, property_type) ->
    RAW_LISTING_SCHEMA rows.

    ``ingest_seq = page_num * 10_000 + card_idx`` gives the stable
    scrape-order ranking that keep-first dedup (op T2) needs —
    deterministic across partitioning and task retries, unlike
    ``monotonically_increasing_id``.
    """
    card = F.col("card_html")
    attrs = F.transform(_extract_all(card, ATTRIBUTE_SPAN), _strip_tags)
    sizes = F.transform(_extract_all(card, SIZE_DIV), _strip_tags)
    badge_text = _strip_tags(F.coalesce(_extract(card, BADGE_DIV), F.lit("")))
    return df.select(
        card_link(card).alias("link"),
        _strip_tags(F.coalesce(_extract(card, H2_TEXT), F.lit(""))).alias("name"),
        _extract(card, PRICE_STRONG).alias("price_rp"),
        pick_location(card_spans(card), admin_list).alias("location"),
        positional_pick(sizes, 0).alias("lot_size"),
        positional_pick(sizes, 1).alias("building_size"),
        positional_pick(attrs, 0).alias("n_bedroom"),
        positional_pick(attrs, 1).alias("n_bathroom"),
        positional_pick(attrs, 2).alias("n_carport"),
        split_badges(badge_text).alias("additional_features"),
        F.col("ads_type"),
        F.col("property_type"),
        (F.col("page_num").cast("long") * 10_000 + F.col("card_idx")).alias(
            "ingest_seq"
        ),
    ).withColumn("name", F.nullif(F.col("name"), F.lit("")))
