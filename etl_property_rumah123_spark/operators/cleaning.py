"""Reference transform semantics as pure Column expressions (no UDFs).

Re-expresses /root/reference/src/transform.py:70-95's eager pandas
pipeline as one lazy Spark plan:

    drop_null_keys -> dedupe_keep_first -> extract_numeric_sizes
      -> normalize_price -> coerce_int_columns

plus the extract-side scalar semantics (/root/reference/src/extract.py):
badge splitting, location first-match, link assembly.

Every function here is a Column-expression rewrite — the whole pipeline
stays inside WholeStageCodegen; the only shuffle in the plan is the
keep-first dedup window. The reference's single UDF-style application
(Series.map(parse_price), /root/reference/src/transform.py:51) becomes a
native when-chain (op P8) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Columns coerce-cast to nullable int by the reference
#: (/root/reference/src/transform.py:59-63).
INT_COLUMNS = ("n_bedroom", "n_bathroom", "n_carport", "lot_size", "building_size")

#: Unit word -> multiplier, in the reference's elif order
#: (/root/reference/src/transform.py:31-39). Order matters: the first
#: matching unit wins, exactly like the elif chain.
_PRICE_UNITS = (
    ("triliun", 1_000_000_000_000),
    ("miliar", 1_000_000_000),
    ("juta", 1_000_000),
    ("ribu", 1_000),
)


def _try_double(col: Column) -> Column:
    """Permissive string->double: null on garbage under any ANSI setting.

    Matches ``float(...)`` + ``except ValueError: return None``
    (/root/reference/src/transform.py:32-41) and
    ``pd.to_numeric(errors='coerce')`` (/root/reference/src/transform.py:65).
    """
    return col.try_cast("double")


# ---------------------------------------------------------------------------
# F1 + T2: null-key filter and keep-first dedup
# ---------------------------------------------------------------------------


def drop_null_keys(df: DataFrame, key: str = "link") -> DataFrame:
    """Op F1 — drop rows whose key is null
    (/root/reference/src/transform.py:8). Runs before dedup, preserving
    the reference's order of operations."""
    return df.filter(F.col(key).isNotNull())


def dedupe_keep_first(
    df: DataFrame,
    key: str | list[str] = "link",
    order_col: str = "ingest_seq",
) -> DataFrame:
    """Op T2 — deterministic keep-first dedup by key.

    pandas ``drop_duplicates(subset='link')`` keeps the *first*
    occurrence in scrape order (/root/reference/src/transform.py:11);
    extraction order is newest-first (sort=posted-desc,
    /root/reference/src/extract.py:143). Spark's ``dropDuplicates``
    keeps an arbitrary row, so determinism needs an explicit ordering
    column: ``ingest_seq`` is assigned by the source (page_num * 1000 +
    card index) — stable across retries and partitioning, unlike
    ``monotonically_increasing_id`` which changes with partition layout.

    Scale note: one hash-partition shuffle on ``key``. At 100 TB the
    window is preferable to ``groupBy(key).agg(min_by(...))`` only for
    wide rows; both shuffle once. AQE skew-join/partition-split handles
    hot keys (duplicate-heavy links).

    ``key`` may be a composite (list): the multi-region fan-out dedups
    per (link, region) because the reference's regions are independent
    DAG runs — dedup never crosses a region boundary
    (/root/reference/dags/dags.py:40-149, one DAG per region).
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# P6: digit extraction for sizes
# ---------------------------------------------------------------------------


def extract_first_digits(col: Column) -> Column:
    """Op P6 — first run of digits as a string, null when absent.

    ``str.extract(r'(\\d+)')`` (/root/reference/src/transform.py:19-20)
    takes the FIRST digit run: ``"Tanah : 1.200 m²"`` yields ``"1"``,
    not ``"1200"`` — a quirk preserved on purpose (SURVEY §1.4).
    Spark's regexp_extract returns '' on no match where pandas yields
    NaN, hence the nullif.
    """
    return F.nullif(F.regexp_extract(col, r"(\d+)", 1), F.lit(""))


def extract_numeric_sizes(df: DataFrame) -> DataFrame:
    """Apply P6 to lot_size / building_size
    (/root/reference/src/transform.py:16-22). Values stay strings here,
    exactly like the reference; the int cast happens in
    ``coerce_int_columns`` (/root/reference/src/transform.py:56-67)."""
    return df.withColumns(
        {
            "lot_size": extract_first_digits(F.col("lot_size")),
            "building_size": extract_first_digits(F.col("building_size")),
        }
    )


# ---------------------------------------------------------------------------
# P7 + P8: price normalization and unit-multiplier parse
# ---------------------------------------------------------------------------


def normalize_price_text(col: Column) -> Column:
    """Op P7 — lower, strip 'rp ', Indonesian decimal comma -> dot, trim
    (/root/reference/src/transform.py:49): ``"Rp 2,5 Miliar"`` ->
    ``"2.5 miliar"``."""
    cleaned = F.lower(col)
    cleaned = F.replace(cleaned, F.lit("rp "), F.lit(""))
    cleaned = F.replace(cleaned, F.lit(","), F.lit("."))
    return F.trim(cleaned)


def parse_price(col: Column) -> Column:
    """Op P8 — unit-multiplier price parse as a native when-chain.

    Mirrors parse_price (/root/reference/src/transform.py:25-43):
    the first unit word present (elif order: triliun, miliar, juta,
    ribu) selects the multiplier; the numeric part is the string with
    ``" <unit>"`` removed (leading space included, so ``"2.5miliar"``
    fails to parse -> null, matching the reference's ValueError->None).

    Documented divergence (SURVEY §1.4, FIXTURES.md A1 row 7): a
    unit-less string is returned unparsed by the reference and then
    crashes its ``.round(0).astype('Int64')``; here it is null —
    the closest non-crashing total semantics.
    """
    expr = F.lit(None).cast("double")
    for unit, mult in reversed(_PRICE_UNITS):
        num = _try_double(F.trim(F.replace(col, F.lit(f" {unit}"), F.lit(""))))
        expr = F.when(col.contains(unit), num * F.lit(float(mult))).otherwise(expr)
    return expr


def clean_price_column(df: DataFrame, col: str = "price_rp") -> DataFrame:
    """P7 -> P8 -> round(0) -> nullable long, mirroring
    /root/reference/src/transform.py:46-53's ``clean_price_column``."""
    parsed = parse_price(normalize_price_text(F.col(col)))
    return df.withColumn(col, F.round(parsed, 0).try_cast("long"))


# ---------------------------------------------------------------------------
# P9: coerce-cast to nullable int
# ---------------------------------------------------------------------------


def coerce_int_columns(df: DataFrame, columns=INT_COLUMNS) -> DataFrame:
    """Op P9 — permissive int cast: garbage ('3+1') -> null, matching
    ``pd.to_numeric(errors='coerce').astype('Int64')``
    (/root/reference/src/transform.py:56-67). Note the reference
    coerces via float, so ``"2.5"`` -> 2 — try_cast to double first,
    then truncate to int, reproduces that."""
    return df.withColumns(
        {c: _try_double(F.col(c)).try_cast("int") for c in columns}
    )


# ---------------------------------------------------------------------------
# Extract-side scalar semantics (ops P1-P5)
# ---------------------------------------------------------------------------


def assemble_link(href: Column) -> Column:
    """Op P1 — ``"rumah123.com" + href``, null-propagating like the
    reference's ``if link_tag else None``
    (/root/reference/src/extract.py:104)."""
    return F.concat(F.lit("rumah123.com"), href)


def pick_location(spans: Column, admins: list[str]) -> Column:
    """Op P3 — first span whose text contains any admin name
    (case-insensitive); '' (empty string, NOT null) when nothing
    matches (/root/reference/src/extract.py:99-100).

    Higher-order functions keep this JVM-side: filter + exists over the
    span array, then element_at(…, 1) with a coalesce to ''.
    """
    lowered_admins = F.array(*[F.lit(a.lower()) for a in admins])
    matches = F.filter(
        spans,
        lambda s: F.exists(lowered_admins, lambda a: F.lower(s).contains(a)),
    )
    return F.coalesce(F.get(matches, 0), F.lit(""))


def split_badges(badge_text: Column) -> Column:
    """Op P4 — camel-case/punctuation badge splitter -> array<string>,
    head element (the property type) dropped.

    Mirrors clean_badge_text (/root/reference/src/extract.py:75-88):
    four chained substitutions then ``split(', ')`` then ``[1:]``.
    Null badge tag -> empty array (the reference returns [] early).
    """
    t = F.regexp_replace(badge_text, r"(?<=[a-z])([A-Z])", r", $1")
    t = F.regexp_replace(t, r"([A-Z]{2,})([A-Z][a-z])", r"$1, $2")
    t = F.regexp_replace(t, r"([^\w\s])([A-Za-z])", r"$1, $2")
    t = F.regexp_replace(t, r"\s*,\s*", ", ")
    t = F.regexp_replace(t, r"^[, ]+|[, ]+$", "")  # .strip(', ') analog
    parts = F.split(t, r", ")
    # features[1:] — drop the leading property-type element
    tail = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
    return F.coalesce(tail, F.array().cast("array<string>"))


def positional_pick(arr: Column, idx: int) -> Column:
    """Op P5 — ``tags[i] if len(tags) > i else None``
    (/root/reference/src/extract.py:108-112). ``F.get`` is 0-based and
    null-safe out of range, an exact match."""
    return F.get(arr, idx)


# ---------------------------------------------------------------------------
# The composed pipeline (mirrors transform_data, src/transform.py:70-95)
# ---------------------------------------------------------------------------


def transform_data(
    df: DataFrame,
    drop_order_col: bool = True,
    dedup_keys: list[str] | None = None,
) -> DataFrame:
    """The reference's transform_data as ONE lazy plan.

    Steps (same order as /root/reference/src/transform.py:87-90):
      1. drop null links          (F1)
      2. keep-first dedup by link (T2 — the plan's only shuffle)
      3. numeric size extraction  (P6)
      4. price clean + parse      (P7+P8)
      5. int coercion             (P9)

    Catalyst pipelines 3-5 into a single WholeStageCodegen stage after
    the dedup exchange; at 100 TB the cost is one shuffle of the
    deduped columns, nothing else.
    """
    out = drop_null_keys(df)
    out = dedupe_keep_first(out, key=dedup_keys or "link")
    out = extract_numeric_sizes(out)
    out = clean_price_column(out)
    out = coerce_int_columns(out)
    if drop_order_col and "ingest_seq" in out.columns:
        out = out.drop("ingest_seq")
    return out
