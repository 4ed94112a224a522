"""Oracle-checked queries exercising the reference's cleaning semantics
(SURVEY §2.2-§2.4) over the driver testdata tables.

The raw listing table doesn't exist in testdata, so these queries
synthesize reference-shaped inputs deterministically from testdata
columns (identical construction on both sides) and then apply the
engine's cleaning Column expressions — proving the P6/P7+P8/T2/P3
semantics against an independent SQL implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_property_rumah123_spark.operators import cleaning
from etl_property_rumah123_spark.plans import part, register
from etl_property_rumah123_spark.sources.catalog import table


@part(
    "clean_digit_extract",
    """
    SELECT p_partkey AS p_partkey,
           CAST(NULLIF(REGEXP_EXTRACT('Tanah : ' || CAST(p_size AS VARCHAR) || '.5 m2', '(\\d+)', 1), '') AS INT) AS lot_size,
           CAST(NULLIF(REGEXP_EXTRACT(p_name, '(\\d+)', 1), '') AS INT) AS name_digits
    FROM part
    """,
    doc="Op P6 — first-digit-run extraction incl. the '1.200 -> 1' "
    "quirk (the '.5' suffix must NOT be captured) and no-match -> null "
    "(p_name has no digits). Ref: src/transform.py:19-20.",
)
def clean_digit_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    size_text = F.concat(
        F.lit("Tanah : "), F.col("p_size").cast("string"), F.lit(".5 m2")
    )
    return p.select(
        "p_partkey",
        cleaning.extract_first_digits(size_text).cast("int").alias("lot_size"),
        cleaning.extract_first_digits(F.col("p_name")).cast("int").alias("name_digits"),
    )


@part(
    "clean_price_parse",
    """
    WITH raw AS (
      SELECT p_partkey,
             CASE p_partkey % 5
               WHEN 0 THEN 'Rp ' || CAST(p_size AS VARCHAR) || ',' || CAST(p_partkey % 10 AS VARCHAR) || ' Miliar'
               WHEN 1 THEN 'Rp ' || CAST(p_size AS VARCHAR) || ' Juta'
               WHEN 2 THEN 'Rp ' || CAST(p_size AS VARCHAR) || ' Ribu'
               WHEN 3 THEN 'Rp ' || CAST(p_size AS VARCHAR) || ',' || CAST(p_partkey % 10 AS VARCHAR) || ' Triliun'
               ELSE 'hubungi kami'
             END AS price_rp
      FROM part
    ), norm AS (
      SELECT p_partkey,
             TRIM(REPLACE(REPLACE(LOWER(price_rp), 'rp ', ''), ',', '.')) AS p
      FROM raw
    )
    SELECT p_partkey AS p_partkey,
           CAST(ROUND(
             CASE
               WHEN contains(p, 'triliun') THEN TRY_CAST(TRIM(REPLACE(p, ' triliun', '')) AS DOUBLE) * 1e12
               WHEN contains(p, 'miliar')  THEN TRY_CAST(TRIM(REPLACE(p, ' miliar', ''))  AS DOUBLE) * 1e9
               WHEN contains(p, 'juta')    THEN TRY_CAST(TRIM(REPLACE(p, ' juta', ''))    AS DOUBLE) * 1e6
               WHEN contains(p, 'ribu')    THEN TRY_CAST(TRIM(REPLACE(p, ' ribu', ''))    AS DOUBLE) * 1e3
               ELSE NULL
             END, 0) AS BIGINT) AS price_rp
    FROM norm
    """,
    doc="Ops P7+P8 — Indonesian price normalization + unit-multiplier "
    "parse as a native when-chain, proven against an independent SQL "
    "implementation. Ref: src/transform.py:25-53.",
)
def clean_price_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    size_s = F.col("p_size").cast("string")
    frac_s = (F.col("p_partkey") % 10).cast("string")
    raw = (
        F.when(F.col("p_partkey") % 5 == 0, F.concat(F.lit("Rp "), size_s, F.lit(","), frac_s, F.lit(" Miliar")))
        .when(F.col("p_partkey") % 5 == 1, F.concat(F.lit("Rp "), size_s, F.lit(" Juta")))
        .when(F.col("p_partkey") % 5 == 2, F.concat(F.lit("Rp "), size_s, F.lit(" Ribu")))
        .when(F.col("p_partkey") % 5 == 3, F.concat(F.lit("Rp "), size_s, F.lit(","), frac_s, F.lit(" Triliun")))
        .otherwise(F.lit("hubungi kami"))
    )
    parsed = cleaning.parse_price(cleaning.normalize_price_text(raw))
    return p.select(
        "p_partkey",
        F.round(parsed, 0).try_cast("long").alias("price_rp"),
    )


@part(
    "clean_dedup_keepfirst",
    """
    SELECT user_id AS user_id, event_id AS first_event_id, event_type AS event_type
    FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="Op T2 — deterministic keep-first dedup by key under an "
    "explicit ordering (the engine's ingest_seq pattern), applied to "
    "events keyed by user_id. Ref: src/transform.py:11.",
)
def clean_dedup_keepfirst(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_event_id"),
            "event_type",
        )
    )


@part(
    "clean_null_filter",
    """
    SELECT event_id AS event_id,
           NULLIF(props, '{"k": 0}') AS link_like
    FROM events
    WHERE NULLIF(props, '{"k": 0}') IS NOT NULL
    """,
    doc="Op F1 — null-key filter preceding dedup: a synthetic nullable "
    "key (props nulled on a sentinel value) is filtered with "
    "isNotNull. Ref: src/transform.py:8.",
)
def clean_null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").withColumn(
        "link_like", F.nullif(F.col("props"), F.lit('{"k": 0}'))
    )
    return cleaning.drop_null_keys(e, "link_like").select("event_id", "link_like")


@part(
    "clean_location_pick",
    """
    SELECT doc_id AS doc_id,
           COALESCE(list_filter([source, lang, 'pusat'],
                    x -> len(list_filter(['src1', 'en', 'ja'],
                         a -> contains(lower(x), lower(a)))) > 0)[1],
                    '') AS location
    FROM documents
    """,
    doc="Op P3 — first-match-in-array lookup with ''-not-null on miss, "
    "via higher-order filter/exists. Ref: src/extract.py:99-100.",
)
def clean_location_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    spans = F.array(F.col("source"), F.col("lang"), F.lit("pusat"))
    return d.select(
        "doc_id",
        cleaning.pick_location(spans, ["src1", "en", "ja"]).alias("location"),
    )


@part(
    "clean_int_coercion",
    """
    SELECT event_id AS event_id,
           CAST(TRUNC(TRY_CAST(CASE WHEN event_type = 'error' THEN '3+1'
                              WHEN event_type = 'click' THEN CAST(user_id % 7 AS VARCHAR) || '.5'
                              ELSE CAST(user_id % 9 AS VARCHAR) END AS DOUBLE)) AS INT) AS n_bedroom
    FROM events
    """,
    doc="Op P9 — coerce-cast to nullable int: garbage -> null, floats "
    "truncate (pandas to_numeric via float). Ref: src/transform.py:56-67.",
)
def clean_int_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_type") == "error", F.lit("3+1"))
        .when(
            F.col("event_type") == "click",
            F.concat((F.col("user_id") % 7).cast("string"), F.lit(".5")),
        )
        .otherwise((F.col("user_id") % 9).cast("string"))
    )
    coerced = e.withColumn("n_bedroom", raw)
    out = cleaning.coerce_int_columns(coerced, ["n_bedroom"])
    return out.select("event_id", "n_bedroom")


@part(
    "clean_badge_split",
    """
    WITH badge AS (
      SELECT p_partkey,
             'Rumah' || REPLACE(
               UPPER(SUBSTRING(p_type, 1, 1)) || LOWER(SUBSTRING(p_type, 2, LENGTH(p_type))),
               ' ', '') || 'KPR' AS text
      FROM part
    ), split1 AS (
      SELECT p_partkey,
             REGEXP_REPLACE(
               REGEXP_REPLACE(
                 REGEXP_REPLACE(
                   REGEXP_REPLACE(text, '([a-z])([A-Z])', '\\1, \\2', 'g'),
                   '([A-Z]{2,})([A-Z][a-z])', '\\1, \\2', 'g'),
                 '([^\\w\\s])([A-Za-z])', '\\1, \\2', 'g'),
               '\\s*,\\s*', ', ', 'g') AS t
      FROM badge
    )
    SELECT p_partkey AS p_partkey,
           array_to_string(string_split(TRIM(t, ', '), ', ')[2:], '|') AS features
    FROM split1
    """,
    doc="Op P4 — camel-case badge splitter -> array with head dropped. "
    "Oracle rewrites the lookbehind rule '(?<=[a-z])([A-Z])' as a "
    "capture-both rule (RE2 has no lookbehind); equivalent on this "
    "input because matches never overlap. Ref: src/extract.py:75-88.",
)
def clean_badge_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    camel = F.concat(
        F.lit("Rumah"),
        F.replace(F.initcap(F.lower(F.col("p_type"))), F.lit(" "), F.lit("")),
        F.lit("KPR"),
    )
    return p.select(
        "p_partkey",
        F.concat_ws("|", cleaning.split_badges(camel)).alias("features"),
    )
