"""Explicit StructType contracts for every dataset the engine touches.

The reference defines its record shape implicitly in three places that
must agree (dict assembly /root/reference/src/extract.py:103-114, dtype
coercion /root/reference/src/transform.py:51-65, DDL
/root/reference/init.sql:1-29). Here one StructType per dataset is the
single contract enforced at read, transform output, and sink.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Reference domain: property listings
# ---------------------------------------------------------------------------

#: Shape produced by card parsing + literal columns
#: (/root/reference/src/extract.py:103-114,177). All scraped fields are
#: raw strings; ``ingest_seq`` is engine-added: a stable scrape order
#: (page_num * 1000 + card index) making keep-first dedup deterministic
#: under Spark's unordered execution (SURVEY §2 op T2).
RAW_LISTING_SCHEMA = StructType(
    [
        StructField("link", StringType(), True),
        StructField("name", StringType(), True),
        StructField("price_rp", StringType(), True),
        StructField("location", StringType(), True),  # '' (not null) on no admin match
        StructField("lot_size", StringType(), True),
        StructField("building_size", StringType(), True),
        StructField("n_bedroom", StringType(), True),
        StructField("n_bathroom", StringType(), True),
        StructField("n_carport", StringType(), True),
        StructField("additional_features", ArrayType(StringType()), True),
        StructField("ads_type", StringType(), True),
        StructField("property_type", StringType(), True),
        StructField("ingest_seq", LongType(), True),
    ]
)

#: Post-transform shape, matching the ``property_rumah`` DDL
#: (/root/reference/init.sql:1-14). ``additional_features`` stays
#: array<string> in-engine (Parquet preserves it); it is stringified
#: only at a VARCHAR sink (SURVEY §1.4).
CLEAN_LISTING_SCHEMA = StructType(
    [
        StructField("link", StringType(), False),
        StructField("name", StringType(), True),
        StructField("price_rp", LongType(), True),
        StructField("location", StringType(), True),
        StructField("lot_size", IntegerType(), True),
        StructField("building_size", IntegerType(), True),
        StructField("n_bedroom", IntegerType(), True),
        StructField("n_bathroom", IntegerType(), True),
        StructField("n_carport", IntegerType(), True),
        StructField("additional_features", ArrayType(StringType()), True),
        StructField("ads_type", StringType(), True),
        StructField("property_type", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/; see TESTDATA.md)
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [
            StructField("r_regionkey", IntegerType()),
            StructField("r_name", StringType()),
        ]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    ),
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)

# ---------------------------------------------------------------------------
# Multimodal extension: opaque media columns with typed metadata
# ---------------------------------------------------------------------------

#: A multimodal sample row: media payloads are opaque binary; typed
#: metadata travels alongside so partition pruning / filters never need
#: to touch the payload bytes.
MEDIA_SCHEMA = StructType(
    [
        StructField("sample_id", LongType(), False),
        StructField("modality", StringType(), False),  # 'image'|'audio'|'video'
        StructField("payload", BinaryType(), True),
        StructField("mime_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("caption", StringType(), True),
    ]
)
