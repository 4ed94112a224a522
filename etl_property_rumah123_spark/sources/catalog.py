"""Testdata catalog: one place that knows how to scan the benchmark tables.

Reads are plain ``spark.read.parquet`` — Parquet carries the schema, and
going through the DataSource V2 path keeps predicate pushdown, column
pruning, and partition coalescing in play (verify with
``df.explain('formatted')``: look for PushedFilters / ReadSchema).

Replaces the reference's re-infer-types-per-stage CSV handoff
(/root/reference/dags/dags.py:84,102) with schema-carrying columnar scans.
"""

from __future__ import annotations

import os
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from etl_property_rumah123_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Inferred-schema memo: (path, mtime_ns, size) -> StructType. A bare
#: ``spark.read.parquet`` re-infers the schema on EVERY call — a
#: driver-side listing + footer read worth ~90 ms per table on this
#: box — and Spark caches nothing across calls for path-based reads.
#: Real deployments put a catalog (metastore / table-format manifest)
#: in front of the files for exactly this reason; this memo is that
#: catalog, scoped to the process. It holds SCHEMA METADATA only —
#: every query still scans the parquet bytes — and the key carries
#: the file's mtime+size, so touching/regenerating a testdata table
#: invalidates the entry and the next call re-infers.
_SCHEMA_MEMO: "OrderedDict[tuple, object]" = OrderedDict()
#: bound the memo like _ASSIGN_BC_CACHE next door (ADVICE r13): a
#: long-lived session scanning many sf_dirs would otherwise grow it
#: without limit. Generous — one full testdata sweep touches
#: len(TESTDATA_TABLES) × #sf_dirs entries, far under the cap.
_SCHEMA_MEMO_MAX = 64


def _path_sig(path: str) -> tuple | None:
    """Stat signature for the memo key; None disables memoization
    (e.g. non-local filesystems where stat semantics differ).

    For a parquet DIRECTORY the dir's own (mtime, size) does not
    change when a part file is rewritten in place (ADVICE r13), so the
    signature folds in the child count plus the newest child's name,
    mtime, and size — regenerating a table in place invalidates the
    entry even when the directory inode stats are unchanged."""
    try:
        st = os.stat(path)
        if os.path.isdir(path):
            newest: tuple = ()
            names = os.listdir(path)
            for name in names:
                try:
                    cst = os.stat(os.path.join(path, name))
                except OSError:
                    continue
                cand = (cst.st_mtime_ns, name, cst.st_size)
                if cand > newest:
                    newest = cand
            return (path, st.st_mtime_ns, st.st_size, len(names), newest)
    except OSError:
        return None
    return (path, st.st_mtime_ns, st.st_size)


def _memo_get(sig):
    schema = _SCHEMA_MEMO.get(sig)
    if schema is not None:
        _SCHEMA_MEMO.move_to_end(sig)
    return schema


def _memo_put(sig, schema) -> None:
    _SCHEMA_MEMO[sig] = schema
    while len(_SCHEMA_MEMO) > _SCHEMA_MEMO_MAX:
        _SCHEMA_MEMO.popitem(last=False)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table.

    ``events.parquet``'s ``ts`` column has shipped in three physical
    encodings across testdata generations, and every downstream plan
    expects one logical type — session-zoned TimestampType (the
    session zone is pinned to UTC in ``session.get_spark``):

    - TIMESTAMP(NANOS): the Spark reader rejects it by default
      (PARQUET_TYPE_ILLEGAL). We read nanos as raw int64
      (``nanosAsLong``) and rebuild a TimestampType with integer
      division — ``ts div 1000`` stays in long arithmetic, so no
      double-precision loss at ~1.7e18 nanos.
    - TIMESTAMP(MICROS) without timezone: Spark infers TIMESTAMP_NTZ,
      which functions like ``unix_micros`` reject. Cast to
      TimestampType — with the session zone at UTC the wall-clock
      values (and the DuckDB-oracle comparison) are unchanged.
    - TIMESTAMP(MICROS) with timezone: already TimestampType; no-op.

    The ``nanosAsLong`` conf is consulted only at schema-inference
    time (the ``spark.read.parquet`` call below), so it is scoped:
    saved, set, and restored immediately — a concurrent reader of a
    nanos file in the same session sees its own setting, never ours.
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    sig = _path_sig(path)
    memo = _memo_get(sig) if sig else None
    if name == "events":
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            if memo is not None:
                df = spark.read.schema(memo).parquet(path)
            else:
                df = spark.read.parquet(path)
                if sig:
                    _memo_put(sig, df.schema)
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    if memo is not None:
        return spark.read.schema(memo).parquet(path)
    df = spark.read.parquet(path)
    if sig:
        _memo_put(sig, df.schema)
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Scan several tables at once; all tables when no names given."""
    names = names or TESTDATA_TABLES
    return {n: table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so plans can be written in Spark SQL.

    Views are lazy — registering all ten costs nothing until a query
    actually scans one.
    """
    for name, df in tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)


def read_stage_csv(
    spark: SparkSession,
    path: str,
    schema,
    header: bool = True,
    capture_corrupt: bool = True,
) -> DataFrame:
    """Stage-handoff CSV read with an EXPLICIT schema (op S7) — the
    reference re-inferred types at every stage boundary
    (/root/reference/dags/dags.py:84,102), which is how a column of
    digit-like strings silently becomes an int in one run and a string
    in the next. Here the declared StructType is the contract, and
    type inference never runs.

    ``capture_corrupt`` adds the PERMISSIVE-mode ``_corrupt_record``
    column: malformed lines land there as raw text instead of either
    failing the job (FAILFAST) or silently vanishing (DROPMALFORMED) —
    the same corrupt-rows-are-data stance as the multimodal decode
    path. Filter ``_corrupt_record IS NOT NULL`` to quarantine them.

    Note the Spark caveat: a bare ``count()``/aggregate over only the
    corrupt column can be answered without parsing; select the data
    columns (or cache) before counting corrupt rows.
    """
    from pyspark.sql.types import StringType, StructType

    if capture_corrupt:
        if not isinstance(schema, StructType):
            raise TypeError("capture_corrupt requires a StructType schema")
        schema = StructType(schema.fields[:]).add("_corrupt_record", StringType())
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    return reader.csv(path)
