"""Postgres sink: staging write + transactional MERGE (ops L1-L4).

Re-expresses /root/reference/src/load.py's pattern for Spark:

  1. L1/L2 — Spark JDBC writes the staging table (truncate + batched
     append happen inside the connector: ``mode('overwrite')`` with
     ``truncate=true``, ``batchsize`` from config; partitions write in
     parallel, replacing the reference's serial 500-row chunks,
     /root/reference/src/load.py:13-27).
  2. L3/L4 — ONE driver-side transaction runs
     ``INSERT ... SELECT FROM stg ON CONFLICT (key) DO UPDATE SET
     col = EXCLUDED.col`` for every column, counting fresh inserts via
     ``xmax = 0`` exactly like /root/reference/src/load.py:30-43.

Exactly-once story (SURVEY §7 'hardest parts' #1): Spark's JDBC write
is at-least-once per task, BUT the staging table is fully replaced
each run and the merge is idempotent on the unique key — re-running
the whole load converges to the same main-table state. Task retries
during the staging write can at worst duplicate staged rows; the merge
dedups them through the key conflict. This mirrors and strengthens the
reference's truncate-then-merge transactionality.

No psycopg2 in this container: ``merge_staging_to_main`` takes any
DB-API connection factory, and tests exercise the SQL generation +
orchestration with a stub connection.
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)


def build_merge_sql(
    columns: Sequence[str],
    stg_table: str,
    main_table: str,
    unique_key: str,
    count_inserts: bool = True,
    distinct: bool = False,
) -> str:
    """The ON CONFLICT upsert statement (all columns overwritten from
    EXCLUDED — full-row last-write-wins, /root/reference/src/load.py:33-39).

    ``count_inserts`` appends the Postgres-specific ``RETURNING
    xmax = 0`` fresh-insert accounting; disable for ANSI targets
    (DuckDB, SQLite) that support ON CONFLICT but not xmax.

    ``distinct`` selects ``SELECT DISTINCT`` from staging. REQUIRED on
    any path where a retried/speculative Spark task may have committed
    its partition's inserts before being retried (per-partition-commit
    staging writers): duplicate same-key staging rows make Postgres
    fail the merge with "ON CONFLICT DO UPDATE command cannot affect
    row a second time". Identical full rows collapse under DISTINCT,
    so the merge stays idempotent. (``pg_datasource.PgWireWriter.commit``
    hand-writes the same DISTINCT for the same reason.)
    """
    cols = ", ".join(columns)
    # The reference overwrites every column incl. the key
    # (/root/reference/src/load.py:36-37); assigning the conflict key to
    # EXCLUDED.key is always a no-op (they are equal by definition of
    # the conflict), and some engines (DuckDB) reject PK assignment —
    # excluding it is semantically identical and portable.
    updates = ", ".join(
        f"{c} = EXCLUDED.{c}" for c in columns if c != unique_key
    )
    select = "SELECT DISTINCT" if distinct else "SELECT"
    sql = (
        f"INSERT INTO {main_table} ({cols})\n"
        f"{select} {cols} FROM {stg_table}\n"
        f"ON CONFLICT ({unique_key}) DO UPDATE SET\n"
        f"{updates}"
    )
    return sql + ("\nRETURNING xmax = 0" if count_inserts else "")


def write_staging(
    df: DataFrame,
    jdbc_url: str,
    stg_table: str,
    batch_size: int = 500,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """L1+L2: truncate-and-replace the staging table via Spark JDBC.

    ``numPartitions`` bounds connection fan-out (1000 executors must
    not open 1000 connections against one Postgres); ``batchsize``
    maps the reference's batch_size=500 (/root/reference/configs/load.yaml:9).
    """
    writer = (
        df.write.format("jdbc")
        .option("url", jdbc_url)
        .option("dbtable", stg_table)
        .option("batchsize", batch_size)
        .option("truncate", "true")
        .mode("overwrite")
    )
    if num_partitions:
        writer = writer.option("numPartitions", num_partitions)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def merge_staging_to_main(
    connection_factory: Callable[[], "Connection"],  # noqa: F821
    columns: Sequence[str],
    stg_table: str,
    main_table: str,
    unique_key: str,
    count_inserts: bool = True,
    distinct: bool = False,
) -> int:
    """L3+L4: run the merge in one driver-side transaction; returns the
    count of freshly inserted rows (xmax = 0 accounting,
    /root/reference/src/load.py:38-42), or -1 when ``count_inserts`` is
    off (non-Postgres targets). Rolls back on any error. Pass
    ``distinct=True`` when staging may hold task-retry duplicates (see
    ``build_merge_sql``)."""
    sql = build_merge_sql(
        columns, stg_table, main_table, unique_key, count_inserts, distinct
    )
    conn = connection_factory()
    try:
        cur = conn.cursor()
        cur.execute(sql)
        inserted = (
            sum(1 for row in cur.fetchall() if row[0]) if count_inserts else -1
        )
        conn.commit()
        logger.info("merged %s -> %s: %d fresh inserts", stg_table, main_table, inserted)
        return inserted
    except Exception:
        conn.rollback()
        raise
    finally:
        conn.close()


def load_to_postgres(
    df: DataFrame,
    jdbc_url: str,
    connection_factory: Callable[[], "Connection"],  # noqa: F821
    stg_table: str,
    main_table: str,
    unique_key: str,
    batch_size: int = 500,
    num_partitions: int | None = None,
) -> int:
    """Full load path mirroring /root/reference/src/load.py:46-96:
    empty-input guard (F2) -> staging replace -> transactional merge.
    Returns fresh-insert count."""
    if not isinstance(batch_size, int) or batch_size <= 0:
        raise ValueError("batch_size must be a positive integer")
    if df.isEmpty():  # F2 empty-input guard (/root/reference/src/load.py:72-74)
        logger.info("no data to load; skipping")
        return 0
    write_staging(df, jdbc_url, stg_table, batch_size, num_partitions)
    return merge_staging_to_main(
        connection_factory, df.columns, stg_table, main_table, unique_key
    )
