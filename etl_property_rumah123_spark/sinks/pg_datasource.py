"""``df.write.format("pgwire")`` / ``spark.read.format("pgwire")`` —
Postgres as a Spark 4 Python DataSource over the pure wire-protocol
client, no JDBC jar or psycopg2 required.

READ side: schema inferred from the server's RowDescription type OIDs
(``SELECT ... LIMIT 0``), optionally partition-parallel — give
``partition_column`` (integer) and ``num_partitions`` and each Spark
task scans one contiguous key range over its own connection, the same
stride-partitioning contract as Spark's JDBC reader. ``table`` or an
arbitrary ``query`` can be the source.

WRITE side: the Postgres load path as a Spark writer with a real
commit protocol.

This packages the reference's truncate-staging -> batched-INSERT ->
ON CONFLICT merge flow (/root/reference/src/load.py:6-96) behind
Spark's native writer API, so the exactly-once story lives where
Spark expects it:

- driver, job start (writer construction): TRUNCATE the staging table
  — a retried/replayed JOB starts from clean staging;
- executors, ``write(partition)``: each task opens its own wire
  connection (sinks/pgwire.py — no JDBC jar or psycopg2 needed) and
  streams its rows as multi-row INSERTs of ``batch_size``, committing
  per task; the returned commit message carries the task row count;
- driver, ``commit(messages)``: ONE transaction merges staging into
  the main table with the reference's full-row last-write-wins
  ON CONFLICT and ``xmax = 0`` fresh-insert accounting. Nothing is
  visible in the main table until this commit — Spark task retries
  can at worst re-insert a task's identical rows into staging, which
  the merge's ``SELECT DISTINCT`` collapses (task partition content
  is deterministic, so retry duplicates are full-row duplicates);
- driver, ``abort(messages)``: truncate staging; the main table was
  never touched.

Options: ``dsn`` (unix-socket dir or host:port), ``stg_table``,
``main_table``, ``unique_key``, ``batch_size`` (default 500),
``database``, ``pg_user``. With no ``main_table`` the writer is a
plain staging append (truncate + insert only).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


def _source_sql(options: dict) -> str:
    if "query" in options:
        return f"({options['query']}) AS __src"
    return options["table"]


def _connect_opts(options: dict):
    from etl_property_rumah123_spark.sinks.pgwire import PgConnection

    return PgConnection(
        options["dsn"],
        user=options.get("pg_user", "postgres"),
        database=options.get("database", "postgres"),
    )


@dataclass
class PgRange(InputPartition):
    lo: int | None  # inclusive; None = open
    hi: int | None  # exclusive; None = open


class PgWireReader(DataSourceReader):
    def __init__(self, options: dict, schema) -> None:
        self.options = dict(options)
        self.columns = [f.name for f in schema.fields]
        self.pcol = options.get("partition_column")
        self.n_parts = int(options.get("num_partitions", "1"))

    def partitions(self):
        if not self.pcol or self.n_parts <= 1:
            return [PgRange(None, None)]
        conn = _connect_opts(self.options)
        try:
            (mn, mx), = conn.run(
                f"SELECT MIN({self.pcol}), MAX({self.pcol}) "
                f"FROM {_source_sql(self.options)}"
            )
        finally:
            conn.close()
        if mn is None:
            return [PgRange(None, None)]
        mn, mx = int(mn), int(mx)
        step = max(1, (mx - mn + 1 + self.n_parts - 1) // self.n_parts)
        out = []
        lo = mn
        for i in range(self.n_parts):
            hi = lo + step
            # first/last ranges open-ended so concurrent inserts outside
            # the sampled min/max are still read (JDBC reader contract)
            out.append(
                PgRange(None if i == 0 else lo,
                        None if i == self.n_parts - 1 else hi)
            )
            lo = hi
            if lo > mx:
                out[-1] = PgRange(out[-1].lo, None)
                break
        return out

    def read(self, partition: PgRange):
        conn = _connect_opts(self.options)
        try:
            preds = []
            if partition.lo is not None:
                preds.append(f"{self.pcol} >= {partition.lo}")
            if partition.hi is not None:
                preds.append(f"{self.pcol} < {partition.hi}")
            where = f" WHERE {' AND '.join(preds)}" if preds else ""
            rows = conn.run(
                f"SELECT {', '.join(self.columns)} "
                f"FROM {_source_sql(self.options)}{where}"
            )
            yield from rows
        finally:
            conn.close()


@dataclass
class PgWriteCommit(WriterCommitMessage):
    n_rows: int


class PgWireWriter(DataSourceWriter):
    def __init__(self, options: dict, schema, overwrite: bool) -> None:
        self.dsn = options["dsn"]
        self.stg_table = options["stg_table"]
        self.main_table = options.get("main_table")
        self.unique_key = options.get("unique_key", "link")
        self.batch_size = int(options.get("batch_size", "500"))
        self.database = options.get("database", "postgres")
        self.user = options.get("pg_user", "postgres")
        self.columns = [f.name for f in schema.fields]
        self.truncate_main = overwrite
        # job-start staging truncate (driver side — runs once per job,
        # before any task writes)
        conn = self._connect()
        try:
            conn.run(f"TRUNCATE TABLE {self.stg_table}")
        finally:
            conn.close()

    def _connect(self):
        from etl_property_rumah123_spark.sinks.pgwire import PgConnection

        return PgConnection(self.dsn, user=self.user, database=self.database)

    def write(self, iterator) -> PgWriteCommit:
        from etl_property_rumah123_spark.sinks.pgwire import insert_rows

        conn = self._connect()
        try:
            n = insert_rows(
                conn, self.stg_table, self.columns, iterator, self.batch_size
            )
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()
        return PgWriteCommit(n_rows=n)

    def commit(self, messages) -> None:
        if self.main_table is None:
            return
        conn = self._connect()
        try:
            cur = conn.cursor()
            if self.truncate_main:
                cur.execute(f"TRUNCATE TABLE {self.main_table}")
            cols = ", ".join(self.columns)
            updates = ", ".join(
                f"{c} = EXCLUDED.{c}"
                for c in self.columns
                if c != self.unique_key
            )
            # DISTINCT collapses full-row duplicates a retried task may
            # have re-staged; the reference's plain SELECT is kept in
            # jdbc_merge.build_merge_sql for the non-retrying path.
            cur.execute(
                f"INSERT INTO {self.main_table} ({cols})\n"
                f"SELECT DISTINCT {cols} FROM {self.stg_table}\n"
                f"ON CONFLICT ({self.unique_key}) DO UPDATE SET\n{updates}\n"
                f"RETURNING xmax = 0"
            )
            inserted = sum(1 for r in cur.fetchall() if r[0])
            conn.commit()
            # Spark discards the writer after commit, so the count is
            # surfaced via logging (callers needing it programmatically
            # use load_to_postgres_wire, which returns it).
            import logging

            logging.getLogger(__name__).info(
                "pgwire commit: merged %s -> %s, %d fresh inserts",
                self.stg_table, self.main_table, inserted,
            )
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    def abort(self, messages) -> None:
        conn = self._connect()
        try:
            conn.run(f"TRUNCATE TABLE {self.stg_table}")
        finally:
            conn.close()


class PgWireDataSource(DataSource):
    """Register with ``spark.dataSource.register(PgWireDataSource)``,
    then ``df.write.format("pgwire").option("dsn", ...).save()``."""

    @classmethod
    def name(cls) -> str:
        return "pgwire"

    def schema(self) -> str:
        """Infer the Spark schema from the server's RowDescription
        type OIDs — one ``LIMIT 0`` round trip, no rows."""
        from etl_property_rumah123_spark.sinks.pgwire import PG_OID_TO_SPARK

        conn = _connect_opts(dict(self.options))
        try:
            cur = conn.cursor()
            cur.execute(
                f"SELECT * FROM {_source_sql(dict(self.options))} LIMIT 0"
            )
            conn.rollback()
            fields = [
                f"{name} {PG_OID_TO_SPARK.get(oid, 'string')}"
                for name, oid, *_ in cur.description
            ]
        finally:
            conn.close()
        return ", ".join(fields)

    def reader(self, schema) -> PgWireReader:
        return PgWireReader(dict(self.options), schema)

    def writer(self, schema, overwrite: bool) -> PgWireWriter:
        return PgWireWriter(dict(self.options), schema, overwrite)
