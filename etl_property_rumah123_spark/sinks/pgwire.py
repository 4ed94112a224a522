"""Minimal pure-Python PostgreSQL wire-protocol (v3) client.

Why this exists: the reference's production sink is Postgres
truncate-staging -> batched INSERT -> ON CONFLICT merge with
``RETURNING xmax = 0`` accounting (/root/reference/src/load.py:6-43),
but this container ships neither psycopg2 nor a JDBC driver jar. The
PostgreSQL frontend/backend protocol is a public spec
(https://www.postgresql.org/docs/current/protocol.html), and the
subset a batch sink needs — startup with trust auth + the simple query
protocol, text-format results — is small enough to implement on a raw
socket. With it, the L1-L4 load path executes against a REAL Postgres
server end-to-end: executor tasks each open their own connection for
the per-partition staging inserts, and the driver runs the
transactional merge through the same DB-API-shaped surface
``merge_staging_to_main`` already accepts.

Scope (deliberate): trust/no-password auth only, simple query protocol
only (no prepared statements, no COPY), text result format, UTF-8.
That is exactly what the reference's load path needs; production
deployments swap in psycopg2 via the same ``connection_factory`` seam.

DB-API shape: ``PgConnection`` exposes cursor()/commit()/rollback()/
close(); ``PgCursor`` exposes execute()/fetchall()/description.
Transactions are explicit — the first execute() on an idle connection
sends BEGIN, commit()/rollback() end it — mirroring psycopg2's
autocommit-off default that the reference relies on
(/root/reference/src/load.py:80-96).
"""

from __future__ import annotations

import socket
import struct

PROTOCOL_3_0 = 196608  # (3 << 16) | 0

def _parse_ts(s: str):
    import datetime as _dt

    fmt = "%Y-%m-%d %H:%M:%S.%f" if "." in s else "%Y-%m-%d %H:%M:%S"
    return _dt.datetime.strptime(s, fmt)


def _parse_date(s: str):
    import datetime as _dt

    return _dt.date.fromisoformat(s)


#: text-format decoders by type OID (sink accounting + reader types).
_DECODERS = {
    16: lambda s: s == "t",  # bool — xmax=0 accounting needs real bools
    20: int, 21: int, 23: int, 26: int,  # int8/2/4, oid
    700: float, 701: float, 1700: float,  # float4/8, numeric
    1114: _parse_ts,  # timestamp (no tz)
    1082: _parse_date,  # date
}

#: OID -> Spark DDL type, for reader schema inference.
PG_OID_TO_SPARK = {
    16: "boolean", 21: "short", 23: "int", 20: "long",
    700: "float", 701: "double", 1700: "double",
    1043: "string", 25: "string", 1042: "string",  # varchar/text/char
    1114: "timestamp", 1082: "date",
}


class PgError(Exception):
    """Server ErrorResponse, with the severity/code/message fields."""

    def __init__(self, fields: dict[str, str]):
        self.fields = fields
        super().__init__(
            f"{fields.get('S', 'ERROR')} {fields.get('C', '')}: "
            f"{fields.get('M', 'unknown error')}"
        )


def quote_literal(value) -> str:
    """Render a Python value as a SQL literal (standard_conforming_
    strings semantics: '' is the only escape). Used by the staging
    INSERT builder; arrays are stringified upstream at the sink
    boundary (SURVEY §1.4). Non-finite floats render as the quoted
    spellings Postgres requires ('NaN'/'Infinity'/'-Infinity') —
    bare nan/inf tokens would be a syntax error."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, float):
        if value != value:
            return "'NaN'"
        if value == float("inf"):
            return "'Infinity'"
        if value == float("-inf"):
            return "'-Infinity'"
        return str(value)
    if isinstance(value, int):
        return str(value)
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    # dates/timestamps/Decimal render via str(); bytes unsupported here
    if isinstance(value, (bytes, bytearray)):
        raise TypeError("binary staging columns are not supported")
    return "'" + str(value).replace("'", "''") + "'"


class PgCursor:
    def __init__(self, conn: "PgConnection"):
        self._conn = conn
        self.description = None
        self._rows: list[tuple] = []
        self.rowcount = -1
        self.statusmessage = ""

    def execute(self, sql: str) -> None:
        self._conn._begin_if_idle()
        cols, rows, tags = self._conn._simple_query(sql)
        self.description = (
            [(name, oid, None, None, None, None, None) for name, oid in cols]
            if cols
            else None
        )
        self._rows = rows
        self.statusmessage = tags[-1] if tags else ""
        parts = self.statusmessage.split()
        self.rowcount = int(parts[-1]) if parts and parts[-1].isdigit() else -1

    def fetchall(self) -> list[tuple]:
        return list(self._rows)

    def fetchone(self):
        return self._rows[0] if self._rows else None

    def close(self) -> None:
        self._rows = []


class PgConnection:
    """One socket, one session. ``dsn`` is either a unix-socket
    DIRECTORY (containing .s.PGSQL.<port>) or a ``host:port`` string."""

    def __init__(
        self,
        dsn: str,
        user: str = "postgres",
        database: str = "postgres",
        port: int = 5432,
        timeout: float = 30.0,
    ):
        if "/" in dsn or dsn.startswith("."):
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.settimeout(timeout)
            self._sock.connect(f"{dsn.rstrip('/')}/.s.PGSQL.{port}")
        else:
            host, _, p = dsn.partition(":")
            self._sock = socket.create_connection(
                (host, int(p or port)), timeout=timeout
            )
        self._buf = b""
        self._txn = "I"  # ReadyForQuery status: I idle, T in-txn, E failed
        self._startup(user, database)

    # -- wire plumbing ----------------------------------------------------

    def _send(self, type_byte: bytes, payload: bytes) -> None:
        self._sock.sendall(type_byte + struct.pack(">i", len(payload) + 4) + payload)

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("server closed the connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_message(self) -> tuple[bytes, bytes]:
        head = self._recv_exact(5)
        mtype = head[:1]
        (length,) = struct.unpack(">i", head[1:5])
        return mtype, self._recv_exact(length - 4)

    @staticmethod
    def _error_fields(payload: bytes) -> dict[str, str]:
        fields = {}
        i = 0
        while i < len(payload) and payload[i] != 0:
            code = chr(payload[i])
            end = payload.index(b"\x00", i + 1)
            fields[code] = payload[i + 1 : end].decode("utf-8", "replace")
            i = end + 1
        return fields

    def _startup(self, user: str, database: str) -> None:
        # standard_conforming_strings is pinned ON in the startup packet:
        # quote_literal's ''-doubling is only injection-safe when
        # backslashes are inert, which a server/session configured with
        # the (legacy) off value would break. Startup-packet GUCs apply
        # before any query we send.
        params = (
            f"user\x00{user}\x00database\x00{database}\x00"
            "client_encoding\x00UTF8\x00"
            "standard_conforming_strings\x00on\x00\x00"
        ).encode()
        payload = struct.pack(">i", PROTOCOL_3_0) + params
        self._sock.sendall(struct.pack(">i", len(payload) + 4) + payload)
        while True:
            mtype, body = self._read_message()
            if mtype == b"R":
                (code,) = struct.unpack(">i", body[:4])
                if code != 0:
                    raise PgError(
                        {"M": f"unsupported auth method {code}; this client "
                              "speaks trust auth only"}
                    )
            elif mtype == b"E":
                raise PgError(self._error_fields(body))
            elif mtype == b"Z":
                self._txn = chr(body[0])
                return
            # 'S' ParameterStatus / 'K' BackendKeyData / 'N' notices: skip

    def _simple_query(self, sql: str):
        """Send one simple-protocol Query; collect (columns, rows, tags)
        across all result sets until ReadyForQuery."""
        self._send(b"Q", sql.encode() + b"\x00")
        cols: list[tuple[str, int]] = []
        rows: list[tuple] = []
        tags: list[str] = []
        error = None
        while True:
            mtype, body = self._read_message()
            if mtype == b"T":  # RowDescription
                (nfields,) = struct.unpack(">h", body[:2])
                cols, i = [], 2
                for _ in range(nfields):
                    end = body.index(b"\x00", i)
                    name = body[i:end].decode()
                    typoid = struct.unpack(">i", body[end + 7 : end + 11])[0]
                    cols.append((name, typoid))
                    i = end + 19
            elif mtype == b"D":  # DataRow
                (ncols,) = struct.unpack(">h", body[:2])
                vals, i = [], 2
                for c in range(ncols):
                    (vlen,) = struct.unpack(">i", body[i : i + 4])
                    i += 4
                    if vlen == -1:
                        vals.append(None)
                    else:
                        text = body[i : i + vlen].decode()
                        i += vlen
                        dec = _DECODERS.get(cols[c][1]) if c < len(cols) else None
                        vals.append(dec(text) if dec else text)
                rows.append(tuple(vals))
            elif mtype == b"C":  # CommandComplete
                tags.append(body[:-1].decode())
            elif mtype == b"E":
                error = PgError(self._error_fields(body))
            elif mtype == b"Z":
                self._txn = chr(body[0])
                if error is not None:
                    raise error
                return cols, rows, tags
            # 'N' NoticeResponse / 'I' EmptyQueryResponse / 'S': skip

    # -- DB-API-ish surface ----------------------------------------------

    def _begin_if_idle(self) -> None:
        if self._txn == "I":
            self._simple_query("BEGIN")

    def cursor(self) -> PgCursor:
        return PgCursor(self)

    def commit(self) -> None:
        if self._txn != "I":
            self._simple_query("COMMIT")

    def rollback(self) -> None:
        if self._txn != "I":
            self._simple_query("ROLLBACK")

    def close(self) -> None:
        try:
            self._sock.sendall(b"X" + struct.pack(">i", 4))  # Terminate
        except OSError:
            pass
        self._sock.close()

    def run(self, sql: str) -> list[tuple]:
        """Autocommit one statement (DDL/setup convenience): runs
        outside any explicit transaction and returns its rows."""
        if self._txn != "I":
            raise PgError({"M": "run() requires an idle connection"})
        _cols, rows, _tags = self._simple_query(sql)
        return rows


def insert_rows(
    conn: PgConnection,
    table: str,
    columns: list[str],
    rows,
    batch_size: int,
    on_conflict: str | None = None,
) -> int:
    """Stream rows into ``table`` as multi-row INSERTs of
    ``batch_size`` on an open connection (no commit — the caller owns
    the transaction). Shared by the foreachPartition staging writer
    and the pgwire DataSource writer so the batching/quoting logic
    has one home. Rows are mappings/Row objects indexable by column
    name. ``on_conflict`` appends an ``ON CONFLICT <clause>`` suffix
    (e.g. ``"DO NOTHING"``) to every statement. Returns the row
    count (rows SENT; see the conflict warning below for rows the
    server skipped).

    DO NOTHING exists to make RETRIES idempotent (a retried task
    whose first attempt committed re-inserts as a no-op), but the
    same clause would also SILENTLY swallow genuine intra-run
    duplicate keys carrying different payloads — previously a loud PK
    violation. To keep real data issues visible, each statement's
    command-complete tag is compared against the batch size and a
    warning reporting the skipped-row total fires whenever conflicts
    were hit — expected and harmless on a retry, a data-quality
    signal on a clean first run."""
    cur = conn.cursor()
    prefix = f"INSERT INTO {table} ({', '.join(columns)}) VALUES "
    suffix = f" ON CONFLICT {on_conflict}" if on_conflict else ""
    batch = []
    n = 0
    skipped = 0

    def flush():
        nonlocal skipped
        cur.execute(prefix + ",\n".join(batch) + suffix)
        if on_conflict and 0 <= cur.rowcount < len(batch):
            skipped += len(batch) - cur.rowcount

    for row in rows:
        batch.append(
            "(" + ", ".join(quote_literal(row[c]) for c in columns) + ")"
        )
        n += 1
        if len(batch) >= batch_size:
            flush()
            batch = []
    if batch:
        flush()
    if skipped:
        import warnings

        warnings.warn(
            f"insert_rows: ON CONFLICT {on_conflict} skipped {skipped} "
            f"of {n} rows inserting into {table} — expected if this is "
            "a task retry re-inserting an already-committed partition; "
            "on a clean first run it means the batch carries duplicate "
            "keys with differing payloads and first-writer-wins rows "
            "reached staging.",
            stacklevel=2,
        )
    return n


def write_staging_wire(
    df,
    dsn: str,
    stg_table: str,
    batch_size: int = 500,
    num_partitions: int | None = None,
    database: str = "postgres",
    user: str = "postgres",
    post_commit_hook=None,
) -> None:
    """L1+L2 without a JDBC jar: truncate the staging table, then each
    Spark PARTITION opens its own wire connection and streams its rows
    as multi-row INSERTs of ``batch_size`` (the reference's chunked
    insert, /root/reference/src/load.py:13-27, distributed).

    ``num_partitions`` bounds connection fan-out exactly like the JDBC
    path's ``numPartitions`` — 1000 executors must not open 1000
    connections against one Postgres. Each partition commits its own
    transaction, and the writer is RETRY-SAFE under BOTH staging
    schemas: the inserts carry ``ON CONFLICT DO NOTHING``, so with the
    reference's keyed staging (``init.sql`` puts a PRIMARY KEY on
    staging too) a retried task whose first attempt already committed
    re-inserts as a no-op instead of dying on the PK violation
    (which would fail the JOB after maxFailures — the reference never
    hits this because its orchestrator retries the whole
    truncate+insert task, /root/reference/dags/dags.py:17-24, while
    Spark retries a single partition). With an UNKEYED staging the
    clause never fires, retries leave exact duplicate rows, and the
    merge's DISTINCT collapses them — fault-injection tests pin both
    regimes.

    ``post_commit_hook`` is a FAULT-INJECTION SEAM for the
    exactly-once tests: called (no args) on the executor after a
    partition's transaction commits, it models the worst retry window
    — the task dying AFTER its insert landed, so the retried attempt
    re-inserts the whole partition and staging holds exact duplicates
    (the hazard the merge's DISTINCT exists for). Production callers
    leave it None.
    """
    conn = PgConnection(dsn, user=user, database=database)
    try:
        conn.run(f"TRUNCATE TABLE {stg_table}")
    finally:
        conn.close()
    columns = list(df.columns)
    if num_partitions:
        df = df.coalesce(num_partitions)

    def insert_partition(rows_iter):
        pconn = PgConnection(dsn, user=user, database=database)
        try:
            insert_rows(
                pconn, stg_table, columns, rows_iter, batch_size,
                on_conflict="DO NOTHING",
            )
            pconn.commit()
        except Exception:
            pconn.rollback()
            raise
        finally:
            pconn.close()
        if post_commit_hook is not None:
            post_commit_hook()

    df.foreachPartition(insert_partition)


def load_to_postgres_wire(
    df,
    dsn: str,
    stg_table: str,
    main_table: str,
    unique_key: str,
    batch_size: int = 500,
    num_partitions: int | None = None,
    database: str = "postgres",
    user: str = "postgres",
) -> int:
    """The reference's full load path (/root/reference/src/load.py:46-96)
    against a REAL Postgres over the wire client: empty guard (F2) ->
    staging truncate + per-partition batched inserts (L1/L2) -> one
    driver transaction running the ON CONFLICT merge with verbatim
    ``xmax = 0`` fresh-insert accounting (L3/L4). Returns the
    fresh-insert count."""
    from etl_property_rumah123_spark.sinks.jdbc_merge import (
        merge_staging_to_main,
    )

    if not isinstance(batch_size, int) or batch_size <= 0:
        raise ValueError("batch_size must be a positive integer")
    if df.isEmpty():
        return 0
    write_staging_wire(
        df, dsn, stg_table, batch_size, num_partitions, database, user
    )
    # distinct=True: write_staging_wire commits per PARTITION, so a
    # retried/speculative task whose commit already landed leaves exact
    # duplicate rows in staging; DISTINCT collapses them so the merge
    # stays idempotent instead of failing with "ON CONFLICT DO UPDATE
    # command cannot affect row a second time".
    return merge_staging_to_main(
        lambda: PgConnection(dsn, user=user, database=database),
        df.columns,
        stg_table,
        main_table,
        unique_key,
        distinct=True,
    )
