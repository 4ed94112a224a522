"""Streaming SOURCE over the snapshot log — ``spark.readStream`` a
:mod:`~etl_property_rumah123_spark.sinks.table_log` table.

The missing half of the log's streaming story: `snapshot_stream_writer`
lets a stream land exactly-once IN a table; this source lets downstream
pipelines tail a table OUT as a stream (the Delta "streaming from a
table" surface) — table versions ARE the offsets, so the microbatch
boundary is the commit boundary and a checkpointed query resumes at
exactly the version it last processed:

    spark.dataSource.register(SnapshotTableDataSource)
    stream = (spark.readStream.format("snapshot_table")
              .option("path", table_dir)
              .load())

Semantics (same contract Delta's streaming reads have):

- The first microbatch is the INITIAL LOAD — every file of the current
  version (``starting_version='initial'``, the default); later batches
  emit exactly the files each new version APPENDED. Pass
  ``starting_version='latest'`` to tail only, or an integer version V
  to start tailing from the commits after V.
- Row-appending operations — ``append``, ``publish_staged`` (the
  write-audit-publish promotion) and ``merge_mor`` (whose appended
  batch files are disjoint from its deletion vectors) — emit their new
  files' rows.
- Content-identical maintenance — ``compact``, ``optimize``,
  ``consolidate_eq`` — emits NOTHING: a rewrite must not re-deliver
  rows a consumer already processed.
- Row-removing / rewriting operations — CoW ``delete``/``merge``,
  ``delete_dv``, ``delete_eq``, ``overwrite`` — cannot be expressed as
  an append stream. They FAIL the stream by default (the honest
  answer); ``.option("ignore_changes", "true")`` skips those versions
  whole, with the documented Delta-``ignoreChanges`` caveat that their
  updated/surviving rows are NOT re-delivered. The narrower
  ``.option("ignore_deletes", "true")`` (Delta's ``ignoreDeletes``)
  skips only the pure DELETE shapes (``delete``, ``delete_dv``,
  ``delete_eq``) — the common retention/GDPR cadence — while updates
  (``merge``, ``overwrite``) still fail loud: a consumer that can
  tolerate missing rows usually cannot tolerate silently-stale ones.
- The initial load requires a manifest with no outstanding MoR debt
  (DVs / equality deletes) — workers read raw files and must not
  resurrect deleted rows; run ``compact_snapshot`` (or ``optimize``)
  first. Tailing is unaffected by debt on PRIOR versions.

Partitioning: one Spark task per appended file (``partitions()``
returns file-grain splits), so a 10k-file initial load fans out
across the cluster; workers read parquet via pyarrow and emit Arrow
record batches (zero row-at-a-time Python). Offsets live in the
query checkpoint, and ``read_changes`` remains the batch/CDC twin for
consumers that need delete rows too.
"""

from __future__ import annotations

import json
import os
import re
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_VERSION_RE = re.compile(r"^v(\d+)\.json$")

#: operations whose (files - prev.files) delta is appended DATA rows
_APPEND_OPS = {"append", "publish_staged", "merge_mor"}
#: content-identical rewrites: never re-emit
_IDENTICAL_OPS = {"compact", "optimize", "consolidate_eq"}
#: row-removing / rewriting operations: NEVER silently tailable. The
#: MoR deletes (delete_dv / delete_eq) leave the manifest's FILE LIST
#: unchanged — only the DV/eq sidecars grow — so a files-unchanged
#: fallback would misread them as metadata-only no-ops and consumers
#: would silently retain deleted rows; they must be matched BY NAME.
_REMOVAL_OPS = {"delete", "delete_dv", "delete_eq", "merge", "overwrite"}
#: the CoW subset of _REMOVAL_OPS: these express row changes by
#: REWRITING data files, so ``cur_files == prev_files`` proves nothing
#: was removed (a predicate that matched zero rows commits an
#: audit-only manifest with the file list unchanged — table_log's
#: delete/merge no-match paths). Such no-op versions are safe to
#: stream past; only the MoR sidecar ops above are removal-by-name.
_COW_REWRITE_OPS = {"delete", "merge", "overwrite"}
#: the pure DELETE subset ``ignore_deletes`` may skip — updates
#: (merge/overwrite) stay fatal under that option
_DELETE_OPS = {"delete", "delete_dv", "delete_eq"}


def _log_dir(path: str) -> str:
    return os.path.join(path, "_log")


def _list_versions(path: str) -> list[int]:
    try:
        names = os.listdir(_log_dir(path))
    except FileNotFoundError:
        return []
    return sorted(
        int(m.group(1))
        for n in names
        if (m := _VERSION_RE.match(n))
    )


def _manifest(path: str, version: int) -> dict:
    with open(os.path.join(_log_dir(path), f"v{version}.json")) as fh:
        return json.load(fh)


class _FilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class SnapshotTableStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._path = options.get("path")
        if not self._path:
            raise ValueError("snapshot_table source requires .option('path', ...)")
        if not os.path.isdir(_log_dir(self._path)):
            raise ValueError(
                f"{self._path} is not a snapshot-log table (no _log dir); "
                "local-filesystem paths only — for object stores, tail "
                "the table with read_changes in foreachBatch instead"
            )
        self._ignore_changes = (
            str(options.get("ignore_changes", "false")).lower() == "true"
        )
        self._ignore_deletes = (
            str(options.get("ignore_deletes", "false")).lower() == "true"
        )
        self._starting = str(options.get("starting_version", "initial"))

    # -- offsets (driver-side) ------------------------------------------
    def initialOffset(self) -> dict:
        versions = _list_versions(self._path)
        if not versions:
            raise ValueError(f"no snapshots at {self._path}")
        if self._starting == "initial":
            return {"version": -1}  # next batch = full current snapshot
        if self._starting == "latest":
            return {"version": versions[-1]}
        return {"version": int(self._starting)}

    def latestOffset(self) -> dict:
        versions = _list_versions(self._path)
        return {"version": versions[-1] if versions else -1}

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint

    # -- planning (driver-side) -----------------------------------------
    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        if hi <= lo:
            return []
        rels: list[str] = []
        if lo == -1:
            # INITIAL LOAD: the full snapshot at hi. Workers read raw
            # files, so outstanding row-level delete debt would
            # resurrect deleted rows — refuse instead.
            m = _manifest(self._path, hi)
            if m.get("dvs") or m.get("eq_dvs"):
                raise ValueError(
                    "initial load requires a manifest with no "
                    "outstanding deletion vectors / equality deletes; "
                    "run compact_snapshot first (or start with "
                    ".option('starting_version', 'latest'))"
                )
            rels = list(m["files"])
        else:
            prev_files = set(_manifest(self._path, lo)["files"])
            for v in range(lo + 1, hi + 1):
                m = _manifest(self._path, v)
                cur_files = set(m["files"])
                op = m.get("operation", "append")
                if op in _APPEND_OPS:
                    rels.extend(sorted(cur_files - prev_files))
                elif op in _REMOVAL_OPS and not (
                    op in _COW_REWRITE_OPS and cur_files == prev_files
                ):
                    # checked BEFORE the files-unchanged fallback:
                    # delete_dv/delete_eq keep the file list identical
                    # while removing rows, and silently passing them
                    # would hand consumers deleted data. A CoW op whose
                    # file list is UNCHANGED is exempt — files are
                    # immutable, so an identical list means the
                    # predicate matched nothing (audit-only commit) and
                    # no rows were removed.
                    skippable = self._ignore_changes or (
                        self._ignore_deletes and op in _DELETE_OPS
                    )
                    if not skippable:
                        raise ValueError(
                            f"version {v} is a row-removing operation "
                            f"{op!r}; streaming reads require "
                            "append-only history — set .option("
                            "'ignore_deletes', 'true') to skip pure "
                            "delete versions, .option("
                            "'ignore_changes', 'true') to also skip "
                            "updates (changed rows will NOT be "
                            "delivered either way), or consume "
                            "read_changes in batch"
                        )
                elif op in _IDENTICAL_OPS or cur_files == prev_files:
                    pass  # rewrite or metadata-only: nothing new
                elif self._ignore_changes:
                    pass  # documented skip: updated rows not re-delivered
                else:
                    raise ValueError(
                        f"version {v} is a non-append operation "
                        f"{op!r}; streaming reads require append-only "
                        "history — set .option('ignore_changes', "
                        "'true') to skip such versions (their "
                        "changed rows will NOT be delivered), or "
                        "consume read_changes in batch"
                    )
                prev_files = cur_files
        return [
            _FilePartition(os.path.join(self._path, rel)) for rel in rels
        ]

    # -- execution (worker-side) ----------------------------------------
    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        table = pq.read_table(partition.file_path)
        # schema evolution: files written before a column was added
        # lack it — align by name, null-fill, then cast to the exact
        # arrow schema Spark expects for this source
        cols = []
        for field in target:
            if field.name in table.column_names:
                cols.append(table.column(field.name))
            else:
                cols.append(pa.nulls(table.num_rows, type=field.type))
        aligned = pa.Table.from_arrays(cols, schema=pa.schema(
            [(f.name, c.type) for f, c in zip(target, cols)]
        )).cast(target, safe=False)
        yield from aligned.to_batches(max_chunksize=65536)


class SnapshotTableDataSource(DataSource):
    """``spark.readStream.format("snapshot_table").option("path", t)``
    after ``spark.dataSource.register(SnapshotTableDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("snapshot_table source requires .option('path', ...)")
        versions = _list_versions(path)
        if not versions:
            raise ValueError(f"no snapshots at {path}")
        schema_json = _manifest(path, versions[-1]).get("schema")
        if not schema_json:
            raise ValueError(f"manifest at {path} records no schema")
        return StructType.fromJson(json.loads(schema_json))

    def streamReader(self, schema: StructType) -> SnapshotTableStreamReader:
        return SnapshotTableStreamReader(schema, dict(self.options))
