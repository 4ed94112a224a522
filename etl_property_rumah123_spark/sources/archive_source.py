"""Document-archive Python DataSource: ZIP/TAR shards as Spark rows.

The ingestion shape a 100 TB multimodal/text corpus actually arrives
in: many archive SHARDS (zip/tar of documents, images, audio — the
same container idea as WARC or webdataset tar shards), each holding
thousands of members. ``spark.read.format("doc_archive")`` turns a
directory of shards into (archive, member, size, payload) rows:

- **one InputPartition per archive file** — shard count is the unit
  of parallelism (a 100 TB corpus is O(100k) shards, far above any
  cluster's core count, so per-shard partitions saturate executors
  while keeping each task a single sequential container read — the
  access pattern archives require anyway: central-directory seek for
  zip, linear stream for tar);
- **members stream lazily** inside the task (``yield`` per member —
  nothing buffers a whole shard);
- payloads are opaque ``binary`` + typed metadata, exactly the
  multimodal column convention (`operators/multimodal.py` decode
  stages consume them as-is).

Options: ``path`` (a directory or a single archive), ``suffix``
(member filter, e.g. '.bmp'), ``max_bytes`` (skip oversized members,
default 64 MiB — one hostile member must not OOM a task).

Stdlib ``zipfile``/``tarfile`` over local paths; on a cluster the
open() seam below is where an fsspec/Hadoop-FS stream plugs in —
partition planning and row semantics are unchanged.
"""

from __future__ import annotations

import os
import tarfile
import zipfile
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

ARCHIVE_SCHEMA = (
    "archive string, member string, size long, payload binary"
)

_ZIP_SUFFIXES = (".zip",)
_TAR_SUFFIXES = (".tar", ".tar.gz", ".tgz")


def _is_archive(name: str) -> bool:
    return name.endswith(_ZIP_SUFFIXES + _TAR_SUFFIXES)


@dataclass
class ArchiveShard(InputPartition):
    path: str


class ArchiveReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("doc_archive requires a 'path' option")
        self.suffix = options.get("suffix", "")
        self.max_bytes = int(options.get("max_bytes", str(64 * 1024 * 1024)))

    def partitions(self) -> Sequence[ArchiveShard]:
        if os.path.isdir(self.path):
            shards = sorted(
                os.path.join(self.path, n)
                for n in os.listdir(self.path)
                if _is_archive(n)
            )
        elif _is_archive(self.path):
            shards = [self.path]
        else:
            raise ValueError(
                f"{self.path!r} is neither a directory nor a zip/tar archive"
            )
        if not shards:
            raise ValueError(f"no archive shards under {self.path!r}")
        return [ArchiveShard(p) for p in shards]

    def read(self, partition: ArchiveShard) -> Iterator[tuple]:
        path = partition.path
        name = os.path.basename(path)
        if path.endswith(_ZIP_SUFFIXES):
            with zipfile.ZipFile(path) as zf:
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    if self.suffix and not info.filename.endswith(self.suffix):
                        continue
                    if info.file_size > self.max_bytes:
                        continue
                    yield (name, info.filename, info.file_size,
                           zf.read(info))
        else:
            # r:* transparently handles plain and gzipped tars
            with tarfile.open(path, "r:*") as tf:
                for info in tf:
                    if not info.isfile():
                        continue
                    if self.suffix and not info.name.endswith(self.suffix):
                        continue
                    if info.size > self.max_bytes:
                        continue
                    fh = tf.extractfile(info)
                    if fh is None:
                        continue
                    yield (name, info.name, info.size, fh.read())


class ArchiveDataSource(DataSource):
    """``spark.read.format("doc_archive")`` after
    ``spark.dataSource.register(ArchiveDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "doc_archive"

    def schema(self) -> str:
        return ARCHIVE_SCHEMA

    def reader(self, schema) -> ArchiveReader:
        return ArchiveReader(dict(self.options))
