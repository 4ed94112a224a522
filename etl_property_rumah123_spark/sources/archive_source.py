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
default 64 MiB — one hostile member must not OOM a task),
``warc_type`` (WARC shards only: record-type filter, default
'response' — the CommonCrawl payload records).

WARC shards (``.warc`` / ``.warc.gz`` — the CommonCrawl container,
ISO 28500) are parsed by a from-spec reader: version line + CRLF
header block + Content-Length payload + CRLF CRLF separator, gzip
multi-member streams handled transparently (each record is its own
gzip member in CC shards; stdlib GzipFile concatenates). Member name
is WARC-Target-URI (falling back to WARC-Record-ID).

Stdlib ``zipfile``/``tarfile``/``gzip`` over local paths; on a
cluster the open() seam below is where an fsspec/Hadoop-FS stream
plugs in — partition planning and row semantics are unchanged.
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
_WARC_SUFFIXES = (".warc", ".warc.gz")


def _is_archive(name: str) -> bool:
    return name.endswith(_ZIP_SUFFIXES + _TAR_SUFFIXES + _WARC_SUFFIXES)


def iter_warc_records(
    stream, max_payload: int | None = None
) -> "Iterator[tuple[dict, bytes | None]]":
    """Parse WARC records (ISO 28500 / WARC 1.x) from a byte stream:
    yields (headers, payload). Grammar per spec: a ``WARC/1.x`` version
    line, CRLF-separated ``Name: value`` headers terminated by a blank
    line, exactly ``Content-Length`` payload bytes, then CRLF CRLF.
    Tolerates leading blank lines between records and stops at EOF.
    Raises ValueError on structural corruption (bad version line,
    truncated payload, unparseable length) — never desyncs silently.

    ``max_payload``: records whose declared Content-Length exceeds it
    are yielded as (headers, None) with the payload SKIPPED in bounded
    1 MiB chunks — the length is checked BEFORE any read, so a hostile
    8 GiB declaration never materializes (the anti-OOM guard must act
    pre-read, not post)."""
    while True:
        line = stream.readline()
        if not line:
            return
        if line in (b"\r\n", b"\n"):
            continue  # inter-record padding
        if not line.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            hline = stream.readline()
            if not hline:
                raise ValueError("truncated WARC header block")
            if hline in (b"\r\n", b"\n"):
                break
            if b":" not in hline:
                raise ValueError(f"bad WARC header line {hline[:40]!r}")
            name, value = hline.split(b":", 1)
            headers[name.decode("ascii").strip()] = (
                value.decode("utf-8", "replace").strip()
            )
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("missing/invalid WARC Content-Length") from exc
        if max_payload is not None and length > max_payload:
            remaining = length
            while remaining > 0:  # bounded discard, 1 MiB at a time
                chunk = stream.read(min(remaining, 1 << 20))
                if not chunk:
                    raise ValueError("truncated WARC payload")
                remaining -= len(chunk)
            yield headers, None
            continue
        payload = stream.read(length)
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        yield headers, payload


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
        self.warc_type = options.get("warc_type", "response")

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
        if path.endswith(_WARC_SUFFIXES):
            import gzip

            raw = (
                gzip.open(path, "rb")  # multi-member streams concatenate
                if path.endswith(".gz")
                else open(path, "rb")
            )
            with raw:
                for headers, payload in iter_warc_records(
                    raw, max_payload=self.max_bytes
                ):
                    if payload is None:  # oversized: skipped pre-read
                        continue
                    if (
                        self.warc_type
                        and headers.get("WARC-Type") != self.warc_type
                    ):
                        continue
                    member = headers.get(
                        "WARC-Target-URI", headers.get("WARC-Record-ID", "")
                    )
                    if self.suffix and not member.endswith(self.suffix):
                        continue
                    yield (name, member, len(payload), payload)
            return
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
