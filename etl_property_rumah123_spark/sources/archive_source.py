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

Filesystem access goes through a pluggable seam (``resolve_fs``): a
bare path or ``file://`` uses the stdlib; any other ``scheme://`` URL
resolves through **fsspec** when importable (``s3://``, ``hdfs://``,
``gs://`` — the actual CommonCrawl ingestion shape: workers open the
shard as a seekable remote stream, so the zip central-directory seek
and the linear tar/WARC reads work unchanged off-box), and fails
LOUDLY when fsspec is absent rather than mis-reading the URL as a
local path. ``memory://`` ships in-repo as a zero-dependency
reference implementation of the protocol for tests (driver-process
only — its store does not travel to executors; real remote schemes
re-instantiate from the URL on each worker, which is why the seam
resolves INSIDE ``read()``, not at plan time).
"""

from __future__ import annotations

import os
import tarfile
import zipfile
from collections.abc import Callable, Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

ARCHIVE_SCHEMA = (
    "archive string, member string, size long, payload binary"
)

_ZIP_SUFFIXES = (".zip",)
_TAR_SUFFIXES = (".tar", ".tar.gz", ".tgz")
_WARC_SUFFIXES = (".warc", ".warc.gz")


def _is_archive(name: str) -> bool:
    return name.endswith(_ZIP_SUFFIXES + _TAR_SUFFIXES + _WARC_SUFFIXES)


# --------------------------------------------------------------------------
# Filesystem seam: the three operations shard ingestion needs. Protocol
# (duck-typed, matches the fsspec AbstractFileSystem subset we use):
#   isdir(path) -> bool
#   ls(path)    -> full child paths (any order; caller sorts)
#   open(path)  -> binary file-like; seekable() True enables zip/tar
#                  random access, False falls back to streaming tar
# --------------------------------------------------------------------------


class LocalFS:
    """Stdlib filesystem — bare paths and ``file://`` URLs."""

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def ls(self, path: str) -> list[str]:
        return [os.path.join(path, n) for n in os.listdir(path)]

    def open(self, path: str):
        return open(path, "rb")


class MemoryFS:
    """In-memory reference filesystem for the ``memory://`` scheme.

    A process-local ``{path: bytes}`` store (module singleton) — the
    zero-dependency stand-in for fsspec's memory filesystem, used to
    test the non-file:// code path. Driver-process only by design:
    executor workers re-import this module with an empty store, so
    Spark-side reads of ``memory://`` shards are a test-harness
    affair (direct ``ArchiveReader`` calls), never a production path.
    """

    _store: dict[str, bytes] = {}

    @classmethod
    def put(cls, path: str, data: bytes) -> None:
        cls._store[path.rstrip("/")] = data

    @classmethod
    def clear(cls) -> None:
        cls._store.clear()

    def isdir(self, path: str) -> bool:
        prefix = path.rstrip("/") + "/"
        return any(k.startswith(prefix) for k in self._store)

    def ls(self, path: str) -> list[str]:
        # IMMEDIATE children only, like LocalFS/fsspec — returning all
        # descendants would make partitions() treat nested archives as
        # siblings, a semantics no production filesystem reproduces
        prefix = path.rstrip("/") + "/"
        out = set()
        for k in self._store:
            if not k.startswith(prefix):
                continue
            rest = k[len(prefix):]
            out.add(prefix + rest.split("/", 1)[0])
        return sorted(out)

    def open(self, path: str):
        import io

        key = path.rstrip("/")
        if key not in self._store:
            raise FileNotFoundError(path)
        return io.BytesIO(self._store[key])


_FS_REGISTRY: dict[str, Callable[[], object]] = {
    "file": LocalFS,
    "memory": MemoryFS,
}


def register_filesystem(scheme: str, factory: Callable[[], object]) -> None:
    """Plug a filesystem implementation in for ``scheme://`` paths
    (driver AND executors must both see the registration — register at
    module import, not ad hoc, for anything used inside Spark jobs)."""
    _FS_REGISTRY[scheme] = factory


def resolve_fs(path: str) -> tuple[object, str]:
    """Map a path/URL to ``(filesystem, fs-native path)``.

    Bare paths and ``file://`` → stdlib; registered schemes → their
    factory; anything else → fsspec (``url_to_fs`` keeps credentials /
    region resolution in fsspec's hands), with a loud ImportError when
    fsspec is missing — silently treating ``s3://…`` as a local path
    is the failure mode this seam exists to prevent.
    """
    if "://" not in path:
        return LocalFS(), path
    scheme, rest = path.split("://", 1)
    if scheme == "file":
        return LocalFS(), rest if rest.startswith("/") else "/" + rest
    if scheme in _FS_REGISTRY:
        return _FS_REGISTRY[scheme](), rest.rstrip("/")
    try:
        import fsspec
    except ImportError as exc:
        raise ImportError(
            f"reading {scheme}://… shards requires fsspec (with the "
            f"{scheme} protocol package) on driver and executors, or a "
            "register_filesystem() implementation for the scheme"
        ) from exc
    fs, fs_path = fsspec.core.url_to_fs(path)
    return _FsspecFS(fs), fs_path


class _FsspecFS:
    """Adapter pinning the subset protocol onto an fsspec filesystem
    (``ls`` forced to detail=False; listed children re-qualified with
    the protocol so partition paths stay self-describing URLs)."""

    def __init__(self, fs) -> None:
        self._fs = fs

    def isdir(self, path: str) -> bool:
        return self._fs.isdir(path)

    def ls(self, path: str) -> list[str]:
        children = self._fs.ls(path, detail=False)
        unstrip = getattr(self._fs, "unstrip_protocol", None)
        return [
            unstrip(c) if unstrip and "://" not in c else c
            for c in children
        ]

    def open(self, path: str):
        return self._fs.open(path, "rb")


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
        fs, fs_path = resolve_fs(self.path)
        scheme = (
            self.path.split("://", 1)[0] if "://" in self.path else None
        )
        if fs.isdir(fs_path):
            shards = sorted(
                c if ("://" in c or scheme is None) else f"{scheme}://{c}"
                for c in fs.ls(fs_path)
                if _is_archive(c)
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
        # resolved HERE, on the executor: remote filesystems
        # re-instantiate from the URL per task (credentials/clients are
        # worker-local), nothing filesystem-shaped rides the pickle
        fs, fs_path = resolve_fs(path)
        name = os.path.basename(fs_path.rstrip("/"))
        if path.endswith(_WARC_SUFFIXES):
            import gzip

            stream = fs.open(fs_path)
            raw = (
                # multi-member streams concatenate
                gzip.GzipFile(fileobj=stream)
                if path.endswith(".gz")
                else stream
            )
            with stream:
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
            # zip needs random access (central directory at EOF);
            # fsspec remote files are seekable, so this works off-box
            with fs.open(fs_path) as stream, zipfile.ZipFile(stream) as zf:
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
            # r:* (random access) when the stream allows it, else the
            # pure-streaming r|* mode — tar needs only a forward pass
            with fs.open(fs_path) as stream:
                mode = "r:*" if stream.seekable() else "r|*"
                with tarfile.open(fileobj=stream, mode=mode) as tf:
                    for info in tf:
                        if not info.isfile():
                            continue
                        if self.suffix and not info.name.endswith(
                            self.suffix
                        ):
                            continue
                        if info.size > self.max_bytes:
                            continue
                        fh = tf.extractfile(info)
                        if fh is None:
                            continue
                        yield (name, info.name, info.size, fh.read())


class ArchiveStreamReader(DataSourceStreamReader):
    """Streaming shard ingestion — the CommonCrawl shape: new archive
    shards land in a directory and each microbatch distributes the
    NEW shards to executors, ONE InputPartition per shard (this is
    the partition-based ``DataSourceStreamReader``: offsets are
    planned on the driver, payload bytes are only ever read
    executor-side — unlike the listing source's driver-side
    SimpleDataSourceStreamReader, which is sized for a rate-limited
    page frontier, shard reads are the heavy path and must scale out).

    Offset model: ``{"count": N}`` over the LEXICOGRAPHICALLY SORTED
    shard list — the contract is that shards arrive with sorted
    names (crawl dumps timestamp their segments) and are immutable
    once landed; a shard inserted behind the frontier is not seen,
    and shrinking the directory breaks replay (both loud operator
    errors, not silent drops, via the slice-length check in
    ``partitions``)."""

    def __init__(self, options: dict) -> None:
        self._batch = ArchiveReader(options)

    def _shards(self) -> list[str]:
        path = self._batch.path
        fs, fs_path = resolve_fs(path)
        scheme = path.split("://", 1)[0] if "://" in path else None
        if fs.isdir(fs_path):
            return sorted(
                c if ("://" in c or scheme is None) else f"{scheme}://{c}"
                for c in fs.ls(fs_path)
                if _is_archive(c)
            )
        if _is_archive(path):
            return [path]
        return []

    def initialOffset(self) -> dict:
        return {"count": 0}

    def latestOffset(self) -> dict:
        return {"count": len(self._shards())}

    def partitions(self, start: dict, end: dict):
        shards = self._shards()
        lo, hi = int(start["count"]), int(end["count"])
        if hi > len(shards):
            raise ValueError(
                f"archive dir shrank below committed offset {hi} "
                f"(have {len(shards)} shards) — shards are immutable "
                "by contract"
            )
        return [ArchiveShard(p) for p in shards[lo:hi]]

    def read(self, partition: ArchiveShard) -> Iterator[tuple]:
        # executor-side: same member extraction as the batch reader
        return self._batch.read(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint


class ArchiveDataSource(DataSource):
    """``spark.read.format("doc_archive")`` (batch: one partition per
    shard) or ``spark.readStream.format("doc_archive")`` (streaming:
    new sorted-name shards per microbatch, executor-distributed)
    after ``spark.dataSource.register(ArchiveDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "doc_archive"

    def schema(self) -> str:
        return ARCHIVE_SCHEMA

    def reader(self, schema) -> ArchiveReader:
        return ArchiveReader(dict(self.options))

    def streamReader(self, schema) -> ArchiveStreamReader:
        return ArchiveStreamReader(dict(self.options))
