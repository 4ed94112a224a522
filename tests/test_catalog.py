"""catalog.table must normalize every physical encoding of events.ts
to session-zoned TimestampType — the testdata generator has shipped
TIMESTAMP(NANOS) (round 1) and timezone-less TIMESTAMP(MICROS)
(round 2), and downstream plans call TIMESTAMP-only functions like
``unix_micros``.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_property_rumah123_spark.sources.catalog import table

ROWS = {
    "event_id": [1, 2],
    "user_id": [10, 11],
    "event_type": ["view", "click"],
    "value": [1.5, 2.5],
    "props": ["{}", "{}"],
}
T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
T1 = datetime.datetime(2024, 3, 1, 12, 0, 1)


def write_events(tmp_path, ts_type):
    tbl = pa.table({**ROWS, "ts": pa.array([T0, T1], type=ts_type)})
    path = tmp_path / "events.parquet"
    pq.write_table(tbl, path)
    return str(tmp_path)


def assert_normalized(spark, sf_dir):
    df = table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # TIMESTAMP-only functions must resolve, and wall values must be
    # preserved (session zone is UTC)
    got = (
        df.select(F.unix_micros("ts").alias("us"))
        .orderBy("us")
        .collect()
    )
    base = int(T0.replace(tzinfo=datetime.timezone.utc).timestamp()) * 1_000_000
    assert [r["us"] for r in got] == [base, base + 1_000_000]


def test_events_ts_micros_ntz(spark, tmp_path):
    sf = write_events(tmp_path, pa.timestamp("us"))
    assert_normalized(spark, sf)


def test_events_ts_nanos(spark, tmp_path):
    sf = write_events(tmp_path, pa.timestamp("ns"))
    assert_normalized(spark, sf)


def test_events_ts_micros_utc(spark, tmp_path):
    sf = write_events(tmp_path, pa.timestamp("us", tz="UTC"))
    assert_normalized(spark, sf)


def test_read_stage_csv_explicit_schema_roundtrip(spark, tmp_path):
    """S7 literal form: writers.save_csv -> read_stage_csv with the
    declared schema. Types come from the contract, not inference, and
    the array column survives as its documented JSON stringification."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_property_rumah123_spark.sinks import writers
    from etl_property_rumah123_spark.sources.catalog import read_stage_csv

    df = spark.createDataFrame(
        [("rumah123.com/a", 450, ["Garasi", "KPR"]), ("rumah123.com/b", None, [])],
        "link string, price_rp int, additional_features array<string>",
    )
    path = writers.save_csv(df, "listings", str(tmp_path), "20260813")

    schema = T.StructType(
        [
            T.StructField("link", T.StringType()),
            T.StructField("price_rp", T.IntegerType()),
            T.StructField("additional_features", T.StringType()),
        ]
    )
    back = read_stage_csv(spark, path, schema)
    assert [f.name for f in back.schema.fields] == [
        "link", "price_rp", "additional_features", "_corrupt_record",
    ]
    assert back.schema["price_rp"].dataType == T.IntegerType()  # contract, not inference
    rows = {r["link"]: r for r in back.collect()}
    assert rows["rumah123.com/a"]["price_rp"] == 450
    assert rows["rumah123.com/a"]["additional_features"] == '["Garasi","KPR"]'
    assert all(r["_corrupt_record"] is None for r in rows.values())


def test_read_stage_csv_quarantines_corrupt_rows(spark, tmp_path):
    """Malformed lines land in _corrupt_record as raw text; well-formed
    rows parse normally — corrupt rows are data, not job failures."""
    from pyspark.sql import types as T

    from etl_property_rumah123_spark.sources.catalog import read_stage_csv

    p = tmp_path / "stage.csv"
    p.mkdir()
    (p / "part-00000.csv").write_text(
        "link,price_rp\nok-row,100\nbad-row,not_an_int\n"
    )
    schema = T.StructType(
        [
            T.StructField("link", T.StringType()),
            T.StructField("price_rp", T.IntegerType()),
        ]
    )
    back = read_stage_csv(spark, str(p), schema).cache()
    try:
        good = back.filter("_corrupt_record IS NULL").collect()
        bad = back.filter("_corrupt_record IS NOT NULL").collect()
        assert [(r["link"], r["price_rp"]) for r in good] == [("ok-row", 100)]
        assert len(bad) == 1 and bad[0]["_corrupt_record"] == "bad-row,not_an_int"
        assert bad[0]["price_rp"] is None
    finally:
        back.unpersist()


def test_archive_source_reads_zip_and_tar_shards(spark, tmp_path):
    """The doc_archive DataSource: a directory of zip + tar(.gz)
    shards becomes (archive, member, size, payload) rows, one
    partition per shard, payload bytes intact (pinned by decoding a
    real BMP member), suffix filter and oversized-member guard
    applied."""
    import tarfile
    import zipfile

    import numpy as np

    from etl_property_rumah123_spark.functions import codecs
    from etl_property_rumah123_spark.sources.archive_source import (
        ArchiveDataSource,
    )

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    bmp = codecs.encode_bmp24(px)
    with zipfile.ZipFile(shard_dir / "shard0.zip", "w") as zf:
        zf.writestr("docs/a.txt", b"alpha")
        zf.writestr("img/pic.bmp", bmp)
        zf.writestr("big.bin", b"x" * 2048)  # above max_bytes below
    with tarfile.open(shard_dir / "shard1.tar.gz", "w:gz") as tf:
        import io

        for member, payload in [("docs/b.txt", b"beta"), ("docs/c.txt", b"gamma")]:
            info = tarfile.TarInfo(member)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))

    spark.dataSource.register(ArchiveDataSource)
    df = (
        spark.read.format("doc_archive")
        .option("path", str(shard_dir))
        .option("max_bytes", "1024")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one per shard
    rows = {r["member"]: r for r in df.collect()}
    assert set(rows) == {"docs/a.txt", "img/pic.bmp", "docs/b.txt", "docs/c.txt"}
    assert bytes(rows["docs/a.txt"]["payload"]) == b"alpha"
    assert rows["docs/b.txt"]["archive"] == "shard1.tar.gz"
    assert rows["img/pic.bmp"]["size"] == len(bmp)
    # payload bytes are intact end-to-end: the BMP member decodes
    out = codecs.decode_bmp24(bytes(rows["img/pic.bmp"]["payload"]))
    assert np.array_equal(out, px)

    # suffix filter
    only_txt = (
        spark.read.format("doc_archive")
        .option("path", str(shard_dir))
        .option("suffix", ".txt")
        .load()
    )
    assert {r["member"] for r in only_txt.collect()} == {
        "docs/a.txt", "docs/b.txt", "docs/c.txt"
    }


def test_archive_source_reads_warc_shards(spark, tmp_path):
    """WARC shards (the CommonCrawl container) through doc_archive:
    records parsed per ISO 28500 (version line, CRLF headers,
    Content-Length payload), response-type filter by default, gzip
    multi-member shards handled, payload bytes exact; structural
    corruption raises rather than desyncing."""
    import gzip

    import pytest

    from etl_property_rumah123_spark.sources.archive_source import (
        ArchiveDataSource,
        iter_warc_records,
    )

    def record(wtype, uri, payload):
        head = (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {wtype}\r\n".encode()
            + (f"WARC-Target-URI: {uri}\r\n".encode() if uri else b"")
            + b"WARC-Record-ID: <urn:uuid:x>\r\n"
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
        )
        return head + payload + b"\r\n\r\n"

    body1 = b"HTTP/1.1 200 OK\r\n\r\n<html>alpha</html>"
    body2 = b"HTTP/1.1 200 OK\r\n\r\n<html>beta</html>"
    shard = (
        record("warcinfo", None, b"software: test")
        + record("response", "http://a.example/x", body1)
        + record("request", "http://a.example/x", b"GET /x")
        + record("response", "http://b.example/y", body2)
    )
    shard_dir = tmp_path / "warcs"
    shard_dir.mkdir()
    (shard_dir / "cc0.warc").write_bytes(shard)
    # gzip shard with each record its own member (the CC layout)
    with open(shard_dir / "cc1.warc.gz", "wb") as fh:
        for rec in [
            record("response", "http://c.example/z", b"gamma-payload")
        ]:
            fh.write(gzip.compress(rec))

    spark.dataSource.register(ArchiveDataSource)
    df = (
        spark.read.format("doc_archive")
        .option("path", str(shard_dir))
        .load()
    )
    assert df.rdd.getNumPartitions() == 2
    rows = {r["member"]: bytes(r["payload"]) for r in df.collect()}
    # only response records survive the default filter
    assert rows == {
        "http://a.example/x": body1,
        "http://b.example/y": body2,
        "http://c.example/z": b"gamma-payload",
    }
    # warc_type filter override
    reqs = (
        spark.read.format("doc_archive")
        .option("path", str(shard_dir))
        .option("warc_type", "request")
        .load()
        .collect()
    )
    assert [r["member"] for r in reqs] == ["http://a.example/x"]
    # corruption is loud, never a silent desync
    import io

    with pytest.raises(ValueError, match="version line"):
        list(iter_warc_records(io.BytesIO(b"NOT-WARC\r\n")))
    truncated = record("response", "u", b"abcdef")[:-10]
    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc_records(io.BytesIO(truncated)))


def test_archive_source_non_file_scheme_via_fs_seam():
    """The filesystem seam behind doc_archive: a ``memory://`` shard
    directory (the in-repo reference implementation of the fsspec
    subset protocol) lists, partitions, and reads exactly like local
    disk — partition paths stay fully-qualified URLs so executor-side
    ``read()`` re-resolves the right filesystem — and an unknown
    scheme without fsspec fails LOUDLY instead of being misread as a
    local path. Reader is driven directly (not through Spark): the
    memory store is process-local by documented design; real remote
    schemes re-instantiate from the URL on each worker."""
    import gzip
    import io
    import tarfile
    import zipfile

    import pytest

    from etl_property_rumah123_spark.sources.archive_source import (
        ArchiveReader,
        LocalFS,
        MemoryFS,
        resolve_fs,
    )

    MemoryFS.clear()
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("docs/a.txt", b"alpha")
    MemoryFS.put("bucket/shards/s0.zip", zbuf.getvalue())
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as tf:
        info = tarfile.TarInfo("docs/b.txt")
        info.size = 4
        tf.addfile(info, io.BytesIO(b"beta"))
    MemoryFS.put("bucket/shards/s1.tar.gz", tbuf.getvalue())
    warc = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://c.example/z\r\n"
        b"Content-Length: 5\r\n\r\n"
        b"gamma\r\n\r\n"
    )
    MemoryFS.put("bucket/shards/s2.warc.gz", gzip.compress(warc))

    reader = ArchiveReader({"path": "memory://bucket/shards"})
    parts = reader.partitions()
    assert [p.path for p in parts] == [
        "memory://bucket/shards/s0.zip",
        "memory://bucket/shards/s1.tar.gz",
        "memory://bucket/shards/s2.warc.gz",
    ]
    rows = [row for p in parts for row in reader.read(p)]
    assert {(r[0], r[1], bytes(r[3])) for r in rows} == {
        ("s0.zip", "docs/a.txt", b"alpha"),
        ("s1.tar.gz", "docs/b.txt", b"beta"),
        ("s2.warc.gz", "http://c.example/z", b"gamma"),
    }

    # single-shard URL path (no directory listing)
    single = ArchiveReader({"path": "memory://bucket/shards/s0.zip"})
    (p0,) = single.partitions()
    assert [r[1] for r in single.read(p0)] == ["docs/a.txt"]

    # nested keys are NOT listed as immediate children (fs semantics
    # parity with LocalFS/fsspec)
    MemoryFS.put("bucket/shards/nested/deep.zip", zbuf.getvalue())
    deep_reader = ArchiveReader({"path": "memory://bucket/shards"})
    assert [p.path for p in deep_reader.partitions()] == [
        "memory://bucket/shards/s0.zip",
        "memory://bucket/shards/s1.tar.gz",
        "memory://bucket/shards/s2.warc.gz",
    ]

    # file:// maps onto the stdlib filesystem
    fs, p = resolve_fs("file:///tmp/x.zip")
    assert isinstance(fs, LocalFS) and p == "/tmp/x.zip"
    # unknown scheme without fsspec: loud, names the remedy (when
    # fsspec IS installed the guard legitimately defers to it)
    try:
        import fsspec  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="fsspec"):
            resolve_fs("s3://bucket/shards")
    MemoryFS.clear()


def test_archive_stream_reader_ingests_new_shards_exactly_once(spark, tmp_path):
    """The doc_archive STREAMING path (partition-based
    DataSourceStreamReader): offsets advance over the sorted shard
    list, each microbatch distributes only the NEW shards (one
    partition per shard, read executor-side), a restart from the
    checkpoint picks up only shards that landed after the first run,
    and payload bytes survive intact."""
    import zipfile

    from etl_property_rumah123_spark.sources.archive_source import (
        ArchiveDataSource,
        ArchiveStreamReader,
    )

    shard_dir = tmp_path / "stream_shards"
    shard_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")

    def shard(n, members):
        with zipfile.ZipFile(shard_dir / f"shard{n:03d}.zip", "w") as zf:
            for name, payload in members:
                zf.writestr(name, payload)

    shard(0, [("a.txt", b"alpha"), ("b.txt", b"beta")])
    shard(1, [("c.txt", b"gamma")])

    spark.dataSource.register(ArchiveDataSource)

    def run():
        q = (
            spark.readStream.format("doc_archive")
            .option("path", str(shard_dir))
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = {
        (r["archive"], r["member"], bytes(r["payload"]))
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        ("shard000.zip", "a.txt", b"alpha"),
        ("shard000.zip", "b.txt", b"beta"),
        ("shard001.zip", "c.txt", b"gamma"),
    }

    # two more shards land (sorted-name contract); restart reads ONLY them
    shard(2, [("d.txt", b"delta")])
    shard(3, [("e.txt", b"epsilon")])
    run()
    spark.catalog.refreshByPath(out_dir)
    got2 = {
        (r["archive"], r["member"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert len(got2) == 5  # no duplicates of shard 0/1 members
    assert ("shard003.zip", "e.txt") in got2

    # offset unit semantics: shrinking the dir below a committed
    # offset is a loud contract error, not a silent drop
    rdr = ArchiveStreamReader({"path": str(shard_dir)})
    assert rdr.initialOffset() == {"count": 0}
    assert rdr.latestOffset() == {"count": 4}
    parts = rdr.partitions({"count": 1}, {"count": 3})
    assert [p.path.split("/")[-1] for p in parts] == [
        "shard001.zip", "shard002.zip"
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="shrank"):
        rdr.partitions({"count": 0}, {"count": 9})
