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
