"""Contract test for the events.ts physical-format normalization.

The driver's testdata generator has shipped ``events.ts`` in three
physical parquet formats across rounds — TIMESTAMP(NANOS) (surfaces as
bigint under ``nanosAsLong``), timestamp[us] with no zone (read as
TIMESTAMP_NTZ), and zoned timestamp[us] (plain TIMESTAMP). Round 4 lost
six operators to one such shift; both readers now normalize at the
edge. This test writes the SAME rows in all three formats and asserts
both the batch catalog (``sources/tables.py``) and the streaming probe
(``streaming/events.py``) yield one canonical TIMESTAMP with identical
epoch values — so the next driver format shift is a red test here, not
a red round.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

ROWS = [
    (1, 1_700_000_000_000_000, 7, "view", 1.5, "{}"),
    (2, 1_700_000_060_000_000, 8, "purchase", 2.5, "{}"),
]


def _write(tmp_path, fmt: str) -> str:
    ts_us = [r[1] for r in ROWS]
    if fmt == "ns":
        ts = pa.array([t * 1000 for t in ts_us], pa.timestamp("ns"))
    elif fmt == "ntz":
        ts = pa.array(ts_us, pa.timestamp("us"))
    else:  # zoned -> plain TIMESTAMP
        ts = pa.array(ts_us, pa.timestamp("us", tz="UTC"))
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": ts,
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS]),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS]),
        }
    )
    sf_dir = str(tmp_path / fmt)
    os.makedirs(sf_dir)
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


@pytest.mark.parametrize("fmt", ["ns", "ntz", "zoned"])
def test_batch_reader_normalizes_every_physical_format(spark, tmp_path, fmt):
    from pyspark.sql import functions as F

    from sales_data_etl_pipeline_spark.sources.tables import load_testdata

    sf_dir = _write(tmp_path, fmt)
    df = load_testdata(spark, sf_dir, ("events",))["events"]
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {
        (r.event_id, r.us)
        for r in df.select(
            "event_id", F.unix_micros("ts").alias("us")
        ).collect()
    }
    assert got == {(r[0], r[1]) for r in ROWS}


@pytest.mark.parametrize("fmt", ["ns", "ntz", "zoned"])
def test_stream_reader_normalizes_every_physical_format(spark, tmp_path, fmt):
    from pyspark.sql import functions as F

    from sales_data_etl_pipeline_spark.streaming import events as streaming

    sf_dir = _write(tmp_path, fmt)
    stream = streaming.stream_events(spark, sf_dir)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    sink = f"mem_ts_{fmt}"
    q = (
        stream.select("event_id", F.unix_micros("ts").alias("us"))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.table(sink).collect()}
    assert got == {(r[0], r[1]) for r in ROWS}
