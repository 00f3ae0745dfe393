"""Fixture-encoding drift armor.

The driver regenerates /root/testdata between rounds and the events.ts
on-disk encoding has already drifted once (int64 nanos → timestamp[us]),
silently breaking the streaming source and q106. These tests write the
SAME rows under both encodings and assert the batch loader, the
streaming source, and q106 produce identical results on each — so the
next regeneration cannot break them silently again.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ooh_etl_spark.queries import QUERIES
from ooh_etl_spark.tables import load_table

_ROWS = 48


def _write_events(dirpath, unit: str) -> str:
    ts = [
        datetime.datetime(2025, 1, 1) + datetime.timedelta(minutes=37 * i)
        for i in range(_ROWS)
    ]
    table = pa.table(
        {
            "event_id": pa.array(range(_ROWS), pa.int64()),
            "ts": pa.array(ts, pa.timestamp(unit)),
            "user_id": pa.array([i % 5 for i in range(_ROWS)], pa.int64()),
            "event_type": pa.array(
                ["view", "click", "signup", "purchase"][i % 4] for i in range(_ROWS)
            ),
            "value": pa.array([round(1.5 * i, 2) for i in range(_ROWS)]),
            "props": pa.array(["{}"] * _ROWS),
        }
    )
    pq.write_table(table, str(dirpath / "events.parquet"))
    return str(dirpath)


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    nanos = _write_events(tmp_path_factory.mktemp("ev_nanos"), "ns")
    micros = _write_events(tmp_path_factory.mktemp("ev_micros"), "us")
    return nanos, micros


def _formatted_batch_ts(spark, sf_dir):
    from pyspark.sql import functions as F

    return sorted(
        r[0]
        for r in load_table(spark, sf_dir, "events")
        .select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .collect()
    )


def test_batch_loader_identical_under_both_encodings(spark, encoded_dirs):
    nanos, micros = encoded_dirs
    assert _formatted_batch_ts(spark, nanos) == _formatted_batch_ts(spark, micros)


def test_stream_times_equal_batch_times_under_both_encodings(spark, encoded_dirs):
    from pyspark.sql import functions as F

    from ooh_etl_spark.queries.streaming import _event_stream, _run_to_completion

    for sf_dir in encoded_dirs:
        streamed = _run_to_completion(
            _event_stream(spark, sf_dir).select(
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t")
            ),
            spark,
        )
        assert sorted(r["t"] for r in streamed.collect()) == _formatted_batch_ts(
            spark, sf_dir
        )


def test_q106_identical_under_both_encodings(spark, encoded_dirs):
    nanos, micros = encoded_dirs
    fn = QUERIES["q106_ohlc_bars"].fn
    out_n = [r.asDict() for r in fn(spark, nanos).collect()]
    out_u = [r.asDict() for r in fn(spark, micros).collect()]
    assert out_n == out_u
    assert len(out_n) > 0
