"""The events fixture's `ts` physical type has drifted between driver
testdata generations: parquet TIMESTAMP(NANOS) (round 1) and
TIMESTAMP(MICROS) (round 2). Both readers must accept either and produce
the same session-timestamp values — pinned here with synthetic fixtures
of both types so the next regeneration cannot silently break the events
query family (sessionize, asof_join, windows, streaming) again.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tripgogo_vector_search_spark.sources.tables import load_table

TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0, 123456),
    datetime.datetime(2024, 1, 2, 13, 45, 59, 999999),
    datetime.datetime(2024, 6, 30, 23, 59, 59, 1),
]


def _write_events(dirpath: str, unit: str) -> str:
    table = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array(TS, pa.timestamp(unit)),
        "user_id": pa.array([10, 11, 12], pa.int64()),
        "event_type": pa.array(["view", "click", "purchase"]),
        "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
        "props": pa.array(["{}", "{}", "{}"]),
    })
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(table, os.path.join(dirpath, "events.parquet"))
    return dirpath


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_table_normalizes_either_ts_type(spark, tmp_path, unit):
    sf_dir = _write_events(str(tmp_path / unit), unit)
    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.typeName() in ("timestamp",)
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    assert got == TS  # microsecond-exact, regardless of physical type


def test_both_physical_types_agree(spark, tmp_path):
    d_us = _write_events(str(tmp_path / "us"), "us")
    d_ns = _write_events(str(tmp_path / "ns"), "ns")
    us_rows = load_table(spark, d_us, "events").orderBy("event_id").collect()
    ns_rows = load_table(spark, d_ns, "events").orderBy("event_id").collect()
    assert [tuple(r) for r in us_rows] == [tuple(r) for r in ns_rows]
