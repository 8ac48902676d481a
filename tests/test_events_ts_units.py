"""The events.parquet fixture has shipped ts as TIMESTAMP(NANOS) in
some driver rounds and TIMESTAMP(MICROS) in others. The batch loader
(tables._normalize_event_ts) and the stream source
(streaming.windows._events_stream) must both produce identical,
correct timestamps for EITHER physical unit — the round-4 fixture flip
silently compressed stream timestamps 1000x under the old hardcoded
nanos schema."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark_postgres_loader_spark.tables import load_table

_TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 5),
    datetime.datetime(2024, 1, 2, 12, 30, 0, 250000),
    datetime.datetime(2024, 1, 30, 23, 59, 59, 999999),
]


def _write_events(tmp_path, unit: str) -> str:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_TS, pa.timestamp(unit)),
            "user_id": pa.array([10, 11, 12], pa.int64()),
            "event_type": pa.array(["click", "view", "purchase"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    d = tmp_path / f"events_{unit}"
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_batch_load_normalizes_either_unit(spark, tmp_path, unit):
    sf_dir = _write_events(tmp_path, unit)
    got = sorted(r.ts for r in load_table(spark, sf_dir, "events").collect())
    assert got == _TS


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_stream_source_matches_batch_for_either_unit(spark, tmp_path, unit):
    from pyspark_postgres_loader_spark.streaming.windows import (
        _events_stream,
        _run_to_memory,
    )

    sf_dir = _write_events(tmp_path, unit)
    out = _run_to_memory(
        _events_stream(spark, sf_dir).select("event_id", "ts"), "append"
    )
    got = sorted(r.ts for r in out.collect())
    assert got == _TS
