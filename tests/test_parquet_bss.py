"""Parquet BYTE_STREAM_SPLIT walk: pyarrow cross-validation across
codecs, nullable def-level weave, inverse-gather unit behavior, and
typed verdicts."""

from __future__ import annotations

import struct

import pytest

from pyspark_postgres_loader_spark.operators.parquetbss import (
    _BS_GROUPS,
    _bs_bytes,
    _bs_d,
    _bs_f,
    _bs_payload,
    byte_stream_split_decode,
    walk_parquet_bss,
)


def test_walk_matches_fixture_every_group():
    from pyspark_postgres_loader_spark.operators.parquetbss import _bs_h

    for g in range(_BS_GROUPS):
        f = walk_parquet_bss(_bs_bytes(g))
        assert f["columns"]["f"] == _bs_f(g)
        assert f["columns"]["d"] == _bs_d(g)
        assert f["columns"]["h"] == _bs_h(g)  # FLBA(2) float16
        assert f["n_pages"] == 3 * f["n_row_groups"]


def test_inverse_gather_unit():
    vals = [1.5, -2.25, 1024.125, 0.0, -0.5]
    packed = struct.pack("<5d", *vals)
    # forward shuffle by hand: stream j = byte j of every value
    streams = bytes(packed[i * 8 + j] for j in range(8) for i in range(5))
    assert byte_stream_split_decode(streams, 5, 8) == packed
    with pytest.raises(ValueError):
        byte_stream_split_decode(streams[:-1], 5, 8)


def test_typed_classes():
    with pytest.raises(ValueError) as ei:
        walk_parquet_bss(_bs_payload(3))  # footer cut
    assert "CRC" not in str(ei.value)
    with pytest.raises(ValueError, match="CRC"):
        walk_parquet_bss(_bs_payload(2))  # page flip under checksum
    with pytest.raises(NotImplementedError, match="physical type"):
        walk_parquet_bss(_bs_payload(18))  # INT64 BSS extension


def test_nullable_weave_counts():
    f = walk_parquet_bss(_bs_bytes(0))
    d = f["columns"]["d"]
    assert sum(1 for v in d if v is None) == sum(
        1 for i in range(len(d)) if i % 7 == 3)


def test_pyarrow_reads_back_identical():
    import io

    import pyarrow.parquet as pq

    blob = _bs_bytes(3)
    t = pq.read_table(io.BytesIO(blob))
    f = walk_parquet_bss(blob)
    assert f["columns"]["f"] == t.column("f").to_pylist()
    assert f["columns"]["d"] == t.column("d").to_pylist()
    assert f["columns"]["h"] == [
        float(v) for v in t.column("h").to_pylist()]
