"""Parquet legacy-layout walk: INT96 timestamp records, FLBA
big-endian decimals, PLAIN bit-packed booleans — pyarrow
cross-validation across codecs, the null weave, typed verdicts,
and the oracle compare."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.operators.parquetlegacy import (
    _LG_BASE_US,
    _LG_GROUPS,
    _flba_unscaled,
    _int96_epoch_us,
    _lg_bool,
    _lg_bytes,
    _lg_d18,
    _lg_dec,
    _lg_kus,
    _lg_payload,
    _lg_rows,
    _plain_bools,
    walk_parquet_legacy,
)


def test_walk_matches_fixture_every_group():
    for g in range(_LG_GROUPS):
        f = walk_parquet_legacy(_lg_bytes(g))
        n = _lg_rows(g)
        assert f["num_rows"] == n
        assert f["n_pages"] == 4 * f["n_row_groups"]
        assert [us - _LG_BASE_US for us in f["columns"]["ts"]] == [
            _lg_kus(i, g) for i in range(n)]
        assert f["columns"]["dec"] == [_lg_dec(i, g) for i in range(n)]
        assert f["columns"]["d18"] == [_lg_d18(i, g) for i in range(n)]
        assert f["columns"]["b"] == [
            int(_lg_bool(i, g)) for i in range(n)]
        assert f["scales"] == {"ts": None, "dec": 2, "d18": 6, "b": None}


def test_int96_record_unit():
    # epoch day JDN 2440588, 1.5 s into the day
    raw = (1_500_000_000).to_bytes(8, "little") + \
        (2_440_588).to_bytes(4, "little")
    assert _int96_epoch_us(raw, 1) == [1_500_000]
    # next Julian day, exactly midnight
    raw2 = (0).to_bytes(8, "little") + (2_440_589).to_bytes(4, "little")
    assert _int96_epoch_us(raw2, 1) == [86_400_000_000]
    with pytest.raises(ValueError):
        _int96_epoch_us(raw[:-1], 1)


def test_flba_twos_complement_unit():
    assert _flba_unscaled(b"\xff\xff\xff\xfe", 1, 4) == [-2]
    assert _flba_unscaled(b"\x00\x00\x00\x05\x80\x00\x00\x00", 2, 4) == [
        5, -(1 << 31)]
    with pytest.raises(ValueError):
        _flba_unscaled(b"\x00\x00\x00", 1, 4)


def test_plain_bool_unit():
    # LSB-first: byte 0b00000101 -> rows 0 and 2 true
    assert _plain_bools(b"\x05", 3) == [1, 0, 1]
    assert _plain_bools(b"\xff\x01", 9) == [1] * 9
    with pytest.raises(ValueError):
        _plain_bools(b"\x05", 9)


def test_typed_classes():
    with pytest.raises(ValueError) as ei:
        walk_parquet_legacy(_lg_payload(3))  # footer cut
    assert "CRC" not in str(ei.value)
    with pytest.raises(ValueError, match="CRC"):
        walk_parquet_legacy(_lg_payload(2))  # page flip under checksum
    with pytest.raises(NotImplementedError, match="dictionary"):
        walk_parquet_legacy(_lg_payload(5))  # dictionary-encoded


def test_null_weave_counts():
    f = walk_parquet_legacy(_lg_bytes(4))
    dec = f["columns"]["dec"]
    assert sum(1 for v in dec if v is None) == sum(
        1 for i in range(len(dec)) if (i + 4) % 9 == 4)
    # only the decimal column carries nulls
    assert all(v is not None for v in f["columns"]["ts"])
    assert all(v is not None for v in f["columns"]["b"])


def test_pyarrow_reads_back_identical():
    import io

    import pyarrow.parquet as pq

    blob = _lg_bytes(3)
    t = pq.read_table(io.BytesIO(blob))
    f = walk_parquet_legacy(blob)
    # pyarrow reads INT96 back as timestamp[ns]; compare at µs
    assert f["columns"]["ts"] == [
        v.value // 1000 for v in t.column("ts").to_pylist()]
    assert f["columns"]["dec"] == [
        None if v is None else int(v.scaleb(2))
        for v in t.column("dec").to_pylist()]
    assert f["columns"]["d18"] == [
        int(v.scaleb(6)) for v in t.column("d18").to_pylist()]
    assert f["columns"]["b"] == [
        int(v) for v in t.column("b").to_pylist()]


def test_day_span_is_multi_day():
    # the fixture genuinely exercises the Julian-day field: > 30
    # distinct days in every group
    f = walk_parquet_legacy(_lg_bytes(0))
    days = {us // 86_400_000_000 for us in f["columns"]["ts"]}
    assert len(days) > 30


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "ingest_parquet_legacy_walk")
