"""Parquet page-index walk: pyarrow cross-validation of both index
structures, the bool-in-list thrift element encoding, verdict
classes, and the oracle compare."""

from __future__ import annotations

import math

import pytest

from pyspark_postgres_loader_spark.operators.parquetindex import (
    _PI_GROUPS,
    _PI_PAGE,
    _pi_bytes,
    _pi_payload,
    _pi_values,
    walk_parquet_page_index,
)
from pyspark_postgres_loader_spark.operators.parquetwalk import _TReader


def test_walk_agrees_with_pyarrow_index_every_group():
    """Both cross-checks must pass on every page of every group —
    offsets/sizes/first-row from the OffsetIndex and min/max from the
    ColumnIndex all match the walked, decoded pages."""
    for g in range(_PI_GROUPS):
        f = walk_parquet_page_index(_pi_bytes(g))
        vals = _pi_values(g)
        npg = math.ceil(len(vals) / _PI_PAGE)
        assert f["found_index"]
        assert f["n_pages"] == npg
        assert f["offsets_agree"] == npg
        assert f["minmax_agree"] == npg
        assert f["value_sum"] == sum(vals)
        assert f["sum_page_min"] == sum(
            min(vals[k * _PI_PAGE : (k + 1) * _PI_PAGE]) for k in range(npg))
        assert f["sum_page_max"] == sum(
            max(vals[k * _PI_PAGE : (k + 1) * _PI_PAGE]) for k in range(npg))


def test_bool_in_list_thrift_elements_decode():
    """ColumnIndex.null_pages is a list<bool> — thrift compact
    encodes container bools as a VALUE BYTE (1=true, 2=false), unlike
    struct fields where the bool lives in the field-header type code.
    A reader that conflates the two desyncs the whole struct."""
    import struct

    blob = _pi_bytes(0)
    flen = struct.unpack_from("<I", blob, len(blob) - 8)[0]
    meta = _TReader(blob, len(blob) - 8 - flen).read_struct()
    chunk = meta[4][0][1][0]
    ci = _TReader(blob, chunk[6]).read_struct()
    assert ci[1] == [False, False]          # null_pages, 2 pages
    assert all(len(b) == 8 for b in ci[2])  # min_values binaries
    assert all(len(b) == 8 for b in ci[3])  # max_values binaries
    assert ci[5] == [0, 0]                  # null_counts


def test_stale_index_is_detected_as_mismatch():
    """A flipped value byte under an unchanged index must fail the
    min/max cross-check (never pass silently, never crash)."""
    for g in range(_PI_GROUPS):
        doc_id = g
        while not (doc_id % 13 == 9 and doc_id % 11 != 6
                   and doc_id % 17 != 3):
            doc_id += _PI_GROUPS
        f = walk_parquet_page_index(_pi_payload(doc_id))
        assert f["found_index"]
        assert f["minmax_agree"] < f["n_pages"], g
        # geometry is untouched — only the data lies
        assert f["offsets_agree"] == f["n_pages"], g


def test_unindexed_file_is_typed_not_an_error():
    f = walk_parquet_page_index(_pi_bytes(2, with_index=False))
    assert not f["found_index"]


def test_truncation_is_corrupt():
    for g in range(_PI_GROUPS):
        doc_id = g
        while doc_id % 11 != 6:
            doc_id += _PI_GROUPS
        with pytest.raises(ValueError):
            walk_parquet_page_index(_pi_payload(doc_id))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "ingest_parquet_page_index_walk"
    )


def test_implausible_value_count_under_index_is_typed_not_oom():
    """ADVICE r12: the index walk fed the page header's num_values
    varint unbounded into the RLE level decode — a crafted ~17-byte
    header could allocate unbounded. It must raise the typed
    ValueError instead (same cap as the v1/v2 walks)."""
    import struct as _s

    def _i32(delta, v):
        out = [bytes([(delta << 4) | 5])]
        z = v << 1 if v >= 0 else ((-v) << 1) - 1
        while True:
            b = z & 0x7F
            z >>= 7
            out.append(bytes([b | 0x80]) if z else bytes([b]))
            if not z:
                return b"".join(out)

    dph = _i32(1, 1 << 40) + _i32(1, 0) + _i32(1, 3) + _i32(1, 3) + b"\x00"
    hdr = (_i32(1, 0) + _i32(1, 0) + _i32(1, 0)
           + bytes([(2 << 4) | 12]) + dph + b"\x00")
    blob = bytearray(_pi_bytes(0))
    flen = _s.unpack_from("<I", blob, len(blob) - 8)[0]
    meta = _TReader(bytes(blob), len(blob) - 8 - flen).read_struct()
    off = meta[4][0][1][0][3][9]  # data_page_offset of rg0/col0
    blob[off : off + len(hdr)] = hdr
    import pytest as _pt
    with _pt.raises(ValueError, match="implausible"):
        walk_parquet_page_index(bytes(blob))
