"""Parquet ZSTD / LZ4_RAW page walks: pyarrow cross-validation per
group, typed verdict classes (footer cut, CRC flip, zstd header
damage without page checksums, brotli dispatch), the shared
`_decompress` codec switch, and the 5-codec rotation of the
original native walk."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.operators.parquetcodec import (
    _PL_GROUPS,
    _PZ_GROUPS,
    _pl_bytes,
    _pl_payload,
    _pl_values,
    _pz_bytes,
    _pz_payload,
    _pz_values,
)
from pyspark_postgres_loader_spark.operators.parquetwalk import (
    _CODEC_LZ4_RAW,
    _CODEC_ZSTD,
    _decompress,
    _pq_bytes,
    _pq_codec,
    _pq_values,
    first_page_body_span,
    walk_parquet,
)


def test_zstd_walk_matches_fixture_every_group():
    for g in range(_PZ_GROUPS):
        f = walk_parquet(_pz_bytes(g))
        assert f["values"] == _pz_values(g)
        assert f["n_pages"] == f["n_row_groups"]


def test_lz4_walk_matches_fixture_every_group():
    for g in range(_PL_GROUPS):
        f = walk_parquet(_pl_bytes(g))
        assert f["values"] == _pl_values(g)
        assert f["n_pages"] == f["n_row_groups"]


def test_native_walk_codec_rotation_covers_zstd_and_lz4():
    codecs = {_pq_codec(g) for g in range(10)}
    assert {"zstd", "lz4"} <= codecs
    for g in range(10):
        assert walk_parquet(_pq_bytes(g))["values"] == _pq_values(g)


def test_zstd_footer_cut_is_corrupt():
    with pytest.raises(ValueError) as ei:
        walk_parquet(_pz_payload(3))  # 3 % 11 == 3
    assert "CRC" not in str(ei.value)


def test_zstd_page_flip_is_crc_error():
    with pytest.raises(ValueError, match="CRC"):
        walk_parquet(_pz_payload(2))  # 2 % 17 == 2


def test_zstd_reserved_header_bit_typed_without_page_checksum():
    # doc 18: 18 % 13 == 5, not 11/17 classes — page checksums are
    # OFF and the zstd frame header carries a set reserved bit; the
    # zstd decoder's own structural typing must catch it
    with pytest.raises(ValueError, match="reserved frame-header bit"):
        walk_parquet(_pz_payload(18))


def test_lz4_brotli_group_unsupported():
    with pytest.raises(NotImplementedError):
        walk_parquet(_pl_payload(18))  # 18 % 13 == 5


def test_lz4_page_flip_is_crc_error():
    with pytest.raises(ValueError, match="CRC"):
        walk_parquet(_pl_payload(2))


def test_decompress_rejects_trailing_bytes_after_zstd_frame():
    body = _pz_bytes(0)
    s, e = first_page_body_span(body)
    frame = body[s:e]
    want = len(_decompress(_CODEC_ZSTD, frame, _page_usize(body)))
    with pytest.raises(ValueError, match="trailing"):
        _decompress(_CODEC_ZSTD, frame + b"\x00", want)


def _page_usize(data: bytes) -> int:
    import struct

    from pyspark_postgres_loader_spark.operators.parquetwalk import (
        _TReader,
    )

    flen = struct.unpack_from("<I", data, len(data) - 8)[0]
    meta = _TReader(data, len(data) - 8 - flen).read_struct()
    cm = (meta.get(4) or [])[0].get(1)[0].get(3)
    rd = _TReader(data, cm.get(9))
    return rd.read_struct().get(2)


def test_decompress_lz4_block_size_mismatch_typed():
    body = _pl_bytes(0)
    s, e = first_page_body_span(body)
    block = body[s:e]
    usize = _page_usize(body)
    # declaring a SMALLER maximum must trip the output bound, typed
    with pytest.raises(ValueError):
        _decompress(_CODEC_LZ4_RAW, block, usize - 1)


def test_oracle_compare_sf0001(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "ingest_parquet_zstd_pages")
    compare_query(spark, "/root/testdata/sf0.001",
                  "ingest_parquet_lz4_pages")
