"""zstd seekable format: build/walk roundtrip, table verification
claims, seek-probe semantics, typed verdicts, and the oracle
compare."""

from __future__ import annotations

import struct

import pytest

from pyspark_postgres_loader_spark.operators.zstdseek import (
    _SK_GROUPS,
    _sk_blob,
    _sk_byte,
    _sk_chunk_len,
    _sk_chunks,
    _sk_nchunks,
    _sk_payload,
    build_zstd_seekable,
    walk_zstd_seekable,
)


def test_roundtrip_all_groups():
    for g in range(_SK_GROUPS):
        f = walk_zstd_seekable(_sk_blob(g))
        assert f["n_frames"] == _sk_nchunks(g)
        assert f["has_checksum"] == (g % 2 == 0)
        assert f["chunks"] == _sk_chunks(g)
        assert f["total_decompressed"] == sum(
            _sk_chunk_len(g, i) for i in range(_sk_nchunks(g)))


def test_probe_resolves_via_table_only():
    f = walk_zstd_seekable(_sk_blob(1))
    t = (f["total_decompressed"] * 2) // 3
    acc = 0
    for i, c in enumerate(f["chunks"]):
        if t < acc + len(c):
            assert f["probe_frame"] == i
            assert f["probe_byte"] == c[t - acc]
            break
        acc += len(c)


def test_typed_classes():
    with pytest.raises(ValueError) as ei:
        walk_zstd_seekable(_sk_payload(3))       # truncated
    assert "CHECKSUM" not in str(ei.value)
    with pytest.raises(ValueError, match="CHECKSUM"):
        walk_zstd_seekable(_sk_payload(2))       # flipped content byte
    with pytest.raises(ValueError, match="DSIZE"):
        walk_zstd_seekable(_sk_payload(5))       # lying dsize entry
    with pytest.raises(ValueError):
        walk_zstd_seekable(b"\x00" * 16)


def test_table_tiling_enforced():
    # an extra byte between frames and table breaks the tiling
    blob = bytearray(build_zstd_seekable([b"ab" * 20, b"cd" * 30]))
    skip_at = blob.index(struct.pack("<I", 0x184D2A5E))
    blob[skip_at:skip_at] = b"\x00"
    # the inserted byte shifts the table; some structural check fires
    with pytest.raises(ValueError):
        walk_zstd_seekable(bytes(blob))


def test_checksum_free_table_skips_checksums():
    blob = build_zstd_seekable([b"xy" * 50], with_checksum=False)
    f = walk_zstd_seekable(blob)
    assert not f["has_checksum"]
    assert f["chunks"] == [b"xy" * 50]


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "ingest_zstd_seekable_walk")
