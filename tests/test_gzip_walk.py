"""gzip member walk (RFC 1952): stdlib cross-validation, optional
header fields, typed quarantine, and the oracle compare."""

from __future__ import annotations

import gzip
import struct
import zlib

import pytest

from pyspark_postgres_loader_spark.operators.gzipwalk import (
    _GZ_GROUPS,
    _gz_payload,
    build_gzip_member,
    walk_gzip_members,
)


def test_member_roundtrip_and_stdlib_agreement():
    """Our container must be valid gzip: the stdlib decompressor (an
    INDEPENDENT implementation) accepts it and returns the same bytes
    — the externally-encoded-GIF lesson applied in reverse."""
    p = build_gzip_member(b"hello world", name="a.txt", comment="c", hcrc=True)
    assert walk_gzip_members(p) == [("a.txt", b"hello world")]
    assert gzip.decompress(p) == b"hello world"
    multi = p + build_gzip_member(b"second") + build_gzip_member(b"", name="e")
    assert [c for _n, c in walk_gzip_members(multi)] == [
        b"hello world", b"second", b"",
    ]
    assert gzip.decompress(multi) == b"hello worldsecond"


def test_stdlib_emitted_stream_walks():
    """The walk must also accept streams OUR encoder never produced —
    stdlib gzip output with its own header choices."""
    blob = gzip.compress(b"x" * 1000, compresslevel=1)
    assert walk_gzip_members(blob) == [("", b"x" * 1000)]


def test_typed_quarantine():
    p = build_gzip_member(b"data", name="n")
    with pytest.raises(NotImplementedError, match="reserved"):
        walk_gzip_members(p[:3] + bytes([p[3] | 0x80]) + p[4:])
    with pytest.raises(NotImplementedError, match="method"):
        walk_gzip_members(p[:2] + b"\x07" + p[3:])
    with pytest.raises(ValueError, match="CRC"):
        i = len(p) - 8
        walk_gzip_members(p[:i] + bytes([p[i] ^ 1]) + p[i + 1 :])
    with pytest.raises(ValueError, match="ISIZE"):
        walk_gzip_members(p[:-1] + bytes([p[-1] ^ 1]))
    with pytest.raises(ValueError):
        walk_gzip_members(p[:-5])  # inside the trailer
    with pytest.raises(ValueError):
        walk_gzip_members(p[: len(p) // 2])


def test_header_crc_is_verified():
    p = build_gzip_member(b"abc", hcrc=True)
    # FHCRC is the 2 bytes right after the fixed 10-byte header here
    with pytest.raises(ValueError, match="header CRC"):
        walk_gzip_members(p[:10] + bytes([p[10] ^ 1]) + p[11:])


def test_fixture_truncation_always_fails_every_group():
    for g in range(_GZ_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _GZ_GROUPS
        with pytest.raises(ValueError):
            walk_gzip_members(_gz_payload(doc_id))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "ingest_gzip_member_walk")
