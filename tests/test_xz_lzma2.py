"""XZ / LZMA2 decoder: CRC-64/XZ check vector, stdlib lzma
cross-validation (presets, checks, lc/lp/pb matrix, multi-chunk),
typed quarantine, and the oracle compare."""

from __future__ import annotations

import lzma
import random

import pytest

from pyspark_postgres_loader_spark.operators.xzwalk import (
    _XZ_GROUPS,
    _xz_content,
    _xz_payload,
    crc64_xz,
    decompress_xz,
)


def test_crc64_xz_check_vector():
    assert crc64_xz(b"123456789") == 0x995DC9BBDF1939FA
    assert crc64_xz(b"") == 0


def _roundtrip(d: bytes, **kw) -> None:
    blob = lzma.compress(d, **kw)
    out, st = decompress_xz(blob)
    assert out == d and st["consumed"] == len(blob)


def test_stdlib_battery():
    _roundtrip(b"hello world")
    _roundtrip(b"")
    _roundtrip(b"the quick brown fox " * 2000)
    _roundtrip(b"a" * 50000)
    for check in (lzma.CHECK_NONE, lzma.CHECK_CRC32, lzma.CHECK_CRC64,
                  lzma.CHECK_SHA256):
        _roundtrip(b"data" * 5000, check=check)
    for seed in range(24):
        r = random.Random(seed)
        shape = seed % 4
        if shape == 0:
            d = r.randbytes(r.randint(0, 5000))
        elif shape == 1:
            d = bytes(r.choice(b"abcd") for _ in range(r.randint(1, 8000)))
        elif shape == 2:
            d = (r.randbytes(r.randint(1, 64)) * r.randint(1, 300))[
                : r.randint(1, 9000)
            ]
        else:
            d = b" ".join(b"tok%d" % r.randint(0, 30)
                          for _ in range(r.randint(1, 3000)))
        _roundtrip(d, preset=seed % 10)


def test_multi_chunk_and_filter_matrix():
    r = random.Random(1)
    # > 2 MiB unpacked / > 64 KiB packed forces multiple LZMA2 chunks
    _roundtrip(r.randbytes(1_000_000), preset=1)
    _roundtrip((b"pattern-7 ") * 300_000, preset=6)
    for lc in (0, 1, 3, 4):
        for lp, pb in ((0, 2), (1, 0), (2, 1)):
            if lc + lp > 4:
                continue
            filt = [{"id": lzma.FILTER_LZMA2, "preset": 6,
                     "lc": lc, "lp": lp, "pb": pb}]
            d = bytes(r.choice(b"abcdefgh") for _ in range(20000))
            _roundtrip(d, filters=filt)


def test_non_lzma2_filter_is_typed_unsupported():
    blob = lzma.compress(
        b"x" * 1000,
        filters=[{"id": lzma.FILTER_DELTA, "dist": 1},
                 {"id": lzma.FILTER_LZMA2, "preset": 6}],
    )
    with pytest.raises(NotImplementedError, match="filter"):
        decompress_xz(blob)


def test_typed_quarantine():
    blob = lzma.compress(b"payload " * 500)
    with pytest.raises(ValueError, match="magic"):
        decompress_xz(b"JUNK" + blob[4:])
    with pytest.raises(ValueError):
        decompress_xz(blob[:-5])
    # flipped stream-header CRC
    bad = blob[:8] + bytes([blob[8] ^ 1]) + blob[9:]
    with pytest.raises(ValueError, match="CRC"):
        decompress_xz(bad)
    # fixture classes
    doc = 2
    assert doc % 17 == 2
    with pytest.raises(ValueError, match="CRC"):
        decompress_xz(_xz_payload(doc))
    doc = 5
    assert doc % 13 == 5
    with pytest.raises(NotImplementedError, match="check type"):
        decompress_xz(_xz_payload(doc))


def test_fixture_check_kinds_rotate():
    for doc in (0, 1, 12):
        out, st = decompress_xz(_xz_payload(doc))
        assert out == _xz_content(doc % _XZ_GROUPS)
        assert st["check"] == ("crc64", "crc32", "sha256")[(doc % 10) % 3]


def test_fixture_truncation_always_fails_every_group():
    for g in range(_XZ_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _XZ_GROUPS
        with pytest.raises(ValueError):
            decompress_xz(_xz_payload(doc_id))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "ingest_xz_lzma2_decode")


def test_multistream_concatenation_and_padding():
    """Concatenated XZ streams with optional 4-aligned zero padding —
    the spec's multi-stream layout. stdlib agrees on plain
    concatenation; on padded input stdlib silently STOPS at the
    padding, so only the content of the spec-following walk is
    compared there."""
    x = lzma.compress(b"first") + lzma.compress(
        b"second", check=lzma.CHECK_CRC32
    )
    out, st = decompress_xz(x)
    assert out == b"firstsecond" and st["n_streams"] == 2
    assert lzma.decompress(x) == out
    x2 = lzma.compress(b"alpha") + b"\x00" * 8 + lzma.compress(b"beta")
    out, st = decompress_xz(x2)
    assert out == b"alphabeta" and st["n_streams"] == 2
    with pytest.raises(ValueError, match="padding"):
        decompress_xz(lzma.compress(b"a") + b"\x00" * 3 + lzma.compress(b"b"))


def test_leading_stream_padding_rejected():
    """ADVICE r11: the XZ spec permits 4-aligned zero stream padding
    only BETWEEN/AFTER streams; zeros before the first stream must be
    a typed reject, not silently skipped."""
    blob = lzma.compress(b"payload " * 40, format=lzma.FORMAT_XZ)
    with pytest.raises(ValueError, match="before first stream"):
        decompress_xz(b"\x00" * 4 + blob)
    # padding BETWEEN streams stays legal
    out, st = decompress_xz(blob + b"\x00" * 8 + blob)
    assert out == b"payload " * 80 and st["n_streams"] == 2
