"""Native RFC 1951 inflate: zlib cross-validation across block types,
gzip-walk integration, typed quarantine, and the oracle compare."""

from __future__ import annotations

import random
import zlib

import pytest

from pyspark_postgres_loader_spark.operators.inflate import (
    _NI_GROUPS,
    _Huff,
    _ni_members_of,
    _ni_payload,
    inflate_raw,
    walk_gzip_native,
)


def _deflate(data: bytes, level=9, strategy=zlib.Z_DEFAULT_STRATEGY) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15, 9, strategy)
    return co.compress(data) + co.flush()


def test_zlib_battery_covers_all_block_types():
    """zlib is the independent encoder; the case set must drive our
    decoder through stored (0), fixed (1) AND dynamic (2) blocks."""
    union: set[int] = set()
    rng = random.Random(5)
    cases = []
    for seed in range(60):
        r = random.Random(seed)
        shape = seed % 4
        if shape == 0:
            d = r.randbytes(r.randint(0, 4000))
        elif shape == 1:
            d = bytes(r.choice(b"abcdef") for _ in range(r.randint(1, 6000)))
        elif shape == 2:
            d = (r.randbytes(r.randint(1, 64)) * r.randint(1, 300))[
                : r.randint(1, 9000)
            ]
        else:
            d = b" ".join(b"w%d" % r.randint(0, 40)
                          for _ in range(r.randint(1, 3000)))
        cases.append((d, seed % 10, zlib.Z_DEFAULT_STRATEGY))
    cases.append((b"abc" * 10, 6, zlib.Z_FIXED))
    cases.append((rng.randbytes(150000), 0, zlib.Z_DEFAULT_STRATEGY))
    cases.append((b"", 9, zlib.Z_DEFAULT_STRATEGY))
    for d, lvl, strat in cases:
        blob = _deflate(d, lvl, strat)
        stats: dict = {}
        out, used = inflate_raw(blob, stats)
        assert out == d and used == len(blob)
        union |= stats["block_types"]
    assert union == {0, 1, 2}, union


def test_fixture_members_hit_dynamic_blocks_every_group():
    for g in range(_NI_GROUPS):
        types: set[int] = set()
        for c in _ni_members_of(g):
            stats: dict = {}
            inflate_raw(_deflate(c), stats)
            types |= stats["block_types"]
        assert 2 in types, f"group {g} never used dynamic huffman"


def test_gzip_walk_native_facts():
    f = walk_gzip_native(_ni_payload(7))
    g = 7
    n = 1 + g % 3
    assert f["n_members"] == n
    assert f["content_len"] == sum(2400 + 160 * m + g for m in range(n))


def test_typed_quarantine():
    blob = bytearray(_ni_payload(0))
    flipped = bytearray(blob)
    flipped[-8] ^= 1  # stored CRC32 of the final member
    with pytest.raises(ValueError, match="CRC"):
        walk_gzip_native(bytes(flipped))
    with pytest.raises(ValueError):
        walk_gzip_native(bytes(blob[:-5]))
    v = bytearray(blob)
    v[3] |= 0x80
    with pytest.raises(NotImplementedError, match="reserved"):
        walk_gzip_native(bytes(v))
    # flipped DEFLATE byte: either the bitstream or the CRC must fail
    mid = len(blob) // 2
    d = bytes(blob[:mid]) + bytes([blob[mid] ^ 0x10]) + bytes(blob[mid + 1 :])
    with pytest.raises((ValueError, NotImplementedError)):
        walk_gzip_native(d)


def test_huffman_builder_rejects_oversubscription():
    with pytest.raises(ValueError, match="over-subscribed"):
        _Huff([1, 1, 1])  # three 1-bit codes cannot exist
    with pytest.raises(ValueError, match="empty"):
        _Huff([0, 0])


def test_stored_block_len_nlen_guard():
    blob = bytearray(_deflate(random.Random(0).randbytes(2000), 0))
    # find a stored block: first byte has btype 00 → header at bit 3;
    # LEN starts at the next byte boundary. Corrupt NLEN.
    blob[3] ^= 0xFF
    with pytest.raises(ValueError):
        inflate_raw(bytes(blob))


def test_fixture_truncation_always_fails_every_group():
    for g in range(_NI_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _NI_GROUPS
        with pytest.raises(ValueError):
            walk_gzip_native(_ni_payload(doc_id))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "ingest_gzip_native_inflate"
    )


def test_fextra_truncated_header_is_typed():
    """ADVICE r11: FEXTRA xlen read on a payload cut right after the
    10-byte fixed header must raise the typed ValueError, not leak a
    raw struct.error."""
    hdr = bytes([0x1F, 0x8B, 8, 4, 0, 0, 0, 0, 0, 255])  # FLG=FEXTRA
    with pytest.raises(ValueError):
        walk_gzip_native(hdr)
    with pytest.raises(ValueError):
        walk_gzip_native(hdr + b"\x02")  # 1 of 2 xlen bytes
