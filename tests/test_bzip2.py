"""Native bzip2 decoder: CRC-32/BZIP2 check vector, stdlib bz2
cross-validation incl. multi-block streams, typed quarantine, and the
oracle compare."""

from __future__ import annotations

import bz2
import random

import pytest

from pyspark_postgres_loader_spark.operators.bzip2 import (
    _BZ_GROUPS,
    _bz_content,
    _bz_payload,
    bz2_crc,
    decompress_bz2,
)


def test_crc32_bzip2_check_vector():
    """Same forward 0x04C11DB7 machine as the Ogg page CRC, init
    0xFFFFFFFF + final inversion — the catalogue's CRC-32/BZIP2."""
    assert bz2_crc(b"123456789") == 0xFC891918
    assert bz2_crc(b"") == 0


def test_stdlib_battery():
    cases = [
        (b"hello world", 9),
        (b"x", 9),
        (b"a" * 100000, 1),
        (b"the quick brown fox " * 5000, 9),
    ]
    for seed in range(40):
        r = random.Random(seed)
        shape = seed % 4
        if shape == 0:
            d = r.randbytes(r.randint(1, 5000))
        elif shape == 1:
            d = bytes(r.choice(b"abcd") for _ in range(r.randint(1, 8000)))
        elif shape == 2:
            d = (r.randbytes(r.randint(1, 64)) * r.randint(1, 300))[
                : r.randint(1, 9000)
            ]
        else:
            d = b" ".join(b"tok%d" % r.randint(0, 30)
                          for _ in range(r.randint(1, 3000)))
        cases.append((d, 1 + seed % 9))
    for d, lvl in cases:
        out, st = decompress_bz2(bz2.compress(d, lvl))
        assert out == d


def test_multi_block_stream():
    """Content over the 100k level-1 block size spans blocks; the
    combined stream CRC folds all of them."""
    big = random.Random(9).randbytes(150000) + b"q" * 150000
    out, st = decompress_bz2(bz2.compress(big, 1))
    assert out == big
    assert st["n_blocks"] >= 2


def test_fixture_content_and_rle1_nonvacuity():
    """Fixture content embeds >=4-byte runs, so the RLE1 stage is
    provably exercised (bzip2 applies RLE1 before the BWT)."""
    for g in range(_BZ_GROUPS):
        c = _bz_content(g)
        run_byte = bytes([65 + g % 20]) * 4
        assert run_byte in c, f"group {g} has no 4-byte run"
        out, st = decompress_bz2(bz2.compress(c, 1))
        assert out == c and st["n_blocks"] == 1


def test_typed_quarantine():
    blob = bytearray(bz2.compress(b"payload " * 200, 1))
    bad = bytearray(blob)
    bad[10] ^= 0x10  # stored block CRC
    with pytest.raises(ValueError, match="CRC"):
        decompress_bz2(bytes(bad))
    v = bytearray(blob)
    v[14] |= 0x80  # deprecated randomized bit
    with pytest.raises(NotImplementedError, match="randomized"):
        decompress_bz2(bytes(v))
    with pytest.raises(ValueError):
        decompress_bz2(bytes(blob[:-5]))
    with pytest.raises(ValueError, match="header"):
        decompress_bz2(b"not bzip2 at all")
    # flipped DATA bit mid-stream: huffman garbage or CRC must catch it
    mid = len(blob) // 2
    d = bytes(blob[:mid]) + bytes([blob[mid] ^ 0x08]) + bytes(blob[mid + 1 :])
    with pytest.raises((ValueError, NotImplementedError)):
        decompress_bz2(d)


def test_fixture_truncation_always_fails_every_group():
    for g in range(_BZ_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _BZ_GROUPS
        with pytest.raises(ValueError):
            decompress_bz2(_bz_payload(doc_id))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "ingest_bzip2_decode")


def test_multistream_concatenation():
    """The enwiki 'multistream' layout: independently seekable
    streams concatenated at byte boundaries; stdlib agrees on the
    joined content."""
    m = (bz2.compress(b"first article ", 1)
         + bz2.compress(b"second article", 5)
         + bz2.compress(b"third", 9))
    out, st = decompress_bz2(m)
    assert out == b"first article second articlethird"
    assert st["n_streams"] == 3 and st["n_blocks"] == 3
    assert bz2.decompress(m) == out
    with pytest.raises(ValueError, match="header"):
        decompress_bz2(bz2.compress(b"x") + b"JUNK")


def test_exponential_zero_run_is_typed_not_oom():
    """ADVICE r11: RUNA/RUNB run length grows as run += (sym+1)<<k, so
    ~60 crafted run symbols request a multi-exabyte bytearray unless the
    run is bounds-checked BEFORE materialization. Hand-assemble a block
    whose data section is 64 RUNA symbols (run -> 2^64-1) and assert the
    typed block-overflow ValueError fires instead of a MemoryError."""

    class _W:
        def __init__(self):
            self.bits: list[int] = []

        def w(self, val: int, n: int):
            for i in range(n - 1, -1, -1):
                self.bits.append((val >> i) & 1)

        def bytes(self) -> bytes:
            bs = self.bits + [0] * (-len(self.bits) % 8)
            return bytes(
                int("".join(map(str, bs[i : i + 8])), 2)
                for i in range(0, len(bs), 8)
            )

    w = _W()
    w.w(int.from_bytes(b"BZh1", "big"), 32)  # level 1 -> block_size 100k
    w.w(0x314159265359, 48)  # block magic
    w.w(0, 32)  # block CRC (never reached)
    w.w(0, 1)  # randomized = 0
    w.w(0, 24)  # origPtr
    w.w(1 << 15, 16)  # used_ranges: range 0 only
    w.w(1 << 15, 16)  # symbol 0 used -> alpha = 3
    w.w(2, 3)  # n_groups = 2
    w.w(2, 15)  # n_sel = 2
    w.w(0, 1)  # selector 0 -> group 0
    w.w(0, 1)  # selector 1 -> group 0
    for _ in range(2):  # two identical tables, lengths [1, 2, 2]
        w.w(1, 5)  # start c = 1
        w.w(0, 1)  # sym0: len 1
        w.w(0b10, 2)  # sym1: +1 -> 2
        w.w(0, 1)  # sym1 stop: len 2
        w.w(0, 1)  # sym2: len 2
    for _ in range(64):  # 64 RUNA symbols: run = 2^64 - 1
        w.w(0, 1)
    w.w(0b11, 2)  # EOB (never reached)
    with pytest.raises(ValueError, match="overflows"):
        decompress_bz2(w.bytes())
