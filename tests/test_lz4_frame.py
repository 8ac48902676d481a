"""LZ4 frame decoder: XXH32 check vectors, CLI + pyarrow
cross-validation, typed quarantine, and the oracle compare."""

from __future__ import annotations

import random
import shutil
import struct
import subprocess

import pytest

from pyspark_postgres_loader_spark.operators.lz4frame import (
    _LZ_GOLDEN_B64,
    _LZ_GROUPS,
    _lz_content,
    _lz_payload,
    decompress_lz4_frame,
    lz4_decompress_block,
    xxh32,
)

_CLI = shutil.which("lz4")


def _cli_compress(data: bytes, *args: str) -> bytes:
    p = subprocess.run(["lz4", "-c", *args], input=data, capture_output=True)
    assert p.returncode == 0, p.stderr
    return p.stdout


def test_xxh32_published_check_vectors():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF


def test_golden_frames_match_lattice_and_cli():
    import base64

    for g in range(_LZ_GROUPS):
        blob = base64.b64decode(_LZ_GOLDEN_B64[g])
        want = _lz_content(g)
        out, used = decompress_lz4_frame(blob)
        assert out == want and used == len(blob)
        # block + content checksums are present (and therefore
        # verified — a wrong XXH32 could not decode these at all)
        assert blob[4] & 0x10 and blob[4] & 0x04
        if _CLI:
            p = subprocess.run(
                ["lz4", "-d", "-c"], input=blob, capture_output=True
            )
            assert p.returncode == 0 and p.stdout == want


@pytest.mark.skipif(_CLI is None, reason="lz4 CLI unavailable")
def test_cli_roundtrip_battery():
    rng = random.Random(7)
    cases = [
        (b"", ()),
        (b"hello", ()),
        (rng.randbytes(50000), ()),
        (b"abcabc" * 30000, ("-9",)),
        (b"abcabc" * 30000, ("-12",)),
        (bytes(300000), ("-9",)),
        (rng.randbytes(300) * 3000, ("-9", "-B7")),
        (b"pattern" * 10000, ("-9", "-B4", "--no-frame-crc")),
        (b"pattern" * 10000, ("-9", "-BX")),
        (b"data" * 1000, ("--content-size",)),
    ]
    for data, args in cases:
        blob = _cli_compress(data, *args)
        out, used = decompress_lz4_frame(blob)
        assert out == data and used == len(blob)
    for seed in range(30):
        r = random.Random(seed)
        shape = seed % 3
        if shape == 0:
            d = r.randbytes(r.randint(0, 5000))
        elif shape == 1:
            d = (r.randbytes(r.randint(1, 64)) * r.randint(1, 400))[
                : r.randint(1, 9000)
            ]
        else:
            d = b" ".join(b"tok%d" % r.randint(0, 30)
                          for _ in range(r.randint(1, 3000)))
        out, used = decompress_lz4_frame(
            _cli_compress(d, f"-{1 + seed % 12}")
        )
        assert out == d


def test_pyarrow_cross_validation():
    pa = pytest.importorskip("pyarrow")
    for seed in range(15):
        r = random.Random(100 + seed)
        d = (r.randbytes(r.randint(1, 64)) * r.randint(1, 200))[
            : r.randint(1, 6000)
        ]
        assert lz4_decompress_block(
            pa.compress(d, codec="lz4_raw", asbytes=True)
        ) == d
        out, _ = decompress_lz4_frame(
            pa.compress(d, codec="lz4", asbytes=True)
        )
        assert out == d


def test_typed_quarantine():
    import base64

    blob = base64.b64decode(_LZ_GOLDEN_B64[0])
    bad = blob[:-1] + bytes([blob[-1] ^ 1])
    with pytest.raises(ValueError, match="CRC"):
        decompress_lz4_frame(bad)
    with pytest.raises(ValueError, match="truncated"):
        decompress_lz4_frame(blob[:-2])
    # flipped header byte → header checksum catches it
    hdr_bad = blob[:5] + bytes([blob[5] ^ 0x10]) + blob[6:]
    with pytest.raises(ValueError):
        decompress_lz4_frame(hdr_bad)
    # dictionary fixture: re-sealed header checksum, typed gate fires
    doc_id = 5
    assert doc_id % 13 == 5
    with pytest.raises(NotImplementedError, match="dictionary"):
        decompress_lz4_frame(_lz_payload(doc_id))
    with pytest.raises(ValueError, match="magic"):
        decompress_lz4_frame(b"\x00" * 16)


def test_skippable_prefix_is_walked():
    # odd doc_ids carry a skippable frame before the real one
    data, used = decompress_lz4_frame(_lz_payload(21))
    assert data == _lz_content(1)


def test_fixture_truncation_always_fails_every_group():
    for g in range(_LZ_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _LZ_GROUPS
        with pytest.raises(ValueError):
            decompress_lz4_frame(_lz_payload(doc_id))


def test_block_decoder_rejects_garbage():
    with pytest.raises(ValueError, match="offset"):
        lz4_decompress_block(bytes([0x10, ord("a"), 0x05, 0x00]))
    with pytest.raises(ValueError, match="zero"):
        lz4_decompress_block(bytes([0x40]) + b"abcd" + bytes([0x00, 0x00]))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "ingest_lz4_frame_decode")
