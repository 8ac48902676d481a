"""Full zstd compressed-block decoder: reference-CLI cross-validation
in both directions, entropy-path coverage assertions, typed
quarantine, and the oracle compare."""

from __future__ import annotations

import random
import shutil
import subprocess

import pytest

from pyspark_postgres_loader_spark.operators.zstdfse import (
    _GOLDEN_B64,
    _ZF_GROUPS,
    _zf_content,
    _zf_payload,
    decompress_frame,
    fse_build,
    huf_build,
)

_CLI = shutil.which("zstd")


def _cli_compress(data: bytes, *args: str) -> bytes:
    p = subprocess.run(
        ["zstd", "-c", *args], input=data, capture_output=True
    )
    assert p.returncode == 0, p.stderr
    return p.stdout


def _cli_decompress(blob: bytes) -> bytes:
    p = subprocess.run(["zstd", "-d", "-c"], input=blob, capture_output=True)
    assert p.returncode == 0, p.stderr
    return p.stdout


def test_golden_frames_match_lattice_and_cli():
    """The embedded fixture frames: our decoder AND (when present)
    the reference CLI must both regenerate the closed-form lattice —
    decoder and oracle content are pinned independently."""
    import base64

    for g in range(_ZF_GROUPS):
        blob = base64.b64decode(_GOLDEN_B64[g])
        want = _zf_content(g)
        out, used = decompress_frame(blob)
        assert out == want and used == len(blob)
        if _CLI:
            assert _cli_decompress(blob) == want


def test_golden_frames_are_entropy_coded():
    """Non-vacuity: every group's frame must contain a COMPRESSED
    block with Huffman-compressed literals — otherwise this operator
    would be re-testing zstdwalk's RAW/RLE scope."""
    import base64

    for g in range(_ZF_GROUPS):
        stats: dict = {}
        decompress_frame(base64.b64decode(_GOLDEN_B64[g]), stats)
        assert 2 in stats["block_types"], f"group {g} has no compressed block"
        assert 2 in stats["lit_types"], f"group {g} has no huffman literals"
        assert stats.get("n_sequences", 0) > 0, f"group {g} has no sequences"


@pytest.mark.skipif(_CLI is None, reason="zstd CLI unavailable")
def test_cli_roundtrip_battery():
    """Decode CLI output across levels and data shapes — an
    independent implementation on the encode side kills symmetric
    bugs. The union of runs must cover 1-stream AND 4-stream
    literals, FSE-compressed huffman weights, and both predefined and
    FSE_Compressed sequence modes."""
    rng = random.Random(42)
    cases = [
        (b"hello", "-3"),
        (rng.randbytes(100000), "-3"),          # raw blocks
        (b"abcabcabcabc" * 2000, "-19"),
        (b"a" * 100000, "-19"),                  # RLE-ish
        ((b"ab" * 50000), "-19"),
        (b" ".join(
            rng.choice([b"alpha", b"beta", b"gamma", b"the", b"of"])
            for _ in range(40000)
        ), "-19"),                               # 4-stream, FSE weights
        (b"".join(
            rng.randbytes(rng.randint(1, 50)) + b"PATTERN" * rng.randint(0, 20)
            for _ in range(2000)
        ), "-6"),
        ((rng.randbytes(64) * 3000), "-12"),     # multi-block matches
    ]
    union: dict = {"lit_types": set(), "seq_modes": set(), "block_types": set()}
    for data, lvl in cases:
        blob = _cli_compress(data, lvl)
        stats: dict = {}
        out, used = decompress_frame(blob, stats)
        assert out == data and used == len(blob)
        for k in ("lit_types", "seq_modes", "block_types"):
            union[k] |= stats.get(k, set())
    assert 2 in union["lit_types"]               # huffman literals
    assert {0, 2} <= union["seq_modes"]          # predefined + FSE
    assert 2 in union["block_types"]


@pytest.mark.skipif(_CLI is None, reason="zstd CLI unavailable")
def test_cli_fuzz_sweep():
    """Randomized shapes across all compression levels."""
    for seed in range(60):
        r = random.Random(seed)
        shape = seed % 4
        if shape == 0:
            d = r.randbytes(r.randint(0, 3000))
        elif shape == 1:
            d = bytes(r.choice(b"abcd") for _ in range(r.randint(1, 5000)))
        elif shape == 2:
            d = (r.randbytes(r.randint(1, 64)) * r.randint(1, 300))[
                : r.randint(1, 8000)
            ]
        else:
            d = b"".join(
                b"tok%d " % r.randint(0, 30) for _ in range(r.randint(1, 2000))
            )
        blob = _cli_compress(d, f"-{1 + seed % 19}")
        out, used = decompress_frame(blob)
        assert out == d and used == len(blob), f"seed {seed}"


def test_typed_quarantine():
    import base64

    blob = base64.b64decode(_GOLDEN_B64[0])
    # flipped stored checksum → CRC
    bad = blob[:-1] + bytes([blob[-1] ^ 1])
    with pytest.raises(ValueError, match="CRC"):
        decompress_frame(bad)
    # cut inside the checksum → corrupt
    with pytest.raises(ValueError, match="truncated"):
        decompress_frame(blob[:-2])
    # flipped PAYLOAD byte with checksum intact → the verification is
    # real, not a parse accident (mid-frame block data)
    mid = len(blob) // 2
    flipped = blob[:mid] + bytes([blob[mid] ^ 0x10]) + blob[mid + 1 :]
    with pytest.raises(ValueError):
        decompress_frame(flipped)
    # declared dictionary → unsupported
    doc_id = 5  # %13==5, %11!=3, %17!=2
    assert doc_id % 13 == 5
    with pytest.raises(NotImplementedError, match="dictionary"):
        decompress_frame(_zf_payload(doc_id))
    with pytest.raises(ValueError, match="magic"):
        decompress_frame(b"\x00" * 32)


def test_fixture_statuses_every_group():
    for g in range(_ZF_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _ZF_GROUPS
        with pytest.raises(ValueError):
            decompress_frame(_zf_payload(doc_id))


def test_table_builders_reject_garbage():
    with pytest.raises(ValueError):
        fse_build([5, 2], 3)  # sums to 7, table size 8 → spread fails


def test_huf_build_rejects_non_completable():
    # explicit total 5 → next power 8 → left 3, not a power of 2
    with pytest.raises(ValueError, match="power of 2"):
        huf_build([3, 1])


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "ingest_zstd_compressed_decode"
    )
