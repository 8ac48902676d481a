"""Snappy raw + framing decoder: pyarrow cross-validation both
directions, CRC reality check, typed quarantine, and the oracle
compare."""

from __future__ import annotations

import random
import struct

import pytest

from pyspark_postgres_loader_spark.operators.snappy import (
    _SN_GROUPS,
    _STREAM_ID,
    _sn_chunk_content,
    _sn_payload,
    build_snappy_frame,
    snappy_decompress_block,
    walk_snappy_frame,
)


def test_pyarrow_cross_validation_both_directions():
    pa = pytest.importorskip("pyarrow")
    for seed in range(40):
        r = random.Random(seed)
        shape = seed % 3
        if shape == 0:
            d = r.randbytes(r.randint(0, 6000))
        elif shape == 1:
            d = (r.randbytes(r.randint(1, 64)) * r.randint(1, 300))[
                : r.randint(1, 9000)
            ]
        else:
            d = bytes(r.choice(b"abcd") for _ in range(r.randint(1, 6000)))
        # their encoder → our decoder
        assert snappy_decompress_block(
            pa.compress(d, codec="snappy", asbytes=True)
        ) == d
    # our fixture chunks round-trip through THEIR decoder
    for g in range(_SN_GROUPS):
        for m in range(2 + g % 3):
            c = _sn_chunk_content(g, m)
            blob = pa.compress(c, codec="snappy", asbytes=True)
            assert pa.decompress(
                blob, decompressed_size=len(c), codec="snappy", asbytes=True
            ) == c


def test_framing_walk_facts():
    f = walk_snappy_frame(_sn_payload(4))
    g = 4
    n = 2 + g % 3
    assert f["n_chunks"] == n
    assert f["n_compressed"] == (n + 1) // 2  # even chunks compressed
    assert f["content_len"] == sum(200 + 32 * m + g for m in range(n))


def test_padding_chunk_is_skipped():
    # odd doc_ids carry a mid-stream padding chunk that must not
    # perturb the data-chunk facts
    f_even = walk_snappy_frame(_sn_payload(20))
    f_odd = walk_snappy_frame(_sn_payload(21))
    assert f_even["n_chunks"] == 2 + (20 % 10) % 3
    assert f_odd["n_chunks"] == 2 + (21 % 10) % 3
    assert f_odd["content_len"] == sum(
        200 + 32 * m + 1 for m in range(2 + (21 % 10) % 3)
    )


def test_crc_verification_is_real():
    """Flip a PAYLOAD byte inside an UNCOMPRESSED chunk, stored CRC
    intact: only a real CRC check can notice."""
    blob = bytearray(_sn_payload(0))  # group 0: chunks 0(comp),1(stored)
    # find the second data chunk (type 0x01) and flip a body byte
    pos = len(_STREAM_ID)
    while pos < len(blob):
        ctype = blob[pos]
        clen = int.from_bytes(blob[pos + 1 : pos + 4], "little")
        if ctype == 0x01:
            blob[pos + 4 + 4 + 5] ^= 0x01
            break
        pos += 4 + clen
    with pytest.raises(ValueError, match="CRC"):
        walk_snappy_frame(bytes(blob))


def test_typed_quarantine():
    blob = _sn_payload(0)
    with pytest.raises(ValueError, match="truncated"):
        walk_snappy_frame(blob[:-3])
    with pytest.raises(ValueError, match="identifier"):
        walk_snappy_frame(b"not snappy framing at all")
    doc_id = 5
    assert doc_id % 13 == 5
    with pytest.raises(NotImplementedError, match="unskippable"):
        walk_snappy_frame(_sn_payload(doc_id))
    # fixture crc_error class
    doc_id = 2
    assert doc_id % 17 == 2
    with pytest.raises(ValueError, match="CRC"):
        walk_snappy_frame(_sn_payload(doc_id))


def test_block_decoder_rejects_garbage():
    with pytest.raises(ValueError):
        snappy_decompress_block(b"\x0a\x01")  # declares 10, delivers 1
    with pytest.raises(ValueError, match="offset"):
        # preamble 10, literal 'ab', then a 1-byte-offset copy whose
        # offset (200) reaches before the output start
        snappy_decompress_block(bytes([10, 4]) + b"ab" + bytes([0x05, 200]))


def test_fixture_truncation_always_fails_every_group():
    for g in range(_SN_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _SN_GROUPS
        with pytest.raises(ValueError):
            walk_snappy_frame(_sn_payload(doc_id))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "ingest_snappy_framed_decode"
    )
