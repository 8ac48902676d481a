"""G.711 µ-law / A-law decode: full-table cross-check against the
stdlib audioop companders, WAVE walk behavior, typed verdicts, and
the oracle compare."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.operators.g711 import (
    _G7_GROUPS,
    _g7_blob,
    _g7_byte,
    _g7_n,
    _g7_payload,
    alaw_decode_byte,
    build_wav_g711,
    decode_wav_g711,
    mulaw_decode_byte,
)


def test_companders_match_audioop_all_256_bytes():
    audioop = pytest.importorskip("audioop")
    for b in range(256):
        assert mulaw_decode_byte(b) == int.from_bytes(
            audioop.ulaw2lin(bytes([b]), 2), "little", signed=True)
        assert alaw_decode_byte(b) == int.from_bytes(
            audioop.alaw2lin(bytes([b]), 2), "little", signed=True)


def test_known_endpoints():
    # 0xFF is µ-law zero; 0x7F is its MINUS-zero (also 0)
    assert mulaw_decode_byte(0xFF) == 0
    assert mulaw_decode_byte(0x7F) == 0
    # full-scale µ-law magnitudes (16-bit scaling)
    assert mulaw_decode_byte(0x00) == -32124
    assert mulaw_decode_byte(0x80) == 32124
    # A-law sign convention is inverted: bit 7 set (unmasked) = positive
    assert alaw_decode_byte(0xD5) == 8      # +minimum
    assert alaw_decode_byte(0x55) == -8     # -minimum
    assert alaw_decode_byte(0xAA) == 32256  # +maximum
    assert alaw_decode_byte(0x2A) == -32256


def test_walk_all_groups():
    for g in range(_G7_GROUPS):
        f = decode_wav_g711(_g7_blob(g))
        assert f["n_samples"] == _g7_n(g)
        assert f["rate"] == 8000 + 100 * g
        assert f["fmt"] == ("mulaw" if g % 2 == 0 else "alaw")
        dec = mulaw_decode_byte if g % 2 == 0 else alaw_decode_byte
        for i in (0, 1, _g7_n(g) - 1):
            assert f["samples"][i] == dec(_g7_byte(g, i))


def test_typed_classes():
    with pytest.raises(ValueError):
        decode_wav_g711(_g7_payload(3))      # truncated
    with pytest.raises(NotImplementedError, match="format code"):
        decode_wav_g711(_g7_payload(5))      # PCM16
    with pytest.raises(NotImplementedError, match="multi-channel"):
        fmt = build_wav_g711(bytes(8), 7)
        # patch channels to 2
        blob = bytearray(fmt)
        blob[22] = 2
        decode_wav_g711(bytes(blob))
    with pytest.raises(ValueError):
        decode_wav_g711(b"RIFF\x04\x00\x00\x00WAVE")


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "audio_g711_walk")
