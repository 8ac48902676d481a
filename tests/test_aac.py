"""AAC ADTS walk (operators/aac.py): hand-assembled known-bytes
headers, explicit-length validation, CRC round trip and mismatch,
typed quarantine, and the oracle match."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.operators.aac import (
    build_adts,
    decode_adts_frames,
)


def test_hand_assembled_header():
    """Hand-written ADTS header (no encoder): syncword FFF, MPEG-4,
    layer 0, no CRC, profile LC (01), 44.1 kHz (index 4), stereo
    (config 2), frame length 7 + 13 = 20, one raw data block."""
    flen = 20
    hdr = bytes((
        0xFF,
        0xF1,                       # 1111 0 00 1: MPEG-4, layer 0, no CRC
        (1 << 6) | (4 << 2) | 0,    # profile LC, sf index 4, chan high bit
        (2 << 6) | ((flen >> 11) & 0x3),
        (flen >> 3) & 0xFF,
        ((flen & 0x7) << 5) | 0x1F,
        0xFC,                       # fullness low + 1 raw block (00)
    ))
    prof, sr, ch, frames = decode_adts_frames(hdr + bytes(13))
    assert (prof, sr, ch) == (1, 44100, 2)
    assert frames == [{"length": 20, "n_blocks": 1, "crc": False}]


def test_explicit_length_must_cover_header_and_stream():
    p = build_adts(1, 4, 2, [100, 50])
    _p, _sr, _ch, frames = decode_adts_frames(p)
    assert [f["length"] for f in frames] == [107, 57]
    # shorten the declared length below the header size
    bad = bytearray(p)
    bad[3] &= 0xC0
    bad[4] = 0
    bad[5] &= 0x1F  # length 0
    with pytest.raises(ValueError, match="cover its header"):
        decode_adts_frames(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_adts_frames(p[:-4])
    with pytest.raises(ValueError, match="sync"):
        decode_adts_frames(b"\x00" + p)


def test_crc_roundtrip_and_mismatch():
    p = build_adts(0, 3, 1, [64, 64], with_crc=True)
    _p, _sr, _ch, frames = decode_adts_frames(p)
    assert all(f["crc"] for f in frames)
    bad = bytearray(p)
    bad[8] ^= 0x01  # stored CRC low byte, frame 0
    with pytest.raises(ValueError, match="CRC"):
        decode_adts_frames(bytes(bad))


def test_typed_quarantine():
    p = build_adts(0, 3, 1, [64])
    reserved_layer = bytearray(p)
    reserved_layer[1] |= 0x02
    with pytest.raises(NotImplementedError, match="layer"):
        decode_adts_frames(bytes(reserved_layer))
    reserved_sf = bytearray(p)
    reserved_sf[2] = (reserved_sf[2] & 0xC3) | (13 << 2)
    with pytest.raises(ValueError, match="sampling-frequency"):
        decode_adts_frames(bytes(reserved_sf))


def test_mid_stream_consistency():
    a = build_adts(1, 4, 2, [64])
    b = build_adts(2, 4, 2, [64])
    with pytest.raises(ValueError, match="changed mid-stream"):
        decode_adts_frames(a + b)


def test_audio_synthesis_stays_typed_stub():
    from pyspark_postgres_loader_spark.operators.multimodal import (
        real_decode_audio,
    )

    with pytest.raises(NotImplementedError):
        real_decode_audio(build_adts(1, 4, 2, [64]))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "audio_aac_adts_walk")


def test_property_random_adts_streams_roundtrip():
    """Hypothesis: any valid ADTS stream the encoder emits (profile,
    sampling index, channels, payload lengths, CRC choice) parses back
    field-for-field, with the explicit lengths consistent."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark_postgres_loader_spark.operators.aac import _ADTS_SR

    @settings(max_examples=60, deadline=None)
    @given(
        profile=st.integers(0, 3),
        sf_idx=st.integers(0, 12),
        channels=st.integers(1, 7),
        plens=st.lists(st.integers(0, 300), min_size=1, max_size=6),
        crc=st.booleans(),
    )
    def check(profile, sf_idx, channels, plens, crc):
        p = build_adts(profile, sf_idx, channels, plens, with_crc=crc)
        prof, sr, ch, frames = decode_adts_frames(p)
        assert (prof, sr, ch) == (profile, _ADTS_SR[sf_idx], channels)
        hdr = 9 if crc else 7
        assert [f["length"] for f in frames] == [hdr + pl for pl in plens]
        assert all(f["crc"] == crc for f in frames)

    check()
