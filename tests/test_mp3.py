"""MP3 frame walk (operators/mp3.py): HAND-ASSEMBLED known-bytes
headers (not round trips — a symmetric encoder/decoder bug cannot
cancel), the published CRC-16/CMS check vector, spec frame-length
values, typed quarantine, ID3v2 skipping, and the oracle match."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.operators.mp3 import (
    build_mp3,
    crc16_mp3,
    decode_mp3_frames,
)


def test_hand_assembled_classic_header():
    """FF FB 90 64 is THE canonical MPEG-1 Layer III header (128 kbps,
    44100 Hz, no padding, no CRC): frame length must be
    144*128000//44100 = 417 — hand-written bytes, no encoder involved."""
    frame = bytes((0xFF, 0xFB, 0x90, 0x64)) + bytes(413)
    version, layer, sr, frames = decode_mp3_frames(frame)
    assert (version, layer, sr) == ("1", 3, 44100)
    assert frames == [
        {"bitrate_kbps": 128, "length": 417, "padding": 0, "crc": False}
    ]


def test_hand_assembled_v2_and_padding_lengths():
    # MPEG-2 Layer III 64kbps @ 22050: 72*64000//22050 = 208 (+1 padded)
    # header: FF F3 (version 10, layer 01, no CRC) 8_ (idx 8 = 64 in
    # V2 L2/3 table) sr_idx 0, pad bit varies
    for pad, want in ((0, 208), (1, 209)):
        b2 = (8 << 4) | (0 << 2) | (pad << 1)
        frame = bytes((0xFF, 0xF3, b2, 0xC0)) + bytes(want - 4)
        _v, _l, sr, frames = decode_mp3_frames(frame)
        assert sr == 22050 and frames[0]["length"] == want
    # MPEG-1 Layer I 128kbps @ 44100: (12*128000//44100 + 0)*4 = 136
    frame = bytes((0xFF, 0xFF, 0x40, 0xC0)) + bytes(132)
    _v, layer, _sr, frames = decode_mp3_frames(frame)
    assert layer == 1 and frames[0]["length"] == 136


def test_crc16_published_check_vector():
    """crc16_mp3 is CRC-16/CMS (poly 0x8005, init 0xFFFF, unreflected):
    the published check value for b'123456789' is 0xAEE7 — an
    independent pin, not our own round trip."""
    assert crc16_mp3(b"123456789") == 0xAEE7


def test_crc_protected_stream_and_mismatch():
    p = build_mp3("1", 3, 0, [9, 10, 11], [0, 1, 0], with_crc=True)
    _v, _l, _sr, frames = decode_mp3_frames(p)
    assert all(f["crc"] for f in frames) and len(frames) == 3
    bad = bytearray(p)
    bad[5] ^= 0x80  # stored CRC low byte of frame 0
    with pytest.raises(ValueError, match="CRC"):
        decode_mp3_frames(bytes(bad))


def test_vbr_per_frame_bitrates():
    p = build_mp3("1", 3, 1, [1, 14, 7], [0, 0, 1])  # 32/320/96 @ 48k
    _v, _l, sr, frames = decode_mp3_frames(p)
    assert sr == 48000
    assert [f["bitrate_kbps"] for f in frames] == [32, 320, 96]
    assert [f["length"] for f in frames] == [
        144 * 32000 // 48000,
        144 * 320000 // 48000,
        144 * 96000 // 48000 + 1,
    ]


def test_id3v2_skip_and_syncsafe():
    p = build_mp3("2.5", 3, 2, [3, 4], [0, 0], id3_extra=17)
    assert p[:3] == b"ID3"
    _v, _l, sr, frames = decode_mp3_frames(p)
    assert sr == 8000 and len(frames) == 2
    bad = bytearray(p)
    bad[9] |= 0x80  # non-syncsafe size byte
    with pytest.raises(ValueError, match="syncsafe"):
        decode_mp3_frames(bytes(bad))


def test_typed_quarantine():
    p = build_mp3("1", 2, 0, [5], [0])
    free = bytearray(p)
    free[2] &= 0x0F  # bitrate index 0 = free format
    with pytest.raises(NotImplementedError, match="free-format"):
        decode_mp3_frames(bytes(free))
    with pytest.raises(ValueError, match="truncated"):
        decode_mp3_frames(p[: len(p) // 2])
    with pytest.raises(ValueError, match="sync"):
        decode_mp3_frames(b"\x00" + p)
    reserved_sr = bytearray(p)
    reserved_sr[2] |= 0x0C  # sample-rate index 3
    with pytest.raises(ValueError, match="sample-rate"):
        decode_mp3_frames(bytes(reserved_sr))


def test_mid_stream_consistency_enforced():
    a = build_mp3("1", 3, 0, [9], [0])
    b = build_mp3("2", 3, 0, [9], [0])
    with pytest.raises(ValueError, match="changed mid-stream"):
        decode_mp3_frames(a + b)


def test_audio_synthesis_stays_typed_stub():
    """The honest boundary: the frame WALK is implemented, audio sample
    synthesis is not — real_decode_audio must keep raising the typed
    NotImplementedError for MP3 payloads."""
    from pyspark_postgres_loader_spark.operators.multimodal import (
        real_decode_audio,
    )

    with pytest.raises(NotImplementedError):
        real_decode_audio(build_mp3("1", 3, 0, [9], [0]))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "audio_mp3_frame_walk")


def test_property_random_vbr_streams_roundtrip():
    """Hypothesis: any valid (version, layer, sr, VBR pattern, padding
    pattern, CRC choice) stream the encoder emits, the walker parses
    back field-for-field."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark_postgres_loader_spark.operators.mp3 import (
        _bitrate_kbps,
        _frame_length,
        _SR,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        version=st.sampled_from(["1", "2", "2.5"]),
        layer=st.sampled_from([1, 2, 3]),
        sr_idx=st.integers(0, 2),
        brs=st.lists(st.integers(1, 14), min_size=1, max_size=6),
        crc=st.booleans(),
        id3=st.one_of(st.none(), st.integers(0, 127)),
        data=st.data(),
    )
    def check(version, layer, sr_idx, brs, crc, id3, data):
        pads = [data.draw(st.integers(0, 1)) for _ in brs]
        p = build_mp3(version, layer, sr_idx, brs, pads,
                      with_crc=crc, id3_extra=id3)
        v, l, sr, frames = decode_mp3_frames(p)
        assert (v, l, sr) == (version, layer, _SR[version][sr_idx])
        assert [f["bitrate_kbps"] for f in frames] == [
            _bitrate_kbps(version, layer, bi) for bi in brs
        ]
        assert [f["length"] for f in frames] == [
            _frame_length(version, layer,
                          _bitrate_kbps(version, layer, bi), sr, pad)
            for bi, pad in zip(brs, pads)
        ]
        assert all(f["crc"] == (crc and layer == 3) for f in frames)

    check()
