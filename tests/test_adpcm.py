"""IMA ADPCM (operators/adpcm.py): state-machine decode against a
HAND-COMPUTED vector, encode→decode error bound (one step size), WAV
format-17 container round trip, multi-block streams, nibble packing
order, typed failures, and the list_reduce oracle differential."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_postgres_loader_spark.operators.adpcm import (
    build_wav_ima,
    build_wav_ima_raw,
    decode_ima,
    decode_wav_ima,
    encode_ima,
)


def test_hand_computed_decode_vector():
    """First steps worked out by hand from the IMA spec, starting at
    predictor 0, index 0 (step 7): nibble 7 → diff = 0+1+3+0? No —
    diff = step>>3 (0) + step>>2 (1, bit0) + step>>1 (3, bit1) +
    step (7, bit2) = 11 → pred 11, index +8 → 8 (step 16);
    nibble 8 → diff = 16>>3 = 2, sign bit → pred 9, index -1 → 7."""
    out = decode_ima([7, 8], 0, 0)
    assert out == [0, 11, 9]
    # and the index path: after nibble 7 the index is 8 (step 16),
    # after nibble 8 it's 7 (step 14): nibble 3 → diff = 14>>3 (1)
    # + 14>>2 (3, bit0) + 14>>1 (7, bit1) = 11 → pred 20, index 7-1=6
    out = decode_ima([7, 8, 3], 0, 0)
    assert out == [0, 11, 9, 20]


def test_clamps():
    # saturating positive: repeated max-magnitude positive nibbles
    out = decode_ima([7] * 200, 30000, 88)
    assert max(out) == 32767
    out = decode_ima([15] * 200, -30000, 88)
    assert min(out) == -32768


def test_encoder_decoder_state_sync():
    """The load-bearing ADPCM invariant: the encoder quantizes against
    its own DECODED reconstruction, so replaying its nibbles through
    the decoder reproduces the encoder's predictor path EXACTLY —
    errors never compound beyond the quantizer's reach."""
    from pyspark_postgres_loader_spark.operators.adpcm import _ima_step

    rng = np.random.RandomState(3)
    wave = np.cumsum(rng.randint(-300, 300, 400)).clip(-30000, 30000)
    nibbles, pred0, idx0 = encode_ima(wave)
    decoded = decode_ima(nibbles, pred0, idx0)
    # re-run the encoder's tracking loop independently
    pred, idx = pred0, idx0
    track = [pred0]
    for nib in nibbles:
        pred, idx = _ima_step(pred, idx, nib)
        track.append(pred)
    assert decoded == track


def test_slow_signal_error_bounded():
    """Without slope overload (delta per sample well inside the
    adapted step), reconstruction error stays small. (A fast signal
    CAN outrun the step adaptation — that's ADPCM's documented
    slope-overload distortion, not a codec bug.)"""
    wave = [int(3000 * np.sin(i / 40)) for i in range(600)]
    nibbles, pred0, idx0 = encode_ima(wave)
    decoded = decode_ima(nibbles, pred0, idx0)
    err = max(abs(a - b) for a, b in zip(wave[100:], decoded[100:]))
    assert err <= 64, err


def test_wav_container_roundtrip():
    wave = [int(200 * np.sin(i / 5) * 10) for i in range(201)]
    payload = build_wav_ima(wave, rate=16000)
    decoded, rate = decode_wav_ima(payload)
    assert rate == 16000
    assert len(decoded) == len(wave)
    assert decoded[0] == wave[0]
    # per-sample error bounded by the largest step encountered (loose)
    assert max(abs(a - b) for a, b in zip(wave, decoded)) < 2000


def test_multi_block_stream():
    """Two blocks in one data chunk: the decoder must restart state
    from each block header."""
    n1 = [(i * 3) % 16 for i in range(32)]
    n2 = [(i * 5 + 1) % 16 for i in range(32)]
    p1 = build_wav_ima_raw(n1, 100, 4)
    p2 = build_wav_ima_raw(n2, -500, 20)
    # splice block 2's data into payload 1's data chunk
    d1 = p1[p1.index(b"data") + 8 :]
    d2 = p2[p2.index(b"data") + 8 :]
    import struct

    head = p1[: p1.index(b"data")]
    payload = head + b"data" + struct.pack("<I", len(d1) + len(d2)) + d1 + d2
    decoded, _rate = decode_wav_ima(payload)
    expect = decode_ima(n1, 100, 4) + decode_ima(n2, -500, 20)
    assert decoded == expect


def test_low_nibble_first_packing():
    """An asymmetric nibble pair distinguishes packing order."""
    payload = build_wav_ima_raw([1, 14], 0, 10)
    i = payload.index(b"data") + 8
    code_byte = payload[i + 4]
    assert code_byte == (14 << 4) | 1


def test_bad_index_and_truncation_raise():
    p = bytearray(build_wav_ima_raw([1, 2, 3, 4], 0, 0))
    i = p.index(b"data") + 8
    p[i + 2] = 99  # step index out of range
    with pytest.raises(ValueError, match="out of range"):
        decode_wav_ima(bytes(p))
    good = build_wav_ima_raw([1, 2, 3, 4], 0, 0)
    with pytest.raises(ValueError):
        decode_wav_ima(good[: len(good) // 2])


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "audio_adpcm_decode")
