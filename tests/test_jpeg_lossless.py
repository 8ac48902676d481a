"""Lossless JPEG (SOF3, T.81 Annex H): exact predictive round trips,
a hand-assembled known-bytes stream, the SSSS=16 modulo edge, typed
quarantine for the honestly-unimplemented lossless modes, and the
driver-oracle compare."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_postgres_loader_spark.operators.jpeg_lossless import (
    _JLS_GROUPS,
    _jls_payload,
    build_jpeg_lossless_grey,
    decode_jpeg_lossless,
)


def test_roundtrip_all_predictors_and_point_transforms():
    """Every Annex H predictor (1..7) x Pt in {0,1} reconstructs the
    input bit-exactly on pseudo-random 12-bit samples (divisible by
    2^Pt, the point-transform exactness precondition)."""
    rng = np.random.RandomState(7)
    for predictor in range(1, 8):
        for pt in (0, 1):
            img = (rng.randint(0, 4096 >> pt, size=(11, 17)) << pt).astype(
                np.int64
            )
            w, h, sel, plane = decode_jpeg_lossless(
                build_jpeg_lossless_grey(img, predictor=predictor, pt=pt)
            )
            assert (w, h, sel) == (17, 11, predictor)
            assert (plane == img).all()


def test_hand_assembled_known_bytes_stream():
    """A complete SOF3 stream assembled BY HAND, byte for byte, for a
    2x2 8-bit image [[100,102],[95,99]] under predictor 4 (Ra+Rb-Rc):

      (0,0): pred 128 (2^7)  diff -28 -> SSSS 5, mag -28+31=3
      (0,1): pred Ra=100     diff  +2 -> SSSS 2, mag 2
      (1,0): pred Rb=100     diff  -5 -> SSSS 3, mag -5+7=2
      (1,1): pred 95+102-100=97 diff +2 -> SSSS 2, mag 2

    With the canonical 17-symbol length-5 table (code(s) == s), the
    entropy bits are 00101.00011 00010.10 00011.010 00010.10 — exactly
    32 bits = 28 C5 0D 0A. The decoder must reproduce the samples, and
    the encoder must emit exactly these bytes."""
    stream = bytes.fromhex(
        "ffd8"  # SOI
        "ffe000104a46494600010100000100010000"  # APP0/JFIF
        "ffc3000b0800020002010111 00"  # SOF3: P=8, 2x2, 1 comp
        "ffc40024 00"  # DHT class 0 id 0
        "00000000 11 0000000000000000000000"  # bits: 17 codes at len 5
        "000102030405060708090a0b0c0d0e0f10"  # vals 0..16
        "ffda0008 01 0100 04 00 00"  # SOS: Ss=4 (predictor), Al=0
        "28c50d0a"  # hand-coded entropy bits (see docstring)
        "ffd9"  # EOI
    )
    w, h, sel, plane = decode_jpeg_lossless(stream)
    assert (w, h, sel) == (2, 2, 4)
    assert plane.tolist() == [[100, 102], [95, 99]]
    img = np.array([[100, 102], [95, 99]], dtype=np.int64)
    assert build_jpeg_lossless_grey(img, predictor=4, precision=8) == stream


def test_ssss16_modulo_wraparound():
    """The one category the DCT modes never use: a difference of
    exactly +-32768 (mod 2^16) is coded as SSSS=16 with NO magnitude
    bits. P=16 with first sample 0 forces it (pred = 2^15)."""
    img = np.array([[0, 32768]], dtype=np.int64)
    w, h, sel, plane = decode_jpeg_lossless(
        build_jpeg_lossless_grey(img, predictor=1, precision=16)
    )
    assert plane.tolist() == [[0, 32768]]


def test_typed_quarantine_modes():
    payload = build_jpeg_lossless_grey(
        np.full((4, 4), 9, dtype=np.int64), predictor=2
    )
    i = payload.index(b"\xff\xc3")
    with pytest.raises(NotImplementedError, match="SOF7"):
        decode_jpeg_lossless(payload[: i + 1] + b"\xc7" + payload[i + 2 :])
    with pytest.raises(NotImplementedError, match="SOF11"):
        decode_jpeg_lossless(payload[: i + 1] + b"\xcb" + payload[i + 2 :])
    with pytest.raises(ValueError):
        decode_jpeg_lossless(payload[: len(payload) // 2])
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_lossless(payload[: i + 1] + b"\xc0" + payload[i + 2 :])


def test_fixture_truncation_always_fails():
    """The 'corrupt' rows must fail for EVERY group: headers alone are
    ~90 bytes and every group's payload halves inside them or inside
    the entropy data — assert it rather than assume it (the AAC group-6
    lesson: a clean-parsing truncation silently corrupts the oracle)."""
    for g in range(_JLS_GROUPS):
        doc_id = g + _JLS_GROUPS * 11  # avoid %17==2 and %11==3 patches
        if doc_id % 17 == 2 or doc_id % 11 == 3:
            doc_id += _JLS_GROUPS * 11
        payload = _jls_payload(doc_id)
        with pytest.raises(ValueError):
            decode_jpeg_lossless(payload[: len(payload) // 2])


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "multimodal_jpeg_lossless_decode"
    )
