"""Arithmetic-coded JPEG (SOF9): QM-coder bit/block roundtrips over
randomized inputs, pixel-exact equivalence with the independent
Huffman pipeline, state-table integrity, routing through the shared
image dispatcher, and typed verdict classes."""

from __future__ import annotations

import random

import numpy as np
import pytest

from pyspark_postgres_loader_spark.operators.jpeg_arith import (
    _AC_BINS,
    _ARITAB,
    _DC_BINS,
    _FIXED_STATE,
    ArithDecoder,
    ArithEncoder,
    _decode_ac,
    _decode_dc,
    _encode_ac,
    _encode_dc,
    _ja_payload,
    decode_arith_jpeg,
    encode_jpeg_arith,
)
from pyspark_postgres_loader_spark.operators.multimodal import (
    build_jpeg_grey,
    build_jpeg_ycbcr,
    real_decode_image,
)


def test_state_table_shape():
    assert len(_ARITAB) == 114
    # row 113 is the fixed ~0.5 self-loop used for AC signs
    assert _ARITAB[113] == (0x5A1D, 113, 113, 0)
    for i, (qe, nlps, nmps, sw) in enumerate(_ARITAB):
        assert 0 < qe <= 0x8000
        assert 0 <= nlps <= 113 and 0 <= nmps <= 113
        assert sw in (0, 1)


def test_raw_decision_roundtrip():
    rng = random.Random(11)
    for _ in range(25):
        n = rng.randrange(1, 1500)
        bins_e = bytearray(6)
        enc = ArithEncoder()
        seq = [(rng.randrange(6), rng.randrange(2)) for _ in range(n)]
        for i, d in seq:
            enc.encode(bins_e, i, d)
        stream = enc.flush()
        bins_d = bytearray(6)
        dec = ArithDecoder(stream, 0)
        for i, d in seq:
            assert dec.decode(bins_d, i) == d
        assert bins_d == bins_e  # state machines marched identically


def test_dc_ac_block_roundtrip():
    rng = random.Random(5)
    for _ in range(10):
        dcb_e, acb_e = bytearray(_DC_BINS), bytearray(_AC_BINS)
        fix_e = bytearray([_FIXED_STATE])
        enc = ArithEncoder()
        blocks = []
        ctx = 0
        for _b in range(rng.randrange(1, 30)):
            diff = rng.choice(
                [0, 1, -1, 2, -3, 7, 100, -2047, rng.randrange(-2047, 2048)])
            zz = [0] * 63
            for _k in range(rng.randrange(0, 25)):
                zz[rng.randrange(63)] = rng.randrange(-1023, 1024) or 3
            blocks.append((diff, list(zz)))
            ctx = _encode_dc(enc, dcb_e, ctx, diff, 0, 1)
            _encode_ac(enc, acb_e, fix_e, zz, 5)
        stream = enc.flush()
        dcb_d, acb_d = bytearray(_DC_BINS), bytearray(_AC_BINS)
        fix_d = bytearray([_FIXED_STATE])
        dec = ArithDecoder(stream, 0)
        ctx = 0
        for diff, zz in blocks:
            got, ctx = _decode_dc(dec, dcb_d, ctx, 0, 1)
            assert got == diff
            assert _decode_ac(dec, acb_d, fix_d, 5) == zz
        assert dcb_d == dcb_e and acb_d == acb_e


def test_arith_pixels_equal_huffman_pixels_grey():
    rng = np.random.RandomState(3)
    for _ in range(4):
        h, w = rng.randint(8, 40), rng.randint(8, 40)
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
        wa, ha, pa = decode_arith_jpeg(encode_jpeg_arith([img]))
        wh, hh, ph = real_decode_image(build_jpeg_grey(img))
        assert (wa, ha) == (wh, hh)
        assert np.array_equal(pa, ph)


def test_arith_pixels_equal_huffman_pixels_color():
    rng = np.random.RandomState(9)
    for _ in range(3):
        h, w = rng.randint(8, 32), rng.randint(8, 32)
        ycc = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        wa, ha, pa = decode_arith_jpeg(
            encode_jpeg_arith([ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]))
        wh, hh, ph = real_decode_image(build_jpeg_ycbcr(ycc))
        assert np.array_equal(pa, ph)


def test_routed_through_shared_dispatcher():
    # real_decode_image must route SOF9 to the arithmetic decoder
    # (the routing this round flipped from NotImplementedError)
    img = (np.arange(256, dtype=np.uint8).reshape(16, 16))
    w, h, px = real_decode_image(encode_jpeg_arith([img]))
    assert (w, h) == (16, 16) and px.shape == (16, 16, 3)


def test_typed_classes():
    with pytest.raises(Exception):
        real_decode_image(_ja_payload(9))  # 9 % 13 == 9: SOS header cut
    with pytest.raises(NotImplementedError):
        real_decode_image(_ja_payload(4))  # 4 % 17 == 4: SOF10 retype
    with pytest.raises(NotImplementedError):
        decode_arith_jpeg(
            encode_jpeg_arith([np.zeros((8, 8), np.uint8)])
            .replace(b"\xff\xc9", b"\xff\xcb", 1))  # lossless arith


def test_entropy_truncation_is_legal_zero_feed():
    # unlike Huffman, arithmetic entropy data may end early: the
    # decoder feeds zeros (spec convention) and still produces an
    # image — which is WHY the fixture's corrupt class must damage
    # structure, not entropy bytes
    img = np.full((8, 8), 200, np.uint8)
    blob = encode_jpeg_arith([img])
    sos = blob.index(b"\xff\xda")
    cut = blob[: sos + 30] if sos + 30 < len(blob) else blob[:-4]
    try:
        w, h, _px = decode_arith_jpeg(cut)
        assert (w, h) == (8, 8)
    except ValueError:
        pass  # a cut that lands in structure is also acceptable
