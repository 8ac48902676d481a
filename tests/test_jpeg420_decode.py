"""Chroma-subsampled baseline JPEG (4:2:0 / 4:2:2 / 4:4:0): MCU block
order, box-average subsampling on encode, box-replication upsampling on
decode, and the typed quarantine paths. Parity target: the reference's
image ingestion handles camera-typical 4:2:0 JPEGs; here the decode is
native (no codec library), spec ITU-T T.81 A.2.3.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_postgres_loader_spark.operators.multimodal import (
    _decode_jpeg,
    _ycc_to_rgb,
    build_jpeg_subsampled,
    build_jpeg_ycbcr,
    real_decode_image,
)


def _region_constant(w, h, fh, fv, g=0):
    """Planes exactly as the oracle fixture builds them: Y constant per
    8x8 block, chroma constant per (8*fh x 8*fv) region."""
    ybl = np.empty((h // 8, w // 8), np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            ybl[by, bx] = 128 + 2 * (((5 * bx + 3 * by + g) % 49) - 24)
    y = np.repeat(np.repeat(ybl, 8, axis=0), 8, axis=1)
    cw, ch = w // (8 * fh), h // (8 * fv)
    cbl = np.empty((ch, cw), np.uint8)
    crl = np.empty((ch, cw), np.uint8)
    for cy in range(ch):
        for cx in range(cw):
            cbl[cy, cx] = 128 + 2 * (((3 * cx + 7 * cy + 2 * g) % 49) - 24)
            crl[cy, cx] = 128 + 2 * (((cx + 11 * cy + 3 * g) % 49) - 24)
    cb = np.repeat(np.repeat(cbl, 8 * fv, axis=0), 8 * fh, axis=1)
    cr = np.repeat(np.repeat(crl, 8 * fv, axis=0), 8 * fh, axis=1)
    return y, cb, cr


@pytest.mark.parametrize("fh,fv", [(2, 2), (2, 1), (1, 2)])
def test_region_constant_roundtrip_exact(fh, fv):
    y, cb, cr = _region_constant(32, 32, fh, fv, g=1)
    payload = build_jpeg_subsampled(np.stack([y, cb, cr], axis=-1), (fh, fv))
    w, h, px = real_decode_image(payload)
    assert (w, h) == (32, 32)
    assert np.array_equal(px, _ycc_to_rgb(y, cb, cr))


def test_block_order_within_mcu_matters():
    """Four DISTINCT Y block constants inside one 4:2:0 MCU: the decode
    must place them raster-order (top-left, top-right, bottom-left,
    bottom-right) — a swapped pair changes specific pixel positions."""
    y = np.zeros((16, 16), np.uint8)
    vals = {(0, 0): 100, (0, 1): 140, (1, 0): 180, (1, 1): 220}
    for (by, bx), v in vals.items():
        y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    cb = np.full((16, 16), 128, np.uint8)
    cr = np.full((16, 16), 128, np.uint8)
    payload = build_jpeg_subsampled(np.stack([y, cb, cr], axis=-1), (2, 2))
    _w, _h, px = real_decode_image(payload)
    expected = _ycc_to_rgb(y, cb, cr)
    assert np.array_equal(px, expected)
    # and the four quadrants really are distinct (the test has teeth)
    assert len({int(px[4, 4, 0]), int(px[4, 12, 0]),
                int(px[12, 4, 0]), int(px[12, 12, 0])}) == 4


def test_upsample_alignment():
    """Chroma varies per 16x16 region: pixel (x, y) must read chroma
    sample (x//2, y//2) — a one-sample shift moves the 16-pixel color
    boundary and fails the comparison."""
    y = np.full((16, 32), 128, np.uint8)
    cb = np.empty((16, 32), np.uint8)
    cb[:, :16] = 90
    cb[:, 16:] = 170
    cr = np.full((16, 32), 128, np.uint8)
    payload = build_jpeg_subsampled(np.stack([y, cb, cr], axis=-1), (2, 2))
    _w, _h, px = real_decode_image(payload)
    assert np.array_equal(px, _ycc_to_rgb(y, cb, cr))
    assert int(px[8, 0, 2]) != int(px[8, 31, 2])  # blue differs across halves


def test_nonconstant_q1_near_lossless():
    """Arbitrary content, all-ones quant table: Y is near-lossless and
    chroma goes through box-average → DCT round trip → box-replicate;
    the decode must stay close to that exact expected pipeline."""
    rng = np.random.RandomState(7)
    ycc = rng.randint(0, 256, size=(24, 40, 3)).astype(np.uint8)
    payload = build_jpeg_subsampled(ycc, (2, 2), qtable=[1] * 64)
    w, h, px = real_decode_image(payload)
    assert (w, h) == (40, 24)
    sub = lambda p: (  # noqa: E731
        p.astype(np.int64).reshape(12, 2, 20, 2).sum(axis=(1, 3)) // 4
    ).astype(np.uint8)
    cb = np.repeat(np.repeat(sub(ycc[:, :, 1]), 2, axis=0), 2, axis=1)
    cr = np.repeat(np.repeat(sub(ycc[:, :, 2]), 2, axis=0), 2, axis=1)
    expected = _ycc_to_rgb(ycc[:, :, 0], cb, cr)
    assert np.abs(px.astype(int) - expected.astype(int)).max() <= 8


def test_odd_dimensions_pad_and_crop():
    """17x13 at 4:2:0: one partial MCU column and row — edge-replication
    padding on encode, crop to (w, h) on decode."""
    rng = np.random.RandomState(11)
    ycc = rng.randint(0, 256, size=(13, 17, 3)).astype(np.uint8)
    payload = build_jpeg_subsampled(ycc, (2, 2), qtable=[1] * 64)
    w, h, px = real_decode_image(payload)
    assert (w, h) == (17, 13)
    assert px.shape == (13, 17, 3)


def test_chroma_constant_matches_444():
    """When chroma is globally constant, 4:2:0 and 4:4:4 encodings of
    the same image must decode to IDENTICAL pixels (subsampling loses
    nothing) — a cross-layout consistency check no shared bug in the
    MCU walk can fake, since the two scans interleave differently."""
    y, _cb, _cr = _region_constant(32, 16, 2, 2, g=3)
    cb = np.full((16, 32), 104, np.uint8)
    cr = np.full((16, 32), 156, np.uint8)
    ycc = np.stack([y, cb, cr], axis=-1)
    p420 = build_jpeg_subsampled(ycc, (2, 2))
    p444 = build_jpeg_ycbcr(ycc)
    assert p420 != p444
    a = real_decode_image(p420)
    b = real_decode_image(p444)
    assert np.array_equal(a[2], b[2])


def test_patched_41_sampling_raises_typed():
    y, cb, cr = _region_constant(16, 16, 2, 2)
    payload = bytearray(build_jpeg_subsampled(np.stack([y, cb, cr], -1), (2, 2)))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 11] = 0x41
    with pytest.raises(NotImplementedError, match="sampling factors"):
        _decode_jpeg(bytes(payload))


def test_truncated_subsampled_raises():
    y, cb, cr = _region_constant(16, 16, 2, 2)
    payload = build_jpeg_subsampled(np.stack([y, cb, cr], -1), (2, 2))
    with pytest.raises(ValueError):
        _decode_jpeg(payload[: len(payload) // 2])


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "multimodal_jpeg420_decode")
