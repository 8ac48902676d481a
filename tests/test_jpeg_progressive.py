"""Progressive JPEG (operators/jpeg_progressive.py): multi-scan
round trips under successive approximation, EOBn/ZRL/correction-bit
interplay on rough content, equivalence with the sequential decoder on
identical coefficients, scan-structure assertions on the emitted byte
stream, and the typed failure paths."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_postgres_loader_spark.operators.jpeg_progressive import (
    decode_progressive,
    encode_progressive,
)
from pyspark_postgres_loader_spark.operators.multimodal import (
    _ycc_to_rgb,
    build_jpeg_grey,
    real_decode_image,
)


def test_block_constant_grey_exact():
    vals = np.array([[80, 128, 176], [130, 90, 254]], np.uint8)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    w, h, px = real_decode_image(encode_progressive([img]))
    assert (w, h) == (24, 16)
    assert np.array_equal(px[:, :, 0], img)


def test_block_constant_color_exact():
    v = np.array(
        [[[128, 90, 170], [80, 128, 128]], [[176, 130, 86], [130, 176, 90]]],
        np.uint8,
    )
    ycc = np.repeat(np.repeat(v, 8, 0), 8, 1)
    p = encode_progressive([ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]])
    _w, _h, px = real_decode_image(p)
    assert np.array_equal(
        px, _ycc_to_rgb(ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2])
    )


def test_scan_structure_of_emitted_stream():
    """Independent marker walk over OUR bytes: a grey image must carry
    6 scans (DC first + DC refine + 2 AC bands + 2 AC refines) with
    the expected (Ss, Se, Ah, Al) quadruples; color carries 14."""
    import struct

    def scans(payload):
        out, pos = [], 2
        while pos < len(payload) - 1:
            assert payload[pos] == 0xFF
            marker = payload[pos + 1]
            pos += 2
            if marker == 0xD9:
                break
            if 0xD0 <= marker <= 0xD7 or marker == 0x01:
                continue
            seg_len = struct.unpack(">H", payload[pos : pos + 2])[0]
            seg = payload[pos + 2 : pos + seg_len]
            pos += seg_len
            if marker == 0xDA:
                ns = seg[0]
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                out.append((ns, ss, se, ahal >> 4, ahal & 0x0F))
                # skip entropy: next 0xFF with nonzero successor
                while pos + 1 < len(payload) and not (
                    payload[pos] == 0xFF and payload[pos + 1] != 0x00
                ):
                    pos += 2 if payload[pos] == 0xFF else 1
        return out

    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    got = scans(encode_progressive([img]))
    assert got == [
        (1, 0, 0, 0, 1), (1, 0, 0, 1, 0),
        (1, 1, 5, 0, 1), (1, 6, 63, 0, 1),
        (1, 1, 5, 1, 0), (1, 6, 63, 1, 0),
    ]
    ycc = np.repeat(img[:, :, None], 3, axis=2)
    got3 = scans(encode_progressive([ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]))
    assert len(got3) == 14
    assert got3[0] == (3, 0, 0, 0, 1)  # DC scans interleave all comps
    assert all(ns == 1 for ns, ss, *_ in got3[2:])  # AC scans single-comp


def test_rough_content_q1_grey():
    """Maximally rough content at q=1: exercises newly-nonzero runs,
    ZRL, EOBn spanning and correction bits together."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(21, 37)).astype(np.uint8)
    _w, _h, px = real_decode_image(encode_progressive([img], qtable=[1] * 64))
    assert np.abs(px[:, :, 0].astype(int) - img.astype(int)).max() <= 3


def test_rough_content_q1_color():
    rng = np.random.RandomState(21)
    ycc = rng.randint(0, 256, size=(19, 27, 3)).astype(np.uint8)
    p = encode_progressive(
        [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]], qtable=[1] * 64
    )
    _w, _h, px = real_decode_image(p)
    exp = _ycc_to_rgb(ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2])
    assert np.abs(px.astype(int) - exp.astype(int)).max() <= 8


def test_progressive_equals_sequential_at_q1():
    """Same image, same quant table, two completely different scan
    structures: the decoded pixels must be IDENTICAL (both decoders
    recover the same quantized coefficients)."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(32, 48)).astype(np.uint8)
    a = real_decode_image(encode_progressive([img], qtable=[1] * 64))[2]
    b = real_decode_image(build_jpeg_grey(img, qtable=[1] * 64))[2]
    assert np.array_equal(a, b)


def test_annexk_lossy_gradient():
    g = np.mgrid[0:64, 0:80]
    img = ((g[1] * 3 + g[0] * 2) % 200 + 20).astype(np.uint8)
    _w, _h, px = real_decode_image(encode_progressive([img]))
    assert np.abs(px[:, :, 0].astype(float) - img.astype(float)).mean() < 12


def test_sparse_high_frequency_eobn_and_zrl():
    """One isolated bright pixel per widely-spaced block: long EOBn
    runs between blocks and long zero runs (ZRL) inside them."""
    img = np.full((48, 64), 128, np.uint8)
    img[5, 5] = 255
    img[37, 57] = 0
    p = encode_progressive([img], qtable=[1] * 64)
    _w, _h, px = real_decode_image(p)
    assert np.abs(px[:, :, 0].astype(int) - img.astype(int)).max() <= 3


def test_oversampled_progressive_is_typed_unsupported():
    # factors in {1, 2} are SUPPORTED since the prog+4:2:0 work; 4x1
    # stays the typed quarantine path
    img = np.full((16, 16), 130, np.uint8)
    ycc = np.repeat(img[:, :, None], 3, axis=2)
    p = bytearray(
        encode_progressive([ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]])
    )
    i = p.index(b"\xff\xc2")
    p[i + 11] = 0x41
    with pytest.raises(NotImplementedError, match="sampling factors"):
        decode_progressive(bytes(p))


@pytest.mark.parametrize(
    "factors,dims",
    [((2, 2), (40, 24)), ((2, 1), (24, 16)), ((1, 2), (16, 24)),
     ((2, 2), (36, 20))],  # 36x20 at 4:2:0: own grid 5x3 < padded 6x4
)
def test_progressive_subsampled_equals_sequential(factors, dims):
    """Progressive and sequential encodings of the SAME subsampled
    planes must decode to IDENTICAL pixels (same quantized
    coefficients, same dequant + IDCT + box-replication upsample) —
    on NON-constant content, so every scan type (DC refinement, AC
    band first/refine, EOBn/ZRL interplay, own-vs-MCU-padded grid
    walk) is exercised."""
    from pyspark_postgres_loader_spark.operators.multimodal import _encode_jpeg

    (fh, fv), (w, h) = factors, dims
    rng = np.random.RandomState(fh * 10 + fv + w)
    y = rng.randint(0, 256, (h, w)).astype(np.uint8)
    cw, ch = -(-w // fh), -(-h // fv)
    cb = rng.randint(0, 256, (ch, cw)).astype(np.uint8)
    cr = rng.randint(0, 256, (ch, cw)).astype(np.uint8)
    sampling = [(fh, fv), (1, 1), (1, 1)]
    prog = encode_progressive([y, cb, cr], qtable=[1] * 64, sampling=sampling)
    seq = _encode_jpeg([y, cb, cr], qtable=[1] * 64, sampling=sampling)
    wp, hp, px_p = real_decode_image(prog)
    ws, hs, px_s = real_decode_image(seq)
    assert (wp, hp) == (ws, hs) == (w, h)
    assert np.array_equal(px_p, px_s)


def test_truncation_raises():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    p = encode_progressive([img])
    with pytest.raises(Exception):
        real_decode_image(p[: len(p) // 2])


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "multimodal_jpeg_progressive_decode"
    )
