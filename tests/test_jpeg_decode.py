"""Baseline greyscale JPEG codec (operators/multimodal):
encoder→decoder round trips under three regimes (exact block-constant,
near-lossless q=1, lossy Annex K), an INDEPENDENT direct-cosine-sum
IDCT cross-check of the matrix transform, marker/edge handling, and
the typed failures (truncation, color, progressive) that feed the
decode quarantine."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_postgres_loader_spark.operators.multimodal import (
    _dct_matrix,
    build_jpeg_grey,
    real_decode_image,
)


def _grey(px):
    assert px.shape[2] == 3
    assert np.array_equal(px[:, :, 0], px[:, :, 1])
    assert np.array_equal(px[:, :, 0], px[:, :, 2])
    return px[:, :, 0]


def test_block_constant_roundtrip_is_exact():
    """Constant 8x8 blocks with EVEN offsets from 128: every AC is 0,
    DC = 8(v-128) and q00 = 16 divides it — the lossy codec round-trips
    bit-exactly. This is the property the registered oracle relies on."""
    vals = np.array([[80, 128, 176], [130, 90, 254]], np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    w, h, px = real_decode_image(build_jpeg_grey(img))
    assert (w, h) == (24, 16)
    assert np.array_equal(_grey(px), img)


def test_q1_roundtrip_near_lossless_and_odd_dimensions():
    """All-ones quant table: the only loss is round(DCT coeff), which
    bounds per-pixel error tightly; dims not multiples of 8 exercise
    edge replication + crop."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(21, 37)).astype(np.uint8)
    w, h, px = real_decode_image(build_jpeg_grey(img, qtable=[1] * 64))
    assert (w, h) == (37, 21)
    err = np.abs(_grey(px).astype(int) - img.astype(int))
    assert err.max() <= 3


def test_annexk_lossy_but_structured():
    """Standard table on a smooth gradient: lossy, but error stays
    small because gradients live in low-frequency coefficients."""
    y, x = np.mgrid[0:32, 0:40]
    img = ((x * 3 + y * 2) % 200 // 8 * 8 + 20).astype(np.uint8)
    w, h, px = real_decode_image(build_jpeg_grey(img))
    assert (w, h) == (40, 32)
    err = np.abs(_grey(px).astype(float) - img.astype(float)).mean()
    assert err < 12.0


def test_idct_matrix_matches_direct_cosine_sum():
    """Independent check of the transform the decoder uses: T.T @ F @ T
    must equal the spec's direct O(N^4) sum
    f(x,y) = sum_u sum_v C(u)C(v)/4 F(u,v) cos((2x+1)u pi/16) cos((2y+1)v pi/16)."""
    rng = np.random.RandomState(5)
    f = rng.uniform(-500, 500, size=(8, 8))
    t = _dct_matrix()
    fast = t.T @ f @ t

    direct = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu * cv / 4.0 * f[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            direct[x, y] = acc
    assert np.allclose(fast, direct, atol=1e-9)


def test_byte_stuffing_actually_occurs_and_roundtrips():
    """An image tuned to produce 0xFF bytes in the entropy stream: the
    encoder must stuff 0x00 after them and the decoder must unstuff —
    verified by finding a stuffed pair inside the scan and by the
    decode succeeding."""
    rng = np.random.RandomState(99)
    img = rng.randint(0, 256, size=(48, 48)).astype(np.uint8)
    payload = build_jpeg_grey(img, qtable=[1] * 64)
    sos = payload.find(b"\xff\xda")
    scan = payload[sos + 2 :]
    assert b"\xff\x00" in scan  # stuffing really happened
    w, h, px = real_decode_image(payload)
    assert (w, h) == (48, 48)
    assert np.abs(_grey(px).astype(int) - img.astype(int)).max() <= 3


def test_truncated_jpeg_raises_for_quarantine():
    img = np.full((16, 16), 130, np.uint8)
    payload = build_jpeg_grey(img)
    with pytest.raises(Exception):
        real_decode_image(payload[: len(payload) // 2])


def test_unsupported_sof_variants_raise():
    img = np.full((8, 8), 130, np.uint8)
    payload = bytearray(build_jpeg_grey(img))
    sof = payload.find(b"\xff\xc0")
    # SOF2 now routes to the progressive decoder (which rejects this
    # BASELINE-structured scan as malformed, not unsupported); the
    # still-unsupported SOF variants stay typed
    prog = bytes(payload[:sof]) + b"\xff\xc2" + bytes(payload[sof + 2 :])
    with pytest.raises(ValueError):
        real_decode_image(prog)
    for marker in (0xC3, 0xC7, 0xCB):  # lossless / differential modes
        var = bytes(payload[:sof]) + bytes((0xFF, marker)) + bytes(
            payload[sof + 2 :]
        )
        with pytest.raises(NotImplementedError, match="non-baseline"):
            real_decode_image(var)
    # sampling factors beyond 2 (e.g. 4:1:1's h=4) stay unsupported
    sub = bytearray(payload)
    # marker(2) + len(2) + precision(1) + h(2) + w(2) + ncomp(1) + id(1)
    sub[sof + 11] = 0x41
    with pytest.raises(NotImplementedError, match="sampling factors"):
        real_decode_image(bytes(sub))


def test_greyscale_sampling_byte_is_ignored():
    """A lone component is never subsampled relative to itself — a 2x2
    sampling byte on a single-component SOF decodes identically to 1x1
    (libjpeg's normalization)."""
    img = np.full((8, 8), 130, np.uint8)
    payload = bytearray(build_jpeg_grey(img))
    sof = payload.find(b"\xff\xc0")
    base = real_decode_image(bytes(payload))
    payload[sof + 11] = 0x22
    w, h, px = real_decode_image(bytes(payload))
    assert (w, h) == (base[0], base[1])
    assert np.array_equal(px, base[2])


def test_color_block_constant_roundtrip_exact():
    """4:4:4 color: constant YCbCr blocks with even offsets round-trip
    exactly through encode → huffman decode → IDCT, then convert to
    RGB via the integer-exact JFIF fixed-point formula — the decoded
    pixels must equal _ycc_to_rgb of the original constants."""
    from pyspark_postgres_loader_spark.operators.multimodal import (
        _ycc_to_rgb,
        build_jpeg_ycbcr,
    )

    vals = np.array(
        [[[128, 90, 170], [80, 128, 128]], [[176, 130, 86], [130, 176, 90]]],
        np.uint8,
    )  # (2, 2, 3) block constants, all even offsets from 128
    ycbcr = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    w, h, px = real_decode_image(build_jpeg_ycbcr(ycbcr))
    assert (w, h) == (16, 16)
    expected = _ycc_to_rgb(ycbcr[:, :, 0], ycbcr[:, :, 1], ycbcr[:, :, 2])
    assert np.array_equal(px, expected)


def test_color_q1_roundtrip_near_lossless():
    """Arbitrary color content, all-ones table: per-channel YCbCr error
    <= ~3, and the fixed-point conversion amplifies by < 2x."""
    from pyspark_postgres_loader_spark.operators.multimodal import (
        _ycc_to_rgb,
        build_jpeg_ycbcr,
    )

    rng = np.random.RandomState(21)
    ycbcr = rng.randint(0, 256, size=(19, 27, 3)).astype(np.uint8)
    w, h, px = real_decode_image(build_jpeg_ycbcr(ycbcr, qtable=[1] * 64))
    assert (w, h) == (27, 19)
    expected = _ycc_to_rgb(ycbcr[:, :, 0], ycbcr[:, :, 1], ycbcr[:, :, 2])
    assert np.abs(px.astype(int) - expected.astype(int)).max() <= 8


def test_dc_prediction_across_blocks():
    """DC coding is DIFFERENTIAL across blocks: a staircase of block
    values exercises nonzero diffs of both signs."""
    vals = np.array([[128, 170, 128, 86]], np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    w, h, px = real_decode_image(build_jpeg_grey(img))
    assert (w, h) == (32, 8)
    assert np.array_equal(_grey(px), img)


def test_jpeg_decodes_through_spark_pipeline(spark):
    """Executor-side integration, mirroring the registered query."""
    import pandas as pd

    img_a = np.full((8, 16), 140, np.uint8)
    img_b = np.repeat(np.repeat(np.array([[90, 200]], np.uint8), 8, 0), 8, 1)

    def decode_batch(it):
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    w, h, px = real_decode_image(bytes(payload))
                    rows.append((int(doc_id), "ok", w, h, int(px.sum())))
                except Exception:
                    rows.append((int(doc_id), "quarantined", 0, 0, 0))
            yield pd.DataFrame(
                rows, columns=["doc_id", "status", "w", "h", "px_sum"]
            )

    df = spark.createDataFrame(
        [
            (1, bytearray(build_jpeg_grey(img_a))),
            (2, bytearray(build_jpeg_grey(img_b))),
            (3, bytearray(b"\xff\xd8 not actually a jpeg")),
        ],
        "doc_id long, payload binary",
    )
    out = {
        r.doc_id: r
        for r in df.mapInPandas(
            decode_batch, schema="doc_id long, status string, w int, h int, px_sum long"
        ).collect()
    }
    assert (out[1].status, out[1].w, out[1].h) == ("ok", 16, 8)
    assert out[1].px_sum == 140 * 16 * 8 * 3
    assert (out[2].status, out[2].w, out[2].h) == ("ok", 16, 8)
    assert out[3].status == "quarantined"


def test_restart_marker_roundtrip_exact():
    """DRI/RSTn: block-constant grey images with restart intervals of
    1..5 MCUs round-trip exactly — alignment, marker sequence and the
    DC-predictor reset (encoder emits an absolute DC after each RSTn;
    a decoder that forgot to reset its predictor would shift every
    post-restart block's value)."""
    from pyspark_postgres_loader_spark.operators.multimodal import _encode_jpeg

    vals = np.array([[100, 128, 150, 170], [90, 200, 130, 110]], np.uint8)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    for ri in (1, 2, 3, 5):
        p = _encode_jpeg([img], restart_interval=ri)
        assert b"\xff\xd0" in p  # at least one RST0 really present
        w, h, px = real_decode_image(p)
        assert (w, h) == (32, 16)
        assert np.array_equal(px, np.repeat(img[:, :, None], 3, axis=2))


def test_restart_nonconstant_q1_near_lossless():
    from pyspark_postgres_loader_spark.operators.multimodal import _encode_jpeg

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(24, 40)).astype(np.uint8)
    p = _encode_jpeg([img], qtable=[1] * 64, restart_interval=2)
    _w, _h, px = real_decode_image(p)
    assert np.abs(px[:, :, 0].astype(int) - img.astype(int)).max() <= 3


def test_restart_wrong_sequence_raises():
    from pyspark_postgres_loader_spark.operators.multimodal import _encode_jpeg

    img = np.repeat(np.repeat(
        np.array([[100, 128, 150, 170]], np.uint8), 8, 0), 8, 1)
    p = bytearray(_encode_jpeg([img], restart_interval=1))
    i = p.index(b"\xff\xd0")
    p[i + 1] = 0xD4  # claims three whole intervals were lost
    with pytest.raises(ValueError, match="restart marker"):
        real_decode_image(bytes(p))


def test_restart_marker_count_matches_interval():
    from pyspark_postgres_loader_spark.operators.multimodal import _encode_jpeg

    img = np.repeat(np.repeat(
        np.array([[100, 128, 150, 170, 90, 200]], np.uint8), 8, 0), 8, 1)
    for ri, expect in ((1, 5), (2, 2), (3, 1), (6, 0)):
        p = _encode_jpeg([img], restart_interval=ri)
        n = sum(p.count(bytes((0xFF, 0xD0 + k))) for k in range(8))
        assert n == expect, (ri, n, expect)


def test_restart_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "multimodal_jpeg_restart_decode")
