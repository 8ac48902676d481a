"""Property tests over the baseline JPEG codec: arbitrary images
round-trip within the quantization-error bound, block-constant images
with even offsets round-trip EXACTLY (the registered oracle's
invariant), and the entropy layer (huffman + stuffing + DC prediction)
never corrupts structure regardless of content."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_postgres_loader_spark.operators.multimodal import (
    build_jpeg_grey,
    real_decode_image,
)


@st.composite
def _images(draw, max_blocks: int = 3):
    h = draw(st.integers(1, max_blocks * 8))
    w = draw(st.integers(1, max_blocks * 8))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.RandomState(seed).randint(0, 256, size=(h, w)).astype(np.uint8)


@given(_images())
@settings(max_examples=60, deadline=None)
def test_q1_roundtrip_error_bound_any_image(img):
    """All-ones quant table: the only loss is round() on each DCT
    coefficient (|e| <= 0.5); the IDCT of that error is bounded by
    sum_k |e_k| * |basis| — empirically <= 3 grey levels, asserted with
    margin. Exercises arbitrary dims (edge replication), arbitrary
    content (every AC path, ZRL runs, stuffing)."""
    w0, h0 = img.shape[1], img.shape[0]
    w, h, px = real_decode_image(build_jpeg_grey(img, qtable=[1] * 64))
    assert (w, h) == (w0, h0)
    assert np.abs(px[:, :, 0].astype(int) - img.astype(int)).max() <= 4


@st.composite
def _block_constant(draw):
    bw = draw(st.integers(1, 4))
    bh = draw(st.integers(1, 4))
    # even offsets from 128, clipped to uint8: q00=16 divides 8*(v-128)
    offs = draw(
        st.lists(
            st.integers(-64, 63), min_size=bw * bh, max_size=bw * bh
        )
    )
    vals = np.array([128 + 2 * o for o in offs], np.uint8).reshape(bh, bw)
    return np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)


@given(_block_constant())
@settings(max_examples=60, deadline=None)
def test_block_constant_even_offsets_roundtrip_exact(img):
    w, h, px = real_decode_image(build_jpeg_grey(img))
    assert (w, h) == (img.shape[1], img.shape[0])
    assert np.array_equal(px[:, :, 0], img)


@given(_images(max_blocks=2), st.integers(1, 255))
@settings(max_examples=40, deadline=None)
def test_uniform_qtable_scales_error(img, q):
    """Any uniform quant table q: per-coefficient error <= q/2, so the
    spatial error is bounded ~ q * 8 / 2 after the orthonormal IDCT
    fold (loose bound asserted; structure must survive any q)."""
    w0, h0 = img.shape[1], img.shape[0]
    w, h, px = real_decode_image(build_jpeg_grey(img, qtable=[q] * 64))
    assert (w, h) == (w0, h0)
    assert np.abs(px[:, :, 0].astype(int) - img.astype(int)).max() <= 4 * q + 4
