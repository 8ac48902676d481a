"""12-bit baseline JPEG (operators/jpeg12.py): exact extended-range
round trips, 16-bit DQT byte layout, near-lossless bound on rough
content, typed routing between the 8-bit and 12-bit decoders, and the
oracle match."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyspark_postgres_loader_spark.operators.jpeg12 import (
    _LEVEL,
    build_jpeg12_grey,
    decode_jpeg12,
)


def test_block_constant_exact_beyond_8bit_range():
    vals = np.array([[3040, 1056, 2048], [2048 + 992, 2048 - 992, 2050]],
                    np.int32)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    w, h, plane = decode_jpeg12(build_jpeg12_grey(img))
    assert (w, h) == (24, 16)
    assert np.array_equal(plane, img)
    assert plane.max() > 255  # true 12-bit data, not rescaled 8-bit


def test_dqt_is_16bit_pq1():
    p = build_jpeg12_grey(np.full((8, 8), _LEVEL, np.int32))
    i = p.index(b"\xff\xdb")
    seg_len = struct.unpack(">H", p[i + 2 : i + 4])[0]
    assert seg_len == 2 + 1 + 128  # marker len + PqTq + 64 * 2 bytes
    assert p[i + 4] == 0x10  # Pq=1 (16-bit), Tq=0
    assert struct.unpack(">H", p[i + 5 : i + 7])[0] == 16  # Annex K q00
    i = p.index(b"\xff\xc0")
    assert p[i + 4] == 12  # SOF0 sample precision


def test_rough_content_near_lossless_at_q1():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 4096, (24, 32)).astype(np.int32)
    _w, _h, plane = decode_jpeg12(build_jpeg12_grey(img, qtable=[1] * 64))
    assert np.abs(plane.astype(int) - img).max() <= 3


def test_dc_prediction_staircase_12bit():
    # monotone block ramp across the full 12-bit range: every DC diff
    # category up to the table limit gets exercised
    vals = np.array([[64 * i for i in range(8)],
                     [4032 - 64 * i for i in range(8)]], np.int32)
    vals = 2 * (vals // 2)  # even offsets stay exact at q00=16? not
    # needed here — q=1 below makes it near-lossless instead
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    _w, _h, plane = decode_jpeg12(build_jpeg12_grey(img, qtable=[1] * 64))
    assert np.abs(plane.astype(int) - img).max() <= 3


def test_typed_routing_between_decoders():
    from pyspark_postgres_loader_spark.operators.multimodal import (
        build_jpeg_grey,
        real_decode_image,
    )

    p12 = build_jpeg12_grey(np.full((8, 8), 3000, np.int32))
    # the generic uint8-RGB path quarantines 12-bit payloads (typed, on
    # purpose — it trips on the 16-bit DQT before even reaching the SOF)
    with pytest.raises(NotImplementedError, match="16-bit JPEG quant"):
        real_decode_image(p12)
    # the dedicated decoder rejects 8-bit payloads toward the general one
    p8 = build_jpeg_grey(np.full((8, 8), 130, np.uint8))
    with pytest.raises(ValueError, match="general decoder"):
        decode_jpeg12(p8)
    # unsupported precision stays typed
    bad = bytearray(p12)
    i = bad.index(b"\xff\xc0")
    bad[i + 4] = 10
    with pytest.raises(NotImplementedError, match="precision 10"):
        decode_jpeg12(bytes(bad))
    with pytest.raises(Exception):
        decode_jpeg12(p12[: len(p12) // 2])


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "multimodal_jpeg12_decode")


def test_property_even_block_constant_exact():
    """Hypothesis: ANY even-offset block-constant 12-bit image round
    trips exactly (q00=16 divides every DC; all ACs are zero)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        bw=st.integers(1, 4),
        bh=st.integers(1, 3),
        data=st.data(),
    )
    def check(bw, bh, data):
        vals = np.array(
            [
                [2 * data.draw(st.integers(0, 2047)) for _ in range(bw)]
                for _ in range(bh)
            ],
            np.int32,
        )
        img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
        _w, _h, plane = decode_jpeg12(build_jpeg12_grey(img))
        assert np.array_equal(plane, img)

    check()
