"""Native VP8 keyframe decode: randomized pixel-exact cross-check
against libwebp's YUV output (ctypes, skipped where absent), golden
fact pinning, transform units, typed verdicts, and the oracle
compare."""

from __future__ import annotations

import base64
import random

import numpy as np
import pytest

from pyspark_postgres_loader_spark.operators.vp8 import (
    _idct4x4,
    _iwht4x4,
    _V8_FACTS,
    _V8_GOLDEN_B64,
    _V8_GROUPS,
    _V8_SEG,
    _v8_payload,
    decode_vp8,
)


def _libwebp():
    import ctypes

    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    return lib


def _ref_yuv(lib, blob):
    import ctypes

    ww = ctypes.c_int()
    hh = ctypes.c_int()
    stride = ctypes.c_int()
    uvstride = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    yp = lib.WebPDecodeYUV(blob, len(blob), ctypes.byref(ww),
                           ctypes.byref(hh), ctypes.byref(up),
                           ctypes.byref(vp), ctypes.byref(stride),
                           ctypes.byref(uvstride))
    w, h = ww.value, hh.value
    cw, ch = (w + 1) // 2, (h + 1) // 2
    Y = np.array([[yp[r * stride.value + c] for c in range(w)]
                  for r in range(h)])
    U = np.array([[up[r * uvstride.value + c] for c in range(cw)]
                  for r in range(ch)])
    V = np.array([[vp[r * uvstride.value + c] for c in range(cw)]
                  for r in range(ch)])
    return Y, U, V


def test_goldens_decode_and_match_pinned_facts():
    for g in range(_V8_GROUPS):
        blob = base64.b64decode("".join(_V8_GOLDEN_B64[g]))
        f = decode_vp8(blob)
        w, h, ys, us, vs, yw, uvw, lvl = _V8_FACTS[g]
        assert (f["width"], f["height"]) == (w, h)
        assert f["filter_level"] == lvl
        assert int(f["seg_enabled"]) == _V8_SEG[g]
        iy = np.arange(f["y"].size, dtype=np.int64) + 1
        iu = np.arange(f["u"].size, dtype=np.int64) + 1
        assert int(f["y"].sum()) == ys
        assert int(f["u"].sum()) == us
        assert int(f["v"].sum()) == vs
        assert int((f["y"].flatten() * iy).sum()) == yw
        assert (int((f["u"].flatten() * iu).sum())
                + 2 * int((f["v"].flatten() * iu).sum())) == uvw


def test_goldens_pixel_exact_vs_libwebp():
    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp not present")
    for g in range(_V8_GROUPS):
        blob = base64.b64decode("".join(_V8_GOLDEN_B64[g]))
        f = decode_vp8(blob)
        Yr, Ur, Vr = _ref_yuv(lib, blob)
        assert np.array_equal(f["y"], Yr), g
        assert np.array_equal(f["u"], Ur), g
        assert np.array_equal(f["v"], Vr), g


def test_randomized_cross_check_vs_libwebp():
    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp not present")
    import ctypes

    out = ctypes.POINTER(ctypes.c_uint8)()
    for trial in range(10):
        r = random.Random(5000 + trial)
        w = r.choice([16, 24, 33, 48, 9])
        h = r.choice([16, 31, 48, 6])
        q = r.choice([10, 45, 75, 90, 100])
        buf = bytearray()
        v = [120, 110, 130]
        for y in range(h):
            for x in range(w):
                if trial % 3 == 0:
                    px = (r.randrange(256), r.randrange(256),
                          r.randrange(256))
                elif trial % 3 == 1:
                    px = ((x * 7) % 256, (y * 11) % 256,
                          ((x + 2 * y) * 3) % 256)
                else:
                    for c in range(3):
                        v[c] = (v[c] + r.randrange(-9, 10)) % 256
                    px = tuple(v)
                buf += bytes(px) + b"\xff"
        n = lib.WebPEncodeRGBA(bytes(buf), w, h, w * 4, float(q),
                               ctypes.byref(out))
        blob = bytes(out[i] for i in range(n))
        f = decode_vp8(blob)
        Yr, Ur, Vr = _ref_yuv(lib, blob)
        assert np.array_equal(f["y"], Yr), (trial, w, h, q)
        assert np.array_equal(f["u"], Ur), (trial, w, h, q)
        assert np.array_equal(f["v"], Vr), (trial, w, h, q)


def test_transform_units():
    # IWHT with only DC: spreads (dc+3)>>3 evenly
    out = _iwht4x4([64] + [0] * 15)
    assert all(v == 8 for v in out)
    # IDCT of DC-only block: (dc*2... the constants path) — all equal
    out = _idct4x4([100] + [0] * 15)
    assert len(set(out)) == 1
    # IDCT linearity spot-check: scaling DC scales output
    a = _idct4x4([40] + [0] * 15)[0]
    b = _idct4x4([80] + [0] * 15)[0]
    assert b == 2 * a


def test_typed_classes():
    with pytest.raises(ValueError):
        decode_vp8(_v8_payload(3))       # truncated
    with pytest.raises(NotImplementedError, match="interframe"):
        decode_vp8(_v8_payload(5))       # keyframe bit flipped
    with pytest.raises(NotImplementedError, match="VP8L"):
        blob = bytearray(base64.b64decode("".join(_V8_GOLDEN_B64[0])))
        blob[12:16] = b"VP8L"
        decode_vp8(bytes(blob))
    with pytest.raises(ValueError):
        decode_vp8(b"RIFF\x04\x00\x00\x00WEBP")


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "multimodal_webp_lossy_decode")
