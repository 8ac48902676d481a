"""Native VP8L (WebP lossless) decode: libwebp cross-validation in
both directions (ctypes, skipped where the library is absent),
own-encoder roundtrip, golden-blob formula checks, distance-map and
predictor unit behavior, typed verdicts, and the oracle compare."""

from __future__ import annotations

import random

import pytest

from pyspark_postgres_loader_spark.operators.webp import (
    _DIST_MAP,
    _plane_to_dist,
    _wl_blob,
    _wl_dims,
    _wl_payload,
    _wl_px,
    _WL_GROUPS,
    decode_vp8l,
    encode_vp8l_lossless,
)


def _libwebp():
    import ctypes

    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    return lib


def _rgba_of(argb: list[int]) -> bytes:
    out = bytearray()
    for p in argb:
        out += bytes(((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF,
                      (p >> 24) & 0xFF))
    return bytes(out)


def test_own_encoder_roundtrip_all_groups():
    for fam in (0, 1):
        for g in range(_WL_GROUPS):
            f = decode_vp8l(_wl_blob(fam, g))
            w, h = _wl_dims(fam, g)
            assert (f["width"], f["height"]) == (w, h)
            for i, p in enumerate(f["pixels"]):
                x, y = i % w, i // w
                r, gg, b, a = _wl_px(fam, g, x, y)
                assert p == (a << 24) | (r << 16) | (gg << 8) | b


def test_golden_libwebp_blobs_decode_to_formulas():
    # the goldens were encoded by the REAL libwebp encoder — they
    # exercise transforms/cache/LZ77 the minimal encoder never emits
    for fam in (2, 3, 4):
        f = decode_vp8l(_wl_blob(fam, 0))
        w, h = _wl_dims(fam, 0)
        assert (f["width"], f["height"]) == (w, h)
        for i, p in enumerate(f["pixels"]):
            x, y = i % w, i // w
            r, gg, b, a = _wl_px(fam, 0, x, y)
            assert p == (a << 24) | (r << 16) | (gg << 8) | b


def test_distance_map_extraction_invariants():
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120
    assert _DIST_MAP[0] == (0, 1) and _DIST_MAP[1] == (1, 0)
    assert all(-7 <= dx <= 8 and 0 <= dy <= 8 for dx, dy in _DIST_MAP)
    # mapping: plane codes over 120 are direct distances
    assert _plane_to_dist(121, 100) == 1
    assert _plane_to_dist(200, 100) == 80
    # (0,1) at width 50 is the pixel directly above
    assert _plane_to_dist(1, 50) == 50
    # negative dx clamps at >= 1
    assert _plane_to_dist(4, 1) >= 1


def test_typed_classes():
    with pytest.raises(ValueError):
        decode_vp8l(_wl_payload(3))     # truncated
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_vp8l(_wl_payload(5))     # lossy VP8 payload
    with pytest.raises(NotImplementedError, match="VP8X"):
        decode_vp8l(b"RIFF\x10\x00\x00\x00WEBPVP8X" + bytes(8))
    with pytest.raises(ValueError):
        decode_vp8l(b"NOPE" + bytes(40))


def test_cross_validation_against_libwebp():
    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp not present")
    import ctypes

    rng = random.Random(99)
    for trial in range(12):
        w = rng.choice([1, 3, 16, 40, 65])
        h = rng.choice([1, 2, 17, 33])
        kind = trial % 3
        if kind == 0:
            rgba = bytes(rng.randrange(256) for _ in range(w * h * 4))
        elif kind == 1:
            k = rng.choice([2, 5, 30])
            pal = [bytes(rng.randrange(256) for _ in range(4))
                   for _ in range(k)]
            rgba = b"".join(pal[rng.randrange(k)] for _ in range(w * h))
        else:
            buf = bytearray()
            for y in range(h):
                for x in range(w):
                    buf += bytes(((x * 5) % 256, (y * 9) % 256,
                                  (x + y) % 256, 255))
            rgba = bytes(buf)
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lib.WebPEncodeLosslessRGBA(rgba, w, h, w * 4,
                                       ctypes.byref(out))
        assert n
        blob = bytes(out[i] for i in range(n))
        # ground truth is libwebp's own decode of the blob (the
        # encoder may legally rewrite RGB under alpha=0 pixels)
        ww, hh = ctypes.c_int(), ctypes.c_int()
        ref = lib.WebPDecodeRGBA(blob, len(blob), ctypes.byref(ww),
                                 ctypes.byref(hh))
        want = bytes(ref[i] for i in range(ww.value * hh.value * 4))
        f = decode_vp8l(blob)
        assert (f["width"], f["height"]) == (w, h)
        assert _rgba_of(f["pixels"]) == want


def test_own_encoder_accepted_by_libwebp():
    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp not present")
    import ctypes

    rng = random.Random(5)
    w, h = 19, 7
    argb = [(rng.randrange(256) << 24) | (rng.randrange(256) << 16)
            | (rng.randrange(256) << 8) | rng.randrange(256)
            for _ in range(w * h)]
    blob = encode_vp8l_lossless(argb, w, h)
    ww, hh = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(blob, len(blob), ctypes.byref(ww),
                           ctypes.byref(hh))
    assert p, "libwebp rejected the minimal encoder's stream"
    got = bytes(p[i] for i in range(ww.value * hh.value * 4))
    assert got == _rgba_of(argb)


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "multimodal_webp_lossless_decode")
