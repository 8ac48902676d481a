"""Lossy WebP with alpha: libwebp cross-validation of the decoded
alpha plane (all goldens including the self-assembled gradient
containers), filter roundtrip units, typed verdicts, and the oracle
compare."""

from __future__ import annotations

import random

import numpy as np
import pytest

from pyspark_postgres_loader_spark.operators.webpalpha import (
    _WX_FACTS,
    _WX_GROUPS,
    _WX_SELF_FMODE,
    _wx_blob,
    _wx_payload,
    filter_alpha,
    unfilter_alpha,
    walk_webp_alpha,
)


def test_goldens_decode_and_match_pinned_facts():
    for g in range(_WX_GROUPS):
        f = walk_webp_alpha(_wx_blob(g))
        w, h, fm, comp, a_sum, a_wsum, y_sum = _WX_FACTS[g]
        assert (f["width"], f["height"]) == (w, h)
        assert (f["filter"], f["compression"]) == (fm, comp)
        a = np.asarray(f["alpha"], dtype=np.int64)
        ia = np.arange(a.size) + 1
        assert int(a.sum()) == a_sum
        assert int((a * ia).sum()) == a_wsum
        assert int(f["y"].sum()) == y_sum


def test_filter_coverage_spans_all_modes_and_compressions():
    filters = {_WX_FACTS[g][2] for g in range(_WX_GROUPS)}
    comps = {_WX_FACTS[g][3] for g in range(_WX_GROUPS)}
    assert filters == {0, 1, 2, 3}
    assert comps == {0, 1}


def test_alpha_matches_libwebp_rgba_channel():
    import ctypes

    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        pytest.skip("libwebp not present")
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    for g in range(_WX_GROUPS):
        blob = _wx_blob(g)
        f = walk_webp_alpha(blob)
        ww = ctypes.c_int()
        hh = ctypes.c_int()
        p = lib.WebPDecodeRGBA(blob, len(blob), ctypes.byref(ww),
                               ctypes.byref(hh))
        assert p, g  # libwebp accepts the self-assembled containers too
        n = ww.value * hh.value
        assert [p[i * 4 + 3] for i in range(n)] == f["alpha"], g


def test_filter_roundtrip_all_modes():
    r = random.Random(4)
    w, h = 13, 9
    plane = [r.randrange(256) for _ in range(w * h)]
    for fmode in range(4):
        deltas = filter_alpha(plane, w, h, fmode)
        assert unfilter_alpha(deltas, w, h, fmode) == plane


def test_typed_classes():
    with pytest.raises(ValueError):
        walk_webp_alpha(_wx_payload(3))      # truncated
    with pytest.raises(NotImplementedError, match="level-reduction"):
        walk_webp_alpha(_wx_payload(5))      # preprocessing bit set
    with pytest.raises(ValueError):
        walk_webp_alpha(b"RIFF\x08\x00\x00\x00WEBPVP8L" + bytes(20))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "multimodal_webp_alpha_decode")
