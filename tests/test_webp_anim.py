"""Animated WebP container walk: frame/metadata roundtrip, the
ANMF-vs-VP8L dimension cross-check, typed verdicts, and the oracle
compare."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.operators.webpanim import (
    _WA_GROUPS,
    _wa_blob,
    _wa_fdims,
    _wa_nframes,
    _wa_payload,
    _wa_px,
    build_webp_anim,
    walk_webp_anim,
)


def test_roundtrip_all_groups():
    for g in range(_WA_GROUPS):
        f = walk_webp_anim(_wa_blob(g))
        nf = _wa_nframes(g)
        lossy = g % 3 == 2
        fw, fh = _wa_fdims(g)
        assert len(f["frames"]) == nf + (1 if lossy else 0)
        cw, ch = fw + 2 * (nf - 1), fh + 4
        if lossy:
            cw, ch = max(cw, 32), max(ch, 24)
        assert f["canvas_w"] == cw
        assert f["canvas_h"] == ch
        assert f["loop_count"] == g % 5
        for fi in range(nf):
            fr = f["frames"][fi]
            assert fr["kind"] == "vp8l"
            assert (fr["x"], fr["y"]) == (2 * fi, 2 * ((fi + g) % 3))
            assert fr["duration"] == 40 + 10 * fi + g
            assert fr["blend"] and not fr["dispose"]
            for i, p in enumerate(fr["pixels"]):
                x, y = i % fw, i // fw
                r, gg, b = _wa_px(g, fi, x, y)
                assert p == 0xFF000000 | (r << 16) | (gg << 8) | b
        if lossy:
            fr = f["frames"][nf]
            assert fr["kind"] == "vp8"
            assert (fr["w"], fr["h"]) == (32, 24)
            assert fr["duration"] == 99 + g


def test_mixed_codec_lossy_frame_matches_vp8_golden_facts():
    from pyspark_postgres_loader_spark.operators.vp8 import _V8_FACTS

    f = walk_webp_anim(_wa_blob(2))
    Y, U, V = f["frames"][-1]["pixels"]
    assert int(Y.sum()) == _V8_FACTS[0][2]
    assert int(U.sum()) == _V8_FACTS[0][3]
    assert int(V.sum()) == _V8_FACTS[0][4]


def test_dimension_cross_check_fires():
    with pytest.raises(ValueError, match="DIMS"):
        walk_webp_anim(_wa_payload(2))   # patched ANMF width


def test_typed_classes():
    with pytest.raises(ValueError):
        walk_webp_anim(_wa_payload(3))   # truncated
    with pytest.raises(NotImplementedError, match="interframe"):
        walk_webp_anim(_wa_payload(5))   # interframe VP8 frame
    with pytest.raises(ValueError):
        walk_webp_anim(b"RIFF\x04\x00\x00\x00WEBP" + bytes(20))


def test_frame_outside_canvas_rejected():
    argb = [0xFF000000] * 4
    blob = build_webp_anim([(6, 0, 2, 2, 10, argb)], 4, 4, 0)
    with pytest.raises(ValueError, match="canvas"):
        walk_webp_anim(blob)


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "multimodal_webp_anim_walk")
