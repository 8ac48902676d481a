"""ORC nullable columns: PRESENT byte-RLE + bit weave across all
five codecs, the all-null PRESENT-without-DATA edge, the non-null
statistics cross-check, and the oracle compare."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.operators.orcwalk import (
    _byte_rle_decode,
    _on_cols,
    _on_n,
    _on_payload,
    _ORC_CODECS,
    _present_bits,
    build_orc_nullable,
    walk_orc,
)


def test_byte_rle_both_run_kinds():
    # run: header 0 -> 3 copies; literal: header 0xFE -> 2 raw bytes
    assert _byte_rle_decode(b"\x00\xab") == b"\xab" * 3
    assert _byte_rle_decode(b"\xfe\x01\x02") == b"\x01\x02"
    assert _byte_rle_decode(b"\x02\xff\xfd\x09\x08\x07") == (
        b"\xff" * 5 + b"\x09\x08\x07")
    with pytest.raises(ValueError):
        _byte_rle_decode(b"\x05")


def test_present_bits_are_msb_first():
    # one literal byte 0b10100000 -> rows 0 and 2 present
    assert _present_bits(b"\xff\xa0", 3) == [True, False, True]


def test_nullable_decode_every_codec():
    for g, codec in enumerate(_ORC_CODECS):
        cols = _on_cols(g, _on_n(g))
        f = walk_orc(build_orc_nullable(g, codec))
        assert f["columns"][0] == cols["v"], codec
        assert f["columns"][1] == cols["u"]
        assert f["columns"][2] == cols["w"]          # all-null


def test_multi_stripe_weave():
    """Uncompressed at 4 KiB stripes forces several stripes, each
    with its own PRESENT bitmap — the weave must restart per
    stripe."""
    f = walk_orc(build_orc_nullable(0, "uncompressed"))
    assert f["n_stripes"] >= 2
    assert f["columns"][0] == _on_cols(0, _on_n(0))["v"]


def test_truncation_is_corrupt():
    with pytest.raises(ValueError):
        walk_orc(_on_payload(3))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "ingest_orc_nullable_walk")
