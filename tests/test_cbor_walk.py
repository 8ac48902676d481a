"""CBOR walk: RFC 8949 Appendix A published vectors, the
well-formedness vs validity distinction, indefinite forms, fixture
fault classes, and the oracle compare."""

from __future__ import annotations

import math

import pytest

from pyspark_postgres_loader_spark.operators.cborwalk import (
    _CB_GROUPS,
    _Cbor,
    _cb_payload,
    _half_to_float,
    walk_cbor,
)


def _decode_one(hexstr: str):
    dec = _Cbor(bytes.fromhex(hexstr))
    v = dec.item()
    assert dec.pos == len(dec.d), "trailing bytes"
    return v, dec


# RFC 8949 Appendix A — published (hex, value) vectors across every
# width class, both integer signs, floats incl. binary16, strings,
# arrays, maps, tags and the indefinite forms.
_RFC_INT_VECTORS = [
    ("00", 0), ("01", 1), ("0a", 10), ("17", 23), ("1818", 24),
    ("1819", 25), ("1864", 100), ("1903e8", 1000),
    ("1a000f4240", 1_000_000), ("1b000000e8d4a51000", 1_000_000_000_000),
    ("1bffffffffffffffff", 18_446_744_073_709_551_615),
    ("20", -1), ("29", -10), ("3863", -100), ("3903e7", -1000),
]
_RFC_FLOAT_VECTORS = [
    ("f90000", 0.0), ("f98000", -0.0), ("f93c00", 1.0),
    ("fb3ff199999999999a", 1.1), ("f93e00", 1.5), ("f97bff", 65504.0),
    ("fa47c35000", 100000.0), ("fa7f7fffff", 3.4028234663852886e38),
    ("f90001", 5.960464477539063e-8), ("f90400", 0.00006103515625),
    ("f9c400", -4.0), ("fbc010666666666666", -4.1),
]


def test_rfc8949_appendix_a_integers():
    for hx, want in _RFC_INT_VECTORS:
        v, _ = _decode_one(hx)
        assert v == want, hx


def test_rfc8949_appendix_a_floats():
    for hx, want in _RFC_FLOAT_VECTORS:
        v, _ = _decode_one(hx)
        assert v[0] == "float" and v[1] == want, hx


def test_rfc8949_appendix_a_float_specials():
    for hx in ("f97c00", "fa7f800000", "fb7ff0000000000000"):  # +Inf
        v, _ = _decode_one(hx)
        assert v[1] == math.inf, hx
    for hx in ("f97e00", "fa7fc00000", "fb7ff8000000000000"):  # NaN
        v, _ = _decode_one(hx)
        assert math.isnan(v[1]), hx
    for hx in ("f9fc00", "faff800000", "fbfff0000000000000"):  # -Inf
        v, _ = _decode_one(hx)
        assert v[1] == -math.inf, hx


def test_rfc8949_appendix_a_simple_and_strings():
    assert _decode_one("f4")[0] == ("simple", 20)  # false
    assert _decode_one("f5")[0] == ("simple", 21)  # true
    assert _decode_one("f6")[0] == ("simple", 22)  # null
    assert _decode_one("f7")[0] == ("simple", 23)  # undefined
    assert _decode_one("f0")[0] == ("simple", 16)
    assert _decode_one("f8ff")[0] == ("simple", 255)
    assert _decode_one("40")[0] == b""
    assert _decode_one("4401020304")[0] == b"\x01\x02\x03\x04"
    assert _decode_one("60")[0] == ("tstr", b"")
    assert _decode_one("6161")[0] == ("tstr", b"a")
    assert _decode_one("6449455446")[0] == ("tstr", b"IETF")
    assert _decode_one("62c3bc")[0] == ("tstr", "ü".encode())
    assert _decode_one("63e6b0b4")[0] == ("tstr", "水".encode())


def test_rfc8949_appendix_a_containers_and_tags():
    assert _decode_one("80")[0] == ()
    assert _decode_one("83010203")[0] == (1, 2, 3)
    assert _decode_one("8301820203820405")[0] == (1, (2, 3), (4, 5))
    v, _ = _decode_one("98190102030405060708090a0b0c0d0e0f101112131415161718181819")
    assert v == tuple(range(1, 26))
    assert _decode_one("a0")[0] == ()
    assert _decode_one("a201020304")[0] == ((1, 2), (3, 4))
    v, _ = _decode_one("a26161016162820203")
    assert v == ((("tstr", b"a"), 1), (("tstr", b"b"), (2, 3)))
    # tag 1 (epoch seconds) per Appendix A
    assert _decode_one("c11a514b67b0")[0] == ("tag", 1, 1363896240)


def test_rfc8949_appendix_a_indefinite_forms():
    assert _decode_one("5f42010243030405ff")[0] == b"\x01\x02\x03\x04\x05"
    assert _decode_one("7f657374726561646d696e67ff")[0] == (
        "tstr", b"streaming")
    assert _decode_one("9fff")[0] == ()
    assert _decode_one("9f018202039f0405ffff")[0] == (1, (2, 3), (4, 5))
    assert _decode_one("826161bf61626163ff")[0] == (
        ("tstr", b"a"), ((("tstr", b"b"), ("tstr", b"c")),))


def test_half_precision_decode_is_exact():
    assert _half_to_float(0x3C00) == 1.0
    assert _half_to_float(0x3E00) == 1.5
    assert _half_to_float(0x7BFF) == 65504.0
    assert _half_to_float(0x0001) == 5.960464477539063e-8  # subnormal
    assert _half_to_float(0xC400) == -4.0


def test_well_formedness_errors_are_typed():
    for hx in (
        "1c",        # reserved additional info 28
        "1d", "1e",  # 29, 30
        "ff",        # break outside indefinite
        "81ff",      # break as array element... (stray break)
        "18",        # truncated 1-byte argument
        "1a0000",    # truncated 4-byte argument
        "43aabb",    # byte string body short
        "5f4101",    # unterminated indefinite string
        "5f00ff",    # non-string chunk inside indefinite string
        "8101ff",    # trailing bytes after the item
        "3f",        # indefinite on negative int
        "9f",        # unterminated indefinite array
    ):
        with pytest.raises(ValueError):
            walk_cbor(bytes.fromhex(hx))


def test_validity_errors_are_separate_from_well_formedness():
    # duplicate key: {1: 2, 1: 3} is WELL-FORMED but invalid
    f = walk_cbor(bytes.fromhex("a201020103"))
    assert f["status"] == "invalid"
    assert "duplicate" in f["why_invalid"]
    # 0x80 continuation byte alone: well-formed tstr, invalid UTF-8
    f = walk_cbor(bytes.fromhex("6180"))
    assert f["status"] == "invalid"
    assert "UTF-8" in f["why_invalid"]


def test_fixture_fault_classes_nonvacuous():
    import collections

    st = collections.Counter()
    for d in range(300):
        try:
            st[walk_cbor(_cb_payload(d))["status"]] += 1
        except ValueError:
            st["corrupt"] += 1
    assert st["decoded"] and st["corrupt"] and st["invalid"]


def test_clean_fixture_lattice_every_group():
    for g in range(_CB_GROUPS):
        d = g
        while d % 11 == 5 or d % 17 == 9 or d % 13 == 8 or d % 19 == 4:
            d += _CB_GROUPS
        f = walk_cbor(_cb_payload(d))
        n = 40 + 25 * g
        assert f["status"] == "decoded"
        assert f["n_items"] == 1 + n + 20 + 10 + 10 + 4 + 1 + 6
        assert f["max_depth"] == 4
        assert f["float_milli"] == 1500 + 375 * g
        assert f["text_bytes"] == sum((i * 3 + g) % 17 + 1
                                      for i in range(20)) + 5
        assert f["bstr_bytes"] == sum((i * 5 + g) % 13 + 2
                                      for i in range(10))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "ingest_cbor_walk")
