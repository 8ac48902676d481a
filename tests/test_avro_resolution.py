"""Avro schema resolution: every spec rule exercised against
hand-assembled containers (name matching across reorder, skip,
default, each promotion), the typed failure modes, plan compilation
corner cases, and the oracle compare."""

from __future__ import annotations

import json
import struct

import pytest

from pyspark_postgres_loader_spark.operators.avroresolve import (
    _RS_GROUPS,
    _rs_case,
    _rs_n,
    _rs_record,
    build_avro_generic,
    compile_resolution,
    walk_avro_resolved,
)
from pyspark_postgres_loader_spark.operators.avrowalk import encode_long


def _rec(fields):
    return {"type": "record", "name": "R", "fields": fields}


def _one_record_container(schema: dict, body: bytes) -> bytes:
    return build_avro_generic(
        json.dumps(schema, separators=(",", ":")),
        [body], "null", bytes(range(16)), block_records=10,
    )


def test_every_promotion_pair():
    """int→long/float/double, long→float/double, float→double,
    string↔bytes — one container per pair."""
    cases = [
        ("int", "long", encode_long(41), 41),
        ("int", "float", encode_long(41), 41.0),
        ("int", "double", encode_long(41), 41.0),
        ("long", "float", encode_long(-9), -9.0),
        ("long", "double", encode_long(-9), -9.0),
        ("float", "double", struct.pack("<f", 2.5), 2.5),
        ("string", "bytes", encode_long(2) + b"hi", b"hi"),
        ("bytes", "string", encode_long(2) + b"hi", "hi"),
    ]
    for wt, rt, body, expect in cases:
        blob = _one_record_container(
            _rec([{"name": "x", "type": wt}]), body
        )
        f = walk_avro_resolved(blob, _rec([{"name": "x", "type": rt}]))
        assert f["records"] == [(expect,)], (wt, rt)
        got = f["records"][0][0]
        assert type(got) is type(expect), (wt, rt)


def test_reorder_skip_and_default_together():
    """Writer (a, drop, b) read as (b, a, c default=-1): name-matched
    reorder, a discarded middle field, a defaulted tail field."""
    body = encode_long(10) + encode_long(99) + encode_long(20)
    blob = _one_record_container(
        _rec([
            {"name": "a", "type": "long"},
            {"name": "drop", "type": "long"},
            {"name": "b", "type": "long"},
        ]),
        body,
    )
    reader = _rec([
        {"name": "b", "type": "long"},
        {"name": "a", "type": "long"},
        {"name": "c", "type": "long", "default": -1},
    ])
    f = walk_avro_resolved(blob, reader)
    assert f["fields"] == ["b", "a", "c"]
    assert f["records"] == [(20, 10, -1)]


def test_skipped_field_still_consumes_bytes():
    """A writer-only string field of varying length must move the
    cursor correctly — prove skip is a decode, not a constant seek."""
    recs = []
    for i in range(5):
        s = ("x" * (i + 1)).encode()
        recs.append(encode_long(i) + encode_long(len(s)) + s)
    blob = build_avro_generic(
        json.dumps(_rec([
            {"name": "id", "type": "long"},
            {"name": "junk", "type": "string"},
        ]), separators=(",", ":")),
        recs, "null", bytes(range(16)), block_records=2,
    )
    f = walk_avro_resolved(blob, _rec([{"name": "id", "type": "long"}]))
    assert f["records"] == [(0,), (1,), (2,), (3,), (4,)]


def test_bytes_default_is_latin1_decoded():
    """Spec: bytes/fixed defaults are JSON strings whose code points
    0-255 map to bytes (ISO-8859-1)."""
    blob = _one_record_container(
        _rec([{"name": "a", "type": "long"}]), encode_long(1)
    )
    reader = _rec([
        {"name": "a", "type": "long"},
        {"name": "tag", "type": "bytes", "default": "ÿ"},
    ])
    f = walk_avro_resolved(blob, reader)
    assert f["records"] == [(1, b"\xff")]


def test_no_default_is_the_spec_hard_error():
    blob = _one_record_container(
        _rec([{"name": "a", "type": "long"}]), encode_long(1)
    )
    with pytest.raises(ValueError, match="no default"):
        walk_avro_resolved(
            blob,
            _rec([
                {"name": "a", "type": "long"},
                {"name": "b", "type": "long"},
            ]),
        )


def test_unresolvable_promotions_are_typed():
    for wt, rt in [("string", "long"), ("double", "float"),
                   ("long", "int"), ("boolean", "long")]:
        with pytest.raises(NotImplementedError, match="promotion"):
            compile_resolution(
                _rec([{"name": "x", "type": wt}]),
                _rec([{"name": "x", "type": rt}]),
            )


def test_verdict_classes_are_non_vacuous():
    counts = {"decoded": 0, "corrupt": 0, "no_default": 0,
              "unsupported": 0}
    for doc in range(200):
        corrupt = doc % 11 == 3
        nodef = doc % 17 == 2 and not corrupt
        unsup = doc % 13 == 5 and not (corrupt or nodef)
        want = ("corrupt" if corrupt else "no_default" if nodef
                else "unsupported" if unsup else "decoded")
        blob, reader = _rs_case(doc)
        try:
            f = walk_avro_resolved(blob, reader)
            got = "decoded"
            g = doc % _RS_GROUPS
            assert len(f["records"]) == _rs_n(g)
            rid, _extra, name, val = _rs_record(g, 7)
            assert f["records"][7] == (name.encode(), float(val), rid, 7)
        except NotImplementedError:
            got = "unsupported"
        except ValueError as exc:
            got = "no_default" if "no default" in str(exc) else "corrupt"
        assert got == want, (doc, got, want)
        counts[want] += 1
    assert min(counts.values()) > 0, counts


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "ingest_avro_schema_resolution"
    )
