"""Avro single-object encoding: Parsing Canonical Form equivalence,
CRC-64-AVRO determinism, the fingerprint-store walk, typed verdicts,
and the oracle compare."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.operators.avrosingle import (
    _DOC_SCHEMA,
    _METRIC_SCHEMA,
    _SO_STORE,
    _so_payload,
    canonical_form,
    crc64_avro,
    encode_single_object,
    schema_fingerprint,
    walk_single_objects,
)


def test_canonical_form_normalizes_equivalent_schemas():
    """Attribute noise (doc/aliases/default), primitive-object
    wrapping, and namespace-vs-dotted-name must all canonicalize to
    the same string — the whole point of the fingerprint."""
    noisy = {
        "type": "record", "name": "Doc", "doc": "docs", "aliases": ["D"],
        "fields": [
            {"name": "id", "type": {"type": "long"}, "doc": "pk"},
            {"name": "val", "type": "long"},
            {"name": "name", "type": "string", "default": "q"},
        ],
    }
    assert canonical_form(noisy) == canonical_form(_DOC_SCHEMA)
    split_ns = {
        "type": "record", "name": "Metric", "namespace": "telemetry",
        "fields": _METRIC_SCHEMA["fields"],
    }
    dotted = {
        "type": "record", "name": "telemetry.Metric",
        "fields": _METRIC_SCHEMA["fields"],
    }
    assert canonical_form(split_ns) == canonical_form(dotted)
    assert schema_fingerprint(split_ns) == schema_fingerprint(dotted)
    assert schema_fingerprint(split_ns) != schema_fingerprint(_DOC_SCHEMA)
    # spec's documented shape: name first, minimal JSON, no stripped keys
    c = canonical_form(noisy)
    assert c.startswith('{"name":"Doc","type":"record","fields":[')
    assert "doc" not in c.replace('"Doc"', "") and "aliases" not in c


def test_primitive_collapse_strips_extra_attributes_first():
    """Spec transformation order: [STRIP] removes every attribute
    outside {name,type,fields,symbols,items,values,size} BEFORE
    [PRIMITIVES] collapses, so a primitive object carrying extras
    (precision, logicalType, custom props) still collapses to its
    simple form (round-13 advisory)."""
    assert canonical_form(
        {"type": "bytes", "precision": 4, "scale": 2}) == '"bytes"'
    assert canonical_form(
        {"type": "long", "logicalType": "timestamp-millis",
         "custom-prop": True}) == '"long"'
    assert canonical_form(
        {"type": "int", "doc": "d"}) == '"int"'
    # a decimal-annotated field inside a record fingerprints the same
    # as the bare primitive
    with_extras = {
        "type": "record", "name": "R",
        "fields": [{"name": "a",
                    "type": {"type": "bytes", "precision": 9,
                             "scale": 2, "logicalType": "decimal"}}],
    }
    bare = {"type": "record", "name": "R",
            "fields": [{"name": "a", "type": "bytes"}]}
    assert schema_fingerprint(with_extras) == schema_fingerprint(bare)


def test_crc64_avro_is_table_driven_and_stable():
    """Golden values pinned from this implementation of the spec's
    pseudocode (bit-reversed CRC, EMPTY=0xC15D213AA4D7A795); the
    empty input hashes to EMPTY itself by construction."""
    assert crc64_avro(b"") == 0xC15D213AA4D7A795
    a, b = crc64_avro(b"abc"), crc64_avro(b"abd")
    assert a != b
    assert crc64_avro(b"abc") == a  # deterministic across calls


def test_walk_counts_both_schemas():
    f = walk_single_objects(_so_payload(0), _SO_STORE)
    assert f["n_messages"] == f["n_doc"] + f["n_metric"]
    assert f["n_metric"] > 0 and f["n_doc"] > 0


def test_unknown_fingerprint_is_typed():
    doc_id = 19
    assert doc_id % 17 == 2
    with pytest.raises(ValueError, match="unknown schema"):
        walk_single_objects(_so_payload(doc_id), _SO_STORE)


def test_truncation_and_bad_marker_are_corrupt():
    with pytest.raises(ValueError):
        walk_single_objects(_so_payload(3), _SO_STORE)
    msg = bytearray(encode_single_object(_DOC_SCHEMA, b"\x02\x02\x00"))
    msg[0] ^= 0xFF
    with pytest.raises(ValueError, match="marker"):
        walk_single_objects(bytes(msg), _SO_STORE)


def test_body_must_consume_exactly():
    """A message body shorter than the schema demands must fail as a
    typed error even at stream end."""
    short = encode_single_object(_DOC_SCHEMA, b"\x02")
    with pytest.raises(ValueError):
        walk_single_objects(short, _SO_STORE)


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "ingest_avro_single_object")
