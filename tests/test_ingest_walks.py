"""TFRecord + WARC record walks: published CRC-32C vector, framing
round trips, digest verification, typed quarantine, oracle compares."""

from __future__ import annotations

import struct

import pytest

from pyspark_postgres_loader_spark.operators.tfrecord import (
    _TFR_GROUPS,
    _tfr_payload,
    build_tfrecord,
    crc32c,
    masked_crc32c,
    walk_tfrecords,
)
from pyspark_postgres_loader_spark.operators.warc import (
    _WARC_GROUPS,
    _warc_payload,
    build_warc_record,
    walk_warc_records,
)


# ----------------------------------------------------------- TFRecord


def test_crc32c_published_vector():
    """The Castagnoli check vector every CRC-32C implementation pins."""
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # the TFRecord mask is a bijection-ish transform: masked != raw
    assert masked_crc32c(b"abc") != crc32c(b"abc")


def test_tfrecord_roundtrip_incl_empty_and_large():
    s = build_tfrecord(b"hello") + build_tfrecord(b"") + build_tfrecord(
        b"x" * 1000
    )
    assert walk_tfrecords(s) == [b"hello", b"", b"x" * 1000]


def test_tfrecord_both_crcs_verified():
    s = build_tfrecord(b"payload")
    with pytest.raises(ValueError, match="length CRC"):
        walk_tfrecords(s[:8] + bytes([s[8] ^ 1]) + s[9:])
    with pytest.raises(ValueError, match="payload CRC"):
        walk_tfrecords(s[:-1] + bytes([s[-1] ^ 1]))
    # flipping a PAYLOAD byte (stored CRCs intact) must also be caught
    i = s.index(b"payload")
    with pytest.raises(ValueError, match="payload CRC"):
        walk_tfrecords(s[:i] + b"pazload" + s[i + 7 :])
    for cut in (5, 11, 14, len(s) - 2):
        with pytest.raises(ValueError, match="truncated"):
            walk_tfrecords(s[:cut])


def test_tfrecord_fixture_truncation_always_fails():
    for g in range(_TFR_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _TFR_GROUPS
        with pytest.raises(ValueError):
            walk_tfrecords(_tfr_payload(doc_id))


# --------------------------------------------------------------- WARC


def test_warc_roundtrip_and_type_accounting():
    p = build_warc_record("warcinfo", "a", b"info") + build_warc_record(
        "response", "b", b"<html>hi</html>"
    )
    assert walk_warc_records(p) == [
        ("warcinfo", b"info"),
        ("response", b"<html>hi</html>"),
    ]
    # WARC/1.1 also decodes
    p11 = build_warc_record("response", "c", b"x", version="1.1")
    assert walk_warc_records(p11) == [("response", b"x")]


def test_warc_block_digest_catches_block_flip():
    p = build_warc_record("response", "d", b"ZQXBLOCK")
    i = p.index(b"ZQXBLOCK")
    with pytest.raises(ValueError, match="DIGEST"):
        walk_warc_records(p[:i] + b"ZQXBLOCQ" + p[i + 8 :])
    # a record WITHOUT a digest decodes (the field is optional)
    q = build_warc_record("response", "e", b"nodigest", digest=False)
    assert walk_warc_records(q) == [("response", b"nodigest")]


def test_warc_typed_quarantine():
    p = build_warc_record("response", "f", b"data")
    with pytest.raises(NotImplementedError, match="0.18"):
        walk_warc_records(p.replace(b"WARC/1.0", b"WARC/0.18", 1))
    with pytest.raises(NotImplementedError, match="digest algorithm"):
        walk_warc_records(p.replace(b"sha1:", b"md5x:", 1))
    with pytest.raises(ValueError, match="mandatory"):
        walk_warc_records(p.replace(b"WARC-Date", b"XARC-Date", 1))
    with pytest.raises(ValueError, match="trailer"):
        walk_warc_records(p[:-1] + b"X")  # right length, wrong trailer
    with pytest.raises(ValueError, match="truncated WARC block"):
        walk_warc_records(p[:-1])
    with pytest.raises(ValueError):
        walk_warc_records(p[: len(p) // 2])


def test_warc_fixture_truncation_always_fails():
    for g in range(_WARC_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _WARC_GROUPS
        with pytest.raises(ValueError):
            walk_warc_records(_warc_payload(doc_id))


def test_queries_match_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "ingest_tfrecord_walk")
    compare_query(spark, "/root/testdata/sf0.001", "ingest_warc_record_walk")
