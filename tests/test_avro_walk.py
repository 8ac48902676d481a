"""Avro object-container walk: spec-pinned zigzag vectors, a
hand-assembled known-byte container (independent inline assembler),
the 6-codec battery through the repo's native decoders, typed
quarantine non-vacuity, and the oracle compare."""

from __future__ import annotations

import json
import struct
import zlib

import pytest

from pyspark_postgres_loader_spark.operators.avrowalk import (
    _AV_GROUPS,
    _av_payload,
    _AV_SCHEMA,
    build_avro_container,
    encode_long,
    walk_avro,
    zigzag_long,
)


def test_zigzag_spec_vectors():
    """The Avro spec's published long encoding table."""
    vectors = [
        (0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
        (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01"),
        (-65, b"\x81\x01"), (8192, b"\x80\x80\x01"),
    ]
    for v, enc in vectors:
        assert encode_long(v) == enc, v
        got, pos = zigzag_long(enc, 0)
        assert got == v and pos == len(enc)


def _inline_varint(v: int) -> bytes:
    """Independent zigzag-varint writer (test-local, different code
    path from the module's encode_long)."""
    u = (v << 1) ^ (v >> 127)  # fine for the small values used here
    if v < 0:
        u = ((-v) << 1) - 1
    out = b""
    while True:
        if u < 0x80:
            return out + bytes([u])
        out += bytes([0x80 | (u & 0x7F)])
        u >>= 7


def test_known_byte_container():
    """Assemble a 1-record null-codec file with a test-local writer
    and require byte equality with build_avro_container, then walk it."""
    sync = bytes(range(16))
    schema = _AV_SCHEMA.encode()
    body = (_inline_varint(1) + _inline_varint(2)
            + _inline_varint(2) + b"ab")
    expected = (
        b"Obj\x01"
        + _inline_varint(2)
        + _inline_varint(11) + b"avro.schema"
        + _inline_varint(len(schema)) + schema
        + _inline_varint(10) + b"avro.codec"
        + _inline_varint(4) + b"null"
        + _inline_varint(0)
        + sync
        + _inline_varint(1) + _inline_varint(len(body)) + body + sync
    )
    built = build_avro_container([(1, 2, "ab")], "null", sync)
    assert built == expected
    f = walk_avro(built)
    assert f["records"] == [(1, 2, "ab")]
    assert f["codec"] == "null" and f["n_blocks"] == 1
    assert f["fields"] == ["id", "val", "name"]


def test_negative_count_metadata_block():
    """The spec's skippable metadata form: negative entry count
    followed by a byte-size long."""
    sync = bytes(range(16))
    blob = bytearray(build_avro_container([(5, 6, "x")], "null", sync))
    # rewrite header: count 2 -> count -2 + size long
    schema = _AV_SCHEMA.encode()
    entries = (
        encode_long(11) + b"avro.schema"
        + encode_long(len(schema)) + schema
        + encode_long(10) + b"avro.codec" + encode_long(4) + b"null"
    )
    rebuilt = (
        b"Obj\x01" + encode_long(-2) + encode_long(len(entries))
        + entries + encode_long(0) + bytes(blob[blob.index(sync):])
    )
    f = walk_avro(rebuilt)
    assert f["records"] == [(5, 6, "x")]


def test_codec_battery_through_native_decoders():
    recs = [(i % 100, (i * i) % 1000, "n" + str(i % 37))
            for i in range(1234)]
    sync = bytes((7 * i + 1) % 256 for i in range(16))
    for codec in ("null", "deflate", "snappy", "bzip2", "xz",
                  "zstandard"):
        blob = build_avro_container(recs, codec, sync, block_records=300)
        f = walk_avro(blob)
        assert f["codec"] == codec
        assert f["n_blocks"] == 5
        assert f["records"] == recs, codec


def test_typed_quarantine():
    sync = bytes(range(16))
    recs = [(1, 2, "ab"), (3, 4, "cd")]
    blob = build_avro_container(recs, "snappy", sync)
    with pytest.raises(ValueError, match="magic"):
        walk_avro(b"NotAvro" + blob)
    with pytest.raises(NotImplementedError, match="lzo"):
        walk_avro(build_avro_container(recs, "null", sync,
                                       declared_codec="lzo"))
    bad = bytearray(blob)
    bad[-1] ^= 0x01  # final sync byte
    with pytest.raises(ValueError, match="sync marker mismatch"):
        walk_avro(bytes(bad))
    crc = bytearray(blob)
    crc[-17] ^= 0x01  # stored snappy CRC (last data byte before sync)
    with pytest.raises(ValueError, match="CRC"):
        walk_avro(bytes(crc))
    with pytest.raises(ValueError):
        walk_avro(blob[:-8])  # cut inside final sync
    # a block whose raw bytes outrun its declared record count
    extra = bytearray(build_avro_container([(1, 2, "ab")], "null", sync))
    # append one junk byte to the record body: count 1, size+1
    body = encode_long(1) + encode_long(2) + encode_long(2) + b"ab\x00"
    rebuilt = (bytes(extra[: extra.index(sync) + 16])
               + encode_long(1) + encode_long(len(body)) + body + sync)
    with pytest.raises(ValueError, match="beyond its records"):
        walk_avro(rebuilt)


def test_snappy_crc_is_spec_layout():
    """Pin the snappy block layout: compressed body + 4-byte
    big-endian CRC-32 of the UNCOMPRESSED bytes (Avro spec)."""
    sync = bytes(range(16))
    blob = build_avro_container([(9, 9, "zz")], "snappy", sync)
    # block data sits between the two sync markers
    start = blob.index(sync) + 16
    # skip count + size varints
    _, p = zigzag_long(blob, start)
    size, p = zigzag_long(blob, p)
    data = blob[p : p + size]
    raw = (encode_long(9) + encode_long(9) + encode_long(2) + b"zz")
    assert struct.unpack(">I", data[-4:])[0] == zlib.crc32(raw)


def test_fixture_truncation_always_fails_every_group():
    for g in range(_AV_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _AV_GROUPS
        with pytest.raises(ValueError):
            walk_avro(_av_payload(doc_id))


def test_schema_is_parsed_not_assumed():
    """A schema with reordered/extra fields drives the decode — prove
    the walker follows the JSON, not a hard-coded layout."""
    sync = bytes(range(16))
    schema = json.dumps({
        "type": "record", "name": "R",
        "fields": [
            {"name": "flag", "type": "boolean"},
            {"name": "score", "type": "double"},
            {"name": "tag", "type": "string"},
        ],
    }).encode()
    body = b"\x01" + struct.pack("<d", 2.5) + encode_long(3) + b"abc"
    blob = (
        b"Obj\x01" + encode_long(1)
        + encode_long(11) + b"avro.schema"
        + encode_long(len(schema)) + schema
        + encode_long(0) + sync
        + encode_long(1) + encode_long(len(body)) + body + sync
    )
    f = walk_avro(blob)
    assert f["fields"] == ["flag", "score", "tag"]
    assert f["records"] == [(True, 2.5, "abc")]
    assert f["codec"] == "null"  # absent avro.codec defaults to null


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "ingest_avro_container_walk"
    )


def test_schema_field_without_name_is_typed():
    """Fuzz-found (r12): a bit-flipped schema JSON can leave a field
    object missing 'name' — must be the typed ValueError, not a raw
    KeyError."""
    sync = bytes(range(16))
    for schema in (
        b'{"type":"record","name":"R","fields":[{"type":"long"}]}',
        b'{"type":"record","name":"R","fields":"oops"}',
        b'{"type":"record","name":"R","fields":[42]}',
    ):
        blob = (
            b"Obj\x01" + encode_long(1)
            + encode_long(11) + b"avro.schema"
            + encode_long(len(schema)) + schema
            + encode_long(0) + sync
            + encode_long(1) + encode_long(1) + b"\x02" + sync
        )
        with pytest.raises(ValueError):
            walk_avro(blob)


def test_null_record_count_bomb_is_typed():
    """A record whose only field is null-typed consumes ZERO body
    bytes, so a crafted block count cannot be bounded by the block
    size — the walk must cap it before sizing the decode loop."""
    import json as _json
    import time

    import pytest as _pytest

    from pyspark_postgres_loader_spark.operators.avrowalk import walk_avro

    schema = _json.dumps(
        {"type": "record", "name": "r",
         "fields": [{"name": "x", "type": "null"}]}
    ).encode()
    sync = bytes(range(16))
    blob = (
        b"Obj\x01"
        + _inline_varint(1)
        + _inline_varint(len(b"avro.schema")) + b"avro.schema"
        + _inline_varint(len(schema)) + schema
        + _inline_varint(0)
        + sync
        + _inline_varint(1 << 40) + _inline_varint(0) + sync
    )
    t0 = time.time()
    with _pytest.raises(ValueError, match="implausible"):
        walk_avro(blob)
    assert time.time() - t0 < 1.0
