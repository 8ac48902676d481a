"""ZIP member walk (PKWARE APPNOTE): stdlib cross-validation in both
directions, CD/LH cross-check, typed quarantine, and the oracle
compare."""

from __future__ import annotations

import io
import struct
import zipfile

import pytest

from pyspark_postgres_loader_spark.operators.zipwalk import (
    _ZIP_GROUPS,
    _zip_members_of,
    _zip_payload,
    build_zip,
    walk_zip_members,
)


def test_stdlib_reads_our_archives():
    """Our container must be valid ZIP: the stdlib reader (an
    INDEPENDENT implementation) accepts it and returns identical
    content for every group."""
    for g in range(_ZIP_GROUPS):
        mem = _zip_members_of(g)
        zf = zipfile.ZipFile(io.BytesIO(build_zip(mem)))
        assert [i.filename for i in zf.infolist()] == [n for n, _, _ in mem]
        for name, content, _method in mem:
            assert zf.read(name) == content


def test_we_read_stdlib_archives():
    """The walk must also accept archives OUR builder never produced —
    stdlib zipfile output with its own header choices (nonzero
    timestamps, version fields), both methods, plus a comment after
    the EOCD (exercises the backwards signature scan)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", b"hello world" * 40,
                   compress_type=zipfile.ZIP_DEFLATED)
        z.writestr("b.bin", bytes(range(256)),
                   compress_type=zipfile.ZIP_STORED)
        z.comment = b"trailing archive comment"
    got = walk_zip_members(buf.getvalue())
    assert [(n, c) for n, c, _m in got] == [
        ("a.txt", b"hello world" * 40),
        ("b.bin", bytes(range(256))),
    ]
    assert [m for _n, _c, m in got] == [8, 0]


def test_typed_quarantine():
    blob = build_zip([("x.txt", b"payload bytes", 8)])
    cd_off = struct.unpack("<I", blob[-6:-2])[0]
    b = bytearray(blob)
    b[14] ^= 1  # LH crc only → copies disagree → mismatch
    with pytest.raises(ValueError, match="MISMATCH"):
        walk_zip_members(bytes(b))
    b = bytearray(blob)
    b[14] ^= 1
    b[cd_off + 16] ^= 1  # both copies → integrity check fires
    with pytest.raises(ValueError, match="CRC"):
        walk_zip_members(bytes(b))
    b = bytearray(blob)
    b[8] = 12
    b[cd_off + 10] = 12
    with pytest.raises(NotImplementedError, match="method 12"):
        walk_zip_members(bytes(b))
    with pytest.raises(ValueError):
        walk_zip_members(blob[:-5])  # inside the EOCD
    with pytest.raises(ValueError):
        walk_zip_members(blob[: len(blob) // 2])
    with pytest.raises(ValueError, match="signature"):
        walk_zip_members(b"not a zip at all" + b"\x00" * 30)


def test_cd_order_is_result_order():
    """Members come back in central-directory order, not local-header
    order — build an archive whose CD permutes the locals."""
    blob = bytearray(build_zip([("a", b"AA", 0), ("b", b"BBB", 0)]))
    cd_off = struct.unpack("<I", bytes(blob[-6:-2]))[0]
    cd = bytes(blob[cd_off:-22])
    # two fixed-size entries (46 + 1-byte name): swap them
    e0, e1 = cd[:47], cd[47:]
    swapped = bytes(blob[:cd_off]) + e1 + e0 + bytes(blob[-22:])
    names = [n for n, _c, _m in walk_zip_members(swapped)]
    assert names == ["b", "a"]


def test_fixture_truncation_always_fails_every_group():
    for g in range(_ZIP_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _ZIP_GROUPS
        with pytest.raises(ValueError):
            walk_zip_members(_zip_payload(doc_id))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "ingest_zip_member_walk")


def test_zip64_markers_are_typed_unsupported():
    """0xFFFF/0xFFFFFFFF EOCD sentinel values mean the real numbers
    live in an EOCD64 record — honestly out of scope, never
    misparsed as a tiny archive."""
    blob = bytearray(build_zip([("a.txt", b"data", 0)]))
    blob[-6:-2] = b"\xff\xff\xff\xff"  # cd_offset sentinel
    with pytest.raises(NotImplementedError, match="zip64"):
        walk_zip_members(bytes(blob))
    blob = bytearray(build_zip([("a.txt", b"data", 0)]))
    blob[-12:-10] = b"\xff\xff"  # total-entries sentinel
    with pytest.raises(NotImplementedError, match="zip64"):
        walk_zip_members(bytes(blob))
