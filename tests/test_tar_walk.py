"""ustar walk (WebDataset container): stdlib tarfile cross-validation
in BOTH directions, checksum/typeflag quarantine, oracle compare."""

from __future__ import annotations

import io
import tarfile

import pytest

from pyspark_postgres_loader_spark.operators.tarwalk import (
    _TAR_GROUPS,
    _tar_payload,
    build_tar_member,
    walk_tar_members,
)


def test_our_archive_is_valid_for_stdlib():
    p = (
        build_tar_member("a.txt", b"hello")
        + build_tar_member("b.bin", b"x" * 600)  # spans two data blocks
        + build_tar_member("d/", b"", typeflag=b"5")
        + b"\x00" * 1024
    )
    tf = tarfile.open(fileobj=io.BytesIO(p))
    names = [m.name for m in tf]
    assert names == ["a.txt", "b.bin", "d"]  # stdlib strips the dir slash
    assert tf.extractfile("a.txt").read() == b"hello"
    assert tf.extractfile("b.bin").read() == b"x" * 600
    assert walk_tar_members(p) == [
        ("a.txt", b"hello", "0"),
        ("b.bin", b"x" * 600, "0"),
        ("d/", b"", "5"),
    ]


def test_stdlib_archive_walks():
    """The walk must accept archives OUR encoder never produced."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as w:
        for name, data in (("s1.txt", b"stdlib!"), ("s2.json", b"{}")):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            w.addfile(info, io.BytesIO(data))
    got = walk_tar_members(buf.getvalue())
    assert [(n, c) for n, c, _t in got] == [
        ("s1.txt", b"stdlib!"), ("s2.json", b"{}"),
    ]


def test_typed_quarantine():
    p = build_tar_member("a.txt", b"data") + b"\x00" * 1024
    # corrupted checksum digit
    with pytest.raises(ValueError, match="CHECKSUM"):
        walk_tar_members(p[:148] + b"7" + p[149:])
    # PAX header typeflag (checksum fixed up so routing fires, not CRC)
    hdr = bytearray(p[:512])
    hdr[156] = ord("x")
    hdr[148:156] = b" " * 8
    hdr[148:156] = ("%06o" % sum(hdr)).encode() + b"\x00 "
    with pytest.raises(NotImplementedError, match="PAX"):
        walk_tar_members(bytes(hdr) + p[512:])
    # missing end-of-archive marker
    with pytest.raises(ValueError):
        walk_tar_members(p[:512])
    # lone zero block
    with pytest.raises(ValueError, match="lone zero block"):
        walk_tar_members(p[: len(p) - 512] + b"\x01" * 512)
    # non-octal size field
    bad = bytearray(p)
    bad[124:136] = b"zzzzzzzzzzz\x00"
    hdrb = bytearray(bad[:512])
    hdrb[148:156] = b" " * 8
    hdrb[148:156] = ("%06o" % sum(hdrb)).encode() + b"\x00 "
    with pytest.raises(ValueError, match="octal"):
        walk_tar_members(bytes(hdrb) + p[512:])


def test_fixture_truncation_always_fails_every_group():
    for g in range(_TAR_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _TAR_GROUPS
        with pytest.raises(ValueError):
            walk_tar_members(_tar_payload(doc_id))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "ingest_tar_member_walk")
