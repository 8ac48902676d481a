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
    # GNU sparse typeflag (checksum fixed up so routing fires, not
    # CRC) — pax/'L' graduated to decoded, sparse is the boundary now
    hdr = bytearray(p[:512])
    hdr[156] = ord("S")
    hdr[148:156] = b" " * 8
    hdr[148:156] = ("%06o" % sum(hdr)).encode() + b"\x00 "
    with pytest.raises(NotImplementedError, match="typeflag"):
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


def test_pax_records_roundtrip_and_typed_errors():
    from pyspark_postgres_loader_spark.operators.tarwalk import (
        encode_pax_records,
        parse_pax_records,
    )

    recs = {"path": "x" * 300, "size": "12345", "comment": "héllo"}
    assert parse_pax_records(encode_pax_records(recs)) == recs
    # the self-including-length fixed point: lengths 9/10/99/100 edges
    for n in (1, 2, 84, 85, 86, 990, 991):
        r = {"k": "v" * n}
        assert parse_pax_records(encode_pax_records(r)) == r
    import pytest as _pt

    with _pt.raises(ValueError, match="length"):
        parse_pax_records(b"999 path=x\n")
    with _pt.raises(ValueError, match="newline"):
        parse_pax_records(b"10 path=abc")
    with _pt.raises(ValueError, match="'='"):
        parse_pax_records(b"8 pathx\n")


def test_pax_size_override_is_live():
    """A header-size-0 member under a pax size record walks correctly;
    dropping the pax header provably misaligns — the override is load-
    bearing, not decorative."""
    from pyspark_postgres_loader_spark.operators.tarwalk import (
        _build_member_raw,
        encode_pax_records,
    )

    content = bytes(range(200))
    pax = _build_member_raw(
        "./PaxHeaders/a", encode_pax_records({"size": "200"}), b"x"
    )
    member = _build_member_raw("a.bin", content, b"0", header_size=0)
    tail = build_tar_member("b.txt", b"ok") + b"\x00" * 1024
    got = walk_tar_members(pax + member + tail)
    assert [(n, c) for n, c, _t in got] == [("a.bin", content),
                                           ("b.txt", b"ok")]
    with pytest.raises(Exception):
        walk_tar_members(member + tail)  # no override -> misaligned


def test_stdlib_pax_archive_walks():
    """GNU/pax archives produced by the stdlib writer (an INDEPENDENT
    implementation) decode with the overridden long names applied."""
    import io
    import tarfile

    for fmt in (tarfile.PAX_FORMAT, tarfile.GNU_FORMAT):
        buf = io.BytesIO()
        long_name = "d/" + "n" * 150 + ".txt"
        with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
            info = tarfile.TarInfo(long_name)
            info.size = 11
            tf.addfile(info, io.BytesIO(b"hello world"))
        got = walk_tar_members(buf.getvalue())
        assert got == [(long_name, b"hello world", "0")], fmt


def test_pax_fixture_groups_and_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "ingest_tar_pax_walk")
