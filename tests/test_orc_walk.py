"""ORC walk: RLEv2 spec vectors, pyarrow (ORC C++) golden battery
across all five compression kinds, multi-stripe layout, both
carried-twice integrity checks, typed quarantine non-vacuity, and the
oracle compare."""

from __future__ import annotations

import io

import pytest

from pyspark_postgres_loader_spark.operators.orcwalk import (
    _ORC_GROUPS,
    _grouped,
    _orc_chunks,
    _orc_cols,
    _orc_n,
    _orc_payload,
    _pb_build,
    _pb_fields,
    _retail,
    build_orc,
    rlev2_decode,
    walk_orc,
)


def test_rlev2_spec_vectors():
    """The ORC v1 spec's published worked examples (unsigned)."""
    # short repeat: 10000 × 5
    assert rlev2_decode(bytes.fromhex("0a2710"), signed=False) == [10000] * 5
    # direct: [23713, 43806, 57005, 48879]
    assert rlev2_decode(
        bytes.fromhex("5e035ca1ab1edeadbeef"), signed=False
    ) == [23713, 43806, 57005, 48879]
    # delta: the first ten primes
    assert rlev2_decode(
        bytes.fromhex("c609020222424246"), signed=False
    ) == [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]


def test_rlev2_signed_zigzag():
    """Signed streams zigzag SHORT_REPEAT/DIRECT literals and the
    DELTA base; assembled by hand from the spec rules."""
    # short repeat of -3 (zigzag 5) × 4
    assert rlev2_decode(bytes((0x01, 0x05)), signed=True) == [-3] * 4
    # fixed-delta run: base -10, delta +2, length 5
    # header: enc=3, width code 0, len-1=4 → 0xc0 0x04; base zz(-10)=19,
    # delta zz(2)=4
    assert rlev2_decode(bytes((0xC0, 0x04, 0x13, 0x04)), signed=True) == [
        -10, -8, -6, -4, -2,
    ]


@pytest.mark.parametrize(
    "codec", ["uncompressed", "zlib", "snappy", "lz4", "zstd"]
)
def test_pyarrow_golden_all_codecs(codec):
    """pyarrow's independent C++ writer produces the file; our walk
    must reproduce every value of all five RLEv2-shaped columns."""
    g = 3
    f = walk_orc(build_orc(g, codec))
    n = _orc_n(g)
    assert f["n_rows"] == n
    assert f["n_cols"] == 5
    for (name, exp), got in zip(_orc_cols(g, n).items(), f["columns"]):
        assert got == exp, (codec, name)


def test_multi_stripe_layout_is_exercised():
    """The 4 KiB stripe budget must split the fixture so the stripe
    chain (per-stripe footers, stream cursors) is a live code path."""
    f = walk_orc(build_orc(0, "zlib"))
    assert f["n_stripes"] >= 2


def test_patched_base_and_negatives_against_pyarrow():
    """Adversarial value shapes: random walk with negatives, huge
    outliers at irregular gaps (forces PATCHED_BASE patch lists with
    multi-entry gaps), and a constant column."""
    import pyarrow as pa
    import pyarrow.orc as orc

    n = 4000
    x = 0
    walkv = []
    for i in range(n):
        x += ((i * 2654435761) % 401) - 200
        walkv.append(x)
    outl = [(-(10 ** 12) if i % 503 == 11 else i % 19 - 9)
            for i in range(n)]
    cols = {"w": walkv, "o": outl, "k": [42] * n}
    t = pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})
    buf = io.BytesIO()
    orc.write_table(t, buf, compression="zstd", stripe_size=8192,
                    compression_block_size=1024)
    f = walk_orc(buf.getvalue())
    for (name, exp), got in zip(cols.items(), f["columns"]):
        assert got == exp, name


def test_verdict_classes_are_non_vacuous():
    expected = {"decoded": 0, "corrupt": 0, "mismatch": 0,
                "unsupported": 0}
    for doc in range(240):
        g = doc % _ORC_GROUPS
        corrupt = doc % 11 == 3
        mism = doc % 17 == 2 and not corrupt
        unsup = doc % 13 == 5 and not (corrupt or mism)
        want = ("corrupt" if corrupt else "mismatch" if mism
                else "unsupported" if unsup else "decoded")
        try:
            f = walk_orc(_orc_payload(doc))
            got = "decoded"
            assert f["n_rows"] == _orc_n(g)
        except NotImplementedError:
            got = "unsupported"
        except ValueError as exc:
            got = ("mismatch" if "row count mismatch" in str(exc)
                   else "corrupt")
        assert got == want, (doc, got, want)
        expected[want] += 1
    assert min(expected.values()) > 0, expected


def test_footer_statistics_cross_check_fires():
    """Patch the sum inside column a's IntegerStatistics — the walk
    must reject the file even though every stream decodes cleanly."""
    data = build_orc(1, "zlib")
    ps_len = data[-1]
    ps_fields = _pb_fields(data[len(data) - 1 - ps_len : len(data) - 1])
    psd = _grouped(ps_fields)
    kind = psd[2][0]
    flen = psd[1][0]
    fstart = len(data) - 1 - ps_len - flen
    footer = _pb_fields(_orc_chunks(data[fstart : fstart + flen], kind))
    seen = 0
    patched = []
    for fld, v in footer:
        if fld == 7:
            seen += 1
            if seen == 2:  # stats for column 1 ('a'); entry 1 is root
                cs = _pb_fields(v)
                cs2 = []
                for f2, v2 in cs:
                    if f2 == 2:
                        ints = _pb_fields(v2)
                        ints = [(f3, v3 + 2 if f3 == 3 else v3)
                                for f3, v3 in ints]
                        v2 = _pb_build(ints)
                    cs2.append((f2, v2))
                v = _pb_build(cs2)
        patched.append((fld, v))
    blob = _retail(data, _pb_build(patched), kind, ps_fields, fstart)
    with pytest.raises(ValueError, match="statistics mismatch"):
        walk_orc(blob)


def test_string_column_decodes_and_exotic_kinds_stay_typed():
    """Strings were the typed 'unsupported' boundary until r14 —
    both V2 encodings now decode (test_orc_strings.py is the full
    fixture; this pins the minimal case), timestamp/date/decimal
    decode too (test_orc_strings.py temporal tests), and the
    boundary is only the genuinely exotic kinds (BINARY here)."""
    import pyarrow as pa
    import pyarrow.orc as orc

    t = pa.table({"s": pa.array(["x", "y", "z"])})
    buf = io.BytesIO()
    orc.write_table(t, buf)
    assert walk_orc(buf.getvalue())["columns"][0] == ["x", "y", "z"]

    t2 = pa.table({"b": pa.array([b"\x00", b"\x01"], pa.binary())})
    buf2 = io.BytesIO()
    orc.write_table(t2, buf2)
    with pytest.raises(NotImplementedError, match="type kind 8"):
        walk_orc(buf2.getvalue())


def test_nullable_column_decodes():
    """Was the typed 'unsupported' boundary until r13 — PRESENT
    streams now decode (ingest_orc_nullable_walk is the full
    fixture; this pins the minimal case)."""
    import pyarrow as pa
    import pyarrow.orc as orc

    t = pa.table({"v": pa.array([1, None, 3], pa.int64())})
    buf = io.BytesIO()
    orc.write_table(t, buf)
    assert walk_orc(buf.getvalue())["columns"][0] == [1, None, 3]


def test_lzo_kind_is_typed_unsupported():
    doc = None
    for d in range(200):
        if d % 13 == 5 and d % 11 != 3 and d % 17 != 2:
            doc = d
            break
    with pytest.raises(NotImplementedError, match="lzo"):
        walk_orc(_orc_payload(doc))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "ingest_orc_walk")


def test_tail_splice_errors_are_typed_at_fixed_offsets():
    """Deterministic pin of the round-12 wrapper: a varint-bomb run
    spliced into the ORC tail flips protobuf wire types, so fields
    the walk expects as varints/submessages arrive as bytes/ints —
    every such outcome must surface as ValueError /
    NotImplementedError, never a raw TypeError (campaign-fuzz
    finding, round 12)."""
    import pytest as _pytest

    from pyspark_postgres_loader_spark.operators.orcwalk import (
        build_orc,
        walk_orc,
    )

    blob = build_orc(1, "zlib")
    for back in range(8, 120, 7):
        b = blob[: len(blob) - back] + b"\xff" * 8 + b"\x01" + blob[len(blob) - back :]
        try:
            walk_orc(b)
        except (ValueError, NotImplementedError):
            pass
        # any other exception type propagates and fails the test
