"""ORC string columns: exact value + order recovery under BOTH V2
encodings (DIRECT_V2 length streams, DICTIONARY_V2 dictionary +
index), nullable strings under PRESENT, multibyte UTF-8, the
StringStatistics carried-twice check, typed verdicts, and the
oracle compare."""

from __future__ import annotations

import io

import pytest

from pyspark_postgres_loader_spark.operators.orcwalk import (
    _ENC_DICT_V2,
    _ENC_DIRECT_V2,
    _ORC_CODECS,
    _os_cols,
    _os_n,
    _os_payload,
    build_orc_strings,
    walk_orc,
)


def test_both_encodings_decode_exactly_across_codecs():
    for g in (0, 1, 4, 9):  # covers uncompressed/zlib/zstd codecs
        cols = _os_cols(g, _os_n(g))
        f = walk_orc(build_orc_strings(
            g, _ORC_CODECS[g % len(_ORC_CODECS)]))
        assert f["columns"][0] == cols["key"]
        assert f["columns"][1] == cols["s_dict"]
        assert f["columns"][2] == cols["s_uniq"]
        assert f["columns"][3] == cols["s_null"]
        # the fixture must force BOTH encodings, or the test is vacuous
        assert f["encodings"] == [[_ENC_DIRECT_V2], [_ENC_DICT_V2],
                                  [_ENC_DIRECT_V2], [_ENC_DICT_V2]]


def test_multibyte_utf8_lengths_are_bytes_not_chars():
    """ORC LENGTH streams count BYTES; a decoder that split on
    characters would misalign every subsequent value."""
    import pyarrow as pa
    import pyarrow.orc as orc

    vals = ["über", "naïve", "日本語テキスト", "a", "", "émoji🎉"] * 40
    t = pa.table({"s": pa.array(vals, pa.string())})
    buf = io.BytesIO()
    orc.write_table(t, buf, compression="zlib")
    assert walk_orc(buf.getvalue())["columns"][0] == vals


def test_empty_strings_and_all_null_string_column():
    import pyarrow as pa
    import pyarrow.orc as orc

    t = pa.table({
        "e": pa.array(["", "", "x", ""], pa.string()),
        "n": pa.array([None, None, None, None], pa.string()),
    })
    buf = io.BytesIO()
    orc.write_table(t, buf)
    f = walk_orc(buf.getvalue())
    assert f["columns"][0] == ["", "", "x", ""]
    assert f["columns"][1] == [None] * 4


def test_string_statistics_are_cross_checked():
    """Patch the footer StringStatistics sum for the DIRECT_V2 string
    column: the decoded total length disagrees and the walk must say
    so (carried-twice, like the integer stats)."""
    from pyspark_postgres_loader_spark.operators.orcwalk import (
        _grouped,
        _orc_chunks,
        _pb_build,
        _pb_fields,
        _retail,
    )

    data = build_orc_strings(0, "zlib")
    ps_len = data[-1]
    ps_fields = _pb_fields(data[len(data) - 1 - ps_len : len(data) - 1])
    psd = _grouped(ps_fields)
    kind = psd[2][0]
    flen = psd[1][0]
    fstart = len(data) - 1 - ps_len - flen
    footer = _pb_fields(_orc_chunks(data[fstart : fstart + flen], kind))
    # ColumnStatistics is footer field 7; entry index 3 is s_uniq
    # (root, key, s_dict, s_uniq, s_null); StringStatistics is its
    # field 4 and sum-of-lengths its sint64 field 3
    seen = 0
    patched = []
    for f, v in footer:
        if f == 7:
            if seen == 3:
                cs = _pb_fields(v)
                cs2 = []
                for f2, v2 in cs:
                    if f2 == 4:
                        ss = _pb_fields(v2)
                        v2 = _pb_build(
                            [(f3, v3 + 2 if f3 == 3 else v3)
                             for f3, v3 in ss])
                    cs2.append((f2, v2))
                v = _pb_build(cs2)
            seen += 1
        patched.append((f, v))
    blob = _retail(data, _pb_build(patched), kind, ps_fields, fstart)
    with pytest.raises(ValueError, match="statistics mismatch"):
        walk_orc(blob)


def test_dictionary_size_consistency_is_checked():
    """Shrink the first stripe's ColumnEncoding.dictionarySize for
    s_dict by one (in place — uncompressed stripe footer, same
    varint width): the LENGTH run still carries 13 entries, so the
    walk must refuse the disagreement instead of silently indexing a
    reshaped dictionary."""
    from pyspark_postgres_loader_spark.operators.orcwalk import (
        _grouped,
        _pb_build,
        _pb_fields,
    )

    data = bytearray(build_orc_strings(0, "uncompressed"))
    ps_len = data[-1]
    end = len(data) - 1 - ps_len
    ps = _grouped(_pb_fields(bytes(data[end : len(data) - 1])))
    assert ps.get(2, [0])[0] == 0  # uncompressed → footers in plain pb
    flen = ps[1][0]
    footer = _grouped(_pb_fields(bytes(data[end - flen : end])))
    si = _grouped(_pb_fields(footer[3][0]))  # first stripe
    sf_start = si[1][0] + si[2][0] + si[3][0]
    sflen = si[4][0]
    sfields = _pb_fields(bytes(data[sf_start : sf_start + sflen]))
    seen = 0
    out = []
    for f, v in sfields:
        if f == 2:  # ColumnEncoding; index 2 is s_dict
            if seen == 2:
                ce = _pb_fields(v)
                v = _pb_build(
                    [(ff, vv - 1 if ff == 2 else vv) for ff, vv in ce])
            seen += 1
        out.append((f, v))
    new = _pb_build(out)
    assert len(new) == sflen  # 13 → 12 keeps the varint width
    data[sf_start : sf_start + sflen] = new
    with pytest.raises(ValueError, match="dictionary size"):
        walk_orc(bytes(data))


def test_typed_verdicts():
    with pytest.raises(ValueError):
        walk_orc(_os_payload(3))                   # postscript cut
    with pytest.raises(ValueError, match="row count mismatch"):
        walk_orc(_os_payload(2))                   # footer rows +1
    with pytest.raises(NotImplementedError, match="type kind 8"):
        walk_orc(_os_payload(5))                   # BINARY column


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "ingest_orc_string_walk")


def test_temporal_decimal_decode_exactly():
    """TIMESTAMP/DATE/DECIMAL round-trip vs pyarrow: all four
    trailing-zero nano classes, negative days, nullable dates,
    negative unscaled decimals."""
    from pyspark_postgres_loader_spark.operators.orcwalk import (
        _ot_cols,
        _ot_n,
        build_orc_temporal,
    )

    for g in (0, 4, 9):
        cols = _ot_cols(g, _ot_n(g))
        f = walk_orc(build_orc_temporal(
            g, _ORC_CODECS[g % len(_ORC_CODECS)]))
        assert f["columns"][0] == cols["ts"]
        assert f["columns"][1] == cols["d"]
        assert f["columns"][2] == cols["dec"]


def test_temporal_typed_verdicts():
    from pyspark_postgres_loader_spark.operators.orcwalk import (
        _ot_payload,
    )

    with pytest.raises(ValueError):
        walk_orc(_ot_payload(3))
    with pytest.raises(ValueError, match="row count mismatch"):
        walk_orc(_ot_payload(2))
    with pytest.raises(NotImplementedError, match="type kind 8"):
        walk_orc(_ot_payload(5))


def test_decimal_scale_is_carried_twice():
    """The per-value SECONDARY scale run must agree with the type's
    declared scale — patch the DECLARED scale (Type field 6) from 2
    to 3 through the footer-rebuild machinery and the walk must
    refuse the disagreement."""
    from pyspark_postgres_loader_spark.operators.orcwalk import (
        _grouped,
        _orc_chunks,
        _pb_build,
        _pb_fields,
        _retail,
        build_orc_temporal,
    )

    data = build_orc_temporal(0, "uncompressed")
    ps_len = data[-1]
    ps_fields = _pb_fields(data[len(data) - 1 - ps_len : len(data) - 1])
    psd = _grouped(ps_fields)
    kind = psd.get(2, [0])[0]
    flen = psd[1][0]
    fstart = len(data) - 1 - ps_len - flen
    footer = _pb_fields(_orc_chunks(data[fstart : fstart + flen], kind))
    out, seen = [], 0
    for f, v in footer:
        if f == 4:
            seen += 1
            if seen == 4:  # root, ts, d, dec
                tf = _pb_fields(v)
                v = _pb_build(
                    [(ff, 3 if ff == 6 else vv) for ff, vv in tf])
        out.append((f, v))
    blob = _retail(data, _pb_build(out), kind, ps_fields, fstart)
    with pytest.raises(ValueError, match="scale disagrees"):
        walk_orc(blob)


def test_temporal_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "ingest_orc_temporal_walk")


def test_list_columns_decode_exactly():
    """list<float32> (the embeddings shape): NULL lists, empty lists,
    NULL elements, exact float values, across codecs."""
    from pyspark_postgres_loader_spark.operators.orcwalk import (
        _ol_lists,
        _ol_n,
        build_orc_list,
    )

    for g in (0, 3, 9):
        f = walk_orc(build_orc_list(
            g, _ORC_CODECS[g % len(_ORC_CODECS)]))
        assert f["columns"][0] == list(range(_ol_n(g)))
        assert f["columns"][1] == _ol_lists(g)


def test_list_typed_verdicts():
    from pyspark_postgres_loader_spark.operators.orcwalk import (
        _ol_payload,
    )

    with pytest.raises(ValueError):
        walk_orc(_ol_payload(3))
    with pytest.raises(ValueError, match="row count mismatch"):
        walk_orc(_ol_payload(2))
    with pytest.raises(NotImplementedError, match="list element kind 8"):
        walk_orc(_ol_payload(5))


def test_list_of_long_and_deep_nesting_boundary():
    import pyarrow as pa
    import pyarrow.orc as orc

    t = pa.table({"l": pa.array([[1, None, 3], [], None],
                                pa.list_(pa.int64()))})
    buf = io.BytesIO()
    orc.write_table(t, buf, compression="zstd")
    assert walk_orc(buf.getvalue())["columns"][0] == [
        [1, None, 3], [], None]
    # list<list<...>> stays a typed boundary
    t2 = pa.table({"ll": pa.array([[[1]], [[2, 3]]],
                                  pa.list_(pa.list_(pa.int64())))})
    buf2 = io.BytesIO()
    orc.write_table(t2, buf2)
    with pytest.raises(NotImplementedError, match="list element kind"):
        walk_orc(buf2.getvalue())


def test_flat_float_double_columns_decode():
    import pyarrow as pa
    import pyarrow.orc as orc

    fv = [0.25, None, -1.5, 3.75]
    dv = [1e-3, 2.5, None, -0.125]
    t = pa.table({"f": pa.array(fv, pa.float32()),
                  "d": pa.array(dv, pa.float64())})
    buf = io.BytesIO()
    orc.write_table(t, buf, compression="snappy")
    f = walk_orc(buf.getvalue())
    assert f["columns"][0] == fv
    assert f["columns"][1] == dv


def test_list_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "ingest_orc_list_walk")
