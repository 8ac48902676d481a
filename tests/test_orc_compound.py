"""ORC MAP / STRUCT compound-type walks: pyarrow cross-validation
across codecs and stripe splits, nullable weave semantics (null
struct / null field / null map / empty map / null value), typed
verdicts, and the footer-length closure added alongside."""

from __future__ import annotations

import io

import pytest

from pyspark_postgres_loader_spark.operators.orcwalk import (
    _om_maps,
    _om_n,
    _om_payload,
    _ost_n,
    _ost_payload,
    _ost_structs,
    build_orc_map,
    build_orc_struct,
    walk_orc,
)


def test_map_walk_matches_fixture_every_group():
    for g in range(4):
        codec = ("uncompressed", "zlib", "snappy", "zstd")[g]
        f = walk_orc(build_orc_map(g, codec))
        assert f["columns"][0] == list(range(_om_n(g)))
        assert f["columns"][1] == _om_maps(g)


def test_struct_walk_matches_fixture_every_group():
    for g in range(4):
        codec = ("uncompressed", "zlib", "lz4", "zstd")[g]
        f = walk_orc(build_orc_struct(g, codec))
        exp = [
            None if st is None else (st["a"], st["b"], st["s"])
            for st in _ost_structs(g)
        ]
        assert f["columns"][1] == exp


def test_map_typed_classes():
    with pytest.raises(ValueError):
        walk_orc(_om_payload(3))  # corrupt: postscript cut
    with pytest.raises(ValueError, match="row count mismatch"):
        walk_orc(_om_payload(2))  # mismatch: footer rows+1
    with pytest.raises(NotImplementedError, match="map value kind"):
        walk_orc(_om_payload(18))  # unsupported: value -> BINARY


def test_struct_typed_classes():
    with pytest.raises(ValueError):
        walk_orc(_ost_payload(3))
    with pytest.raises(ValueError, match="row count mismatch"):
        walk_orc(_ost_payload(2))
    with pytest.raises(NotImplementedError, match="struct field kind"):
        walk_orc(_ost_payload(18))


def test_union_walk_matches_fixture_every_group():
    from pyspark_postgres_loader_spark.operators.orcwalk import (
        _ou_n,
        _ou_rows,
        build_orc_union,
    )

    for g in range(4):
        codec = ("uncompressed", "zlib", "snappy", "zstd")[g]
        f = walk_orc(build_orc_union(g, codec))
        assert f["columns"][0] == list(range(_ou_n(g)))
        assert f["columns"][1] == _ou_rows(g)


def test_union_typed_classes():
    from pyspark_postgres_loader_spark.operators.orcwalk import (
        _ou_payload,
    )

    with pytest.raises(ValueError):
        walk_orc(_ou_payload(3))
    with pytest.raises(ValueError, match="row count mismatch"):
        walk_orc(_ou_payload(2))
    with pytest.raises(NotImplementedError, match="union variant kind"):
        walk_orc(_ou_payload(18))


def test_union_multi_stripe_tag_weave_restarts():
    from pyspark_postgres_loader_spark.operators.orcwalk import (
        _ou_rows,
        build_orc_union,
    )

    f = walk_orc(build_orc_union(0, "uncompressed"))
    assert f["n_stripes"] > 1
    assert f["columns"][1] == _ou_rows(0)


def test_multi_stripe_compound_weave():
    # small stripes force >1 stripe; the weave must restart cleanly
    f = walk_orc(build_orc_map(0, "uncompressed"))
    assert f["n_stripes"] > 1
    assert f["columns"][1] == _om_maps(0)


def test_column_shorter_than_footer_rows_is_typed():
    # a primitive column whose stripes carry neither PRESENT nor DATA
    # must fail the decoded-rows-vs-numberOfRows closure, not decode
    # short (advisory, round 14)
    import pyarrow as pa
    import pyarrow.orc as orc

    from pyspark_postgres_loader_spark.operators.orcwalk import (
        _grouped,
        _orc_chunks,
        _pb_build,
        _pb_fields,
        _retail,
    )

    t = pa.table({"v": pa.array(range(100), pa.int64())})
    buf = io.BytesIO()
    orc.write_table(t, buf, compression="uncompressed")
    data = buf.getvalue()
    ps_len = data[-1]
    ps_fields = _pb_fields(data[len(data) - 1 - ps_len:len(data) - 1])
    psd = _grouped(ps_fields)
    kind = psd.get(2, [0])[0]
    footer_len = psd[1][0]
    footer_start = len(data) - 1 - ps_len - footer_len
    footer = _pb_fields(_orc_chunks(
        data[footer_start:footer_start + footer_len], kind))

    # drop every stream record from the stripe footer so column 1 has
    # neither PRESENT nor DATA, keeping stripe/footer row counts
    stripe_msgs = [v for f2, v in footer if f2 == 3]
    assert stripe_msgs
    si = _grouped(_pb_fields(stripe_msgs[0]))
    off, ilen, dlen, sflen = si[1][0], si[2][0], si[3][0], si[4][0]
    sfoot = _pb_fields(_orc_chunks(
        data[off + ilen + dlen:off + ilen + dlen + sflen], kind))
    assert kind == 0  # uncompressed: stream bodies are raw bytes
    new_sfoot = _pb_build([(f2, v) for f2, v in sfoot if f2 != 1])
    patched_stripe = _pb_build([
        (f2, len(new_sfoot) if f2 == 4 else v)
        for f2, v in _pb_fields(stripe_msgs[0])
    ])
    body = data[:off + ilen + dlen] + new_sfoot
    new_footer = _pb_build([
        (f2, patched_stripe if f2 == 3 else v) for f2, v in footer
    ])
    blob = _retail(body, new_footer, kind, ps_fields, len(body))
    # the walk must raise the typed closure error (silently-skipped
    # column shorter than numberOfRows), not return short columns
    with pytest.raises(ValueError):
        walk_orc(blob)
