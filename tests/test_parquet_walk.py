"""Native parquet walk: pyarrow cross-validation, thrift reader
behavior, RLE level decoding, page-CRC reality check, typed
quarantine, and the oracle compare."""

from __future__ import annotations

import math
import struct

import pytest

from pyspark_postgres_loader_spark.operators.parquetwalk import (
    _PQ_GROUPS,
    _PQ_ROWGROUP,
    _pq_bytes,
    _pq_payload,
    _pq_values,
    _read_rle_levels,
    _TReader,
    walk_parquet,
)


def test_walk_matches_pyarrow_output_every_group():
    """pyarrow writes (snappy / uncompressed / gzip by group), we
    read: values, row-group count and page count must all match the
    design — and pyarrow's own metadata reader agrees with ours."""
    import io

    import pyarrow.parquet as pq

    for g in range(_PQ_GROUPS):
        blob = _pq_bytes(g)
        f = walk_parquet(blob)
        want = _pq_values(g)
        assert f["values"] == want
        assert f["num_rows"] == len(want)
        assert f["n_row_groups"] == math.ceil(len(want) / _PQ_ROWGROUP)
        assert f["n_pages"] == f["n_row_groups"]
        meta = pq.ParquetFile(io.BytesIO(blob)).metadata
        assert meta.num_rows == f["num_rows"]
        assert meta.num_row_groups == f["n_row_groups"]


def test_walk_handles_required_column_too():
    """A non-nullable field writes NO definition levels — the other
    branch of the level logic."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = list(range(500))
    schema = pa.schema([pa.field("v", pa.int64(), nullable=False)])
    t = pa.table({"v": pa.array(vals, type=pa.int64())}, schema=schema)
    buf = pa.BufferOutputStream()
    pq.write_table(
        t, buf, use_dictionary=False, compression="none",
        data_page_version="1.0", write_statistics=False,
        write_page_checksum=True,
    )
    f = walk_parquet(buf.getvalue().to_pybytes())
    assert f["values"] == vals


def test_rle_level_decoder():
    # RLE run: header (8<<1)|0 = 16, value width 1 byte
    body = bytes([16, 1])
    raw = struct.pack("<I", len(body)) + body
    levels, used = _read_rle_levels(raw, 8, 1)
    assert levels == [1] * 8 and used == 4 + len(body)
    # bit-packed run: header (1<<1)|1 = 3, one group of 8 1-bit values
    body = bytes([3, 0b10110101])
    raw = struct.pack("<I", len(body)) + body
    levels, _ = _read_rle_levels(raw, 8, 1)
    assert levels == [1, 0, 1, 0, 1, 1, 0, 1]


def test_page_crc_verification_is_real():
    """The crc_error fixture flips a PAGE BODY byte while the stored
    CRC stays intact — only real verification can notice."""
    doc_id = 2
    assert doc_id % 17 == 2
    with pytest.raises(ValueError, match="CRC"):
        walk_parquet(_pq_payload(doc_id))


def test_typed_quarantine():
    blob = _pq_bytes(0)
    with pytest.raises(ValueError, match="magic"):
        walk_parquet(blob[:-4] + b"XXXX")
    with pytest.raises(ValueError, match="magic"):
        walk_parquet(b"JUNK" + blob[4:])
    with pytest.raises(ValueError):
        walk_parquet(blob[:-6])
    doc_id = 5
    assert doc_id % 13 == 5
    with pytest.raises(NotImplementedError, match="codec"):
        walk_parquet(_pq_payload(doc_id))  # brotli group
    # dictionary-encoded chunks are honestly out of scope
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"v": pa.array([1, 1, 2, 2] * 100, type=pa.int64())})
    buf = pa.BufferOutputStream()
    pq.write_table(t, buf, use_dictionary=True, compression="none")
    with pytest.raises(NotImplementedError, match="dictionary"):
        walk_parquet(buf.getvalue().to_pybytes())


def test_fixture_truncation_always_fails_every_group():
    for g in range(_PQ_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _PQ_GROUPS
        with pytest.raises(ValueError):
            walk_parquet(_pq_payload(doc_id))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "ingest_parquet_native_walk"
    )


# ---------------------------------------------------------------- caps

def _compact_i32(fid_delta: int, v: int) -> bytes:
    """Thrift-compact short-form i32 field: header + zigzag varint."""
    out = [bytes([(fid_delta << 4) | 5])]
    z = v << 1 if v >= 0 else ((-v) << 1) - 1
    while True:
        b = z & 0x7F
        z >>= 7
        out.append(bytes([b | 0x80]) if z else bytes([b]))
        if not z:
            return b"".join(out)


def crafted_page_header(num_values: int) -> bytes:
    """A hand-encoded PageHeader{type=DATA, sizes=0} whose
    DataPageHeader carries an attacker-controlled num_values and
    PLAIN encodings everywhere."""
    dph = (_compact_i32(1, num_values)   # 1: num_values
           + _compact_i32(1, 0)          # 2: encoding = PLAIN
           + _compact_i32(1, 3)          # 3: def level enc = RLE
           + _compact_i32(1, 3)          # 4: rep level enc = RLE
           + b"\x00")
    return (_compact_i32(1, 0)           # 1: type = DATA_PAGE
            + _compact_i32(1, 0)         # 2: uncompressed_size
            + _compact_i32(1, 0)         # 3: compressed_size
            + bytes([(2 << 4) | 12])     # 5: DataPageHeader (struct)
            + dph + b"\x00")


def _first_page_offset(blob: bytes) -> int:
    import struct as _s

    flen = _s.unpack_from("<I", blob, len(blob) - 8)[0]
    meta = _TReader(blob, len(blob) - 8 - flen).read_struct()
    return meta[4][0][1][0][3][9]  # row_groups[0].columns[0].meta.data_page_offset


def test_implausible_value_count_is_typed_not_oom():
    """ADVICE r12: a crafted page header carrying a huge num_values
    varint must raise the typed ValueError BEFORE sizing any level
    decode or unpack — not allocate its way to a MemoryError."""
    blob = bytearray(_pq_bytes(0))
    off = _first_page_offset(bytes(blob))
    hdr = crafted_page_header(1 << 40)
    blob[off : off + len(hdr)] = hdr  # in-place splice, footer intact
    with pytest.raises(ValueError, match="implausible"):
        walk_parquet(bytes(blob))
