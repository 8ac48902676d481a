"""Parquet DataPageV2 + delta-encoding walk: pyarrow
cross-validation, DELTA_BINARY_PACKED / DELTA_BYTE_ARRAY decoder
behavior on hand-assembled runs, typed quarantine, and the oracle
compare."""

from __future__ import annotations

import math

import pytest

from pyspark_postgres_loader_spark.operators.parquetv2 import (
    _V2_GROUPS,
    _V2_ROWGROUP,
    _v2_bytes,
    _v2_ints,
    _v2_payload,
    _v2_words,
    delta_binary_packed,
    delta_byte_array,
    walk_parquet_v2,
)


def _zz_enc(v: int) -> bytes:
    u = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _uleb_enc(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_walk_matches_pyarrow_output_every_group():
    """pyarrow writes v2 delta pages (none/snappy/gzip by group), we
    read: both columns, row-group and page counts must all match the
    design — and pyarrow's own metadata reader agrees with ours."""
    import io

    import pyarrow.parquet as pq

    for g in range(_V2_GROUPS):
        blob = _v2_bytes(g)
        f = walk_parquet_v2(blob)
        assert f["ints"] == _v2_ints(g)
        assert [int(s[3:]) for s in f["strs"]] == _v2_words(g)
        rg = math.ceil(len(f["ints"]) / _V2_ROWGROUP)
        assert f["n_row_groups"] == rg
        assert f["n_pages"] == 2 * rg
        meta = pq.ParquetFile(io.BytesIO(blob)).metadata
        assert meta.num_rows == len(f["ints"])
        assert meta.num_row_groups == rg
        # the fixture really is delta-encoded (not dictionary/plain)
        encs = meta.row_group(0).column(0).encodings
        assert "DELTA_BINARY_PACKED" in encs
        assert "DELTA_BYTE_ARRAY" in meta.row_group(0).column(1).encodings


def test_delta_binary_packed_hand_assembled():
    """Spec-shaped run assembled by hand: block=8, 1 miniblock,
    5 values, first=100, min_delta=-2, widths byte 2, packed deltas
    (3,0,1,2) LSB-first → 100,101,99,98,98; padding consumed."""
    payload = (
        _uleb_enc(8) + _uleb_enc(1) + _uleb_enc(5) + _zz_enc(100)
        + _zz_enc(-2) + bytes([2])
        + bytes([0b10010011, 0])  # 8×2-bit LSB-first slots: 3,0,1,2,0…
    )
    vals, pos = delta_binary_packed(payload)
    assert vals == [100, 101, 99, 98, 98]
    assert pos == len(payload)


def test_delta_binary_packed_bw_zero_and_negatives():
    """A constant-step descending run bit-packs to width 0: only the
    header + min_delta + width byte are stored."""
    payload = (
        _uleb_enc(8) + _uleb_enc(1) + _uleb_enc(4) + _zz_enc(-5)
        + _zz_enc(-3) + bytes([0])
    )
    vals, pos = delta_binary_packed(payload)
    assert vals == [-5, -8, -11, -14]
    assert pos == len(payload)


def test_delta_binary_packed_trailing_miniblocks_omitted():
    """4 miniblocks of 8 in the block geometry but only 3 values: the
    writer omits miniblocks 2-4 entirely; the reader must not demand
    their bytes."""
    payload = (
        _uleb_enc(32) + _uleb_enc(4) + _uleb_enc(3) + _zz_enc(0)
        + _zz_enc(1) + bytes([0, 7, 7, 7])  # junk widths for omitted blocks
    )
    vals, pos = delta_binary_packed(payload)
    assert vals == [0, 1, 2]
    assert pos == len(payload)


def test_delta_byte_array_hand_assembled():
    """prefix lengths (0,3,5) + suffix lengths (5,2,1) + suffix bytes
    'helloper' reconstruct hello / helpe / hello+r prefix chain."""

    def run(values):
        body = (
            _uleb_enc(8) + _uleb_enc(1) + _uleb_enc(len(values))
            + _zz_enc(values[0])
        )
        if len(values) > 1:
            deltas = [b - a for a, b in zip(values, values[1:])]
            mind = min(deltas)
            norm = [d - mind for d in deltas] + [0] * (8 - len(deltas))
            bw = max(norm).bit_length()
            bits = 0
            for k, d in enumerate(norm):
                bits |= d << (k * bw)
            body += _zz_enc(mind) + bytes([bw])
            body += bits.to_bytes(bw, "little") if bw else b""
        return body

    payload = run([0, 3, 5]) + run([5, 2, 1]) + b"hello" + b"pe" + b"r"
    out, pos = delta_byte_array(payload, 0, 3)
    assert out == [b"hello", b"helpe", b"helper"]
    assert pos == len(payload)


def test_fault_injection_statuses():
    """Every designed verdict class is non-vacuous and typed."""
    # corrupt: doc_id % 11 == 4
    with pytest.raises(ValueError):
        walk_parquet_v2(_v2_payload(4))
    # crc_error: doc_id % 17 == 6 (and not % 11 == 4)
    with pytest.raises(ValueError, match="CRC"):
        walk_parquet_v2(_v2_payload(23))
    # unsupported: doc_id % 13 == 7 → BYTE_STREAM_SPLIT doubles
    with pytest.raises(NotImplementedError):
        walk_parquet_v2(_v2_payload(20))


def test_crc_flip_hits_every_group():
    """The near-end flip must land inside the first page body (not
    its Thrift header) for EVERY group so the verdict is always
    'crc_error', never 'corrupt'."""
    for g in range(_V2_GROUPS):
        doc_id = g
        while not (doc_id % 17 == 6 and doc_id % 11 != 4):
            doc_id += _V2_GROUPS
        with pytest.raises(ValueError, match="CRC"):
            walk_parquet_v2(_v2_payload(doc_id))


def test_dictionary_chunk_is_typed_unsupported():
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"v": pa.array([1, 1, 2, 2] * 100, type=pa.int64())})
    buf = pa.BufferOutputStream()
    pq.write_table(
        t, buf, use_dictionary=True, compression="none",
        data_page_version="2.0",
    )
    with pytest.raises(NotImplementedError, match="dictionary"):
        walk_parquet_v2(buf.getvalue().to_pybytes())


def test_truncation_always_fails_every_group():
    for g in range(_V2_GROUPS):
        doc_id = g
        while doc_id % 11 != 4:
            doc_id += _V2_GROUPS
        with pytest.raises(ValueError):
            walk_parquet_v2(_v2_payload(doc_id))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "ingest_parquet_v2_delta_walk"
    )


def test_width_zero_count_bomb_is_typed_not_allocated():
    """Width-0 miniblocks make values byte-free, so a crafted huge
    <total count> must be rejected by the expected-count bound BEFORE
    any materialization (the bzip2 zero-run lesson)."""
    bomb = (
        _uleb_enc(8) + _uleb_enc(1) + _uleb_enc(1 << 40) + _zz_enc(0)
        + (_zz_enc(1) + bytes([0])) * 4
    )
    with pytest.raises(ValueError, match="more values than expected"):
        delta_binary_packed(bomb, max_total=512)


def test_rle_level_run_bomb_is_clamped():
    """A level-run RLE header declaring a huge run consumes no
    per-value bytes, so truncation checks can't bound it — the parser
    must clamp materialization to the values still needed."""
    import time

    from pyspark_postgres_loader_spark.operators.parquetwalk import (
        _parse_level_runs,
    )

    rle = _uleb_enc((1 << 40) << 1) + b"\x01"
    t0 = time.time()
    levels = _parse_level_runs(rle, 512, 1)
    assert levels == [1] * 512
    assert time.time() - t0 < 1.0


def test_delta_run_longer_than_page_count_is_typed():
    """The page header's num_values bounds the delta run's declared
    total via max_total — a run claiming more is a typed error."""
    with pytest.raises(ValueError, match="more values than expected"):
        delta_binary_packed(
            _uleb_enc(8) + _uleb_enc(1) + _uleb_enc(1 << 30) + _zz_enc(0),
            max_total=1 << 24,
        )


# ------------------- DELTA_LENGTH_BYTE_ARRAY (round 15)

def test_dlba_matches_fixture_every_group():
    from pyspark_postgres_loader_spark.operators.parquetv2 import (
        _DL_GROUPS,
        _dl_bytes,
        _dl_strings,
    )

    for g in range(_DL_GROUPS):
        f = walk_parquet_v2(_dl_bytes(g))
        assert [s.decode() for s in f["strs"]] == _dl_strings(g)


def test_dlba_pyarrow_reads_back_identical():
    import io

    import pyarrow.parquet as pq

    from pyspark_postgres_loader_spark.operators.parquetv2 import (
        _dl_bytes,
    )

    blob = _dl_bytes(2)
    t = pq.read_table(io.BytesIO(blob))
    f = walk_parquet_v2(blob)
    assert [s.decode() for s in f["strs"]] == t.column("s").to_pylist()


def test_dlba_typed_classes():
    from pyspark_postgres_loader_spark.operators.parquetv2 import (
        _dl_payload,
    )

    with pytest.raises(ValueError) as ei:
        walk_parquet_v2(_dl_payload(3))
    assert "CRC" not in str(ei.value)
    with pytest.raises(ValueError, match="CRC"):
        walk_parquet_v2(_dl_payload(2))
    with pytest.raises(NotImplementedError):
        walk_parquet_v2(_dl_payload(18))


def test_dlba_length_byte_disagreement_typed():
    # shrink the concatenated bytes under an intact length run: the
    # sum-of-lengths cross-check must fire (build an uncompressed
    # group so the splice lands in the value bytes)
    from pyspark_postgres_loader_spark.operators.parquetv2 import (
        _dl_bytes,
    )
    from pyspark_postgres_loader_spark.operators.parquetwalk import (
        first_page_body_span,
    )

    blob = bytearray(_dl_bytes(0))  # g=0 → codec none
    s, e = first_page_body_span(bytes(blob))
    del blob[e - 2]  # one byte gone from the final suffix bytes
    with pytest.raises(ValueError):
        walk_parquet_v2(bytes(blob))
