"""Arrow IPC walk: pyarrow-written roundtrips across dtypes / codecs
/ chunkings, validity-bitmap decode, the footer/message bodyLength
cross-check, typed quarantine non-vacuity, and the oracle compare."""

from __future__ import annotations

import struct

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

from pyspark_postgres_loader_spark.operators.arrowipc import (
    _AR_GROUPS,
    _ar_payload,
    _fb_root,
    _i64,
    walk_arrow_ipc,
)


def _write(table: pa.Table, codec=None, chunk=None) -> bytes:
    sink = pa.BufferOutputStream()
    opts = ipc.IpcWriteOptions(compression=codec)
    with ipc.new_file(sink, table.schema, options=opts) as w:
        w.write_table(table, max_chunksize=chunk)
    return sink.getvalue().to_pybytes()


def test_dtype_matrix_roundtrip():
    n = 777
    t = pa.table({
        "a": pa.array([(i * 3) % 100 - 50 for i in range(n)],
                      type=pa.int8()),
        "b": pa.array([(i * 7) % 30000 for i in range(n)],
                      type=pa.int16()),
        "c": pa.array([(i * 11) % 100000 for i in range(n)],
                      type=pa.int32()),
        "d": pa.array([i * i for i in range(n)], type=pa.int64()),
        "e": pa.array([(i * 5) % 250 for i in range(n)],
                      type=pa.uint8()),
        "f": pa.array([i / 8 for i in range(n)], type=pa.float64()),
    })
    for codec in (None, "lz4", "zstd"):
        f = walk_arrow_ipc(_write(t, codec=codec, chunk=300))
        assert f["fields"] == ["a", "b", "c", "d", "e", "f"]
        assert f["n_rows"] == n and f["n_batches"] == 3
        for ci, name in enumerate(f["fields"]):
            assert f["columns"][ci] == t.column(name).to_pylist(), (
                codec, name)


def test_validity_bitmap_nulls():
    vals = [None if i % 5 == 2 else i * 3 for i in range(1001)]
    t = pa.table({"v": pa.array(vals, type=pa.int64())})
    for codec in (None, "lz4"):
        f = walk_arrow_ipc(_write(t, codec=codec, chunk=250))
        assert f["columns"][0] == vals
        assert f["null_count"] == sum(v is None for v in vals)


def test_typed_quarantine():
    t = pa.table({"v": pa.array(range(100), type=pa.int64())})
    blob = _write(t)
    with pytest.raises(ValueError, match="magic"):
        walk_arrow_ipc(b"NOTARROW" + blob[8:])
    with pytest.raises(ValueError):
        walk_arrow_ipc(blob[:-8])
    with pytest.raises(NotImplementedError):  # Utf8 column
        walk_arrow_ipc(_write(pa.table({"s": pa.array(["a", "b"])})))
    with pytest.raises(NotImplementedError):  # dictionary batch
        walk_arrow_ipc(_write(pa.table(
            {"d": pa.array(["x", "y", "x"]).dictionary_encode()})))
    import numpy as np

    with pytest.raises(NotImplementedError):  # float16
        walk_arrow_ipc(_write(pa.table(
            {"h": pa.array(np.array([1.0, 2.0], dtype=np.float16))})))


def test_bodylength_cross_check_is_live():
    """Patch the footer Block bodyLength away from the Message's own
    copy and require the 'mismatch' verdict — proving both carried
    lengths are read and compared."""
    t = pa.table({"v": pa.array(range(500), type=pa.int64())})
    blob = bytearray(_write(t))
    flen = struct.unpack_from("<i", blob, len(blob) - 10)[0]
    foot_start = len(blob) - 10 - flen
    foot = bytes(blob[foot_start : len(blob) - 10])
    root = _fb_root(foot)
    bst, _n = root.vector(3)
    struct.pack_into("<q", blob, foot_start + bst + 16,
                     _i64(foot, bst + 16) + 8)
    with pytest.raises(ValueError, match="bodyLength mismatch"):
        walk_arrow_ipc(bytes(blob))


def test_fixture_truncation_always_fails_every_group():
    for g in range(_AR_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _AR_GROUPS
        with pytest.raises(ValueError):
            walk_arrow_ipc(_ar_payload(doc_id))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "ingest_arrow_ipc_walk"
    )
