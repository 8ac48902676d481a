"""Arrow IPC stream walk: pyarrow golden battery (uncompressed /
LZ4 / zstd, multi-batch, nullable lattice), EOS discipline, typed
quarantine non-vacuity, shared-decoder consistency with the file
walk, and the oracle compare."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.operators.arrowstream import (
    _AS_GROUPS,
    _as_bytes,
    _as_id,
    _as_n,
    _as_payload,
    _as_val,
    walk_arrow_ipc_stream,
)


@pytest.mark.parametrize("g", [0, 1, 2])  # codec = (None, lz4, zstd)
def test_pyarrow_golden_per_codec(g):
    f = walk_arrow_ipc_stream(_as_bytes(g))
    n = _as_n(g)
    assert f["fields"] == ["id", "val"]
    assert f["n_rows"] == n
    assert f["n_batches"] >= 2  # max_chunksize forces multi-batch
    assert f["columns"][0] == [_as_id(g, i) for i in range(n)]
    assert f["columns"][1] == [_as_val(g, i) for i in range(n)]
    assert f["null_count"] == sum(1 for i in range(n) if i % 5 == 4)


def test_eos_discipline():
    blob = _as_bytes(0)
    # bytes after EOS are structural damage
    with pytest.raises(ValueError, match="beyond EOS"):
        walk_arrow_ipc_stream(blob + b"\x00\x00\x00\x00")
    # a stream that just stops (no EOS) is truncated
    with pytest.raises(ValueError):
        walk_arrow_ipc_stream(blob[:-8])
    # legacy bare-zero EOS form is accepted
    assert walk_arrow_ipc_stream(blob[:-8] + b"\x00\x00\x00\x00")[
        "n_rows"
    ] == _as_n(0)


def test_schema_must_come_first():
    blob = _as_bytes(0)
    # skip the schema message: find the second message start
    import struct

    mlen = struct.unpack_from("<i", blob, 4)[0]
    from pyspark_postgres_loader_spark.operators.arrowipc import _fb_root

    msg = _fb_root(blob[8 : 8 + mlen])
    second = 8 + mlen + msg.int64(3)
    with pytest.raises(ValueError, match="start with a Schema"):
        walk_arrow_ipc_stream(blob[second:])


def test_verdict_classes_are_non_vacuous():
    counts = {"decoded": 0, "corrupt": 0, "mismatch": 0,
              "unsupported": 0}
    for doc in range(200):
        corrupt = doc % 11 == 3
        mism = doc % 17 == 2 and not corrupt
        unsup = doc % 13 == 5 and not (corrupt or mism)
        want = ("corrupt" if corrupt else "mismatch" if mism
                else "unsupported" if unsup else "decoded")
        try:
            walk_arrow_ipc_stream(_as_payload(doc))
            got = "decoded"
        except NotImplementedError:
            got = "unsupported"
        except ValueError as exc:
            got = "mismatch" if "mismatch" in str(exc) else "corrupt"
        assert got == want, (doc, got, want)
        counts[want] += 1
    assert min(counts.values()) > 0, counts


def test_stream_and_file_walk_agree():
    """The same table written both ways must decode to identical
    values through the two walks (shared RecordBatch decoder)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from pyspark_postgres_loader_spark.operators.arrowipc import (
        walk_arrow_ipc,
    )

    t = pa.table({
        "id": pa.array(range(500), pa.int64()),
        "val": pa.array(
            [None if i % 3 == 0 else i * i % 1000 for i in range(500)],
            pa.int32(),
        ),
    })
    sink_s = pa.BufferOutputStream()
    with ipc.new_stream(sink_s, t.schema) as w:
        w.write_table(t, max_chunksize=128)
    sink_f = pa.BufferOutputStream()
    with ipc.new_file(sink_f, t.schema) as w:
        w.write_table(t, max_chunksize=128)
    fs = walk_arrow_ipc_stream(sink_s.getvalue().to_pybytes())
    ff = walk_arrow_ipc(sink_f.getvalue().to_pybytes())
    assert fs["columns"] == ff["columns"]
    assert fs["null_count"] == ff["null_count"]


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "ingest_arrow_ipc_stream_walk"
    )
