"""Delta checkpoint-parquet replay: the multi-column table walk, the
checkpoint==JSON-fold equivalence, the load-bearing-checkpoint
property, and the oracle compare."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.operators.deltacheckpoint import (
    _checkpoint_version,
    checkpoint_parquet_bytes,
    delta_checkpoint_fold,
)
from pyspark_postgres_loader_spark.operators.deltalog import (
    _n_versions,
    _ROWS_A,
    _ROWS_B,
    delta_snapshot_stats,
)
from pyspark_postgres_loader_spark.operators.parquetwalk import (
    walk_parquet_table,
)


def test_table_walk_round_trips_the_checkpoint():
    """Our own decoder reads back exactly what pyarrow wrote: live
    fids {cp-1 .. 2cp+2} with the lattice's size/rows columns."""
    cp = 7
    f = walk_parquet_table(checkpoint_parquet_bytes(cp))
    fids = f["columns"]["fid"]
    assert fids == list(range(cp - 1, 2 * cp + 3))
    assert f["columns"]["rows"] == [_ROWS_A + _ROWS_B * x for x in fids]
    assert f["num_rows"] == cp + 4
    assert f["n_row_groups"] >= 1


def test_table_walk_handles_nulls_and_multiple_row_groups():
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "a": pa.array([1, None, 3, None, 5], type=pa.int64()),
        "b": pa.array([9, 8, 7, 6, 5], type=pa.int64()),
    })
    buf = pa.BufferOutputStream()
    pq.write_table(t, buf, use_dictionary=False, compression="gzip",
                   data_page_version="1.0", write_statistics=False,
                   row_group_size=2)
    f = walk_parquet_table(buf.getvalue().to_pybytes())
    assert f["columns"]["a"] == [1, None, 3, None, 5]
    assert f["columns"]["b"] == [9, 8, 7, 6, 5]
    assert f["n_row_groups"] == 3


def test_table_walk_rejects_non_int64():
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"s": pa.array(["x", "y"])})
    buf = pa.BufferOutputStream()
    pq.write_table(t, buf, use_dictionary=False, compression="none",
                   data_page_version="1.0")
    with pytest.raises(NotImplementedError):
        walk_parquet_table(buf.getvalue().to_pybytes())


def test_checkpoint_fold_equals_pure_json_fold(spark):
    """THE property: folding checkpoint + tail reproduces the full
    checkpointless replay exactly, for every version >= C."""
    nv = 14
    cp = _checkpoint_version(nv)
    full = {r["version"]: r for r in
            delta_snapshot_stats(spark, nv).collect()
            if r["version"] >= cp}
    ck = {r["version"]: r for r in
          delta_checkpoint_fold(spark, nv).collect()}
    assert set(full) == set(ck)
    for v, row in full.items():
        for col in ("live_files", "live_rows", "live_bytes"):
            assert row[col] == ck[v][col], (v, col)
    # tail action counts are real (2 adds, 1 remove per tail version)
    for v in range(cp + 1, nv):
        assert (ck[v]["n_adds"], ck[v]["n_removes"]) == (2, 1)


def test_checkpoint_is_load_bearing(spark):
    """Every tail remove targets a file added BEFORE the checkpoint:
    fid v-2 is in the tail's own adds only when v >= 2C+5 > N-1 —
    so without the checkpoint every remove dangles. Pin it."""
    nv = 14
    cp = _checkpoint_version(nv)
    ckpt_fids = set(range(cp - 1, 2 * cp + 3))
    tail_add_fids = {f for v in range(cp + 1, nv)
                     for f in (2 * v + 1, 2 * v + 2)}
    rm_fids = {v - 2 for v in range(cp + 1, nv)}
    assert rm_fids <= ckpt_fids
    assert not (rm_fids & tail_add_fids)


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "delta_checkpoint_snapshot")
