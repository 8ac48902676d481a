"""Property tests for the multi-column parquet table walk: pyarrow
(an independent implementation) round-trips arbitrary nullable INT64
tables — variable column counts, null patterns, row-group splits,
all three codecs — and walk_parquet_table must recover every cell
exactly, plus an SBBF property: a bloom filter built over any value
set never false-negatives."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_postgres_loader_spark.operators.bloomfilter import (
    SplitBlockBloom,
    sbbf_deserialize,
    sbbf_num_blocks,
    sbbf_serialize,
)
from pyspark_postgres_loader_spark.operators.parquetwalk import (
    walk_parquet_table,
)

_I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


def _write_table(cols: dict[str, list], codec: str, rg: int) -> bytes:
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({k: pa.array(v, type=pa.int64())
                  for k, v in cols.items()})
    buf = pa.BufferOutputStream()
    pq.write_table(
        t, buf, use_dictionary=False, compression=codec,
        data_page_version="1.0", write_statistics=False,
        write_page_checksum=True, row_group_size=rg,
    )
    return buf.getvalue().to_pybytes()


@given(
    ncols=st.integers(1, 5),
    vals=st.lists(st.one_of(_I64, st.none()), min_size=1, max_size=400),
    codec_i=st.integers(0, 2),
    rg=st.integers(1, 200),
    seed=st.integers(0, 2**16),
)
@settings(max_examples=40, deadline=None)
def test_table_walk_roundtrip(ncols, vals, codec_i, rg, seed):
    cols = {
        f"c{j}": [
            None if v is None else (v + j * seed) % (2**63) - (2**62)
            for v in vals
        ]
        for j in range(ncols)
    }
    codec = ("none", "snappy", "gzip")[codec_i]
    f = walk_parquet_table(_write_table(cols, codec, rg))
    assert f["num_rows"] == len(vals)
    for j in range(ncols):
        assert f["columns"][f"c{j}"] == cols[f"c{j}"], f"c{j}"


@given(
    vals=st.sets(_I64, min_size=1, max_size=500),
    probes=st.lists(_I64, min_size=0, max_size=50),
)
@settings(max_examples=40, deadline=None)
def test_sbbf_never_false_negative(vals, probes):
    f = SplitBlockBloom(sbbf_num_blocks(len(vals)))
    for v in vals:
        f.insert(v)
    g = sbbf_deserialize(sbbf_serialize(f))
    assert all(g.contains(v) for v in vals)
    # a probe claiming absence is PROOF of absence
    for p in probes:
        if not g.contains(p):
            assert p not in vals
