"""Property tests for the Arrow IPC walks: pyarrow round-trips
arbitrary nullable int64/float64 columns through the file AND stream
wire formats (plain, lz4, zstd body compression) and both walks must
recover values, null slots and null counts exactly."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_postgres_loader_spark.operators.arrowipc import (
    walk_arrow_ipc,
)
from pyspark_postgres_loader_spark.operators.arrowstream import (
    walk_arrow_ipc_stream,
)


def _write(cols, codec, stream=False, batch_rows=None):
    import pyarrow as pa
    import pyarrow.ipc as ipc

    t = pa.table(cols)
    opts = ipc.IpcWriteOptions(compression=codec)
    buf = pa.BufferOutputStream()
    opener = ipc.new_stream if stream else ipc.new_file
    with opener(buf, t.schema, options=opts) as w:
        if batch_rows:
            for b in t.to_batches(max_chunksize=batch_rows):
                w.write_batch(b)
        else:
            w.write_table(t)
    return buf.getvalue().to_pybytes()


_COLS = st.builds(
    lambda ints, floats_n: (ints, floats_n),
    st.lists(
        st.one_of(st.none(),
                  st.integers(min_value=-(2**63), max_value=2**63 - 1)),
        min_size=1, max_size=300,
    ),
    st.integers(0, 999),
)


@given(data=_COLS, codec=st.sampled_from([None, "lz4", "zstd"]),
       stream=st.booleans(), batch_rows=st.sampled_from([None, 64]))
@settings(max_examples=60, deadline=None)
def test_arrow_roundtrip_nullable_int64(data, codec, stream, batch_rows):
    import pyarrow as pa

    ints, seed = data
    floats = [None if (seed + i) % 7 == 3 else (seed + i) * 0.5
              for i in range(len(ints))]
    blob = _write(
        {"v": pa.array(ints, type=pa.int64()),
         "f": pa.array(floats, type=pa.float64())},
        codec, stream=stream, batch_rows=batch_rows,
    )
    f = (walk_arrow_ipc_stream if stream else walk_arrow_ipc)(blob)
    assert f["n_rows"] == len(ints)
    assert f["columns"][0] == ints
    assert f["columns"][1] == floats
    want_nulls = sum(v is None for v in ints) + sum(
        v is None for v in floats)
    assert f["null_count"] == want_nulls
