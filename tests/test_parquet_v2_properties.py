"""Property tests for the v2 delta decoders: pyarrow (an independent
implementation) round-trips arbitrary value shapes through
DELTA_BINARY_PACKED / DELTA_BYTE_ARRAY and the walk must recover them
exactly — extremes, negatives, constant runs, single values, strings
with long shared prefixes."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_postgres_loader_spark.operators.parquetv2 import (
    walk_parquet_v2,
)


def _write_v2(ints: list[int], strs: list[str]) -> bytes:
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "v": pa.array(ints, type=pa.int64()),
        "s": pa.array(strs),
    })
    buf = pa.BufferOutputStream()
    pq.write_table(
        t, buf, use_dictionary=False, compression="none",
        data_page_version="2.0", write_statistics=False,
        write_page_checksum=True, row_group_size=256,
        column_encoding={"v": "DELTA_BINARY_PACKED",
                         "s": "DELTA_BYTE_ARRAY"},
    )
    return buf.getvalue().to_pybytes()


@given(
    ints=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1, max_size=700,
    ),
    seed=st.integers(0, 2**16),
)
@settings(max_examples=40, deadline=None)
def test_delta_binary_packed_roundtrip(ints, seed):
    strs = [f"p{(seed + i) % 97:02d}x{i}" for i in range(len(ints))]
    f = walk_parquet_v2(_write_v2(ints, strs))
    assert f["ints"] == ints
    assert [s.decode() for s in f["strs"]] == strs


@given(
    words=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
            max_size=24,
        ),
        min_size=1, max_size=300,
    ),
)
@settings(max_examples=40, deadline=None)
def test_delta_byte_array_roundtrip_arbitrary_text(words):
    """Prefix/suffix reconstruction over arbitrary unicode, including
    empty strings and repeated values (prefix = whole previous)."""
    ints = list(range(len(words)))
    f = walk_parquet_v2(_write_v2(ints, words))
    assert [s.decode("utf-8") for s in f["strs"]] == words


def test_extreme_int64_bounds_roundtrip():
    """INT64_MIN/MAX adjacency: the min-delta subtraction wraps in a
    fixed-width implementation — the decoder must reproduce pyarrow's
    values exactly at the boundary."""
    ints = [-(2**63), 2**63 - 1, 0, -1, 1, -(2**63), 2**63 - 1]
    strs = ["a"] * len(ints)
    f = walk_parquet_v2(_write_v2(ints, strs))
    assert f["ints"] == ints
