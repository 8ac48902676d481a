"""Property tests for the ORC walk: pyarrow's C++ writer round-trips
arbitrary int64 column shapes and the walk must recover the exact
values — pyarrow picks RLEv2 sub-encodings freely (SHORT_REPEAT /
DIRECT / PATCHED_BASE / DELTA and the fixed-delta and zigzag forms),
so random shapes sweep encoder decisions the fixed fixtures can't."""

from __future__ import annotations

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_postgres_loader_spark.operators.orcwalk import walk_orc


def _write_orc(cols: dict[str, list[int]], codec: str) -> bytes:
    import pyarrow as pa
    import pyarrow.orc as orc

    t = pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})
    buf = io.BytesIO()
    orc.write_table(
        t, buf, compression=codec, stripe_size=4096,
        compression_block_size=4096,
    )
    return buf.getvalue()


_SHAPES = st.one_of(
    # constant / near-constant plateaus (SHORT_REPEAT, fixed DELTA)
    st.builds(lambda v, n: [v] * n,
              st.integers(-(2**40), 2**40), st.integers(1, 400)),
    # affine ramps (DELTA)
    st.builds(lambda a, d, n: [a + d * i for i in range(n)],
              st.integers(-(2**30), 2**30),
              st.integers(-1000, 1000), st.integers(1, 400)),
    # arbitrary values incl. full int64 extremes (DIRECT/PATCHED_BASE)
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
             min_size=1, max_size=400),
    # mostly-small with rare huge outliers (PATCHED_BASE's home turf)
    st.builds(
        lambda base, outs, n: [
            base + (i % 37) + (10**15 if i in outs else 0)
            for i in range(n)
        ],
        st.integers(0, 10**6),
        st.sets(st.integers(0, 399), max_size=5),
        st.integers(1, 400),
    ),
)


@given(vals=_SHAPES, codec=st.sampled_from(
    ["uncompressed", "zlib", "snappy", "lz4", "zstd"]))
@settings(max_examples=50, deadline=None)
def test_orc_roundtrip_arbitrary_int64_shapes(vals, codec):
    f = walk_orc(_write_orc({"v": vals}, codec))
    assert f["n_rows"] == len(vals)
    assert f["columns"][0] == vals


@given(
    a=st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=300),
    seed=st.integers(0, 999),
)
@settings(max_examples=30, deadline=None)
def test_orc_roundtrip_multi_column(a, seed):
    """Two columns of the same length with unrelated shapes: the
    stream-offset walk must keep per-column cursors straight."""
    b = [((seed + i) * 2654435761) % (2**31) - 2**30 for i in range(len(a))]
    f = walk_orc(_write_orc({"a": a, "b": b}, "zlib"))
    assert f["columns"][0] == a
    assert f["columns"][1] == b


def _write_orc_strings(vals: list, threshold: float) -> bytes:
    import pyarrow as pa
    import pyarrow.orc as orc

    t = pa.table({"s": pa.array(vals, pa.string())})
    buf = io.BytesIO()
    orc.write_table(
        t, buf, compression="zlib", stripe_size=4096,
        compression_block_size=4096,
        dictionary_key_size_threshold=threshold,
    )
    return buf.getvalue()


@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.text(max_size=24),  # arbitrary unicode incl. empties
        ),
        min_size=1, max_size=300,
    ),
    threshold=st.sampled_from([0.0, 0.9, 1.0]),
)
@settings(max_examples=40, deadline=None)
def test_orc_roundtrip_arbitrary_strings(vals, threshold):
    """pyarrow picks DIRECT_V2 or DICTIONARY_V2 freely (the threshold
    sweep forces both decisions); nullable, empty, and multibyte
    strings must all survive the walk exactly."""
    f = walk_orc(_write_orc_strings(vals, threshold))
    assert f["n_rows"] == len(vals)
    assert f["columns"][0] == vals
