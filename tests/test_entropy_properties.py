"""Property tests over the six native entropy decoders: independent
compressors (stdlib zlib/bz2/lzma, pyarrow snappy/lz4/zstd) compress
arbitrary content shapes — pure random (incompressible → stored/raw
paths), highly repetitive (long matches, RLE paths), text-like
(typical Huffman/FSE distributions), structured step patterns — at
multiple levels, and each native decoder must reproduce the input
byte-exactly. Random content sweeps encoder mode decisions (stored vs
dynamic blocks, treeless literals, repeat offsets, match lengths at
boundary values) that fixed fixtures cannot."""

from __future__ import annotations

import bz2 as _bz2
import lzma as _lzma
import zlib as _zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_postgres_loader_spark.operators.bzip2 import decompress_bz2
from pyspark_postgres_loader_spark.operators.inflate import inflate_raw
from pyspark_postgres_loader_spark.operators.lz4frame import (
    decompress_lz4_frame,
)
from pyspark_postgres_loader_spark.operators.snappy import (
    snappy_decompress_block,
)
from pyspark_postgres_loader_spark.operators.xzwalk import decompress_xz
from pyspark_postgres_loader_spark.operators.zstdfse import decompress_frame


def _pa_compress(codec: str, data: bytes) -> bytes:
    import pyarrow as pa

    out = pa.Codec(codec).compress(data)
    return out.to_pybytes() if hasattr(out, "to_pybytes") else bytes(out)


# content shapes chosen to force distinct encoder regimes
_CONTENT = st.one_of(
    st.binary(min_size=0, max_size=4000),                      # random
    st.builds(lambda b, n: b * n,
              st.binary(min_size=1, max_size=24),
              st.integers(1, 6000)),   # repetitive, crosses 64 KiB blocks
    st.builds(
        lambda words, n: (b" ".join(words) + b". ") * n,
        st.lists(st.sampled_from(
            [b"the", b"quick", b"brown", b"fox", b"jumps", b"over",
             b"lazy", b"dog", b"corpus", b"tokens"]),
            min_size=1, max_size=30),
        st.integers(1, 40),
    ),                                                          # text-like
    st.builds(lambda n: bytes(i * 7 % 251 for i in range(n)),
              st.integers(0, 5000)),                            # stepped
)


@given(data=_CONTENT, level=st.integers(1, 9))
@settings(max_examples=60, deadline=None)
def test_inflate_roundtrip(data, level):
    co = _zlib.compressobj(level, _zlib.DEFLATED, -15)
    raw = co.compress(data) + co.flush()
    out, used = inflate_raw(raw)
    assert out == data
    assert used == len(raw)


@given(data=_CONTENT, level=st.integers(1, 9))
@settings(max_examples=25, deadline=None)
def test_bzip2_roundtrip(data, level):
    out, facts = decompress_bz2(_bz2.compress(data, level))
    assert out == data
    assert facts["level"] == level


@given(data=_CONTENT, preset=st.integers(0, 6))
@settings(max_examples=25, deadline=None)
def test_xz_roundtrip(data, preset):
    out, facts = decompress_xz(_lzma.compress(data, preset=preset))
    assert out == data


@given(data=_CONTENT)
@settings(max_examples=40, deadline=None)
def test_snappy_roundtrip(data):
    assert snappy_decompress_block(_pa_compress("snappy", data)) == data


@given(data=_CONTENT)
@settings(max_examples=40, deadline=None)
def test_lz4_frame_roundtrip(data):
    out = decompress_lz4_frame(_pa_compress("lz4", data))
    body = out[0] if isinstance(out, tuple) else out
    assert body == data


@given(data=_CONTENT)
@settings(max_examples=40, deadline=None)
def test_zstd_roundtrip(data):
    out = decompress_frame(_pa_compress("zstd", data))
    body = out[0] if isinstance(out, tuple) else out
    assert body == data


def test_lz4_linked_blocks_cross_block_matches():
    """pyarrow writes LINKED blocks (FLG block-independence clear):
    content past the 64 KiB block boundary compresses with matches
    reaching into the previous block's output — the deep-sweep
    finding that added the inter-block window (round 12)."""
    data = (b"spark corpus token " * 37) * 150  # ~105 KB, 2+ blocks
    blob = _pa_compress("lz4", data)
    assert (blob[4] >> 5) & 1 == 0, "fixture must be a linked frame"
    out = decompress_lz4_frame(blob)
    assert (out[0] if isinstance(out, tuple) else out) == data


def test_lz4_block_window_hand_assembled():
    """Hand-built linked match: block 2 is a single sequence whose
    match offset points entirely into block 1's output."""
    from pyspark_postgres_loader_spark.operators.lz4frame import (
        lz4_decompress_block,
    )

    prefix = b"ABCDEFGH"
    # token: 0 literals, matchlen 4+4=8 → copies prefix[-8:]
    blk = bytes([0x04]) + b"\x08\x00"  # offset 8
    assert lz4_decompress_block(blk, prefix=prefix) == prefix
    # window-crossing overlap: offset 4, length 8 starts at
    # prefix[-4:] then wraps into this block's own output
    blk2 = bytes([0x04]) + b"\x04\x00"
    assert lz4_decompress_block(blk2, prefix=prefix) == b"EFGHEFGH"
