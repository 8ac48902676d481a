"""PostgreSQL COPY BINARY: exact roundtrip (NULLs, negative floats,
multibyte text), golden header bytes, typed structural verdicts,
fuzz via the shared battery, and the oracle compare."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_postgres_loader_spark.operators.pgcopy import (
    _MAGIC,
    encode_copy_binary,
    walk_copy_binary,
)


def test_golden_frame_layout():
    """Pin the public format: 11-byte magic, zero flags/extension,
    int16 field count, int32 lengths (−1 = NULL), BE payloads,
    int16 −1 trailer."""
    blob = encode_copy_binary([(1, 2, None, "F")])
    assert blob[:11] == b"PGCOPY\n\xff\r\n\x00"
    assert blob[11:19] == b"\x00" * 8
    assert struct.unpack_from(">h", blob, 19)[0] == 4
    assert struct.unpack_from(">iq", blob, 21) == (8, 1)
    assert struct.unpack_from(">iq", blob, 33) == (8, 2)
    assert struct.unpack_from(">i", blob, 45)[0] == -1  # NULL amount
    assert struct.unpack_from(">i", blob, 49)[0] == 1
    assert blob[53:54] == b"F"
    assert blob[-2:] == b"\xff\xff"


def test_roundtrip_edges():
    rows = [
        (0, 1, 5.25, "F"),
        (-(2**63), 2**63 - 1, None, ""),
        (7, 8, float("-0.0"), "日本語🎉"),
        (9, 10, -1.5e300, "x" * 500),
    ]
    assert walk_copy_binary(encode_copy_binary(rows)) == rows


@given(rows=st.lists(
    st.tuples(
        st.integers(-(2**63), 2**63 - 1),
        st.integers(-(2**63), 2**63 - 1),
        st.one_of(st.none(), st.floats(allow_nan=False)),
        st.text(max_size=40),
    ),
    max_size=60,
))
@settings(max_examples=40, deadline=None)
def test_roundtrip_arbitrary(rows):
    assert walk_copy_binary(encode_copy_binary(rows)) == rows


def test_typed_verdicts():
    blob = encode_copy_binary([(1, 2, 3.0, "ok"), (4, 5, None, "f")])
    with pytest.raises(ValueError, match="magic"):
        walk_copy_binary(b"PGCOPX" + blob[6:])
    with pytest.raises(ValueError, match="field count"):
        b = bytearray(blob)
        struct.pack_into(">h", b, len(_MAGIC) + 8, 5)
        walk_copy_binary(bytes(b))
    with pytest.raises(ValueError):
        walk_copy_binary(blob[:-10])  # cut: truncation symptom
    with pytest.raises(ValueError, match="trailing"):
        walk_copy_binary(blob + b"\x00")
    with pytest.raises(NotImplementedError, match="OIDs"):
        b = bytearray(blob)
        struct.pack_into(">i", b, len(_MAGIC), 1 << 16)
        walk_copy_binary(bytes(b))
    with pytest.raises(ValueError, match="NOT NULL"):
        # one tuple whose k field is NULL: length −1 with the 8
        # value bytes removed so the frame stays aligned
        frame = bytearray(encode_copy_binary([(1, 2, 3.0, "ok")]))
        struct.pack_into(">i", frame, len(_MAGIC) + 10, -1)
        del frame[len(_MAGIC) + 14 : len(_MAGIC) + 22]
        walk_copy_binary(bytes(frame))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "sink_copy_binary_roundtrip")
