"""safetensors walk: known-byte layout pin, dtype battery, the
zero-copy tiling rule, typed quarantine, and the oracle compare."""

from __future__ import annotations

import json
import struct

import numpy as np
import pytest

from pyspark_postgres_loader_spark.operators.safetensors import (
    _ST_GROUPS,
    _st_payload,
    build_safetensors,
    walk_safetensors,
)


def test_known_byte_layout():
    """Assemble a one-tensor blob with a test-local writer and require
    byte equality with build_safetensors, then walk it."""
    raw = struct.pack("<4q", 1, 2, 3, 4)
    header = json.dumps(
        {"t": {"dtype": "I64", "shape": [4], "data_offsets": [0, 32]}},
        separators=(",", ":"),
    ).encode()
    expected = struct.pack("<Q", len(header)) + header + raw
    built = build_safetensors([("t", "I64", [4], raw)])
    assert built == expected
    f = walk_safetensors(built)
    assert f["tensors"]["t"]["values"] == [1, 2, 3, 4]
    assert f["n_meta"] == 0


def test_dtype_battery():
    rng = np.random.default_rng(5)
    cases = [
        ("I8", "<i1"), ("I16", "<i2"), ("I32", "<i4"), ("I64", "<i8"),
        ("U8", "<u1"), ("U16", "<u2"), ("U32", "<u4"), ("U64", "<u8"),
        ("F32", "<f4"), ("F64", "<f8"),
    ]
    tensors = []
    want = {}
    for name, (st_dt, np_dt) in enumerate(cases):
        arr = rng.integers(0, 100, size=17).astype(np_dt)
        tensors.append((f"t{name}", st_dt, [17], arr.tobytes()))
        want[f"t{name}"] = [type(arr.tolist()[0])(v) for v in arr.tolist()]
    f = walk_safetensors(build_safetensors(tensors))
    for k, v in want.items():
        assert f["tensors"][k]["values"] == v, k
    # BOOL decodes to 0/1 bytes
    f2 = walk_safetensors(
        build_safetensors([("b", "BOOL", [3], b"\x01\x00\x01")])
    )
    assert f2["tensors"]["b"]["values"] == [1, 0, 1]


def test_tiling_rule_is_live():
    raw = struct.pack("<2q", 1, 2)
    blob = build_safetensors([("a", "I64", [2], raw),
                              ("b", "I64", [2], raw)])
    hlen = struct.unpack_from("<Q", blob, 0)[0]
    header = json.loads(blob[8 : 8 + hlen])
    # overlap: b starts inside a
    header["b"]["data_offsets"] = [8, 24]
    hjson = json.dumps(header, separators=(",", ":")).encode()
    with pytest.raises(ValueError, match="tile"):
        walk_safetensors(
            struct.pack("<Q", len(hjson)) + hjson + blob[8 + hlen :]
        )
    # tail slack: extra bytes beyond the last tensor
    with pytest.raises(ValueError, match="tile"):
        walk_safetensors(bytes(blob) + b"\x00" * 4)


def test_typed_quarantine():
    raw = struct.pack("<2q", 5, 6)
    blob = build_safetensors([("a", "I64", [2], raw)])
    with pytest.raises(ValueError, match="truncated"):
        walk_safetensors(blob[:4])
    with pytest.raises(ValueError, match="truncated"):
        walk_safetensors(blob[:20])
    with pytest.raises(ValueError, match="cap"):
        walk_safetensors(struct.pack("<Q", 1 << 40) + blob[8:])
    with pytest.raises(ValueError, match="JSON"):
        walk_safetensors(struct.pack("<Q", 4) + b"nope" + raw)
    with pytest.raises(NotImplementedError, match="F8"):
        walk_safetensors(
            build_safetensors([("q", "F8_E4M3", [2], b"\x00\x00")])
        )
    with pytest.raises(NotImplementedError, match="F16"):
        walk_safetensors(
            build_safetensors([("h", "F16", [2], b"\x00" * 4)])
        )
    # shape/offset disagreement
    hjson = json.dumps(
        {"t": {"dtype": "I64", "shape": [3], "data_offsets": [0, 16]}},
        separators=(",", ":"),
    ).encode()
    with pytest.raises(ValueError, match="disagree"):
        walk_safetensors(struct.pack("<Q", len(hjson)) + hjson + raw)


def test_fixture_truncation_always_fails_every_group():
    for g in range(_ST_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _ST_GROUPS
        with pytest.raises(ValueError):
            walk_safetensors(_st_payload(doc_id))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "ingest_safetensors_walk"
    )
