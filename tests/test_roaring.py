"""RoaringBitmap portable codec: exact round-trips, container-type
selection, both cookie layouts, offset-header verification, the
popcount recount, typed verdicts, and the oracle compare."""

from __future__ import annotations

import random
import struct

import pytest

from pyspark_postgres_loader_spark.operators.roaring import (
    _RG_GROUPS,
    _rg_blob,
    _rg_positions,
    serialize_roaring,
    walk_roaring,
)


def test_fixture_round_trips_every_group():
    for g in range(_RG_GROUPS):
        f = walk_roaring(_rg_blob(g, "ok"))
        pos = _rg_positions(g)
        assert f["positions"] == pos
        assert f["pos_sum"] == sum(pos)
        assert f["n_containers"] == 3 and f["n_bitmap"] == 1
        # even groups: run cookie with 1 run container; odd groups:
        # no-run layout re-encodes the run chunk as a second array
        if g % 2 == 0:
            assert (f["n_run"], f["n_array"]) == (1, 1)
        else:
            assert (f["n_run"], f["n_array"]) == (0, 2)


def test_arbitrary_round_trips_both_layouts():
    rng = random.Random(41)
    for _ in range(40):
        s = sorted(rng.sample(range(0, 1 << 21), rng.randrange(1, 7000)))
        for allow in (True, False):
            f = walk_roaring(serialize_roaring(s, allow_runs=allow))
            assert f["positions"] == s
            if not allow:
                assert f["n_run"] == 0


def test_container_type_selection_is_cost_optimal():
    # a solid run of 5000: run container (10 bytes) beats bitmap
    f = walk_roaring(serialize_roaring(list(range(5000))))
    assert (f["n_run"], f["n_bitmap"], f["n_array"]) == (1, 0, 0)
    # the same 5000 without runs allowed: > 4096 forces a bitmap
    f = walk_roaring(serialize_roaring(list(range(5000)),
                                       allow_runs=False))
    assert (f["n_run"], f["n_bitmap"], f["n_array"]) == (0, 1, 0)
    # 100 scattered values: array beats 100 runs and the bitmap
    vals = [i * 613 % 65536 for i in range(100)]
    f = walk_roaring(serialize_roaring(sorted(set(vals))))
    assert (f["n_run"], f["n_bitmap"], f["n_array"]) == (0, 0, 1)


def test_offset_header_verification_is_real():
    """No-run layout carries u32 container offsets; nudging one must
    fail the walk — the reader provably cross-checks them."""
    blob = bytearray(serialize_roaring([1, 2, 70000], allow_runs=False))
    # layout: cookie(4) + count(4) + desc(2*4) + offsets(2*4)
    off0 = struct.unpack_from("<I", blob, 16)[0]
    struct.pack_into("<I", blob, 16, off0 + 2)
    with pytest.raises(ValueError, match="offset header"):
        walk_roaring(bytes(blob))


def test_popcount_recount_is_real():
    """A flipped bitmap bit under an intact declared cardinality must
    be caught by the recount, not silently change the kill-set."""
    with pytest.raises(ValueError, match="popcount"):
        walk_roaring(_rg_blob(0, "popmiss"))
    with pytest.raises(ValueError, match="popcount"):
        walk_roaring(_rg_blob(1, "popmiss"))  # no-run layout too


def test_typed_verdicts():
    with pytest.raises(ValueError):
        walk_roaring(_rg_blob(0, "trunc"))
    with pytest.raises(NotImplementedError, match="cookie"):
        walk_roaring(_rg_blob(0, "badcookie"))
    with pytest.raises(ValueError, match="strictly increasing"):
        serialize_roaring([5, 5])
    with pytest.raises(ValueError, match="u32"):
        serialize_roaring([1 << 33])


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "delta_deletion_vectors")
