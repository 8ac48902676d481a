"""Delta time-travel diff: both regimes (overlapping/disjoint live
sets), the single-commit diff, a pure-Python set replay, and the
oracle compare."""

from __future__ import annotations

from pyspark_postgres_loader_spark.operators.deltadiff import (
    _pairs,
    delta_snapshot_diff,
)
from pyspark_postgres_loader_spark.operators.deltalog import (
    _ROWS_A,
    _ROWS_B,
)


def _live(v: int) -> set[int]:
    if v == 0:
        return {0, 1, 2}
    adds = set(range(0, 3)) | {
        f for x in range(1, v + 1) for f in (2 * x + 1, 2 * x + 2)}
    removes = {x - 2 for x in range(2, v + 1)}
    return adds - removes


def test_diff_matches_set_replay(spark):
    nv = 14
    rows = {(r["v_from"], r["v_to"]): r
            for r in delta_snapshot_diff(spark, nv).collect()}
    assert set(rows) == set(_pairs(nv))
    for (v1, v2), r in rows.items():
        l1, l2 = _live(v1), _live(v2)
        added, removed = l2 - l1, l1 - l2
        assert r["n_added"] == len(added), (v1, v2)
        assert r["n_removed"] == len(removed)
        assert r["added_rows"] == sum(_ROWS_A + _ROWS_B * f
                                      for f in added)
        assert r["removed_rows"] == sum(_ROWS_A + _ROWS_B * f
                                        for f in removed)
        assert r["net_rows_delta"] == r["added_rows"] - r["removed_rows"]


def test_both_regimes_are_exercised(spark):
    """(2, nv-1) must be DISJOINT (everything turned over) while
    (nv//3, 2nv//3) overlaps — the diff logic sees both shapes."""
    nv = 14
    v1a, v2a = 2, nv - 1
    assert not (_live(v1a) & _live(v2a))          # disjoint
    v1b, v2b = nv // 3, 2 * nv // 3
    assert _live(v1b) & _live(v2b)                # overlapping
    rows = {(r["v_from"], r["v_to"]): r
            for r in delta_snapshot_diff(spark, nv).collect()}
    assert rows[(v1a, v2a)]["n_removed"] == len(_live(v1a))
    assert rows[(v1b, v2b)]["n_removed"] < len(_live(v1b))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "delta_time_travel_diff")
