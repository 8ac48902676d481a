"""Iceberg v2 merge-on-read: the delete-file fold (position +
equality) with sequence gating, cross-file position dedup, the
pos∩eq overlap, the five verdict classes, and the oracle compare."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.operators.avrowalk import walk_avro
from pyspark_postgres_loader_spark.operators.icebergmor import (
    _IM_GROUPS,
    _im_eq_ids,
    _im_live,
    _im_n_entries,
    _im_n_manifests,
    _im_npos,
    _im_payloads,
    _im_rc,
    walk_iceberg_mor,
)


def _clean_doc(g: int) -> int:
    d = g
    while any((d % 11 == 3, d % 17 == 2, d % 13 == 5, d % 19 == 7)):
        d += _IM_GROUPS
    return d


def test_mor_fold_matches_python_replay_every_group():
    for g in range(_IM_GROUPS):
        f = walk_iceberg_mor(*_im_payloads(_clean_doc(g)))
        pre = sum(_im_rc(g, m, e)
                  for m in range(_im_n_manifests(g))
                  for e in range(_im_n_entries(g, m)) if _im_live(e))
        pos = sum(_im_npos(g, m, e)
                  for m in (0, 1)
                  for e in range(_im_n_entries(g, m)) if _im_live(e))
        # pd2's duplicate (file(0,0), 0) only adds a kill when
        # npos(g,0,0) = g%4 = 0 left position 0 alive
        pos += 1 if g % 4 == 0 else 0
        ov = 1 if (1 + g) % 4 >= 1 else 0
        assert f["live_rows_pre"] == pre
        assert f["pos_applied"] == pos
        assert f["eq_matched"] == 2
        assert f["overlap_both"] == ov
        assert f["live_rows_mor"] == pre - pos - 2 + ov
        assert f["n_data_manifests"] == _im_n_manifests(g)
        assert (f["n_delete_manifests"], f["n_delete_files"]) == (1, 3)


def test_sequence_gates_are_non_vacuous():
    """The fixture plants a position row against a seq-3 (m=2) file
    and an equality id against a seq-2 (m=1) file; both must fold to
    zero — remove the gates and the counts shift."""
    g = 1  # n_manifests(1) = 3, so the m=2 position row exists
    mlist, store = _im_payloads(_clean_doc(g))
    pd2 = walk_avro(store[f"meta/del{g}_1.avro"])
    assert any(p.endswith("_2_0.parquet") for p, _ in pd2["records"])
    eq = walk_avro(store[f"meta/del{g}_2.avro"])
    ids = [v for (v,) in eq["records"]]
    assert _im_eq_ids(g)[3] in ids          # the m=1-targeting id D
    f = walk_iceberg_mor(mlist, store)
    # replay WITHOUT the gated rows gives the same counts
    pos = sum(_im_npos(g, m, e) for m in (0, 1)
              for e in range(_im_n_entries(g, m)) if _im_live(e))
    assert f["pos_applied"] == pos and f["eq_matched"] == 2


def test_duplicate_position_rows_count_once():
    """pd1 and pd2 both carry (file(0,0), pos 0) whenever
    npos(g,0,0) >= 1 — the fold must dedup across delete files."""
    g = 1
    assert _im_npos(g, 0, 0) == g % 4 >= 1
    mlist, store = _im_payloads(_clean_doc(g))
    pd1 = walk_avro(store[f"meta/del{g}_0.avro"])
    pd2 = walk_avro(store[f"meta/del{g}_1.avro"])
    tgt = f"data/f{g}_0_0.parquet"
    assert (tgt, 0) in pd1["records"] and (tgt, 0) in pd2["records"]
    # covered by the replay test's pos_applied equality; assert again
    f = walk_iceberg_mor(mlist, store)
    pos = sum(_im_npos(g, m, e) for m in (0, 1)
              for e in range(_im_n_entries(g, m)) if _im_live(e))
    assert f["pos_applied"] == pos


def test_typed_verdicts():
    """Each fault class raises its typed error: truncated delete file
    ('corrupt'), dangling delete path ('missing'), out-of-range
    position ('invalid'), unknown delete content ('unsupported')."""
    with pytest.raises(ValueError):
        walk_iceberg_mor(*_im_payloads(3))          # % 11 == 3
    with pytest.raises(ValueError, match="missing"):
        walk_iceberg_mor(*_im_payloads(19))         # % 17 == 2
    with pytest.raises(ValueError, match="out of range"):
        walk_iceberg_mor(*_im_payloads(18))         # % 13 == 5
    with pytest.raises(NotImplementedError, match="delete content"):
        walk_iceberg_mor(*_im_payloads(26))         # % 19 == 7


def test_record_count_consistency_check_is_real():
    """A delete manifest entry whose record_count disagrees with the
    decoded delete file must fail — the 'invalid' fixture rebuilds
    the manifest precisely so THIS check does not mask the
    out-of-range verdict."""
    g = 0
    mlist, store = _im_payloads(_clean_doc(g))
    # lie about pd1's row count by rebuilding the delete manifest
    from pyspark_postgres_loader_spark.operators.icebergmor import (
        _im_del_manifest,
    )
    sync = bytes((g * 7 + i * 3 + 2) % 256 for i in range(16))
    store[f"meta/del{g}.avro"] = _im_del_manifest(g, sync, pd0_count=99)
    with pytest.raises(ValueError, match="record_count mismatch"):
        walk_iceberg_mor(mlist, store)


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "iceberg_mor_deletes")
