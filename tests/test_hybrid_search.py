"""Hybrid RRF fusion: rank-set semantics, integer-micro contribution
exactness, anchor self-rank, and the oracle compare."""

from __future__ import annotations

from pyspark_postgres_loader_spark.operators.hybrid_search import (
    _FUSED_TOPK,
    _HQ,
    _RRF_K,
    search_rrf_fusion,
)

_SF = "/root/testdata/sf0.001"


def test_fused_shape_and_rank_contiguity(spark):
    rows = search_rrf_fusion(spark, _SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {qid for qid, _, _ in _HQ}
    for qid, rs in by_q.items():
        ranks = sorted(r.fused_rank for r in rs)
        assert ranks == list(range(1, _FUSED_TOPK + 1))
        # fused ordering is by fused_micros desc with doc_id tiebreak
        rs = sorted(rs, key=lambda r: r.fused_rank)
        micros = [r.fused_micros for r in rs]
        assert micros == sorted(micros, reverse=True) or all(
            micros[i] > micros[i + 1]
            or (micros[i] == micros[i + 1]
                and rs[i].doc_id < rs[i + 1].doc_id)
            for i in range(len(rs) - 1))


def test_contributions_are_quantized_rank_micros(spark):
    for r in search_rrf_fusion(spark, _SF).collect():
        want = 0
        if r.kw_rank:
            want += 1_000_000 // (_RRF_K + r.kw_rank)
        if r.vec_rank:
            want += 1_000_000 // (_RRF_K + r.vec_rank)
        assert r.fused_micros == want
        assert r.kw_rank or r.vec_rank  # a fused doc came from a pool


def test_anchor_ranks_first_on_vector_side(spark):
    rows = search_rrf_fusion(spark, _SF).collect()
    anchors = {qid: vid for qid, _, vid in _HQ}
    for r in rows:
        if r.doc_id == anchors[r.query_id]:
            # the dense query is its own nearest neighbor
            assert r.vec_rank == 1


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, _SF, "search_rrf_fusion")
