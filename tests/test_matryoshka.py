"""Matryoshka truncation recall: monotone-ish curve shape, the d=64
self-check, prefix-fold consistency, and the oracle compare."""

from __future__ import annotations

from pyspark_postgres_loader_spark.operators.matryoshka import (
    _MRL_DIMS,
    _MRL_K,
    embedding_matryoshka_recall,
)
from pyspark_postgres_loader_spark.operators.similarity import _QUERY_IDS

_SF = "/root/testdata/sf0.001"


def test_report_shape_and_full_dim_self_check(spark):
    rows = {r.dim: r for r in
            embedding_matryoshka_recall(spark, _SF).collect()}
    assert set(rows) == set(_MRL_DIMS)
    for d, r in rows.items():
        assert r.n_queries == len(_QUERY_IDS)
        assert r.k == _MRL_K
        assert 0 <= r.n_hits <= _MRL_K * len(_QUERY_IDS)
        assert r.recall == r.n_hits / (_MRL_K * len(_QUERY_IDS))
    # the full dimension IS the ground truth: recall exactly 1.0
    full = rows[max(_MRL_DIMS)]
    assert full.n_hits == _MRL_K * len(_QUERY_IDS)
    assert full.recall == 1.0


def test_wider_prefix_never_much_worse(spark):
    # untrained synthetic embeddings aren't strictly monotone, but
    # the widest truncation must beat the narrowest
    rows = {r.dim: r for r in
            embedding_matryoshka_recall(spark, _SF).collect()}
    assert rows[max(_MRL_DIMS)].n_hits > rows[min(_MRL_DIMS)].n_hits


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, _SF, "embedding_matryoshka_recall")
