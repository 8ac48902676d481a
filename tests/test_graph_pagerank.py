"""Semantic invariants for the integer-exact PageRank — the oracle
differential proves Spark==DuckDB; these pin the properties that make
the numbers *right*, not just reproducible."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.operators.graph import (
    _PR_BASE,
    _PR_INIT,
    _PR_ITERS,
)
from pyspark_postgres_loader_spark.registry import QUERIES, _ensure_loaded
from pyspark_postgres_loader_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(spark):
    _ensure_loaded()
    return QUERIES["graph_pagerank_custsupp"].fn(spark, SF).collect()


def test_pagerank_covers_every_graph_node(spark, result):
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    n_cust = pairs.select("o_custkey").distinct().count()
    n_supp = pairs.select("l_suppkey").distinct().count()
    assert sum(1 for r in result if not r.is_supplier) == n_cust
    assert sum(1 for r in result if r.is_supplier) == n_supp
    assert len(result) == n_cust + n_supp


def test_pagerank_mass_conservation_within_floor_loss(result):
    # each of the K rounds redistributes 85% of the mass and injects
    # 15% base; floor division loses < 1 micro-rank per directed edge
    # per round, so total mass sits in (n*INIT - K*|E|, n*INIT]
    n = len(result)
    total = sum(r.rank_micros for r in result)
    assert total <= n * _PR_INIT
    # |E| (directed) is bounded by n^2 but actually small; recompute a
    # loose bound from the result itself: loss observed must be tiny
    # relative to total mass (< 0.1%)
    assert (n * _PR_INIT - total) < 0.001 * n * _PR_INIT


def test_pagerank_floor_is_base_term(result):
    assert all(r.rank_micros >= _PR_BASE for r in result)


def test_pagerank_hubs_outrank_leaves(result):
    # suppliers are massive hubs (every customer buys from few
    # suppliers) — every supplier must outrank every customer
    supp_min = min(r.rank_micros for r in result if r.is_supplier)
    cust_max = max(r.rank_micros for r in result if not r.is_supplier)
    assert supp_min > cust_max


def test_pagerank_iteration_count_is_pinned():
    # the oracle's chained CTEs replay exactly K iterations; a drive-by
    # change to one side silently desyncs the differential
    assert _PR_ITERS == 5
    assert QUERIES["graph_pagerank_custsupp"].oracle.count("JOIN r") == _PR_ITERS
