"""KMV distinct sketches: estimator accuracy envelope, sketch
mergeability (the union row IS the merge), set-operation sanity,
plan shape, and the oracle compare."""

from __future__ import annotations

from pyspark_postgres_loader_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def _rows(spark, sf=SF):
    q = all_queries()["sketch_kmv_distinct_ops"]
    return {r["scope"]: r for r in q(spark, sf).collect()}


def test_estimator_envelope(spark):
    """K=64 KMV has σ ≈ 1/√(K-2) ≈ 12.7 %; bound singles and union
    at ~3σ. Intersection variance scales with 1/C, so bound it by a
    factor instead."""
    rows = _rows(spark)
    for scope, r in rows.items():
        if scope.startswith("intersect"):
            if r["exact_distinct"] > 0:
                assert (r["exact_distinct"] / 4 <= max(r["est_scaled"], 1)
                        <= r["exact_distinct"] * 4), (scope, dict(r.asDict()))
        else:
            exact = r["exact_distinct"]
            assert abs(r["est_scaled"] - exact) <= 0.4 * exact + 2, (
                scope, dict(r.asDict()))


def test_mix32_is_overflow_free_and_engine_identical(spark):
    """The limb-split hash must (a) equal the mathematical
    ``(e * 2654435761 + 12345) mod 2^32`` computed with Python
    big-ints, (b) agree between Spark and DuckDB, and (c) survive
    e values far past the int64-overflow point of the naive form
    (e ~ 3.4e9, i.e. user_id ~ 34,700 — the round-13 advisory)."""
    import duckdb

    from pyspark_postgres_loader_spark.operators.kmv import (
        _ADD, _MOD, _MULT, _mix32, _mix32_sql)
    from pyspark.sql import functions as F

    es = [0, 1, 65535, 65536, 150_000_000, 3_400_000_000,
          4_294_967_295, 4_294_967_296, 9_000_000_000_000_000_000]
    expect = [(e * _MULT + _ADD) % _MOD for e in es]
    got_spark = [
        r["h"] for r in spark.createDataFrame(
            [(e,) for e in es], "e long")
        .select(_mix32(F.col("e")).alias("h")).collect()]
    assert got_spark == expect
    got_duck = [duckdb.sql(
        f"SELECT {_mix32_sql(str(e))} AS h").fetchone()[0] for e in es]
    assert got_duck == expect


def test_union_dominates_parts(spark):
    """Union exact cardinality >= each part's; the union sketch's
    kth hash <= each part's (more mass below theta)."""
    rows = _rows(spark)
    types = sorted(s for s in rows if ":" not in s)[:2]
    u = rows["union:first2"]
    for t in types:
        assert u["exact_distinct"] >= rows[t]["exact_distinct"]
        if u["n_sketch"] == 64 and rows[t]["n_sketch"] == 64:
            assert u["kth_hash"] <= rows[t]["kth_hash"]


def test_intersection_bounded_by_parts(spark):
    rows = _rows(spark)
    types = sorted(s for s in rows if ":" not in s)[:2]
    i = rows["intersect:first2"]
    assert i["exact_distinct"] <= min(
        rows[t]["exact_distinct"] for t in types)
    assert i["exact_distinct"] + rows["union:first2"]["exact_distinct"] \
        == sum(rows[t]["exact_distinct"] for t in types)  # incl-excl


def test_sketch_sizes(spark):
    rows = _rows(spark)
    for scope, r in rows.items():
        if not scope.startswith("intersect"):
            assert r["n_sketch"] <= 64
            if r["n_sketch"] == 64:
                assert r["kth_hash"] > 0


def test_no_cartesian_or_collect_in_plan(spark):
    q = all_queries()["sketch_kmv_distinct_ops"]
    plan = q(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, SF, "sketch_kmv_distinct_ops")
