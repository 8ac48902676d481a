"""Invariants of the plan-shaping helpers (functions/planctl.py):
nondet_keep must never change a value, only planning; spread must only
change partitioning, never content."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.functions.planctl import nondet_keep, spread


def test_nondet_keep_is_value_identical(spark):
    df = spark.range(1000).select(
        "id",
        (F.col("id") * 0.123456789 / 7.0).alias("x"),
    )
    out = df.select("id", "x", nondet_keep(F.col("x")).alias("kept")).collect()
    assert all(r.x == r.kept for r in out)  # bitwise equal, every row


def test_nondet_keep_blocks_filter_pushdown_into_join(spark):
    a = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 1.5).alias("va"))
    b = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2.5).alias("vb"))
    joined = a.join(b, "k").select("k", nondet_keep(F.col("va") + F.col("vb")).alias("s"))
    plan = joined.filter(F.col("s") > 10)._jdf.queryExecution().optimizedPlan().toString()
    # the (va + vb) expression must NOT appear inside the Join condition
    join_line = [l for l in plan.splitlines() if "Join" in l][0]
    assert "+" not in join_line.split("Join", 1)[1], join_line


def test_spread_preserves_content_and_widens(spark):
    df = spark.range(500).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    s = spread(df)
    assert s.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r.id for r in s.collect()) == list(range(500))
