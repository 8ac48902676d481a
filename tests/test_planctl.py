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


def test_spread_gate_never_converts_plan_to_rdd(spark, monkeypatch):
    """The narrowness gate must stay driver-side metadata: the old
    ``df.rdd.getNumPartitions()`` probe forced a plan→RDD conversion on
    EVERY query build (measurable driver overhead at query volume).
    Poison the .rdd property — spread() must not touch it."""
    from pyspark.sql import DataFrame

    def _boom(self):
        raise AssertionError("spread() gate converted the plan to an RDD")

    monkeypatch.setattr(DataFrame, "rdd", property(_boom))
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = spread(df)  # must not raise
    assert out.count() > 0


def test_spread_skips_shuffle_on_wide_file_scan(spark, monkeypatch):
    """A scan whose estimated width already meets the target
    parallelism is returned UNCHANGED — at 100 TB the scan is wide and
    an unconditional repartition would shuffle the corpus for nothing.
    Simulated by shrinking maxPartitionBytes so the fixture file counts
    as many splits."""
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try:
        df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        s = spread(df)
        assert s is df  # no Repartition node added
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
