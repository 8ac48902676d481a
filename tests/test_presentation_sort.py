"""presentation_sort (functions/planctl.py): the staged total-order
presentation sort must (a) return exactly the rows and ROW ORDER of a
plain ``orderBy`` and (b) plan as hash-exchange → range-exchange →
Sort, so the range sampler reads materialized shuffle output instead
of re-executing the (expensive, e.g. Python-decode) child a second
time (r15 optimization; RangePartitioner.sketch is a full extra pass
over its child RDD)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.functions.planctl import presentation_sort
from pyspark_postgres_loader_spark.registry import QUERIES, _ensure_loaded

SF_DIR = "/root/testdata/sf0.01"


def test_same_rows_same_order_as_plain_orderby(spark):
    df = spark.range(0, 997).select(
        (F.col("id") * 37 % 991).alias("k"),
        (F.col("id") * 7919 % 104729).alias("v"),
    )
    plain = [tuple(r) for r in df.orderBy("k", "v").collect()]
    staged = [tuple(r) for r in df.transform(presentation_sort, "k", "v").collect()]
    assert staged == plain


def test_walk_query_plan_stages_a_hash_exchange_below_the_sort(spark):
    _ensure_loaded()
    df = QUERIES["ingest_gzip_member_walk"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Sort over rangepartitioning over hashpartitioning: the sampler's
    # input is the materialized hash shuffle, not the Python decode
    i_range = plan.index("Exchange rangepartitioning")
    i_hash = plan.index("Exchange hashpartitioning")
    assert i_range < i_hash, plan[:1500]
    # the decode itself sits below BOTH exchanges
    assert plan.index("MapInPandas") > i_hash, plan[:1500]
