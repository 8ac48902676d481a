"""Error-bound behavior tests for the approximate sketch aggregates:
the sketches must land within their documented error of the exact
values they substitute for at scale. The registered query's compare
surface is the error-contract booleans (raw sketch values are
engine-specific); this test asserts both the booleans and tighter raw
bounds recomputed here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.operators.relational import agg_approx_sketches
from pyspark_postgres_loader_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_sketches_within_error_bounds(spark):
    row = agg_approx_sketches(spark, SF_DIR).collect()[0]
    assert row.approx_parts_ok, row
    assert row.approx_median_ok, row

    # raw-value bounds, recomputed from the sketches directly:
    l = load_table(spark, SF_DIR, "lineitem")
    raw = l.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median"),
    ).collect()[0]
    # HLL++ default rsd is 5%; allow 3 sigma
    rel_err = abs(raw.approx_parts - raw.exact_parts) / raw.exact_parts
    assert rel_err <= 0.15, (raw.approx_parts, raw.exact_parts)
    # GK with accuracy 10000 → rank error ~1e-4; price quantiles are
    # dense, so the approx median must sit within 1% of exact
    rel_err_p = abs(raw.approx_median - raw.exact_median) / raw.exact_median
    assert rel_err_p <= 0.01, (raw.approx_median, raw.exact_median)
