"""Error-bound behavior tests for the approximate sketch aggregates:
the sketches must land within their documented error of the exact
values they substitute for at scale."""

from __future__ import annotations

from pyspark_postgres_loader_spark.operators.relational import agg_approx_sketches

SF_DIR = "/root/testdata/sf0.01"


def test_sketches_within_error_bounds(spark):
    row = agg_approx_sketches(spark, SF_DIR).collect()[0]
    # HLL++ default rsd is 5%; allow 3 sigma
    rel_err = abs(row.approx_parts - row.exact_parts) / row.exact_parts
    assert rel_err <= 0.15, (row.approx_parts, row.exact_parts)
    # GK with accuracy 10000 → rank error ~1e-4; price quantiles are
    # dense, so the approx median must sit within 1% of exact
    rel_err_p = abs(row.approx_median_price - row.exact_median_price) / row.exact_median_price
    assert rel_err_p <= 0.01, (row.approx_median_price, row.exact_median_price)
