"""Dynamic partition pruning proof: a date-partitioned fact joined to a
selectively-filtered dimension must plan a runtime DPP subquery on the
partition column — at 100 TB this is the difference between scanning
every date partition and scanning only the ones the dimension
actually selects (the filter value is only known at RUN time, so
static pruning cannot do this)."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F

from pyspark_postgres_loader_spark.tables import load_table


def test_fact_scan_gets_dynamic_pruning_subquery(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="dpp_fact_")
    try:
        orders = load_table(spark, sf_dir, "orders").withColumn(
            "o_month", F.date_format("o_orderdate", "yyyy-MM")
        )
        orders.write.mode("overwrite").partitionBy("o_month").parquet(out)

        fact = spark.read.parquet(out)
        months = (
            orders.select(F.col("o_month").alias("m"), "o_orderpriority")
            .distinct()
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .filter(F.col("m") < "1995-04")  # selective: 3 of ~80 months
        )
        joined = fact.join(
            F.broadcast(months), fact.o_month == months.m
        ).groupBy("o_month").count()

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]

        # and the pruned result equals the statically-filtered truth
        got = {(r.o_month, r["count"]) for r in joined.collect()}
        want = {
            (r.o_month, r["count"])
            for r in orders.filter(F.col("o_month") < "1995-04")
            .groupBy("o_month")
            .count()
            .collect()
        }
        assert got == want and got
    finally:
        shutil.rmtree(out, ignore_errors=True)
