"""Runtime Bloom-filter join pruning (Spark 3.3+, on by default): a
selective filter on one shuffle-join side injects bloom_filter_agg →
might_contain on the other side, discarding non-joining fact rows
BEFORE the shuffle. At 100 TB this is the difference between shuffling
the whole fact table and shuffling the ~1% that can actually join —
free from Catalyst as long as joins stay declarative, which is exactly
why this engine never hand-schedules them."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_selective_shuffle_join_gets_bloom_pruned(spark):
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        # force the shuffle-join path (tiny fixtures would broadcast) and
        # drop the application-side size floor so small scans qualify too
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        l = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders").filter(F.col("o_totalprice") > 450000)
        j = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:1500]
        assert "might_contain" in plan
        # and the pruned join still returns correct results
        plain = (
            load_table(spark, SF_DIR, "lineitem")
            .join(
                load_table(spark, SF_DIR, "orders").filter(F.col("o_totalprice") > 450000),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert sum(r["count"] for r in j.collect()) == plain
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
