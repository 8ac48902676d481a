"""Bucketed (co-located) join: write two tables bucketed on the join
key, join them, and assert the physical plan contains NO shuffle
exchange — the layout-level optimization that removes the dominant cost
of repeated fact-fact joins at 100 TB (pay one bucketed write, then
every subsequent join on that key is exchange-free).
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free(spark):
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_lineitem = f"b_orders_{suffix}", f"b_lineitem_{suffix}"
    # at sf0.001 Spark would broadcast (also shuffle-free, but not what
    # we're demonstrating): force the sort-merge path a fact-fact join
    # takes at real scale
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        (
            load_table(spark, SF_DIR, "orders")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(t_orders)
        )
        (
            load_table(spark, SF_DIR, "lineitem")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(t_lineitem)
        )
        o = spark.table(t_orders)
        l = spark.table(t_lineitem)
        joined = o.join(l, o.o_orderkey == l.l_orderkey).groupBy("o_orderstatus").agg(
            F.count("*").alias("n")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not shuffle either side: the only allowed
        # exchange is the post-join aggregation's
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:2000]
        assert "Exchange hashpartitioning" not in join_part, join_part[:2000]

        # and the result matches the plain (shuffled) join
        plain = (
            load_table(spark, SF_DIR, "orders")
            .join(
                load_table(spark, SF_DIR, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_lineitem}")
