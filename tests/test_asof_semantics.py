"""Edge-case semantics of the as-of join, pinned with crafted rows:
no-prior-order → NULLs; inclusive <= at equal timestamps; ties at the
same order date resolve to the highest o_orderkey."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _asof(spark, events, orders):
    """The union+window merge from joins_advanced.join_asof_latest_order,
    applied to crafted frames (same construction, table-free)."""
    e = events.select(
        F.col("user_id").alias("k"), F.col("ts").alias("t"),
        F.lit(1).alias("is_event"), "event_id",
        F.lit(None).cast("bigint").alias("o_orderkey"),
    )
    o = orders.select(
        F.col("o_custkey").alias("k"), F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("bigint").alias("event_id"), "o_orderkey",
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event", F.asc_nulls_first("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.unionByName(o)
        .select(
            "k", "is_event", "event_id",
            F.last("o_orderkey", ignorenulls=True).over(w).alias("asof_orderkey"),
        )
        .filter(F.col("is_event") == 1)
        .select("event_id", "asof_orderkey")
    )


def test_asof_edges(spark):
    T = dt.datetime
    events = spark.createDataFrame(
        [
            (1, 10, T(2024, 1, 5)),   # after both orders → latest (key 21, tie-max)
            (2, 10, T(2024, 1, 2)),   # equal to order date → inclusive match
            (3, 10, T(2024, 1, 1)),   # before any order → NULL
            (4, 99, T(2024, 1, 5)),   # user with no orders at all → NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    orders = spark.createDataFrame(
        [
            (20, 10, T(2024, 1, 2)),  # same date as order 21 (tie)
            (21, 10, T(2024, 1, 2)),  # tie winner: higher key
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    got = {r.event_id: r.asof_orderkey for r in _asof(spark, events, orders).collect()}
    assert got == {1: 21, 2: 21, 3: None, 4: None}
