"""Global plan-quality gate: no registered batch query may plan a
CartesianProduct. An accidental unkeyed join is O(n^2) shuffle I/O at
100 TB; every intentional cross join in this repo is a 1-row scalar
broadcast (BroadcastNestedLoopJoin over a 1-row build side), which is
a different physical node. Streaming queries are skipped: building
their result executes the stream (plan inspection happens in their own
plan-shape and recovery tests)."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.registry import QUERIES, _ensure_loaded

_ensure_loaded()
BATCH_QUERIES = sorted(n for n in QUERIES if not n.startswith("stream_"))


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_cartesian_product(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, (
        f"{name} plans a CartesianProduct:\n{plan[:1500]}"
    )
