"""Invariant + plan-shape tests for the round-5 session-2 operators
(OHLC resample, boilerplate share, expectations report). Cross-engine
equality is proven by test_oracle_differential; these pin semantic
properties and the scale-critical plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.registry import QUERIES, _ensure_loaded
from pyspark_postgres_loader_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _loaded():
    _ensure_loaded()


# --- timeseries_ohlc_hourly -------------------------------------------------


def test_ohlc_bounds_and_conservation(spark):
    df = QUERIES["timeseries_ohlc_hourly"].fn(spark, SF)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.low_value <= r.open_value <= r.high_value
        assert r.low_value <= r.close_value <= r.high_value
        assert r.n_events >= 1
        # hour-aligned bucket
        assert r.bucket.minute == 0 and r.bucket.second == 0
    total = sum(r.n_events for r in rows)
    assert total == load_table(spark, SF, "events").count()


def test_ohlc_single_bucket_open_equals_close_on_one_event(spark):
    df = QUERIES["timeseries_ohlc_hourly"].fn(spark, SF)
    for r in df.filter(F.col("n_events") == 1).collect():
        assert r.open_value == r.close_value == r.high_value == r.low_value


def test_ohlc_plan_is_window_free_single_agg(spark):
    # the whole resample must compile to hash aggregation via
    # min_by/max_by — a Window here would add a per-key sort + extra
    # shuffle, the thing the operator exists to avoid
    plan = QUERIES["timeseries_ohlc_hourly"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # min_by/max_by over a struct ordering key has an immutable buffer,
    # so Spark picks SortAggregate — still a partial/final aggregate
    # pair around ONE hash exchange (the second exchange is the display
    # orderBy's range partitioning, not a data shuffle per row group)
    assert "SortAggregate" in plan or "HashAggregate" in plan
    assert plan.count("Exchange hashpartitioning") == 1


# --- text_boilerplate_share -------------------------------------------------


def test_boilerplate_share_invariants(spark):
    rows = QUERIES["text_boilerplate_share"].fn(spark, SF).collect()
    assert len(rows) == load_table(spark, SF, "documents").filter(
        F.size(F.split(F.lower("text"), r"\s+")) >= 2
    ).count()
    assert any(r.n_boiler > 0 for r in rows), "fixture should contain boilerplate"
    for r in rows:
        assert 0 <= r.n_boiler <= r.n_bigrams
        assert 0.0 <= r.boiler_share <= 1.0
        assert abs(r.boiler_share - r.n_boiler / r.n_bigrams) < 1e-12


def test_boilerplate_marking_join_is_broadcast(spark):
    # the boilerplate set is tiny by construction; marking docs must be
    # a broadcast join, not a shuffled one (second big shuffle at scale)
    plan = QUERIES["text_boilerplate_share"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- quality_expectations_report --------------------------------------------


def test_expectations_report_shape_and_consistency(spark):
    rows = {r.check_name: r for r in QUERIES["quality_expectations_report"].fn(spark, SF).collect()}
    assert len(rows) == 8
    n_orders = load_table(spark, SF, "orders").count()
    n_lineitem = load_table(spark, SF, "lineitem").count()
    for name, r in rows.items():
        assert r.violations >= 0
        assert r.passed == (r.violations == 0)
        expected_checked = n_orders if name.startswith("orders_") else n_lineitem
        assert r.checked == expected_checked, name
    # the fixture's orderdate tail deliberately violates the freshness
    # cutoff — an all-green report would be vacuous
    assert not rows["orders_orderdate_recency"].passed
    assert rows["orders_orderkey_unique"].passed
    assert rows["lineitem_orderkey_fk"].passed


def test_expectations_plan_single_scan_per_constraint_family(spark):
    # orders constraint family: one aggregate over one scan (plus the
    # FK join's own scan) — adding a constraint must not add a scan.
    # The report unions 3 branches: orders agg, lineitem agg, FK join
    # (2 scans) + the FK 'checked' count → 5 parquet scans total.
    plan = QUERIES["quality_expectations_report"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 5
