"""Skyline invariants: antichain property, band-width invariance, and
the no-global-window / no-cartesian plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.operators import preference
from pyspark_postgres_loader_spark.registry import all_queries
from pyspark_postgres_loader_spark.tables import load_table


def test_skyline_is_antichain(spark, sf_dir):
    sky = all_queries()["skyline_orders_price_date"](spark, sf_dir).toPandas()
    rows = list(sky.itertuples(index=False))
    for a in rows:
        for b in rows:
            if a.o_orderkey == b.o_orderkey:
                continue
            dominates = (
                b.o_totalprice >= a.o_totalprice
                and b.o_orderdate >= a.o_orderdate
                and (
                    b.o_totalprice > a.o_totalprice
                    or b.o_orderdate > a.o_orderdate
                )
            )
            assert not dominates


def test_skyline_members_not_dominated_by_corpus(spark, sf_dir):
    """Every skyline row survives a check against the FULL table, and
    every non-member is dominated by someone (exact completeness)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    sky_keys = {
        r["o_orderkey"]
        for r in all_queries()["skyline_orders_price_date"](spark, sf_dir)
        .select("o_orderkey")
        .collect()
    }
    rows = o.collect()
    for a in rows:
        dominated = any(
            b["o_totalprice"] >= a["o_totalprice"]
            and b["o_orderdate"] >= a["o_orderdate"]
            and (
                b["o_totalprice"] > a["o_totalprice"]
                or b["o_orderdate"] > a["o_orderdate"]
            )
            for b in rows
            if b["o_orderkey"] != a["o_orderkey"]
        )
        assert (a["o_orderkey"] in sky_keys) == (not dominated)


def test_skyline_invariant_to_band_width(spark, sf_dir, monkeypatch):
    base = all_queries()["skyline_orders_price_date"](spark, sf_dir).toPandas()
    monkeypatch.setattr(preference, "_SKY_BAND_WIDTH", 3_333.0)
    narrow = preference.skyline_orders_price_date(spark, sf_dir).toPandas()
    assert sorted(base["o_orderkey"]) == sorted(narrow["o_orderkey"])


def test_skyline_plan_shape(spark, sf_dir):
    df = all_queries()["skyline_orders_price_date"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
