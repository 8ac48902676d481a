"""presentation_sort (functions/planctl.py): the staged total-order
presentation sort must (a) return exactly the rows and ROW ORDER of a
plain ``orderBy`` and (b) plan as hash-exchange → range-exchange →
Sort, so the range sampler reads materialized shuffle output instead
of re-executing the (expensive, e.g. Python-decode) child a second
time (r15 optimization; RangePartitioner.sketch is a full extra pass
over its child RDD)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.functions.planctl import presentation_sort
from pyspark_postgres_loader_spark.registry import QUERIES, _ensure_loaded

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def test_same_rows_same_order_as_plain_orderby(spark):
    df = spark.range(0, 997).select(
        (F.col("id") * 37 % 991).alias("k"),
        (F.col("id") * 7919 % 104729).alias("v"),
    )
    plain = [tuple(r) for r in df.orderBy("k", "v").collect()]
    staged = [tuple(r) for r in df.transform(presentation_sort, "k", "v").collect()]
    assert staged == plain


def _node_sequence(df) -> list[str]:
    """Ordered (top-down) node markers from the physical-plan tree
    string: one marker per plan LINE (no raw character offsets, so
    operator-name suffixes / argument changes across Spark versions
    cannot skew the comparison)."""
    out: list[str] = []
    for line in df._jdf.queryExecution().executedPlan().toString().splitlines():
        if "Exchange rangepartitioning" in line:
            out.append("exchange:range")
        elif "Exchange hashpartitioning" in line:
            out.append("exchange:hash")
        elif "MapInPandas" in line or "EvalPython" in line:
            out.append("python")
    return out


def test_staged_sort_plans_hash_exchange_on_synthetic_input(spark):
    """Fixture-free plan-shape check: the staged sort must put a hash
    exchange between the range exchange and the child."""
    df = spark.range(0, 997).select((F.col("id") * 37 % 991).alias("k"))
    kinds = [
        k
        for k in _node_sequence(df.transform(presentation_sort, "k"))
        if k.startswith("exchange")
    ]
    assert kinds[0] == "exchange:range", kinds
    assert "exchange:hash" in kinds[1:], kinds


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"fixture dir {SF_DIR} absent"
)
def test_walk_query_plan_stages_a_hash_exchange_below_the_sort(spark):
    """On a real decode walk the Python decode must sit below BOTH
    exchanges (pre-order: range exchange, then hash exchange, then the
    MapInPandas decode)."""
    _ensure_loaded()
    df = QUERIES["ingest_gzip_member_walk"].fn(spark, SF_DIR)
    seq = _node_sequence(df)
    try:
        i_range = seq.index("exchange:range")
        i_hash = seq.index("exchange:hash")
        i_py = seq.index("python")
    except ValueError:
        pytest.fail(f"expected range+hash exchanges and a python node: {seq}")
    assert i_range < i_hash < i_py, seq
