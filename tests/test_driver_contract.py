"""Driver-contract invariants: __spark_entry__ surface shape and the
registry's explicit driver-facing ordering (the round driver records
correctness for a bounded prefix of queries(), so the order IS part of
the contract)."""

from __future__ import annotations

import __spark_entry__ as E
from pyspark_postgres_loader_spark.registry import _PRIORITY, QUERIES, _ensure_loaded


def test_queries_and_oracles_align():
    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs)
    # round-2 invariant: every registered query is oracle-checked
    assert set(oracles) == set(qs)
    assert all(isinstance(sql, str) and "SELECT" in sql.upper() for sql in oracles.values())


def test_priority_prefix_is_registration_order():
    _ensure_loaded()
    names = list(QUERIES.keys())
    assert names[: len(_PRIORITY)] == _PRIORITY
    # the prefix covers every family with no prior driver verdict
    prefix = set(_PRIORITY)
    assert {n for n in names if n.startswith("stream_")} <= prefix
    assert {n for n in names if n.startswith("text_")} <= prefix
    assert {n for n in names if n.startswith("sample_")} <= prefix
    assert {n for n in names if n.startswith("multimodal_")} <= prefix


def test_entry_smoke(spark):
    rows = E.entry(spark).collect()
    assert len(rows) > 0
    assert {"l_returnflag", "l_linestatus"} <= set(rows[0].asDict())
