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
    # rotation invariant: every query that has never received a driver
    # correctness row (absent from all recorded CORRECTNESS_r*.json)
    # must sit in the explicit prefix, where the driver's ~50-row
    # window will reach it this round
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        seen |= set(json.load(open(path)))
    never_checked = [n for n in names if n not in seen]
    prefix = set(_PRIORITY)
    missing = [n for n in never_checked if n not in prefix]
    assert not missing, f"never-driver-checked queries outside the prefix: {missing}"


def test_entry_smoke(spark):
    rows = E.entry(spark).collect()
    assert len(rows) > 0
    assert {"l_returnflag", "l_linestatus"} <= set(rows[0].asDict())
