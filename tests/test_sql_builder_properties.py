"""Property-based tests (hypothesis) for the upsert SQL builder —
invariants that must hold for EVERY column set / key subset / dialect,
not just the golden cases in test_upsert_sink.py.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_postgres_loader_spark.sinks.sql_builder import (
    DIALECTS,
    build_upsert_sql,
)

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
_columns = st.lists(_ident, min_size=1, max_size=8, unique=True)


@st.composite
def _cols_and_key(draw):
    cols = draw(_columns)
    key_size = draw(st.integers(min_value=0, max_value=len(cols)))
    key = draw(st.permutations(cols)) [:key_size] if key_size else None
    return cols, key


@given(_cols_and_key(), st.sampled_from(sorted(DIALECTS)))
@settings(max_examples=200, deadline=None)
def test_upsert_sql_invariants(cols_key, dialect_name):
    cols, key = cols_key
    dialect = DIALECTS[dialect_name]
    sql = build_upsert_sql(cols, "sch.tbl", key, dialect=dialect)

    # one placeholder per column, in the dialect's style
    if dialect.placeholder == "$n":
        assert [f"${i+1}" for i in range(len(cols))] == re.findall(r"\$\d+", sql)
    else:
        values = sql.split("VALUES (", 1)[1].split(")", 1)[0]
        assert values.count(dialect.placeholder) == len(cols)

    if not key:
        assert "ON CONFLICT" not in sql  # insert-only fallback
        return

    assert f"ON CONFLICT ({', '.join(key)})" in sql
    update_cols = [c for c in cols if c not in set(key)]
    if not update_cols:
        assert sql.endswith("DO NOTHING")  # all columns are key columns
    else:
        set_clause = sql.split("DO UPDATE SET ", 1)[1]
        # every non-key column updates from EXCLUDED; no key column does
        for c in update_cols:
            assert f"EXCLUDED.{c}" in re.findall(r"EXCLUDED\.[a-z0-9_]+", set_clause)
        for k in key:
            assert k not in {
                m.split(".")[1] for m in re.findall(r"EXCLUDED\.[a-z0-9_]+", set_clause)
            }


@given(_columns, _columns)
@settings(max_examples=100, deadline=None)
def test_upsert_rejects_foreign_key_columns(cols, other):
    foreign = [c for c in other if c not in cols]
    if not foreign:
        return
    try:
        build_upsert_sql(cols, "t", foreign)
        raised = False
    except ValueError:
        raised = True
    assert raised
