"""Property tests for the sink's bisection-quarantine core
(`sinks.upsert._batch_and_upsert`) — driven as a plain Python iterator
consumer, no Spark session: for ANY poison pattern, batch size, and
execution mode (multirow fast path vs executemany, savepoint vs
commit-per-chunk), the accounting invariants and final DB state hold.

The e2e tests pick a handful of poison layouts; these cover the space:
poison at batch boundaries, all-poison batches (early abort), empty
input, batch_size 1 (degenerate bisection), and adjacent poison runs.
"""

from __future__ import annotations

import functools
import os
import uuid

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_postgres_loader_spark.sinks.sql_builder import POSTGRES, build_upsert_sql
from pyspark_postgres_loader_spark.sinks.upsert import _batch_and_upsert

from tests import fake_pg


def _run(tmpdir: str, rows, batch_size: int, multirow: bool):
    """Drive the per-partition consumer exactly as the Spark task does,
    against a fresh fake-pg database. Poison = negative qty (CHECK
    constraint). Returns (stats tuple, surviving ids in the DB)."""
    path = os.path.join(tmpdir, f"pg-{uuid.uuid4().hex}.db")
    conn = fake_pg.connect(path)
    conn.cursor().execute(
        "CREATE TABLE t (id INTEGER PRIMARY KEY, qty INTEGER NOT NULL CHECK (qty >= 0))"
    )
    conn.commit()

    cols = ["id", "qty"]
    sql = build_upsert_sql(cols, "t", ["id"], dialect=POSTGRES)
    sql_for = (
        functools.partial(build_upsert_sql, cols, "t", ["id"], None, POSTGRES)
        if multirow
        else None
    )
    (out,) = list(
        _batch_and_upsert(
            rows,
            functools.partial(fake_pg.connect, path),
            sql,
            batch_size,
            use_savepoint=True,
            sql_for=sql_for,
        )
    )
    seen, loaded, rejected, messages, aborted, truncated = out
    db_ids = sorted(
        r[0] for r in conn.cursor()._cur.execute("SELECT id FROM t")
    )
    conn.close()
    return (seen, loaded, rejected, aborted), db_ids


@given(
    poison=st.lists(st.booleans(), min_size=0, max_size=60),
    batch_size=st.integers(1, 16),
    multirow=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_quarantine_invariants_for_any_poison_pattern(
    tmp_path_factory, poison, batch_size, multirow
):
    rows = [(i, -1 if bad else i) for i, bad in enumerate(poison)]
    (seen, loaded, rejected, aborted), db_ids = _run(
        str(tmp_path_factory.mktemp("sq")), rows, batch_size, multirow
    )
    n_poison = sum(poison)

    if not aborted:
        # full accounting: every row seen, each either loaded or rejected
        assert seen == len(rows)
        assert loaded + rejected == seen
        assert rejected == n_poison
        # the database holds exactly the clean rows
        assert db_ids == [i for i, bad in enumerate(poison) if not bad]
    else:
        # early abort fires only after a WHOLE batch was rejected
        # row-by-row; everything processed up to that point still obeys
        # loaded + rejected == seen, and nothing loaded is poison
        assert loaded + rejected == seen <= len(rows)
        assert rejected >= batch_size  # at least the aborting batch
        assert set(db_ids) <= {i for i, bad in enumerate(poison) if not bad}

    # loaded rows are in the DB in both cases
    assert loaded == len(db_ids)


@given(batch_size=st.integers(1, 8), multirow=st.booleans())
@settings(max_examples=20, deadline=None)
def test_all_poison_aborts_partition(tmp_path_factory, batch_size, multirow):
    rows = [(i, -1) for i in range(batch_size * 3)]
    (seen, loaded, rejected, aborted), db_ids = _run(
        str(tmp_path_factory.mktemp("sq")), rows, batch_size, multirow
    )
    assert aborted  # first full batch rejected row-by-row → stop early
    assert loaded == 0 and db_ids == []
    assert seen == batch_size  # stopped after the first batch
    assert rejected == batch_size


@given(multirow=st.booleans())
@settings(max_examples=10, deadline=None)
def test_empty_partition_never_connects(tmp_path_factory, multirow):
    tmpdir = str(tmp_path_factory.mktemp("sq"))
    (seen, loaded, rejected, aborted), db_ids = _run(tmpdir, [], 5, multirow)
    assert (seen, loaded, rejected, aborted) == (0, 0, 0, False)
