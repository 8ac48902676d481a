"""The async-driver adapter must satisfy the sink's full DBAPI call
pattern — proven by running the REAL upsert sink (batching, savepoint
quarantine, bisection) through a fake asyncpg-style async driver backed
by SQLite."""

from __future__ import annotations

import functools
import sqlite3

from pyspark_postgres_loader_spark.sinks.async_adapter import adapt_async_factory
from pyspark_postgres_loader_spark.sinks.sql_builder import SQLITE
from pyspark_postgres_loader_spark.sinks.upsert import upsert_dataframe


class FakeAsyncConnection:
    """asyncpg-style surface (coroutine execute/executemany/close) over
    a sync sqlite connection — the adapter cannot tell the difference."""

    def __init__(self, path: str):
        # autocommit mode: transaction statements (BEGIN/COMMIT/SAVEPOINT)
        # arrive explicitly from the adapter + savepoint guard
        self._db = sqlite3.connect(path, timeout=30, isolation_level=None)

    async def execute(self, sql: str, *params):
        self._db.execute(sql, params)

    async def executemany(self, sql: str, rows):
        self._db.executemany(sql, list(rows))

    async def close(self):
        self._db.close()


async def _connect(path: str):
    return FakeAsyncConnection(path)


def test_sink_runs_through_async_adapter(spark, tmp_path):
    path = str(tmp_path / "async.db")
    setup = sqlite3.connect(path)
    setup.execute(
        "CREATE TABLE t (id INTEGER PRIMARY KEY, qty INTEGER CHECK (qty >= 0))"
    )
    setup.commit()
    setup.close()

    rows = [(i, i if i != 7 else -1) for i in range(20)]  # one poison row
    df = spark.createDataFrame(rows, "id int, qty int").coalesce(1)
    stats = upsert_dataframe(
        df,
        adapt_async_factory(functools.partial(_connect, path)),
        "t",
        ["id"],
        batch_size=8,
        dialect=SQLITE,
    )
    assert stats.rows_loaded == 19
    assert stats.rows_rejected == 1  # quarantined via savepoint bisection
    check = sqlite3.connect(path)
    n, = check.execute("SELECT COUNT(*) FROM t").fetchone()
    assert n == 19
    assert check.execute("SELECT COUNT(*) FROM t WHERE id = 7").fetchone()[0] == 0
    check.close()
