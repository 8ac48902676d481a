"""Async-driver adapter: run the sink against asyncpg-style drivers.

Reference parity (U6): the reference ships a full async executor
(asyncpg_database_helper.py:123-192) alongside the sync psycopg2 one.
This engine's sink is deliberately sync-DBAPI (one connection per
Spark partition is already the unit of parallelism — an event loop per
writer adds latency hiding for exactly one in-flight statement, i.e.
nothing). Instead of duplicating the sink, this adapter wraps an
asyncpg-style async connection in the minimal DBAPI surface the sink
calls (cursor/execute/executemany/commit/rollback/close), so users on
async drivers keep their driver and reuse every sink feature
(bisection quarantine, savepoints, staging merge).

Pair with ``sql_builder.ASYNCPG`` ($n placeholders) when the target
driver is actual asyncpg.

Each adapted connection owns a private event loop (executors are
plain threads — there is no running loop to integrate with), created
lazily and closed with the connection.
"""

from __future__ import annotations

import asyncio
from collections.abc import Callable


class _AdapterCursor:
    def __init__(self, owner: "SyncConnectionAdapter"):
        self._owner = owner
        self._rows: list[tuple] = []

    def execute(self, sql: str, params: tuple = ()) -> None:
        self._owner._begin_if_needed()
        conn = self._owner._conn
        # asyncpg separates statement execution (``execute`` → status
        # string) from result retrieval (``fetch`` → Records). Catalog
        # introspection needs results, so route through ``fetch`` when
        # the driver has it — it runs any statement, returning [] for
        # plain DML/DDL — and keep the rows for fetchone/fetchall.
        fetch = getattr(conn, "fetch", None)
        if fetch is not None:
            self._rows = [tuple(r) for r in self._owner._run(fetch(sql, *params))]
        else:
            self._owner._run(conn.execute(sql, *params))
            self._rows = []

    def executemany(self, sql: str, rows: list[tuple]) -> None:
        self._owner._begin_if_needed()
        self._rows = []
        self._owner._run(self._owner._conn.executemany(sql, rows))

    def fetchone(self) -> tuple | None:
        return self._rows[0] if self._rows else None

    def fetchall(self) -> list[tuple]:
        return list(self._rows)

    def close(self) -> None:  # cursors are views over the connection
        pass


class SyncConnectionAdapter:
    """Wrap an async connection (asyncpg-style ``execute(sql, *args)`` /
    ``executemany(sql, rows)`` coroutines) as the sync DBAPI subset the
    upsert sink drives. Transactions are explicit BEGIN/COMMIT/ROLLBACK
    statements (asyncpg runs raw SQL fine; savepoint statements from
    ``savepoint_guard`` pass straight through)."""

    def __init__(self, async_conn, loop: asyncio.AbstractEventLoop | None = None):
        self._conn = async_conn
        self._loop = loop or asyncio.new_event_loop()
        self._in_txn = False

    def _run(self, coro):
        return self._loop.run_until_complete(coro)

    def _begin_if_needed(self) -> None:
        if not self._in_txn:
            self._in_txn = True  # set first: BEGIN itself must not recurse
            self._run(self._conn.execute("BEGIN"))

    def cursor(self) -> _AdapterCursor:
        return _AdapterCursor(self)

    def commit(self) -> None:
        if self._in_txn:
            self._run(self._conn.execute("COMMIT"))
            self._in_txn = False

    def rollback(self) -> None:
        if self._in_txn:
            self._run(self._conn.execute("ROLLBACK"))
            self._in_txn = False

    def close(self) -> None:
        try:
            if self._in_txn:
                self.rollback()
            closer = getattr(self._conn, "close", None)
            if closer is not None:
                result = closer()
                if asyncio.iscoroutine(result):
                    self._run(result)
        finally:
            self._loop.close()


def adapt_async_factory(async_connect: Callable[[], object]):
    """Lift a zero-arg coroutine factory (e.g.
    ``functools.partial(asyncpg.connect, dsn=...)``) into the picklable
    zero-arg SYNC factory the sink takes. The coroutine is awaited on
    the adapter's private loop at first use on the executor."""

    def factory() -> SyncConnectionAdapter:
        loop = asyncio.new_event_loop()
        conn = loop.run_until_complete(async_connect())
        return SyncConnectionAdapter(conn, loop)

    return factory
