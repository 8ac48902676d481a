"""In-process fake Postgres DBAPI for end-to-end sink tests.

Closes the gap between "golden-string tested" and "executed against the
reference's actual target": the reference sends ``%s``-placeholder SQL
through psycopg2 (psycopg2_database_helper.py:87-91, 123-187) and
``$n``-placeholder SQL through asyncpg (asyncpg_database_helper.py:
87-91). The SQLite/DuckDB dialect tests execute the sink end-to-end but
with ``?`` placeholders — so the exact strings the postgres dialects
generate were only ever string-compared, never executed.

This module provides:

- :func:`connect` — a sync DBAPI connection speaking psycopg2's
  paramstyle: ``execute``/``executemany`` REJECT SQL containing ``?``
  or ``$n`` placeholders, translate ``%s`` → ``?``, and run on SQLite
  (which shares the ON CONFLICT / SAVEPOINT surface with Postgres).
- :class:`FakeAsyncPgConnection` — an asyncpg-style async connection
  (``await execute(sql, *args)`` / ``await executemany(sql, rows)``)
  that accepts ONLY ``$n`` placeholders, for driving the sink through
  ``async_adapter.adapt_async_factory``.

Every statement is appended (original, untranslated text) to a
side-log SQLite file ``<path>.sqllog`` in autocommit mode, so
statements executed on EXECUTORS are visible to driver-side asserts
and a savepoint rollback can't erase the evidence.

Module-level functions only — connection factories built from these
(``functools.partial(fake_pg.connect, path)``) pickle by reference and
import cleanly inside Spark's Python workers.
"""

from __future__ import annotations

import re
import sqlite3

paramstyle = "pyformat"  # what psycopg2 declares

_PYFORMAT = re.compile(r"%s")
_NUMBERED = re.compile(r"\$(\d+)")


def _log(path: str, sql: str) -> None:
    con = sqlite3.connect(path + ".sqllog", timeout=30, isolation_level=None)
    try:
        con.execute("CREATE TABLE IF NOT EXISTS sql_log (stmt TEXT)")
        con.execute("INSERT INTO sql_log VALUES (?)", (sql,))
    finally:
        con.close()


def executed_sql(path: str) -> list[str]:
    """All statements executed through connections on ``path``."""
    con = sqlite3.connect(path + ".sqllog", timeout=30)
    try:
        return [r[0] for r in con.execute("SELECT stmt FROM sql_log")]
    except sqlite3.OperationalError:  # no log yet
        return []
    finally:
        con.close()


def _translate_pyformat(sql: str) -> str:
    """psycopg2-style ``%s`` → sqlite ``?``; reject foreign styles."""
    if "?" in sql:
        raise ValueError(f"'?' placeholder sent to a psycopg2-style driver: {sql}")
    if _NUMBERED.search(sql):
        raise ValueError(f"'$n' placeholder sent to a psycopg2-style driver: {sql}")
    return _PYFORMAT.sub("?", sql)


def _translate_numbered(sql: str) -> str:
    """asyncpg-style ``$1..$n`` → sqlite positional ``?``.

    asyncpg placeholders are positional references; the sink only ever
    emits them in ascending order, which maps 1:1 onto ``?``. Reject
    out-of-order references loudly rather than silently reordering.
    """
    if "?" in sql:
        raise ValueError(f"'?' placeholder sent to an asyncpg-style driver: {sql}")
    if "%s" in sql:
        raise ValueError(f"'%s' placeholder sent to an asyncpg-style driver: {sql}")
    nums = [int(m) for m in _NUMBERED.findall(sql)]
    if nums != list(range(1, len(nums) + 1)):
        raise ValueError(f"non-sequential $n placeholders: {sql}")
    return _NUMBERED.sub("?", sql)


class FakePgError(Exception):
    """Stand-in for psycopg2.errors.CardinalityViolation (21000)."""


_INSERT_COLS = re.compile(r"INSERT INTO \S+\s*\(([^)]*)\)", re.I)
_CONFLICT_UPDATE = re.compile(r"ON CONFLICT\s*\(([^)]*)\)\s*DO UPDATE", re.I)


def _reject_double_affect(sql: str, params: tuple) -> None:
    """Real PostgreSQL raises 'ON CONFLICT DO UPDATE command cannot
    affect row a second time' (SQLSTATE 21000) when ONE statement's
    VALUES list holds the same conflict key twice. SQLite applies the
    rows sequentially and silently keeps the last — which is exactly
    the divergence that let an un-deduplicated multirow fast path pass
    every test, so the fake enforces the Postgres rule itself."""
    m = _CONFLICT_UPDATE.search(sql)
    if not m or not params:
        return
    cols = [c.strip() for c in _INSERT_COLS.search(sql).group(1).split(",")]
    keys = [c.strip() for c in m.group(1).split(",")]
    idx = [cols.index(k) for k in keys]
    n = len(cols)
    n_rows = len(params) // n
    if n_rows <= 1:
        return
    key_rows = [tuple(params[r * n + j] for j in idx) for r in range(n_rows)]
    if len(set(key_rows)) < len(key_rows):
        raise FakePgError(
            "ON CONFLICT DO UPDATE command cannot affect row a second time"
        )


_SQLITE_TO_PG_TYPE = {
    "INTEGER": "bigint",
    "INT": "bigint",
    "REAL": "double precision",
    "TEXT": "text",
    "BLOB": "bytea",
}


def _emulate_catalog(sq: sqlite3.Connection, sql: str, params: tuple):
    """Answer the package's information_schema introspection queries
    (introspection.py PG_*_SQL) from SQLite PRAGMAs, the way a real
    Postgres would answer them from its catalog. Returns a row list, or
    None when ``sql`` is not a catalog query (caller executes it)."""
    if "information_schema.columns" in sql:
        _schema, name = params
        rows = sq.execute(f"PRAGMA table_info({name})").fetchall()
        return [
            (
                r[1],
                _SQLITE_TO_PG_TYPE.get(
                    (r[2] or "TEXT").upper().split("(")[0].strip(),
                    (r[2] or "text").lower(),
                ),
            )
            for r in rows
        ]
    if "table_constraints" in sql and "'PRIMARY KEY'" in sql:
        _schema, name = params
        rows = sq.execute(f"PRAGMA table_info({name})").fetchall()
        pk = sorted((r[5], r[1]) for r in rows if r[5])
        return [(n,) for _order, n in pk]
    if "table_constraints" in sql and "'UNIQUE'" in sql:
        return []  # unique-constraint fallback: none in the fake catalog
    return None


class FakePgCursor:
    def __init__(self, conn: "FakePgConnection"):
        self._conn = conn
        self._cur = conn._sq.cursor()
        self._catalog_rows: list[tuple] | None = None

    def execute(self, sql: str, params: tuple | None = None):
        _log(self._conn._path, sql)
        translated = _translate_pyformat(sql)  # validate style FIRST
        _reject_double_affect(sql, params or ())
        self._catalog_rows = _emulate_catalog(self._conn._sq, sql, params or ())
        if self._catalog_rows is None:
            self._cur.execute(translated, params or ())
        return self

    def executemany(self, sql: str, rows: list[tuple]):
        _log(self._conn._path, sql)
        self._catalog_rows = None
        self._cur.executemany(_translate_pyformat(sql), rows)
        return self

    def fetchone(self):
        if self._catalog_rows is not None:
            return self._catalog_rows[0] if self._catalog_rows else None
        return self._cur.fetchone()

    def fetchall(self):
        if self._catalog_rows is not None:
            return list(self._catalog_rows)
        return self._cur.fetchall()

    def close(self) -> None:
        self._cur.close()


class FakePgConnection:
    def __init__(self, path: str):
        self._path = path
        self._sq = sqlite3.connect(path, timeout=30)

    def cursor(self) -> FakePgCursor:
        return FakePgCursor(self)

    def commit(self) -> None:
        self._sq.commit()

    def rollback(self) -> None:
        self._sq.rollback()

    def close(self) -> None:
        self._sq.close()


def connect(path: str) -> FakePgConnection:
    """psycopg2-shaped ``connect`` (DSN reduced to a file path)."""
    return FakePgConnection(path)


class FakeAsyncPgConnection:
    """asyncpg-shaped async surface over the same SQLite backing store.

    autocommit at the sqlite level (isolation_level=None) because the
    async adapter manages transactions with explicit BEGIN/COMMIT/
    ROLLBACK statements, exactly as it would against real asyncpg.
    """

    def __init__(self, path: str):
        self._path = path
        self._sq = sqlite3.connect(path, timeout=30, isolation_level=None)

    async def execute(self, sql: str, *args):
        _log(self._path, sql)
        bare = sql.strip().upper()
        if bare in ("BEGIN", "COMMIT", "ROLLBACK") or bare.startswith(
            ("SAVEPOINT", "RELEASE", "ROLLBACK TO")
        ):
            self._sq.execute(sql)
            return
        self._sq.execute(_translate_numbered(sql), args)

    async def executemany(self, sql: str, rows: list[tuple]):
        _log(self._path, sql)
        self._sq.executemany(_translate_numbered(sql), rows)

    async def fetch(self, sql: str, *args):
        """asyncpg's result-returning entry point — the async adapter
        routes cursor.execute() through this when present."""
        _log(self._path, sql)
        translated = _translate_numbered(sql)  # validate style FIRST
        rows = _emulate_catalog(self._sq, sql, args)
        if rows is not None:
            return rows
        cur = self._sq.execute(translated, args)
        return cur.fetchall() if cur.description else []

    async def close(self):
        self._sq.close()


async def async_connect(path: str) -> FakeAsyncPgConnection:
    """asyncpg-shaped coroutine factory (``await async_connect(path)``)."""
    return FakeAsyncPgConnection(path)
