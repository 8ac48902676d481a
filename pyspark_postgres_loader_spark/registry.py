"""Central query registry powering the driver contract.

Every implemented operator registers here with a PySpark callable
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a matching
ANSI-SQL oracle string for DuckDB. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry.

Determinism contract (why hashes match): any aggregate over doubles is
computed as ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`` on both
sides — per-row double arithmetic is IEEE-identical across engines, the
decimal sum is exact and order-independent, and the final double cast is
deterministic. Averages are ``double_sum / count`` (double division of
identical operands). See ``functions/deterministic.py``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query under ``name`` with an optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        dedup,
        joins_advanced,
        json_ops,
        multimodal,
        relational,
        sampling,
        similarity,
        text,
    )
    from .streaming import windows  # noqa: F401

    _LOADED = True
