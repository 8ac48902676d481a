"""Cross-engine deterministic aggregates over floating-point columns.

Problem: ``SUM(double)`` is order-dependent — Spark's partial/final
aggregation over 32 partitions and DuckDB's single-node sum visit rows
in different orders, so the low bits of the result differ and the
driver's value-hash comparison fails spuriously.

Solution: per-row arithmetic stays in double (IEEE 754 — bit-identical
in any engine), but the SUM runs over an exact ``DECIMAL(38,6)`` cast of
each row value. Decimal addition is exact and associative, hence
order-independent; the final cast back to double is a deterministic
function of the exact sum. The double→decimal cast itself is unambiguous
because no binary double's exact decimal expansion terminates in a
trailing 5 at the rounding position (n/10^k with n ending in 5 is never
a binary fraction), so round-half never triggers.

The SQL oracle uses the mirrored form:
``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact-decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB oracle rendering of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB oracle rendering of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr})"


def mhash64(col: Column | str) -> Column:
    """Cross-engine deterministic 60-bit string hash (non-negative long).

    ``xxhash64`` has no DuckDB counterpart, so hash-blocked operators
    built on it can never be oracle-checked. md5 exists in both engines
    with identical semantics; the top 15 hex chars parsed base-16 give a
    uniform 60-bit non-negative int64 both engines agree on bit-for-bit.
    Spark: ``conv(substr(md5(s),1,15),16,10)``; DuckDB mirrors via
    ``CAST('0x' || substr(md5(s),1,15) AS BIGINT)``.

    md5 costs ~2-3x xxhash64 per call; for candidate-generation hashing
    (shingles, tokens, band buckets) that's noise next to the joins it
    feeds, and it buys a differential-testable operator.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_mhash64(expr: str) -> str:
    """DuckDB oracle rendering of :func:`mhash64`."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"
