"""Local mirror of the driver's DuckDB-oracle differential check:
run a registered Spark query and its oracle SQL, compare row count,
column names, and order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb

from pyspark_postgres_loader_spark.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    try:  # Decimal → float-insensitive exact string
        import decimal

        if isinstance(v, decimal.Decimal):
            return str(v.normalize())
    except Exception:
        pass
    return v

def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_query(spark, sf_dir: str, name: str) -> None:
    """Assert the Spark query matches its DuckDB oracle exactly."""
    from pyspark_postgres_loader_spark.registry import QUERIES, _ensure_loaded

    _ensure_loaded()
    spec = QUERIES[name]
    assert spec.oracle is not None, f"{name} has no oracle"
    sdf = spec.fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    res = con.execute(spec.oracle)
    d_cols = [d[0].lower() for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={s_cols} duckdb={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn = _norm_rows(s_cols, s_rows)
    dn = _norm_rows(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")

    # Strict driver-style phase: the driver canonicalizes BOTH results
    # through pandas (sort columns by name, sort rows, hash values), so
    # representation differences that the lenient phase above forgives
    # (DuckDB HUGEINT->float64 vs Spark int64, Decimal/date objects vs
    # float64/datetime64, unhashable array cells) fail the driver even
    # when every value is equal. Mirror that here so the class is caught
    # locally before the driver sees it.
    import pandas as pd

    s_pdf = _canon_pdf(sdf.toPandas())
    d_pdf = _canon_pdf(con.execute(spec.oracle).fetchdf())
    s_dt = [_canon_dtype(t) for t in s_pdf.dtypes]
    d_dt = [_canon_dtype(t) for t in d_pdf.dtypes]
    if s_dt != d_dt:
        raise AssertionError(
            f"{name}: pandas dtype mismatch (driver would hash-fail): "
            f"spark={dict(zip(s_pdf.columns, s_dt))} "
            f"duckdb={dict(zip(d_pdf.columns, d_dt))}"
        )
    pd.testing.assert_frame_equal(
        s_pdf, d_pdf, check_exact=True, check_dtype=False
    )
    return len(s_rows)


def _canon_pdf(pdf):
    """Driver-style canonicalization: lowercase + sort columns by name,
    sort rows by all columns, reset index. Crashes on unhashable cells
    (lists) exactly like the driver's canonicalizer does."""
    pdf = pdf.rename(columns={c: c.lower() for c in pdf.columns})
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)


def _canon_dtype(t) -> str:
    """Dtype equivalence class under the driver's value hash: datetime64
    resolution and integer width don't affect it (r1 evidence: q3 passed
    with [us] vs [ns], window_rank with int32 vs int64) but int-vs-float
    and object-vs-anything do (HUGEINT/Decimal/date failures)."""
    s = str(t)
    if s.startswith("datetime64"):
        return "datetime64"
    if s.startswith(("int", "uint")):
        return "int"
    return s
