"""Driver-oracled end-to-end sink verification.

The reference's entire identity is the keyed, batched, fault-isolating
upsert (psycopg2_database_helper.py:287-357): rows stream in arrival
order, each batch is sent as one multi-row ``INSERT .. ON CONFLICT``
(:87-91), a failing batch bisects until poison rows are quarantined
alone (:70-120), and duplicate keys resolve last-write-wins. Every
piece of that machinery is pytest-verified against fake-pg/sqlite, but
until this query none of it sat under the round driver's value hash.

``sink_upsert_final_state`` closes that gap: it drives the REAL sink
(:func:`..sinks.upsert.upsert_dataframe`, multirow fast path, batch
bisection, per-key last-wins dedup including the rejected-winner
replay) into an actual DuckDB database file with a CHECK constraint,
reads the final table back, and attaches the LoadStats counters as
constant columns. The DuckDB oracle replays the same workload
relationally:

- final state per key = the LAST constraint-satisfying occurrence in
  arrival order (poison rows roll back alone; an intra-batch duplicate
  whose winning row is rejected replays its superseded occurrences —
  the round-8 replay fix, now under the driver hash);
- rows_loaded / rows_rejected follow the sink's documented multirow
  semantics: a batch dedups to its last occurrence per key, superseded
  occurrences of a LOADED winner are credited as loaded (semantically
  applied then overwritten), superseded occurrences of a REJECTED
  winner replay individually and count by their own outcome.

Determinism: the changelog is a pure function of ``row_number() OVER
(ORDER BY o_orderkey)`` (fixture-regeneration-proof — no dependence on
specific key values), the sink consumes ONE partition sorted by that
rank, and batch boundaries are exact 256-row rank windows, so the
oracle can reconstruct every batch. Poison rows are ``rnk % 7 = 3``:
any two consecutive ranks differ by 1 < 7, so no 256-row batch is ever
all-poison and the early-abort path provably cannot fire (pinned by
the ``aborted_partitions`` output column).

Scale note: the single sorted partition is a HARNESS choice — it makes
last-wins arrival order (and therefore the value hash) deterministic.
A production load runs the same sink with ``parallelism=N`` and
``partition_cols=[key]`` (disjoint keys per writer, no cross-writer
conflicts); arrival order within a key is then the partition's order,
exactly as in the reference.
"""

from __future__ import annotations

import functools
import hashlib
import os

import duckdb
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..scratch import claim_scratch_dir
from ..tables import load_table
from .sql_builder import DUCKDB
from .upsert import upsert_dataframe, upsert_via_staging

_BATCH = 256
_KEYS = 50
_POISON_MOD = 7
_POISON_RES = 3
# Fixed workload caps: the checked load is a CORRECTNESS harness, not a
# throughput benchmark — a single-connection DuckDB load with ~40 % of
# batches bisecting costs ~0.5 ms/row, so an uncapped sf0.1 run took
# 74 s. The caps cover every semantic case (23+ batches, intra-batch
# duplicates, poison winners, replay) at every scale factor and make
# the query's cost SF-invariant; rows beyond the cap add repetition,
# not coverage. (sf0.001 has 1,500 orders — both caps are no-ops
# there; sf0.01's 15,000 are partially covered.)
_SINK_ROWS = 6_000  # row-quarantine path (per-row statement cost)
_STAGE_ROWS = 30_000  # staging path (set-based, cheaper per row)

_TARGET_DDL = (
    "CREATE TABLE sink_final_state ("
    "  k BIGINT PRIMARY KEY,"
    "  rnk BIGINT,"
    "  amount DOUBLE CHECK (amount >= 0),"
    "  status VARCHAR)"
)


def _connect(path: str):
    """Top-level factory (``duckdb.connect`` itself is an unpicklable
    pybind builtin — a named module function pickles by reference)."""
    import duckdb as _duckdb

    return _duckdb.connect(path)


def _changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic upsert workload derived from ``orders``: key
    collisions (rnk % 50), poison rows (rnk % 7 = 3 → negative amount,
    violating the target's CHECK), arrival order = rank order."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    ranked = orders.select(
        F.row_number().over(w).alias("rnk"), "o_totalprice", "o_orderstatus"
    ).filter(F.col("rnk") <= _SINK_ROWS)
    return ranked.select(
        (F.col("rnk") % _KEYS).cast("long").alias("k"),
        F.col("rnk").cast("long").alias("rnk"),
        F.when(
            F.col("rnk") % _POISON_MOD == _POISON_RES, -F.col("o_totalprice")
        )
        .otherwise(F.col("o_totalprice"))
        .cast("double")
        .alias("amount"),
        F.col("o_orderstatus").alias("status"),
    )


@register(
    "sink_upsert_final_state",
    oracle=f"""
    WITH ordered AS (
      SELECT rnk, o_totalprice, o_orderstatus FROM (
        SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rnk,
               o_totalprice, o_orderstatus
        FROM orders
      ) WHERE rnk <= {_SINK_ROWS}
    ), changelog AS (
      SELECT rnk,
             rnk % {_KEYS} AS k,
             CASE WHEN rnk % {_POISON_MOD} = {_POISON_RES}
                  THEN -o_totalprice ELSE o_totalprice END AS amount,
             o_orderstatus AS status,
             (rnk - 1) // {_BATCH} AS b,
             rnk % {_POISON_MOD} <> {_POISON_RES} AS ok
      FROM ordered
    ), flagged AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY b, k ORDER BY rnk DESC) = 1
               AS winner
      FROM changelog
    ), outcome AS (
      -- per-row fate under the sink's multirow dedup semantics:
      -- winner → its own constraint outcome; superseded row of a
      -- LOADED winner → credited loaded; superseded row of a REJECTED
      -- winner → replayed individually, its own outcome
      SELECT f.ok, f.winner,
             CASE WHEN f.winner THEN f.ok
                  WHEN w.ok THEN TRUE
                  ELSE f.ok END AS is_loaded
      FROM flagged f
      JOIN flagged w ON w.b = f.b AND w.k = f.k AND w.winner
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS rows_seen,
             CAST(SUM(CASE WHEN is_loaded THEN 1 ELSE 0 END) AS BIGINT)
               AS rows_loaded,
             CAST(SUM(CASE WHEN is_loaded THEN 0 ELSE 1 END) AS BIGINT)
               AS rows_rejected
      FROM outcome
    ), final AS (
      -- table state: last constraint-satisfying occurrence per key
      SELECT k, rnk, amount, status,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY rnk DESC) AS rn
      FROM changelog WHERE ok
    )
    SELECT CAST(f.k AS BIGINT) AS k,
           CAST(f.rnk AS BIGINT) AS rnk,
           CAST(f.amount AS DOUBLE) AS amount,
           f.status,
           s.rows_seen, s.rows_loaded, s.rows_rejected,
           CAST(1 AS BIGINT) AS partitions_used,
           CAST(0 AS BIGINT) AS aborted_partitions
    FROM final f CROSS JOIN stats s
    WHERE f.rn = 1
    ORDER BY k
    """,
    doc="end-to-end upsert sink: real DuckDB target, CHECK quarantine, "
    "last-wins dedup + rejected-winner replay, LoadStats counters",
)
def sink_upsert_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    scratch = claim_scratch_dir("sink_roundtrip", tag)
    dbfile = os.path.join(scratch, "target.duckdb")
    for leftover in (dbfile, dbfile + ".wal"):
        if os.path.exists(leftover):
            os.remove(leftover)

    con = duckdb.connect(dbfile)
    try:
        con.execute(_TARGET_DDL)
    finally:
        con.close()  # release the file lock before executors connect

    rows = _changelog(spark, sf_dir).coalesce(1).sortWithinPartitions("rnk")
    stats = upsert_dataframe(
        rows,
        functools.partial(_connect, dbfile),
        "sink_final_state",
        unique_key=["k"],
        batch_size=_BATCH,
        parallelism=1,
        dialect=DUCKDB,
    )

    con = duckdb.connect(dbfile)
    try:
        final = con.execute(
            "SELECT k, rnk, amount, status FROM sink_final_state ORDER BY k"
        ).fetchall()
    finally:
        con.close()

    out = spark.createDataFrame(
        final, "k long, rnk long, amount double, status string"
    )
    return (
        out.withColumn("rows_seen", F.lit(stats.rows_seen).cast("long"))
        .withColumn("rows_loaded", F.lit(stats.rows_loaded).cast("long"))
        .withColumn("rows_rejected", F.lit(stats.rows_rejected).cast("long"))
        .withColumn("partitions_used", F.lit(stats.partitions).cast("long"))
        .withColumn(
            "aborted_partitions", F.lit(stats.aborted_partitions).cast("long")
        )
        .orderBy("k")
    )


@register(
    "sink_staging_merge_final_state",
    oracle=f"""
    WITH ordered AS (
      SELECT rnk, o_totalprice, o_orderstatus FROM (
        SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rnk,
               o_totalprice, o_orderstatus
        FROM orders
      ) WHERE rnk <= {_STAGE_ROWS}
    ), changelog AS (
      SELECT rnk, rnk % {_KEYS} AS k, o_totalprice AS amount,
             o_orderstatus AS status
      FROM ordered
    ), final AS (
      SELECT k, rnk, amount, status,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY rnk DESC) AS rn
      FROM changelog
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(rnk AS BIGINT) AS rnk,
           CAST(amount AS DOUBLE) AS amount,
           status,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM changelog) AS rows_staged
    FROM final WHERE rn = 1
    ORDER BY k
    """,
    doc="set-based staging merge sink: executors append to a staging "
    "table, one INSERT..SELECT..ON CONFLICT merge, deterministic "
    "last-wins via the Spark-stamped _staged_seq column",
)
def sink_staging_merge_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sink's SECOND strategy under the driver hash:
    :func:`..sinks.upsert.upsert_via_staging` — executors append rows
    to a staging table with cheap plain INSERTs (no conflict checks),
    then ONE set-based ``INSERT .. SELECT .. ON CONFLICT (k) DO
    UPDATE`` merges, deduplicating staged rows per key by the
    Spark-stamped ``_staged_seq`` (``monotonically_increasing_id`` over
    the pre-fan-out row order, so last-wins is a deterministic function
    of DataFrame order — here, the global rank order). The oracle is
    plain latest-per-key over the same rank-derived changelog; the
    staged-row count rides along as a constant column.

    Scale note: this is the 100 TB-PREFERRED sink path — millions of
    per-row conflict checks become one relational merge the database
    executes with hash joins; per-row quarantine is deliberately traded
    away (CHECK-violating workloads belong to ``upsert_dataframe``,
    oracled by ``sink_upsert_final_state``). The single sorted
    partition is again the harness determinism choice; production
    stages with ``parallelism=N`` because ``_staged_seq`` — not arrival
    order — decides the winner."""
    tag = hashlib.md5((sf_dir + ":staging").encode()).hexdigest()[:8]
    scratch = claim_scratch_dir("sink_roundtrip", tag)
    dbfile = os.path.join(scratch, "staging_target.duckdb")
    for leftover in (dbfile, dbfile + ".wal"):
        if os.path.exists(leftover):
            os.remove(leftover)

    con = duckdb.connect(dbfile)
    try:
        con.execute(
            "CREATE TABLE merge_final_state ("
            "  k BIGINT PRIMARY KEY, rnk BIGINT, amount DOUBLE,"
            "  status VARCHAR)"
        )
    finally:
        con.close()

    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    rows = (
        orders.select(
            F.row_number().over(w).alias("rnk"), "o_totalprice", "o_orderstatus"
        )
        .filter(F.col("rnk") <= _STAGE_ROWS)
        .select(
            (F.col("rnk") % _KEYS).cast("long").alias("k"),
            F.col("rnk").cast("long").alias("rnk"),
            F.col("o_totalprice").cast("double").alias("amount"),
            F.col("o_orderstatus").alias("status"),
        )
        .coalesce(1)
        .sortWithinPartitions("rnk")
    )
    stats = upsert_via_staging(
        rows,
        functools.partial(_connect, dbfile),
        "merge_final_state",
        unique_key=["k"],
        batch_size=512,
        parallelism=1,
        dialect=DUCKDB,
    )

    con = duckdb.connect(dbfile)
    try:
        final = con.execute(
            "SELECT k, rnk, amount, status FROM merge_final_state ORDER BY k"
        ).fetchall()
    finally:
        con.close()

    out = spark.createDataFrame(
        final, "k long, rnk long, amount double, status string"
    )
    return out.withColumn(
        "rows_staged", F.lit(stats.rows_loaded).cast("long")
    ).orderBy("k")
