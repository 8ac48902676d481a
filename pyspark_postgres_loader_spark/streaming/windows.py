"""Structured Streaming over the ``events`` table: watermarked tumbling /
sliding windows, session windows, streaming dedup.

The reference has NO streaming surface (SURVEY.md §2i); this module is
the Structured-Streaming extension. Each ``stream_*`` query runs a real
``readStream`` → transformation → ``writeStream`` pipeline driven to
completion with ``trigger(availableNow=True)`` + a memory sink, then
returns the sink table — so the driver harness (and the DuckDB oracle,
where registered) checks genuine streaming output.

Late-data semantics: with availableNow over a static file the watermark
never discards fixture rows (single batch), so the streaming result
equals the batch window aggregation — which is exactly what the oracle
asserts. The watermark plumbing is still real: state is bounded by
``withWatermark``, the production path just swaps the source for Kafka.

Scale notes: windowed aggs shuffle on (window, key) once; state store
size is bounded by watermark horizon × key cardinality; session windows
use Spark's native session_window (merging state), not a Python loop.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import dsum, sql_dsum
from ..registry import register
from ..tables import load_table

# events.ts unit varies by fixture generation: TIMESTAMP(NANOS) parquet
# (readable only as long, needs div 1000) in some rounds, plain
# TIMESTAMP(MICROS) in others. The stream source must declare a schema
# up front, so probe the file's physical type with a driver-side batch
# schema read and pick the matching declaration — hardcoding the nanos
# shape silently compresses micros fixtures 1000x (every event lands
# within hours of the epoch) and explodes the interval-join surfaces.
_EVENT_SCHEMA_TS_LONG = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)
_EVENT_SCHEMA_TS_TIMESTAMP = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # file-stream sources need a directory path; select the events file
    # with pathGlobFilter. nanosAsLong + UTC pin: see tables.load_table
    # (window/session bounds and pandas timestamp rendering read the
    # session timezone — a non-UTC caller would diverge from the oracles).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql import types as T

    ts_is_long = isinstance(
        spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType,
        T.LongType,
    )
    schema = _EVENT_SCHEMA_TS_LONG if ts_is_long else _EVENT_SCHEMA_TS_TIMESTAMP
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if ts_is_long:  # long nanos → truncate to micros (DuckDB parity)
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


_STATE_PARTITIONS = 8  # state stores per stateful operator; see note below

# Per-stream phase attribution (VERDICT r15 task 4): every
# _run_to_memory call appends one record splitting its wall time into
# stream START (trigger/source setup, offset log creation), microbatch
# EXECUTION (from Spark's own progress events: triggerExecution with
# its addBatch/getBatch/walCommit/commitOffsets parts), and the
# state-store COMMIT portion (stateOperators[].commitTimeMs summed).
# Measurement surface only — bench.py copies it into BENCH_DETAIL's
# stream_family block; nothing on the query path reads it.
PHASE_LOG: list[dict] = []


def _run_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Drive a streaming DataFrame to completion into a memory sink.

    ``spark.sql.shuffle.partitions`` is captured at stream START and
    becomes the state-store count for every stateful operator (a
    stream-stream join keeps 4 stores per partition). Batch-sized
    shuffle width is the wrong default for state: each store pays
    per-batch checkpoint-commit overhead, so state partitions should
    track KEY CARDINALITY and load, not core count. We scope a smaller
    value to the stream's lifetime and restore the session conf after.
    """
    import os
    import time as _time

    spark = stream_df.sparkSession
    n_state = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", _STATE_PARTITIONS)
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    name = "s" + uuid.uuid4().hex[:12]
    spark.conf.set("spark.sql.shuffle.partitions", str(n_state))
    # state-store backend, env-parameterized for A/B and deployment
    # tuning (results are backend-independent; semantics unchanged).
    # r16 A/B at sf0.1, whole family fresh-JVM min-of-3: HDFS-backed
    # (default) 24.1 s vs RocksDB 28.7 s — at fixture state sizes the
    # JNI/per-instance overhead dominates, so the default stays; at
    # production state sizes (GB per store) RocksDB wins, hence the
    # knob rather than a hardcode. State-partition count A/B'd the
    # same way: 8 (default) 24.1 s, 4 → 24.5 s, 2 → 25.4 s — commits
    # are parallel across stores, so fewer stores saves nothing.
    provider = os.environ.get("SPARK_GRAFT_STREAM_STATE_PROVIDER")
    if provider:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", provider
        )
    try:
        t0 = _time.perf_counter()
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        t_start = _time.perf_counter()
        q.awaitTermination()
        t_done = _time.perf_counter()
        try:  # attribution from Spark's own progress events
            # StreamingQueryProgress / StateOperatorProgress are
            # dict-likes in PySpark 4 — .get() reads them directly
            progress = list(q.recentProgress or [])
            dur = [p.get("durationMs", {}) for p in progress]
            rec = {
                "sink": name,
                "output_mode": output_mode,
                "n_batches": len(progress),
                "start_sec": round(t_start - t0, 3),
                "await_sec": round(t_done - t_start, 3),
                "trigger_execution_ms": sum(
                    d.get("triggerExecution", 0) for d in dur
                ),
                "add_batch_ms": sum(d.get("addBatch", 0) for d in dur),
                "offset_log_ms": sum(
                    d.get("walCommit", 0) + d.get("commitOffsets", 0)
                    + d.get("latestOffset", 0)
                    for d in dur
                ),
                "state_commit_ms": sum(
                    int(op.get("commitTimeMs", 0))
                    for p in progress
                    for op in p.get("stateOperators", [])
                ),
                "n_state_stores": sum(
                    int(op.get("numStateStoreInstances", 0))
                    for p in progress[-1:]
                    for op in p.get("stateOperators", [])
                ),
            }
            PHASE_LOG.append(rec)
        except Exception:  # noqa: BLE001 — attribution must never fail a query
            pass
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    return spark.table(name)


@register(
    "stream_tumbling_hourly",
    oracle=f"""
    SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS window_start,
           CAST(time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS TIMESTAMP)
             AS window_end,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window streaming aggregation (1h windows)."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return _run_to_memory(agg, "complete")


@register(
    "stream_sliding_2h_1h",
    oracle="""
    SELECT CAST(ws AS TIMESTAMP) AS window_start,
           CAST(ws + INTERVAL 2 HOUR AS TIMESTAMP) AS window_end,
           COUNT(*) AS n
    FROM (
      SELECT unnest([time_bucket(INTERVAL 1 HOUR, ts),
                     time_bucket(INTERVAL 1 HOUR, ts) - INTERVAL 1 HOUR]) AS ws
      FROM events
    ) GROUP BY 1, 2
    """,
)
def stream_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h size / 1h slide): each event lands in exactly
    two windows; the oracle expands the two bucket starts per event."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
        )
    )
    return _run_to_memory(agg, "complete")


@register(
    "stream_session_windows",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      -- same (ts, event_id) total order as flagged: ordering by ts
      -- alone makes session membership nondeterministic on ts ties
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-minute gap) per user — Spark's merging
    session-window state; the oracle rebuilds sessions with the SQL
    gaps-and-islands idiom. Session end = last event + gap."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    return _run_to_memory(agg, "complete").select(
        "user_id", "session_start", "session_end", "n_events"
    )


@register(
    "stream_dedup_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with ``dropDuplicatesWithinWatermark`` on
    (user_id, event_type): keeps the first arrival per key within the
    watermark horizon. WHICH row survives depends on arrival order, and
    a key can legitimately re-emit once the watermark passes it — so
    the oracle-compared surface is the surviving KEY SET (distinct
    keys), which is arrival-order independent; the full surviving rows
    are asserted in tests/test_streaming.py."""
    dedup = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type", "event_id", "ts")
    )
    return _run_to_memory(dedup, "append").select("user_id", "event_type").distinct()


def stream_foreach_batch_to_sink(
    spark: SparkSession,
    sf_dir: str,
    batch_writer,
) -> None:
    """Production pattern: stream → ``foreachBatch`` → the engine's
    idempotent upsert sink (sinks/upsert.py), giving exactly-once-ish
    loads (keyed MERGE makes replayed batches idempotent). Used by
    tests/test_streaming.py with a DBAPI target."""
    q = (
        _events_stream(spark, sf_dir)
        .writeStream.foreachBatch(batch_writer)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@register(
    "stream_stateful_user_stats",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           MIN(value) AS min_value, MAX(value) AS max_value,
           CAST(MAX(ts) AS TIMESTAMP) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running stats (count / min / max / last event time) kept in
    explicit GroupState across micro-batches — the escape hatch for
    stateful logic Spark's built-in windows can't express.

    Every tracked stat is order-independent (count, min, max), so the
    single-batch availableNow result equals the batch aggregate and the
    DuckDB oracle can check values exactly. State is one small tuple
    per user — bounded by key cardinality, the production path adds a
    timeout to expire idle keys.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, mn, mx, mts = state.get if state.exists else (0, None, None, None)
        for pdf in pdfs:
            n += len(pdf)
            bmn, bmx = pdf["value"].min(), pdf["value"].max()
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
            bts = pdf["ts"].max().value // 1000  # ns → µs epoch int for state
            mts = bts if mts is None else max(mts, bts)
        state.update((n, float(mn), float(mx), int(mts)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "min_value": [mn],
                "max_value": [mx],
                "last_ts": [pd.Timestamp(mts, unit="us")],
            }
        )

    out = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id long, n_events long, min_value double, "
                "max_value double, last_ts timestamp"
            ),
            stateStructType="n long, mn double, mx double, mts long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return _run_to_memory(out, "update")


@register(
    "stream_static_enrich",
    oracle=f"""
    SELECT e.event_type,
           COUNT(*) AS n,
           {sql_dsum('e.value')} AS sum_value,
           {sql_dsum('c.cust_spend')} AS sum_cust_spend
    FROM events e
    JOIN (
      SELECT o_custkey, {sql_dsum('o_totalprice')} AS cust_spend
      FROM orders GROUP BY o_custkey
    ) c ON c.o_custkey = e.user_id
    GROUP BY e.event_type
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events STREAM is enriched against a
    static per-customer spend dimension (batch DataFrame), then
    aggregated per event type — the standard dimension-enrichment shape
    (stream ⋈ slowly-changing dim). The static side is planned per
    micro-batch, so at scale it can be broadcast or pre-bucketed;
    single-batch availableNow output equals the batch join, which the
    oracle checks exactly.
    """
    static_dim = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(dsum("o_totalprice").alias("cust_spend"))
    )
    enriched = (
        _events_stream(spark, sf_dir)
        .join(static_dim, F.col("user_id") == F.col("o_custkey"))
        .withWatermark("ts", "2 hours")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            dsum("value").alias("sum_value"),
            dsum("cust_spend").alias("sum_cust_spend"),
        )
    )
    return _run_to_memory(enriched, "complete")


@register(
    "stream_stream_interval_join",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id, c.ts AS click_ts, p.ts AS purchase_ts
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: clicks joined to purchases by the
    same user within 30 minutes AFTER the click — the attribution-shape
    join. Both sides are watermarked streams; the time-range condition
    bounds the join state Spark must retain (state for a click expires
    once the watermark passes click_ts + 30min), which is what makes a
    stream-stream join feasible at all on an unbounded source.

    Single-batch availableNow output equals the batch interval join,
    checked exactly by the oracle.
    """
    ev = _events_stream(spark, sf_dir)
    return _run_to_memory(attribution_join(ev, "inner", "2 hours"), "append")


def attribution_join(ev: DataFrame, how: str, delay: str) -> DataFrame:
    """Shared attribution-shape stream-stream join: clicks joined to
    same-user purchases within 30 minutes AFTER the click, as
    ``inner`` / ``left_outer`` / ``full_outer`` with watermark
    ``delay`` on both sides. The three registered queries and the
    checkpoint-recovery tests build on this one definition so their
    semantics cannot drift apart.

    Streaming SELF-join: both sides derive from one source ``ev``, so a
    file stream is planned/scanned once per micro-batch, not twice.
    """
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", delay)
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", delay)
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        how,
    )
    if how == "inner":
        return joined.select(
            "click_id", "purchase_id", "user_id", "click_ts", "purchase_ts"
        )
    if how == "left_outer":
        return joined.select("click_id", "user_id", "click_ts", "purchase_id")
    # full_outer: null-free compare surface (see the registered query's
    # docstring for why ids coalesce to -1 and orphan click_ts to epoch)
    return joined.select(
        F.coalesce("click_id", F.lit(-1)).cast("long").alias("click_id"),
        F.coalesce("user_id", "p_user_id").alias("user_id"),
        F.coalesce(
            "click_ts", F.lit("1970-01-01 00:00:00").cast("timestamp")
        ).alias("click_ts"),
        F.coalesce("purchase_id", F.lit(-1)).cast("long").alias("purchase_id"),
        F.when(F.col("click_id").isNull(), "purchase_only")
        .when(F.col("purchase_id").isNull(), "click_only")
        .otherwise("matched")
        .alias("pair_type"),
    )


@register(
    "stream_stream_outer_attrib",
    oracle="""
    WITH wm AS (
      SELECT LEAST(
        (SELECT MAX(ts) FROM events WHERE event_type = 'click'),
        (SELECT MAX(ts) FROM events WHERE event_type = 'purchase')
      ) AS w
    )
    SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
           p.event_id AS purchase_id
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE p.event_id IS NOT NULL
       OR c.ts + INTERVAL 30 MINUTE < (SELECT w FROM wm)
    """,
)
def stream_stream_outer_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click, attributed
    to same-user purchases within 30 minutes — clicks with no purchase
    still emit (with NULLs) once the watermark passes their interval,
    which is the part an inner join can't express: the state store must
    hold the click until its match window is provably closed.

    The oracle models the streaming semantics EXACTLY: an unmatched
    click emits only if the final global watermark — the MIN over both
    streams' max event times — closes its 30-minute window; clicks
    whose window is still open when the source drains stay in state
    and are (correctly) absent from the output.
    """
    ev = _events_stream(spark, sf_dir)
    return _run_to_memory(attribution_join(ev, "left_outer", "0 seconds"), "append")


@register(
    "stream_stream_full_outer_attrib",
    oracle="""
    WITH wm AS (
      SELECT LEAST(
        (SELECT MAX(ts) FROM events WHERE event_type = 'click'),
        (SELECT MAX(ts) FROM events WHERE event_type = 'purchase')
      ) AS w
    )
    SELECT CAST(COALESCE(c.event_id, -1) AS BIGINT) AS click_id,
           COALESCE(c.user_id, p.user_id) AS user_id,
           CAST(COALESCE(c.ts, TIMESTAMP '1970-01-01 00:00:00') AS TIMESTAMP)
             AS click_ts,
           CAST(COALESCE(p.event_id, -1) AS BIGINT) AS purchase_id,
           CASE WHEN c.event_id IS NULL THEN 'purchase_only'
                WHEN p.event_id IS NULL THEN 'click_only'
                ELSE 'matched' END AS pair_type
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE (c.event_id IS NOT NULL AND p.event_id IS NOT NULL)
       OR (p.event_id IS NULL AND c.ts + INTERVAL 30 MINUTE < (SELECT w FROM wm))
       OR (c.event_id IS NULL AND p.ts < (SELECT w FROM wm))
    """,
)
def stream_stream_full_outer_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join: clicks attributed to
    same-user purchases within 30 minutes, AND unmatched rows from BOTH
    sides once the watermark provably closes their match window —
    orphan purchases (no prior click) surface alongside unconverted
    clicks, which left-outer alone cannot express.

    Watermark-exact oracle: with final global watermark W = min of the
    two streams' max event times, an unmatched click emits iff
    click_ts + 30min < W (its candidate-purchase window is closed) and
    an unmatched purchase emits iff purchase_ts < W (every click that
    could still match it would have click_ts ≤ purchase_ts, i.e. be
    late beyond the watermark). Rows whose windows are still open when
    the source drains stay in state and are correctly absent.

    The compare surface is null-free (ids coalesced to -1, orphan
    click_ts to the epoch, plus an explicit pair_type) — null bigints
    degrade to float64 differently per pandas bridge.
    """
    ev = _events_stream(spark, sf_dir)
    return _run_to_memory(attribution_join(ev, "full_outer", "0 seconds"), "append")


def _protobuf_available() -> bool:
    """transformWithStateInPandas speaks a protobuf wire protocol to its
    driver worker; without the google.protobuf package the stream
    crashes at initialization. protobuf is not installed in this
    container (and installs are not possible), so the TWS query
    registers only where the dependency exists — the same
    environment-imposed gating as the PIL/libvips image codecs
    (operators/multimodal.py). applyInPandasWithState
    (stream_stateful_user_stats) keeps arbitrary-stateful coverage in
    every environment."""
    import importlib.util

    try:
        # find_spec on a dotted name imports the parent package first,
        # so a missing "google" namespace raises instead of returning None
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def _register_tws(fn):
    if _protobuf_available():  # pragma: no cover - env lacks protobuf
        return register(
            "stream_tws_user_value_totals",
            oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE)
             AS purchase_value
    FROM events GROUP BY user_id
    """,
        )(fn)
    return fn


@_register_tws
def stream_tws_user_value_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running value totals via ``transformWithStateInPandas``
    — Spark 4's successor to ``applyInPandasWithState``
    (``stream_stateful_user_stats`` keeps the legacy API covered):
    typed named state (``ValueState``), an explicit processor
    lifecycle, per-state TTL support, and timer hooks. State here is
    one 3-field tuple per user.

    Determinism without arrival order: values accumulate as exact
    integer MICRO-units (``round(v * 1e6)`` — exact for the ≤6-decimal
    contract every money/value column already obeys for ``dsum``), so
    the running sum is order-independent and the final double equals
    the oracle's decimal-sum cast bit-for-bit.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserValueTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n BIGINT, vmicro BIGINT, pmicro BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, vmicro, pmicro = (
                self._state.get() if self._state.exists() else (0, 0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                micro = (pdf["value"] * 1_000_000).round().astype("int64")
                vmicro += int(micro.sum())
                pmicro += int(micro[pdf["event_type"] == "purchase"].sum())
            self._state.update((n, vmicro, pmicro))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [vmicro / 1e6],
                    "purchase_value": [pmicro / 1e6],
                }
            )

        def close(self) -> None:
            pass

    out = (
        _events_stream(spark, sf_dir)
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserValueTotals(),
            outputStructType=(
                "user_id long, n_events long, sum_value double, "
                "purchase_value double"
            ),
            outputMode="update",
            timeMode="none",
        )
    )
    # transformWithState requires the RocksDB state store (the HDFS-
    # backed default provider doesn't implement its column families);
    # scope the provider to this stream's start, mirroring how
    # _run_to_memory scopes the state-partition count
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        return _run_to_memory(out, "update")
    finally:
        if saved is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, saved)


@register(
    "stream_chained_window_rollup",
    oracle=f"""
    WITH inner_w AS (
      SELECT CAST(time_bucket(INTERVAL 10 MINUTE, ts) AS TIMESTAMP) AS w10,
             event_type,
             COUNT(*) AS n,
             {sql_dsum('value')} AS sum_value
      FROM events
      GROUP BY 1, 2
    )
    SELECT CAST(time_bucket(INTERVAL 1 HOUR, w10) AS TIMESTAMP) AS hour_start,
           event_type,
           CAST(SUM(n) AS BIGINT) AS n,
           {sql_dsum('sum_value')} AS sum_value
    FROM inner_w
    WHERE time_bucket(INTERVAL 1 HOUR, w10) + INTERVAL 1 HOUR
          <= (SELECT MAX(ts) FROM events)
    GROUP BY 1, 2
    """,
)
def stream_chained_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful operators in one streaming query: a 10-minute
    tumbling aggregate feeds a second, hourly window aggregate keyed on
    ``window_time`` of the first — the multi-stateful-operator pipeline
    (pre-aggregate then roll up) that required workarounds before Spark
    3.5 allowed stateful chaining. State cost: the inner operator holds
    only open 10-minute windows, the outer only open hours — the hourly
    rollup never sees raw events, so its state is 6x smaller than
    aggregating events directly would be at the same grain.

    Watermark-exact oracle (delay 0s): an hourly window emits iff its
    end <= the final watermark W = max(ts) — and any 10-minute window
    inside such an hour necessarily closed first, so the batch
    equivalent is the nested two-level aggregate with the same
    hour-closed predicate. The two-level decimal-sum nesting is
    mirrored EXACTLY (summing the inner double partials, not the raw
    values) so the low bits match.
    """
    ev = _events_stream(spark, sf_dir)
    inner = (
        ev.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
    )
    outer = (
        inner.groupBy(
            F.window(F.window_time("w"), "1 hour").alias("h"), "event_type"
        )
        .agg(
            F.sum("n").cast("long").alias("n"),
            dsum("sum_value").alias("sum_value2"),
        )
    )
    out = _run_to_memory(outer, "append")
    return out.select(
        F.col("h.start").alias("hour_start"),
        "event_type",
        "n",
        F.col("sum_value2").alias("sum_value"),
    )


@register(
    "stream_session_dynamic_gap",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN INTERVAL 45 MINUTE
                  ELSE INTERVAL 15 MINUTE END AS gap
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, event_id, gap,
             CASE WHEN MAX(ts + gap) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) IS NULL
                  OR ts >= MAX(ts + gap) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  )
                  THEN 1 ELSE 0 END AS new_session
      FROM g
    ),
    numbered AS (
      -- same (ts, event_id) total order as flagged: ordering by ts
      -- alone makes session membership nondeterministic on ts ties
      SELECT user_id, ts, gap,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts + gap) AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, sid
    """,
)
def stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT gap expression: purchases hold
    a session open 45 minutes, everything else 15 — the
    dynamic-gap form of ``session_window`` (a Column, not a constant),
    which fixed-gap sessionization cannot express. State cost is
    identical to static sessions (merging window state per key);
    the gap is evaluated per row map-side.

    Batch-exact oracle: sessions merge while an event starts before
    the running max end (strict), so the batch twin flags a new
    session at ts >= max over prior (ts_i + gap_i) in the same
    (ts, event_id) total order, and a session's end is the max event
    end, not last-event end — an early long-gap purchase can outlast
    later short-gap events."""
    ev = _events_stream(spark, sf_dir)
    gap = F.when(F.col("event_type") == "purchase", "45 minutes").otherwise(
        "15 minutes"
    )
    agg = (
        ev.withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
    return _run_to_memory(agg, "complete")


@register(
    "stream_ohlc_hourly",
    oracle=f"""
    WITH b AS (
      SELECT event_type, CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS window_start,
             value,
             ROW_NUMBER() OVER (PARTITION BY event_type, time_bucket(INTERVAL 1 HOUR, ts)
               ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, time_bucket(INTERVAL 1 HOUR, ts)
               ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, window_start,
           CAST(window_start + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_value,
           MAX(value) AS high_value,
           MIN(value) AS low_value,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close_value,
           {sql_dsum('value')} AS volume,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM b
    GROUP BY event_type, window_start
    """,
)
def stream_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLC candlesticks: the batch resample
    (operators/temporal.py:timeseries_ohlc_hourly) as a watermarked
    tumbling-window aggregation — ``min_by``/``max_by`` over the
    (ts, event_id) struct total order work unchanged inside a
    streaming groupBy, so open/close need no stateful custom operator.

    Scale notes: state per (event_type, hour window) is one constant
    size OHLC buffer — the same O(series x open-windows) bound as the
    plain tumbling count, NOT O(events); the watermark closes windows
    2 h after event time, bounding open-window count. The oracle is
    the batch OHLC SQL phrased over time_bucket (streaming result ==
    batch semantics, the property every query in this module pins).
    """
    ev = _events_stream(spark, sf_dir)
    key = F.struct(F.col("ts"), F.col("event_id"))
    agg = (
        ev.withWatermark("ts", "2 hours")
        .select("event_type", "ts", "value", key.alias("ord"))
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.min_by("value", F.col("ord")).alias("open_value"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.max_by("value", F.col("ord")).alias("close_value"),
            dsum("value").alias("volume"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(
            "event_type",
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "open_value",
            "high_value",
            "low_value",
            "close_value",
            "volume",
            "n_events",
        )
    )
    return _run_to_memory(agg, "complete")
