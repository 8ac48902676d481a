"""Round-4 analytics operators: corpus repetition filtering, dataset
split assignment, keyword relevance search (BM25-style), multi-grain
time rollups, funnel conversion, and cohort retention.

No counterpart in the reference loader (SURVEY.md §2 — its surface ends
at extract/transform/load); these extend the training-data-pipeline and
warehouse-analytics surfaces. Shared design rules (same as
operators/training.py):

- hot paths are JVM-side codegen — higher-order array functions and
  conditional aggregates, zero Python UDFs;
- cross-row aggregates are exact (integers or DECIMAL); computed doubles
  are combined per-row only, where IEEE 754 makes both engines agree
  bit-for-bit on identical operand/op order (functions/deterministic.py);
- shuffles only where an aggregation/join needs one; scalar/corpus-level
  statistics travel as 1-row broadcasts, never via collect().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.deterministic import dsum, mhash64, sql_dsum, sql_mhash64
from ..registry import register
from ..tables import load_table

# --------------------------------------------------------------------------
# Intra-document repetition filter (Gopher-style quality rule)
# --------------------------------------------------------------------------

# The fixture corpus is a near-uniform word soup, so natural duplicate
# trigrams are rare; append a doc_id-derived repeated fragment so the
# rule fires on deterministic, engine-identical input (same pattern as
# text_pii_redact's enrichment).
_REP_ENRICH_SQL = "text || repeat(' alpha beta gamma', CAST(doc_id % 5 AS INT))"
_REP_KEEP_MICROS = 100000  # keep docs with < 10% duplicate trigrams


@register(
    "text_repetition_filter",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split({_REP_ENRICH_SQL}, ' ') AS words
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             [array_to_string(words[i:i+2], ' ')
              FOR i IN range(1, len(words) - 1)] AS grams
      FROM w WHERE len(words) >= 3
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_unique,
           CAST((len(grams) - len(list_distinct(grams))) * 1000000
                // len(grams) AS BIGINT) AS dup_micros,
           (len(grams) - len(list_distinct(grams))) * 1000000
             // len(grams) < {_REP_KEEP_MICROS} AS keep
    FROM g
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition rule: fraction of
    duplicate word trigrams, as exact integer micros (dup-count *
    1e6 // total — no float division anywhere), and a keep flag at the
    10% threshold.

    Scale design: pure projection — trigrams are built per row with
    ``transform(sequence(...), slice(...))`` inside whole-stage codegen
    and never materialize as exploded rows, so there is NO shuffle and
    no row-count blowup; at 100 TB this runs at scan speed. (Contrast
    with explode→groupBy trigram counting, which would shuffle ~30x the
    corpus.)"""
    d = load_table(spark, sf_dir, "documents")
    d = d.select(
        "doc_id",
        F.expr(f"split({_REP_ENRICH_SQL}, ' ')").alias("words"),
    ).filter(F.size("words") >= 3)
    d = d.select(
        "doc_id",
        F.expr(
            "transform(sequence(1, size(words) - 2),"
            " i -> concat_ws(' ', slice(words, i, 3)))"
        ).alias("grams"),
    )
    n_grams = F.size("grams").cast("long")
    n_unique = F.size(F.array_distinct("grams")).cast("long")
    dup_micros = F.expr(
        "CAST((size(grams) - size(array_distinct(grams))) * 1000000"
        " div size(grams) AS BIGINT)"
    )
    return d.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_unique.alias("n_unique"),
        dup_micros.alias("dup_micros"),
        (dup_micros < F.lit(_REP_KEEP_MICROS)).alias("keep"),
    )


# --------------------------------------------------------------------------
# Deterministic train/val/test split assignment
# --------------------------------------------------------------------------


@register(
    "split_train_val_test",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang, n_chars,
             {sql_mhash64("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
    FROM b GROUP BY 1
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by content-stable
    hash (``mhash64(doc_id) % 100``), with per-split size and coverage
    stats. Hash-based assignment is the scale-correct form: it needs no
    global sort or sampling state, any worker can recompute a doc's
    split independently, and the split survives corpus growth —
    properties a ``rand()`` split lacks.

    One hash-key shuffle into a 3-group aggregate; all stats are exact
    integers."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (mhash64(F.col("doc_id").cast("string")) % 100).alias("bucket")
    d = d.select("doc_id", "lang", "n_chars", bucket)
    split = (
        F.when(F.col("bucket") < 90, "train")
        .when(F.col("bucket") < 95, "val")
        .otherwise("test")
        .alias("split")
    )
    return (
        d.select(split, "doc_id", "lang", "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


# --------------------------------------------------------------------------
# BM25-style keyword relevance top-k
# --------------------------------------------------------------------------

_BM25_TERMS = ("scan", "merge", "vector")
_BM25_K = 25
# Rational idf — (N - df + 0.5)/(df + 0.5), the BM25 idf WITHOUT the log:
# log() is libm-dependent and engines may differ in the last ulp, while
# +,-,*,/ are IEEE-correctly-rounded, so identical operand order gives
# bit-identical doubles in Spark and DuckDB. Monotone in df like the
# log form, so ranking semantics are preserved. k1=1.2, b=0.75 appear
# as source literals on both sides (same parse → same double).
_SCORE_TMPL = (
    "((CAST(n_docs AS DOUBLE) - CAST({df} AS DOUBLE) + 0.5)"
    " / (CAST({df} AS DOUBLE) + 0.5))"
    " * ((CAST({tf} AS DOUBLE) * 2.2)"
    " / (CAST({tf} AS DOUBLE) + 1.2 * (0.25 + 0.75 *"
    " (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))"
)


def _bm25_score_sql() -> str:
    terms = " + ".join(
        _SCORE_TMPL.format(df=f"df_{t}", tf=f"tf_{t}") for t in _BM25_TERMS
    )
    return terms


@register(
    "search_bm25_topk",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id,
             {", ".join(f"len(list_filter(string_split(text, ' '), w -> w = '{t}')) AS tf_{t}" for t in _BM25_TERMS)},
             len(string_split(text, ' ')) AS dl
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
             {", ".join(f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in _BM25_TERMS)}
      FROM tf
    )
    SELECT doc_id, {", ".join(f"CAST(tf_{t} AS BIGINT) AS tf_{t}" for t in _BM25_TERMS)},
           {_bm25_score_sql()} AS score
    FROM tf CROSS JOIN stats
    WHERE {" + ".join(f"tf_{t}" for t in _BM25_TERMS)} > 0
    ORDER BY score DESC, doc_id
    LIMIT {_BM25_K}
    """,
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-style keyword relevance: top-25 documents for a 3-term
    query, k1=1.2, b=0.75, rational idf (see _SCORE_TMPL note on why no
    log). Term frequencies come from per-row higher-order ``filter()``
    over the token array — NOT explode→groupBy — so the corpus is never
    row-multiplied and the only wide operations are a 1-row global
    stats aggregate (broadcast back) and the final
    TakeOrderedAndProject top-k. At 100 TB: one scan for stats, one
    scan for scoring, no shuffle proportional to tokens.

    The score expression is generated from the SAME template as the
    DuckDB oracle, so operand order — and hence every IEEE rounding —
    is identical across engines."""
    d = load_table(spark, sf_dir, "documents")
    tf_cols = [
        F.expr(f"size(filter(split(text, ' '), w -> w = '{t}'))").alias(f"tf_{t}")
        for t in _BM25_TERMS
    ]
    tf = d.select(
        "doc_id", *tf_cols, F.expr("size(split(text, ' '))").alias("dl")
    )
    stats = tf.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    scored = (
        tf.join(F.broadcast(stats))
        .filter(sum(F.col(f"tf_{t}") for t in _BM25_TERMS) > 0)
        .select(
            "doc_id",
            *[F.col(f"tf_{t}").cast("long").alias(f"tf_{t}") for t in _BM25_TERMS],
            F.expr(_bm25_score_sql()).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(_BM25_K)


# --------------------------------------------------------------------------
# Multi-grain time rollup (hypertable-style continuous aggregate)
# --------------------------------------------------------------------------


@register(
    "rollup_time_multigrain",
    oracle=f"""
    SELECT CASE WHEN GROUPING(date_trunc('hour', ts)) = 0 THEN 'hour'
                WHEN GROUPING(date_trunc('day', ts)) = 0 THEN 'day'
                ELSE 'month' END AS grain,
           CAST(COALESCE(date_trunc('hour', ts), date_trunc('day', ts),
                         date_trunc('month', ts)) AS TIMESTAMP) AS bucket_start,
           COUNT(*) AS n, {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((date_trunc('hour', ts)), (date_trunc('day', ts)),
                            (date_trunc('month', ts)))
    """,
)
def rollup_time_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: hourly, daily, and
    monthly aggregates of the event stream in ONE pass via GROUPING
    SETS (Catalyst Expand — each input row feeds all three grains
    without three scans). The map-side partial aggregate collapses the
    3x expansion before the single shuffle, so at 100 TB this costs one
    scan + one shuffle of (distinct buckets) rows, not 3 full passes."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_rt")
    return spark.sql(
        f"""
        SELECT CASE WHEN GROUPING(date_trunc('hour', ts)) = 0 THEN 'hour'
                    WHEN GROUPING(date_trunc('day', ts)) = 0 THEN 'day'
                    ELSE 'month' END AS grain,
               CAST(COALESCE(date_trunc('hour', ts), date_trunc('day', ts),
                             date_trunc('month', ts)) AS TIMESTAMP)
                 AS bucket_start,
               COUNT(*) AS n, {sql_dsum('value')} AS sum_value
        FROM events_rt
        GROUP BY GROUPING SETS ((date_trunc('hour', ts)), (date_trunc('day', ts)),
                                (date_trunc('month', ts)))
        """
    )


# --------------------------------------------------------------------------
# Funnel conversion: view -> click -> purchase
# --------------------------------------------------------------------------


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(v.t_view) AS n_view,
           COUNT(c.t_click) AS n_click,
           COUNT(p.t_purchase) AS n_purchase,
           CAST(COALESCE(SUM(epoch_us(c.t_click) - epoch_us(v.t_view)), 0)
                AS BIGINT) AS sum_view_to_click_us,
           CAST(COALESCE(SUM(epoch_us(p.t_purchase) - epoch_us(c.t_click)), 0)
                AS BIGINT) AS sum_click_to_purchase_us
    FROM v LEFT JOIN c ON c.user_id = v.user_id
           LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: first view, first click strictly after that
    view, first purchase strictly after that click; per-stage user
    counts and exact integer-microsecond stage-transition time sums.

    Three staged aggregates, all keyed on user_id — the shuffles are
    co-partitioned and the stage-2/3 inputs are filtered to single
    event types before shuffling. The ordering constraint (click AFTER
    view) is what a single conditional aggregate cannot express, hence
    the staged shape; each stage's output is one row per user, so the
    joins are agg-sized, not event-sized."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    us = lambda col: F.unix_micros(F.col(col).cast("timestamp"))  # noqa: E731
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("*").alias("n_users"),
            F.count("t_view").alias("n_view"),
            F.count("t_click").alias("n_click"),
            F.count("t_purchase").alias("n_purchase"),
            F.coalesce(F.sum(us("t_click") - us("t_view")), F.lit(0))
            .cast("long")
            .alias("sum_view_to_click_us"),
            F.coalesce(F.sum(us("t_purchase") - us("t_click")), F.lit(0))
            .cast("long")
            .alias("sum_click_to_purchase_us"),
        )
    )


# --------------------------------------------------------------------------
# Weekly cohort retention
# --------------------------------------------------------------------------


@register(
    "cohort_weekly_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    a AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events
    )
    SELECT CAST(f.cohort_week AS TIMESTAMP) AS cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) // 7
                AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM f JOIN a ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-seen
    ISO week, activity counted per week offset. All shuffles are keyed
    on user_id until the final (tiny: cohorts x offsets) aggregate; the
    cohort frame is one row per user so the join is agg-sized. Exact
    integer math throughout (day diff // 7)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    f = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    a = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        f.join(a, "user_id")
        .select(
            # timestamp, not date, on the compare surface: Spark DATE
            # arrives as pandas object vs DuckDB datetime64 (hash-fail)
            F.col("cohort_week").cast("timestamp").alias("cohort_week"),
            (
                F.datediff(
                    F.col("active_week").cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            )
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )


# --------------------------------------------------------------------------
# Per-key z-score anomaly detection
# --------------------------------------------------------------------------

_Z_THRESHOLD = 2.5


@register(
    "anomaly_zscore_users",
    oracle=f"""
    WITH s AS (
      SELECT user_id, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v,
             CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v2
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT user_id, n, sum_v / n AS mean_v,
             sqrt((sum_v2 - sum_v * (sum_v / n)) / (n - 1)) AS std_v
      FROM s WHERE n > 1
    )
    SELECT m.user_id, CAST(m.n AS BIGINT) AS n, m.mean_v, m.std_v,
           CAST(SUM(CASE WHEN abs((e.value - m.mean_v) / m.std_v)
                              > {_Z_THRESHOLD}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN m ON m.user_id = e.user_id
    GROUP BY m.user_id, m.n, m.mean_v, m.std_v
    """,
)
def anomaly_zscore_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outlier detection: mean/std from exact decimal
    sums (order-independent, hence engine-identical — see
    functions/deterministic.py), then a second co-partitioned pass
    flags events with |z| > {thr}.

    The variance uses sum_v2 - sum_v*(sum_v/n) with that exact operand
    order on both engines, so every IEEE rounding matches bit-for-bit.
    Two shuffles, both keyed on user_id (stats agg, then flag agg); the
    stats frame is one row per user so the join is agg-sized. At scale
    the same shape holds: no global pass, no driver state, skew bounded
    by per-user event counts."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    dec = "decimal(38,6)"
    s = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(dec)).cast("double").alias("sum_v"),
        F.sum((F.col("value") * F.col("value")).cast(dec))
        .cast("double")
        .alias("sum_v2"),
    )
    m = s.filter(F.col("n") > 1).select(
        "user_id",
        "n",
        (F.col("sum_v") / F.col("n")).alias("mean_v"),
        F.sqrt(
            (F.col("sum_v2") - F.col("sum_v") * (F.col("sum_v") / F.col("n")))
            / (F.col("n") - 1)
        ).alias("std_v"),
    )
    z = F.abs((F.col("value") - F.col("mean_v")) / F.col("std_v"))
    return (
        ev.join(m, "user_id")
        .groupBy("user_id", "n", "mean_v", "std_v")
        .agg(
            F.sum(F.when(z > _Z_THRESHOLD, 1).otherwise(0))
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            "mean_v",
            "std_v",
            "n_outliers",
        )
    )


anomaly_zscore_users.__doc__ = anomaly_zscore_users.__doc__.format(
    thr=_Z_THRESHOLD
)


# --------------------------------------------------------------------------
# Incremental aggregate maintenance (merge stored rollup + new partition)
# --------------------------------------------------------------------------

_IVM_CUTOFF = "2024-01-21 00:00:00"


@register(
    "rollup_incremental_merge",
    oracle=f"""
    WITH history AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
             COUNT(*) AS n, {sql_dsum('value')} AS sum_value
      FROM events WHERE ts < TIMESTAMP '{_IVM_CUTOFF}'
      GROUP BY 1, 2
    ),
    fresh AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
             COUNT(*) AS n, {sql_dsum('value')} AS sum_value
      FROM events WHERE ts >= TIMESTAMP '{_IVM_CUTOFF}'
      GROUP BY 1, 2
    ),
    unioned AS (
      SELECT * FROM history UNION ALL SELECT * FROM fresh
    )
    SELECT day, event_type,
           CAST(SUM(n) AS BIGINT) AS n,
           {sql_dsum('sum_value')} AS sum_value
    FROM unioned GROUP BY day, event_type
    """,
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a stored daily rollup (history,
    simulated here by aggregating the pre-cutoff partition) merges with
    a freshly-aggregated new partition by UNION ALL + re-aggregate —
    history is NEVER rescanned at the raw-event level in steady state.
    Correctness rests on additivity: counts add, and the decimal-exact
    sum of per-partition double partials is order-independent, so
    merged == recomputed-from-scratch bit-for-bit (the oracle builds
    the same two-level nesting). At 100 TB this is the difference
    between touching one day and touching three years."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_IVM_CUTOFF).cast("timestamp")

    def daily(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("day", F.col("ts")).cast("timestamp").alias("day"),
            "event_type",
        ).agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))

    history = daily(ev.filter(F.col("ts") < cutoff))
    fresh = daily(ev.filter(F.col("ts") >= cutoff))
    return (
        history.unionAll(fresh)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            dsum("sum_value").alias("sum_value2"),
        )
        .select("day", "event_type", "n", F.col("sum_value2").alias("sum_value"))
    )


# --------------------------------------------------------------------------
# Time-series forward fill (gap imputation)
# --------------------------------------------------------------------------


@register(
    "timeseries_forward_fill",
    oracle="""
    WITH m AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id, user_id, v,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING
           ) AS v_filled
    FROM m
    """,
)
def timeseries_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key forward fill (gap imputation): every 7th reading is
    masked to NULL, then repaired with the most recent non-null value
    in the key's (ts, event_id) total order — ``last(ignorenulls)``
    over a running frame, the standard sensor/metric backfill. Leading
    NULLs (no prior observation) stay NULL by design. One hash shuffle
    on the key; the running frame is computed in a single sort pass
    per partition."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    m = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return m.select(
        "event_id",
        "user_id",
        "v",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )


# --------------------------------------------------------------------------
# Fuzzy record linkage (entity resolution): blocked Levenshtein pairs
# --------------------------------------------------------------------------

_FUZZY_WINDOW = 100  # sorted-neighborhood cap within a block
_FUZZY_MAX_DIST = 2


@register(
    "fuzzy_name_pairs",
    oracle=f"""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND b.c_custkey > a.c_custkey
     AND b.c_custkey <= a.c_custkey + {_FUZZY_WINDOW}
    WHERE levenshtein(a.c_name, b.c_name) <= {_FUZZY_MAX_DIST}
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution / fuzzy record linkage: candidate pairs from
    sorted-neighborhood blocking (same nation block + id-window cap
    {w}), verified by edit distance <= {d}. The blocking is what makes
    this survive scale: comparisons per record are bounded by the
    window, not the block size, so the join is O(n * w) instead of the
    O(n^2 / blocks) an unbounded within-block self-join degrades to on
    a hot block. Levenshtein runs JVM-side (both engines implement the
    same classic DP), and the equi-part of the join condition (nation)
    drives the shuffle key.

    The edit distance is computed BEHIND planctl.nondet_keep: without
    the taint Catalyst merges the dist filter into the join condition
    and orders the O(len^2) DP BEFORE the cheap id-range prune — every
    within-nation pair pays a levenshtein (measured 21s at sf0.1;
    0.9s with the taint). Same planner hazard as dedup_ngram_jaccard."""
    from ..functions.planctl import nondet_keep

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_name"
    )
    a = c.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_nationkey").alias("nk_a"),
        F.col("c_name").alias("name_a"),
    )
    b = c.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_nationkey").alias("nk_b"),
        F.col("c_name").alias("name_b"),
    )
    # nondet_keep works in double (0.0*rand); small ints are exact in
    # double, so the round trip long->double->long is value-preserving
    dist = nondet_keep(F.levenshtein("name_a", "name_b").cast("double")).cast(
        "long"
    )
    return (
        a.join(
            b,
            (F.col("nk_a") == F.col("nk_b"))
            & (F.col("id_b") > F.col("id_a"))
            & (F.col("id_b") <= F.col("id_a") + _FUZZY_WINDOW),
        )
        .select("id_a", "id_b", dist.alias("dist"))
        .filter(F.col("dist") <= _FUZZY_MAX_DIST)
    )


fuzzy_name_pairs.__doc__ = fuzzy_name_pairs.__doc__.format(
    w=_FUZZY_WINDOW, d=_FUZZY_MAX_DIST
)


# --------------------------------------------------------------------------
# Share-of-total within a hierarchy (ratio_to_report)
# --------------------------------------------------------------------------


@register(
    "window_share_of_total",
    oracle=f"""
    WITH n AS (
      SELECT n.n_regionkey AS regionkey, c.c_nationkey AS nationkey,
             {sql_dsum('o.o_totalprice')} AS nation_rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    )
    , r AS (
      SELECT regionkey,
             CAST(SUM(CAST(nation_rev AS DECIMAL(38,6))) AS DOUBLE)
               AS region_rev
      FROM n GROUP BY regionkey
    )
    SELECT n.regionkey, n.nationkey, n.nation_rev,
           n.nation_rev / r.region_rev AS region_share
    FROM n JOIN r ON r.regionkey = n.regionkey
    """,
)
def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ratio_to_report: each nation's revenue share within its region —
    an aggregate frame re-windowed by the parent hierarchy level. The
    share pass runs over the AGGREGATED frame (|nations| rows), never
    the fact table, so it is free at any scale. The denominator is NOT
    a window SUM over doubles — that is summation-order-dependent and
    measurably diverges between engines even on 5-row partitions
    (observed last-ulp mismatches) — but a decimal-exact region
    aggregate broadcast-joined back, so both engines divide identical
    operands."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    from pyspark.sql import Window

    agg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_regionkey").alias("regionkey"),
            F.col("c_nationkey").alias("nationkey"),
        )
        .agg(dsum("o_totalprice").alias("nation_rev"))
    )
    totals = agg.groupBy("regionkey").agg(
        F.sum(F.col("nation_rev").cast("decimal(38,6)"))
        .cast("double")
        .alias("region_rev")
    )
    return agg.join(F.broadcast(totals), "regionkey").select(
        "regionkey",
        "nationkey",
        "nation_rev",
        (F.col("nation_rev") / F.col("region_rev")).alias("region_share"),
    )


# --------------------------------------------------------------------------
# Time-weighted average (interval-weighted mean per key)
# --------------------------------------------------------------------------


@register(
    "timeseries_time_weighted_avg",
    oracle="""
    WITH d AS (
      SELECT user_id, value,
             epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS dt_us
      FROM events
    )
    SELECT user_id,
           CAST(SUM(dt_us) AS BIGINT) AS observed_us,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(19,6)) * dt_us) AS DOUBLE)
             / SUM(dt_us), 9) AS twa_value
    FROM d WHERE dt_us IS NOT NULL
    GROUP BY user_id
    """,
)
def timeseries_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per key: each reading holds until the next
    one (step interpolation), so its weight is the microsecond interval
    to the successor (lead over the (ts,event_id) total order); the
    final reading has no successor and drops out, exactly like a
    monitoring TWA over a closed window. Weights are exact integer
    micros; the weighted sum is per-row double * int cast to exact
    decimal, so the aggregate is order-independent and engine-identical.
    One key shuffle shared by the lead window and the aggregate."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    d = ev.select(
        "user_id",
        "value",
        (F.unix_micros(F.lead("ts").over(w).cast("timestamp")) - us("ts")).alias(
            "dt_us"
        ),
    ).filter(F.col("dt_us").isNotNull())
    return d.groupBy("user_id").agg(
        F.sum("dt_us").cast("long").alias("observed_us"),
        # factor-cast-then-multiply (numeric trap #1): value*dt is
        # ~1e14 with 6 decimals = 21 significant digits, beyond a
        # computed double's 17 - the product must be formed IN decimal.
        # Spark factor at (18,6); DuckDB at (19,6) to force hugeint
        # storage (same trap as agg_corr_qty_price); values identical.
        # ...and the weighted sum is a 16+-digit decimal whose ->double
        # conversion differs in the last ulp per engine (numeric trap
        # #2) - 9-decimal compare surface, same as agg_corr_qty_price
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)") * F.col("dt_us"))
            .cast("double")
            / F.sum("dt_us"),
            9,
        ).alias("twa_value"),
    )


# --------------------------------------------------------------------------
# Robust (median/MAD) per-user anomaly detection
# --------------------------------------------------------------------------

_MAD_K = 3.0       # flag |value - median| > K * 1.4826 * MAD
_MAD_SCALE = 1.4826  # the normal-consistency constant


@register(
    "anomaly_mad_robust",
    oracle=f"""
    WITH med AS (
      SELECT user_id, COUNT(*) AS n,
             quantile_cont(value, 0.5) AS med_v
      FROM events GROUP BY user_id
    ),
    mad AS (
      SELECT e.user_id,
             quantile_cont(abs(e.value - m.med_v), 0.5) AS mad_v
      FROM events e JOIN med m ON m.user_id = e.user_id
      GROUP BY e.user_id
    )
    SELECT m.user_id, CAST(m.n AS BIGINT) AS n, m.med_v, d.mad_v,
           CAST(SUM(CASE WHEN abs(e.value - m.med_v)
                              > {_MAD_K} * ({_MAD_SCALE} * d.mad_v)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e
    JOIN med m ON m.user_id = e.user_id
    JOIN mad d ON d.user_id = e.user_id
    WHERE d.mad_v > 0
    GROUP BY m.user_id, m.n, m.med_v, d.mad_v
    """,
)
def anomaly_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user outlier detection — median/MAD instead of
    mean/std (the ``anomaly_zscore_users`` twin that a heavy-tailed
    value distribution doesn't fool: one wild event inflates std and
    masks itself; the median absolute deviation barely moves).

    Flags events with |value − median| > {k}·(1.4826·MAD); users whose
    MAD is exactly 0 (constant-valued) are excluded as degenerate —
    deterministic on both engines. Exact grouped medians use the
    Spark ``percentile`` / DuckDB ``quantile_cont`` pairing the
    percentile operators already pin as bit-compatible; the deviation
    and threshold arithmetic is the same IEEE expression on both sides.

    Three passes, every one keyed on user_id (median agg → MAD agg →
    flag agg) with agg-sized join frames — co-partitioned, no global
    pass, no driver state. Exact per-user medians buffer one user's
    values per group; at 100 TB swap both ``percentile`` calls for
    ``percentile_approx`` (same shape, bounded memory) when per-user
    cardinality is unbounded.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    med = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.expr("percentile(value, 0.5)").alias("med_v"),
    )
    mad = (
        ev.join(med.select("user_id", "med_v"), "user_id")
        .groupBy("user_id")
        .agg(
            F.expr("percentile(abs(value - med_v), 0.5)").alias("mad_v")
        )
    )
    dev = F.abs(F.col("value") - F.col("med_v"))
    return (
        ev.join(med, "user_id")
        .join(mad, "user_id")
        .filter(F.col("mad_v") > 0)
        .groupBy("user_id", "n", "med_v", "mad_v")
        .agg(
            F.sum(
                F.when(dev > _MAD_K * (_MAD_SCALE * F.col("mad_v")), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            "med_v",
            "mad_v",
            "n_outliers",
        )
    )


anomaly_mad_robust.__doc__ = anomaly_mad_robust.__doc__.format(k=_MAD_K)


# --------------------------------------------------------------------------
# Missing-value imputation (group-median fill) and per-group OLS trend
# --------------------------------------------------------------------------


@register(
    "repair_impute_group_median",
    oracle="""
    WITH marked AS (
      SELECT event_id, event_type, value,
             (event_id % 13 = 0) AS was_missing
      FROM events
    ),
    med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med_v
      FROM marked WHERE NOT was_missing GROUP BY event_type
    )
    SELECT m.event_id, m.event_type,
           CASE WHEN m.was_missing THEN d.med_v ELSE m.value END
             AS value_imputed,
           m.was_missing
    FROM marked m JOIN med d ON d.event_type = m.event_type
    """,
)
def repair_impute_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value repair: rows flagged missing (a deterministic
    ~7.7 % of event_ids stand in for NULL sensor readings) are filled
    with the per-event_type median of the PRESENT values — the robust
    imputation a feature pipeline applies before training. Exact
    grouped median via the Spark ``percentile`` / DuckDB
    ``quantile_cont`` pairing (pinned bit-compatible by the percentile
    ops); the |groups|-row median table broadcasts back, so the repair
    is one aggregation plus a map-side join. At unbounded per-group
    cardinality swap in ``percentile_approx`` (same shape, bounded
    memory)."""
    ev = load_table(spark, sf_dir, "events")
    marked = ev.select(
        "event_id",
        "event_type",
        "value",
        (F.col("event_id") % 13 == 0).alias("was_missing"),
    )
    med = (
        marked.filter(~F.col("was_missing"))
        .groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("med_v"))
    )
    return marked.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        F.when(F.col("was_missing"), F.col("med_v"))
        .otherwise(F.col("value"))
        .alias("value_imputed"),
        "was_missing",
    )


# days between epoch and 2024-01-01 (the fixture's time origin): keeps
# the regression abscissa small so x**2 sums stay inside DECIMAL(38,6)
_X0_US = 1_704_067_200_000_000


@register(
    "trend_value_slope_per_user",
    oracle=f"""
    WITH p AS (
      SELECT user_id,
             (epoch_us(ts) - {_X0_US}) / 86400000000.0 AS x,
             value AS y
      FROM events
    ),
    s AS (
      SELECT user_id, COUNT(*) AS n,
             {sql_dsum('x')} AS sx, {sql_dsum('y')} AS sy,
             {sql_dsum('x * y')} AS sxy, {sql_dsum('x * x')} AS sxx
      FROM p GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n,
           (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0)
             AS slope_per_day
    FROM s
    """,
)
def trend_value_slope_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend (value vs. time, slope per day) from exact
    decimal power sums — the same recipe as ``agg_stats_moments``:
    the engine-native ``regr_slope`` runs a streaming estimator whose
    float accumulation order differs across engines, so instead each
    row computes x, y, x·y, x² as doubles (IEEE-identical per row),
    the cross-row sums go through DECIMAL(38,6) (exact,
    order-independent), and the closed-form slope is a fixed per-row
    double expression of identical operands. The abscissa is days
    since the corpus origin so x² stays small. One hash aggregation;
    NULLIF guards single-instant users."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.select(
        "user_id",
        (
            (F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(_X0_US))
            / F.lit(86400000000.0)
        ).alias("x"),
        F.col("value").alias("y"),
    )
    s = p.groupBy("user_id").agg(
        F.count("*").alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n")
    return s.select(
        "user_id",
        n.cast("long").alias("n"),
        (
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.nullif(n * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0))
        ).alias("slope_per_day"),
    )


# --------------------------------------------------------------------------
# Market-basket co-occurrence (association-rule mining primitive)
# --------------------------------------------------------------------------

_BASKET_TOPK = 25


@register(
    "basket_part_pair_lift",
    oracle=f"""
    WITH base AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    tot AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM base),
    pn AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY pk),
    pairs AS (
      SELECT a.pk AS p1, b.pk AS p2, CAST(COUNT(*) AS BIGINT) AS n_both
      FROM base a JOIN base b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk
    ),
    top AS (
      SELECT p1, p2, n_both FROM pairs
      ORDER BY n_both DESC, p1, p2 LIMIT {_BASKET_TOPK}
    )
    SELECT t.p1, t.p2, t.n_both,
           n1.n AS n_p1, n2.n AS n_p2,
           CAST(t.n_both AS DOUBLE) * tot.n_orders / (n1.n * n2.n) AS lift
    FROM top t
    JOIN pn n1 ON n1.pk = t.p1
    JOIN pn n2 ON n2.pk = t.p2
    CROSS JOIN tot
    """,
)
def basket_part_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top-{k} part pairs bought
    together in one order, with support counts and lift — the
    association-rule primitive (FP-growth's first pass). The per-order
    self-join is bounded by ORDER SIZE (TPC-H orders hold ≤7 lines →
    ≤21 pairs each), so pair generation is linear in rows with a small
    constant — never corpus-quadratic; the top-k compiles to
    TakeOrderedAndProject under a (n_both, p1, p2) total order, and
    lift is one double expression of exact integers (count × count /
    (count × count)) — deterministic cross-engine. Per-part counts
    join back onto only the k winners."""
    li = load_table(spark, sf_dir, "lineitem")
    # NOTE (r15): materializing this distinct once for its four
    # consumers was A/B-measured slower (1.94 s → 2.61 s at sf0.1);
    # the parallel re-scans are cheaper than the checkpoint job.
    # NOTE (r16): the triangle census's collect_set + combinations
    # pair generation was A/B'd here too and REJECTED (1.60 → 1.74 s
    # isolated min-of-3): unlike the triangle query, both self-join
    # sides prune the SAME (ok, pk) columns, so the planner already
    # reuses one exchange for both sides and the join adds less than
    # the collect_set object buffers cost. Kept as the self-join.
    base = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    tot = base.agg(F.countDistinct("ok").cast("long").alias("n_orders"))
    pn = base.groupBy("pk").agg(F.count("*").cast("long").alias("n"))
    a, b = base.alias("a"), base.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("p1"), F.col("b.pk").alias("p2"))
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    top = pairs.orderBy(F.desc("n_both"), "p1", "p2").limit(_BASKET_TOPK)
    n1 = pn.select(F.col("pk").alias("p1"), F.col("n").alias("n_p1"))
    n2 = pn.select(F.col("pk").alias("p2"), F.col("n").alias("n_p2"))
    return (
        top.join(n1, "p1")
        .join(n2, "p2")
        .crossJoin(F.broadcast(tot))
        .select(
            "p1",
            "p2",
            "n_both",
            "n_p1",
            "n_p2",
            (
                F.col("n_both").cast("double")
                * F.col("n_orders")
                / (F.col("n_p1") * F.col("n_p2"))
            ).alias("lift"),
        )
    )


basket_part_pair_lift.__doc__ = basket_part_pair_lift.__doc__.format(
    k=_BASKET_TOPK
)


# --------------------------------------------------------------------------
# Multi-touch attribution (linear credit, integer-exact)
# --------------------------------------------------------------------------

_ATTR_WINDOW_H = 24


@register(
    "attribution_linear_touch",
    oracle=f"""
    WITH purchases AS (
      SELECT event_id AS pid, user_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT event_id AS tid, user_id, event_type AS touch_type, ts AS tts
      FROM events WHERE event_type IN ('view', 'click')
    ),
    joined AS (
      SELECT p.pid, t.touch_type,
             COUNT(*) OVER (PARTITION BY p.pid) AS n_touches
      FROM purchases p JOIN touches t
        ON t.user_id = p.user_id
       AND t.tts <= p.pts
       AND t.tts > p.pts - INTERVAL {_ATTR_WINDOW_H} HOUR
    )
    SELECT touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_touchpoints,
           CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_purchases,
           CAST(SUM(1000000 // n_touches) AS BIGINT) AS credit_micros
    FROM joined GROUP BY touch_type
    """,
)
def attribution_linear_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every view/click in the {h} h
    window before a purchase by the same user shares that purchase's
    credit equally; credits are INTEGER MICROS (``1e6 div n_touches``)
    so the cross-row credit sum is exact and order-independent (a
    float 1/n sum would be accumulation-order-dependent and
    hash-diverge cross-engine). The purchase↔touch join is keyed on
    user_id with a bounded time-range predicate — per-user work is
    touches × purchases inside a {h} h window, never a cross of the
    full history (the as-of/range-join family's shape); the per-
    purchase touch count is one window over the join output."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("tid"),
        F.col("user_id").alias("t_user_id"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("tts"),
    )
    joined = purchases.join(
        touches,
        (F.col("t_user_id") == F.col("user_id"))
        & (F.col("tts") <= F.col("pts"))
        & (F.col("tts") > F.col("pts") - F.expr(f"INTERVAL {_ATTR_WINDOW_H} HOURS")),
    ).select("pid", "touch_type")
    w = Window.partitionBy("pid")
    credited = joined.select(
        "pid", "touch_type", F.count("*").over(w).alias("n_touches")
    )
    return credited.groupBy("touch_type").agg(
        F.count("*").cast("long").alias("n_touchpoints"),
        F.countDistinct("pid").cast("long").alias("n_purchases"),
        F.sum(F.expr("1000000 div n_touches")).cast("long").alias("credit_micros"),
    )


attribution_linear_touch.__doc__ = attribution_linear_touch.__doc__.format(
    h=_ATTR_WINDOW_H
)
