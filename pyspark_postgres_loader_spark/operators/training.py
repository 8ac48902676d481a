"""Training-data pipeline operators: PII redaction, document chunking,
token-budget sequence packing, benchmark-contamination detection,
embedding quantization, and domain-mixture weighting.

These have no counterpart in the reference loader (its surface ends at
extract/transform/load — see SURVEY.md §2); they are the
"beyond-the-reference" operators a 100 TB LLM-corpus pipeline needs.
Design rules shared by every op here:

- hot path is JVM-side codegen (regexp / higher-order array functions),
  zero Python UDFs;
- per-row double arithmetic only (IEEE-identical across engines); any
  cross-row aggregate is over exact integers — computed doubles are
  never summed (see functions/deterministic.py for why);
- shuffles only where an aggregation/join needs one, and every join
  side that is small by construction (benchmark n-gram set, range
  offsets) is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.deterministic import mhash64, sql_mhash64
from ..registry import register
from ..tables import load_table

# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# Patterns chosen to parse identically under Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, \b word boundaries.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
_PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

# The synthetic corpus is a clean word soup, so the fixture would make
# every count 0; inject deterministic PII derived from doc_id first so
# redaction is exercised on real matches in BOTH engines identically.
_SQL_ENRICH = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com call +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
    "' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.1'"
)


@register(
    "text_pii_redact",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_ENRICH} AS enriched FROM documents),
    r AS (
      SELECT doc_id, enriched,
             regexp_replace(regexp_replace(regexp_replace(enriched,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
               '{_PII_IP}', '<IP>', 'g') AS redacted
      FROM t
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(enriched, '{_PII_EMAIL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(enriched, '{_PII_PHONE}')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(enriched, '{_PII_IP}')) AS BIGINT)
             AS n_ips,
           CAST(len(regexp_extract_all(redacted, '{_PII_EMAIL}'))
              + len(regexp_extract_all(redacted, '{_PII_PHONE}'))
              + len(regexp_extract_all(redacted, '{_PII_IP}')) AS BIGINT)
             AS n_residual,
           {sql_mhash64('redacted')} AS redacted_hash
    FROM r
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and redact emails / phone numbers / IPv4
    addresses. Pure projection — zero shuffles, linear scan; the regexes
    run inside whole-stage codegen. ``n_residual`` re-scans the redacted
    text (must be 0: redaction is idempotent), ``redacted_hash`` pins
    the exact output text cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    enriched = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".0.1"),
    )
    d = d.select("doc_id", enriched.alias("enriched"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("enriched"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    d = d.withColumn("redacted", redacted)

    def _n(col: str, pat: str) -> F.Column:
        return F.size(F.regexp_extract_all(F.col(col), F.lit(pat), 0)).cast("long")

    return d.select(
        "doc_id",
        _n("enriched", _PII_EMAIL).alias("n_emails"),
        _n("enriched", _PII_PHONE).alias("n_phones"),
        _n("enriched", _PII_IP).alias("n_ips"),
        (
            _n("redacted", _PII_EMAIL)
            + _n("redacted", _PII_PHONE)
            + _n("redacted", _PII_IP)
        ).alias("n_residual"),
        mhash64("redacted").alias("redacted_hash"),
    )


# --------------------------------------------------------------------------
# Fixed-window chunking
# --------------------------------------------------------------------------

_CHUNK_WINDOW = 32  # tokens per chunk
_CHUNK_STRIDE = 24  # new chunk every 24 tokens → 8-token overlap


@register(
    "text_chunk_windows",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w FROM documents
    ),
    e AS (
      SELECT doc_id, w,
             unnest(generate_series(
               0, (len(w) + {_CHUNK_STRIDE - 1}) // {_CHUNK_STRIDE} - 1)) AS ci
      FROM t
    )
    SELECT doc_id,
           CAST(ci AS BIGINT) AS chunk_idx,
           CAST(len(w[ci*{_CHUNK_STRIDE}+1 : ci*{_CHUNK_STRIDE}+{_CHUNK_WINDOW}])
                AS BIGINT) AS chunk_tokens,
           {sql_mhash64(
               "array_to_string("
               f"w[ci*{_CHUNK_STRIDE}+1 : ci*{_CHUNK_STRIDE}+{_CHUNK_WINDOW}], ' ')"
           )} AS chunk_hash
    FROM e
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking for context-length-bounded training:
    32-token windows every 24 tokens (8-token overlap), last window
    truncated. One explode, no shuffle — chunk count per doc is
    ``ceil(tokens/stride)`` so output size is predictable (~1.33× token
    count), and the chunk hash pins exact chunk text cross-engine."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), r"\s+").alias("w")
    )
    n_chunks = F.floor(
        (F.size("w") + F.lit(_CHUNK_STRIDE - 1)) / F.lit(_CHUNK_STRIDE)
    ).cast("int")
    e = d.select(
        "doc_id", "w", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("ci")
    )
    chunk = F.expr(f"slice(w, ci*{_CHUNK_STRIDE}+1, {_CHUNK_WINDOW})")
    return e.select(
        "doc_id",
        F.col("ci").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        mhash64(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


# --------------------------------------------------------------------------
# Token-budget sequence packing
# --------------------------------------------------------------------------

_PACK_BUDGET = 2048


@register(
    "pack_token_budget_bins",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(regexp_split_to_array(text, '\\s+')) AS tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, tokens,
             SUM(tokens) OVER (ORDER BY tokens DESC, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cs
      FROM t
    )
    SELECT CAST(floor((cs - tokens) / {_PACK_BUDGET}.0) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS bin_tokens,
           CAST(SUM(tokens) AS DOUBLE) / {_PACK_BUDGET} AS fill_ratio
    FROM c
    GROUP BY bin
    """,
)
def pack_token_budget_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents (longest-first, doc_id
    tie-break) into fixed 2048-token training sequences; a doc starting
    in bin *k* at global token offset ``cs - tokens`` belongs to bin
    ``floor(offset/budget)`` (documents straddle bin edges, as concat-
    and-split packing does). The global prefix sum is computed the
    scale-correct way: ``repartitionByRange`` on the sort key, a
    per-partition window cumsum, plus a broadcast of per-partition
    offsets (≤ #partitions rows) — no single global-window partition
    over the data, so this survives 100 TB. Result values are invariant
    to where the range boundaries land."""
    t = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("tokens"),
    )
    t = t.repartitionByRange(32, F.col("tokens").desc(), F.col("doc_id")).withColumn(
        "pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy(F.desc("tokens"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # cached: both the offsets aggregate and the final join consume the
    # windowed frame, and differing column pruning between the branches
    # defeats ReuseExchange — without the cache the slim projection is
    # scanned and range-shuffled twice. The cached payload is 3 longs/row.
    t2 = t.withColumn("local_cs", F.sum("tokens").over(w_local)).cache()
    # per-partition totals → exclusive running offset; ≤32 rows, so the
    # single-partition window here is over partition COUNT, not data.
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        t2.groupBy("pid")
        .agg(F.max("local_cs").alias("ptot"))
        .select("pid", F.coalesce(F.sum("ptot").over(w_off), F.lit(0)).alias("off"))
    )
    c = t2.join(F.broadcast(offsets), "pid").select(
        "tokens", (F.col("off") + F.col("local_cs")).alias("cs")
    )
    return (
        c.select(
            F.floor((F.col("cs") - F.col("tokens")) / F.lit(float(_PACK_BUDGET)))
            .cast("long")
            .alias("bin"),
            "tokens",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tokens").alias("bin_tokens"),
            (F.sum("tokens").cast("double") / _PACK_BUDGET).alias("fill_ratio"),
        )
    )


# --------------------------------------------------------------------------
# Benchmark-contamination detection
# --------------------------------------------------------------------------

_NGRAM = 8
_BENCH_MOD = 97  # doc_id % 97 == 0 → "held-out benchmark" split (~1%)


@register(
    "contamination_ngram_overlap",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang,
             regexp_split_to_array(lower(text), '\\s+') AS w
      FROM documents
    ),
    g AS (
      SELECT doc_id, w,
             unnest(generate_series(1, greatest(len(w) - {_NGRAM - 1}, 1))) AS i
      FROM d
    ),
    gr AS (
      SELECT doc_id,
             {sql_mhash64(f"array_to_string(w[i : i+{_NGRAM - 1}], ' ')")} AS gh
      FROM g
    ),
    b AS (SELECT DISTINCT gh FROM gr WHERE doc_id % {_BENCH_MOD} = 0),
    hits AS (
      SELECT DISTINCT gr.doc_id FROM gr JOIN b USING (gh)
      WHERE gr.doc_id % {_BENCH_MOD} <> 0
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(COUNT(hits.doc_id) AS BIGINT) AS n_contaminated,
           CAST(COUNT(hits.doc_id) AS DOUBLE) / COUNT(*) AS contamination_rate
    FROM d LEFT JOIN hits ON d.doc_id = hits.doc_id
    WHERE d.doc_id % {_BENCH_MOD} <> 0
    GROUP BY d.lang
    """,
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set contamination check: flag corpus documents sharing any
    8-gram with the held-out benchmark split (doc_id % 97 == 0). The
    benchmark's distinct 8-gram hash set is small by construction (~1%
    of the corpus) → broadcast semi-join, so the corpus side never
    shuffles its exploded grams; per-doc dedup then one aggregation."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split(F.lower(F.col("text")), r"\s+").alias("w")
    )
    grams = F.expr(
        f"transform(sequence(1, greatest(size(w) - {_NGRAM - 1}, 1)), "
        f"i -> array_join(slice(w, i, {_NGRAM}), ' '))"
    )
    g = d.select("doc_id", F.explode(grams).alias("gram")).select(
        "doc_id", mhash64("gram").alias("gh")
    )
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    bench = g.filter(is_bench).select("gh").distinct()
    hits = (
        g.filter(~is_bench)
        .join(F.broadcast(bench), "gh", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        d.filter(~is_bench)
        .select("doc_id", "lang")
        .join(hits, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_checked"),
            F.count("hit").alias("n_contaminated"),
            (F.count("hit").cast("double") / F.count("*")).alias(
                "contamination_rate"
            ),
        )
    )


# --------------------------------------------------------------------------
# Embedding int8 quantization
# --------------------------------------------------------------------------


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH t AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))) AS am
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, embedding,
             CASE WHEN am = 0 THEN 1.0 ELSE am / 127.0 END AS scale
      FROM t
    ),
    q AS (
      SELECT vec_id, embedding, scale,
             list_transform(embedding,
               x -> least(greatest(
                 floor(CAST(x AS DOUBLE) / scale + 0.5), -127.0), 127.0)) AS qv
      FROM s
    ),
    er AS (
      SELECT vec_id, scale, qv,
             list_transform(range(1, len(embedding) + 1),
               i -> CAST(embedding[i] AS DOUBLE) - qv[i] * scale) AS err
      FROM q
    )
    SELECT vec_id, scale,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(err, v -> v * v)), (acc, x) -> acc + x)
             / len(err) AS mse,
           list_max(list_transform(err, v -> abs(v))) AS max_abs_err,
           CAST(len(list_filter(qv, v -> abs(v) >= 127)) AS BIGINT)
             AS n_saturated
    FROM er
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization health-check per vector: absmax
    scale, reconstruction MSE, worst-element error, saturated-lane
    count. Pure projection over higher-order array functions — zero
    shuffles, zero Python. Rounding is ``floor(x/scale + 0.5)`` (not
    ``round``) because floor is bit-identical across engines while
    round's half-case tie-breaking is not; the squared-error fold is the
    same sequential left-fold as ``similarity._dot_dec``, so every
    double is reproduced bit-for-bit by the DuckDB oracle."""
    e = load_table(spark, sf_dir, "embeddings")
    am = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    e = e.withColumn("am", am).withColumn(
        "scale", F.when(F.col("am") == 0, F.lit(1.0)).otherwise(F.col("am") / 127.0)
    )
    qv = F.transform(
        "embedding",
        lambda x: F.least(
            F.greatest(F.floor(x.cast("double") / F.col("scale") + 0.5), F.lit(-127.0)),
            F.lit(127.0),
        ),
    )
    e = e.withColumn("qv", qv).withColumn(
        "err",
        F.zip_with(
            "embedding", "qv", lambda x, q: x.cast("double") - q * F.col("scale")
        ),
    )
    sse = F.aggregate("err", F.lit(0.0), lambda acc, v: acc + v * v)
    return e.select(
        "vec_id",
        "scale",
        (sse / F.size("err")).alias("mse"),
        F.array_max(F.transform("err", F.abs)).alias("max_abs_err"),
        F.size(F.filter("qv", lambda v: F.abs(v) >= 127)).cast("long").alias(
            "n_saturated"
        ),
    )


# --------------------------------------------------------------------------
# Domain-mixture weighting
# --------------------------------------------------------------------------


@register(
    "mix_domain_weights",
    oracle="""
    WITH g AS (
      SELECT lang, source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
               AS tokens
      FROM documents
      GROUP BY lang, source
    ),
    tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total FROM g)
    SELECT g.lang, g.source, g.n_docs, g.tokens,
           CAST(g.tokens AS DOUBLE) / tot.total AS token_share,
           least(sqrt(CAST(tot.total AS DOUBLE) / g.tokens), 8.0)
             AS upsample_factor
    FROM g CROSS JOIN tot
    """,
)
def mix_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-style domain mixing: per (lang, source) token counts
    plus an upsampling factor ``min(sqrt(total/tokens), 8)`` — the
    α=0.5 rescaling used to boost rare domains, capped. All aggregation
    is over exact integers (token counts); the share and factor are
    per-row doubles of exact longs, and sqrt is IEEE exact-rounded, so
    no computed double is ever summed (the cross-engine determinism
    rule). One aggregation plus a 1-row broadcast of the grand total."""
    d = load_table(spark, sf_dir, "documents")
    g = (
        d.select(
            "lang",
            "source",
            F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("t"),
        )
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("t").alias("tokens"))
    )
    tot = g.agg(F.sum("tokens").alias("total"))
    return g.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        "tokens",
        (F.col("tokens").cast("double") / F.col("total")).alias("token_share"),
        F.least(
            F.sqrt(F.col("total").cast("double") / F.col("tokens")), F.lit(8.0)
        ).alias("upsample_factor"),
    )


# --------------------------------------------------------------------------
# Pipeline observability: filter-funnel stage counts
# --------------------------------------------------------------------------


def _funnel_oracle() -> str:
    from ..registry import QUERIES
    from .text import _QUALITY_MIN

    quality_sql = QUERIES["text_quality_score"].oracle
    return f"""
    WITH scored AS ({quality_sql})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN s.quality >= {_QUALITY_MIN} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_quality_pass,
           CAST(COUNT(DISTINCT CASE WHEN s.quality >= {_QUALITY_MIN}
                                    THEN md5(d.text) END) AS BIGINT)
             AS n_unique_kept,
           CAST(SUM(CASE WHEN s.quality >= {_QUALITY_MIN} THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS quality_pass_rate,
           CAST(COUNT(DISTINCT CASE WHEN s.quality >= {_QUALITY_MIN}
                                    THEN md5(d.text) END) AS DOUBLE)
             / COUNT(*) AS final_retention
    FROM documents d JOIN scored s ON s.doc_id = d.doc_id
    """


@register("pipeline_filter_funnel", oracle=_funnel_oracle())
def pipeline_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel observability for the cleaning pipeline: how many docs
    survive the quality gate, and how many distinct texts remain after
    exact dedup — as ONE single-row aggregate over one scan (the
    conditional count-distinct does the md5 dedup inline; no window,
    no join back). This is the run-report an operator reads next to
    ``pipeline_clean_corpus``'s per-language output; rates are per-row
    divisions of exact counts, so the row is driver-hashable."""
    from .text import _QUALITY_MIN, text_quality_score

    d = load_table(spark, sf_dir, "documents")
    scored = text_quality_score(spark, sf_dir).select("doc_id", "quality")
    j = d.join(scored, "doc_id")
    passed = F.col("quality") >= _QUALITY_MIN
    n_total = F.count("*")
    n_pass = F.sum(passed.cast("long"))
    n_unique = F.count_distinct(F.when(passed, F.md5("text")))
    return j.agg(
        n_total.alias("n_total"),
        n_pass.alias("n_quality_pass"),
        n_unique.alias("n_unique_kept"),
        (n_pass.cast("double") / n_total).alias("quality_pass_rate"),
        (n_unique.cast("double") / n_total).alias("final_retention"),
    )


# --------------------------------------------------------------------------
# Incremental corpus ingestion (dedup a new batch against history)
# --------------------------------------------------------------------------

_INGEST_MOD = 10  # doc_id % 10 >= 8 → "new batch" (~20%); rest = history


@register(
    "dedup_incremental_ingest",
    oracle=f"""
    WITH hist AS (
      SELECT DISTINCT md5(text) AS fp FROM documents
      WHERE doc_id % {_INGEST_MOD} < 8
    ),
    batch AS (
      SELECT doc_id, lang, md5(text) AS fp,
             ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents WHERE doc_id % {_INGEST_MOD} >= 8
    )
    SELECT b.doc_id, b.lang, {sql_mhash64('b.fp')} AS fp_hash
    FROM batch b LEFT JOIN hist h ON h.fp = b.fp
    WHERE b.rn = 1 AND h.fp IS NULL
    """,
)
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion: accept only new-batch documents that are
    (a) first-of-fingerprint WITHIN the batch and (b) absent from the
    historical fingerprint index — the production pattern for growing a
    deduplicated corpus without re-deduplicating 100 TB of history.
    Here history is the doc_id%10<8 split; at scale it is a bucketed
    fingerprint table, so both the within-batch window and the
    anti-join cluster on the SAME key (the fingerprint) — one shuffle
    of the (small) new batch, zero shuffles of history if the index is
    bucketed on fp. Output is the accepted-docs list keyed by the
    cross-engine fp hash."""
    d = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % _INGEST_MOD >= 8
    hist = d.filter(~is_new).select(F.md5("text").alias("fp")).distinct()
    w = Window.partitionBy("fp").orderBy("doc_id")
    batch = (
        d.filter(is_new)
        .select("doc_id", "lang", F.md5("text").alias("fp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return batch.join(hist, "fp", "left_anti").select(
        "doc_id", "lang", mhash64("fp").alias("fp_hash")
    )


# --------------------------------------------------------------------------
# Bloom-prefiltered decontamination (the large-heldout scale path)
# --------------------------------------------------------------------------

_BLOOM_M = 1 << 18  # bit positions; 2 hash slices of the 60-bit gram hash


@register(
    "contamination_bloom_prefilter",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang,
             regexp_split_to_array(lower(text), '\\s+') AS w
      FROM documents
    ),
    g AS (
      SELECT doc_id, w,
             unnest(generate_series(1, greatest(len(w) - {_NGRAM - 1}, 1))) AS i
      FROM d
    ),
    gr AS (
      SELECT doc_id,
             {sql_mhash64(f"array_to_string(w[i : i+{_NGRAM - 1}], ' ')")} AS gh
      FROM g
    ),
    bg AS (SELECT DISTINCT gh FROM gr WHERE doc_id % {_BENCH_MOD} = 0),
    bits AS (
      SELECT DISTINCT b FROM (
        SELECT gh % {_BLOOM_M} AS b FROM bg
        UNION ALL
        SELECT (gh // {_BLOOM_M}) % {_BLOOM_M} AS b FROM bg
      )
    ),
    corpus AS (
      SELECT doc_id, gh FROM gr WHERE doc_id % {_BENCH_MOD} <> 0
    ),
    cand AS (
      SELECT DISTINCT doc_id FROM corpus
      WHERE gh % {_BLOOM_M} IN (SELECT b FROM bits)
        AND (gh // {_BLOOM_M}) % {_BLOOM_M} IN (SELECT b FROM bits)
    ),
    conf AS (
      SELECT DISTINCT corpus.doc_id FROM corpus JOIN bg USING (gh)
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(COUNT(cand.doc_id) AS BIGINT) AS n_bloom_candidates,
           CAST(COUNT(conf.doc_id) AS BIGINT) AS n_contaminated
    FROM d
    LEFT JOIN cand ON d.doc_id = cand.doc_id
    LEFT JOIN conf ON d.doc_id = conf.doc_id
    WHERE d.doc_id % {_BENCH_MOD} <> 0
    GROUP BY d.lang
    """,
)
def contamination_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with an explicit Bloom prefilter — the scale path
    when the held-out gram set is too large to broadcast as exact
    hashes. Two 18-bit slices of the 60-bit gram hash index a
    2^18-position bit set built from the benchmark split (doc_id %
    {mod} == 0); the bit set is orders of magnitude smaller than the
    gram set (positions dedupe), broadcasts cheaply, and prefilters
    corpus grams map-side with NO false negatives. Only the bloom
    survivors (~FP-rate of the corpus) reach the exact confirm join, so
    the expensive exact match runs on a sliver of the data. The final
    counts are EXACT (bloom false positives are removed by the confirm
    join), which is what makes this oracle-checkable bit-for-bit; the
    per-lang candidate count exposes the measured FP overhead.

    Spark's own runtime bloom pruning (injected for selective shuffle
    joins; pinned by tests/test_bloom_pruning.py) is the implicit
    sibling; this operator is the EXPLICIT form usable when the
    planner's heuristics don't fire — ``bloom_filter_agg`` is not a
    public SQL function, so the bit set is composed from relational ops
    (distinct positions + broadcast semi-joins), which has the same
    no-false-negative contract and survives any Spark version."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split(F.lower(F.col("text")), r"\s+").alias("w")
    )
    grams = F.expr(
        f"transform(sequence(1, greatest(size(w) - {_NGRAM - 1}, 1)), "
        f"i -> array_join(slice(w, i, {_NGRAM}), ' '))"
    )
    g = d.select("doc_id", F.explode(grams).alias("gram")).select(
        "doc_id", mhash64("gram").alias("gh")
    )
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    # NOTE (r15): checkpointing the bench gram set for its three
    # consumers was A/B-measured slower (1.55 s → 1.91 s at sf0.1);
    # the split-side re-scans run concurrently and cost less than the
    # materialization job. Left as-is deliberately.
    bench_g = g.filter(is_bench).select("gh").distinct()
    p1 = F.col("gh") % _BLOOM_M
    p2 = F.expr(f"(gh div {_BLOOM_M}) % {_BLOOM_M}")
    bits = (
        bench_g.select(p1.alias("b"))
        .unionAll(bench_g.select(p2.alias("b")))
        .distinct()
    )
    corpus = g.filter(~is_bench)
    cand = (
        corpus.join(F.broadcast(bits), p1 == F.col("b"), "left_semi")
        .join(F.broadcast(bits), p2 == F.col("b"), "left_semi")
        .select("doc_id", "gh")
    )
    # ONE consumer of the bloom survivors: a left join against the exact
    # bench set marks true hits, then a single per-doc aggregation
    # yields both flags — two separate distinct()s would recompute the
    # corpus gram-explode (8× corpus rows) twice
    flags = (
        cand.join(
            F.broadcast(bench_g.withColumn("exact", F.lit(1))), "gh", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.max(F.lit(1)).alias("bloom_hit"),
            F.max("exact").alias("conf_hit"),
        )
    )
    return (
        d.filter(~is_bench)
        .select("doc_id", "lang")
        .join(flags, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_checked"),
            F.count("bloom_hit").alias("n_bloom_candidates"),
            F.count("conf_hit").alias("n_contaminated"),
        )
    )


contamination_bloom_prefilter.__doc__ = contamination_bloom_prefilter.__doc__.format(
    mod=_BENCH_MOD
)


# --------------------------------------------------------------------------
# Sequence-model training examples: per-user ordered event sequences
# --------------------------------------------------------------------------

_SEQ_MAX = 32  # cap events per user sequence (context-length budget)


@register(
    "train_user_event_sequences",
    oracle=f"""
    WITH r AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id,
           string_agg(event_type, '|' ORDER BY rn) AS seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(ts) AS TIMESTAMP) AS first_ts,
           CAST(MAX(ts) AS TIMESTAMP) AS last_ts
    FROM r
    WHERE rn <= {_SEQ_MAX}
    GROUP BY user_id
    """,
)
def train_user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-model training construction: each user's first
    {n} events in (ts, event_id) total order, serialized as a
    '|'-joined event-type string (array cells would defeat the driver's
    row hash, and a delimited string is what a tokenizer consumes
    anyway). One shuffle partitions by user for the ranking window; the
    per-user truncation happens BEFORE collect_list, so unbounded
    activity histories never materialize — at 100 TB the state per user
    is bounded by the cap, not by how active the user was."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    capped = ev.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _SEQ_MAX
    )
    return capped.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x.event_type,
            ),
            "|",
        ).alias("seq"),
        F.count("*").alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


train_user_event_sequences.__doc__ = train_user_event_sequences.__doc__.format(
    n=_SEQ_MAX
)


# --------------------------------------------------------------------------
# Deterministic global shuffle (training-order assignment)
# --------------------------------------------------------------------------


@register(
    "train_global_shuffle",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                   doc_id) AS BIGINT) AS shuffle_pos
    FROM documents
    """,
)
def train_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-data ordering: every
    document gets a stable pseudo-random position ``shuffle_pos`` —
    rank under ``md5(doc_id)`` (a keyed permutation both engines
    compute identically) — so the training order is reproducible
    across runs, resumable mid-epoch, and independent of input file
    layout.

    Scale shape: a global ``ROW_NUMBER() OVER (ORDER BY ...)`` would
    funnel 100 TB through one window partition. Instead the rows are
    ``repartitionByRange`` on the hash key, sorted within partitions,
    and the per-partition rank comes from ``monotonically_increasing_id``
    (sequential within a partition once the sort fixed the order) minus
    the partition's broadcast minimum — NOT from a
    ``Window.partitionBy(pid)``, which would hash-exchange the full
    corpus a second time (Catalyst can't see that pid ≡ the current
    layout; measured as an extra full-data Exchange in the window
    variant's plan). Total data movement: ONE range shuffle; the
    offsets are a ≤ #partitions-row broadcast. The result is invariant
    to where the sampled range boundaries land."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.md5(F.col("doc_id").cast("string")).alias("h"))
        .repartitionByRange(32, "h", "doc_id")
        .sortWithinPartitions("h", "doc_id")
        .select(
            "doc_id",
            F.spark_partition_id().alias("pid"),
            F.monotonically_increasing_id().alias("mid"),
        )
        .cache()  # offsets + final projection must see ONE mid assignment
    )
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("pid")
        .agg(F.count("*").alias("n"), F.min("mid").alias("mn"))
        .select(
            "pid",
            "mn",
            F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("off"),
        )
    )
    return d.join(F.broadcast(offsets), "pid").select(
        "doc_id",
        (F.col("off") + (F.col("mid") - F.col("mn")) + 1)
        .cast("long")
        .alias("shuffle_pos"),
    )
