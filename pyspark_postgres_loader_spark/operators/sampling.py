"""Sampling operators for training-data pipelines: uniform and
stratified, in two flavors:

- **Consistent hash-sampling** (the registered, oracle-checked
  queries): keep a row iff ``mhash64(key) % D < rate·D``. Deterministic
  across engines, runs, partitionings, and cluster sizes — which is
  what a production corpus split actually wants (re-running the
  pipeline yields the same split; adding executors doesn't reshuffle
  membership). A pure map-side filter at any scale.
- **Seeded Bernoulli** (``sample``/``sampleBy``): per-partition RNG
  streams, deterministic only for a fixed seed AND partitioning, and
  engine-specific — so they can't be value-compared against an oracle.
  Exercised in tests/test_sampling.py with law-of-large-numbers rate
  assertions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import mhash64, sql_mhash64
from ..registry import register
from ..tables import load_table

_SEED = 42
_DENOM = 10_000
_UNIFORM_FRACTION = 0.1
# stratified: oversample scarce languages, downsample the head
# (fixture languages: en ≫ zh/es/de/fr)
_LANG_FRACTIONS = {"en": 0.05, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.5}

# hash-sample key: doc_id + a salt so different samples of the same
# table draw independent membership
_SALT = "sample-v1"


def _keep(rate: float) -> F.Column:
    h = F.pmod(mhash64(F.concat_ws("|", F.lit(_SALT), F.col("doc_id").cast("string"))), F.lit(_DENOM))
    return h < int(rate * _DENOM)


def _sql_keep(rate: float) -> str:
    h = sql_mhash64(f"concat_ws('|', '{_SALT}', CAST(doc_id AS VARCHAR))")
    return f"({h}) % {_DENOM} < {int(rate * _DENOM)}"


@register(
    "sample_uniform_docs",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {_sql_keep(_UNIFORM_FRACTION)}
    """,
)
def sample_uniform_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform 10% consistent hash-sample of documents — membership is
    a pure function of doc_id, so the split is reproducible across
    engines/runs/partitionings (unlike seeded Bernoulli ``sample``,
    kept in bernoulli_sample_docs below)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(_keep(_UNIFORM_FRACTION)).select("doc_id", "lang", "n_chars")


def _strat_keep() -> F.Column:
    h = F.pmod(mhash64(F.concat_ws("|", F.lit(_SALT), F.col("doc_id").cast("string"))), F.lit(_DENOM))
    expr = F.lit(0)  # unlisted strata → threshold 0 (dropped)
    for lang, rate in _LANG_FRACTIONS.items():
        expr = F.when(F.col("lang") == lang, int(rate * _DENOM)).otherwise(expr)
    return h < expr


def _sql_strat_keep() -> str:
    h = sql_mhash64(f"concat_ws('|', '{_SALT}', CAST(doc_id AS VARCHAR))")
    cases = " ".join(
        f"WHEN '{lang}' THEN {int(rate * _DENOM)}"
        for lang, rate in _LANG_FRACTIONS.items()
    )
    return f"({h}) % {_DENOM} < CASE lang {cases} ELSE 0 END"


@register(
    "sample_stratified_by_lang",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {_sql_strat_keep()}
    """,
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified consistent hash-sample with per-language rates:
    downsample the dominant language, oversample the tail — the
    rebalancing step of a multilingual training mix. Unlisted strata
    default to rate 0 (dropped). Same hash-membership determinism as
    sample_uniform_docs."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(_strat_keep()).select("doc_id", "lang", "n_chars")


def bernoulli_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli uniform sample (``DataFrame.sample``) —
    engine-/partitioning-specific RNG, so not registered for the
    oracle differential; rate behavior asserted in tests."""
    d = load_table(spark, sf_dir, "documents")
    return d.sample(fraction=_UNIFORM_FRACTION, seed=_SEED).select(
        "doc_id", "lang", "n_chars"
    )


def bernoulli_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified Bernoulli sample (``sampleBy``); see
    bernoulli_sample_docs for why it isn't oracle-registered."""
    d = load_table(spark, sf_dir, "documents")
    return d.sampleBy("lang", fractions=_LANG_FRACTIONS, seed=_SEED).select(
        "doc_id", "lang", "n_chars"
    )


# --------------------------------------------------------------------------
# Exact-quota sampling: deterministic top-k per stratum
# --------------------------------------------------------------------------

_QUOTA_K = 40


@register(
    "sample_quota_per_lang",
    oracle=f"""
    SELECT lang, doc_id, n_chars
    FROM (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {sql_mhash64("concat_ws('|', 'quota-v1', CAST(doc_id AS VARCHAR))")}, doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= {_QUOTA_K}
    """,
)
def sample_quota_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sample: EXACTLY min(k, |stratum|) docs
    per language, chosen by hash order — the rate-based samplers above
    give binomially-noisy counts, but an eval set or per-domain budget
    needs exact counts. Hash-ordering (not rand()) keeps membership
    deterministic across engines/runs/cluster sizes, and a member only
    leaves the sample if the stratum shrinks. One shuffle on the
    stratum key; Spark plans a map-side partial WindowGroupLimit, so
    only ~k rows per stratum per partition cross the wire."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    h = mhash64(
        F.concat_ws("|", F.lit("quota-v1"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _QUOTA_K)
        .select("lang", "doc_id", "n_chars")
    )
