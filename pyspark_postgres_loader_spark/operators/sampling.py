"""Sampling operators for training-data pipelines: uniform and
stratified sampling with fixed seeds.

Sampling is how a 100 TB corpus becomes a tractable eval/dev split;
both operators are single-pass map-side filters (per-row Bernoulli
draws seeded deterministically) — no shuffle, no driver involvement,
fully pushdown-friendly (the sample runs after the scan's column
pruning, before anything wide).

RNG streams are engine-specific, so there is no value oracle; the
rows-only driver check plus ``tests`` assertions on per-stratum rates
(law-of-large-numbers bounds) cover correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

_SEED = 42
_UNIFORM_FRACTION = 0.1
# stratified: oversample scarce languages, downsample the head
# (fixture languages: en ≫ zh/es/de/fr)
_LANG_FRACTIONS = {"en": 0.05, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.5}


@register("sample_uniform_docs")  # RNG stream is engine-specific → rows-only
def sample_uniform_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded uniform Bernoulli sample of documents (fraction=0.1).
    Deterministic for a fixed seed + partitioning; a pure map-side
    filter at any scale."""
    d = load_table(spark, sf_dir, "documents")
    return d.sample(fraction=_UNIFORM_FRACTION, seed=_SEED).select(
        "doc_id", "lang", "n_chars"
    )


@register("sample_stratified_by_lang")  # rows-only (engine-specific RNG)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample with per-language fractions (``sampleBy``):
    downsample the dominant language, oversample the tail — the
    rebalancing step of a multilingual training mix. Unlisted strata
    default to fraction 0 (dropped)."""
    d = load_table(spark, sf_dir, "documents")
    return d.sampleBy("lang", fractions=_LANG_FRACTIONS, seed=_SEED).select(
        "doc_id", "lang", "n_chars"
    )
