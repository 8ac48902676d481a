"""Behavior tests for the seeded sampling operators: per-stratum rates
within loose binomial bounds, determinism across reruns."""

from __future__ import annotations

from pyspark_postgres_loader_spark.operators.sampling import (
    _LANG_FRACTIONS,
    sample_stratified_by_lang,
    sample_uniform_docs,
)
from pyspark_postgres_loader_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_uniform_sample_rate_and_determinism(spark):
    total = load_table(spark, SF_DIR, "documents").count()
    s1 = sample_uniform_docs(spark, SF_DIR)
    n1 = s1.count()
    # fraction 0.1 of 500 → binomial(500, .1): mean 50, sd ~6.7
    assert 20 <= n1 <= 90, n1
    n2 = sample_uniform_docs(spark, SF_DIR).count()
    assert n1 == n2  # same seed + partitioning → same sample
    assert n1 < total


def test_stratified_sample_rates(spark):
    base = {
        r["lang"]: r["cnt"]
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    got = {
        r["lang"]: r["cnt"]
        for r in sample_stratified_by_lang(spark, SF_DIR)
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    for lang, frac in _LANG_FRACTIONS.items():
        n, k = base[lang], got.get(lang, 0)
        mean = n * frac
        sd = (n * frac * (1 - frac)) ** 0.5
        assert abs(k - mean) <= 4 * sd + 2, (lang, k, mean, sd)
    # no stratum outside the declared fractions appears
    assert set(got) <= set(_LANG_FRACTIONS)


def test_bernoulli_variants_rates(spark):
    from pyspark_postgres_loader_spark.operators.sampling import (
        bernoulli_sample_by_lang,
        bernoulli_sample_docs,
    )

    n = bernoulli_sample_docs(spark, SF_DIR).count()
    assert 20 <= n <= 90, n
    got = {
        r["lang"]: r["cnt"]
        for r in bernoulli_sample_by_lang(spark, SF_DIR)
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    assert set(got) <= set(_LANG_FRACTIONS)
