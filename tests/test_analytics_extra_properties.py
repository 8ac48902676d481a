"""Semantic invariants for the round-4 analytics operators — properties
the DuckDB differential can't express (it proves equality with the
oracle, not that the shared definition is sensible)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pyspark_postgres_loader_spark.registry import all_queries


def test_split_fractions_and_disjoint_coverage(spark, sf_dir):
    rows = all_queries()["split_train_val_test"](spark, sf_dir).collect()
    by = {r.split: r for r in rows}
    assert set(by) == {"train", "val", "test"}
    total = sum(r.n_docs for r in rows)
    # hash split: expected 90/5/5 with binomial noise at n=500
    assert 0.80 <= by["train"].n_docs / total <= 0.97
    assert by["val"].n_docs > 0 and by["test"].n_docs > 0
    # doc_id ranges overlap (hash, not range, assignment)
    assert by["train"].min_doc_id < by["test"].max_doc_id


def test_repetition_filter_flags_injected_repeats(spark, sf_dir):
    df = all_queries()["text_repetition_filter"](spark, sf_dir)
    rows = df.collect()
    assert all(0 <= r.dup_micros <= 1_000_000 for r in rows)
    assert all(r.n_unique <= r.n_grams for r in rows)
    # doc_id % 5 == 4 docs carry 4 copies of the injected trigram —
    # strictly more duplication than the %5==1 docs of similar length
    heavy = [r.dup_micros for r in rows if r.doc_id % 5 == 4]
    none = [r.dup_micros for r in rows if r.doc_id % 5 == 0]
    assert sum(heavy) / len(heavy) > sum(none) / len(none)
    assert any(not r.keep for r in rows)  # the rule actually fires


def test_bm25_scores_rank_term_density(spark, sf_dir):
    rows = all_queries()["search_bm25_topk"](spark, sf_dir).collect()
    assert len(rows) > 0
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.tf_scan + r.tf_merge + r.tf_vector > 0 for r in rows)


def test_funnel_stage_counts_monotone(spark, sf_dir):
    r = all_queries()["funnel_view_click_purchase"](spark, sf_dir).first()
    assert r.n_users >= r.n_view >= r.n_click >= r.n_purchase
    assert r.n_click == 0 or r.sum_view_to_click_us > 0


def test_cohort_offsets_start_at_zero(spark, sf_dir):
    rows = all_queries()["cohort_weekly_retention"](spark, sf_dir).collect()
    assert rows
    assert all(r.week_offset >= 0 for r in rows)
    # every cohort is active in its own first week
    cohorts = {r.cohort_week for r in rows}
    zero = {r.cohort_week for r in rows if r.week_offset == 0}
    assert cohorts == zero


def test_cdc_snapshot_has_no_tombstones_and_unique_keys(spark, sf_dir):
    df = all_queries()["cdc_apply_changelog"](spark, sf_dir)
    rows = df.collect()
    assert rows
    assert all(r.last_op in ("insert", "update") for r in rows)
    keys = [r.user_id for r in rows]
    assert len(keys) == len(set(keys))


def test_centroid_norm_bounded_by_max_vector_norm(spark, sf_dir):
    """Centroid of unit-ish vectors can't exceed the max member norm
    (Jensen); also n_vecs must sum to the corpus size."""
    from pyspark_postgres_loader_spark.tables import load_table

    rows = all_queries()["embedding_label_centroids"](spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_total
    max_norm_sq = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double")),
                F.lit(0.0),
                lambda a, b: a + b * b,
            ).alias("ns")
        )
        .agg(F.max("ns"))
        .first()[0]
    )
    assert all(r.norm_sq <= max_norm_sq + 1e-9 for r in rows)


def test_mad_robust_vs_zscore_masking(spark, sf_dir):
    """MAD invariants: outlier counts bounded by n, MAD strictly
    positive after the degenerate filter, and the flagged count equals
    a pandas recomputation on one sampled user."""
    import numpy as np

    from pyspark_postgres_loader_spark.operators.analytics_extra import (
        _MAD_K,
        _MAD_SCALE,
    )
    from pyspark_postgres_loader_spark.registry import all_queries
    from pyspark_postgres_loader_spark.tables import load_table

    mad = all_queries()["anomaly_mad_robust"](spark, sf_dir).toPandas()
    assert (mad["mad_v"] > 0).all()
    assert (mad["n_outliers"] <= mad["n"]).all()

    user = int(mad.iloc[0]["user_id"])
    vals = (
        load_table(spark, sf_dir, "events")
        .filter(f"user_id = {user}")
        .select("value")
        .toPandas()["value"]
        .to_numpy()
    )
    med = np.median(vals)
    m = np.median(np.abs(vals - med))
    expected = int((np.abs(vals - med) > _MAD_K * (_MAD_SCALE * m)).sum())
    row = mad[mad["user_id"] == user].iloc[0]
    assert int(row["n_outliers"]) == expected
