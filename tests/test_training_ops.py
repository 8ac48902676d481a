"""Invariant tests for the training-data pipeline operators — the
oracle differential (test_oracle_differential) proves cross-engine
equality; these pin the *semantic* properties the oracle alone can't
express (coverage, error bounds, conservation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.operators import training
from pyspark_postgres_loader_spark.registry import QUERIES, _ensure_loaded
from pyspark_postgres_loader_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _loaded():
    _ensure_loaded()


def test_pii_redaction_is_idempotent_and_finds_injected_pii(spark):
    rows = QUERIES["text_pii_redact"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        # one of each PII kind injected per doc; redaction removes all
        assert r.n_emails >= 1 and r.n_phones >= 1 and r.n_ips >= 1
        assert r.n_residual == 0


def test_chunking_covers_every_token_exactly_with_overlap(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.size(F.split("text", r"\s+")).alias("tokens")
    )
    chunks = (
        QUERIES["text_chunk_windows"].fn(spark, SF)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("chunk_tokens").alias("covered"),
            F.max("chunk_idx").alias("max_idx"),
        )
    )
    j = docs.join(chunks, "doc_id").collect()
    assert j
    s, w = training._CHUNK_STRIDE, training._CHUNK_WINDOW
    for r in j:
        n_expect = -(-r.tokens // s)  # ceil(tokens/stride)
        assert r.n_chunks == n_expect and r.max_idx == n_expect - 1
        # stride-coverage: each chunk re-reads up to (window-stride)
        # overlap tokens; total covered = tokens + overlap re-reads
        overlap = sum(
            min(w, r.tokens - i * s) - min(s, r.tokens - i * s)
            for i in range(n_expect)
        )
        assert r.covered == r.tokens + overlap


def test_packing_conserves_docs_and_tokens_and_fills_bins(spark):
    docs = load_table(spark, SF, "documents").select(
        F.size(F.split("text", r"\s+")).alias("tokens")
    )
    total_docs = docs.count()
    total_tokens = docs.agg(F.sum("tokens")).collect()[0][0]
    bins = QUERIES["pack_token_budget_bins"].fn(spark, SF).collect()
    assert sum(r.n_docs for r in bins) == total_docs
    assert sum(r.bin_tokens for r in bins) == total_tokens
    ids = sorted(r.bin for r in bins)
    # bins are contiguous from 0: a doc starts in bin k only after bins
    # 0..k-1 are filled (straddle-packing leaves no gaps)
    assert ids == list(range(len(ids)))
    budget = training._PACK_BUDGET
    assert ids[-1] == (total_tokens - 1) // budget or total_tokens % budget == 0


def test_quantization_error_bounded_by_half_step(spark):
    rows = QUERIES["embedding_quantize_int8"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        # absmax scaling: every lane rounds to within half a step and
        # the extreme lane lands exactly on ±127 (so ≥1 saturated)
        assert r.max_abs_err <= r.scale / 2 + 1e-12
        assert r.mse <= (r.scale / 2) ** 2 + 1e-12
        assert r.n_saturated >= 1


def test_contamination_excludes_benchmark_and_bounds_rate(spark):
    n_bench = (
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id") % training._BENCH_MOD == 0)
        .count()
    )
    assert n_bench >= 1  # the split is non-empty at this sf
    rows = QUERIES["contamination_ngram_overlap"].fn(spark, SF).collect()
    total_docs = load_table(spark, SF, "documents").count()
    assert sum(r.n_checked for r in rows) == total_docs - n_bench
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_checked
        assert abs(r.contamination_rate - r.n_contaminated / r.n_checked) < 1e-12


def test_mix_weights_normalize_and_boost_rare_domains(spark):
    rows = QUERIES["mix_domain_weights"].fn(spark, SF).collect()
    assert rows
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 1.0 <= r.upsample_factor <= 8.0
    # rarest domain gets the largest boost (monotone in 1/tokens, pre-cap)
    uncapped = [r for r in rows if r.upsample_factor < 8.0]
    if len(uncapped) >= 2:
        by_tokens = sorted(uncapped, key=lambda r: r.tokens)
        boosts = [r.upsample_factor for r in by_tokens]
        assert boosts == sorted(boosts, reverse=True)


def test_funnel_counts_are_monotone(spark):
    r = QUERIES["pipeline_filter_funnel"].fn(spark, SF).collect()[0]
    assert r.n_unique_kept <= r.n_quality_pass <= r.n_total
    assert abs(r.quality_pass_rate - r.n_quality_pass / r.n_total) < 1e-12
    assert abs(r.final_retention - r.n_unique_kept / r.n_total) < 1e-12


def test_hyperplane_lsh_pairs_are_verified_subset(spark):
    from pyspark_postgres_loader_spark.operators import similarity as sim

    rows = QUERIES["dedup_hyperplane_lsh"].fn(spark, SF).collect()
    seen = set()
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.cosine >= sim._PAIR_THRESHOLD
        assert (r.doc_a, r.doc_b) not in seen  # distinct across bands
        seen.add((r.doc_a, r.doc_b))
    # plane literals are deterministic: same component on recompute
    assert sim._HP[3][7] == sim._hp_component(3, 7)


def test_packing_invariant_to_range_partition_count(spark, monkeypatch):
    """The distributed prefix sum must give IDENTICAL bins no matter
    how many range partitions the planner lands on — the offsets join
    compensates for any boundary placement."""
    baseline = sorted(
        tuple(r) for r in QUERIES["pack_token_budget_bins"].fn(spark, SF).collect()
    )
    from pyspark.sql import DataFrame

    orig = DataFrame.repartitionByRange
    for n in (1, 3, 64):
        monkeypatch.setattr(
            DataFrame,
            "repartitionByRange",
            lambda self, _np, *cols, _n=n, _o=orig: _o(self, _n, *cols),
        )
        got = sorted(
            tuple(r)
            for r in QUERIES["pack_token_budget_bins"].fn(spark, SF).collect()
        )
        assert got == baseline, f"bins changed at numPartitions={n}"
    monkeypatch.setattr(DataFrame, "repartitionByRange", orig)


def test_incremental_ingest_accepts_only_novel_fingerprints(spark):
    d = load_table(spark, SF, "documents").select(
        "doc_id", F.md5("text").alias("fp")
    )
    hist_fps = {
        r.fp for r in d.filter(F.col("doc_id") % training._INGEST_MOD < 8).collect()
    }
    batch = d.filter(F.col("doc_id") % training._INGEST_MOD >= 8).collect()
    accepted = QUERIES["dedup_incremental_ingest"].fn(spark, SF).collect()
    by_fp = {}
    for r in sorted(batch, key=lambda r: r.doc_id):
        by_fp.setdefault(r.fp, r.doc_id)
    expect_ids = {
        did for fp, did in by_fp.items() if fp not in hist_fps
    }
    assert {r.doc_id for r in accepted} == expect_ids
    assert len(accepted) == len({r.fp_hash for r in accepted})  # one per fp


def test_bloom_prefilter_matches_exact_contamination(spark):
    """The bloom path must agree with the plain exact decontamination
    on the contaminated counts (no false negatives by construction),
    and candidates must dominate confirmations (FP rate >= 0)."""
    bloom = {
        r.lang: r
        for r in QUERIES["contamination_bloom_prefilter"].fn(spark, SF).collect()
    }
    exact = {
        r.lang: r
        for r in QUERIES["contamination_ngram_overlap"].fn(spark, SF).collect()
    }
    assert set(bloom) == set(exact)
    for lang, b in bloom.items():
        assert b.n_contaminated == exact[lang].n_contaminated
        assert b.n_checked == exact[lang].n_checked
        assert b.n_bloom_candidates >= b.n_contaminated  # no false negatives


def test_event_sequences_capped_and_ordered(spark):
    rows = QUERIES["train_user_event_sequences"].fn(spark, SF).collect()
    ev = load_table(spark, SF, "events")
    n_users = ev.select("user_id").distinct().count()
    assert len(rows) == n_users  # every user gets a sequence
    for r in rows:
        assert 1 <= r.n_events <= training._SEQ_MAX
        assert len(r.seq.split("|")) == r.n_events
        assert r.first_ts <= r.last_ts
    # per-user totals: capped count == min(total events, cap)
    totals = {
        r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert r.n_events == min(totals[r.user_id], training._SEQ_MAX)


def test_winsorize_bounds_and_clamping(spark):
    from pyspark_postgres_loader_spark.operators import text as text_ops  # noqa: F401

    rows = QUERIES["quality_winsorize_doclen"].fn(spark, SF).collect()
    d = load_table(spark, SF, "documents").select(
        "lang", F.length("text").cast("long").alias("len")
    )
    for r in rows:
        assert r.p05 <= r.p95
        lens = sorted(
            x.len for x in d.filter(F.col("lang") == r.lang).collect()
        )
        assert lens[0] <= r.p05 and r.p95 <= lens[-1]
        clamped = sum(min(max(v, r.p05), r.p95) for v in lens)
        assert clamped == r.winsorized_total_len
        assert r.n_docs == len(lens)
