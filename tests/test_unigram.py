"""Unigram-LM tokenizer: exact-integer Viterbi vs brute-force
segmentation enumeration, floor-EM behavior, and the oracle compare."""

from __future__ import annotations

import itertools
import random

from pyspark_postgres_loader_spark.operators.unigram import (
    _EM,
    _KEEP,
    _PAD,
    _PLEN,
    _SCALE,
    _fb_posts,
    _viterbi_ntokens,
)


def _pm_of(w: str, model: dict[str, int]) -> dict[int, int]:
    return {
        j * 8 + l: model[w[j : j + l]]
        for j in range(len(w))
        for l in range(1, min(_PLEN, len(w) - j) + 1)
        if w[j : j + l] in model
    }


def _brute_best(w: str, model: dict[str, int]):
    """Enumerate ALL segmentations into model pieces; return the
    lexicographic max of (padded exact score, -n_pieces). The DP must
    match both fields — extensions preserve the (score, n) order, so
    per-position pruning is lossless for this objective."""
    n = len(w)
    best = None
    for cuts in itertools.product([0, 1], repeat=n - 1):
        bounds = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        pieces = [w[a:b] for a, b in zip(bounds, bounds[1:])]
        if any(len(p) > _PLEN or p not in model for p in pieces):
            continue
        score = _PAD
        for p in pieces:
            score = score // _SCALE * model[p]
        cand = (score, -len(pieces))
        if best is None or cand > best:
            best = cand
    return best


def test_viterbi_matches_brute_force_incl_ties():
    rng = random.Random(11)
    alphabet = "abc"
    for trial in range(60):
        # models deliberately include ties (many pieces share a score)
        pieces = {c: rng.choice([10, 10, 500, 1000]) for c in alphabet}
        for _ in range(rng.randrange(2, 7)):
            l = rng.randrange(2, _PLEN + 1)
            p = "".join(rng.choice(alphabet) for _ in range(l))
            pieces[p] = rng.choice([10, 500, 500, 1000])
        w = "".join(rng.choice(alphabet) for _ in range(rng.randrange(2, 9)))
        got_n = _viterbi_ntokens(w, _pm_of(w, pieces))
        score, neg_n = _brute_best(w, pieces)
        assert got_n == -neg_n, (w, pieces, got_n, -neg_n)


def test_fb_posts_mass_is_bounded_and_targets_present_pieces():
    """Posterior contributions only for substrings of the word, and a
    word segmentable one way puts its whole (freq-scaled) mass there."""
    model = {"ab": 700, "a": 100, "b": 100}
    posts = _fb_posts("ab", 3, _pm_of("ab", model))
    assert set(posts) == {"ab", "a", "b"}
    # the 'ab' single-piece path dominates: alpha/beta give it the
    # largest expected count
    assert posts["ab"] > posts["a"] and posts["ab"] > posts["b"]
    # one-char word, one segmentation: full posterior (1000 milli) x freq
    only = _fb_posts("aa", 2, _pm_of("aa", {"a": 500, "aa": 0}))
    assert only == {"a": 2 * 2 * 1000} or only["a"] == 4000


def test_train_keeps_multichar_pieces_and_apply_compresses(spark, sf_dir):
    from pyspark_postgres_loader_spark.registry import all_queries

    qs = all_queries()
    model_rows = qs["tokenizer_unigram_train_scores"](spark, sf_dir).collect()
    assert len(model_rows) >= _KEEP
    multi = [r for r in model_rows if len(r.piece) > 1 and r.piece_rank <= _KEEP]
    assert multi, "EM + prune must retain multi-char pieces"
    ranks = [r.piece_rank for r in model_rows]
    assert ranks == sorted(ranks) and len(set(ranks)) == len(ranks)
    applied = qs["tokenizer_unigram_apply_tokens"](spark, sf_dir).collect()
    total_tokens = sum(r.n_tokens for r in applied)
    total_words = sum(r.n_words for r in applied)
    assert total_words > 0
    # the trained model must beat single-character segmentation: fewer
    # tokens than total characters of the qualifying words, and at
    # least one token per word
    from pyspark.sql import functions as F

    from pyspark_postgres_loader_spark.tables import load_table

    total_chars = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"))
        .filter("length(w) BETWEEN 2 AND 12")
        .agg(F.sum(F.length("w")))
        .first()[0]
    )
    assert total_words <= total_tokens < total_chars


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "tokenizer_unigram_train_scores"
    )
    compare_query(
        spark, "/root/testdata/sf0.001", "tokenizer_unigram_apply_tokens"
    )
