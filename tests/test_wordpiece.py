"""WordPiece: pure-Python reference trainer comparison (third
engine), the published greedy longest-match vectors, [UNK] rules,
and both oracle compares."""

from __future__ import annotations

import re
from collections import Counter

import duckdb

from pyspark_postgres_loader_spark.operators.tokenizer import (
    _BPE_MAX_LEN,
    _BPE_MIN_LEN,
)
from pyspark_postgres_loader_spark.operators.wordpiece import (
    _WP_MERGES,
    _WP_SCALE,
    wordpiece_tokenize,
)


def _cube_free(w: str) -> bool:
    for length in range(1, len(w) // 3 + 1):
        for i in range(len(w) - 3 * length + 1):
            if (w[i : i + length] == w[i + length : i + 2 * length]
                    == w[i + 2 * length : i + 3 * length]):
                return False
    return True


def _reference_train(freqs: dict[str, int], k: int):
    """Independent pure-Python WordPiece trainer (no Spark, no SQL)."""
    syms = {
        w: [w[0]] + ["##" + c for c in w[1:]] for w in freqs
    }
    merges = []
    for _ in range(k):
        pair_c: Counter = Counter()
        uni_c: Counter = Counter()
        for w, f in freqs.items():
            s = syms[w]
            for x in s:
                uni_c[x] += f
            for i in range(len(s) - 1):
                pair_c[(s[i], s[i + 1])] += f
        best = None
        for (a, b), c in pair_c.items():
            if c < 2:
                continue
            score = (c * _WP_SCALE) // (uni_c[a] * uni_c[b])
            key = (-score, -c, a, b)
            if best is None or key < best[0]:
                best = (key, a, b, c, score)
        if best is None:
            break
        _, a, b, c, score = best
        merged = a + b[2:]
        merges.append((a, b, merged, c, score))
        for w, s in syms.items():
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = merged
                else:
                    out.append(x)
            syms[w] = out
    return merges


def test_trainer_matches_pure_python_reference(spark):
    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT lower(text) FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    freqs: Counter = Counter()
    for (text,) in rows:
        for w in re.split(r"[^a-z]+", text):
            if (_BPE_MIN_LEN <= len(w) <= _BPE_MAX_LEN
                    and _cube_free(w)):
                freqs[w] += 1
    want = _reference_train(dict(freqs), _WP_MERGES)
    from pyspark_postgres_loader_spark.registry import (
        QUERIES,
        _ensure_loaded,
    )

    _ensure_loaded()
    got = [
        (r.left_sym, r.right_sym, r.merged, r.pair_count, r.score_q30)
        for r in QUERIES["tokenizer_wordpiece_train_scores"]
        .fn(spark, sf_dir)
        .collect()
    ]
    assert got == want


def test_likelihood_beats_raw_count():
    """The WordPiece criterion: a rare-but-exclusive pair outscores a
    frequent-but-incidental one."""
    freqs = {
        # 'qu' co-occurs exclusively (q appears only before u)
        "quiz": 5, "quit": 5,
        # 'th' is frequent but t and h also occur apart, a lot
        "the": 40, "tip": 40, "hat": 40, "tot": 30, "hash": 30,
    }
    merges = _reference_train(freqs, 1)
    assert merges[0][0] == "q" and merges[0][1] == "##u"


def test_longest_match_first_vectors():
    vocab = {"a", "ab", "##b", "##c", "##bc", "x", "##yz", "##y"}
    assert wordpiece_tokenize("abc", vocab) == ["ab", "##c"]
    assert wordpiece_tokenize("abbc", vocab) == ["ab", "##bc"]
    assert wordpiece_tokenize("xyz", vocab) == ["x", "##yz"]
    assert wordpiece_tokenize("a", vocab) == ["a"]
    # unmatched position -> whole-word UNK
    assert wordpiece_tokenize("aq", vocab) == ["[UNK]"]
    assert wordpiece_tokenize("q", vocab) == ["[UNK]"]
    # over max_input_chars_per_word -> UNK regardless of vocab
    assert wordpiece_tokenize("abcabca", vocab, max_chars=6) == ["[UNK]"]


def test_queries_match_oracles_and_unk_nonvacuous(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "tokenizer_wordpiece_train_scores"
    )
    compare_query(
        spark, "/root/testdata/sf0.001", "tokenizer_wordpiece_apply_tokens"
    )
    from pyspark_postgres_loader_spark.registry import QUERIES

    rows = (
        QUERIES["tokenizer_wordpiece_apply_tokens"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert sum(r.n_unk_words for r in rows) > 0
    assert all(r.n_tokens >= r.n_words for r in rows)
