"""BPE trainer tests: the Spark implementation must produce the EXACT
merge sequence and tokenization of an independent pure-Python
reference implementation of the published algorithm (same total order:
pair count desc, then lexicographic) — two implementations, one spec."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.operators.tokenizer import (
    _EOW,
    apply_bpe,
    train_bpe,
    word_frequencies,
)
from pyspark_postgres_loader_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


# --- independent reference (Sennrich-style, pure Python) ------------------


def _ref_word_freqs(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            c[w] += 1
    return c


def _ref_train(texts: list[str], num_merges: int, min_pair_freq: int = 2):
    vocab = {
        tuple(list(w) + [_EOW]): n for w, n in _ref_word_freqs(texts).items()
    }
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # total order: count desc, then pair lexicographic
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges, vocab


_CORPUS = [
    "the lowest lower low",
    "newer newest new news",
    "the new lower newspaper",
    "low low low lowest newest",
    "widening the widest wide wider",
]


def test_merge_sequence_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string"
    )
    merges, syms = train_bpe(spark, docs, num_merges=25)
    ref_merges, ref_vocab = _ref_train(_CORPUS, num_merges=25)
    assert merges == ref_merges
    # final symbol tables agree word-for-word
    got = {r.w: tuple(r.syms) for r in syms.collect()}
    ref = {"".join(s).replace(_EOW, ""): s for s in ref_vocab}
    assert set(got) == set(ref)
    for w, s in got.items():
        assert s == ref[w], w


def test_apply_bpe_round_trips_and_matches_training_segmentation(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string"
    )
    merges, syms = train_bpe(spark, docs, num_merges=25)
    toks = apply_bpe(docs, merges).collect()
    by_id = {r.doc_id: r for r in toks}
    # every token sequence reconstructs its document exactly
    for i, text in enumerate(_CORPUS):
        joined = "".join(by_id[i].tokens).replace(_EOW, " ").strip()
        assert joined == " ".join(text.lower().split())
        assert by_id[i].n_tokens == len(by_id[i].tokens)
    # ranked-merge apply reproduces the trainer's segmentation for
    # every trained word (the standard BPE consistency property)
    train_segs = {r.w: list(r.syms) for r in syms.collect()}
    single = spark.createDataFrame(
        [(0, " ".join(train_segs))], "doc_id long, text string"
    )
    out = apply_bpe(single, merges).collect()[0].tokens
    expect = [t for w in " ".join(train_segs).split() for t in train_segs[w]]
    assert out == expect


def test_trains_on_real_documents_table(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(200)
    merges, syms = train_bpe(spark, docs, num_merges=12)
    assert 0 < len(merges) <= 12
    assert len(merges) == len(set(merges))  # no duplicate merge rules
    # compression: total symbols after merging < total characters
    stats = syms.select(
        F.sum(F.size("syms") * F.col("freq")).alias("n_syms"),
        F.sum((F.length("w") + 1) * F.col("freq")).alias("n_chars"),
    ).collect()[0]
    assert stats.n_syms < stats.n_chars
    # tokenizing the same corpus with the artifact runs end-to-end
    out = apply_bpe(docs, merges)
    assert out.count() == 200
    assert out.filter(F.col("n_tokens") <= 0).count() == 0


def test_word_frequencies_is_one_hash_aggregation(spark):
    # no limit(): a GlobalLimit collapses the scan to one partition and
    # the word-key exchange disappears — the 100 TB-relevant plan is
    # the full-table one
    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        word_frequencies(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") == 2  # partial + final
    assert "CartesianProduct" not in plan
