"""DSIR importance selection: exact score replay in pure Python,
target enrichment, selection determinism, and the oracle compare."""

from __future__ import annotations

import math

from pyspark_postgres_loader_spark.operators.dsir import (
    _B,
    _KEEP_PCT,
)
from pyspark_postgres_loader_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def _python_replay(sf=SF):
    """Third engine: replay the whole DSIR pipeline in pure Python
    from the parquet file."""
    import duckdb

    from pyspark_postgres_loader_spark.operators.perplexity import (
        _LOG2_MILLI,
        _MAX_NLL,
        _Q_ONE,
    )

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, lower(text), lang FROM "
        f"read_parquet('{sf}/documents.parquet') ORDER BY doc_id"
    ).fetchall()

    def bucket(t):
        return (7 * len(t) + ord(t[0])) % _B

    rc = [0] * _B
    tc = [0] * _B
    per_doc: dict[int, dict[int, int]] = {}
    is_tgt = {}
    for doc_id, text, lang in docs:
        is_tgt[doc_id] = lang == "en"
        counts: dict[int, int] = {}
        for t in text.split():
            if not t:
                continue
            b = bucket(t)
            counts[b] = counts.get(b, 0) + 1
            rc[b] += 1
            if lang == "en":
                tc[b] += 1
        per_doc[doc_id] = counts
    rcnt, tcnt = sum(rc), sum(tc)

    def nll(c, total):
        q = max(1, ((c + 1) * _Q_ONE) // (total + _B))
        bl = q.bit_length() - 1
        m = (q * 64) // (1 << bl)
        return _MAX_NLL - (1000 * bl + _LOG2_MILLI[m - 64])

    w = [nll(rc[b], rcnt) - nll(tc[b], tcnt) for b in range(_B)]
    scores = {
        d: sum(n * w[b] for b, n in cs.items())
        for d, cs in per_doc.items()
    }
    order = sorted(scores, key=lambda d: (-scores[d], d))
    keep = set(order[: (len(order) * _KEEP_PCT) // 100])
    return scores, keep, is_tgt


def test_scores_match_python_replay(spark):
    scores, keep, _ = _python_replay()
    rows = all_queries()["corpus_dsir_select"](spark, SF).collect()
    for r in rows:
        assert r["lambda_milli"] == scores[r["doc_id"]], r["doc_id"]
        assert bool(r["selected"]) == (r["doc_id"] in keep), r["doc_id"]


def test_selection_enriches_target(spark):
    """The selected slice must hold a higher target share than the
    pool — the property DSIR exists to produce."""
    rows = all_queries()["corpus_dsir_select"](spark, SF).collect()
    sel = [r for r in rows if r["selected"]]
    base = sum(r["is_target"] for r in rows) / len(rows)
    got = sum(r["is_target"] for r in sel) / len(sel)
    assert got > base, (got, base)
    assert len(sel) == (len(rows) * _KEEP_PCT) // 100


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, SF, "corpus_dsir_select")
