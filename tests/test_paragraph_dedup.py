"""CCNet paragraph dedup: window semantics vs a pure-Python replay,
non-vacuity of both dup and keep classes, and the oracle compare."""

from __future__ import annotations

import re
from collections import Counter

import duckdb


def _py_replay(sf_dir: str):
    """Third-engine (pure Python) replay of the paragraph windows and
    corpus counts — independent of both Spark and the DuckDB SQL."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    paras = []
    for doc_id, text in rows:
        w = re.split(r"\s+", text.lower())
        for k in range(-(-len(w) // 8)):
            paras.append((doc_id, " ".join(w[k * 8 : k * 8 + 8])))
    counts = Counter(p for _d, p in paras)
    per_doc: dict[int, list[int]] = {}
    for doc_id, p in paras:
        agg = per_doc.setdefault(doc_id, [0, 0])
        agg[0] += 1
        if counts[p] >= 2:
            agg[1] += 1
    return {
        d: (n, dup, (1000 * dup) // n if n else 0, int(2 * dup <= n))
        for d, (n, dup) in per_doc.items()
    }


def test_matches_python_replay_and_nonvacuous(spark):
    sf_dir = "/root/testdata/sf0.001"
    from pyspark_postgres_loader_spark.registry import (
        QUERIES,
        _ensure_loaded,
    )

    _ensure_loaded()
    rows = QUERIES["dedup_corpus_paragraphs"].fn(spark, sf_dir).collect()
    want = _py_replay(sf_dir)
    for r in rows:
        assert (
            r.n_paras, r.n_dup_paras, r.dup_ratio_milli, r.keep
        ) == want[r.doc_id], r.doc_id
    assert any(r.n_dup_paras > 0 for r in rows), "dup class vacuous"
    assert any(r.keep == 0 for r in rows), "drop class vacuous"
    assert any(r.keep == 1 for r in rows), "keep class vacuous"


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "dedup_corpus_paragraphs"
    )
