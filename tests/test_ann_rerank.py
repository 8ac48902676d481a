"""Quality invariants for the two-phase int8-rerank ANN: the quantized
candidate scan must not lose the true neighbors the exact baseline
finds (recall), and its integer scores must rank roughly like cosine."""

from __future__ import annotations

from pyspark_postgres_loader_spark.registry import all_queries


def test_int8_rerank_recall_vs_bruteforce(spark, sf_dir):
    qs = all_queries()
    exact = {
        (r.query_id, r.vec_id)
        for r in qs["ann_bruteforce_topk"](spark, sf_dir).collect()
    }
    approx_rows = qs["ann_int8_rerank_topk"](spark, sf_dir).collect()
    approx = {(r.query_id, r.vec_id) for r in approx_rows}
    assert approx, "int8 rerank returned no rows"
    # int8 absmax quantization is near-lossless for cosine ranking at
    # 64 dims; with a 32-candidate pool feeding top-10, recall@10
    # should be high — alert if the quantized scan drops true neighbors
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"recall@10 vs exact baseline = {recall:.2f}"

    # every reranked row carries an exact int64 score and a cosine in range
    for r in approx_rows:
        assert isinstance(r.int_score, int)
        assert -1.0001 <= r.cosine <= 1.0001
        assert 1 <= r.rank <= 10


def test_ivf_recall_report_floor(spark):
    from pyspark_postgres_loader_spark.registry import QUERIES, _ensure_loaded

    _ensure_loaded()
    rows = QUERIES["ann_recall_report"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 8
    for r in rows:
        assert r.k == 10
        assert 0 <= r.n_hits <= r.k
        assert abs(r.recall - r.n_hits / r.k) < 1e-12
    mean_recall = sum(r.recall for r in rows) / len(rows)
    # nprobe=4 of 16 cells recovers ~90% on the fixture; alert well
    # below that so a silent index/param regression fails the suite
    assert mean_recall >= 0.75, mean_recall
