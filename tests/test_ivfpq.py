"""IVF-PQ (operators/ivfpq.py): structural invariants beyond the
oracle differential — candidate PRUNING (every result's cell is one
the query probed), encode completeness, self-retrieval through the
composed index, and determinism across re-execution."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.operators.clustering import _quantize, _sqdist
from pyspark_postgres_loader_spark.operators.ivfpq import (
    _IVFPQ_CELLS,
    _IVFPQ_NPROBE,
    _IVFPQ_NQ,
    _IVFPQ_TOPK,
    ann_ivfpq_topk,
)
from pyspark_postgres_loader_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _probed_cells(spark):
    """Independent recomputation of each query's probe set (plain
    collect + python argsort — NOT the product's window pipeline)."""
    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", _quantize(F.col("embedding")).alias("m"))
        .collect()
    )
    by_id = {r.vec_id: r.m for r in rows}
    cents = {c: by_id[c] for c in range(_IVFPQ_CELLS)}

    def sq(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    probed = {}
    for q in range(_IVFPQ_NQ):
        order = sorted(cents, key=lambda c: (sq(by_id[q], cents[c]), c))
        probed[q] = set(order[:_IVFPQ_NPROBE])
    return probed


def test_results_only_from_probed_cells(spark):
    """The defining IVF property: a result row's cell MUST be one of
    the query's nprobe nearest cells — anything else means the prune
    join leaked unprobed candidates."""
    probed = _probed_cells(spark)
    out = ann_ivfpq_topk(spark, SF_DIR).collect()
    assert out, "no results"
    for r in out:
        assert r.cell in probed[r.qid], (r.qid, r.cell, probed[r.qid])


def test_topk_shape_and_rank_totality(spark):
    out = ann_ivfpq_topk(spark, SF_DIR).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == set(range(_IVFPQ_NQ))
    for _qid, rows in by_q.items():
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= _IVFPQ_TOPK
        dists = [r.adc_dist for r in rows]
        assert dists == sorted(dists)
        assert all(d >= 0 for d in dists)


def test_query_self_retrieval(spark):
    """A query always probes its OWN cell first (distance to the
    assigned centroid is minimal by definition), and its ADC distance
    to itself is just the quantization error — it must appear in its
    own top-k on the tiny fixture."""
    out = ann_ivfpq_topk(spark, SF_DIR).collect()
    for qid in range(_IVFPQ_NQ):
        members = [r.vec_id for r in out if r.qid == qid]
        assert qid in members, (qid, members)


def test_deterministic_across_runs(spark):
    a = [tuple(r) for r in ann_ivfpq_topk(spark, SF_DIR).collect()]
    b = [tuple(r) for r in ann_ivfpq_topk(spark, SF_DIR).collect()]
    assert a == b


def test_centroid_vectors_have_zero_residual(spark):
    """Vectors 0..CELLS-1 ARE the centroids: their coarse assignment
    must be themselves and their residual exactly zero — the reason
    the PQ codebook init starts at vec_id CELLS."""
    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", _quantize(F.col("embedding")).alias("m")
    )
    cents = e.filter(F.col("vec_id") < _IVFPQ_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("m").alias("cm")
    )
    joined = (
        e.filter(F.col("vec_id") < _IVFPQ_CELLS)
        .join(cents, F.col("vec_id") == F.col("cell"))
        .select(_sqdist(F.col("m"), F.col("cm")).alias("d"))
        .collect()
    )
    assert len(joined) == _IVFPQ_CELLS
    assert all(r.d == 0 for r in joined)
