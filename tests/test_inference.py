"""Embedding-inference operator: mapInPandas plumbing, determinism,
quarantine, and partition independence (operators/inference.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.operators.inference import (
    _MODEL_VERSION_FAKE,
    embed_documents,
)
from pyspark_postgres_loader_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_embeds_real_documents_unit_norm(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(200)
    out = embed_documents(docs, id_col="doc_id", text_col="text", dim=16)
    rows = out.collect()
    assert len(rows) == 200
    good = [r for r in rows if r.error is None]
    assert len(good) == len(rows)  # fixture docs are all embeddable
    for r in good[:20]:
        assert len(r.embedding) == 16
        assert r.model_version == _MODEL_VERSION_FAKE
        norm = math.sqrt(sum(x * x for x in r.embedding))
        assert norm == pytest.approx(1.0, abs=1e-5)


def test_deterministic_and_partition_independent(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(100)
    a = {
        r.doc_id: tuple(r.embedding)
        for r in embed_documents(docs.repartition(1)).collect()
    }
    b = {
        r.doc_id: tuple(r.embedding)
        for r in embed_documents(docs.repartition(13)).collect()
    }
    assert a == b


def test_quarantine_rows_never_kill_the_stage(spark):
    df = spark.createDataFrame(
        [
            (1, "a normal document"),
            (2, None),
            (3, ""),
            (4, "   "),
            (5, "x" * 50),
        ],
        "doc_id long, text string",
    )
    out = embed_documents(df, max_chars=40).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].error is None and len(by_id[1].embedding) == 16
    assert by_id[2].error == "null_text" and by_id[2].embedding is None
    assert by_id[3].error == "empty_text"
    assert by_id[4].error == "empty_text"
    assert by_id[5].error == "too_long:50"
    # exactly one of embedding/error per row, and model_version only on
    # the successful side
    for r in out:
        assert (r.embedding is None) != (r.error is None)
        assert (r.model_version is None) == (r.error is not None)


def test_output_is_narrow_and_joinable(spark):
    """The operator drops the document body (narrow post-inference
    shuffle); joining back by id restores it losslessly."""
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    out = embed_documents(docs)
    assert set(out.columns) == {"doc_id", "embedding", "model_version", "error"}
    joined = out.join(docs.select("doc_id", "lang"), "doc_id")
    assert joined.count() == 50


def test_onnx_path_without_runtime_raises_cleanly(spark):
    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    out = embed_documents(df, onnx_model_path="/nonexistent/model.onnx")
    try:
        import onnxruntime  # noqa: F401

        pytest.skip("onnxruntime unexpectedly installed")
    except ImportError:
        pass
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "NotImplementedError" in str(ei.value) or "onnxruntime" in str(
        ei.value
    )


def test_embeddings_compose_with_cosine_topk(spark):
    """End-to-end composition: inferred vectors feed a cosine top-k —
    F.aggregate dot product over the array column, JVM-side."""
    docs = load_table(spark, SF_DIR, "documents").limit(100)
    emb = embed_documents(docs).filter(F.col("error").isNull())
    q = emb.limit(1).select(
        F.col("doc_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    scored = emb.crossJoin(F.broadcast(q)).select(
        "qid",
        "doc_id",
        F.aggregate(
            F.zip_with("embedding", "qvec", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("cos"),
    )
    top = scored.orderBy(F.desc("cos"), "doc_id").limit(5).collect()
    assert len(top) == 5
    assert top[0].doc_id == top[0].qid  # self-similarity wins
    assert top[0].cos == pytest.approx(1.0, abs=1e-5)
