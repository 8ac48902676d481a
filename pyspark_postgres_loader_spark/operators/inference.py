"""Batched embedding inference over documents — the mapInPandas model
-serving pattern, with per-row quarantine.

The 100 TB training pipeline's last mile is usually "run a model over
every document" (embedders, quality classifiers, toxicity scorers).
The Spark-correct shape, regardless of model runtime:

- ``mapInPandas`` over Arrow batches: text crosses the JVM→Python
  boundary once per batch (vectorized), never per row;
- the model loads ONCE PER PARTITION (lazy init inside the iterator
  closure) — session/model construction is the dominant fixed cost of
  ONNX/torch runtimes and must amortize over the partition, not the
  batch, and certainly not the row;
- per-row QUARANTINE: null/empty/oversized/undecodable inputs produce
  an ``error`` column and a null embedding — one poison document can
  never kill a 10-hour stage (same contract as multimodal's decode
  quarantine, multimodal.py);
- output stays narrow: (id, embedding, model_version, error) — the
  document body does NOT ride along; re-join it by id when needed so
  the shuffle after inference moves kilobytes per row, not documents.

Runtime resolution (environment constraint — this container has no
onnxruntime/torch): if ``onnxruntime`` imports AND the caller passes
``onnx_model_path``, batches run through a real InferenceSession
(stub-free plumbing, session-per-partition); otherwise the encoder is
a DETERMINISTIC hash-projection embedder — each whitespace token hashes
(md5, the repo-wide ``mhash64`` arithmetic) into one of ``dim`` buckets
with a ±1 sign, counts L2-normalized. That fake is a real (if crude)
bag-of-words embedding: deterministic, order-independent across
partitions, and faithful to the batch/quarantine/schema plumbing the
tests pin, so swapping in a real model changes ONE function.

Reference: no counterpart (the reference is a loader; SURVEY.md §2
LLM-pipeline extension surface). Composes with similarity.py's ANN
queries: the output schema matches the embeddings table's
(id, vec) contract.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_MODEL_VERSION_FAKE = "hash-projection-v1"
_DEFAULT_DIM = 16
_DEFAULT_MAX_CHARS = 100_000


def _hash_projection(texts: list[str], dim: int):
    """Deterministic bag-of-tokens embedder: md5(token) picks a bucket
    and a sign; L2-normalized. Pure function of the text — executor-
    and partition-order independent."""
    import hashlib

    import numpy as np

    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, text in enumerate(texts):
        for tok in text.split():
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            out[i, h % dim] += 1.0 if (h >> 60) & 1 == 0 else -1.0
        n = float(np.linalg.norm(out[i]))
        if n > 0:
            out[i] /= n
    return out


def _load_encoder(onnx_model_path: str | None, dim: int):
    """Resolve the per-partition encoder: (callable, model_version).
    Called lazily inside the mapInPandas iterator — once per partition.
    """
    if onnx_model_path is not None:
        try:
            import numpy as np
            import onnxruntime  # noqa: F401 - absent in this container
        except ImportError as exc:
            raise NotImplementedError(
                "onnx_model_path was given but onnxruntime is not "
                "installed in this environment; install it or omit "
                "onnx_model_path to use the deterministic fallback"
            ) from exc
        sess = onnxruntime.InferenceSession(onnx_model_path)
        name = sess.get_inputs()[0].name

        def encode(texts: list[str]):
            return np.asarray(
                sess.run(None, {name: texts})[0], dtype=np.float32
            )

        return encode, f"onnx:{onnx_model_path.rsplit('/', 1)[-1]}"
    return (lambda texts: _hash_projection(texts, dim)), _MODEL_VERSION_FAKE


def embed_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = _DEFAULT_DIM,
    max_chars: int = _DEFAULT_MAX_CHARS,
    onnx_model_path: str | None = None,
) -> DataFrame:
    """Embed ``text_col`` into (id, embedding, model_version, error).

    Exactly one of ``embedding`` / ``error`` is non-null per row:
    null / empty / whitespace-only / longer-than-``max_chars`` inputs
    are quarantined with a typed error string, everything else gets a
    float32 vector of length ``dim``. The input DataFrame's other
    columns are dropped on purpose (join back by id), keeping the
    post-inference shuffle narrow.
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("model_version", T.StringType()),
            T.StructField("error", T.StringType()),
        ]
    )
    narrow = df.selectExpr(
        f"CAST({id_col} AS BIGINT) AS doc_id", f"{text_col} AS text"
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        encoder = None  # lazy: load once per PARTITION, not per batch
        version = None
        for pdf in batches:
            if encoder is None:
                encoder, version = _load_encoder(onnx_model_path, dim)
            n = len(pdf)
            errors: list[str | None] = [None] * n
            ok_idx: list[int] = []
            ok_texts: list[str] = []
            for i, text in enumerate(pdf["text"]):
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    errors[i] = "null_text"
                elif not isinstance(text, str):
                    errors[i] = f"bad_type:{type(text).__name__}"
                elif not text.strip():
                    errors[i] = "empty_text"
                elif len(text) > max_chars:
                    errors[i] = f"too_long:{len(text)}"
                else:
                    ok_idx.append(i)
                    ok_texts.append(text)
            vecs: list[list[float] | None] = [None] * n
            if ok_texts:
                try:
                    mat = encoder(ok_texts)
                    for j, i in enumerate(ok_idx):
                        vecs[i] = [float(x) for x in mat[j]]
                except Exception as exc:  # noqa: BLE001 — model runtimes
                    # batch-level failure: quarantine the batch's rows
                    # individually rather than killing the stage
                    for i in ok_idx:
                        errors[i] = f"encode_failed:{type(exc).__name__}"
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "embedding": vecs,
                    "model_version": [
                        version if e is None else None for e in errors
                    ],
                    "error": errors,
                }
            )

    return narrow.mapInPandas(run, schema=schema)
