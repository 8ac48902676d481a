"""Hybrid retrieval: BM25 keyword ranking + embedding cosine
ranking, fused with Reciprocal Rank Fusion (RRF).

The retrieval shape every RAG / training-data curation stack runs:
a sparse (keyword) ranker and a dense (vector) ranker each produce
a top-L pool per query, and the pools are fused rank-wise —
``RRF(d) = Σ_r 1/(K + rank_r(d))`` (Cormack et al., SIGIR'09) — so
neither scorer's scale dominates. Fusion happens on RANKS, not
scores, which is what makes it robust and — here — exactly
replayable: the per-rank contribution is quantized to integer
micros (``1_000_000 div (K + rank)``) so the fused score is exact
integer arithmetic in both engines (memory: FLOOR/div over the same
op, never float rounding).

Determinism contract: BM25 uses the same rational-idf template as
``search_bm25_topk`` (imported, not copied — identical operand
order ⇒ bit-identical doubles), cosines use the matched
left-to-right double fold from operators/similarity.py, and every
ranking tie-breaks on doc_id. Ranks are therefore engine-identical,
and everything derived from ranks is exact.

Scale notes (100 TB): each ranker is one corpus scan — keyword tf
via per-row higher-order ``filter()`` (never explode→groupBy),
cosine via map-side broadcast of the |Q| anchors — followed by a
per-query top-L prune. The fusion join then touches at most
|Q|·L rows per side (hundreds, not corpus-sized), so RRF is free
no matter the corpus size; the cost stays in the two scans Catalyst
already optimizes.

Reference: reference repo has no retrieval surface (SURVEY.md §2
extension family: similarity search / text analysis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.planctl import spread as _spread
from ..registry import register
from ..tables import load_table
from .analytics_extra import _SCORE_TMPL
from .similarity import _dot_dec, _sql_cosine

# (query_id, keyword terms, anchor vector id) — the anchor doubles as
# the dense query; doc_id and vec_id share the same id space.
_HQ = (
    (0, ("hash", "join"), 101),
    (1, ("stream", "window"), 202),
    (2, ("filter", "scan"), 303),
)
_ALL_TERMS = tuple(t for _, ts, _ in _HQ for t in ts)
_RRF_K = 60
_POOL = 50          # per-ranker pool depth L
_FUSED_TOPK = 10


def _kw_score_expr(terms: tuple[str, ...]) -> str:
    return " + ".join(
        _SCORE_TMPL.format(df=f"df_{t}", tf=f"tf_{t}") for t in terms
    )


def _rrf_oracle() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(string_split(text, ' '), w -> w = '{t}'))"
        f" AS tf_{t}" for t in _ALL_TERMS
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in _ALL_TERMS
    )
    kw_all = " UNION ALL ".join(
        f"SELECT {qid} AS query_id, doc_id,"
        f" ({_kw_score_expr(terms)}) AS kw_score"
        f" FROM tf CROSS JOIN stats"
        f" WHERE {' + '.join(f'tf_{t}' for t in terms)} > 0"
        for qid, terms, _ in _HQ
    )
    anchors = " UNION ALL ".join(
        f"SELECT {qid} AS query_id, embedding AS q_emb"
        f" FROM embeddings WHERE vec_id = {vid}"
        for qid, _, vid in _HQ
    )
    return f"""
    WITH tf AS (
      SELECT doc_id, {tf_cols},
             len(string_split(text, ' ')) AS dl
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl, {df_cols} FROM tf
    ),
    kw_all AS ({kw_all}),
    kw AS (
      SELECT query_id, doc_id, rn AS kw_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY kw_score DESC, doc_id) AS rn
        FROM kw_all
      ) WHERE rn <= {_POOL}
    ),
    anchors AS ({anchors}),
    vec_all AS (
      SELECT a.query_id, c.vec_id AS doc_id,
             ROW_NUMBER() OVER (PARTITION BY a.query_id
               ORDER BY {_sql_cosine('a.q_emb', 'c.embedding')} DESC,
                        c.vec_id) AS rn
      FROM embeddings c CROSS JOIN anchors a
    ),
    vec AS (
      SELECT query_id, doc_id, rn AS vec_rank FROM vec_all
      WHERE rn <= {_POOL}
    ),
    fused AS (
      SELECT COALESCE(k.query_id, v.query_id) AS query_id,
             COALESCE(k.doc_id, v.doc_id) AS doc_id,
             COALESCE(k.kw_rank, 0) AS kw_rank,
             COALESCE(v.vec_rank, 0) AS vec_rank,
             CAST(
               (CASE WHEN k.kw_rank IS NULL THEN 0
                     ELSE 1000000 // ({_RRF_K} + k.kw_rank) END)
             + (CASE WHEN v.vec_rank IS NULL THEN 0
                     ELSE 1000000 // ({_RRF_K} + v.vec_rank) END)
             AS BIGINT) AS fused_micros
      FROM kw k FULL OUTER JOIN vec v
        ON k.query_id = v.query_id AND k.doc_id = v.doc_id
    )
    SELECT query_id, doc_id, kw_rank, vec_rank, fused_micros,
           rn AS fused_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY fused_micros DESC, doc_id) AS rn
      FROM fused
    ) WHERE rn <= {_FUSED_TOPK}
    ORDER BY query_id, fused_rank
    """


@register("search_rrf_fusion", oracle=_rrf_oracle())
def search_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search over {nq} queries: BM25 keyword top-{L} fused
    with embedding-cosine top-{L} by Reciprocal Rank Fusion
    (K={K}, contributions quantized to integer micros), fused
    top-{k} per query.

    Keyword side: ONE corpus scan computes all {nt} term frequencies
    via higher-order ``filter()`` (no explode), a 1-row stats
    aggregate broadcasts back, and ``stack()`` pivots the per-query
    scores without rescanning. Vector side: the {nq} anchors
    broadcast against one corpus scan. Both sides rank-prune to L
    before the fusion join, so the fused stage handles |Q|·L rows
    regardless of corpus size — the RRF itself is free at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    tf = d.select(
        "doc_id",
        *[
            F.expr(f"size(filter(split(text, ' '), w -> w = '{t}'))")
            .alias(f"tf_{t}")
            for t in _ALL_TERMS
        ],
        F.expr("size(split(text, ' '))").alias("dl"),
    )
    stats = tf.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("int")).alias(f"df_{t}")
            for t in _ALL_TERMS
        ],
    )
    stack_rows = ", ".join(
        f"{qid}, CAST(({_kw_score_expr(terms)}) AS DOUBLE), "
        f"({' + '.join(f'tf_{t}' for t in terms)} > 0)"
        for qid, terms, _ in _HQ
    )
    kw_all = (
        tf.crossJoin(F.broadcast(stats))
        .selectExpr(
            "doc_id",
            f"stack({len(_HQ)}, {stack_rows})"
            " as (query_id, kw_score, kw_hit)",
        )
        .filter("kw_hit")
    )
    w_kw = Window.partitionBy("query_id").orderBy(
        F.desc("kw_score"), F.asc("doc_id"))
    kw = (
        kw_all.withColumn("kw_rank", F.row_number().over(w_kw))
        .filter(F.col("kw_rank") <= _POOL)
        .select("query_id", "doc_id", "kw_rank")
    )

    e = _spread(load_table(spark, sf_dir, "embeddings"))
    corpus = e.select(
        "vec_id", "embedding",
        F.sqrt(_dot_dec(F.col("embedding"), F.col("embedding")))
        .alias("v_norm"),
    )
    qmap = F.lit(None)
    for qid, _, vid in reversed(_HQ):
        qmap = F.when(F.col("vec_id") == vid, F.lit(qid)).otherwise(qmap)
    anchors = (
        corpus.filter(F.col("vec_id").isin(*[v for _, _, v in _HQ]))
        .select(
            qmap.alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("v_norm").alias("q_norm"),
        )
    )
    scored = corpus.crossJoin(F.broadcast(anchors)).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        (
            _dot_dec(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("v_norm"))
        ).alias("cosine"),
    )
    w_vec = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("doc_id"))
    vec = (
        scored.withColumn("vec_rank", F.row_number().over(w_vec))
        .filter(F.col("vec_rank") <= _POOL)
        .select("query_id", "doc_id", "vec_rank")
    )

    fused = (
        kw.withColumnRenamed("kw_rank", "kr")
        .join(
            vec.withColumnRenamed("vec_rank", "vr"),
            ["query_id", "doc_id"], "full_outer",
        )
        .select(
            "query_id",
            "doc_id",
            F.coalesce(F.col("kr"), F.lit(0)).alias("kw_rank"),
            F.coalesce(F.col("vr"), F.lit(0)).alias("vec_rank"),
            (
                F.when(
                    F.col("kr").isNotNull(),
                    F.expr(f"1000000 div ({_RRF_K} + kr)"),
                ).otherwise(F.lit(0))
                + F.when(
                    F.col("vr").isNotNull(),
                    F.expr(f"1000000 div ({_RRF_K} + vr)"),
                ).otherwise(F.lit(0))
            ).cast("long").alias("fused_micros"),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.desc("fused_micros"), F.asc("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_f))
        .filter(F.col("fused_rank") <= _FUSED_TOPK)
        .select("query_id", "doc_id", "kw_rank", "vec_rank",
                "fused_micros", "fused_rank")
    )


search_rrf_fusion.__doc__ = search_rrf_fusion.__doc__.format(
    nq=len(_HQ), L=_POOL, K=_RRF_K, k=_FUSED_TOPK, nt=len(_ALL_TERMS)
)
