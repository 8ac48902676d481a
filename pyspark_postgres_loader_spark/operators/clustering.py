"""Distributed k-means over the ``embeddings`` table, plus the
cluster-diversity sampler built on it — the clustering primitives a
training-data curation pipeline needs (topic balancing, diversity
sampling, cluster-level dedup; the reference has no counterpart —
capability extension per SURVEY.md §2l).

Determinism contract (same as operators/similarity.py): every distance
is a SEQUENTIAL left-to-right double fold whose order is matched across
engines, centroid init is the first ``K`` vectors by ``vec_id``, argmin
ties break on cluster id, and centroid recomputation sums exact
``DECIMAL(38,6)`` casts (order-independent) before one double divide —
so a fixed number of Lloyd iterations is bit-reproducible in both Spark
and DuckDB, and the oracle replays the whole algorithm in SQL.

Scale design (100 TB):
- Centroids are a k x d table (8 x 64 here) — ALWAYS broadcast; each
  assignment pass is map-side only, no shuffle of the corpus.
- Centroid recomputation is posexplode (N x d rows) + groupBy(cluster,
  dim): partial aggregation combines map-side, so the shuffle carries
  only ~k*d rows per input partition regardless of N.
- Iteration count is FIXED (no data-dependent convergence loop), so the
  logical plan is statically known and Catalyst sees the whole
  pipeline; lineage depth is 2*iters+1, well inside planner limits.
- The corpus is re-read per assignment pass; at 100 TB you'd persist
  the (vec_id, embedding) projection or rely on parquet column pruning
  (the scan reads exactly 2 columns — asserted in test_plan_shapes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.planctl import spread as _spread
from ..registry import register
from ..tables import load_table

_K = 8        # clusters; init = embeddings of vec_id 0.._K-1
_ITERS = 3    # fixed Lloyd iterations (assign -> update), then final assign
_DIVERSITY_PER_CLUSTER = 5


def _sqdist(v: Column, c: Column) -> Column:
    """Squared L2 distance via the matched-order sequential fold
    (see similarity._dot_dec for why this is cross-engine stable)."""
    diffs = F.zip_with(
        v, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def _sql_sqdist(v: str, c: str) -> str:
    """DuckDB rendering of :func:`_sqdist` (1-based list indexing,
    0.0 prepended so the fold sequence matches Spark's aggregate)."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({v}) + 1), i -> "
        f"(CAST({v}[i] AS DOUBLE) - {c}[i]) * "
        f"(CAST({v}[i] AS DOUBLE) - {c}[i]))), (acc, x) -> acc + x)"
    )


def _assign(corpus: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k x d centroid table,
    score map-side, argmin with a deterministic (sq_dist, cluster)
    tie-break. Returns (vec_id, embedding, cluster, sq_dist)."""
    w = Window.partitionBy("vec_id").orderBy(F.asc("sq_dist"), F.asc("cluster"))
    return (
        corpus.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "embedding",
            "cluster",
            _sqdist(F.col("embedding"), F.col("c_emb")).alias("sq_dist"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _recompute(assigned: DataFrame) -> DataFrame:
    """New centroids as per-dimension means: posexplode to (cluster,
    dim, val), exact-decimal sum / count per (cluster, dim) — partial
    aggregation keeps the shuffle at ~k*d rows per partition — then
    re-assemble the dim-ordered double array per cluster."""
    exploded = assigned.select(
        "cluster", F.posexplode("embedding").alias("dim", "val")
    )
    means = exploded.groupBy("cluster", "dim").agg(
        (F.sum(F.col("val").cast("decimal(38,6)")).cast("double") / F.count("val")).alias(
            "mean"
        )
    )
    return means.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mean"))),
            lambda s: s["mean"],
        ).alias("c_emb")
    )


def _kmeans_final_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared pipeline: _ITERS Lloyd rounds, then the assignment under
    the final centroids. Returns (vec_id, embedding, cluster, sq_dist)."""
    corpus = _spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    cents = corpus.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cluster"),
        F.transform("embedding", lambda x: x.cast("double")).alias("c_emb"),
    )
    for _ in range(_ITERS):
        cents = _recompute(_assign(corpus, cents))
    return _assign(corpus, cents)


def _kmeans_oracle_ctes() -> str:
    """The Lloyd rounds unrolled as DuckDB CTEs (fixed iteration count
    makes the whole algorithm SQL-expressible)."""
    sq = _sql_sqdist
    parts = [
        "corpus AS (SELECT vec_id, embedding FROM embeddings)",
        f"""cents0 AS (
      SELECT vec_id AS cluster,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c_emb
      FROM embeddings WHERE vec_id < {_K})""",
    ]
    for t in range(_ITERS):
        parts.append(f"""assign{t} AS (
      SELECT vec_id, embedding, cluster FROM (
        SELECT c.vec_id, c.embedding, ct.cluster,
               ROW_NUMBER() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {sq('c.embedding', 'ct.c_emb')} ASC, ct.cluster
               ) AS rn
        FROM corpus c CROSS JOIN cents{t} ct
      ) WHERE rn = 1)""")
        parts.append(f"""cents{t + 1} AS (
      SELECT cluster, array_agg(mean ORDER BY dim) AS c_emb FROM (
        SELECT cluster, dim,
               CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) / COUNT(val) AS mean
        FROM (
          SELECT cluster,
                 generate_subscripts(embedding, 1) - 1 AS dim,
                 unnest(embedding) AS val
          FROM assign{t}
        ) GROUP BY cluster, dim
      ) GROUP BY cluster)""")
    parts.append(f"""final_assign AS (
      SELECT vec_id, cluster, sq_dist FROM (
        SELECT c.vec_id, ct.cluster,
               {sq('c.embedding', 'ct.c_emb')} AS sq_dist,
               ROW_NUMBER() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {sq('c.embedding', 'ct.c_emb')} ASC, ct.cluster
               ) AS rn
        FROM corpus c CROSS JOIN cents{_ITERS} ct
      ) WHERE rn = 1)""")
    return "WITH " + ",\n    ".join(parts)


@register(
    "cluster_kmeans_embeddings",
    oracle=f"""
    {_kmeans_oracle_ctes()}
    SELECT cluster, COUNT(*) AS n_vectors,
           CAST(SUM(CAST(sq_dist AS DECIMAL(38,6))) AS DOUBLE) AS inertia,
           MIN(vec_id) AS min_vec_id
    FROM final_assign
    GROUP BY cluster
    ORDER BY cluster
    """,
)
def cluster_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration Lloyd k-means (k={k}, {iters} rounds) over the
    64-dim embeddings: per-cluster size, exact-decimal inertia, and the
    smallest member id. The whole algorithm — init, {iters} assign/update
    rounds, final assignment — is deterministic and replayed by the
    DuckDB oracle as unrolled CTEs.
    """
    final = _kmeans_final_assignment(spark, sf_dir)
    return (
        final.groupBy("cluster")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum(F.col("sq_dist").cast("decimal(38,6)")).cast("double").alias("inertia"),
            F.min("vec_id").alias("min_vec_id"),
        )
        .orderBy("cluster")
    )


cluster_kmeans_embeddings.__doc__ = cluster_kmeans_embeddings.__doc__.format(
    k=_K, iters=_ITERS
)


@register(
    "sample_cluster_diversity",
    oracle=f"""
    {_kmeans_oracle_ctes()}
    SELECT cluster, vec_id, sq_dist, CAST(rn AS INTEGER) AS pick_rank FROM (
      SELECT cluster, vec_id, sq_dist,
             ROW_NUMBER() OVER (
               PARTITION BY cluster ORDER BY sq_dist ASC, vec_id
             ) AS rn
      FROM final_assign
    ) WHERE rn <= {_DIVERSITY_PER_CLUSTER}
    ORDER BY cluster, pick_rank
    """,
)
def sample_cluster_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity sampling: the {m} vectors closest to each k-means
    centroid — one small, spread-out representative set per region of
    embedding space (the standard cluster-then-sample curation recipe).
    Per-cluster top-m is a window rank over the final assignment; at
    scale this is TakeOrderedAndProject-per-group after the broadcast
    assignment pass, never a global sort.
    """
    final = _kmeans_final_assignment(spark, sf_dir)
    w = Window.partitionBy("cluster").orderBy(F.asc("sq_dist"), F.asc("vec_id"))
    return (
        final.select("cluster", "vec_id", "sq_dist")
        .withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= _DIVERSITY_PER_CLUSTER)
        .orderBy("cluster", "pick_rank")
    )


sample_cluster_diversity.__doc__ = sample_cluster_diversity.__doc__.format(
    m=_DIVERSITY_PER_CLUSTER
)
