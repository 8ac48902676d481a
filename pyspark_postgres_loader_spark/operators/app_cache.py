"""App-id-scoped DataFrame memo — the `_ASSIGN_CACHE` pattern
(clustering.py:159) factored out for every operator family that
builds a reusable substrate (ANN graphs, IVF codebooks, coarse
centroids).

Why this exists at 100 TB: an ANN index / trained codebook is built
ONCE per corpus version and served to every query; rebuilding it per
query is the mistake the cache removes. Keys carry the Spark
applicationId so a DataFrame never leaks across sessions (the
driver's vanilla rehearsal and a fresh bench process get fresh ids
and rebuild); fixture inputs never change under a live session, so
entries cannot go stale. Entries from dead sessions are evicted on
the next build (r10 ADVICE precedent)."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def app_scoped(
    cache: dict[tuple, DataFrame],
    spark: SparkSession,
    key_tail: tuple,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the memoized eager localCheckpoint of ``build()`` for
    ``key_tail`` under the CURRENT Spark application, evicting
    entries left by dead sessions."""
    app_id = spark.sparkContext.applicationId
    key = (app_id,) + key_tail
    df = cache.get(key)
    if df is None:
        for stale in [k for k in cache if k[0] != app_id]:
            del cache[stale]
        df = build().localCheckpoint(eager=True)
        cache[key] = df
    return df
