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
the next build (r10 ADVICE precedent), unpersisting their
checkpointed blocks when the owning context is still alive
(r15 ADVICE: eviction used to drop the dict entry but leak the
RDD blocks of a same-JVM predecessor session).

Build cost is recorded per substrate in ``BUILD_LOG`` (name →
seconds, most recent build wins) so bench.py can surface substrate
construction separately from the per-query timings that consume the
memo (VERDICT r15 task 5: a memoized query's timed passes read a
checkpoint, not the build — the build seconds live here).
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

# substrate name -> seconds of the most recent build in this process
# (measurement surface only; never read on any query path)
BUILD_LOG: dict[str, float] = {}


def app_scoped(
    cache: dict[tuple, DataFrame],
    spark: SparkSession,
    key_tail: tuple,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the memoized eager localCheckpoint of ``build()`` for
    ``key_tail`` under the CURRENT Spark application, evicting
    (and unpersisting) entries left by dead sessions."""
    app_id = spark.sparkContext.applicationId
    key = (app_id,) + key_tail
    df = cache.get(key)
    if df is None:
        for stale in [k for k in cache if k[0] != app_id]:
            old = cache.pop(stale)
            try:  # release the checkpoint blocks if the old context
                old.unpersist()  # is this same JVM; a stopped context
            except Exception:  # noqa: BLE001 — already freed everything
                pass
        t0 = time.perf_counter()
        df = build().localCheckpoint(eager=True)
        BUILD_LOG["/".join(str(p) for p in key_tail)] = round(
            time.perf_counter() - t0, 3
        )
        cache[key] = df
    return df
