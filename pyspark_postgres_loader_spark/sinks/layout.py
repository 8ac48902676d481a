"""Dataset layout control: partitioned (+ optionally bucketed) parquet
writes — the storage-side half of the 100 TB design.

``hive-partitionBy(col)`` turns equality/range predicates on the
partition column into directory pruning (the scan never opens
non-matching files); ``bucketBy(n, key)`` additionally makes every
future equi-join/aggregation on the key exchange-free (see
tests/test_bucketed_join.py). The reference has no layout control at
all — its sink is row-batches into Postgres — so this module is pure
extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_by`` columns.

    Partition columns should be low-cardinality (date buckets, lang,
    region): each distinct combination becomes a directory, and
    predicates on them prune at the directory level before any I/O.
    """
    df.write.partitionBy(*partition_by).mode(mode).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a bucketed (and bucket-sorted) managed table.

    Joins and aggregations on ``bucket_by`` between tables bucketed the
    same way need no shuffle — pay one layout write, amortize it over
    every downstream join.
    """
    w = df.write.bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.mode(mode).saveAsTable(table)


def overwrite_partitions_dynamic(
    df: DataFrame,
    path: str,
    partition_by: list[str],
) -> None:
    """Idempotent incremental write: replace ONLY the partitions present
    in ``df``, leaving all other partitions untouched (Spark's dynamic
    partitionOverwriteMode — static mode would wipe the whole root).
    This is how a daily pipeline re-lands one day's partition at 100 TB
    without rewriting history, and re-running the same day is a no-op
    rather than a duplicate. The conf is scoped to this write and
    restored after.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    saved = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.partitionBy(*partition_by).mode("overwrite").parquet(path)
    finally:
        spark.conf.set(key, saved)
