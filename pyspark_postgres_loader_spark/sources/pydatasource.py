"""Custom Python DataSource (the Spark 4 ``pyspark.sql.datasource``
public API): a partitioned, deterministic synthetic-events generator.

This extends the reference's source-plugin idea (SURVEY.md §2a S4 —
named source classes resolved from config) to the modern Spark-native
plugin surface: a ``DataSource`` subclass registered with
``spark.dataSource.register`` becomes a first-class ``spark.read
.format("synthetic_events")`` source with schema, options, and
PARTITIONED execution — each ``InputPartition`` generates its row range
independently on an executor, so the source scales out like a file scan
(no driver materialization, no single generator bottleneck; at 100 TB
you raise ``n_partitions``, nothing else changes).

Every field is a pure function of the row index through the md5-derived
``mhash64`` arithmetic (functions/deterministic.py), so DuckDB can
REPLAY the generator from ``range(n)`` — the custom source is fully
oracle-checked, not just smoke-tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from ..functions.deterministic import sql_dsum, sql_mhash64
from ..registry import register

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
_BASE_EPOCH = 1767225600  # 2026-01-01 00:00:00 UTC
_SPAN_SECONDS = 30 * 86400
_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
)


def mhash64_py(s: str) -> int:
    """Python replay of functions.deterministic.mhash64 (top 15 md5 hex
    chars as a non-negative 60-bit int) — one arithmetic, three engines
    (Spark SQL, DuckDB, Python generator)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` — options:

    - ``n_rows`` (default 10000): total rows
    - ``n_partitions`` (default 8): independent generator partitions
    - ``n_users`` (default 100): user-id cardinality
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticEventsReader(self.options)

    def streamReader(self, schema) -> "_SyntheticEventsStreamReader":
        return _SyntheticEventsStreamReader(self.options)


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.n_users = int(options.get("n_users", 100))
        if self.n_rows < 0 or self.n_partitions < 1:
            raise ValueError("n_rows must be >= 0 and n_partitions >= 1")

    def partitions(self):
        if self.n_rows == 0:
            return [_RangePartition(0, 0)]
        step = -(-self.n_rows // self.n_partitions)  # ceil division
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        import datetime

        utc = datetime.timezone.utc
        for i in range(partition.start, partition.end):
            ts = datetime.datetime.fromtimestamp(
                _BASE_EPOCH + mhash64_py(f"s{i}") % _SPAN_SECONDS, tz=utc
            )
            yield (
                i,
                ts,
                mhash64_py(f"u{i}") % self.n_users,
                _EVENT_TYPES[mhash64_py(f"t{i}") % len(_EVENT_TYPES)],
                (mhash64_py(f"v{i}") % 1_000_000) / 100.0,
            )


class _SyntheticEventsStreamReader(DataSourceStreamReader):
    """Streaming side of the generator: the offset is simply the next
    row index, advancing ``batch_rows`` per micro-batch up to
    ``n_rows``. Offsets are plain dicts checkpointed by Spark, so a
    killed query resumes exactly where the last committed batch ended —
    rows are a pure function of the index, making replay idempotent
    (the exactly-once story needs no source-side state beyond the
    offset). Each batch's range splits into ``n_partitions`` executor-
    side generator partitions like the batch reader."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10000))
        self.n_partitions = int(options.get("n_partitions", 4))
        self.n_users = int(options.get("n_users", 100))
        self.batch_rows = int(options.get("batch_rows", 1000))
        if self.batch_rows < 1:
            raise ValueError("batch_rows must be >= 1")
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"i": 0}

    def latestOffset(self) -> dict:
        # bounded source: advance one batch per poll until drained
        self._latest = min(self._latest + self.batch_rows, self.n_rows)
        return {"i": self._latest}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["i"]), int(end["i"])
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        step = -(-(hi - lo) // self.n_partitions)
        return [
            _RangePartition(p, min(p + step, hi)) for p in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        yield from _SyntheticEventsReader(
            {
                "n_rows": str(self.n_rows),
                "n_partitions": str(self.n_partitions),
                "n_users": str(self.n_users),
            }
        ).read(partition)

    def commit(self, end: dict) -> None:
        pass


_QUERY_ROWS = 20_000
_QUERY_PARTS = 8


@register(
    "pysource_synthetic_events",
    oracle=f"""
    WITH gen AS (
      SELECT i AS event_id,
             make_timestamp((1767225600
               + {sql_mhash64("'s' || i")} % {_SPAN_SECONDS}) * 1000000) AS ts,
             {sql_mhash64("'u' || i")} % 100 AS user_id,
             list_element(['click','view','purchase','signup','error'],
                          1 + {sql_mhash64("'t' || i")} % 5) AS event_type,
             CAST({sql_mhash64("'v' || i")} % 1000000 AS DOUBLE) / 100.0 AS value
      FROM range({_QUERY_ROWS}) t(i)
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           {sql_dsum('value')} AS sum_value,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM gen GROUP BY event_type ORDER BY event_type
    """,
)
def pysource_synthetic_events(spark, sf_dir: str):
    """Aggregate over the custom Python DataSource: proves the full
    loop — register → partitioned executor-side generation → DataFrame
    ops on top — with a DuckDB oracle that replays the md5 generator
    arithmetic from ``range(n)``. ``sf_dir`` is unused (the source IS
    the data); the row count is fixed so the oracle matches at every
    scale factor.
    """
    from pyspark.sql import functions as F

    from ..functions.deterministic import dsum

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.dataSource.register(SyntheticEventsDataSource)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", _QUERY_ROWS)
        .option("n_partitions", _QUERY_PARTS)
        .load()
    )
    return (
        df.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("sum_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("event_type")
    )
