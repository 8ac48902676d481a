"""Test-data table loaders for the driver fixtures (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under ``{sf_dir}/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor: these
# are bounded reference data (5 regions, 25 nations), not fact tables.
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}")
    # Pin the session timezone: timestamp-literal casts (q1's shipdate
    # bound), unix_timestamp (RANGE-frame windows), and date_trunc all
    # read spark.sql.session.timeZone — a non-UTC caller session would
    # silently diverge from the DuckDB oracles. Set at runtime for the
    # same reason as nanosAsLong below: the driver's session is vanilla.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS), which Spark rejects
        # unless it may read nanos as long. Set at runtime so the engine
        # works in ANY caller's session (the driver harness builds a
        # vanilla SparkSession without our session factory's configs).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_event_ts(df)
    return df


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as long
    nanoseconds — truncate to microseconds (matching how DuckDB reads
    the same file) and convert to a real timestamp."""
    from pyspark.sql import functions as F  # local import: avoid session-less module load
    from pyspark.sql import types as T

    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register temp views so operators can be written in SQL."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
