"""JDBC (Postgres) source — implements the reference's empty stub.

The reference registers a Postgres source in config (``config.ini:11-12``)
but ships an empty module (``get_pg_data_as_df.py:1``). This is the
Spark-native implementation: ``spark.read.format("jdbc")`` with
partitioned parallel reads. Catalyst/JDBC pushes filters and column
pruning into the database automatically.

Scale note: without ``partition_column`` the whole table arrives through
ONE connection on one task — fine for dimension tables, wrong for facts.
For a 100 TB fact table, always pass (partition_column, lower_bound,
upper_bound, num_partitions) so the scan fans out across executors.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .files import normalize_columns


def pg_jdbc_url(host: str, port: int | str, database: str) -> str:
    return f"jdbc:postgresql://{host}:{port}/{database}"


def _jdbc_reader(
    spark: SparkSession,
    url: str,
    user: str | None,
    password: str | None,
    partition_column: str | None,
    lower_bound: int | str | None,
    upper_bound: int | str | None,
    num_partitions: int | None,
    fetchsize: int,
    **options,
):
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", options.pop("driver", "org.postgresql.Driver"))
        .option("fetchsize", str(fetchsize))
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound, num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    **options,
) -> DataFrame:
    """Read a database table as a DataFrame (parallel when partitioned)."""
    reader = _jdbc_reader(
        spark, url, user, password, partition_column, lower_bound,
        upper_bound, num_partitions, fetchsize, **options,
    ).option("dbtable", table)
    return normalize_columns(reader.load())


def read_jdbc_query(
    spark: SparkSession,
    url: str,
    query: str,
    user: str | None = None,
    password: str | None = None,
    fetchsize: int = 10_000,
    **options,
) -> DataFrame:
    """Read the result of a SQL query pushed down to the database.

    ≈ the reference's catalog-introspection reads (psycopg2_database_
    helper.py:254-284) — predicates/joins/aggregates in the query text
    execute inside the database, not in Spark.
    """
    reader = _jdbc_reader(
        spark, url, user, password, None, None, None, None, fetchsize, **options
    ).option("query", query)
    return normalize_columns(reader.load())


def read_jdbc_incremental(
    spark: SparkSession,
    url: str,
    table: str,
    watermark_column: str,
    last_value,
    user: str | None = None,
    password: str | None = None,
    fetchsize: int = 10_000,
    **options,
) -> DataFrame:
    """Incremental (change-capture) read: only rows with
    ``watermark_column > last_value`` — the standard nightly-sync
    pattern against an updated_at/sequence column. The predicate is
    embedded in the pushed-down query text, so the DATABASE evaluates
    it against its own index; Spark never sees unchanged rows. The
    caller persists max(watermark_column) of each run as the next
    ``last_value`` (exactly what a scheduler's state store holds).

    ``last_value`` is rendered as a SQL literal: numbers verbatim
    (bool is rejected — ``str(True)`` is not SQL), everything else
    quoted with doubled single-quotes (safe for the timestamp/
    ISO-string case this pattern uses). ``table`` and
    ``watermark_column`` are interpolated into the pushed-down query
    text and must be trusted identifiers; they are validated against a
    conservative identifier shape (dotted names, optional quoting) so a
    malformed value fails here rather than inside the database.
    """
    if isinstance(last_value, bool):
        raise TypeError(
            "last_value must be a number or string-renderable watermark, not bool"
        )
    for ident, what in ((table, "table"), (watermark_column, "watermark_column")):
        if not re.fullmatch(r'[A-Za-z_][\w$]*(\.[A-Za-z_][\w$]*)*|"[^"]+"(\."[^"]+")*', ident):
            raise ValueError(f"{what} {ident!r} is not a plain or quoted SQL identifier")
    if isinstance(last_value, (int, float)):
        lit = str(last_value)
    else:
        esc = str(last_value).replace("'", "''")
        lit = f"'{esc}'"
    query = f"SELECT * FROM {table} WHERE {watermark_column} > {lit}"
    return read_jdbc_query(
        spark, url, query, user=user, password=password, fetchsize=fetchsize, **options
    )
