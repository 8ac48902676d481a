"""Source registry — named readers returning DataFrames.

Reference parity: the reference resolves a source-name string to a
(module, class) pair from ``config.ini`` and dynamically imports it
(``load_postgres_from_spark_df.py:177-196``, ``config.ini:8-12``). We
keep the same capability as a plain registry of reader callables — the
Spark-native equivalent of a DataSource registry — and additionally
implement the Postgres JDBC source the reference declares but leaves as
an empty stub (``get_pg_data_as_df.py:1``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from .files import read_csv, read_format, read_json, read_orc, read_parquet
from .jdbc import read_jdbc_query, read_jdbc_table


def _read_file_tail(spark, path: str, **options) -> DataFrame:
    """Batch read of everything currently available in an append-only
    log file via the ``file_tail`` Python DataSource (registered on
    first use; see sources/filetail.py for the streaming variant)."""
    from .filetail import FileTailDataSource

    spark.dataSource.register(FileTailDataSource)
    reader = spark.read.format("file_tail").option("path", path)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()

SOURCE_REGISTRY: dict[str, Callable[..., DataFrame]] = {
    "csv": read_csv,
    "parquet": read_parquet,
    "json": read_json,
    "orc": read_orc,
    "format": read_format,  # generic: any DataSource format string
    "s3": read_parquet,  # s3a:// paths go through the same readers
    # legacy Spark 1.x external-CSV format string, still found in old
    # job configs (reference passes it verbatim, get_s3_data_as_df.py:38-39)
    "com.databricks.spark.csv": read_csv,
    "postgres": read_jdbc_table,
    "jdbc": read_jdbc_table,
    "jdbc_query": read_jdbc_query,
    "file_tail": _read_file_tail,  # append-only log file (sources/filetail.py)
}


def get_source_dataframe(spark, source: str, *args, **kwargs) -> DataFrame:
    """Resolve ``source`` to a reader and call it.

    ≈ ``LoadPostgresFromSparkDataFrame._get_source_dataframe``
    (load_postgres_from_spark_df.py:177-196), minus dynamic import
    machinery; unknown sources raise instead of silently returning
    ``None`` (reference bug at get_s3_data_as_df.py:27-31).
    """
    try:
        reader = SOURCE_REGISTRY[source]
    except KeyError:
        raise ValueError(
            f"unknown source {source!r}; registered: {sorted(SOURCE_REGISTRY)}"
        ) from None
    return reader(spark, *args, **kwargs)


__all__ = [
    "SOURCE_REGISTRY",
    "get_source_dataframe",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_orc",
    "read_format",
    "read_jdbc_table",
    "read_jdbc_query",
]
