"""File sources: CSV / Parquet / JSON with column-name normalization.

Reference parity: ``GetS3DataAsDf`` (get_s3_data_as_df.py:21-54) reads
CSV (via the legacy ``com.databricks.spark.csv`` format — here the
built-in reader) or Parquet with arbitrary reader-option pass-through,
then lowercases every column name (get_s3_data_as_df.py:41-43, :52-54).
Paths may be local, ``s3a://``, ``hdfs://`` — Spark's Hadoop FS layer
handles the scheme, so one reader covers the reference's S3 source.

Scale note: these return lazy scans; Catalyst pushes filters/column
pruning into the Parquet reader. Avoid ``inferSchema`` on CSV in
production paths — it triggers an eager sampling job (the reference
does this implicitly; we accept the option but callers should pass an
explicit schema at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def normalize_columns(df: DataFrame) -> DataFrame:
    """Lowercase all column names (≈ get_s3_data_as_df.py:41-43)."""
    lowered = [c.lower() for c in df.columns]
    if lowered == list(df.columns):
        return df
    return df.toDF(*lowered)


def read_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    options.setdefault("header", "true")
    return normalize_columns(spark.read.options(**options).csv(path))


def read_parquet(spark: SparkSession, path: str, **options) -> DataFrame:
    return normalize_columns(spark.read.options(**options).parquet(path))


def read_json(spark: SparkSession, path: str, **options) -> DataFrame:
    return normalize_columns(spark.read.options(**options).json(path))


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    return normalize_columns(spark.read.options(**options).orc(path))


def read_format(spark: SparkSession, fmt: str, path: str, **options) -> DataFrame:
    """Generic escape hatch: any Spark DataSource format string
    (``avro``, ``delta``, a custom v2 source, ...) with option
    pass-through — the reference's arbitrary-format capability
    (get_s3_data_as_df.py:33-39) without enumerating formats."""
    return normalize_columns(spark.read.format(fmt).options(**options).load(path))


def configure_s3(
    spark: SparkSession,
    access_key: str | None = None,
    secret_key: str | None = None,
    endpoint: str | None = None,
    path_style_access: bool | None = None,
) -> None:
    """Set the ``fs.s3a.*`` Hadoop configuration the reference's S3
    source relies on implicitly (get_s3_data_as_df.py assumes an
    already-authenticated EMR runtime). Reader *options* do NOT reach
    the Hadoop FS layer — credentials/endpoint MUST go through the
    Hadoop configuration, which is the subtle plumbing difference this
    helper (and its test) pins. Only explicitly-passed settings are
    written, so an instance-profile/IRSA runtime keeps its defaults.
    """
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    if access_key is not None:
        conf.set("fs.s3a.access.key", access_key)
    if secret_key is not None:
        conf.set("fs.s3a.secret.key", secret_key)
    if endpoint is not None:
        conf.set("fs.s3a.endpoint", endpoint)
    if path_style_access is not None:
        conf.set("fs.s3a.path.style.access", str(path_style_access).lower())
