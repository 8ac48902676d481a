"""Incremental-pipeline building blocks: the change-capture JDBC read's
pushed-down predicate, and dynamic partition overwrite leaving sibling
partitions untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.sinks.layout import overwrite_partitions_dynamic
from pyspark_postgres_loader_spark.sources.jdbc import read_jdbc_incremental


def test_incremental_predicate_literal_rendering(spark, monkeypatch):
    """The watermark predicate must reach the pushed-down query text
    with correct literal quoting (numeric verbatim, strings quoted and
    escaped)."""
    captured = {}

    def fake_read_jdbc_query(spark_, url, query, **kw):
        captured["query"] = query
        return spark_.range(0)

    import pyspark_postgres_loader_spark.sources.jdbc as jdbc_mod

    monkeypatch.setattr(jdbc_mod, "read_jdbc_query", fake_read_jdbc_query)

    read_jdbc_incremental(spark, "jdbc:postgresql://h/db", "ev", "seq", 12345)
    assert captured["query"] == "SELECT * FROM ev WHERE seq > 12345"

    read_jdbc_incremental(
        spark, "jdbc:postgresql://h/db", "ev", "updated_at", "2026-01-01 00:00:00"
    )
    assert captured["query"] == (
        "SELECT * FROM ev WHERE updated_at > '2026-01-01 00:00:00'"
    )

    read_jdbc_incremental(spark, "jdbc:postgresql://h/db", "ev", "name", "O'Brien")
    assert captured["query"] == "SELECT * FROM ev WHERE name > 'O''Brien'"

    # dotted and quoted identifiers are legitimate
    read_jdbc_incremental(spark, "jdbc:postgresql://h/db", "public.ev", "seq", 1)
    assert captured["query"] == "SELECT * FROM public.ev WHERE seq > 1"
    read_jdbc_incremental(spark, "jdbc:postgresql://h/db", '"Ev Table"', "seq", 1)
    assert captured["query"] == 'SELECT * FROM "Ev Table" WHERE seq > 1'


def test_incremental_rejects_bool_and_malformed_identifiers(spark, monkeypatch):
    """bool is not a watermark (str(True) is not SQL), and table/column
    are interpolated into query text so non-identifier shapes must fail
    loudly here, not inside the database."""
    import pytest

    import pyspark_postgres_loader_spark.sources.jdbc as jdbc_mod

    monkeypatch.setattr(
        jdbc_mod, "read_jdbc_query", lambda spark_, url, query, **kw: spark_.range(0)
    )

    with pytest.raises(TypeError, match="bool"):
        read_jdbc_incremental(spark, "jdbc:postgresql://h/db", "ev", "flag", True)
    with pytest.raises(ValueError, match="identifier"):
        read_jdbc_incremental(
            spark, "jdbc:postgresql://h/db", "ev; DROP TABLE ev", "seq", 1
        )
    with pytest.raises(ValueError, match="identifier"):
        read_jdbc_incremental(
            spark, "jdbc:postgresql://h/db", "ev", "seq > 0 OR 1=1 --", 1
        )


def test_dynamic_partition_overwrite_preserves_siblings(spark, tmp_path):
    path = str(tmp_path / "part")
    base = spark.createDataFrame(
        [("2026-01-01", 1, "a"), ("2026-01-02", 2, "b")], ["day", "id", "v"]
    )
    overwrite_partitions_dynamic(base, path, ["day"])

    # re-land ONLY day 2 with corrected data
    fix = spark.createDataFrame([("2026-01-02", 2, "B!")], ["day", "id", "v"])
    overwrite_partitions_dynamic(fix, path, ["day"])

    # partition values round-trip through directory names with type
    # inference (the day strings come back as dates) — compare as str
    got = {
        (str(r.day), r.id, r.v) for r in spark.read.parquet(path).collect()
    }
    # day 1 untouched, day 2 replaced (static mode would have dropped day 1)
    assert got == {("2026-01-01", 1, "a"), ("2026-01-02", 2, "B!")}
    # conf restored
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static") == "static"
