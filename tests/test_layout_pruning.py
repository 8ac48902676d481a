"""Partition pruning proof: a lang-partitioned copy of documents is
scanned with a lang predicate, and the plan shows directory-level
pruning (PartitionFilters carries the predicate; only the matching
partition's files are read)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.sinks.layout import write_partitioned
from pyspark_postgres_loader_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_on_partition_predicate(spark):
    out = tempfile.mkdtemp(prefix="layout_")
    try:
        docs = load_table(spark, SF_DIR, "documents")
        write_partitioned(docs, out, ["lang"])

        back = spark.read.parquet(out).filter(F.col("lang") == "de")
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        # the lang predicate must appear as a partition filter, not a data filter
        part_section = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
        assert "lang" in part_section, part_section

        expected = docs.filter(F.col("lang") == "de").count()
        assert back.count() == expected
        # (inputFiles() reflects the unfiltered relation, so file-level
        # evidence is the PartitionFilters assertion above)
    finally:
        shutil.rmtree(out, ignore_errors=True)
