"""IVF at rest: the index assignment written ``partitionBy("cell")``
must let a probe read only its probed cells (directory pruning), and
the laid-out index must reproduce the in-memory top-k exactly."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.operators.similarity import (
    ann_ivf_topk,
    ivf_assignments,
)
from pyspark_postgres_loader_spark.sinks.layout import write_partitioned

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_partitioned_probe_prunes_cells(spark):
    out = tempfile.mkdtemp(prefix="ivf_")
    try:
        write_partitioned(ivf_assignments(spark, SF_DIR), out, ["cell"])

        probe = spark.read.parquet(out).filter(F.col("cell").isin(0, 3))
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        part_section = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
        assert "cell" in part_section, part_section

        # laid-out index content matches the in-memory assignment
        mem = ivf_assignments(spark, SF_DIR).groupBy("cell").count()
        disk = spark.read.parquet(out).groupBy("cell").count()
        assert sorted(map(tuple, mem.collect())) == sorted(map(tuple, disk.collect()))
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_ann_ivf_unchanged_by_refactor(spark):
    # 8 queries × top-10 with fixed centroids: deterministic
    res = ann_ivf_topk(spark, SF_DIR)
    rows = res.collect()
    assert len(rows) == 80
    assert {r.query_id for r in rows} == set(range(8))
