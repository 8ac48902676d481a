"""Delta Change Data Feed: per-commit change-type counts, the two
in-plan consistency verdicts, both reader modes (cdc vs derived),
range boundaries, and the oracle compare."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.operators.deltacdf import (
    delta_cdf_fold,
    delta_cdf_log_lines,
    delta_change_rows,
)

NV = 24


def test_both_modes_and_all_change_types_nonvacuous(spark):
    rows = {r["version"]: r for r in delta_cdf_fold(spark, NV).collect()}
    # range boundaries: [1, nv-2]
    assert min(rows) == 1 and max(rows) == NV - 2
    modes = {r["mode"] for r in rows.values()}
    assert modes == {"cdc", "derived"}
    cdc = [r for r in rows.values() if r["mode"] == "cdc"]
    assert cdc and all(r["version"] % 2 == 0 for r in cdc)
    # every change type really occurs on cdc commits
    assert all(r["insert_rows"] > 0 and r["update_pre_rows"] > 0
               and r["update_post_rows"] > 0 and r["delete_rows"] > 0
               for r in cdc)
    # pre and post image counts are equal by protocol construction
    assert all(r["update_pre_rows"] == r["update_post_rows"]
               for r in cdc)
    # derived commits carry no updates
    assert all(r["update_pre_rows"] == 0 and r["update_post_rows"] == 0
               for r in rows.values() if r["mode"] == "derived")


def test_consistency_verdicts_hold(spark):
    rows = delta_cdf_fold(spark, NV).collect()
    assert all(r["consistent"] == 1 for r in rows)
    assert all(r["carried_ok"] == 1 for r in rows)
    # net really is insert - delete, and matches the file-level fold
    assert all(r["net_rows"] == r["insert_rows"] - r["delete_rows"]
               == r["file_net_rows"] for r in rows)


def test_content_totals_match_logged_numrecords(spark):
    """The carried-twice value at unit level: sum the synthesized
    change rows per version and compare against the cdc action's
    numRecords parsed from the log — two independent subtrees."""
    content = (delta_change_rows(spark, NV)
               .groupBy("version")
               .agg(F.sum("n_rows").alias("total")))
    logged = (delta_cdf_log_lines(spark, NV)
              .select("version", F.from_json(
                  "line",
                  "struct<cdc: struct<path: string, size: bigint, "
                  "numRecords: bigint, dataChange: boolean>>")
                  .alias("a"))
              .filter("a.cdc IS NOT NULL")
              .select("version",
                      F.col("a.cdc.numRecords").alias("logged")))
    joined = content.join(logged, "version").collect()
    assert len(joined) == len([v for v in range(2, NV) if v % 2 == 0])
    assert all(r["total"] == r["logged"] for r in joined)


def test_base_log_consumers_unchanged(spark):
    """The cdc extension is a separate union leg: the base log from
    deltalog.py must not see cdc lines (its consumers' outputs are
    pinned by their own oracles; this pins the isolation)."""
    from pyspark_postgres_loader_spark.operators.deltalog import (
        delta_log_lines,
    )

    base = delta_log_lines(spark, NV).count()
    ext = delta_cdf_log_lines(spark, NV).count()
    n_cdc = len([v for v in range(2, NV) if v % 2 == 0])
    assert ext == base + n_cdc
    assert (delta_log_lines(spark, NV)
            .filter(F.col("line").contains('"cdc"')).count()) == 0


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "delta_change_data_feed")
