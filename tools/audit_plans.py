"""Round-15 optimization audit: dump the FORMATTED physical plan of
every registered query at the bench scale factor and summarize
anti-pattern signals per query (guide §1.1/§7.2):

- Exchange count (shuffles), SortMergeJoin / ShuffledHashJoin /
  BroadcastNestedLoopJoin / CartesianProduct occurrences,
- BatchEvalPython (row-at-a-time Python UDF) vs ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas nodes,
- FileScan count and whether any scan carries PushedFilters,
- WholeStageCodegen span count.

Writes one plan file per query to ``plans/r15/audit/<name>.txt`` and a
ranked JSON summary to ``plans/r15/audit_summary.json`` (joined with
the latest BENCH_HISTORY timings so hot+suspicious queries sort first).

Run from the repo root:  python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# formatted-mode plans list every node once as a details header
# "(<id>) <NodeName>"; count those (tree lines would double-count and
# carry suffixes like "SortMergeJoin Inner" that word-boundary
# patterns miss — the r15 first pass undercounted SMJs exactly so)
_PATTERNS = {
    "exchange": re.compile(r"^\(\d+\) Exchange\b", re.M),
    "sort_merge_join": re.compile(r"^\(\d+\) SortMergeJoin\b", re.M),
    "shuffled_hash_join": re.compile(r"^\(\d+\) ShuffledHashJoin\b", re.M),
    "broadcast_hash_join": re.compile(r"^\(\d+\) BroadcastHashJoin\b", re.M),
    "bnl_join": re.compile(r"^\(\d+\) BroadcastNestedLoopJoin\b", re.M),
    "cartesian": re.compile(r"^\(\d+\) CartesianProduct\b", re.M),
    "batch_eval_python": re.compile(r"^\(\d+\) BatchEvalPython\b", re.M),
    "arrow_eval_python": re.compile(r"^\(\d+\) ArrowEvalPython\b", re.M),
    "map_in_pandas": re.compile(
        r"^\(\d+\) (MapInPandas|PythonMapInArrow|MapInArrow)\b", re.M
    ),
    "flatmap_groups": re.compile(r"^\(\d+\) FlatMapGroupsInPandas\b", re.M),
    "file_scan": re.compile(r"^\(\d+\) Scan parquet\b", re.M),
    "sort": re.compile(r"^\(\d+\) Sort\b", re.M),
    "window": re.compile(r"^\(\d+\) Window\b", re.M),
    "rdd_scan": re.compile(r"^\(\d+\) Scan ExistingRDD\b", re.M),
}


def main() -> None:
    import time

    from pyspark_postgres_loader_spark import registry
    from pyspark_postgres_loader_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_dir = os.path.join(ROOT, "plans", "r15", "audit")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="plan-audit")
    qs = registry.all_queries()

    # latest bench timings for ranking
    times: dict[str, float] = {}
    try:
        hist = json.load(open(os.path.join(ROOT, "BENCH_HISTORY.json")))["rounds"]
        latest = sorted(r for r in hist if hist[r].get("sf") == 0.1)[-1]
        times = hist[latest]["queries"]
    except Exception:
        pass

    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    summary = {}
    t_all = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001 — survey, don't abort
            summary[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        row = {k: len(p.findall(plan)) for k, p in _PATTERNS.items()}
        row["pushed_filters"] = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        row["build_sec"] = round(time.time() - t0, 2)
        row["bench_sec"] = times.get(name)
        summary[name] = row
        print(f"{name}: exch={row['exchange']} smj={row['sort_merge_join']} "
              f"bep={row['batch_eval_python']} cart={row['cartesian']} "
              f"build={row['build_sec']}s", flush=True)

    with open(os.path.join(ROOT, "plans", "r15", "audit_summary.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "wall_sec": round(time.time() - t_all, 1),
                   "queries": summary}, f, indent=1, sort_keys=True)
    print(f"audited {len(summary)} queries in {round(time.time()-t_all,1)}s")
    spark.stop()


if __name__ == "__main__":
    main()
