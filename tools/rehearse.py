"""Full-registry dress rehearsal of the driver's correctness gate:
run EVERY registered query on a vanilla SparkSession at sf0.01 and
compare against its DuckDB oracle with the driver-style canonicalizer
(tests/oracle_harness.compare_query), then write REHEARSAL.json.

The per-round driver only checks a 50-query window; this tool is the
whole-surface signal. Run from the repo root:

    python tools/rehearse.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> int:
    from pyspark.sql import SparkSession

    from oracle_harness import compare_query
    from pyspark_postgres_loader_spark.registry import QUERIES, _ensure_loaded

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    _ensure_loaded()
    t0 = time.time()
    fails: dict[str, str] = {}
    for name in QUERIES:
        try:
            compare_query(spark, sf_dir, name)
        except Exception as exc:  # noqa: BLE001 — survey, don't abort
            fails[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"FAIL {name}: {fails[name]}", flush=True)
    result = {
        "sf_dir": sf_dir,
        "n_queries": len(QUERIES),
        "n_pass": len(QUERIES) - len(fails),
        "failures": fails,
        "wall_sec": round(time.time() - t0, 1),
    }
    with open(os.path.join(ROOT, "REHEARSAL.json"), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(
        f"rehearsal: {result['n_pass']}/{result['n_queries']} pass "
        f"at {sf_dir} in {result['wall_sec']}s"
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
