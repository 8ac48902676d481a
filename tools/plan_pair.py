"""Dump ``plans/r16/<query>_<suffix>.txt`` formatted physical plans
for the named queries — the before/after evidence pairs the round-16
optimization record cites.

Run from the repo root:

    python tools/plan_pair.py <before|after> q1 q2 ...
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    from pyspark_postgres_loader_spark import registry
    from pyspark_postgres_loader_spark.session import get_spark

    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(ROOT, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="plan-pair")
    qs = registry.all_queries()
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
