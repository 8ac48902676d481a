"""Analytics CLI: ``python -m pyspark_postgres_loader_spark.query_cli``.

The reference's only entry point is the loader (main.py); this is the
entry point for the analytics surface this engine adds — list the
registered queries, run one against a fixture/warehouse directory,
print rows or the physical plan.

Examples::

    python -m pyspark_postgres_loader_spark.query_cli --list
    python -m pyspark_postgres_loader_spark.query_cli q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01 --limit 10
    python -m pyspark_postgres_loader_spark.query_cli dedup_minhash_lsh \
        --sf-dir /root/testdata/sf0.01 --explain
"""

from __future__ import annotations

import argparse

from . import registry
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Run a registered analytics query")
    p.add_argument("name", nargs="?", help="query name (see --list)")
    p.add_argument("--list", action="store_true", help="list registered queries")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="directory of fixture parquet tables")
    p.add_argument("--limit", type=int, default=20, help="rows to show (0 = count only)")
    p.add_argument("--explain", action="store_true", help="print the physical plan instead")
    args = p.parse_args(argv)

    registry._ensure_loaded()
    if args.list or not args.name:
        for name, spec in sorted(registry.QUERIES.items()):
            kind = "oracle" if spec.oracle else "rows-only"
            first_line = (spec.doc or "").strip().splitlines()[0] if spec.doc else ""
            print(f"{name:36s} [{kind}] {first_line}")
        return 0

    if args.name not in registry.QUERIES:
        p.error(f"unknown query {args.name!r}; use --list")

    spark = get_spark(app_name=f"query:{args.name}")
    try:
        df = registry.QUERIES[args.name].fn(spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        elif args.limit:
            df.show(args.limit, truncate=40)
        else:
            print(f"rows: {df.count()}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
