"""Static guard: no operator/streaming/function module may materialize
rows to the driver. At 100 TB a .collect()/.toPandas() in an operator
path is an OOM, not a slowdown — the only sanctioned driver-side fold
is the upsert sink's bounded per-partition stats tuple
(sinks/upsert.py, reference parity, one 6-tuple per partition)."""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "pyspark_postgres_loader_spark"
GUARDED_DIRS = ("operators", "streaming", "functions", "sources")
FORBIDDEN = re.compile(r"\.(collect|toPandas|toLocalIterator)\(\)")


def test_operator_paths_never_collect_to_driver():
    offenders = []
    for d in GUARDED_DIRS:
        for py in sorted((PKG / d).rglob("*.py")):
            for i, line in enumerate(py.read_text().splitlines(), 1):
                code = line.split("#", 1)[0]
                if FORBIDDEN.search(code):
                    offenders.append(f"{py.relative_to(PKG.parent)}:{i}: {line.strip()}")
    assert not offenders, "driver-side materialization in operator path:\n" + "\n".join(
        offenders
    )
