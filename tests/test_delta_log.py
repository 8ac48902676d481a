"""Delta transaction-log replay: pure-Python snapshot replay (third
engine), the NDJSON roundtrip, protocol invariants, and the oracle
compare."""

from __future__ import annotations

import json


def _py_replay(n_versions: int):
    """Independent snapshot fold over the same action lattice."""
    live: dict[int, tuple[int, int]] = {}
    out = []
    for v in range(n_versions):
        fids = [0, 1, 2] if v == 0 else [2 * v + 1, 2 * v + 2]
        for f in fids:
            live[f] = (1000 + 37 * f, 8192 + 517 * f)
        n_rm = 0
        if v >= 2:
            del live[v - 2]
            n_rm = 1
        out.append(
            (
                v, len(fids), n_rm, 2 if v == 0 else 0,
                len(live),
                sum(r for r, _s in live.values()),
                sum(s for _r, s in live.values()),
            )
        )
    return out


def test_snapshot_matches_python_replay(spark):
    from pyspark_postgres_loader_spark.operators.deltalog import (
        delta_snapshot_stats,
    )

    rows = [tuple(r) for r in delta_snapshot_stats(spark, 25).collect()]
    assert rows == _py_replay(25)


def test_log_lines_are_valid_delta_ndjson(spark):
    """Every synthesized line is one JSON object holding exactly one
    Delta action; adds carry stats, removes do not (per protocol)."""
    from pyspark_postgres_loader_spark.operators.deltalog import (
        delta_log_lines,
    )

    lines = delta_log_lines(spark, 6).collect()
    kinds = {"add": 0, "remove": 0, "protocol": 0, "metaData": 0,
             "commitInfo": 0}
    for r in lines:
        obj = json.loads(r.line)
        assert len(obj) == 1, r.line
        kind = next(iter(obj))
        kinds[kind] += 1
        if kind == "add":
            assert set(obj["add"]) == {"path", "size", "numRecords",
                                       "dataChange"}
        if kind == "remove":
            assert "numRecords" not in obj["remove"]
    assert kinds == {"add": 3 + 2 * 5, "remove": 4, "protocol": 1,
                     "metaData": 1, "commitInfo": 6}


def test_live_set_never_negative_and_monotone_files(spark):
    from pyspark_postgres_loader_spark.operators.deltalog import (
        delta_snapshot_stats,
    )

    rows = delta_snapshot_stats(spark, 40).collect()
    assert all(r.live_files > 0 and r.live_rows > 0 for r in rows)
    # net +1 file per version after v0 (2 adds, 1 remove)
    for a, b in zip(rows[2:], rows[3:]):
        assert b.live_files - a.live_files == 1


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "delta_log_snapshot_stats"
    )
