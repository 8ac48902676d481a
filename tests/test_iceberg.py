"""Iceberg manifest-tree walk: nested/optional Avro decode vectors,
a pure-Python snapshot replay (third engine), the five verdict
classes, and the oracle compare."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.operators.avrowalk import walk_avro
from pyspark_postgres_loader_spark.operators.iceberg import (
    _IC_GROUPS,
    _ic_entry,
    _ic_n_entries,
    _ic_n_manifests,
    _ic_payloads,
    walk_iceberg_snapshot,
)


def test_nested_and_optional_avro_decode():
    """The r12 avrowalk extensions this walk rides on: nested records
    flatten with dotted names; ["null", X] unions decode both
    branches in either branch order."""
    mlist, store = _ic_payloads(0)
    man = walk_avro(next(iter(store.values())))
    assert man["fields"] == [
        "status", "snapshot_id", "data_file.file_path",
        "data_file.record_count", "data_file.file_size_in_bytes",
        "data_file.partition_val",
    ]
    # e=2 has a null partition, e=0 does not (lattice rule e%3==2)
    recs = man["records"]
    assert recs[2][5] is None and recs[0][5] == 0
    assert recs[0][2].startswith("data/")


def test_snapshot_matches_python_replay():
    for g in range(_IC_GROUPS):
        doc = g
        while any((doc % 11 == 3, doc % 17 == 2, doc % 13 == 5,
                   doc % 19 == 7)):
            doc += _IC_GROUPS
        got = walk_iceberg_snapshot(*_ic_payloads(doc))
        want = {"n_manifests": 0, "n_entries": 0, "live_files": 0,
                "deleted_files": 0, "live_rows": 0, "live_bytes": 0,
                "null_partitions": 0}
        for m in range(_ic_n_manifests(g)):
            want["n_manifests"] += 1
            for e in range(_ic_n_entries(g, m)):
                st, rc, fs, pv = _ic_entry(g, m, e)
                want["n_entries"] += 1
                if st == 2:
                    want["deleted_files"] += 1
                else:
                    want["live_files"] += 1
                    want["live_rows"] += rc
                    want["live_bytes"] += fs
                if pv is None:
                    want["null_partitions"] += 1
        assert got == want, g


def test_all_five_verdicts_fire():
    def status_of(doc):
        try:
            walk_iceberg_snapshot(*_ic_payloads(doc))
            return "decoded"
        except NotImplementedError:
            return "unsupported"
        except ValueError as e:
            m = str(e)
            if "missing manifest" in m:
                return "missing"
            if "sync marker mismatch" in m:
                return "mismatch"
            return "corrupt"

    seen = set()
    for doc in range(200):
        expect = ("corrupt" if doc % 11 == 3
                  else "mismatch" if doc % 17 == 2
                  else "unsupported" if doc % 13 == 5
                  else "missing" if doc % 19 == 7 else "decoded")
        assert status_of(doc) == expect, doc
        seen.add(expect)
    assert seen == {"decoded", "corrupt", "mismatch", "unsupported",
                    "missing"}


def test_store_isolation():
    """Corruption of one manifest must not leak into other groups'
    cached stores (payloads are rebuilt per call)."""
    mlist, store = _ic_payloads(3)  # corrupt class
    with pytest.raises(ValueError):
        walk_iceberg_snapshot(mlist, store)
    # same fixture group (27 % 8 == 3 % 8), no bad class
    ok = walk_iceberg_snapshot(*_ic_payloads(27))
    assert ok["n_manifests"] > 0


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "iceberg_manifest_snapshot"
    )
