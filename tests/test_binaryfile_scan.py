"""binaryFile-source ingest: real files on disk, glob pruning, the
typed-verdict lattice through walk_parquet, plan shape, and the
oracle compare."""

from __future__ import annotations

import os

from pyspark_postgres_loader_spark.operators.binaryfile import (
    _BF_VARIANTS,
    _bf_blob,
    binaryfile_fixture_dir,
)
from pyspark_postgres_loader_spark.operators.parquetwalk import (
    _PQ_GROUPS,
    _pq_bytes,
    _pq_values,
    first_page_body_span,
    walk_parquet,
)
from pyspark_postgres_loader_spark.registry import all_queries


def test_fixture_dir_is_real_and_idempotent():
    d1 = binaryfile_fixture_dir()
    d2 = binaryfile_fixture_dir()
    assert d1 == d2
    names = sorted(os.listdir(d1))
    parquets = [n for n in names if n.endswith(".parquet")]
    assert len(parquets) == _PQ_GROUPS * len(_BF_VARIANTS)
    assert "ignored.txt" in names
    # bytes on disk are exactly the builder's bytes
    with open(os.path.join(d1, "g3_clean.parquet"), "rb") as f:
        assert f.read() == _bf_blob(3, "clean")


def test_variant_verdicts_match_walk():
    vals = _pq_values(4)
    f = walk_parquet(_bf_blob(4, "clean"))
    assert sum(f["values"]) == sum(vals)
    for variant, err in (("trunc", ValueError),
                        ("brotli", NotImplementedError)):
        try:
            walk_parquet(_bf_blob(4, variant))
            raise AssertionError(f"{variant} decoded")
        except err:
            pass
    try:
        walk_parquet(_bf_blob(4, "crcflip"))
        raise AssertionError("crcflip decoded")
    except ValueError as exc:
        assert "CRC" in str(exc)


def test_crcflip_byte_is_inside_first_page_body():
    """The fault injector locates the first page body by walking the
    thrift PageHeader (not a hardcoded offset): the flipped byte must
    differ from the clean blob at exactly one position, and that
    position must lie inside the located body span — so a pyarrow
    layout change can never silently move the flip into a header and
    turn 'crc_error' into 'corrupt' (round-13 advisory)."""
    for g in range(_PQ_GROUPS):
        clean = _pq_bytes(g)
        flipped = _bf_blob(g, "crcflip")
        assert len(clean) == len(flipped)
        diffs = [i for i, (a, b) in enumerate(zip(clean, flipped))
                 if a != b]
        s, e = first_page_body_span(clean)
        assert len(diffs) == 1
        assert s <= diffs[0] < e
        assert s >= 4 and e <= len(clean) - 8


def test_scan_reads_files_not_synthesized_payloads(spark):
    """The query's rows come from the binaryFile source: the plan
    scans the scratch dir, the glob excludes the non-parquet file,
    and every fixture file yields exactly one row."""
    q = all_queries()["ingest_binaryfile_scan"]
    df = q(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "binaryFile" in plan or "BinaryFile" in plan
    rows = df.collect()
    assert len(rows) == _PQ_GROUPS * len(_BF_VARIANTS)
    assert not any(r["file_name"] == "ignored.txt" for r in rows)
    by_status = {}
    for r in rows:
        by_status.setdefault(r["status"], 0)
        by_status[r["status"]] += 1
    assert by_status == {
        "decoded": _PQ_GROUPS, "corrupt": _PQ_GROUPS,
        "unsupported": _PQ_GROUPS, "crc_error": _PQ_GROUPS,
    }


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "ingest_binaryfile_scan")


# ------------------------------------ mixed-format dispatch tests

def test_sniffer_identifies_all_formats():
    from pyspark_postgres_loader_spark.operators.avrowalk import (
        _av_record, build_avro_container,
    )
    from pyspark_postgres_loader_spark.operators.binaryfile import (
        sniff_format,
    )
    from pyspark_postgres_loader_spark.operators.orcwalk import build_orc

    assert sniff_format(_bf_blob(0, "clean")) == "parquet"
    sync = bytes(range(16))
    av = build_avro_container([_av_record(0, i) for i in range(10)],
                              "null", sync)
    assert sniff_format(av) == "avro"
    assert sniff_format(build_orc(0, "zlib")) == "orc"
    assert sniff_format(b"\x00\x01garbage") == "unknown"


def test_dispatch_rows_cover_every_format(spark):
    q = all_queries()["ingest_binaryfile_dispatch"]
    rows = q(spark, "/root/testdata/sf0.001").collect()
    by_fmt = {}
    for r in rows:
        by_fmt.setdefault((r["format"], r["status"]), 0)
        by_fmt[(r["format"], r["status"])] += 1
    assert by_fmt == {
        ("parquet", "decoded"): 6, ("avro", "decoded"): 6,
        ("orc", "decoded"): 6, ("unknown", "unrecognized"): 6,
    }
    assert all(r["n_records"] > 0 for r in rows
               if r["status"] == "decoded")


def test_dispatch_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "ingest_binaryfile_dispatch")
