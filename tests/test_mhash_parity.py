"""Cross-engine parity of mhash64 — the hash every oracle-checked
hash-blocked operator (MinHash, SimHash, rolling hash, hash-sampling)
stands on. Spark's conv(substr(md5,..),16,10) and DuckDB's 0x-cast must
agree bit-for-bit on arbitrary strings, including unicode, empties,
long strings, and hex-looking inputs."""

from __future__ import annotations

import duckdb

from pyspark_postgres_loader_spark.functions.deterministic import mhash64, sql_mhash64

CASES = [
    "",
    "a",
    "hello world",
    "UPPER lower MiXeD",
    "with|pipe|chars",
    "0xdeadbeef",
    "ffffffffffffffff",
    "line\nbreak\ttab",
    "ünïcødé ставка 様々な 🙂",
    "x" * 10_000,
    " leading and trailing ",
    "null\x01byte-ish",
] + [f"shingle {i} of the corpus" for i in range(50)]


def test_mhash64_cross_engine_parity(spark):
    sdf = spark.createDataFrame([(s,) for s in CASES], ["s"])
    spark_vals = [r[0] for r in sdf.select(mhash64("s")).collect()]

    con = duckdb.connect()
    duck_vals = [
        con.execute(f"SELECT {sql_mhash64('?')}".replace("?", "$1"), [s]).fetchone()[0]
        for s in CASES
    ]
    assert spark_vals == duck_vals
    # 60-bit non-negative contract
    assert all(0 <= v < (1 << 60) for v in spark_vals)
