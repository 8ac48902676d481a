"""End-to-end composition of the round-6 surfaces: tail an append-only
JSONL log (sources/filetail.py) → parse with from_json → foreachBatch
latest-per-key compaction → keyed upsert through the %s-dialect sink
(multirow VALUES fast path) into the fake-Postgres DBAPI — the
reference's whole mission (keyed idempotent Postgres load,
psycopg2_database_helper.py:287-357) fed by a live log file, with
exactly-once resume across fresh query objects on one checkpoint."""

from __future__ import annotations

import functools
import json
import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_postgres_loader_spark.sinks.sql_builder import POSTGRES
from pyspark_postgres_loader_spark.sinks.upsert import upsert_dataframe
from pyspark_postgres_loader_spark.sources.filetail import FileTailDataSource

from tests import fake_pg

_SCHEMA = "k bigint, v string, seq bigint"


def _append(path: str, records: list[dict]) -> None:
    with open(path, "a") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
        f.flush()
        os.fsync(f.fileno())


def _drain_into_db(spark, log_path: str, ckpt: str, db_path: str) -> None:
    factory = functools.partial(fake_pg.connect, db_path)

    def load_batch(batch_df, batch_id: int) -> None:
        parsed = batch_df.select(
            F.from_json("line", _SCHEMA).alias("r"), "pos"
        ).select("r.k", "r.v", "r.seq")
        # latest-per-key within the batch; later batches overwrite via
        # the upsert's ON CONFLICT path
        w = Window.partitionBy("k").orderBy(F.desc("seq"))
        latest = (
            parsed.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("k", "v", "seq")
        )
        stats = upsert_dataframe(
            latest, factory, "kv", ["k"], parallelism=1, dialect=POSTGRES
        )
        assert stats.rows_rejected == 0, stats.error_messages[:3]

    spark.dataSource.register(FileTailDataSource)
    q = (
        spark.readStream.format("file_tail")
        .option("path", log_path)
        .option("n_partitions", 2)
        .load()
        .writeStream.foreachBatch(load_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:  # pragma: no cover - hang guard
        q.stop()
        raise AssertionError("log-to-db drain did not finish")


def test_tail_jsonl_log_into_keyed_upsert_exactly_once(spark, tmp_path):
    log = str(tmp_path / "app.jsonl")
    ckpt = str(tmp_path / "ckpt")
    db = str(tmp_path / "kv.db")

    conn = fake_pg.connect(db)
    conn.cursor().execute("CREATE TABLE kv (k INTEGER PRIMARY KEY, v TEXT, seq INTEGER)")
    conn.commit()

    _append(log, [{"k": i % 5, "v": f"v{i}", "seq": i} for i in range(20)])
    _drain_into_db(spark, log, ckpt, db)
    state = dict(
        (r[0], (r[1], r[2]))
        for r in conn.cursor()._cur.execute("SELECT k, v, seq FROM kv")
    )
    # latest seq per key 0..4 from seq 0..19: 15..19
    assert state == {i % 5: (f"v{15 + i}", 15 + i) for i in range(5)}

    # append updates + one new key; fresh query object, same checkpoint:
    # only the delta is read (file_tail offsets are restart-invariant)
    _append(log, [{"k": 2, "v": "updated", "seq": 100}, {"k": 9, "v": "new", "seq": 101}])
    _drain_into_db(spark, log, ckpt, db)
    state = dict(
        (r[0], (r[1], r[2]))
        for r in conn.cursor()._cur.execute("SELECT k, v, seq FROM kv")
    )
    assert state[2] == ("updated", 100)
    assert state[9] == ("new", 101)
    assert len(state) == 6
    # the %s dialect's multirow fast path actually carried the load:
    # every INSERT that hit the kv table was a single multi-row (or
    # single-row for the 1-row batch) VALUES statement
    inserts = [s for s in fake_pg.executed_sql(db) if s.startswith("INSERT INTO kv")]
    assert inserts and all("%s" in s for s in inserts)
    conn.close()


def test_file_tail_into_manifest_sink_both_custom_ends(spark, tmp_path):
    """Both ends of the Spark 4 Python DataSource API in ONE stream:
    the file-tail SOURCE (restart-invariant external-state offsets)
    feeding the manifest_jsonl two-phase-commit SINK (staged parts,
    atomic per-batch manifest). Two drains on one checkpoint: the
    second publishes only the delta batch, and every line lands in
    exactly one committed batch directory."""
    import glob

    from pyspark_postgres_loader_spark.sources.pydatasource import (
        ManifestJsonlSinkDataSource,
    )

    log = str(tmp_path / "app.log")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    with open(log, "w") as f:
        f.write("".join(f"l{i}\n" for i in range(30)))

    spark.dataSource.register(FileTailDataSource)
    spark.dataSource.register(ManifestJsonlSinkDataSource)

    def drain():
        q = (
            spark.readStream.format("file_tail")
            .option("path", log)
            .option("n_partitions", 2)
            .option("min_split_bytes", 1)
            .load()
            .writeStream.format("manifest_jsonl")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        assert not q.isActive

    drain()
    with open(log, "a") as f:
        f.write("".join(f"l{i}\n" for i in range(30, 45)))
    drain()

    manifests = sorted(glob.glob(os.path.join(out, "_MANIFEST-*.json")))
    assert len(manifests) == 2
    total, lines = 0, []
    for m in manifests:
        man = json.load(open(m))
        total += man["total_rows"]
        bdir = os.path.join(out, f"batch-{man['batch_id']}")
        for name in man["files"]:
            with open(os.path.join(bdir, name)) as f:
                lines.extend(json.loads(ln)["line"] for ln in f)
    assert total == 45
    assert sorted(lines) == sorted(f"l{i}" for i in range(45))
    assert not os.path.exists(os.path.join(out, "_staging"))


def test_compaction_collapses_batches_then_appends_continue(spark, tmp_path):
    """Small-file housekeeping on the manifest sink: compaction rolls
    the per-micro-batch output into one snapshot (published via
    _COMPACTION.json BEFORE any deletion), a re-run with no new
    batches is a no-op, and later stream batches append normally and
    compact into the next generation."""
    import glob

    from pyspark_postgres_loader_spark.sources.pydatasource import (
        ManifestJsonlSinkDataSource,
        compact_manifest_batches,
    )

    log = str(tmp_path / "app.log")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.dataSource.register(FileTailDataSource)
    spark.dataSource.register(ManifestJsonlSinkDataSource)

    def drain():
        q = (
            spark.readStream.format("file_tail")
            .option("path", log)
            .option("n_partitions", 2)
            .option("min_split_bytes", 1)
            .load()
            .writeStream.format("manifest_jsonl")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        assert not q.isActive

    def append(lo, hi):
        with open(log, "a") as f:
            f.write("".join(f"l{i}\n" for i in range(lo, hi)))

    append(0, 10)
    drain()
    append(10, 25)
    drain()
    assert len(glob.glob(os.path.join(out, "_MANIFEST-*.json"))) == 2

    r = compact_manifest_batches(spark, out)
    assert (r["compacted_batches"], r["rows"], r["noop"]) == (2, 25, False)
    # batch dirs + their manifests gone, snapshot + compaction record in
    assert glob.glob(os.path.join(out, "batch-*")) == []
    assert glob.glob(os.path.join(out, "_MANIFEST-*.json")) == []
    comp = json.load(open(os.path.join(out, "_COMPACTION.json")))
    assert comp["batch_ids"] == [0, 1] and comp["generation"] == 0

    def snapshot_lines():
        """The DOCUMENTED reader protocol: read exactly the ONE snapshot
        _COMPACTION.json names — never a glob over compacted-*."""
        comp = json.load(open(os.path.join(out, "_COMPACTION.json")))
        gen_dir = os.path.join(out, comp["snapshot"])
        man = json.load(open(os.path.join(gen_dir, "_MANIFEST.json")))
        lines = []
        for name in man["files"]:
            with open(os.path.join(gen_dir, name)) as f:
                lines.extend(json.loads(ln)["line"] for ln in f)
        return lines

    assert sorted(snapshot_lines()) == sorted(f"l{i}" for i in range(25))

    # idempotent no-op
    r2 = compact_manifest_batches(spark, out)
    assert r2["noop"] is True

    # stream keeps appending; the next compaction FOLDS the previous
    # generation in, so the single live snapshot holds everything and
    # the superseded generation-0 dir is deleted
    append(25, 30)
    drain()
    assert len(glob.glob(os.path.join(out, "_MANIFEST-*.json"))) == 1
    r3 = compact_manifest_batches(spark, out)
    assert (r3["compacted_batches"], r3["new_rows"], r3["rows"], r3["generation"]) \
        == (1, 5, 30, 1)
    assert sorted(snapshot_lines()) == sorted(f"l{i}" for i in range(30))
    assert glob.glob(os.path.join(out, "compacted-*")) == [
        os.path.join(out, "compacted-1")
    ]

    # crash between publish (step 3) and deletion (step 4): resurrect a
    # covered batch dir + a stale snapshot; the next call sweeps both
    # and stays a no-op — readers never saw duplicates either way
    stale = os.path.join(out, "compacted-0")
    os.makedirs(stale)
    with open(os.path.join(stale, "_MANIFEST.json"), "w") as f:
        json.dump({"files": [], "total_rows": 0}, f)
    ghost_dir = os.path.join(out, "batch-0")
    os.makedirs(ghost_dir)
    with open(os.path.join(out, "_MANIFEST-00000.json"), "w") as f:
        json.dump({"batch_id": 0, "files": [], "total_rows": 0}, f)
    r4 = compact_manifest_batches(spark, out)
    assert r4["noop"] is True and r4["rows"] == 30
    assert not os.path.exists(stale)
    assert not os.path.exists(ghost_dir)
    assert sorted(snapshot_lines()) == sorted(f"l{i}" for i in range(30))
