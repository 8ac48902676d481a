"""Checkpoint-recovery proof: a file stream killed between micro-batches
resumes from its checkpoint — already-processed input is not reprocessed
and the final result equals exactly-once output."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from pyspark_postgres_loader_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_stream_resumes_from_checkpoint_without_reprocessing(spark):
    work = tempfile.mkdtemp(prefix="recov_")
    src, ckpt, sink = f"{work}/src", f"{work}/ckpt", f"{work}/sink"
    try:
        ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
        total = ev.count()
        # two source files → two micro-batches at maxFilesPerTrigger=1
        ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/a")
        ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/b")

        def start():
            return (
                spark.readStream.schema("event_id long, user_id long, value double")
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{src}/*")
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="100 milliseconds")
                .start()
            )

        q = start()
        # wait for the FIRST batch to commit, then kill the query
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            done = [b for b in (q.recentProgress or []) if b["numInputRows"] > 0]
            if done:
                break
            time.sleep(0.2)
        q.stop()
        q.awaitTermination()
        n_before = spark.read.parquet(sink).count()
        assert 0 < n_before <= total

        # restart from the same checkpoint: must finish the remainder,
        # never duplicating batch 1
        q2 = start()
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.read.parquet(sink).count() >= total:
                break
            time.sleep(0.2)
        q2.stop()
        q2.awaitTermination()

        out = spark.read.parquet(sink)
        assert out.count() == total  # nothing lost, nothing duplicated
        assert out.select("event_id").distinct().count() == total
    finally:
        shutil.rmtree(work, ignore_errors=True)
