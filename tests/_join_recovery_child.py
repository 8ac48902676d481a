"""Subprocess payload for the stream-stream join kill/resume test.

Same rationale as _stream_recovery_child.py: the scenario needs a
streaming query to make progress inside a deadline, and the shared
session-scoped test SparkSession competes with the rest of the suite —
under full-suite load the resumed query occasionally stalled past the
deadline (r5: `[inner]` flaked in one full run, `[left_outer]` in
another, each passing in isolation — the failure follows load, not the
join mode). A fresh JVM removes the contention instead of out-waiting
it.

Exit code 0 = recovered output equals single-run availableNow output;
1 = divergence / stall (details on stdout).

Usage: python _join_recovery_child.py <workdir> <inner|left_outer|full_outer>
"""

from __future__ import annotations

import sys
import time




def _stop_quietly(q) -> None:
    """Stop a streaming query, tolerating the kill landing mid-batch:
    the interrupt can surface as STREAM_FAILED (InterruptedException)
    from stop()/awaitTermination(). For a deliberately killed run that
    failure is the expected outcome, not an error — recovery from the
    checkpoint is what the test asserts."""
    try:
        q.stop()
    except Exception:
        pass
    try:
        q.awaitTermination()
    except Exception:
        pass


def main(workdir: str, how: str) -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pyspark_postgres_loader_spark.streaming.windows import (
        _run_to_memory,
        attribution_join,
    )
    from pyspark_postgres_loader_spark.tables import load_table

    spark = (
        SparkSession.builder.master("local[4]")
        .appName(f"join-recovery-child-{how}")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.001"
    delay = "2 hours" if how == "inner" else "0 seconds"
    src, ckpt, sink = f"{workdir}/src", f"{workdir}/ckpt", f"{workdir}/sink"
    try:
        ev = load_table(spark, sf_dir, "events")
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
        lo, hi = ev.select(
            F.expr("percentile(unix_micros(cast(ts as timestamp)), 0.33)"),
            F.expr("percentile(unix_micros(cast(ts as timestamp)), 0.66)"),
        ).first()
        ev.filter(ts_us <= lo).coalesce(1).write.parquet(f"{src}/a")
        ev.filter((ts_us > lo) & (ts_us <= hi)).coalesce(1).write.parquet(f"{src}/b")
        ev.filter(ts_us > hi).coalesce(1).write.parquet(f"{src}/c")
        # Pin part-file mtimes: the file source orders micro-batches by
        # modification time, and three back-to-back writes can land on
        # the SAME mtime tick under load — an order flip (newest first)
        # makes every earlier file LATE under the join watermark and
        # silently drops its pairs, diverging from the single-run
        # expected set. Batch order must be a pinned input, not a
        # timing accident.
        import glob as _glob
        import os as _os

        for i, d in enumerate(("a", "b", "c")):
            for part in _glob.glob(f"{src}/{d}/part-*.parquet"):
                t = 1_000_000_000 + i * 100
                _os.utime(part, (t, t))

        schema = (
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )

        def start():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{src}/*")
            )
            return (
                attribution_join(stream, how, delay)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(processingTime="100 milliseconds")
                .start()
            )

        batch_ev = spark.readStream.schema(schema).parquet(f"{src}/*")
        expected = {
            tuple(r)
            for r in _run_to_memory(
                attribution_join(batch_ev, how, delay), "append"
            ).collect()
        }
        if not expected:
            print(f"{how}: fixture produced no joined rows")
            return 1

        # run 1: wait for the first committed batch, then kill.
        # Deadlines here are a last-resort envelope, not the fix — the
        # fresh JVM is; but a saturated machine (full suite + other
        # JVMs) can still starve this child, and a passing run clears
        # these in seconds either way.
        q = start()
        deadline = time.time() + 240
        while time.time() < deadline:
            if any(b["numInputRows"] > 0 for b in (q.recentProgress or [])):
                break
            time.sleep(0.2)
        _stop_quietly(q)

        # run 2: resume from the checkpoint, poll until converged;
        # a resumed query that itself dies (exception) is recreated —
        # every extra kill/resume cycle strengthens the claim
        got: set = set()
        for _attempt in range(4):
            q2 = start()
            deadline = time.time() + 180
            while time.time() < deadline:
                try:
                    got = {tuple(r) for r in spark.read.parquet(sink).collect()}
                except Exception:
                    got = set()
                if got == expected or q2.exception() is not None:
                    break
                time.sleep(0.5)
            exc = q2.exception()
            _stop_quietly(q2)
            if got == expected:
                break
            print(f"{how}: resume attempt {_attempt} n={len(got)} exc={exc}",
                  flush=True)

        if got != expected:
            print(
                f"{how}: recovered output diverges: "
                f"missing={len(expected - got)} extra={len(got - expected)}"
            )
            return 1
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
