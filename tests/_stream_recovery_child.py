"""Subprocess payload for the stream-recovery exactly-once test.

Runs the kill/resume scenario in a FRESH JVM + SparkSession so the
check is isolated from the shared session-scoped test SparkSession.
Under the full suite that shared session accumulates listener backlog
and competing jobs, and a resumed streaming query occasionally made no
progress inside the deadline — two rounds of in-place hardening
(retries, wider deadlines) still flaked. Process isolation removes the
contention instead of out-waiting it.

Exit code 0 = exactly-once held; 1 = mismatch / stall (details on
stdout for the parent test to surface).

Usage: python _stream_recovery_child.py <workdir>
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


def main(workdir: str) -> int:
    from pyspark.sql import SparkSession

    from pyspark_postgres_loader_spark.sources.pydatasource import (
        SyntheticEventsDataSource,
    )

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("stream-recovery-child")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        ckpt, sink = f"{workdir}/ckpt", f"{workdir}/sink"
        n_rows = 3000
        spark.dataSource.register(SyntheticEventsDataSource)
        # absolute epoch → availability is restart-invariant (see the
        # reader docstring for why an instance cursor commits dupes)
        t0 = time.time()

        def start():
            return (
                spark.readStream.format("synthetic_events")
                .option("n_rows", n_rows)
                .option("n_partitions", 3)
                .option("rate_rows_per_sec", 400)
                .option("start_epoch", t0)
                .load()
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="100 milliseconds")
                .start()
            )

        def sink_count() -> int:
            try:
                return spark.read.parquet(sink).count()
            except Exception:
                return 0

        # first run: wait for at least one batch to land, then kill
        q = start()
        deadline = time.time() + 180
        while time.time() < deadline:
            if any(b["numInputRows"] > 0 for b in (q.recentProgress or [])):
                break
            time.sleep(0.2)
        _stop_quietly(q)

        # resume until drained. Per-attempt the loop watches for
        # PROGRESS, not just completion: a query that stalls (no sink
        # growth for 30s) is killed and recreated rather than waiting
        # out a long fixed deadline — every extra kill/resume cycle is
        # itself part of the exactly-once claim being tested.
        for _attempt in range(10):
            q2 = start()
            last_n, last_move = sink_count(), time.time()
            deadline = time.time() + 120
            while time.time() < deadline:
                if q2.exception() is not None:
                    break
                n = sink_count()
                if n >= n_rows:
                    break
                if n > last_n:
                    last_n, last_move = n, time.time()
                elif time.time() - last_move > 30:
                    break  # stalled: recreate the query
                time.sleep(0.3)
            exc = q2.exception()
            _stop_quietly(q2)
            if sink_count() >= n_rows:
                break
            lp = q2.lastProgress
            lp_info = (
                {"batchId": lp.get("batchId"), "numInputRows": lp.get("numInputRows")}
                if lp
                else None
            )
            print(
                f"resume attempt {_attempt}: count={sink_count()} exc={exc} "
                f"lastProgress={lp_info}",
                flush=True,
            )

        got = {tuple(r) for r in spark.read.parquet(sink).collect()}
        batch = (
            spark.read.format("synthetic_events")
            .option("n_rows", n_rows)
            .option("n_partitions", 3)
            .load()
        )
        expected = {tuple(r) for r in batch.collect()}
        if len(got) != n_rows:
            print(f"FAIL: sink has {len(got)} distinct rows, want {n_rows}")
            return 1
        if got != expected:
            print(
                f"FAIL: sink content differs from batch dataset "
                f"(only-in-sink={len(got - expected)}, "
                f"missing={len(expected - got)})"
            )
            return 1
        print("OK: exactly-once held across kill/resume")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
