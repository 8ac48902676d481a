"""Custom Python DataSource tests: partitioned generation, determinism
across partition layouts, option handling."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.sources.pydatasource import (
    SyntheticEventsDataSource,
    _SyntheticEventsReader,
)


def _read(spark, **opts):
    spark.dataSource.register(SyntheticEventsDataSource)
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_partition_count_and_row_split(spark):
    df = _read(spark, n_rows=1000, n_partitions=7)
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 1000
    # no duplicate or missing ids across partitions
    assert df.select("event_id").distinct().count() == 1000


def test_content_invariant_under_partition_layout(spark):
    """Rows are a pure function of the row index — re-partitioning the
    GENERATOR (not the data) must not change the dataset. This is the
    property that lets the source scale out: n_partitions is a pure
    parallelism knob."""
    a = {tuple(r) for r in _read(spark, n_rows=500, n_partitions=1).collect()}
    b = {tuple(r) for r in _read(spark, n_rows=500, n_partitions=13).collect()}
    assert a == b
    assert len(a) == 500


def test_user_cardinality_option(spark):
    df = _read(spark, n_rows=2000, n_partitions=4, n_users=7)
    assert df.selectExpr("max(user_id)").first()[0] <= 6
    assert df.selectExpr("count(distinct user_id)").first()[0] == 7


def test_empty_and_invalid_options(spark):
    assert _read(spark, n_rows=0).count() == 0
    with pytest.raises(ValueError):
        _SyntheticEventsReader({"n_rows": "10", "n_partitions": "0"})


def test_stream_reader_exactly_once_across_kill(spark, tmp_path):
    """Streaming read of the custom source: offsets advance one batch
    per poll, the query is killed mid-stream, and the resumed run must
    land EXACTLY the batch dataset in the sink — offset checkpointing
    plus pure-function-of-index generation give exactly-once without
    any source-side dedup state."""
    import time

    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    n_rows = 3000

    spark.dataSource.register(SyntheticEventsDataSource)

    def start():
        return (
            spark.readStream.format("synthetic_events")
            .option("n_rows", n_rows)
            .option("n_partitions", 3)
            .option("batch_rows", 500)
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

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(b["numInputRows"] > 0 for b in (q.recentProgress or [])):
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()

    # resume until drained; a run that errors or stalls (observed under
    # full-suite load: a resumed query occasionally makes no progress)
    # is killed and resumed again — every extra kill/resume cycle is
    # itself part of the exactly-once claim being tested
    for _attempt in range(6):
        q2 = start()
        deadline = time.time() + 120
        while time.time() < deadline:
            if q2.exception() is not None:
                break
            if sink_count() >= n_rows:
                break
            time.sleep(0.3)
        exc = q2.exception()
        status, progress = q2.status, q2.lastProgress
        q2.stop()
        q2.awaitTermination()
        if sink_count() >= n_rows:
            break
        print(
            f"resume attempt {_attempt}: count={sink_count()} exc={exc} "
            f"status={status} lastProgress={progress}"
        )

    got = {tuple(r) for r in spark.read.parquet(sink).collect()}
    expected = {tuple(r) for r in _read(spark, n_rows=n_rows, n_partitions=3).collect()}
    assert len(got) == n_rows
    assert got == expected
