"""File-tail DataSource: batch + streaming reads of a real append-only
file, split-boundary exactness, partial-line availability, and
restart-invariant resume (the round-5 offset law applied to external
state — see sources/filetail.py)."""

from __future__ import annotations

import os
import time

from pyspark_postgres_loader_spark.sources.filetail import (
    FileTailDataSource,
    aligned_end,
)


def _write(path, data: bytes, append: bool = False):
    with open(path, "ab" if append else "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())


def _register(spark):
    spark.dataSource.register(FileTailDataSource)


def test_aligned_end_is_pure_function_of_file(tmp_path):
    p = str(tmp_path / "log.txt")
    assert aligned_end(p) == 0  # missing file
    _write(p, b"")
    assert aligned_end(p) == 0  # empty
    _write(p, b"partial-no-newline")
    assert aligned_end(p) == 0  # no complete line yet
    _write(p, b"\nsecond\ntail", append=True)
    # available = through the newline after "second"
    assert aligned_end(p) == len(b"partial-no-newline\nsecond\n")
    # a fresh "reader instance" (plain recall) sees the same value —
    # restart-invariance is free because there is no instance state
    assert aligned_end(p) == aligned_end(p)


def test_batch_read_matches_lines_with_offsets(spark, tmp_path):
    p = str(tmp_path / "log.txt")
    lines = [f"line-{i}-{'x' * (i % 7)}" for i in range(50)]
    _write(p, ("\n".join(lines) + "\n").encode())
    _register(spark)
    rows = (
        spark.read.format("file_tail")
        .option("path", p)
        .option("n_partitions", 4)
        .option("min_split_bytes", 1)
        .load()
        .collect()
    )
    assert [r.line for r in sorted(rows, key=lambda r: r.pos)] == lines
    # offsets are the true byte positions of each line start
    expected_pos, acc = [], 0
    for ln in lines:
        expected_pos.append(acc)
        acc += len(ln) + 1
    assert sorted(r.pos for r in rows) == expected_pos


def test_split_boundaries_yield_each_line_exactly_once(spark, tmp_path):
    """More partitions than lines forces split points mid-line in both
    directions (splits inside a line's body and exactly on boundaries);
    the seek-back rule must yield every line exactly once."""
    p = str(tmp_path / "log.txt")
    lines = ["a", "bb" * 40, "c", "dddd" * 25, "e", "f" * 3]
    _write(p, ("\n".join(lines) + "\n").encode())
    _register(spark)
    for n_parts in (1, 2, 3, 7, 32):
        rows = (
            spark.read.format("file_tail")
            .option("path", p)
            .option("n_partitions", n_parts)
            .option("min_split_bytes", 1)
            .load()
            .collect()
        )
        assert sorted(r.line for r in rows) == sorted(lines), n_parts


def test_partial_trailing_line_held_back_then_released(spark, tmp_path):
    p = str(tmp_path / "log.txt")
    _write(p, b"full-1\nfull-2\ntorn")
    _register(spark)
    read = lambda: sorted(  # noqa: E731
        r.line
        for r in spark.read.format("file_tail").option("path", p).load().collect()
    )
    assert read() == ["full-1", "full-2"]  # torn record not visible
    _write(p, b"-now-complete\n", append=True)
    assert read() == ["full-1", "full-2", "torn-now-complete"]


def test_binary_junk_decodes_without_killing_the_read(spark, tmp_path):
    p = str(tmp_path / "log.txt")
    _write(p, b"ok\n\xff\xfe broken utf8 \x80\nalso-ok\n")
    _register(spark)
    rows = spark.read.format("file_tail").option("path", p).load().collect()
    lines = sorted(r.line for r in rows)
    assert "ok" in lines and "also-ok" in lines and len(lines) == 3


def _drain_available(spark, path: str, sink: str, ckpt: str) -> None:
    q = (
        spark.readStream.format("file_tail")
        .option("path", path)
        .option("n_partitions", 3)
        .option("min_split_bytes", 1)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    if q.isActive:  # pragma: no cover - hang guard
        q.stop()
        raise AssertionError("file_tail availableNow drain did not finish")


def test_stream_resumes_from_checkpoint_exactly_once(spark, tmp_path):
    """Append → drain → append → drain with a FRESH query object on the
    same checkpoint: the second drain must deliver only the delta (no
    duplicates, no loss) because availability is recomputed from the
    file, never from reader instance state."""
    p = str(tmp_path / "log.txt")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    _write(p, b"".join(f"r{i}\n".encode() for i in range(20)))
    _register(spark)

    _drain_available(spark, p, sink, ckpt)
    got1 = sorted(r.line for r in spark.read.parquet(sink).collect())
    assert got1 == sorted(f"r{i}" for i in range(20))

    _write(p, b"".join(f"r{i}\n".encode() for i in range(20, 35)), append=True)
    time.sleep(0.05)
    _drain_available(spark, p, sink, ckpt)
    rows = spark.read.parquet(sink).collect()
    assert sorted(r.line for r in rows) == sorted(f"r{i}" for i in range(35))
    # byte-offset identity: every record delivered exactly once
    assert len({r.pos for r in rows}) == len(rows) == 35


def test_named_source_registry_resolves_file_tail(spark, tmp_path):
    """The reference-parity source registry (sources/__init__.py S4)
    resolves 'file_tail' like any other named reader."""
    from pyspark_postgres_loader_spark.sources import get_source_dataframe

    p = str(tmp_path / "log.txt")
    _write(p, b"x\ny\n")
    df = get_source_dataframe(spark, "file_tail", p, n_partitions=2)
    assert sorted(r.line for r in df.collect()) == ["x", "y"]


def test_directory_mode_batch_with_glob(spark, tmp_path):
    d = str(tmp_path / "logs")
    os.makedirs(d)
    _write(os.path.join(d, "a.log"), b"a1\na2\n")
    _write(os.path.join(d, "b.log"), b"b1\n")
    _write(os.path.join(d, "skip.txt"), b"nope\n")
    _register(spark)
    rows = (
        spark.read.format("file_tail")
        .option("path", d)
        .option("glob", "*.log")
        .load()
        .collect()
    )
    got = sorted((r.file, r.line) for r in rows)
    assert got == [("a.log", "a1"), ("a.log", "a2"), ("b.log", "b1")]


def test_directory_stream_new_files_growth_and_rotation(spark, tmp_path):
    """Directory tail across four drains on one checkpoint: initial
    content, growth of one file plus a brand-new file, rename+recreate
    rotation (new inode restarts at 0, the rotated-away name stops
    matching the glob so nothing re-reads), and in-place truncation
    (same inode, smaller size → reset to 0, at-least-once for that
    file)."""
    d = str(tmp_path / "logs")
    os.makedirs(d)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    a, b, c = (os.path.join(d, n) for n in ("a.log", "b.log", "c.log"))
    _write(a, b"a1\n")
    _write(b, b"b1\n")
    _register(spark)

    def drain():
        q = (
            spark.readStream.format("file_tail")
            .option("path", d)
            .option("glob", "*.log")
            .option("n_partitions", 2)
            .option("min_split_bytes", 1)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        assert not q.isActive
        return sorted(
            (r.file, r.line) for r in spark.read.parquet(sink).collect()
        )

    assert drain() == [("a.log", "a1"), ("b.log", "b1")]

    # growth + a new file
    _write(a, b"a2\n", append=True)
    _write(c, b"c1\n")
    assert drain() == [
        ("a.log", "a1"),
        ("a.log", "a2"),
        ("b.log", "b1"),
        ("c.log", "c1"),
    ]

    # rename+recreate rotation of a.log: rotated name leaves the glob,
    # the recreated file has a NEW inode and reads from byte 0 only
    os.rename(a, a + ".1")
    _write(a, b"a3\n")
    got = drain()
    assert got.count(("a.log", "a1")) == 1  # not re-read
    assert ("a.log", "a3") in got
    assert len(got) == 5

    # copytruncate on b.log: same inode, size regressed -> reset to 0
    with open(b, "wb") as f:
        f.write(b"b2-after-truncate\n")
        f.flush()
        os.fsync(f.fileno())
    got = drain()
    assert ("b.log", "b2-after-truncate") in got
    assert len(got) == 6
