"""File-tail Python DataSource: stream an append-only log file.

Round-5's synthetic stream reader proved the offset contract
(``latestOffset`` must be a restart-invariant pure function — of the
wall clock there); this source applies the same law to REAL external
state: the offset is the file's byte length, newline-aligned. A killed
and restarted query recomputes availability from the file itself, so
committed ranges can never be re-planned under new batch ids (the
round-5 duplicate-commit bug class is structurally impossible here).

Semantics — ``tail -f`` as a Spark stream:

- ``latestOffset`` = byte offset just past the file's LAST newline
  (a partial trailing line is not yet available; it becomes available
  when its newline lands — no torn records, ever);
- each micro-batch covers the byte range [start, end) and splits into
  ``n_partitions`` ranges read independently on executors, using the
  classic text-split rule (a reader at a non-aligned split start seeks
  one byte back and discards the line containing that byte — its owner
  is the previous split; a line that BEGINS inside a split is consumed
  fully even if it crosses the split end). Batch boundaries are always
  newline-aligned, split boundaries never need to be;
- rows are ``(pos bigint, line string)`` — the byte offset is a stable
  per-record identity for downstream dedup/ordering; parsing (JSON,
  CSV, regex) composes on top in DataFrame land where it belongs;
- bytes decode UTF-8 with replacement, so binary junk in the log can
  never kill the stage.

Scale notes: availability probing is one ``stat`` plus a bounded
backward scan for the last newline (one 64 KiB block in the common
case); NO data is read on the driver. Reading is executor-side and
linear in the byte range, like a parquet scan. At 100 TB of logs you
run one query per file/shard and union the streams, or point the
directory-file variant of this pattern at an object-store listing —
the per-file offset law is unchanged.

Known limit (documented, not hidden): in-place truncation (logrotate's
``copytruncate``) regresses the offset, which no checkpointed source
can reconcile without data loss; rotate by rename+recreate and start a
fresh query on the new inode, as every offset-tracking tailer
(Kafka Connect, Filebeat, Fluent Bit) requires.

Reference: extends the source-plugin registry idea
(get_s3_data_as_df.py:1, SURVEY.md §2a S4) to streaming ingestion —
the reference has no streaming surface at all.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_SCHEMA = "pos bigint, line string"
_SCAN_BLOCK = 65536


class _ByteRange(InputPartition):
    def __init__(self, start: int, end: int, hard_start: bool):
        self.start = start
        self.end = end
        # True only for the range that begins at the batch's (always
        # newline-aligned) start offset: it reads from its first byte;
        # all others apply the seek-back-one-byte split rule.
        self.hard_start = hard_start


def aligned_end(path: str) -> int:
    """Byte offset just past the last newline in ``path`` (0 if the
    file is missing, empty, or has no newline yet). Pure function of
    file content — this IS the stream's availability."""
    try:
        size = os.path.getsize(path)
    except OSError:
        return 0
    with open(path, "rb") as f:
        pos = size
        while pos > 0:
            step = min(_SCAN_BLOCK, pos)
            f.seek(pos - step)
            idx = f.read(step).rfind(b"\n")
            if idx >= 0:
                return pos - step + idx + 1
            pos -= step
    return 0


def _split_ranges(start: int, end: int, n: int) -> list[_ByteRange]:
    if end <= start:
        return [_ByteRange(start, start, True)]
    step = -(-(end - start) // max(1, n))
    return [
        _ByteRange(lo, min(lo + step, end), lo == start)
        for lo in range(start, end, step)
    ]


def _read_range(path: str, part: _ByteRange) -> Iterator[tuple[int, str]]:
    if part.end <= part.start:
        return
    with open(path, "rb") as f:
        if part.hard_start:
            f.seek(part.start)
        else:
            # split rule: the line containing byte (start-1) belongs to
            # the previous split — consume and discard its remainder.
            # If that byte is '\n', readline() returns just it and we
            # correctly begin at `start`, which is a line boundary.
            f.seek(part.start - 1)
            f.readline()
        pos = f.tell()
        # a line that BEGINS before `end` is consumed fully (it may
        # extend past `end`; its bytes were available — batch ends are
        # newline-aligned — only the SPLIT boundary cut it)
        while pos < part.end:
            raw = f.readline()
            if not raw:
                break
            yield pos, raw.rstrip(b"\r\n").decode("utf-8", errors="replace")
            pos = f.tell()


class FileTailDataSource(DataSource):
    """``spark.read[Stream].format("file_tail")`` — options:

    - ``path`` (required): the append-only file to read/tail
    - ``n_partitions`` (default 4): byte-range splits per batch/scan
    """

    @classmethod
    def name(cls) -> str:
        return "file_tail"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "_FileTailBatchReader":
        return _FileTailBatchReader(self.options)

    def streamReader(self, schema) -> "_FileTailStreamReader":
        return _FileTailStreamReader(self.options)


class _Opts:
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("file_tail requires a 'path' option")
        self.n_partitions = int(options.get("n_partitions", 4))
        if self.n_partitions < 1:
            raise ValueError("n_partitions must be >= 1")


class _FileTailBatchReader(DataSourceReader):
    """One-shot read of everything currently available (the stream's
    [0, aligned_end) range) — same split rule, same row identity."""

    def __init__(self, options):
        self._o = _Opts(options)

    def partitions(self):
        return _split_ranges(0, aligned_end(self._o.path), self._o.n_partitions)

    def read(self, partition: _ByteRange) -> Iterator[tuple]:
        yield from _read_range(self._o.path, partition)


class _FileTailStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self._o = _Opts(options)

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        return {"pos": aligned_end(self._o.path)}

    def partitions(self, start: dict, end: dict):
        return _split_ranges(
            int(start["pos"]), int(end["pos"]), self._o.n_partitions
        )

    def read(self, partition: _ByteRange) -> Iterator[tuple]:
        yield from _read_range(self._o.path, partition)

    def commit(self, end: dict) -> None:
        pass
