"""Property-based tests for the file-tail primitives — pure-Python, no
Spark session: the text-split rule, newline alignment, directory-delta
decisions, and multirow SQL generation hold for ALL inputs, not just
the handful the e2e tests pick."""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_postgres_loader_spark.sinks.sql_builder import (
    ASYNCPG,
    DUCKDB,
    POSTGRES,
    SQLITE,
    build_upsert_sql,
)
from pyspark_postgres_loader_spark.sources.filetail import (
    _ByteRange,
    _dir_deltas,
    _read_range,
    _split_ranges,
    aligned_end,
)

# lines must be newline-free; keep them printable-ish including unicode
_line = st.text(
    alphabet=st.characters(blacklist_characters="\n\r", blacklist_categories=("Cs",)),
    min_size=0,
    max_size=30,
)


@given(st.lists(_line, min_size=0, max_size=40), st.integers(1, 16), st.booleans())
@settings(max_examples=120, deadline=None)
def test_split_read_yields_every_line_exactly_once(tmp_path_factory, lines, n, torn):
    """For ANY line content, ANY split count, with or without a torn
    trailing record: reading all split ranges of [0, aligned_end)
    reconstructs exactly the complete lines, in byte order, each with
    its true start offset."""
    d = tmp_path_factory.mktemp("ft")
    p = str(d / "f.log")
    data = "".join(ln + "\n" for ln in lines).encode()
    if torn:
        data += b"torn-partial"
    with open(p, "wb") as f:
        f.write(data)

    end = aligned_end(p)
    assert end == len(data) - (len(b"torn-partial") if torn else 0)

    got: list[tuple[int, str]] = []
    for part in _split_ranges(0, end, n, min_split=1):
        got.extend(_read_range(p, part))
    got.sort()

    expected, acc = [], 0
    for ln in lines:
        expected.append((acc, ln))
        acc += len((ln + "\n").encode())
    assert got == expected


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=150, deadline=None)
def test_aligned_end_invariants(tmp_path_factory, data):
    """aligned_end is the offset just past the LAST newline: everything
    before it ends in a newline, everything after contains none."""
    d = tmp_path_factory.mktemp("ft")
    p = str(d / "f.bin")
    with open(p, "wb") as f:
        f.write(data)
    end = aligned_end(p)
    assert 0 <= end <= len(data)
    assert b"\n" not in data[end:]
    if end > 0:
        assert data[end - 1 : end] == b"\n"


def _entry(ino: int, data: bytes) -> list[int]:
    import zlib

    sig_len = min(64, len(data))
    return [ino, sig_len, zlib.crc32(data[:sig_len]), len(data)]


def test_dir_delta_decision_matrix(tmp_path):
    """The four per-file decisions — grown / rotated (new inode) /
    rewritten-larger (same inode, prefix changed) / deleted — each
    produce the right byte range, driven through real files."""
    d = str(tmp_path)
    grown = b"old-content\n"
    with open(os.path.join(d, "grown.log"), "wb") as f:
        f.write(grown + b"delta\n")
    with open(os.path.join(d, "rotated.log"), "wb") as f:
        f.write(b"fresh-after-rotate\n")
    rewritten = b"X" * 20 + b"\n" + b"more-than-before-content\n"
    with open(os.path.join(d, "rewritten.log"), "wb") as f:
        f.write(rewritten)

    real_ino = os.stat(os.path.join(d, "rotated.log")).st_ino
    start = {
        "grown.log": _entry(os.stat(os.path.join(d, "grown.log")).st_ino, grown),
        "rotated.log": _entry(real_ino + 999, b"pre-rotation\n"),  # inode changed
        "rewritten.log": _entry(
            os.stat(os.path.join(d, "rewritten.log")).st_ino, b"old-prefix\n"
        ),  # same inode, different opening bytes, LARGER now
        "deleted.log": _entry(12345, b"gone\n"),
    }
    from pyspark_postgres_loader_spark.sources.filetail import dir_state

    end = dir_state(d, "*.log")
    parts = {
        os.path.basename(p.path): (p.start, p.end)
        for p in _dir_deltas(d, start, end, 1, min_split=1)
        if p.path is not None
    }
    assert parts["grown.log"] == (len(grown), len(grown + b"delta\n"))
    assert parts["rotated.log"] == (0, len(b"fresh-after-rotate\n"))
    assert parts["rewritten.log"] == (0, len(rewritten))  # size check alone
    # would have read from len(b"old-prefix\n") — the prefix crc caught it
    assert "deleted.log" not in parts


@given(
    st.integers(1, 6),
    st.integers(1, 5),
    st.sampled_from([POSTGRES, ASYNCPG, SQLITE, DUCKDB]),
)
@settings(max_examples=120, deadline=None)
def test_multirow_sql_placeholder_counts(n_cols, n_rows, dialect):
    """Multirow VALUES rendering: one group per row, placeholder count
    = n_cols * n_rows, and $n numbering strictly ascending across the
    whole statement."""
    import re

    cols = [f"c{i}" for i in range(n_cols)]
    sql = build_upsert_sql(cols, "t", [cols[0]], dialect=dialect, n_rows=n_rows)
    values = sql.split("VALUES", 1)[1].split(" ON CONFLICT", 1)[0]
    assert values.count("(") == values.count(")") == n_rows
    if dialect.placeholder == "$n":
        nums = [int(m) for m in re.findall(r"\$(\d+)", values)]
        assert nums == list(range(1, n_cols * n_rows + 1))
    else:
        assert values.count(dialect.placeholder) == n_cols * n_rows


# --- codec properties (GIF/PNG round-trip over random images) -------------

from tests.test_gif_decode import _make_gif  # noqa: E402
from tests.test_png_decode import _make_png  # noqa: E402


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    n_colors=st.integers(2, 32),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_gif_round_trip_any_image(h, w, n_colors, interlace, seed):
    import numpy as np

    from pyspark_postgres_loader_spark.operators.multimodal import (
        real_decode_image,
    )

    rng = np.random.RandomState(seed)
    palette = [tuple(int(x) for x in rng.randint(0, 256, 3)) for _ in range(n_colors)]
    idx = rng.randint(0, n_colors, (h, w)).astype(np.uint8)
    gw, gh, px = real_decode_image(_make_gif(palette, idx, interlace=interlace))
    assert (gw, gh) == (w, h)
    assert (px == np.array(palette, np.uint8)[idx]).all()


@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    color_type=st.sampled_from([0, 2, 4, 6]),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_round_trip_any_image(h, w, color_type, filters, interlace, seed):
    import numpy as np

    from pyspark_postgres_loader_spark.operators.multimodal import (
        real_decode_image,
    )

    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (h, w, channels)).astype(np.uint8)
    gw, gh, got = real_decode_image(
        _make_png(px, color_type, filters=filters, interlace=int(interlace))
    )
    assert (gw, gh) == (w, h)
    if color_type == 2:
        expected = px
    elif color_type == 6:
        expected = px[:, :, :3]
    else:
        expected = np.repeat(px[:, :, :1], 3, axis=2)
    assert (got == expected).all()
