"""Property test for the CBOR walk: a recursive generator emits
random nested documents while tracking the expected fact lattice at
CONSTRUCTION time (counts per major type, integer sum, string byte
totals, max depth) — the decoder must agree on every document. The
generator exercises all head widths (values straddling the 23 / 255 /
65535 / 2^32 boundaries), definite and indefinite containers, tags
and simple values."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_postgres_loader_spark.operators.cborwalk import (
    _enc_head,
    _enc_int,
    walk_cbor,
)


class _Facts:
    def __init__(self):
        self.counts = [0] * 8
        self.int_sum = 0
        self.text_bytes = 0
        self.bstr_bytes = 0
        self.max_depth = 0


_INTS = st.one_of(
    st.integers(-30, 30),
    st.integers(-300, 300),
    st.integers(-70000, 70000),
    st.integers(-(2**40), 2**40),
    st.integers(-(2**64), 2**64 - 1),  # full CBOR integer range
)


def _emit(rng, facts: _Facts, depth: int, budget: list[int]) -> bytes:
    facts.max_depth = max(facts.max_depth, depth)
    budget[0] -= 1
    kind = rng.draw(st.integers(0, 7 if depth < 4 and budget[0] > 0 else 3))
    if kind == 0:  # integer
        v = rng.draw(_INTS)
        facts.counts[0 if v >= 0 else 1] += 1
        facts.int_sum += v
        return _enc_int(v)
    if kind == 1:  # text string
        n = rng.draw(st.integers(0, 40))
        facts.counts[3] += 1
        facts.text_bytes += n
        return _enc_head(3, n) + b"t" * n
    if kind == 2:  # byte string
        n = rng.draw(st.integers(0, 40))
        facts.counts[2] += 1
        facts.bstr_bytes += n
        return _enc_head(2, n) + b"\x7f" * n
    if kind == 3:  # simple value (true)
        facts.counts[7] += 1
        return b"\xf5"
    if kind == 4:  # definite array
        n = rng.draw(st.integers(0, 4))
        facts.counts[4] += 1
        return _enc_head(4, n) + b"".join(
            _emit(rng, facts, depth + 1, budget) for _ in range(n))
    if kind == 5:  # indefinite array
        n = rng.draw(st.integers(0, 3))
        facts.counts[4] += 1
        return (b"\x9f" + b"".join(
            _emit(rng, facts, depth + 1, budget) for _ in range(n))
            + b"\xff")
    if kind == 6:  # map with DISTINCT integer keys (stays valid)
        n = rng.draw(st.integers(0, 3))
        facts.counts[5] += 1
        out = _enc_head(5, n)
        for k in range(n):
            facts.counts[0] += 1
            facts.int_sum += k
            out += _enc_int(k) + _emit(rng, facts, depth + 1, budget)
        return out
    # tag
    facts.counts[6] += 1
    return _enc_head(6, rng.draw(st.integers(0, 300))) + _emit(
        rng, facts, depth + 1, budget)


@given(st.data())
@settings(max_examples=120, deadline=None)
def test_random_documents_fact_lattice(data):
    facts = _Facts()
    blob = _emit(data, facts, 0, [40])
    f = walk_cbor(blob)
    assert f["status"] == "decoded"
    assert f["counts"] == facts.counts
    assert f["int_sum"] == facts.int_sum
    assert f["text_bytes"] == facts.text_bytes
    assert f["bstr_bytes"] == facts.bstr_bytes
    assert f["max_depth"] == facts.max_depth
    assert f["n_items"] == sum(facts.counts)


@given(st.integers(0, 2**64 - 1))
@settings(max_examples=80, deadline=None)
def test_head_width_boundaries_uint(v):
    """The encoder picks the canonical smallest width; the decoder
    must return the same integer across every boundary."""
    f = walk_cbor(_enc_int(v))
    assert f["int_sum"] == v


@given(st.integers(-(2**64), -1))
@settings(max_examples=80, deadline=None)
def test_negative_offset_encoding(v):
    f = walk_cbor(_enc_int(v))
    assert f["int_sum"] == v
