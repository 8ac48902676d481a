"""Bigram-LM perplexity filter: quantized-log2 check vectors, the
integer ladder vs float log2 error envelope, filter non-vacuity, and
the oracle compares for both the train and filter queries."""

from __future__ import annotations

import math

import pytest

from pyspark_postgres_loader_spark.operators.perplexity import (
    _LOG2_MILLI,
    _MAX_NLL,
    _Q_BITS,
    _Q_ONE,
)


def _nll_py(c12: int, c1: int, nv: int) -> int:
    """Pure-Python replay of the integer surprise pipeline."""
    q = max(1, ((c12 + 1) * _Q_ONE) // (c1 + nv))
    bl = q.bit_length() - 1
    m = (q * 64) // (1 << bl)
    return _MAX_NLL - (1000 * bl + _LOG2_MILLI[m - 64])


def test_log2_milli_check_vectors():
    assert _LOG2_MILLI[0] == 0            # log2(1)
    assert _LOG2_MILLI[32] == 585         # log2(96/64) = 0.58496...
    assert _LOG2_MILLI[63] == 989         # log2(127/64) = 0.98869...
    assert len(_LOG2_MILLI) == 64
    assert list(_LOG2_MILLI) == sorted(_LOG2_MILLI)


def test_integer_ladder_tracks_float_log2():
    """Over a grid of (c12, c1, V), the integer milli-bit surprise
    tracks the float −log2 P within its two defined quantization
    steps: flooring p to q/2^20 only OVERESTIMATES surprise, by at
    most 1000·log2(1 + 1/q); the 6-bit mantissa table adds ±12
    milli-bits. Never a sign error, never an underestimate beyond
    the table step."""
    cases = [
        (0, 0, 10), (0, 100, 10), (1, 1, 5), (5, 50, 40),
        (99, 100, 40), (1000, 5000, 333), (1, 1000000, 50),
        (12345, 123456, 1000),
    ]
    for c12, c1, nv in cases:
        p = (c12 + 1) / (c1 + nv)
        true_nll = -1000.0 * math.log2(p)
        got = _nll_py(c12, c1, nv)
        q = max(1, ((c12 + 1) * _Q_ONE) // (c1 + nv))
        ceiling = 1000.0 * math.log2(1.0 + 1.0 / q) + 12
        assert -12 <= got - true_nll <= ceiling, (
            c12, c1, nv, got, true_nll)
        assert got >= 0


def test_surprise_is_monotone_in_count():
    """More observations of a bigram → strictly no more surprise."""
    prev = None
    for c12 in (0, 1, 2, 5, 10, 50, 99):
        nll = _nll_py(c12, 100, 20)
        if prev is not None:
            assert nll <= prev
        prev = nll


def test_q_saturates_at_min_probability():
    """A context far larger than 2^20 quantizes to q=1 → the max
    20000 milli-bit surprise, not a log-of-zero."""
    assert _nll_py(0, 10 ** 9, 10) == _MAX_NLL
    assert _Q_BITS * 1000 == _MAX_NLL


def test_filter_non_vacuous_and_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "corpus_bigram_lm_train"
    )
    compare_query(
        spark, "/root/testdata/sf0.001", "corpus_perplexity_filter"
    )
    from pyspark_postgres_loader_spark.registry import QUERIES

    rows = (
        QUERIES["corpus_perplexity_filter"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    keeps = sum(r.keep for r in rows)
    assert 0 < keeps < len(rows), "threshold must split the corpus"
    assert any(r.n_oov > 0 for r in rows), "OOV path must be exercised"
