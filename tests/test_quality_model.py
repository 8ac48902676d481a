"""Integer-GD logistic quality classifier: pure-Python reference
replay, learning non-vacuity, division-semantics pin, and the oracle
compares."""

from __future__ import annotations

import math

import duckdb
import pytest

from pyspark_postgres_loader_spark.operators.quality_model import (
    _KEEP_MILLI,
    _LR_MILLI,
    _NFEAT,
    _ROUNDS,
    _SIG,
    train_quality_weights,
)

SF = "/root/testdata/sf0.001"


def _python_reference(sf_dir: str):
    """The WHOLE algorithm re-implemented in plain Python over DuckDB
    feature extraction — a third engine agreeing with Spark and the
    SQL oracle."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    rows = con.execute(r"""
      WITH t AS (SELECT doc_id,
                        regexp_split_to_array(lower(text), '\s+') AS w,
                        length(text) AS nc FROM documents)
      SELECT doc_id,
        CAST(floor(1000.0 * len(list_filter(w, x -> x IN
          ('the','a','of','and','in','to'))) / len(w)) AS BIGINT),
        CAST(least(1000, floor(100.0 * nc / len(w))) AS BIGINT),
        CAST(floor(1000.0 * len(list_distinct(w)) / len(w)) AS BIGINT),
        CAST(least(1000, floor(nc / 2.0)) AS BIGINT),
        CAST(floor(1000.0 * len(list_filter(w, x -> length(x) <= 3))
          / len(w)) AS BIGINT)
      FROM t ORDER BY doc_id""").fetchall()
    s = [
        2 * r[1] + r[3] + r[4] - r[2] - r[5]
        + ((r[0] * 37) % 101 - 50) * 4
        for r in rows
    ]
    thr = math.floor(sum(s) / len(s))
    y = [1000 if v > thr else 0 for v in s]
    X = [[1000, r[1], r[2], r[3], r[4], r[5]] for r in rows]
    n = len(X)

    def prob(w, xi):
        z = sum(a * b for a, b in zip(w, xi))
        b = max(-17, min(16, math.floor(z / 250_000_000.0)))
        return _SIG[b + 17]

    w = [0] * _NFEAT
    for _ in range(_ROUNDS):
        g = [0] * _NFEAT
        for xi, yi in zip(X, y):
            r = prob(w, xi) - yi
            for j in range(_NFEAT):
                g[j] += r * xi[j]
        w = [
            wj - math.floor(_LR_MILLI * gj / (1000.0 * n))
            for wj, gj in zip(w, g)
        ]
    return w, X, y, prob


def test_spark_weights_match_python_reference(spark):
    ref_w, _X, _y, _p = _python_reference(SF)
    got = {
        r.j: r.w for r in train_quality_weights(spark, SF).collect()
    }
    assert [got[j] for j in range(_NFEAT)] == ref_w


def test_training_learns_and_filter_is_nonvacuous(spark):
    """The classifier must beat label-agnostic baselines and the
    filter must keep a real subset: accuracy above both majority
    class and coin flip by margin, kept fraction strictly interior.
    Thresholds leave room for per-round fixture regeneration."""
    import __spark_entry__ as E

    rows = E.queries()["quality_classifier_filter"](spark, SF).collect()
    n = len(rows)
    assert n > 0
    acc = sum((r.score_milli >= _KEEP_MILLI) == (r.label_milli == 1000)
              for r in rows) / n
    kept = sum(r.kept for r in rows) / n
    pos = sum(r.label_milli == 1000 for r in rows) / n
    assert acc >= 0.58, f"classifier failed to learn: acc={acc:.3f}"
    assert acc > max(pos, 1 - pos) + 0.03, (
        f"no better than majority: acc={acc:.3f} pos={pos:.3f}"
    )
    assert 0.03 < kept < 0.97, f"degenerate filter: kept={kept:.3f}"


def test_weights_move_and_are_bounded(spark):
    w = {r.j: r.w for r in train_quality_weights(spark, SF).collect()}
    assert any(v != 0 for v in w.values()), "GD never moved"
    # magnitudes stay far inside the 2^53-safe envelope the module
    # docstring's exactness argument needs (|z_nano| <= 6e9)
    assert all(abs(v) <= 1_000_000 for v in w.values()), w


def test_division_semantics_gotcha_is_real():
    """Documents why every division is floor(double/double): DuckDB's
    integer // and % truncate toward zero, Python's floor — on the
    negative gradients GD produces, the idioms disagree."""
    con = duckdb.connect()
    trunc_div, trunc_mod = con.execute("SELECT -7 // 2, -7 % 5").fetchone()
    assert (trunc_div, trunc_mod) == (-3, -2)       # DuckDB truncates
    assert (-7 // 2, -7 % 5) == (-4, 3)             # Python floors
    floor_div = con.execute(
        "SELECT CAST(floor(-7 / 2.0) AS BIGINT)"
    ).fetchone()[0]
    assert floor_div == -4 == math.floor(-7 / 2.0)  # floor() agrees


def test_sigmoid_table_shape():
    assert len(_SIG) == 34
    assert all(0 < v < 1000 for v in _SIG)
    assert list(_SIG) == sorted(_SIG), "sigmoid must be monotone"
    # symmetric activation: SIG(b) + SIG(-1-b) == 1000 (centers are
    # symmetric about z=0)
    for b in range(-17, 17):
        assert _SIG[b + 17] + _SIG[(-1 - b) + 17] == 1000


@pytest.mark.parametrize(
    "name", ["quality_classifier_train", "quality_classifier_filter"]
)
def test_query_matches_oracle(spark, name):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, SF, name)


def test_eval_holdout_discipline(spark):
    """The eval weights are trained on the 80% split only: they must
    DIFFER from the full-corpus weights (the holdout actually changes
    the gradients), and the metrics row must be internally consistent
    (tp+fp+tn+fn == n_eval, n_train+n_eval == corpus)."""
    from pyspark_postgres_loader_spark.operators.quality_model import (
        _eval_pred,
        _train_quality_weights_raw,
    )

    full = {r.j: r.w for r in
            _train_quality_weights_raw(spark, SF).collect()}
    split = {r.j: r.w for r in
             _train_quality_weights_raw(spark, SF, ~_eval_pred()).collect()}
    assert full != split, "holdout did not change the gradients"

    import __spark_entry__ as E

    row = E.queries()["quality_classifier_eval"](spark, SF).collect()[0]
    assert row.tp + row.fp + row.tn + row.fn == row.n_eval
    total = E.queries()["quality_classifier_filter"](spark, SF).count()
    assert row.n_train + row.n_eval == total
    assert 0 <= row.acc_milli <= 1000
    assert row.acc_milli >= 520, "holdout accuracy at coin-flip level"


def test_eval_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, SF, "quality_classifier_eval")
