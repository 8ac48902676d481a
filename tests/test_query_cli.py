"""Smoke tests for the analytics query CLI (list mode runs without a
SparkSession; unknown names error cleanly)."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.query_cli import main


def test_list_mode(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out
    # every registered query carries a DuckDB oracle (round 2 closed
    # the last rows-only gaps: sampling, rolling hash, heavy hitters,
    # stream dedup, minhash/simhash/ivf/sketches)
    assert "[oracle]" in out and "[rows-only]" not in out


def test_unknown_query_errors():
    with pytest.raises(SystemExit) as exc:
        main(["no_such_query"])
    assert exc.value.code == 2
