"""Physical-plan shape regression tests: the oracle gate proves results
right; these prove the PLANS stay right (pushdown reaching the scan,
dims broadcast, single-shuffle as-of, top-k as TakeOrdered). A change
that silently degrades any of these would still pass correctness."""

from __future__ import annotations

from pyspark_postgres_loader_spark.registry import QUERIES, _ensure_loaded

SF_DIR = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    _ensure_loaded()
    return QUERIES[name].fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def test_q1_scan_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "q1_pricing_summary")
    scan = plan.split("FileScan parquet", 1)[1]
    assert "l_shipdate" in scan.split("PushedFilters:", 1)[1].split("]", 1)[0]
    read = scan.split("ReadSchema:", 1)[1].splitlines()[0]
    # 7 of 11 lineitem columns; the partkey/suppkey/orderkey/linenumber
    # columns must not be read
    for absent in ("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"):
        assert absent not in read, read


def test_q5_joins_broadcast_every_dimension(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_asof_join_is_single_shuffle(spark):
    plan = _plan(spark, "join_asof_latest_order")
    # union + window: exactly one hash-partitioning exchange (on the key),
    # and NO join operator at all
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "NestedLoop"):
        assert j not in plan


def test_topk_is_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "topk_orders_by_price")
    assert "TakeOrderedAndProject" in plan


def test_nondet_keep_pins_similarity_filter_above_projection(spark):
    """Pin planctl.nondet_keep (the ``x + 0.0*rand(seed)`` taint): the
    ``sim >= t`` filter must stay ABOVE the projection that computes the
    expensive similarity, never folded into a join condition where
    Catalyst would re-evaluate the expression per candidate pair with
    no subexpression elimination (measured 24s -> 0.9s at sf0.1). If a
    future Spark constant-folds ``0.0 * rand()``, the taint vanishes
    and this fails loudly instead of silently restoring the slow plan.
    """
    cases = {
        # query -> (filter output column, expensive expression token)
        "dedup_ngram_jaccard": ("jaccard#", "array_intersect"),
        "dedup_embedding_cosine": ("cosine#", "aggregate("),
    }
    for name, (filter_col, expensive) in cases.items():
        plan = _plan(spark, name)
        # the taint survived optimization
        assert "rand(" in plan, f"{name}: nondet taint constant-folded away"
        # the threshold filter references the projected column by name
        filter_lines = [
            ln for ln in plan.splitlines() if "Filter" in ln and filter_col in ln
        ]
        assert filter_lines, f"{name}: no Filter over the projected {filter_col} column"
        # no join condition evaluates the expensive expression
        join_lines = [ln for ln in plan.splitlines() if "Join" in ln]
        assert join_lines, f"{name}: expected candidate joins in the plan"
        for ln in join_lines:
            assert expensive not in ln, f"{name}: {expensive} folded into a join:\n{ln}"
    # jaccard's array_intersect must appear exactly once in the whole
    # plan (once per candidate row, in the projection)
    assert _plan(spark, "dedup_ngram_jaccard").count("array_intersect") == 1


def test_word_count_has_partial_aggregation(spark):
    plan = _plan(spark, "text_word_count_topk")
    # map-side combine before the token shuffle
    assert "partial_count" in plan or "HashAggregate" in plan.split("Exchange", 1)[0]


def test_pii_and_chunking_are_shuffle_free_projections(spark):
    for name in ("text_pii_redact", "text_chunk_windows"):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, f"{name} grew a shuffle"
        for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
            assert j not in plan, f"{name} grew a join"


def test_contamination_broadcasts_benchmark_grams(spark):
    plan = _plan(spark, "contamination_ngram_overlap")
    # the held-out split's gram set and the per-doc hit set are both
    # broadcast — the exploded corpus side must never shuffle-join
    assert any(
        "BroadcastHashJoin" in l and "LeftSemi" in l for l in plan.splitlines()
    ), plan[:1500]
    assert "SortMergeJoin" not in plan


def test_packing_scans_once_and_keeps_offsets_window_tiny(spark):
    plan = _plan(spark, "pack_token_budget_bins")
    # the windowed slim projection is cached: BOTH consumers (offsets
    # aggregate + final join) read InMemoryTableScan, so the parquet
    # scan and the range shuffle run once (FileScan strings inside the
    # InMemoryRelation description are prints, not executions)
    assert plan.count("InMemoryTableScan") == 2, plan[:1500]
    # final bin distribution joins offsets by broadcast, not shuffle
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_hyperplane_lsh_has_no_cartesian(spark):
    plan = _plan(spark, "dedup_hyperplane_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
