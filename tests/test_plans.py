"""Physical-plan regression guards: the plans we designed for must stay
the plans Catalyst picks (broadcast for small dims, filter/column pushdown
into parquet scans, partial aggregation, no accidental cartesian products).
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name):
    from sparkdedup.queries import QUERIES

    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_top_revenue_orders_plan(spark):
    plan = _plan(spark, "top_revenue_orders")
    assert "BroadcastHashJoin" in plan          # dim joins broadcast
    assert "TakeOrderedAndProject" in plan      # top-k, no global sort
    assert "partial_sum" in plan                # map-side combine
    assert "PushedFilters" in plan or "DataFilters" in plan
    assert "CartesianProduct" not in plan


def test_pricing_summary_scan_pruned(spark):
    plan = _plan(spark, "pricing_summary")
    # only the referenced columns reach the scan
    scan_line = [ln for ln in plan.splitlines() if "FileScan parquet" in ln][0]
    assert "l_comment" not in scan_line
    assert "ReadSchema" in scan_line or "l_quantity" in scan_line
    assert "partial_sum" in plan


def test_candidate_pairs_no_cartesian(spark):
    from sparkdedup.config import DedupConfig
    from sparkdedup.operators.lsh import candidate_pairs
    from sparkdedup.operators.signatures import signature_stage

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    files = docs.selectExpr("'r' as repo", "cast(doc_id as string) as path",
                            "'0' as commit", "lang", "text as content")
    sigs = signature_stage(files, DedupConfig())
    plan = candidate_pairs(sigs, DedupConfig())._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_brute_broadcasts_queries(spark):
    plan = _plan(spark, "ann_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_verify_joins_are_hash_joins(spark):
    """Pair-signature joins must be hash/sort-merge equi-joins."""
    from sparkdedup.config import DedupConfig
    from sparkdedup.operators.lsh import candidate_pairs
    from sparkdedup.operators.signatures import signature_stage
    from sparkdedup.operators.verify import verify_candidates

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    files = docs.selectExpr("'r' as repo", "cast(doc_id as string) as path",
                            "'0' as commit", "lang", "text as content")
    sigs = signature_stage(files, DedupConfig())
    edges = verify_candidates(candidate_pairs(sigs, DedupConfig()), sigs,
                              DedupConfig())
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)
    assert "CartesianProduct" not in plan


def test_range_join_uses_equi_key(spark):
    """The range join must plan as an equi-join on user_id with a range
    residual, never a cartesian/BNL over all pairs."""
    plan = _plan(spark, "range_join_activity")
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)
