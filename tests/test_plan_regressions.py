"""Physical-plan regression pins for the scale-critical queries.

PLANS.md documents the plans we WANT; this test makes the key
invariants executable so a silent plan regression (a dim that stops
broadcasting, a filter that stops reaching the scan, an extra
shuffle) fails CI instead of surfacing as a 100x slowdown at cluster
scale.  Invariants are pinned loosely (upper bounds / required
markers), not as exact plan strings — AQE and Spark upgrades may
legally reshape details.
"""

import re

from beehive_spark.queries import all_queries


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffles(plan):
    return len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan
        )
    )


def test_star_joins_broadcast_and_push_down(spark, sf_dir):
    """q5: all five dims broadcast (fact side never repartitions), every
    scan has pushed filters, exactly one shuffle (the final agg)."""
    plan = _plan(all_queries()["q5_local_supplier"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan
    assert plan.count("PushedFilters: [") - plan.count("PushedFilters: []") >= 5
    assert _shuffles(plan) <= 1


def test_q1_single_shuffle_partial_agg(spark, sf_dir):
    plan = _plan(all_queries()["q1_pricing_summary"](spark, sf_dir))
    assert _shuffles(plan) == 1
    assert "HashAggregate" in plan  # partial+final agg pair, not sort-agg


def test_scan_project_prunes_columns(spark, sf_dir):
    """The scan's output column list (FileScan [...]) must carry only
    the projected + filter columns, not all 16 lineitem columns.
    (ReadSchema is string-truncated in plan output, so parse the
    FileScan bracket list.)"""
    plan = _plan(all_queries()["scan_project"](spark, sf_dir))
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m, plan
    assert len(m.group(1).split(",")) <= 5


def test_dedup_ngram_no_cross_join(spark, sf_dir):
    """The inverted-index dedup must never degenerate to a cross join
    or nested-loop join over documents."""
    plan = _plan(all_queries()["dedup_ngram_jaccard"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_assign_ids_scalable_no_single_partition_window(spark, sf_dir):
    """The distributed id assignment must not sort all rows into one
    partition (the round-1 scale flag on contiguous mode)."""
    plan = _plan(all_queries()["assign_ids_scalable"](spark, sf_dir))
    assert "Exchange SinglePartition" not in plan
