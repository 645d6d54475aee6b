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

from pyspark.sql import functions as F

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


def test_fuzzy_join_carries_no_strings_through_candidate_shuffle(spark, sf_dir):
    """Candidate generation must shuffle only (vk, id); names rejoin by
    broadcast afterward. A CartesianProduct or names in the exchange
    would be the quadratic/payload regression."""
    plan = _plan(all_queries()["fuzzy_join_names"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # the two name rejoins
    # no shuffle exchange may carry the name payload column
    for m in re.findall(r"Exchange hashpartitioning\([^\n]*", plan):
        assert "c_name" not in m, m


def test_grouping_sets_single_expand_single_shuffle(spark, sf_dir):
    """Three grains must come from ONE pass: one Expand, one shuffle,
    dims broadcast."""
    plan = _plan(all_queries()["grouping_sets_revenue"](spark, sf_dir))
    assert plan.count("Expand") == 1
    assert _shuffles(plan) <= 1
    assert plan.count("BroadcastHashJoin") == 2


def test_snapshot_diff_copartitioned_full_outer(spark, sf_dir):
    """CDC diff: one full-outer join co-partitioned on the key — two
    input shuffles at most, no nested-loop fallback."""
    plan = _plan(all_queries()["snapshot_diff"](spark, sf_dir))
    assert "FullOuter" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert _shuffles(plan) <= 2


def test_events_anomaly_windows_after_aggregation(spark, sf_dir):
    """The trailing window must run over the (type, hour) aggregate,
    not raw events: exactly one pre-window aggregate pair and no
    single-partition global sort."""
    plan = _plan(all_queries()["events_anomaly"](spark, sf_dir))
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan and "HashAggregate" in plan


def test_dq_violations_row_rules_fold_into_one_scan_pass(spark, sf_dir):
    """Four row-local rules + unique + ref must cost three orders scans
    (one-pass flags, groupBy, anti join) — adding a row rule must not
    add a scan."""
    plan = _plan(all_queries()["dq_violations"](spark, sf_dir))
    assert len(re.findall(r"FileScan parquet|Scan parquet", plan)) <= 4


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """Runtime bloom-filter join pruning (the non-partition-column
    analog of dynamic partition pruning, enabled in session.py): a
    selective filter on one join side must inject a
    BloomFilterMightContain probe into the other side's scan, so at
    scale most fact rows die before the shuffle.  Thresholds are
    lowered test-locally because the feature gates on multi-GB scan
    sizes that sf0.001 cannot reach."""
    from beehive_spark.queries import load

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "64MB",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load(spark, sf_dir, "lineitem")
        o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
        joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).agg(
            F.sum("l_quantity").alias("q")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "bloomfilter" in plan.lower() or "might_contain" in plan.lower(), plan
        assert joined.first()["q"] is not None
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_loop_body_plans_bounded_and_cartesian_free(spark, sf_dir):
    """Loop-family queries execute eagerly, so their scale invariants
    live in the PER-ROUND checkpointed frames, not the returned plan.
    Capture them with scripts/audit_plans.audit_iterative (the PLANS.md
    generator) and pin: no cartesian product anywhere, and a SMALL
    bound on shuffles per loop-body frame — growth there means lineage
    re-execution, the 100x-at-scale regression class."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "audit_plans_mod",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "audit_plans.py"),
    )
    ap = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ap)
    qs = all_queries()
    # loose upper bounds (AQE on/off and SF shift exact counts by 1-2);
    # the regression class this catches is a loop body whose shuffle
    # count grows with the data or round number, i.e. >> these bounds
    bounds = {
        "pagerank_planted": 7,
        "bom_cost_rollup": 6,
        "graph_kcore_planted": 7,
        "tree_shortest_paths": 7,
    }
    for name, max_shuf in bounds.items():
        a = ap.audit_iterative(spark, lambda name=name: qs[name](spark, sf_dir))
        assert a["captured_frames"] > 0, name
        assert a["cartesian"] == 0, (name, a)
        assert a["max_shuffles_per_frame"] <= max_shuf, (name, a)


def test_one_pass_moment_and_fold_queries_single_shuffle(spark, sf_dir):
    """The round-8 single-pass shapes must stay single-pass: the
    correlation matrix moves one combinable 15-number state (one
    exchange, no join), and both per-user folds shuffle once on the
    key.  A second exchange here means the sufficient-statistics /
    keys-in-parallel shape regressed."""
    qs = all_queries()
    for name in ("feature_correlations", "events_cusum_changepoint",
                 "events_rolling_median"):
        plan = _plan(qs[name](spark, sf_dir))
        assert _shuffles(plan) <= 1, (name, plan)
        assert "Join" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_decision_stump_prices_all_splits_from_bin_table(spark, sf_dir):
    """Histogram split finding: one scan-side histogram exchange plus
    the bin-table window exchange — never a per-threshold re-scan or
    self-join of the fact table."""
    plan = _plan(all_queries()["decision_stump_gini"](spark, sf_dir))
    assert len(re.findall(r"Scan parquet|FileScan parquet", plan)) == 1
    assert _shuffles(plan) <= 2, plan
    assert "Join" not in plan


def test_pareto_abc_two_level_scan_no_global_customer_window(spark, sf_dir):
    """The cumulative share must run as the two-level Blelloch scan:
    the customer frame only ever crosses bucket-partitioned
    exchanges; SinglePartition appears solely for the <= 257-row
    bucket-offset window and 1-row totals, and the per-customer
    running sum window is partitioned by bkt."""
    plan = _plan(all_queries()["orders_pareto_abc"](spark, sf_dir))
    assert "hashpartitioning(bkt" in plan, plan
    # tolerate the tiny frames' single-partition exchanges, bound them
    assert plan.count("Exchange SinglePartition") <= 3, plan
    assert "CartesianProduct" not in plan


def test_r9_feature_prep_plans(spark, sf_dir):
    """Round-9 shapes: LOO target encoding broadcasts the category
    stats (the fact never reshuffles); int8 quantization broadcasts
    the dimension calibration table; the windowed funnel and
    Adamic-Adar never degenerate to cartesians."""
    qs = all_queries()
    plan = _plan(qs["feature_target_encoding"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    plan = _plan(qs["embedding_quantize_int8"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # the 64-row per-dim stats
    assert "CartesianProduct" not in plan
    # one shuffle for the dim stats agg, one for the vec-keyed sum;
    # AQE may add bookkeeping reads but never more exchanges
    assert _shuffles(plan) <= 3

    for name in ("events_funnel_windowed", "link_prediction_adamic_adar",
                 "sequence_mining_triples", "text_ngram_novelty"):
        plan = _plan(qs[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_r10_analytics_plans(spark, sf_dir):
    """Round-10 shapes: attribution is ONE user-window pass plus a
    global aggregate (no purchase-x-path join — the naive MTA shape
    would show a join between two event scans); CUPED and calibration
    broadcast their 1-row moment/total frames; zipf's spectrum math
    runs on a driver-bounded top-K (the vocab count is the only wide
    shuffle); KM and NDCG never degenerate to cartesians over the
    fact table (their tiny 1-row x 1-row combines legitimately use a
    broadcast nested-loop — what must NOT appear is a cartesian or a
    fact-sized nested loop, approximated here by requiring every
    BroadcastNestedLoopJoin input to sit above a bounded aggregate)."""
    qs = all_queries()

    plan = _plan(qs["attribution_linear_multitouch"](spark, sf_dir))
    assert "RunningWindowFunction" in plan or "Window" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # user window + the 1-row global agg (+ AQE bookkeeping at most)
    assert _shuffles(plan) <= 3

    for name in ("conversion_cuped", "model_calibration_ece"):
        plan = _plan(qs[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" not in plan, name

    plan = _plan(qs["text_zipf_slope"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-K, not a global sort

    for name in ("survival_kaplan_meier", "retrieval_ndcg"):
        plan = _plan(qs[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" not in plan, name


def test_quantile_normalize_no_feature_partition_window(spark, sf_dir):
    """The r10 verdict's one scale-killer: NTILE over
    Window.partitionBy(feature) hash-distributes by a 3-value key, so
    one task sorts a third of the fact table at ANY scale.  The r11
    two-pass banded-selection rewrite must keep every fact-table pass
    a combinable aggregation: the returned plan may window only over
    the 300-row moment frame (a LocalTableScan), never carry an ntile,
    and never range-sort the exploded fact rows."""
    plan = _plan(all_queries()["feature_quantile_normalize"](spark, sf_dir))
    assert "ntile" not in plan.lower()
    # the only window partitions the bucket key of the local moment frame
    assert "hashpartitioning(feature" not in plan
    assert "rangepartitioning" not in plan
    # moments arrive driver-computed (createDataFrame), no FileScan
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan
    assert "FileScan" not in plan


def test_r11_sketch_plans(spark, sf_dir):
    """Round-11 sketch/uncertainty shapes.  Bootstrap: ONE fact scan,
    the 64-fold explode fused with the partial aggregate (a Generate
    feeding the r-keyed exchange — never an exchange of exploded raw
    rows), and only the r-agg plus the 64-row window's SinglePartition
    may shuffle.  Count-Min: the heavy pick is TakeOrderedAndProject
    (per-partition top-K, no global sort), the probe joins broadcast,
    and the persisted (key, count) aggregate means one fact scan
    feeds both branches.  AUC: one scan, the prefix-sum window runs
    over the per-score aggregate only."""
    qs = all_queries()

    plan = _plan(qs["poisson_bootstrap_ci"](spark, sf_dir))
    assert plan.count("FileScan") == 1
    assert "Generate explode" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # base repartition + r-agg exchange + the 64-row window's
    # SinglePartition
    assert _shuffles(plan) <= 3

    plan = _plan(qs["countmin_heavy_keys"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # heavy pick, no global sort
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # probe-vs-sketch join
    # persisted counts: the fact scan appears once; the second branch
    # reads InMemoryTableScan
    assert plan.count("FileScan") <= 1 or "InMemoryTableScan" in plan

    plan = _plan(qs["roc_auc_eval"](spark, sf_dir))
    assert plan.count("FileScan") == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # per-score agg exchange + the bounded window's SinglePartition
    assert _shuffles(plan) <= 2
