"""Semantic invariants for the round-3 query batch.

The driver's differential gate proves Spark == DuckDB; these tests pin
properties that BOTH engines could get wrong together (conservation
laws, permutation/balance properties, score bounds) — the second,
independent line of defense."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from beehive_spark.queries import all_queries, load


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def test_gap_fill_densifies_and_conserves_counts(spark, sf_dir, qs):
    rows = qs["events_gap_fill"](spark, sf_dir).collect()
    e = load(spark, sf_dir, "events")
    # conservation: filled counts sum to the raw event count
    assert sum(r["n"] for r in rows) == e.count()
    # densification: the grid is |types| x |hours| with real zero holes
    types = {r["event_type"] for r in rows}
    hours = {r["hr"] for r in rows}
    assert len(rows) == len(types) * len(hours)
    assert any(r["n"] == 0 for r in rows)
    # ffill: carried_n equals n wherever n > 0
    assert all(r["carried_n"] == r["n"] for r in rows if r["n"] > 0)


def test_rfm_scores_bounded_and_recency_inverted(spark, sf_dir, qs):
    rows = qs["orders_rfm_segments"](spark, sf_dir).collect()
    assert all(
        1 <= r["r_score"] <= 5 and 1 <= r["f_score"] <= 5 and 1 <= r["m_score"] <= 5
        for r in rows
    )
    freshest = min(r["recency_days"] for r in rows)
    assert all(r["r_score"] == 5 for r in rows if r["recency_days"] == freshest)
    stalest = max(r["recency_days"] for r in rows)
    assert all(r["r_score"] == 1 for r in rows if r["recency_days"] == stalest)


def test_stddev_exact_matches_builtin_stddev(spark, sf_dir, qs):
    got = {
        r["o_orderpriority"]: (r["n"], r["mean_price"], r["stddev_price"])
        for r in qs["stddev_prices_exact"](spark, sf_dir).collect()
    }
    o = load(spark, sf_dir, "orders")
    want = {
        r["p"]: (r["n"], r["m"], r["sd"])
        for r in o.groupBy(F.col("o_orderpriority").alias("p"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("o_totalprice").alias("m"),
            F.stddev_samp("o_totalprice").alias("sd"),
        )
        .collect()
    }
    for k, (n, mean, sd) in got.items():
        wn, wm, wsd = want[k]
        assert n == wn
        assert abs(mean - wm) < 0.02
        assert abs(sd - wsd) < 0.02


def test_attribution_conserves_purchases(spark, sf_dir, qs):
    rows = qs["session_attribution"](spark, sf_dir).collect()
    e = load(spark, sf_dir, "events")
    n_purchases = e.filter(F.col("event_type") == "purchase").count()
    assert sum(r["n_purchases"] for r in rows) == n_purchases
    by = {r["touch_type"]: r for r in rows}
    assert set(by) <= {"click", "view", "none"}
    if "none" in by:  # unattributed rows carry no touch id
        assert by["none"]["n_attributed"] == 0


def test_interleave_is_balanced_permutation(spark, sf_dir, qs):
    rows = sorted(
        (r["interleave_pos"], r["source"])
        for r in qs["dataset_interleave"](spark, sf_dir).collect()
    )
    assert [p for p, _ in rows] == list(range(len(rows)))
    # strict round-robin: every prefix is balanced within 1 per source
    for cut in (50, 200, len(rows)):
        c = Counter(s for _, s in rows[:cut])
        assert max(c.values()) - min(c.values()) <= 1, (cut, c)


def test_split_manifest_fractions_and_conservation(spark, sf_dir, qs):
    rows = qs["dataset_split_manifest"](spark, sf_dir).collect()
    d = load(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == d.count()
    total = sum(r["n_docs"] for r in rows)
    train = sum(r["n_docs"] for r in rows if r["split"] == "train")
    assert 0.8 < train / total < 0.97


def test_bigram_probabilities_sum_within_head(spark, sf_dir, qs):
    rows = qs["bigram_next_word"](spark, sf_dir).collect()
    assert rows and len({r["w1"] for r in rows}) <= 20
    for r in rows:
        assert 0 < r["p_next"] <= 1
        assert r["n_pair"] <= r["n_head"]


def test_revenue_concentration_shares_sum_to_one(spark, sf_dir, qs):
    rows = qs["revenue_concentration"](spark, sf_dir).collect()
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 0.01
    by = {r["decile"]: r for r in rows}
    assert by[max(by)]["revenue_share"] > by[min(by)]["revenue_share"]
    o = load(spark, sf_dir, "orders")
    assert sum(r["n_customers"] for r in rows) == (
        o.select("o_custkey").distinct().count()
    )


def test_brand_affinity_support_and_lift_consistent(spark, sf_dir, qs):
    rows = qs["brand_affinity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["brand_a"] < r["brand_b"]
        assert 0 < r["support"] <= 1 and r["lift"] > 0


def test_dwell_time_gap_conservation(spark, sf_dir, qs):
    rows = qs["events_dwell_time"](spark, sf_dir).collect()
    e = load(spark, sf_dir, "events")
    assert sum(r["n_gaps"] for r in rows) == (
        e.count() - e.select("user_id").distinct().count()
    )
    assert all(r["total_dwell_us"] >= 0 for r in rows)


def test_seasonality_index_weighted_mean_is_one(spark, sf_dir, qs):
    rows = qs["orders_seasonality"](spark, sf_dir).collect()
    assert sorted(r["month_of_year"] for r in rows) == list(range(1, 13))
    wmean = sum(r["seasonal_index"] * r["n_months"] for r in rows) / sum(
        r["n_months"] for r in rows
    )
    assert abs(wmean - 1.0) < 0.01


def test_ltv_conserves_purchase_cents(spark, sf_dir, qs):
    rows = qs["user_ltv_cohort"](spark, sf_dir).collect()
    e = load(spark, sf_dir, "events")
    want = (
        e.filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"))
        .first()["c"]
    )
    assert round(sum(r["revenue"] for r in rows) * 100) == want
    assert all(r["week_age"] >= 0 for r in rows)


def test_corpus_overlap_full_matrix_and_bounds(spark, sf_dir, qs):
    rows = qs["cross_corpus_overlap"](spark, sf_dir).collect()
    d = load(spark, sf_dir, "documents")
    k = d.select("source").distinct().count()
    assert len(rows) == k * (k - 1) // 2
    assert all(0 <= r["jaccard"] <= 1 for r in rows)


def test_length_outliers_all_beyond_cut(spark, sf_dir, qs):
    rows = qs["doc_length_outliers"](spark, sf_dir).collect()
    assert rows and all(abs(r["robust_z"]) > 1.5 for r in rows)


def test_prefix_clusters_sizes(spark, sf_dir, qs):
    rows = qs["doc_prefix_clusters"](spark, sf_dir).collect()
    assert rows and all(r["n_docs"] >= 2 and r["n_sources"] >= 1 for r in rows)


def test_winnowing_matches_reference_implementation(spark, sf_dir, qs):
    """Pin the Spark winnowing against a direct python transliteration
    of the Schleimer et al. scheme (rolling k-gram hash, rightmost
    minimum per window, distinct (pos, hash) set)."""
    K, W, B, M = 8, 4, 31, 10**9 + 7

    def reference(text):
        h = [
            sum(ord(text[i + j]) * pow(B, K - 1 - j, M) for j in range(K)) % M
            for i in range(len(text) - K + 1)
        ]
        fps = set()
        for p in range(len(h) - W + 1):
            win = h[p:p + W]
            m = min(win)
            idx = max(i for i, v in enumerate(win) if v == m)
            fps.add((p + idx, m))
        return len(h), len(fps), sum(v for _, v in fps) % M

    rows = {r["doc_id"]: r
            for r in qs["doc_winnowing_fingerprints"](spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents").limit(10).collect()
    for d in docs:
        n_grams, n_fp, checksum = reference(d["text"])
        r = rows[d["doc_id"]]
        assert (r["n_grams"], r["n_fingerprints"], r["fp_checksum"]) == (
            n_grams, n_fp, checksum,
        ), d["doc_id"]
        # winnowing guarantee: density near 2/(w+1), never above 1
        assert 0 < r["density"] <= 1


def test_point_in_time_state_is_a_true_snapshot(spark, sf_dir, qs):
    """The AS OF result must equal a brute-force per-user replay of the
    event log up to the same cutoff."""
    rows = {r["user_id"]: r
            for r in qs["point_in_time_state"](spark, sf_dir).collect()}
    e = load(spark, sf_dir, "events").collect()
    us = sorted(r["ts"] for r in e)
    import datetime
    lo, hi = us[0], us[-1]
    cutoff = lo + (hi - lo) / 2
    replay = {}
    for r in e:
        if r["ts"] <= cutoff:
            cur = replay.setdefault(r["user_id"], {"n": 0, "last": None})
            cur["n"] += 1
            key = (r["ts"], r["event_id"])
            if cur["last"] is None or key > (cur["last"]["ts"], cur["last"]["event_id"]):
                cur["last"] = r
    assert set(rows) == set(replay)
    for uid, st in replay.items():
        got = rows[uid]
        assert got["n_events"] == st["n"]
        assert got["last_event_ts"] == st["last"]["ts"]
        assert got["last_event_type"] == st["last"]["event_type"]
