"""Approximate sketches must stay within their advertised error of
the exact answers (the self-check that replaces a SQL oracle for
non-deterministic-by-algorithm aggregates)."""

from pyspark.sql import functions as F

from beehive_spark.queries import load
from beehive_spark.queries.relational import approx_sketches


def test_sketches_within_error_bounds(spark, sf_dir):
    got = {r["event_type"]: r for r in approx_sketches(spark, sf_dir).collect()}
    exact = {
        r["event_type"]: r
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("median"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, e in exact.items():
        g = got[et]
        # HLL++ at rsd=0.02: allow 3 sigma
        assert abs(g["approx_users"] - e["users"]) <= max(3, 0.06 * e["users"])
        # percentile_approx with 1000 buckets on this data: within 10%
        assert abs(g["approx_median_value"] - e["median"]) <= 0.1 * abs(e["median"])


def test_hll_rollup_estimate_within_5pct_of_exact(spark, sf_dir):
    from beehive_spark.queries.relational import sketch_uniques_rollup

    rows = sketch_uniques_rollup(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_days"] > 1  # the rollup really merged multiple sketches
        err = abs(r["est_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert err < 0.05, (r["event_type"], r["est_users"], r["exact_users"])


def test_histogram_p95_within_bin_width_of_exact(spark, sf_dir):
    """The p95 estimated from merged 8-wide bins must sit within one
    bin width above the exact percentile (upper-edge estimator)."""
    from beehive_spark.queries import all_queries, load
    from pyspark.sql import functions as F

    est = {
        r["event_type"]: r["est_p95"]
        for r in all_queries()["events_histogram_rollup"](spark, sf_dir)
        .select("event_type", "est_p95")
        .distinct()
        .collect()
    }
    import math

    vals: dict[str, list[float]] = {}
    for r in load(spark, sf_dir, "events").select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    # the guarantee is against the DISCRETE 95th order statistic (the
    # smallest x with rank >= ceil(.95 n)): est is that value's bin
    # upper edge, so x < est <= x + 8
    assert set(est) == set(vals)
    for t, e in est.items():
        xs = sorted(vals[t])
        x = xs[math.ceil(0.95 * len(xs)) - 1]
        assert x < e <= x + 8.0, (t, e, x)
