"""Property pins for the round-9 queries — invariants the oracle gate
cannot express (the gate proves cross-engine equality; these prove the
SEMANTICS are the ones the docstrings claim)."""

import math

import pytest

pytestmark = pytest.mark.slow  # query pins duplicated by the oracle gate
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_purged_split_partitions_and_orders(spark):
    """Folds partition each user's events exactly; every train event
    precedes every purged event precedes every val event in the
    (ts, event_id) order; the purge gap is max(1, n//20)."""
    from beehive_spark.queries import load
    from beehive_spark.queries.ml import time_series_split_purged

    out = time_series_split_purged(spark, SF)
    e = load(spark, SF, "events")
    assert out.count() == e.count()
    joined = out.join(e.select("event_id", "ts"), "event_id")
    per_user = {}
    for r in joined.collect():
        per_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["fold"])
        )
    order = {"train": 0, "purged": 1, "val": 2}
    for u, evs in per_user.items():
        evs.sort()
        n = len(evs)
        folds = [f for _, _, f in evs]
        assert folds == sorted(folds, key=order.__getitem__), f"user {u}"
        assert folds.count("train") == (7 * n) // 10
        if n > (7 * n) // 10:  # any events past the train cut
            want_purge = min(max(1, n // 20), n - (7 * n) // 10)
            assert folds.count("purged") == want_purge


def test_target_encoding_excludes_own_label(spark):
    """The LOO property, brute-forced: each row's encoding equals the
    mean label of the OTHER members of its segment (micro-truncated),
    never the plain group mean when the two differ."""
    from beehive_spark.queries import load
    from beehive_spark.queries.ml import feature_target_encoding

    got = {
        r["c_custkey"]: (r["segment"], r["label"], r["enc_micro"])
        for r in feature_target_encoding(spark, SF).collect()
    }
    rows = load(spark, SF, "customer").collect()
    seg_stats = {}
    for r in rows:
        lbl = 1 if r["c_acctbal"] > 0 else 0
        s = seg_stats.setdefault(r["c_mktsegment"], [0, 0])
        s[0] += lbl
        s[1] += 1
    checked_diff = 0
    for r in rows:
        seg = r["c_mktsegment"]
        pos, cnt = seg_stats[seg]
        if cnt <= 1:
            assert r["c_custkey"] not in got
            continue
        lbl = 1 if r["c_acctbal"] > 0 else 0
        want = (1_000_000 * (pos - lbl)) // (cnt - 1)
        assert got[r["c_custkey"]] == (seg, lbl, want)
        if (1_000_000 * pos) // cnt != want:
            checked_diff += 1
    assert checked_diff > 0  # LOO genuinely differed from the group mean


def test_woe_iv_matches_python(spark):
    """WoE/IV against a from-scratch python fold; IV contributions are
    non-negative only when shares diverge in WoE's direction (they
    always are: (g-b) and ln(g/b) share a sign)."""
    from beehive_spark.queries import load
    from beehive_spark.queries.ml import feature_woe_iv

    rows = load(spark, SF, "customer").collect()
    stats = {}
    for r in rows:
        lbl = 1 if r["c_acctbal"] > 0 else 0
        s = stats.setdefault(r["c_mktsegment"], [0, 0])
        s[lbl == 0] += 1  # s[0]=good, s[1]=bad
    tg = sum(v[0] for v in stats.values())
    tb = sum(v[1] for v in stats.values())
    got = {r["segment"]: r for r in feature_woe_iv(spark, SF).collect()}
    for seg, (g, b) in stats.items():
        if g == 0 or b == 0:
            assert seg not in got
            continue
        woe = math.log((g * tb) / (b * tg))
        r = got[seg]
        assert (r["n_good"], r["n_bad"]) == (g, b)
        assert r["woe_micro"] == round(woe * 1_000_000)
        assert r["iv_contrib_micro"] == round(
            (g / tg - b / tb) * woe * 1_000_000
        )
        assert r["iv_contrib_micro"] >= 0


def test_adamic_adar_small_basket_outweighs_large(spark):
    """The Adamic-Adar damping property on a planted corpus: one
    shared 2-item basket must outscore many shared 20-item baskets
    when the raw co-occurrence count says otherwise."""
    from beehive_spark.queries.relational import (
        link_prediction_adamic_adar,
    )

    # reuse the query's algebra through its registered entry by
    # building a planted lineitem in a temp dir
    import os
    import tempfile

    tmp = tempfile.mkdtemp()
    rows = []
    # pair (1,2): one tight basket of 2 -> 1e6/ln2 ~ 1_442_695
    rows += [(1000, 1), (1000, 2)]
    # pair (10,11): three sprawling baskets of 20 -> 3e6/ln20 ~ 1_001_4xx
    for o in (2000, 2001, 2002):
        rows += [(o, 10), (o, 11)] + [(o, 100 + o % 100 * 50 + k) for k in range(18)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    df.write.parquet(os.path.join(tmp, "lineitem.parquet"))
    out = {
        (r["pa"], r["pb"]): (r["n_shared"], r["aa_micro"])
        for r in link_prediction_adamic_adar(spark, tmp).collect()
    }
    n12, s12 = out[(1, 2)]
    n10, s10 = out[(10, 11)]
    assert n12 == 1 and n10 == 3  # raw counts favor the sprawling pair
    assert s12 == round(1_000_000 / math.log(2))
    assert s10 == 3 * round(1_000_000 / math.log(20))
    assert s12 > s10  # ...but AA damping flips the ranking


def test_novelty_first_doc_is_fully_novel_and_clone_is_not(spark):
    """On a planted corpus: the first document is 100% novel, an exact
    clone later is 0% novel, and a half-overlap lands exactly at its
    set-arithmetic fraction."""
    import os
    import tempfile

    from beehive_spark.queries.llm import text_ngram_novelty

    tmp = tempfile.mkdtemp()
    a = "alpha beta gamma delta epsilon zeta"          # 4 shingles
    b = a                                              # clone: 0 new
    c = "gamma delta epsilon zeta eta theta iota"      # 5 shingles, 3 new
    df = spark.createDataFrame(
        [(0, a, "en", "s", len(a)), (1, b, "en", "s", len(b)),
         (2, c, "en", "s", len(c))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(os.path.join(tmp, "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_new"], r["novelty_micro"])
        for r in text_ngram_novelty(spark, tmp).collect()
    }
    assert got[0] == (4, 4, 1_000_000)
    assert got[1] == (4, 0, 0)
    assert got[2] == (5, 3, 600_000)


def test_sequence_mining_finds_gapped_not_reversed(spark):
    """The subsequence semantics, planted: a pattern embedded with
    gaps (other types interleaved) IS supported; the reversed pattern
    with no valid ordering is NOT; adjacency-only logic would miss the
    gapped one."""
    import datetime as dt
    import os
    import tempfile

    from beehive_spark.queries.core import sequence_mining_triples

    tmp = tempfile.mkdtemp()
    t0 = dt.datetime(2024, 1, 1)
    seq = ["view", "error", "click", "error", "purchase"]  # gapped v->c->p
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, typ, 0.0, "{}")
        for i, typ in enumerate(seq)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(tmp, "events.parquet"))
    got = {
        (r["a"], r["b"], r["c"]): r["support"]
        for r in sequence_mining_triples(spark, tmp).collect()
    }
    assert got[("view", "click", "purchase")] == 1  # gapped embedding found
    assert ("purchase", "click", "view") not in got  # no reversed embedding
    assert got[("view", "error", "error")] == 1  # repeated type handled
    assert ("purchase", "purchase", "purchase") not in got  # needs 3 occurrences


def test_int8_quantization_error_bound(spark):
    """Information-theoretic bound, checked per vector: min-max int8
    dequantization error per value is at most half a quantization
    step, so recon_err_micro <= sum over dims of
    ceil((mx_d - mn_d) * 1e6 / 510) + 1 micro slack per dim."""
    import math

    from pyspark.sql import functions as F
    from beehive_spark.queries import load
    from beehive_spark.queries.llm import embedding_quantize_int8

    v = load(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    st = (
        v.select(F.posexplode("e").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    budget = sum(
        math.ceil((r["mx"] - r["mn"]) * 1_000_000 / 510) + 1 for r in st
    )
    out = embedding_quantize_int8(spark, SF).collect()
    assert out
    for r in out:
        assert r["recon_err_micro"] <= budget, (
            f"vec {r['vec_id']}: {r['recon_err_micro']} > {budget}"
        )
        assert 0 <= r["q_sum"] <= 255 * r["n_dims"]


def test_ab_test_z_sign_and_degenerate_guard(spark):
    """Planted experiments: more conversions in variant B gives z > 0,
    swapping the variants flips the sign exactly, and an all-convert
    corpus reports NULL z (no sampling variance) instead of raising."""
    import datetime as dt
    import os
    import tempfile

    from beehive_spark.queries.core import ab_test_conversion

    t0 = dt.datetime(2024, 1, 1)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def corpus(b_heavy, all_convert=False):
        rows, eid = [], 0
        for u in range(40):
            # converted iff >= 14 purchases
            n = 20 if (
                all_convert
                or (u % 2 == (1 if b_heavy else 0) and u < 30)
                or u >= 36
            ) else 3
            for i in range(n):
                rows.append(
                    (eid, t0 + dt.timedelta(minutes=eid), u, "purchase",
                     1.0, "{}")
                )
                eid += 1
        return rows

    def run(rows):
        tmp = tempfile.mkdtemp()
        spark.createDataFrame(rows, schema).write.parquet(
            os.path.join(tmp, "events.parquet")
        )
        return ab_test_conversion(spark, tmp).collect()[0]

    rb = run(corpus(b_heavy=True))
    ra = run(corpus(b_heavy=False))
    assert rb["z_milli"] > 0 and ra["z_milli"] < 0
    assert rb["z_milli"] == -ra["z_milli"]  # the design is symmetric
    assert (rb["c_a"], rb["c_b"]) == (ra["c_b"], ra["c_a"])

    rz = run(corpus(b_heavy=True, all_convert=True))
    assert rz["z_milli"] is None  # degenerate: no variance, no z
    assert rz["rate_a_ppm"] == rz["rate_b_ppm"] == 1_000_000
