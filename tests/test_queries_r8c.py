"""Round-8 additions, batch 3: association rules, equi-depth
histograms, and the trigram event LM — each pinned against an
INDEPENDENT brute-force python twin computed straight off the parquet
(via DuckDB row fetches), never through the Spark helpers."""

import duckdb


def test_association_rules_matches_python_twin(spark, sf_dir):
    from beehive_spark.queries.relational import association_rules

    rows = duckdb.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    baskets = {}
    icnt = {}
    for o, p in rows:
        baskets.setdefault(o, set()).add(p)
        icnt[p] = icnt.get(p, 0) + 1
    n_orders = len(baskets)
    pair_cnt = {}
    for members in baskets.values():
        ms = sorted(m for m in members if icnt[m] >= 2)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + 1
    want = []
    for (a, b), c in pair_cnt.items():
        if c < 2:
            continue
        for ante, cons in ((a, b), (b, a)):
            want.append(
                (
                    ante,
                    cons,
                    c,
                    (c * 1000000) // icnt[ante],
                    (c * n_orders * 1000000) // (icnt[ante] * icnt[cons]),
                )
            )
    got = sorted(
        (
            r["antecedent"],
            r["consequent"],
            r["support_cnt"],
            r["conf_ppm"],
            r["lift_ppm"],
        )
        for r in association_rules(spark, sf_dir).collect()
    )
    assert got == sorted(want) and got


def test_association_rules_confidence_direction_asymmetry(spark, sf_dir):
    """Directedness is the point of the operator: A=>B and B=>A share
    support and lift but divide by different antecedent counts, so at
    least one pair in the real corpus must show asymmetric
    confidence."""
    from beehive_spark.queries.relational import association_rules

    by_pair = {}
    for r in association_rules(spark, sf_dir).collect():
        key = tuple(sorted((r["antecedent"], r["consequent"])))
        by_pair.setdefault(key, []).append(r)
    assert all(len(v) == 2 for v in by_pair.values())
    assert any(
        v[0]["conf_ppm"] != v[1]["conf_ppm"] for v in by_pair.values()
    )
    assert all(
        v[0]["lift_ppm"] == v[1]["lift_ppm"] for v in by_pair.values()
    )


def _ntile(n_rows, k, idx):
    """SQL-standard NTILE bucket (1-based) of 0-based idx among n_rows."""
    base, rem = divmod(n_rows, k)
    cut = rem * (base + 1)
    if idx < cut:
        return idx // (base + 1) + 1
    return rem + (idx - cut) // base + 1 if base else rem


def test_equidepth_histogram_matches_python_twin(spark, sf_dir):
    from beehive_spark.queries.relational import equidepth_histogram

    rows = duckdb.sql(
        f"SELECT p_brand, p_retailprice, p_partkey FROM '{sf_dir}/part.parquet'"
    ).fetchall()
    by_brand = {}
    for brand, price, pk in rows:
        by_brand.setdefault(brand, []).append((price, pk))
    want = {}
    for brand, members in by_brand.items():
        members.sort()
        for idx, (price, _) in enumerate(members):
            b = _ntile(len(members), 8, idx)
            cur = want.setdefault((brand, b), [0, price, price])
            cur[0] += 1
            cur[1] = min(cur[1], price)
            cur[2] = max(cur[2], price)
    got = {
        (r["brand"], r["bucket"]): [r["n_parts"], r["lo_price"], r["hi_price"]]
        for r in equidepth_histogram(spark, sf_dir).collect()
    }
    assert got == want
    # equi-depth contract: bucket sizes within a brand differ by <= 1
    for brand in by_brand:
        sizes = [v[0] for (b, _), v in got.items() if b == brand]
        assert max(sizes) - min(sizes) <= 1


def test_event_trigram_lm_matches_python_twin(spark, sf_dir):
    from beehive_spark.queries.core import event_trigram_lm

    rows = duckdb.sql(
        f"SELECT user_id, ts, event_id, event_type FROM '{sf_dir}/events.parquet' "
        "ORDER BY user_id, ts, event_id"
    ).fetchall()
    seqs = {}
    for u, _, _, t in rows:
        seqs.setdefault(u, []).append(t)
    tri = {}
    for seq in seqs.values():
        for i in range(len(seq) - 2):
            k = (seq[i], seq[i + 1], seq[i + 2])
            tri[k] = tri.get(k, 0) + 1
    ctx = {}
    for (t1, t2, _), n in tri.items():
        ctx[(t1, t2)] = ctx.get((t1, t2), 0) + n
    want = sorted(
        (t1, t2, t3, n, (n * 1000000) // ctx[(t1, t2)])
        for (t1, t2, t3), n in tri.items()
    )
    got = sorted(
        (r["t1"], r["t2"], r["t3"], r["n"], r["p_ppm"])
        for r in event_trigram_lm(spark, sf_dir).collect()
    )
    assert got == want and got
    # a probability table: context totals hit 1e6 up to floor loss
    by_ctx = {}
    for t1, t2, _, _, p in got:
        by_ctx.setdefault((t1, t2), []).append(p)
    for ps in by_ctx.values():
        assert 1000000 - len(ps) < sum(ps) <= 1000000


def test_events_holt_matches_python_twin(spark, sf_dir):
    """Holt (level, trend) integer fold — independent python fold over
    the same (t, v)-ordered milli series, including the seed and the
    one-step forecast."""
    from beehive_spark.queries.core import events_holt

    rows = duckdb.sql(
        f"SELECT user_id, epoch_us(ts) AS t, "
        f"CAST(ROUND(value * 1000) AS BIGINT) AS v "
        f"FROM '{sf_dir}/events.parquet' ORDER BY user_id, t, v"
    ).fetchall()
    series = {}
    for u, _, v in rows:
        series.setdefault(u, []).append(v)

    def intdiv(a, b):  # truncating, matching Spark div / DuckDB //
        q = abs(a) // b
        return q if a >= 0 else -q

    want = []
    for u, vs in series.items():
        l, b = vs[0], 0
        for x in vs[1:]:
            nl = intdiv(3 * x + 7 * (l + b), 10)
            nb = intdiv(2 * (nl - l) + 8 * b, 10)
            l, b = nl, nb
        want.append((u, len(vs), l, b, l + b))
    got = sorted(
        (
            r["user_id"],
            r["n_points"],
            r["level_milli"],
            r["trend_milli"],
            r["forecast_milli"],
        )
        for r in events_holt(spark, sf_dir).collect()
    )
    assert got == sorted(want) and got
    # trend must be non-trivial somewhere or the fold is vacuous
    assert any(t != 0 for *_, t, _f in got)
