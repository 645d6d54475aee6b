"""Round-8 additions, batch 6: feature correlations, decision-stump
split finding, planted k-means — python twins computed straight off
the parquet / closed form, never through the Spark helpers."""

import math

import duckdb


def _milli(v: float) -> int:
    return int(math.copysign(math.floor(abs(v * 1000) + 0.5), v))


def _unit(v: float) -> int:
    return int(math.copysign(math.floor(abs(v) + 0.5), v))


def test_feature_correlations_matches_python_twin(spark, sf_dir):
    from beehive_spark.queries.ml import feature_correlations

    rows = duckdb.sql(
        f"SELECT l_quantity, l_extendedprice, l_discount, l_tax "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    feats = {
        "quantity": [_unit(r[0]) for r in rows],
        "price": [_unit(r[1]) for r in rows],
        "discount": [_milli(r[2]) for r in rows],
        "tax": [_milli(r[3]) for r in rows],
    }
    n = len(rows)

    def corr_micro(xs, ys):
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        num = float(n) * sxy - float(sx) * sy
        den = math.sqrt(float(n) * sxx - float(sx) * sx) * math.sqrt(
            float(n) * syy - float(sy) * sy
        )
        v = num / den * 1_000_000
        return int(math.copysign(math.floor(abs(v) + 0.5), v))

    want = {
        (x, y): (n, corr_micro(feats[x], feats[y]))
        for x, y in [
            ("quantity", "price"),
            ("quantity", "discount"),
            ("quantity", "tax"),
            ("price", "discount"),
            ("price", "tax"),
            ("discount", "tax"),
        ]
    }
    got = {
        (r["x_col"], r["y_col"]): (r["n"], r["corr_micro"])
        for r in feature_correlations(spark, sf_dir).collect()
    }
    assert got == want
    # Pearson bound: every value lives on the [-1, 1] micro grid
    # (the synthetic corpus draws features independently, so all six
    # are near zero — the twin equality above is the real gate)
    assert all(-1_000_000 <= v[1] <= 1_000_000 for v in got.values())


def test_decision_stump_matches_python_twin(spark, sf_dir):
    from beehive_spark.queries.ml import decision_stump_gini

    rows = duckdb.sql(
        f"SELECT l_quantity, l_discount, l_returnflag "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    want = {}
    for feat, vals in (
        ("quantity", [(_milli(q), int(f == "R")) for q, _, f in rows]),
        ("discount", [(_milli(d), int(f == "R")) for _, d, f in rows]),
    ):
        hist = {}
        for v, y in vals:
            c, p = hist.get(v, (0, 0))
            hist[v] = (c + 1, p + y)
        n = sum(c for c, _ in hist.values())
        pos = sum(p for _, p in hist.values())
        n_l = pos_l = 0
        for v in sorted(hist):
            c, p = hist[v]
            n_l += c
            pos_l += p
            if n_l == n:
                continue
            n_r, pos_r = n - n_l, pos - pos_l

            def gini(p_, n_):
                pr, qr = p_ / n_, (n_ - p_) / n_
                return 1.0 - pr * pr - qr * qr

            w = (n_l * gini(pos_l, n_l) + n_r * gini(pos_r, n_r)) / n
            g = w * 1_000_000
            want[(feat, v)] = (
                n_l,
                n_r,
                pos_l,
                pos_r,
                int(math.copysign(math.floor(abs(g) + 0.5), g)),
            )
    got = {
        (r["feature"], r["threshold_milli"]): (
            r["n_left"],
            r["n_right"],
            r["pos_left"],
            r["pos_right"],
            r["gini_micro"],
        )
        for r in decision_stump_gini(spark, sf_dir).collect()
    }
    assert got == want


def test_decision_stump_beats_root_impurity(spark, sf_dir):
    """The best split's weighted Gini must not exceed the unsplit
    root impurity (splits can only refine) — a formula-level sanity
    property independent of the twin."""
    from beehive_spark.queries.ml import decision_stump_gini

    (n, pos) = duckdb.sql(
        f"SELECT COUNT(*), SUM(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END)"
        f" FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()
    pr = pos / n
    root = (1.0 - pr * pr - (1 - pr) * (1 - pr)) * 1_000_000
    best = min(
        r["gini_micro"] for r in decision_stump_gini(spark, sf_dir).collect()
    )
    assert best <= root + 1  # +1 for the micro-grid


def test_kmeans_planted_matches_numpy_lloyd(spark, sf_dir):
    import numpy as np

    from beehive_spark.queries.ml import kmeans_planted

    (n_cust,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/customer.parquet'"
    ).fetchone()
    ids = np.arange(n_cust, dtype=np.int64)
    c = ids % 3
    o1 = (ids // 3) % 7 - 3
    o2 = (ids // 3) % 5 - 2
    cx = np.select([c == 0, c == 1], [0, 1000000], 150000)
    cy = np.select([c == 0, c == 1], [0, 200000], 1000000)
    pts = np.stack([cx + o1 * 1000, cy + o2 * 1500], axis=1).astype(np.float64)
    cents = np.array(
        [[300000.0, 300000.0], [800000.0, 200000.0], [200000.0, 800000.0]]
    )
    for _ in range(3):
        d2 = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        sums = np.zeros((3, 2), dtype=np.int64)
        counts = np.zeros(3, dtype=np.int64)
        np.add.at(sums, assign, pts.astype(np.int64))
        np.add.at(counts, assign, 1)
        cents = sums / counts[:, None]
    want = {
        int(k): (
            int(counts[k]),
            int(sums[k, 0]) // int(counts[k]),  # sums positive: // == div
            int(sums[k, 1]) // int(counts[k]),
        )
        for k in range(3)
    }
    got = {
        r["cluster_id"]: (r["n_points"], r["cx_milli"], r["cy_milli"])
        for r in kmeans_planted(spark, sf_dir).collect()
    }
    assert got == want
    # the planted margin guarantees full recovery: cluster sizes are
    # exactly n/3 and every centroid sits within jitter of its center
    assert all(v[0] == n_cust // 3 for v in got.values())
    for k, (ctr_x, ctr_y) in enumerate([(0, 0), (1000000, 200000), (150000, 1000000)]):
        assert abs(got[k][1] - ctr_x) <= 3000
        assert abs(got[k][2] - ctr_y) <= 3000
