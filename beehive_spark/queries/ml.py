"""ML-adjacent analytics: single-pass feature statistics, histogram
split finding, and distributed Lloyd k-means with a planted hash-green
gate.

These are the feature-engineering / model-prep operators a large-scale
training-data pipeline runs next to the curation suite
(``queries/curation.py``): a correlation matrix to drop redundant
features, a decision-stump scan to rank split candidates, and the
k-means machinery that backs clustering-based curation (the same
assign/update algebra the ANN index trainer uses, here exposed as a
query with an exact planted oracle).

Reference scope: all net-new capability — mhawila/beehive has no
aggregation beyond COUNT(*) (SURVEY.md §2.4).

Cross-engine exactness follows the repo discipline: integer units in,
exact BIGINT sums, any double arithmetic evaluated by the IDENTICAL
expression on identical integers in both engines, and micro-unit
rounding before anything ordered or hashed.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from beehive_spark.queries import load, query

# ---------------------------------------------------------------------------
# Correlation matrix — one-pass exact-moment Pearson over lineitem
# ---------------------------------------------------------------------------

_CORR_PAIRS = [
    ("quantity", "price"),
    ("quantity", "discount"),
    ("quantity", "tax"),
    ("price", "discount"),
    ("price", "tax"),
    ("discount", "tax"),
]


@query(
    "feature_correlations",
    oracle="""
    WITH u AS (
      SELECT CAST(ROUND(l_quantity) AS BIGINT) AS q,
             CAST(ROUND(l_extendedprice) AS BIGINT) AS p,
             CAST(ROUND(l_discount * 1000) AS BIGINT) AS d,
             CAST(ROUND(l_tax * 1000) AS BIGINT) AS t
      FROM lineitem
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(q) AS sq, SUM(p) AS sp, SUM(d) AS sd, SUM(t) AS st,
             SUM(q*q) AS sqq, SUM(p*p) AS spp,
             SUM(d*d) AS sdd, SUM(t*t) AS stt,
             SUM(q*p) AS sqp, SUM(q*d) AS sqd, SUM(q*t) AS sqt,
             SUM(p*d) AS spd, SUM(p*t) AS spt, SUM(d*t) AS sdt
      FROM u
    ),
    pairs AS (
      SELECT 'quantity' AS x_col, 'price' AS y_col,
             sq AS sx, sp AS sy, sqq AS sxx, spp AS syy, sqp AS sxy, n FROM s
      UNION ALL SELECT 'quantity', 'discount', sq, sd, sqq, sdd, sqd, n FROM s
      UNION ALL SELECT 'quantity', 'tax', sq, st, sqq, stt, sqt, n FROM s
      UNION ALL SELECT 'price', 'discount', sp, sd, spp, sdd, spd, n FROM s
      UNION ALL SELECT 'price', 'tax', sp, st, spp, stt, spt, n FROM s
      UNION ALL SELECT 'discount', 'tax', sd, st, sdd, stt, sdt, n FROM s
    )
    SELECT x_col, y_col, n,
           CAST(ROUND(
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (SQRT(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * SQRT(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             * 1000000) AS BIGINT) AS corr_micro
    FROM pairs
    """,
)
def feature_correlations(spark, sf_dir):
    """Pearson correlation matrix over lineitem's numeric features
    (quantity, extendedprice, discount, tax) from ONE pass of exact
    integer moments — the feature-redundancy screen a training
    pipeline runs before model fitting.

    Exactness: features quantize to integer units (quantity and
    price to whole units, rates to milli), all 14 moments
    (sums, squares, cross-products) accumulate as exact BIGINTs
    (largest, n*p^2 as a double product, stays < 2^63 through
    sf ~ 50 — headroom noted, overflow would be loud under ANSI
    mode), and the textbook moment form
    ``(n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))``
    is evaluated by the IDENTICAL double expression on identical
    integers in both engines — bit-equal inputs, bit-equal ops,
    bit-equal result — then micro-rounded (the BM25 grid).

    Scale shape: a single map-side-combinable aggregate — zero
    shuffled rows beyond one partial-agg exchange of a 15-number
    state; the 6-pair expansion is a 1-row explode.  This is the
    canonical one-pass sufficient-statistics pattern: at 100 TB the
    job is one scan, and adding features grows the state
    quadratically (d^2 moments) but the data movement not at all."""
    li = load(spark, sf_dir, "lineitem")
    u = li.select(
        F.round("l_quantity").cast("long").alias("q"),
        F.round("l_extendedprice").cast("long").alias("p"),
        F.round(F.col("l_discount") * 1000).cast("long").alias("d"),
        F.round(F.col("l_tax") * 1000).cast("long").alias("t"),
    )
    cols = {"quantity": "q", "price": "p", "discount": "d", "tax": "t"}
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for name, c in cols.items():
        aggs.append(F.sum(c).alias(f"s_{name}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"s_{name}_{name}"))
    for x, y in _CORR_PAIRS:
        aggs.append(
            F.sum(F.col(cols[x]) * F.col(cols[y])).alias(f"s_{x}_{y}")
        )
    s = u.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(x).alias("x_col"),
                    F.lit(y).alias("y_col"),
                    F.col(f"s_{x}").alias("sx"),
                    F.col(f"s_{y}").alias("sy"),
                    F.col(f"s_{x}_{x}").alias("sxx"),
                    F.col(f"s_{y}_{y}").alias("syy"),
                    F.col(f"s_{x}_{y}").alias("sxy"),
                )
                for x, y in _CORR_PAIRS
            ]
        )
    ).alias("r")
    e = s.select("n", rows).select("n", "r.*")
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")) * F.sqrt(
        nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    )
    return e.select(
        "x_col",
        "y_col",
        "n",
        F.round(num / den * 1_000_000).cast("long").alias("corr_micro"),
    )


# ---------------------------------------------------------------------------
# Decision stump — histogram-based best-split scan (Gini impurity)
# ---------------------------------------------------------------------------
@query(
    "decision_stump_gini",
    oracle="""
    WITH f AS (
      SELECT 'quantity' AS feature,
             CAST(ROUND(l_quantity * 1000) AS BIGINT) AS v,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
      UNION ALL
      SELECT 'discount', CAST(ROUND(l_discount * 1000) AS BIGINT),
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
      FROM lineitem
    ),
    h AS (
      SELECT feature, v, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM f GROUP BY feature, v
    ),
    c AS (
      SELECT feature, v,
             SUM(cnt) OVER (PARTITION BY feature ORDER BY v) AS n_l,
             SUM(pos) OVER (PARTITION BY feature ORDER BY v) AS pos_l,
             SUM(cnt) OVER (PARTITION BY feature) AS n,
             SUM(pos) OVER (PARTITION BY feature) AS pos
      FROM h
    )
    SELECT feature, v AS threshold_milli,
           CAST(n_l AS BIGINT) AS n_left,
           CAST(n - n_l AS BIGINT) AS n_right,
           CAST(pos_l AS BIGINT) AS pos_left,
           CAST(pos - pos_l AS BIGINT) AS pos_right,
           CAST(ROUND(
             (CAST(n_l AS DOUBLE)
                * (1.0 - (CAST(pos_l AS DOUBLE) / n_l)
                         * (CAST(pos_l AS DOUBLE) / n_l)
                       - (CAST(n_l - pos_l AS DOUBLE) / n_l)
                         * (CAST(n_l - pos_l AS DOUBLE) / n_l))
              + CAST(n - n_l AS DOUBLE)
                * (1.0 - (CAST(pos - pos_l AS DOUBLE) / (n - n_l))
                         * (CAST(pos - pos_l AS DOUBLE) / (n - n_l))
                       - (CAST((n - n_l) - (pos - pos_l) AS DOUBLE) / (n - n_l))
                         * (CAST((n - n_l) - (pos - pos_l) AS DOUBLE) / (n - n_l))))
             / n * 1000000) AS BIGINT) AS gini_micro
    FROM c WHERE n_l < n
    """,
)
def decision_stump_gini(spark, sf_dir):
    """Best-split scan for a decision stump predicting returns
    (label = ``l_returnflag = 'R'``): for every candidate threshold t
    of every feature, the Gini impurity of the split
    ``feature <= t`` — exactly the histogram-based split finding
    inside every gradient-boosting trainer (LightGBM/XGBoost hist
    mode), expressed relationally.

    The shape IS the 100 TB story: one map-side-combinable
    ``(feature, bin) -> (count, positives)`` histogram aggregation
    touches the data — everything after runs on the BIN table
    (|features| x |distinct values|, here ~61 rows): cumulative
    window sums give every left/right split's class counts in one
    in-partition pass (no per-threshold re-scan, no self-join), and
    the weighted Gini is closed-form in those exact counts.  Adding
    candidate thresholds costs nothing at scan time.

    Exactness: class counts are exact BIGINTs; the impurity
    ``(n_l*g_l + n_r*g_r)/n`` is evaluated by the identical double
    expression on identical integers in both engines and rounded to
    MICRO-units, so ranking by (gini_micro, feature, threshold) is
    discrete.  Degenerate right-empty candidates (t = max value) are
    excluded; every remaining row is emitted — the full candidate
    table, not just the argmin, so the oracle hash pins the whole
    impurity curve."""
    li = load(spark, sf_dir, "lineitem")
    y = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    f = li.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("quantity").alias("feature"),
                    F.round(F.col("l_quantity") * 1000)
                    .cast("long")
                    .alias("v"),
                ),
                F.struct(
                    F.lit("discount").alias("feature"),
                    F.round(F.col("l_discount") * 1000)
                    .cast("long")
                    .alias("v"),
                ),
            )
        ).alias("x"),
        y.alias("y"),
    ).select("x.feature", "x.v", "y")
    h = f.groupBy("feature", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("y").cast("long").alias("pos"),
    )
    w_cum = Window.partitionBy("feature").orderBy("v")
    w_all = Window.partitionBy("feature")
    c = h.select(
        "feature",
        "v",
        F.sum("cnt").over(w_cum).alias("n_l"),
        F.sum("pos").over(w_cum).alias("pos_l"),
        F.sum("cnt").over(w_all).alias("n"),
        F.sum("pos").over(w_all).alias("pos"),
    ).filter(F.col("n_l") < F.col("n"))

    def _gini(p, n):
        pr = p.cast("double") / n
        qr = (n - p).cast("double") / n
        return F.lit(1.0) - pr * pr - qr * qr

    n_l, pos_l = F.col("n_l"), F.col("pos_l")
    n_r, pos_r = F.col("n") - n_l, F.col("pos") - pos_l
    weighted = (
        n_l.cast("double") * _gini(pos_l, n_l)
        + n_r.cast("double") * _gini(pos_r, n_r)
    ) / F.col("n")
    return c.select(
        "feature",
        F.col("v").alias("threshold_milli"),
        n_l.cast("long").alias("n_left"),
        n_r.cast("long").alias("n_right"),
        pos_l.cast("long").alias("pos_left"),
        pos_r.cast("long").alias("pos_right"),
        F.round(weighted * 1_000_000).cast("long").alias("gini_micro"),
    )


# ---------------------------------------------------------------------------
# k-means (Lloyd) — distributed assign/update with a planted exact gate
# ---------------------------------------------------------------------------
@query(
    "kmeans_planted",
    oracle="""
    WITH pts AS (
      SELECT CAST(c_custkey AS BIGINT) AS id,
             c_custkey % 3 AS c,
             (c_custkey // 3) % 7 - 3 AS o1,
             (c_custkey // 3) % 5 - 2 AS o2
      FROM customer
    ),
    p AS (
      SELECT id,
        CAST(CASE c WHEN 0 THEN 0 WHEN 1 THEN 1000000 ELSE 150000 END
             + o1 * 1000 AS BIGINT) AS x,
        CAST(CASE c WHEN 0 THEN 0 WHEN 1 THEN 200000 ELSE 1000000 END
             + o2 * 1500 AS BIGINT) AS y
      FROM pts
    ),
    c0 AS (
      SELECT * FROM (VALUES
        (0, CAST(300000 AS DOUBLE), CAST(300000 AS DOUBLE)),
        (1, CAST(800000 AS DOUBLE), CAST(200000 AS DOUBLE)),
        (2, CAST(200000 AS DOUBLE), CAST(800000 AS DOUBLE))) AS t(cid, cx, cy)
    ),
    a1 AS (
      SELECT id, x, y, cid, ROW_NUMBER() OVER (
        PARTITION BY id
        ORDER BY (x - cx) * (x - cx) + (y - cy) * (y - cy), cid) AS rn
      FROM p CROSS JOIN c0
    ),
    c1 AS (
      SELECT cid, SUM(x) AS sx, SUM(y) AS sy, CAST(COUNT(*) AS BIGINT) AS n
      FROM a1 WHERE rn = 1 GROUP BY cid
    ),
    a2 AS (
      SELECT p.id, p.x, p.y, c1.cid, ROW_NUMBER() OVER (
        PARTITION BY p.id
        ORDER BY (p.x - CAST(c1.sx AS DOUBLE) / c1.n)
                   * (p.x - CAST(c1.sx AS DOUBLE) / c1.n)
               + (p.y - CAST(c1.sy AS DOUBLE) / c1.n)
                   * (p.y - CAST(c1.sy AS DOUBLE) / c1.n), c1.cid) AS rn
      FROM p CROSS JOIN c1
    ),
    c2 AS (
      SELECT cid, SUM(x) AS sx, SUM(y) AS sy, CAST(COUNT(*) AS BIGINT) AS n
      FROM a2 WHERE rn = 1 GROUP BY cid
    ),
    a3 AS (
      SELECT p.id, p.x, p.y, c2.cid, ROW_NUMBER() OVER (
        PARTITION BY p.id
        ORDER BY (p.x - CAST(c2.sx AS DOUBLE) / c2.n)
                   * (p.x - CAST(c2.sx AS DOUBLE) / c2.n)
               + (p.y - CAST(c2.sy AS DOUBLE) / c2.n)
                   * (p.y - CAST(c2.sy AS DOUBLE) / c2.n), c2.cid) AS rn
      FROM p CROSS JOIN c2
    ),
    c3 AS (
      SELECT cid, SUM(x) AS sx, SUM(y) AS sy, CAST(COUNT(*) AS BIGINT) AS n
      FROM a3 WHERE rn = 1 GROUP BY cid
    )
    SELECT cid AS cluster_id, n AS n_points,
           CAST(sx // n AS BIGINT) AS cx_milli,
           CAST(sy // n AS BIGINT) AS cy_milli
    FROM c3
    """,
)
def kmeans_planted(spark, sf_dir, iters: int = 3):
    """Three Lloyd iterations of distributed k-means on PLANTED
    integer-milli 2-D points — the hash-green gate for the
    assign/update algebra that clustering-based curation and the ANN
    index trainer both rest on (the planted-topology move of
    dedup_semantic_planted / pagerank_planted applied to k-means).

    The plant: customer ids map to three clusters (id % 3) centered
    at (0,0), (1000,200), (150,1000) (unit = 1.0 = 1000 milli) with
    deterministic sub-7-unit jitter (id-derived, exact integers).
    Initial centroids sit at (300,300), (800,200), (200,800): every
    point's nearest init is already its planted center's basin
    (margins >= 4e11 milli^2 vs jitter perturbation <= 1.2e10, a
    30x separation, so no FP flip is possible), assignments are
    planted-exact from iteration 1 and centroids converge to the
    exact integer cluster means — closed-form and idempotent across
    iterations 2 and 3, which the oracle replays verbatim.

    Exactness: coordinates are exact BIGINT milli; per-iteration
    centroids enter the distance as the identical ``sum/n`` double
    in both engines; argmin ties (unreachable by construction) break
    on cid; final centroids report as truncating-div integers.

    Scale shape: the canonical distributed Lloyd — per iteration ONE
    broadcast of k centroids against the point frame, ONE
    row_number window per point (bounded k rows each), ONE
    map-side-combinable (sum, sum, count) update; points never
    shuffle between iterations beyond the per-id window and the
    k-row centroid frame is the only driver-visible state.  At
    100 TB with large k the same plan swaps the crossJoin for a
    coarse-quantizer pre-filter (the IVF trick) — machinery already
    in ``operators/ann_index.py``."""
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("id")
    )
    three = F.lit(3).cast("long")
    base = cust.select(
        "id",
        F.pmod("id", three).alias("c"),
        (
            F.pmod(F.call_function("div", F.col("id"), three), F.lit(7).cast("long"))
            - 3
        ).alias("o1"),
        (
            F.pmod(F.call_function("div", F.col("id"), three), F.lit(5).cast("long"))
            - 2
        ).alias("o2"),
    )
    cx0 = (
        F.when(F.col("c") == 0, 0).when(F.col("c") == 1, 1000000).otherwise(150000)
    )
    cy0 = (
        F.when(F.col("c") == 0, 0).when(F.col("c") == 1, 200000).otherwise(1000000)
    )
    p = base.select(
        "id",
        (cx0 + F.col("o1") * 1000).cast("long").alias("x"),
        (cy0 + F.col("o2") * 1500).cast("long").alias("y"),
    )
    cents = spark.range(3).select(
        F.col("id").cast("int").alias("cid"),
        F.when(F.col("id") == 0, 300000.0)
        .when(F.col("id") == 1, 800000.0)
        .otherwise(200000.0)
        .alias("cx"),
        F.when(F.col("id") == 0, 300000.0)
        .when(F.col("id") == 1, 200000.0)
        .otherwise(800000.0)
        .alias("cy"),
    )
    stats = None
    for _ in range(iters):
        j = p.crossJoin(F.broadcast(cents))
        d2 = (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx")) + (
            F.col("y") - F.col("cy")
        ) * (F.col("y") - F.col("cy"))
        w = Window.partitionBy("id").orderBy(d2, F.col("cid"))
        assigned = (
            j.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", "x", "y", "cid")
        )
        stats = assigned.groupBy("cid").agg(
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        cents = stats.select(
            "cid",
            (F.col("sx").cast("double") / F.col("n")).alias("cx"),
            (F.col("sy").cast("double") / F.col("n")).alias("cy"),
        )
    return stats.select(
        F.col("cid").alias("cluster_id"),
        F.col("n").alias("n_points"),
        F.call_function("div", F.col("sx"), F.col("n")).alias("cx_milli"),
        F.call_function("div", F.col("sy"), F.col("n")).alias("cy_milli"),
    )


# ---------------------------------------------------------------------------
# Target encoding — leave-one-out category -> label-mean features
# ---------------------------------------------------------------------------
@query(
    "feature_target_encoding",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_mktsegment AS segment,
             CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS label
      FROM customer
    ),
    s AS (
      SELECT segment, CAST(SUM(label) AS BIGINT) AS pos,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM c GROUP BY segment
    )
    SELECT c.c_custkey, c.segment, CAST(c.label AS BIGINT) AS label,
           CAST((1000000 * (s.pos - c.label)) // (s.cnt - 1) AS BIGINT)
             AS enc_micro
    FROM c JOIN s USING (segment)
    WHERE s.cnt > 1
    """,
)
def feature_target_encoding(spark, sf_dir):
    """Leave-one-out target encoding: each categorical value becomes
    the mean label of the OTHER rows sharing it —
    ``(sum(label) - own) / (count - 1)`` — the standard high-cardinality
    category feature that, unlike a plain group mean, does not leak the
    row's own label into its feature (Micci-Barreca, SIGKDD Expl. 2001).
    Label here is the derived ``c_acctbal > 0`` flag; singleton
    categories are dropped (their LOO mean is undefined).

    Exactness: the encoding is the truncating integer
    ``(1e6 * (pos - own)) div (cnt - 1)`` over exact counts — identical
    BIGINTs in both engines, no doubles anywhere.

    Scale shape: one map-side-combinable per-category aggregate (a
    |categories|-row frame that broadcasts), then a scan-speed join
    back — the fact table never reshuffles, which is what makes LOO
    encoding free at 100 TB next to the fit it replaces."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("c_acctbal") > 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("label"),
    )
    s = c.groupBy("segment").agg(
        F.sum("label").cast("long").alias("pos"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    mil = F.lit(1_000_000).cast("long")
    return (
        c.join(F.broadcast(s.filter(F.col("cnt") > 1)), "segment")
        .select(
            "c_custkey",
            "segment",
            "label",
            F.call_function(
                "div", mil * (F.col("pos") - F.col("label")), F.col("cnt") - 1
            ).alias("enc_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Weight of evidence + information value — the credit-scoring screen
# ---------------------------------------------------------------------------
@query(
    "feature_woe_iv",
    oracle="""
    WITH c AS (
      SELECT c_mktsegment AS segment,
             CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS label
      FROM customer
    ),
    s AS (
      SELECT segment,
             CAST(SUM(label) AS BIGINT) AS n_good,
             CAST(COUNT(*) - SUM(label) AS BIGINT) AS n_bad
      FROM c GROUP BY segment
    ),
    t AS (
      SELECT CAST(SUM(n_good) AS BIGINT) AS tg,
             CAST(SUM(n_bad) AS BIGINT) AS tb
      FROM s
    )
    SELECT s.segment, s.n_good, s.n_bad,
           CAST(ROUND(ln(
             (CAST(s.n_good AS DOUBLE) * t.tb)
             / (CAST(s.n_bad AS DOUBLE) * t.tg)) * 1000000) AS BIGINT)
             AS woe_micro,
           CAST(ROUND(
             (CAST(s.n_good AS DOUBLE) / t.tg
              - CAST(s.n_bad AS DOUBLE) / t.tb)
             * ln((CAST(s.n_good AS DOUBLE) * t.tb)
                  / (CAST(s.n_bad AS DOUBLE) * t.tg))
             * 1000000) AS BIGINT) AS iv_contrib_micro
    FROM s CROSS JOIN t
    WHERE s.n_good > 0 AND s.n_bad > 0
    """,
)
def feature_woe_iv(spark, sf_dir):
    """Weight of evidence and information value per category — the
    classic screening statistic for categorical predictors (Siddiqi,
    *Credit Risk Scorecards*): ``WoE = ln((good_share)/(bad_share))``
    per bin, ``IV = sum (good_share - bad_share) * WoE``.  Emitted per
    segment with its IV contribution; zero-good/zero-bad bins are
    excluded (their WoE is infinite — real pipelines smooth or merge
    them, a policy choice left upstream).

    Exactness: counts are exact BIGINTs; the two transcendental
    outputs evaluate the IDENTICAL double expression on those
    integers in both engines and round to micro before hashing
    (the BM25/PMI discipline).

    Scale shape: one per-category combinable aggregate, one 1-row
    total broadcast on a crossJoin — nothing touches the fact table
    twice."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("c_acctbal") > 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("label"),
    )
    s = c.groupBy("segment").agg(
        F.sum("label").cast("long").alias("n_good"),
        (F.count(F.lit(1)) - F.sum("label")).cast("long").alias("n_bad"),
    )
    t = s.agg(
        F.sum("n_good").cast("long").alias("tg"),
        F.sum("n_bad").cast("long").alias("tb"),
    )
    ratio = (F.col("n_good").cast("double") * F.col("tb")) / (
        F.col("n_bad").cast("double") * F.col("tg")
    )
    woe = F.log(ratio)
    share_gap = (
        F.col("n_good").cast("double") / F.col("tg")
        - F.col("n_bad").cast("double") / F.col("tb")
    )
    return (
        s.crossJoin(F.broadcast(t))
        .filter((F.col("n_good") > 0) & (F.col("n_bad") > 0))
        .select(
            "segment",
            "n_good",
            "n_bad",
            F.round(woe * 1_000_000).cast("long").alias("woe_micro"),
            F.round(share_gap * woe * 1_000_000)
            .cast("long")
            .alias("iv_contrib_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Purged chronological split — leakage-safe train/val assignment
# ---------------------------------------------------------------------------
@query(
    "time_series_split_purged",
    oracle="""
    WITH r AS (
      SELECT event_id, user_id,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events
    )
    SELECT event_id, user_id,
           CASE WHEN rn <= (7 * n) // 10 THEN 'train'
                WHEN rn <= (7 * n) // 10 + GREATEST(1, n // 20)
                  THEN 'purged'
                ELSE 'val' END AS fold
    FROM r
    """,
)
def time_series_split_purged(spark, sf_dir):
    """Leakage-safe chronological split with an embargo: per user the
    first 70% of events (by event time) train, the next
    ``max(1, 5%)`` are PURGED (the embargo that keeps
    overlapping-horizon labels out of both sides — de Prado,
    *Advances in Financial ML* ch.7), the rest validate.  This is the
    split a forecasting/recommendation pipeline must use instead of a
    random split, and emitting it as a materialized (event, fold)
    table makes the assignment auditable and reproducible.

    Exactness: pure integer rank arithmetic over the total
    (ts, event_id) per-user order — no doubles, identical in both
    engines.

    Scale shape: one user-partitioned window (rank + count) — a
    single shuffle by user, the same shape every per-user query in
    the suite holds; folds then appear as a predicate-pushdown-
    friendly string column for downstream readers."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id")
    r = e.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wc).cast("long").alias("n"),
    )
    n_train = F.call_function(
        "div", F.lit(7).cast("long") * F.col("n"), F.lit(10).cast("long")
    )
    n_purge = F.greatest(
        F.lit(1).cast("long"),
        F.call_function("div", F.col("n"), F.lit(20).cast("long")),
    )
    return r.select(
        "event_id",
        "user_id",
        F.when(F.col("rn") <= n_train, F.lit("train"))
        .when(F.col("rn") <= n_train + n_purge, F.lit("purged"))
        .otherwise(F.lit("val"))
        .alias("fold"),
    )


# ---------------------------------------------------------------------------
# Survival analysis — Kaplan-Meier product-limit estimator
# ---------------------------------------------------------------------------
_US_PER_HOUR = 3_600_000_000
# a user whose last activity is within this gap of corpus end is
# CENSORED (still alive at observation cutoff), not churned; one
# constant rendered into both the oracle f-string and the Spark
# expression (tests/test_oracle_constants.py discipline).  The
# synthetic corpus spans ~30 days with dense activity, so lifetimes
# tick in HOURS and a 24h quiet gap is the churn rule (a yearly
# corpus would use days/weeks — same algebra, one constant).
_KM_CENSOR_GAP_US = 24 * _US_PER_HOUR


@query(
    "survival_kaplan_meier",
    oracle=f"""
    WITH u AS (
      SELECT user_id, MIN(epoch_us(ts)) AS first_us,
             MAX(epoch_us(ts)) AS last_us
      FROM events GROUP BY user_id
    ),
    c AS (SELECT MAX(epoch_us(ts)) AS corpus_end FROM events),
    d AS (
      SELECT (last_us - first_us) // {_US_PER_HOUR} AS t,
             CASE WHEN last_us < c.corpus_end - {_KM_CENSOR_GAP_US}
                  THEN 1 ELSE 0 END AS churned
      FROM u, c
    ),
    ev AS (
      SELECT t, CAST(SUM(churned) AS BIGINT) AS n_churned,
             CAST(COUNT(*) AS BIGINT) AS ends
      FROM d GROUP BY t
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    km AS (
      SELECT t, n_churned,
             CAST(tot.n - COALESCE(SUM(ends) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
      FROM ev, tot
    ),
    s AS (
      SELECT t, n_churned, n_risk,
             SUM(CASE WHEN n_churned < n_risk
                      THEN ln(1.0 - CAST(n_churned AS DOUBLE) / n_risk)
                      ELSE 0.0 END) OVER (ORDER BY t) AS sumln,
             SUM(CASE WHEN n_churned = n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t) AS n_zero
      FROM km
    )
    SELECT t AS t_hours, n_risk, n_churned,
           CASE WHEN n_zero > 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(ROUND(exp(sumln) * 1000000) AS BIGINT)
           END AS surv_micro
    FROM s WHERE n_churned > 0
    """,
)
def survival_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier product-limit survival curve over user lifetimes
    with right-censoring (Kaplan & Meier 1958) — the churn/retention
    estimator a subscription or engagement warehouse runs daily.
    Subject = user; lifetime = whole hours between first and last
    event; a user still active within ``_KM_CENSOR_GAP_US`` of corpus
    end is CENSORED (alive at cutoff), everyone else churned at their
    last activity.  ``S(t) = prod_(t' <= t) (1 - d_t'/n_t')`` with
    ``n_t`` = users whose lifetime reaches t (at risk), ``d_t`` =
    churns at exactly t; rows emitted at churn times, the KM
    convention.  Censored users leave the risk set without an event —
    EXACTLY the bias naive "churn rate per day" rollups get wrong.

    Exactness: the product is ``exp(sum ln(1 - d/n))`` over the
    ordered event-time window — each ln term derives from two
    BIGINTs, cumulative window sums are sequentially evaluated in
    both engines, micro-rounded; a saturated step (d = n, survival
    hits exactly 0) is handled by a zero-count flag rather than
    ln(0), which Spark nulls and ANSI engines -inf.

    Scale shape: one user-keyed combinable aggregate (the only
    fact-table pass), a distinct-duration frame bounded by the
    observation span in lifetime ticks (a few hundred rows however
    large the corpus), and single-partition windows over that frame —
    the classic giant-input/tiny-state survival shape."""
    e = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    u = e.groupBy("user_id").agg(
        F.min(us).alias("first_us"), F.max(us).alias("last_us")
    )
    c = e.agg(F.max(us).alias("corpus_end"))
    d = u.crossJoin(F.broadcast(c)).select(
        F.floor(
            (F.col("last_us") - F.col("first_us")) / _US_PER_HOUR
        ).alias("t"),
        F.when(
            F.col("last_us") < F.col("corpus_end") - _KM_CENSOR_GAP_US, 1
        )
        .otherwise(0)
        .alias("churned"),
    )
    ev = d.groupBy("t").agg(
        F.sum("churned").cast("long").alias("n_churned"),
        F.count(F.lit(1)).cast("long").alias("ends"),
    )
    tot = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("t")
    km = ev.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("n") - F.coalesce(F.sum("ends").over(w_prev), F.lit(0)),
    )
    ratio = F.col("n_churned").cast("double") / F.col("n_risk")
    s = km.select(
        "t",
        "n_churned",
        "n_risk",
        F.sum(
            F.when(
                F.col("n_churned") < F.col("n_risk"), F.log(1.0 - ratio)
            ).otherwise(F.lit(0.0))
        )
        .over(w_cum)
        .alias("sumln"),
        F.sum(
            F.when(F.col("n_churned") == F.col("n_risk"), 1).otherwise(0)
        )
        .over(w_cum)
        .alias("n_zero"),
    )
    return s.filter(F.col("n_churned") > 0).select(
        F.col("t").alias("t_hours"),
        "n_risk",
        "n_churned",
        F.when(F.col("n_zero") > 0, F.lit(0).cast("long"))
        .otherwise(F.round(F.exp("sumln") * 1_000_000).cast("long"))
        .alias("surv_micro"),
    )


# ---------------------------------------------------------------------------
# Model evaluation — calibration reliability bins + expected calibration error
# ---------------------------------------------------------------------------
@query(
    "model_calibration_ece",
    oracle="""
    WITH s AS (
      SELECT o_orderkey % 1000 AS score_milli,
             CASE WHEN (CAST(ROUND(o_totalprice * 100) AS BIGINT) % 1000)
                       < (o_orderkey % 1000)
                  THEN 1 ELSE 0 END AS label
      FROM orders
    ),
    b AS (
      SELECT (score_milli * 10) // 1000 AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(score_milli) AS BIGINT) AS sum_s,
             CAST(SUM(label) AS BIGINT) AS n_pos
      FROM s GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM b)
    SELECT bin, n,
           CAST(ROUND(CAST(sum_s AS DOUBLE) / n * 1000) AS BIGINT)
             AS conf_micro,
           CAST(ROUND(CAST(n_pos AS DOUBLE) / n * 1000000) AS BIGINT)
             AS acc_micro,
           CAST(ROUND(
             CAST(n AS DOUBLE) / t.total
             * ABS(CAST(n_pos AS DOUBLE) / n
                   - CAST(sum_s AS DOUBLE) / n / 1000)
             * 1000000) AS BIGINT) AS ece_contrib_micro
    FROM b, t
    """,
)
def model_calibration_ece(spark, sf_dir):
    """Reliability diagram bins + expected calibration error (Guo et
    al., ICML'17) — the standard post-training check that a model's
    CONFIDENCE matches its ACCURACY, run here over a deterministic
    synthetic scorer so the binning/ECE algebra is hash-gated: score
    = ``o_orderkey % 1000`` milli-units, outcome = whether an
    independent key-derived residue falls under the score (making the
    scorer approximately calibrated BY CONSTRUCTION, with binomial
    noise the bins expose).  Ten equal-width bins emit n, mean
    confidence, empirical accuracy, and the bin's weighted
    ``|acc - conf|`` contribution; ECE = sum of the last column.

    Exactness: everything derives from integer sums per bin (counts,
    summed milli-scores, positives); the double divisions are
    identical both sides and micro-rounded.

    Scale shape: one scan, one 10-group combinable aggregate, a 1-row
    total broadcast back — eval cost is scan-bound at any corpus
    size, the property that lets an eval suite ride the same pass as
    ingest QC."""
    o = load(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 1000).alias("score_milli"),
        F.when(
            (F.round(F.col("o_totalprice") * 100).cast("long") % 1000)
            < (F.col("o_orderkey") % 1000),
            1,
        )
        .otherwise(0)
        .alias("label"),
    )
    b = o.groupBy(
        F.floor(F.col("score_milli") * 10 / 1000).cast("long").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("score_milli").cast("long").alias("sum_s"),
        F.sum("label").cast("long").alias("n_pos"),
    )
    t = b.agg(F.sum("n").cast("long").alias("total"))
    conf = F.col("sum_s").cast("double") / F.col("n") / 1000
    acc = F.col("n_pos").cast("double") / F.col("n")
    return b.crossJoin(F.broadcast(t)).select(
        "bin",
        "n",
        F.round(conf * 1_000_000).cast("long").alias("conf_micro"),
        F.round(acc * 1_000_000).cast("long").alias("acc_micro"),
        F.round(
            F.col("n").cast("double") / F.col("total")
            * F.abs(acc - conf)
            * 1_000_000
        )
        .cast("long")
        .alias("ece_contrib_micro"),
    )


def _lineitem_feature_frame(spark, sf_dir):
    """The three lineitem features as ONE exploded
    ``(feature, v_cents)`` frame — a single scan (the oracles' UNION
    ALL states the SEMANTICS; the plan should not re-scan the fact
    table per feature).  Integer units: quantity in hundredths,
    price in cents, discount in basis points."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("quantity").alias("feature"),
                    (F.col("l_quantity").cast("long") * 100).alias(
                        "v_cents"
                    ),
                ),
                F.struct(
                    F.lit("extendedprice").alias("feature"),
                    F.round(F.col("l_extendedprice") * 100)
                    .cast("long")
                    .alias("v_cents"),
                ),
                F.struct(
                    F.lit("discount").alias("feature"),
                    F.round(F.col("l_discount") * 10000)
                    .cast("long")
                    .alias("v_cents"),
                ),
            )
        ).alias("fv")
    ).select(
        F.col("fv.feature").alias("feature"),
        F.col("fv.v_cents").alias("v_cents"),
    )


# ---------------------------------------------------------------------------
# Shared primitive — two-pass banded exact selection over (feature, value)
# ---------------------------------------------------------------------------
class _BandedSelection:
    """Exact order statistics over a ``(feature string, v_cents long)``
    frame WITHOUT any sort — the ``lineitem_exact_quantiles`` two-pass
    banded-histogram selection (queries/core.py) packaged as a shared
    driver-side index, so every rank/threshold consumer
    (:func:`feature_quantile_normalize`, :func:`feature_winsorize_clip`)
    prices the same algebra instead of re-deriving it.

    Pass 1 (construction): one combinable (feature, band) aggregation
    (band = (v - lo) / width, width = range/n_bands) collecting
    <= |features| * n_bands (count, sum) rows to the driver.  Pass 2
    (:meth:`refine`): per exact-value counts ONLY inside the bands a
    consumer's ranks land in — the collect is bounded by
    value-domain/n_bands per band, a domain constant independent of
    row count.  Every public method then answers from exact BIGINT
    driver arithmetic.  No window, no range partition, no task ever
    holds more than a hash slice of one aggregation."""

    def __init__(self, f, n_bands: int = 4096):
        self._f = f
        self._n_bands = n_bands
        stats = {
            r["feature"]: (r["lo"], r["hi"])
            for r in f.groupBy("feature")
            .agg(F.min("v_cents").alias("lo"), F.max("v_cents").alias("hi"))
            .collect()
        }
        self.stats = stats
        self.width = {
            feat: max(1, (hi - lo) // n_bands + 1)
            for feat, (lo, hi) in stats.items()
        }
        # per-feature band id as ONE expression (a |features|-way CASE
        # on the feature tag — stays inside whole-stage codegen)
        band_expr = None
        for feat, (lo, _hi) in stats.items():
            leg = (
                (F.col("v_cents") - F.lit(lo)) / F.lit(self.width[feat])
            ).cast("long")
            band_expr = (
                F.when(F.col("feature") == feat, leg)
                if band_expr is None
                else band_expr.when(F.col("feature") == feat, leg)
            )
        self._band_expr = band_expr
        self.bands: dict[str, list] = {}
        self.totals: dict[str, tuple] = {}
        self._vals: dict[tuple, list] = {}
        if band_expr is None:
            return
        hist = (
            f.groupBy("feature", band_expr.alias("b"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("c"),
                F.sum("v_cents").cast("long").alias("s"),
            )
            .collect()
        )
        for r in hist:
            self.bands.setdefault(r["feature"], []).append(
                (int(r["b"]), r["c"], r["s"])
            )
        for feat, bl in self.bands.items():
            bl.sort()
            self.totals[feat] = (
                sum(c for _, c, _ in bl),
                sum(s for _, _, s in bl),
            )

    @property
    def empty(self) -> bool:
        return self._band_expr is None

    def band_of_rank(self, feat: str, r: int) -> int | None:
        """The band holding the r-th smallest value (1-based)."""
        acc = 0
        for b, c, _s in self.bands[feat]:
            if acc + c >= r:
                return b
            acc += c
        return None

    def band_of_value(self, feat: str, v: int) -> int:
        return (v - self.stats[feat][0]) // self.width[feat]

    def refine(self, need: dict[str, set]) -> None:
        """Pass 2: exact per-value counts inside the named bands (a
        second combinable aggregation over the same frame)."""
        need = {feat: hit for feat, hit in need.items() if hit}
        if not need:
            return
        flt = None
        for feat, hit in need.items():
            leg = (F.col("feature") == feat) & self._band_expr.isin(
                sorted(hit)
            )
            flt = leg if flt is None else flt | leg
        fine = (
            self._f.filter(flt)
            .groupBy("feature", self._band_expr.alias("b"), "v_cents")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .collect()
        )
        for r in fine:
            self._vals.setdefault((r["feature"], int(r["b"])), []).append(
                (r["v_cents"], r["c"])
            )
        for k in self._vals:
            self._vals[k].sort()

    def prefix_sum(self, feat: str, r: int) -> int:
        """Exact BIGINT sum of the r smallest values of ``feat`` (the
        rank's band must have been :meth:`refine`-d)."""
        n, total = self.totals[feat]
        if r <= 0:
            return 0
        if r >= n:
            return total
        acc_c, acc_s = 0, 0
        for b, c, s in self.bands[feat]:
            if acc_c + c < r:
                acc_c += c
                acc_s += s
                continue
            within = r - acc_c
            wc, ws = 0, 0
            for v, cv in self._vals[(feat, b)]:
                if wc + cv <= within:
                    wc += cv
                    ws += v * cv
                else:
                    ws += (within - wc) * v
                    break
            return acc_s + ws
        return total

    def value_at(self, feat: str, r: int) -> int:
        """The r-th smallest value (1-based; lower-quantile selection
        convention; band must have been refined)."""
        acc_c = 0
        for b, c, _s in self.bands[feat]:
            if acc_c + c < r:
                acc_c += c
                continue
            within = r - acc_c
            wc = 0
            for v, cv in self._vals[(feat, b)]:
                wc += cv
                if wc >= within:
                    return v
            break
        raise IndexError(f"rank {r} out of range for {feat}")

    def below(self, feat: str, v0: int, inclusive: bool) -> tuple:
        """Exact ``(count, sum)`` of values < v0 (or <= v0) — v0's band
        must have been refined."""
        b0 = self.band_of_value(feat, v0)
        acc_c, acc_s = 0, 0
        for b, c, s in self.bands[feat]:
            if b < b0:
                acc_c += c
                acc_s += s
        for v, cv in self._vals.get((feat, b0), []):
            if v < v0 or (inclusive and v == v0):
                acc_c += cv
                acc_s += v * cv
        return acc_c, acc_s


# ---------------------------------------------------------------------------
# Feature prep — cross-feature quantile-normalization map
# ---------------------------------------------------------------------------
_QN_BUCKETS = 100


@query(
    "feature_quantile_normalize",
    oracle=f"""
    WITH f AS (
      SELECT 'quantity' AS feature,
             CAST(l_quantity AS BIGINT) * 100 AS v_cents,
             l_orderkey AS k1, l_linenumber AS k2 FROM lineitem
      UNION ALL
      SELECT 'extendedprice', CAST(ROUND(l_extendedprice * 100) AS BIGINT),
             l_orderkey, l_linenumber FROM lineitem
      UNION ALL
      SELECT 'discount', CAST(ROUND(l_discount * 10000) AS BIGINT),
             l_orderkey, l_linenumber FROM lineitem
    ),
    b AS (
      SELECT feature, v_cents,
             NTILE({_QN_BUCKETS}) OVER (
               PARTITION BY feature ORDER BY v_cents, k1, k2) AS bucket
      FROM f
    ),
    m AS (
      SELECT feature, bucket, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v_cents) AS BIGINT) AS sum_cents
      FROM b GROUP BY feature, bucket
    ),
    t AS (
      SELECT bucket,
             SUM(CAST(sum_cents AS DOUBLE) / n) / COUNT(*) AS target
      FROM m GROUP BY bucket
    )
    SELECT m.feature, m.bucket, m.n,
           CAST(ROUND(CAST(m.sum_cents AS DOUBLE) / m.n * 10) AS BIGINT)
             AS mean_milli,
           CAST(ROUND(t.target * 10) AS BIGINT) AS target_milli
    FROM m JOIN t USING (bucket)
    """,
)
def feature_quantile_normalize(spark, sf_dir):
    """Quantile-normalization map across three lineitem features
    (Bolstad et al. 2003 — the cross-sample calibration genomics and
    feature-store pipelines apply before mixing scales): each feature
    is ranked into ``_QN_BUCKETS`` equal-count buckets
    (deterministic NTILE with a total order), and a bucket's TARGET
    value is the cross-feature mean of the per-feature bucket means —
    emit the per-(feature, bucket) mapping table (count, own mean,
    shared target), which IS the transform a serving layer applies by
    range lookup.

    Exactness: values enter as exact integer cents/basis-points, so
    bucket sums are BIGINTs; the two double divisions are identical
    both sides, milli-rounded.  The oracle's NTILE tie-break on
    (orderkey, linenumber) is a total order, but the AGGREGATED
    output is tie-break-INVARIANT: rows straddling a bucket boundary
    all carry the identical v_cents (only equal values can tie), so
    per-bucket counts are fixed by the NTILE size rule and per-bucket
    sums are fixed by value — which concrete rows land where cannot
    change either.  That invariance is what lets the plan drop the
    rank pass entirely.

    Scale shape (the ``lineitem_exact_quantiles`` two-pass selection,
    generalized to all ``_QN_BUCKETS - 1`` boundary ranks per feature
    and shared as :class:`_BandedSelection` with
    :func:`feature_winsorize_clip`): pass 1 is one union scan + a map-side-combinable
    (feature, band) histogram (<= 3 x 4096 rows to the driver); the
    driver walks each feature's band prefix to place the 99 NTILE
    boundary ranks (SQL remainder rule: bucket i holds q+1 rows for
    i <= n mod B, else q); pass 2 re-scans ONLY the boundary bands
    and aggregates per exact value (collect bounded by
    value-domain/4096 per band — a domain constant, independent of
    row count); exact BIGINT prefix sums at the boundaries then yield
    every bucket's (n, sum) by subtraction.  No sort, no window over
    a 3-value partition key (the previous NTILE-window plan put a
    third of the fact table in ONE task at any scale — a window
    PARTITION is hash-distributed, not range-split).  The emitted MAP
    is constant-size regardless of corpus rows; the 300-row moment
    frame computes the cross-feature target with the same window
    expression as before so rounding is bit-identical."""
    f = _lineitem_feature_frame(spark, sf_dir)
    out_schema = (
        "feature string, bucket int, n long, sum_cents long"
    )
    sel = _BandedSelection(f)
    if sel.empty:
        m = spark.createDataFrame([], out_schema)
    else:
        # place each feature's NTILE boundary ranks in a band
        # (SQL remainder rule: cum_i = i*q + min(i, rem))
        ranks: dict[str, list] = {}
        need: dict[str, set] = {}
        for feat, (n, _total) in sel.totals.items():
            q, rem = divmod(n, _QN_BUCKETS)
            cuts = [i * q + min(i, rem) for i in range(1, _QN_BUCKETS)]
            ranks[feat] = cuts
            need[feat] = {
                b
                for r in cuts
                if r > 0 and (b := sel.band_of_rank(feat, r)) is not None
            }
        sel.refine(need)
        rows = []
        for feat, cuts in ranks.items():
            n, _total = sel.totals[feat]
            edges = [0] + cuts + [n]
            for i in range(_QN_BUCKETS):
                lo_r, hi_r = edges[i], edges[i + 1]
                if hi_r == lo_r:  # n < B: NTILE emits no empty buckets
                    continue
                rows.append(
                    (
                        feat,
                        i + 1,
                        hi_r - lo_r,
                        sel.prefix_sum(feat, hi_r)
                        - sel.prefix_sum(feat, lo_r),
                    )
                )
        m = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), out_schema
        )
    # cross-feature target per bucket as a WINDOW over the 300-row
    # moment frame — identical expression (and rounding) to the
    # oracle's t-CTE join
    mean = F.col("sum_cents").cast("double") / F.col("n")
    target = F.avg(mean).over(Window.partitionBy("bucket"))
    return m.select(
        "feature",
        "bucket",
        "n",
        F.round(mean * 10).cast("long").alias("mean_milli"),
        F.round(target * 10).cast("long").alias("target_milli"),
    )


# ---------------------------------------------------------------------------
# Feature prep — exact winsorization clip map (p1/p99)
# ---------------------------------------------------------------------------
_WINSOR_PCT = 1  # clip percentile (symmetric: p1 / p99)


@query(
    "feature_winsorize_clip",
    oracle=f"""
    WITH f AS (
      SELECT 'quantity' AS feature,
             CAST(l_quantity AS BIGINT) * 100 AS v FROM lineitem
      UNION ALL
      SELECT 'extendedprice', CAST(ROUND(l_extendedprice * 100) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'discount', CAST(ROUND(l_discount * 10000) AS BIGINT)
      FROM lineitem
    ),
    o AS (
      SELECT feature, v,
             ROW_NUMBER() OVER (PARTITION BY feature ORDER BY v) AS rn
      FROM f
    ),
    n AS (SELECT feature, CAST(COUNT(*) AS BIGINT) AS n
          FROM f GROUP BY feature),
    k AS (
      SELECT feature, n,
             ({_WINSOR_PCT} * n + 99) // 100 AS k_lo,
             ((100 - {_WINSOR_PCT}) * n + 99) // 100 AS k_hi
      FROM n
    ),
    b AS (
      SELECT k.feature, k.n, lo.v AS lo_v, hi.v AS hi_v
      FROM k
      JOIN o lo ON lo.feature = k.feature AND lo.rn = k.k_lo
      JOIN o hi ON hi.feature = k.feature AND hi.rn = k.k_hi
    ),
    c AS (
      SELECT f.feature,
             CAST(SUM(CASE WHEN f.v < b.lo_v THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_clip_lo,
             CAST(SUM(CASE WHEN f.v > b.hi_v THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_clip_hi,
             CAST(SUM(CASE WHEN f.v < b.lo_v THEN b.lo_v
                           WHEN f.v > b.hi_v THEN b.hi_v
                           ELSE f.v END) AS BIGINT) AS sum_clip
      FROM f JOIN b USING (feature) GROUP BY f.feature
    )
    SELECT b.feature, b.n, b.lo_v AS lo_cents, b.hi_v AS hi_cents,
           c.n_clip_lo, c.n_clip_hi,
           CAST(ROUND(CAST(c.sum_clip AS DOUBLE) / b.n * 10) AS BIGINT)
             AS mean_clip_milli
    FROM b JOIN c USING (feature)
    """,
)
def feature_winsorize_clip(spark, sf_dir):
    """Exact winsorization map for the three lineitem features: the
    p1/p99 clip bounds (``_WINSOR_PCT``, lower-quantile selection
    ``k = ceil(q*n)`` — the repo's order-statistic convention), the
    count clipped at each tail, and the post-clip mean — the
    outlier-robust scaling a feature store applies before
    standardization (winsorizing beats dropping when tails carry
    label signal).

    Exactness: integer units in, the clip bounds are SELECTED values
    (exact order statistics), tail counts and the clipped sum are
    exact BIGINT driver arithmetic off the same band/value tables,
    and the one double division is evaluated by the identical
    expression both sides, milli-rounded.

    Scale shape: rides :class:`_BandedSelection` — the SAME two
    combinable aggregation passes :func:`feature_quantile_normalize`
    prices (pass 1 per-(feature, band) histogram, pass 2 per-value
    counts inside the <= 2 boundary bands per feature), then pure
    driver arithmetic: ``sum_clip = lo*|v<lo| + (sum<=hi - sum<lo) +
    hi*(n - |v<=hi|)``.  The oracle's ROW_NUMBER shape would cost a
    full per-feature sort at cluster scale; this plan never sorts
    anything.  The emitted map is |features| rows regardless of
    corpus size."""
    f = _lineitem_feature_frame(spark, sf_dir)
    out_schema = (
        "feature string, n long, lo_cents long, hi_cents long,"
        " n_clip_lo long, n_clip_hi long, sum_clip long"
    )
    sel = _BandedSelection(f)
    if sel.empty:
        m = spark.createDataFrame([], out_schema)
    else:
        ks = {}
        need: dict[str, set] = {}
        for feat, (n, _total) in sel.totals.items():
            k_lo = (_WINSOR_PCT * n + 99) // 100
            k_hi = ((100 - _WINSOR_PCT) * n + 99) // 100
            ks[feat] = (k_lo, k_hi)
            need[feat] = {
                b
                for r in (k_lo, k_hi)
                if r > 0 and (b := sel.band_of_rank(feat, r)) is not None
            }
        sel.refine(need)
        rows = []
        for feat, (k_lo, k_hi) in ks.items():
            n, _total = sel.totals[feat]
            lo_v = sel.value_at(feat, k_lo)
            hi_v = sel.value_at(feat, k_hi)
            c_lt_lo, s_lt_lo = sel.below(feat, lo_v, inclusive=False)
            c_le_hi, s_le_hi = sel.below(feat, hi_v, inclusive=True)
            sum_clip = (
                lo_v * c_lt_lo
                + (s_le_hi - s_lt_lo)
                + hi_v * (n - c_le_hi)
            )
            rows.append(
                (feat, n, lo_v, hi_v, c_lt_lo, n - c_le_hi, sum_clip)
            )
        m = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), out_schema
        )
    return m.select(
        "feature",
        "n",
        "lo_cents",
        "hi_cents",
        "n_clip_lo",
        "n_clip_hi",
        F.round(F.col("sum_clip").cast("double") / F.col("n") * 10)
        .cast("long")
        .alias("mean_clip_milli"),
    )


# ---------------------------------------------------------------------------
# Feature prep — hashing-trick cross-feature buckets
# ---------------------------------------------------------------------------
_HASH_CROSS_BUCKETS = 64


@query(
    "feature_hash_cross",
    oracle=f"""
    WITH k AS (
      SELECT CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment AS ck
      FROM customer
    ),
    h AS (
      SELECT ck,
             CAST(('0x' || substr(md5(ck), 1, 8))::UBIGINT
                  % {_HASH_CROSS_BUCKETS} AS BIGINT) AS bucket,
             CAST(('0x' || substr(md5('s#' || ck), 1, 8))::UBIGINT % 2
                  AS BIGINT) * 2 - 1 AS sgn,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM k GROUP BY ck
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_crosses,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(SUM(sgn * c) AS BIGINT) AS signed_sum
    FROM h GROUP BY bucket
    """,
)
def feature_hash_cross(spark, sf_dir):
    """The hashing trick for categorical feature crosses (Weinberger
    et al. 2009): nation x market-segment crosses hashed into
    ``_HASH_CROSS_BUCKETS`` buckets with an independent sign hash, so
    the feature vector is fixed-width no matter how many distinct
    crosses exist — THE standard way a training pipeline encodes
    unbounded categorical interactions.  Emits the bucket table a
    trainer consumes (signed counts) plus the collision diagnostic
    (distinct crosses per bucket).

    Determinism: md5-derived bucket and sign (the stratified_sample
    convention — Spark and DuckDB implement md5 identically, xxhash64
    exists only on one side), all outputs exact BIGINTs; the sign
    hash salts the key ('s#' prefix) so sign and bucket are
    independent, the property the trick's unbiasedness proof needs.

    Scale shape: pre-aggregate by (cross key) first — the sign/bucket
    hashes price ONCE per distinct cross, not per row — then one
    bucket-keyed combinable agg to the fixed-width table.  At 100 TB
    both shuffles move |distinct crosses| and |buckets| rows."""
    c = load(spark, sf_dir, "customer")
    ck = F.concat_ws(
        "|", F.col("c_nationkey").cast("string"), F.col("c_mktsegment")
    )
    k = c.select(ck.alias("ck"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("ck")), 1, 8), 16, 10)
        .cast("long")
        % _HASH_CROSS_BUCKETS
    )
    sgn = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("s#"), F.col("ck"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 2
    ) * 2 - 1
    h = k.groupBy("ck").agg(F.count(F.lit(1)).cast("long").alias("c"))
    h = h.select(
        bucket.alias("bucket"), sgn.alias("sgn"), "c"
    )
    return h.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_crosses"),
        F.sum("c").cast("long").alias("n_rows"),
        F.sum(F.col("sgn") * F.col("c")).cast("long").alias("signed_sum"),
    )


# ---------------------------------------------------------------------------
# Ranking evaluation — tie-corrected ROC-AUC from per-score aggregates
# ---------------------------------------------------------------------------
@query(
    "roc_auc_eval",
    oracle="""
    WITH s AS (
      SELECT o_orderkey % 1000 AS score,
             CASE WHEN (CAST(ROUND(o_totalprice * 100) AS BIGINT) % 1000)
                       < (o_orderkey % 1000)
                  THEN 1 ELSE 0 END AS label
      FROM orders
    ),
    g AS (
      SELECT score,
             CAST(SUM(label) AS BIGINT) AS n_pos,
             CAST(COUNT(*) - SUM(label) AS BIGINT) AS n_neg
      FROM s GROUP BY 1
    ),
    w AS (
      SELECT n_pos, n_neg,
             COALESCE(SUM(n_neg) OVER (
               ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below
      FROM g
    )
    SELECT CAST(SUM(n_pos) AS BIGINT) AS n_pos,
           CAST(SUM(n_neg) AS BIGINT) AS n_neg,
           CAST(COUNT(*) AS BIGINT) AS n_scores,
           CAST(ROUND(CAST(SUM(n_pos * (2 * below + n_neg)) AS DOUBLE)
                      / (2.0 * SUM(n_pos) * SUM(n_neg)) * 1000000)
                AS BIGINT) AS auc_micro,
           CAST(ROUND((CAST(SUM(n_pos * (2 * below + n_neg)) AS DOUBLE)
                       / (CAST(SUM(n_pos) AS DOUBLE) * SUM(n_neg)) - 1)
                      * 1000000) AS BIGINT) AS gini_micro
    FROM w
    """,
)
def roc_auc_eval(spark, sf_dir):
    """Tie-corrected ROC-AUC (Mann-Whitney U with 0.5 credit for
    score ties — Hanley & McNeil 1982) of the repo's deterministic
    calibrated scorer (the ``model_calibration_ece`` construction:
    score = key residue in 0..999, outcome = an independent
    price-derived residue under the score — positives' score density
    rises linearly while negatives' falls, so the true AUC is 5/6 by
    construction and the readout is hash-gated).

    The pair-counting identity makes AUC a SCAN-SHAPED statistic:
    AUC = sum_s n_pos(s) * (N_neg_below(s) + n_neg(s)/2) / (P*N)
    needs only the per-score (n_pos, n_neg) AGGREGATE — never the
    O(P*N) pair materialization and never a global rank over raw
    rows.  Kept exact as the integer 2U = sum n_pos*(2*below + n_neg)
    with the single double division micro-rounded at the end; gini =
    2*AUC - 1 rides the same integers.

    Scale shape: one scan into a combinable per-score aggregate
    (|distinct scores| = score-grid cells, 1000 here — bounded by the
    model's output quantization, NOT the corpus), one ordered prefix
    sum over that tiny frame, one final 1-row fold.  The eval costs
    the same pass whether the scored corpus is 150k rows or 100 TB."""
    o = load(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 1000).alias("score"),
        F.when(
            (F.round(F.col("o_totalprice") * 100).cast("long") % 1000)
            < (F.col("o_orderkey") % 1000),
            1,
        )
        .otherwise(0)
        .alias("label"),
    )
    g = o.groupBy("score").agg(
        F.sum("label").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("label")).cast("long").alias("n_neg"),
    )
    below = F.coalesce(
        F.sum("n_neg").over(
            Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    w = g.select("n_pos", "n_neg", below.alias("below"))
    u2 = F.sum(
        F.col("n_pos") * (F.lit(2) * F.col("below") + F.col("n_neg"))
    ).cast("long")
    np_ = F.sum("n_pos").cast("long")
    nn_ = F.sum("n_neg").cast("long")
    return w.agg(
        np_.alias("n_pos"),
        nn_.alias("n_neg"),
        F.count(F.lit(1)).cast("long").alias("n_scores"),
        F.round(
            u2.cast("double") / (F.lit(2.0) * np_ * nn_) * 1_000_000
        )
        .cast("long")
        .alias("auc_micro"),
        F.round(
            (u2.cast("double") / (np_.cast("double") * nn_) - F.lit(1))
            * 1_000_000
        )
        .cast("long")
        .alias("gini_micro"),
    )
