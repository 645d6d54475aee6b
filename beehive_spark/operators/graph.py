"""Iterative hierarchy traversal — the Spark replacement for the
reference's recursive user-creation-tree walk (J9,
person-users.js:568-601 ``createUserTree`` + 746-770
``traverseUserTree``).

The reference recurses row-at-a-time over ``users.creator``; here the
whole frontier advances per iteration as one distributed join, so a
hierarchy over N rows costs depth-many joins, not N queries.  Each
level is ``localCheckpoint``-ed to cut the growing lineage (the classic
iterative-algorithm trap on Spark) and the loop terminates on an empty
frontier, exactly like a recursive CTE.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@contextmanager
def _iter_loop_confs(sess, target_partitions: int | None):
    """Pin small shuffle partitions and disable AQE around an EAGER
    iterative loop, restoring both on exit — shared by ``pagerank``
    and ``connected_components_twophase`` (r5 review: the save/set/
    finally dance was duplicated and would drift).

    Rationale: per-round frames in these loops are known-small, so
    AQE's per-stage re-planning (~0.5 s per tiny round measured at
    |V|=20 k) and session-sized shuffles are pure overhead; pass
    ``None`` (the big-graph path) to leave the session untouched so
    AQE keeps handling skew where it earns its keep.  The clamp never
    RAISES the session's partition count."""
    if target_partitions is None:
        yield
        return
    old_shuf = sess.conf.get("spark.sql.shuffle.partitions")
    old_aqe = sess.conf.get("spark.sql.adaptive.enabled")
    try:
        sess.conf.set(
            "spark.sql.shuffle.partitions",
            str(min(int(old_shuf), max(8, target_partitions))),
        )
        sess.conf.set("spark.sql.adaptive.enabled", "false")
        yield
    finally:
        sess.conf.set("spark.sql.shuffle.partitions", old_shuf)
        sess.conf.set("spark.sql.adaptive.enabled", old_aqe)


def bfs_levels(
    roots: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    child_col: str = "child_id",
    max_depth: int = 64,
) -> DataFrame:
    """Breadth-first depth assignment over a parent->child edge set.

    roots:  DataFrame with ``id_col`` — the depth-0 nodes.
    edges:  DataFrame with ``parent_col``, ``child_col``.
    Returns (id, depth) for every node reachable from the roots;
    a node reachable at several depths keeps its first (minimum)
    depth, matching recursive-CTE-with-DISTINCT semantics on trees
    and DAGs alike.
    """
    frontier = roots.select(F.col(id_col).cast("long").alias("id")).distinct()
    result = frontier.withColumn("depth", F.lit(0))
    seen = frontier
    for depth in range(1, max_depth + 1):
        nxt = (
            edges.join(
                frontier.select(F.col("id").alias(parent_col)),
                parent_col,
            )
            .select(F.col(child_col).cast("long").alias("id"))
            .distinct()
            .join(seen, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        result = result.unionByName(nxt.withColumn("depth", F.lit(depth)))
        seen = seen.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return result


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    broadcast_labels_rows: int = 100_000,
) -> DataFrame:
    """Connected components over an undirected edge list: every node is
    labeled with the MINIMUM node id reachable from it (the canonical
    representative), via distributed min-label propagation.

    Returns (id, component) for every node appearing in ``edges``.

    Shape per iteration: one equi-join of the static symmetrized edge
    list against the current (id, label) frame plus one min-aggregation
    — two bounded shuffles on the edge partitioning, no driver-side
    graph state.  Lineage is cut every iteration with an eager
    ``localCheckpoint`` (the iterative-algorithm trap: without it the
    plan doubles per round), and convergence is detected with a
    count of changed labels (a cheap aggregate on the node frame).

    Two per-round join strategies, picked by |V| (the same split as
    :func:`pagerank`, r11 measured): at or below
    ``broadcast_labels_rows`` the label frame BROADCASTS into the
    persisted edge list (the 2|E|-row side never moves) and the loop
    runs under loop-scoped shuffle-partition/AQE confs sized to |V|
    (``_iter_loop_confs``) — per-round AQE re-planning and
    session-sized shuffles are pure overhead when every frame in the
    loop is known-small (3.1 s -> 1.3 s on the 256-edge dedup-cluster
    graph at sf0.1); above it, the r4 edge-stationary shape — the
    persisted hash-partitioned+sorted edge list stays put and the
    |V|-row label frame re-shuffles to meet it each round — with the
    session's own confs so AQE keeps handling skew.

    Iteration count is bounded by the component DIAMETER, not its
    size.  For the dedup-clustering workload this is built for —
    near-duplicate document groups, which are dense, clique-ish
    clusters of diameter ~2-3 — label propagation converges in a
    handful of rounds at any corpus size.  For adversarial
    high-diameter graphs (long chains), the alternating
    large-star/small-star algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14) converges in
    O(log^2 n) rounds and is the drop-in upgrade; its per-round cost
    is higher (it rewrites the edge set each round), which is why the
    diameter-bounded variant is the default here.

    Reference scope: net-new (the reference walks its creator tree
    row-at-a-time, person-users.js:568-601; this generalizes the same
    reachability semantics to arbitrary undirected graphs).
    """
    # dedup FIRST on the canonical half, DOUBLE after (r12, guide §2.3
    # shuffle-fewer-bytes): the former symmetrize-then-repartition-
    # then-dedup shape evaluated the edge construction TWICE (the
    # fwd/rev union gets no common-subexpression sharing) and pushed
    # the RAW symmetric multiset through a repartition that does no
    # map-side combining.  Canonical distinct exchanges the raw half
    # once WITH partial aggregation, the explode emits both directions
    # from that single deduped branch, and the layout exchange then
    # carries exactly 2|E| deduped rows.  The explicit count pins the
    # exchange against AQE byte-coalescing (poisson_bootstrap_ci
    # lesson).  Persisted hash-partitioned AND sorted on the per-round
    # join key, so each round's sort-merge join neither re-exchanges
    # nor re-sorts the edge side — only the (id, label) frame moves
    # (same edge-stationary shape as `pagerank`'s link table).
    ca = F.col(src).cast("long")
    cb = F.col(dst).cast("long")
    half = (
        edges.select(F.least(ca, cb).alias("a"), F.greatest(ca, cb).alias("b"))
        .dropDuplicates()
    )
    fwd = F.struct(F.col("a").alias("a"), F.col("b").alias("b"))
    rev = F.struct(F.col("b").alias("a"), F.col("a").alias("b"))
    e = (
        half.select(
            # self-loops (kept: a node seen only in self-loops still
            # labels itself) double to the same row — emit them once
            # so the frame stays exactly deduped
            F.explode(
                F.when(F.col("a") == F.col("b"), F.array(fwd)).otherwise(
                    F.array(fwd, rev)
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .repartition(
            int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions")),
            "b",
        )
        .sortWithinPartitions("b")
        .persist()
    )
    labels = (
        e.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    n = labels.count()  # scalar |V| (materializes e en route); sizes the loop
    use_bcast = n <= broadcast_labels_rows
    with _iter_loop_confs(
        edges.sparkSession, n // 2500 if use_bcast else None
    ):
        if use_bcast:
            # re-lay the static edge list on the AGGREGATION key once
            # (the r11 pagerank move): the broadcast join preserves
            # the stream side's partitioning, so the per-round min
            # needs no exchange — rounds become zero-shuffle jobs.
            # The b layout only served the SMJ path's per-round join
            # (a broadcast join doesn't care) and the ingest dedup
            # (already paid).
            e_a = e.repartition(
                int(
                    edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
                ),
                "a",
            ).persist()
            e_a.count()
            e.unpersist()
            e = e_a
        for _ in range(max_iter):
            lab_b = labels.withColumnRenamed("id", "b")
            if use_bcast:
                lab_b = F.broadcast(lab_b)
            nbr_min = (
                e.join(lab_b, "b")
                .groupBy(F.col("a").alias("id"))
                .agg(F.min("component").alias("nbr_component"))
            )
            if use_bcast:
                nbr_min = F.broadcast(nbr_min)
            updated = (
                labels.join(nbr_min, "id", "left")
                .select(
                    "id",
                    F.least(
                        "component", F.coalesce("nbr_component", "component")
                    ).alias("component"),
                    (F.col("nbr_component") < F.col("component")).alias("changed"),
                )
                .localCheckpoint(eager=True)
            )
            n_changed = updated.filter("changed").count()
            labels = updated.drop("changed")
            if n_changed == 0:
                break
    e.unpersist()
    return labels


def connected_components_twophase(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 40,
) -> DataFrame:
    """Connected components by ALTERNATING large-star / small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the high-diameter complement to
    :func:`connected_components`: label propagation needs diameter-many
    rounds (a 10k-long chain needs 10k), while star operations halve
    path lengths aggressively and converge in O(log^2 n) rounds on ANY
    topology.  Per-round cost is higher (the EDGE SET is rewritten
    each round, where propagation only moves the node-label frame),
    which is why this is the explicit choice for chain/mesh-shaped
    graphs and propagation stays the default for clique-ish dedup
    clusters.

    Returns (id, component) with component = min reachable id, same
    contract as :func:`connected_components`.

    Per round, both phases compute their neighborhood minimum as a
    WINDOW min over partitionBy(u) instead of the former
    groupBy(u)+self-join: the min rides each row, so the phase needs
    no join at all and consumes its input exactly once — which also
    lets the two phases FUSE into one plan with a single eager
    ``localCheckpoint`` per round (the former large-star checkpoint
    existed only because groupBy+join consumed `large` twice; r11
    interleaved A/B at sf0.1: 6.54 -> 4.46 s).  The small-star
    "(u, m)" self-attachment row is emitted by the same pass — an
    exploded 2-element array on the one row per group where v == m —
    so the phase is one window + one projection.  All shuffles are on
    node keys, no driver-side graph state.  SKEW CAVEAT: unlike the
    former groupBy (which partial-aggregated map-side), a window min
    must sort ALL of a key's rows inside one task — in late rounds a
    component's minimum becomes a hub whose partition holds
    ~|component| rows, so one huge component serializes into a single
    task.  That is acceptable for this operator's stated niche
    (chain/mesh graphs, whose stars stay narrow until the final
    rounds, when the edge set has already collapsed to ~|V| rows);
    for clique-ish inputs with giant components keep the propagation
    default, whose groupBy min partial-aggregates.  Convergence = the
    small-star output is edge-for-edge identical to the previous
    round's (detected with an order-insensitive xxhash64-sum + count
    over the edge frame: two scalar aggs, no exceptAll pass; collision
    odds are ~2^-64 per round and the cap backstops).

    - large-star(u): m = min(neighbors(u) ∪ {u}); every neighbor
      v > u re-attaches to m.
    - small-star(u): m = min({v in neighbors(u) : v < u} ∪ {u});
      every neighbor v < u (and u itself, when u != m) attaches to m.
    """
    sess = edges.sparkSession
    # node UNIVERSE before any filtering: a node appearing only in
    # self-loop edges still exists and labels itself (r5 review —
    # matching connected_components, which keeps such nodes)
    nodes = (
        edges.select(F.col(src).cast("long").alias("id"))
        .union(edges.select(F.col(dst).cast("long").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # CANONICAL representation invariant: `attach` always holds u > v
    # distinct edges, so the full symmetric neighborhood view is a
    # plain dup-free union with its swap — built DIRECTLY via
    # greatest/least (the former symmetric-`both` frame existed only
    # to derive this and cost a second 2|E|-row materialization)
    attach = (
        edges.select(
            F.greatest(
                F.col(src).cast("long"), F.col(dst).cast("long")
            ).alias("u"),
            F.least(F.col(src).cast("long"), F.col(dst).cast("long")).alias(
                "v"
            ),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = 2 * attach.count()  # symmetric view size; sizes the loop confs
    prev_sig = None
    converged = n_edges == 0
    # iterative rounds over a frame bounded by |E| drown in per-stage
    # AQE re-planning and oversized shuffles when the graph is small;
    # at cluster scale the threshold keeps the session's own settings
    loop_parts = n_edges // 250_000 if n_edges <= 50_000_000 else None
    w = Window.partitionBy("u")
    with _iter_loop_confs(sess, loop_parts):
        for _ in range(max_iter):
            e = attach.union(
                attach.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            # --- large-star: neighbors above u hook onto u's global
            # min, computed as a window min riding every row (no
            # groupBy+self-join).  m <= u < v always, so the output is
            # ALREADY canonical (new u = old v > new v = m).  Dup
            # (u, v) rows here are the same graph to small-star's min,
            # and the final distinct dedupes — so no distinct (and no
            # checkpoint) between the phases.
            em = e.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
            large = (
                em.filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v"))
            )
            # --- small-star: each node's DOWNWARD neighborhood is
            # exactly its canonical rows, so small-star reads `large`
            # directly — the swapped copies would only add upward
            # edges the phase ignores.  Every row emits (v, m); the
            # one row per group where v == m also emits the (u, m)
            # self-attachment the phase requires.
            lm = large.withColumn("m", F.min("v").over(w))
            pair = F.struct(F.col("v").alias("a"), F.col("m").alias("b"))
            selfpair = F.struct(F.col("u").alias("a"), F.col("m").alias("b"))
            attach = (
                lm.select(
                    F.explode(
                        F.when(
                            F.col("v") == F.col("m"), F.array(pair, selfpair)
                        ).otherwise(F.array(pair))
                    ).alias("p")
                )
                .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .filter(F.col("a") != F.col("b"))
                .select(
                    F.greatest("a", "b").alias("u"),
                    F.least("a", "b").alias("v"),
                )
                .distinct()
                .localCheckpoint(eager=True)
            )
            sig = attach.agg(
                F.count(F.lit(1)).alias("n"),
                # decimal accumulator: an int64 sum of 64-bit hashes
                # overflows (ANSI error), decimal(38,0) cannot
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
            ).first()
            if prev_sig is not None and sig == prev_sig:
                converged = True
                break
            prev_sig = sig
    if not converged:
        # mid-convergence ``attach`` edges point at arbitrary smaller
        # ids, so truncated labels are wrong AND internally
        # inconsistent — raising mirrors kcore's round-cap contract
        raise RuntimeError(
            f"connected_components_twophase: star rounds did not reach "
            f"a fixed point within {max_iter} iterations (expected "
            "O(log^2 n) — raise max_iter for this topology)"
        )
    # converged: every attach edge is (node, component-min); nodes that
    # ARE their component's min appear only on the v side — or not at
    # all (component minima, self-loop-only and isolated-pair nodes):
    # anti-joining the UNFILTERED universe labels all of those selves
    labels = attach.select(
        F.col("u").alias("id"), F.col("v").alias("component")
    ).union(
        nodes.join(
            attach.select(F.col("u").alias("id")),
            "id",
            "left_anti",
        ).select("id", F.col("id").alias("component"))
    )
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    tol: float | None = 1e-6,
    no_dangling: bool = False,
    broadcast_ranks_rows: int = 100_000,
) -> DataFrame:
    """PageRank over a directed edge list — distributed power
    iteration as pure DataFrame ops (the classic iterative-algorithm
    benchmark; Page et al. 1999; the Spark-idiomatic shape follows the
    GraphX/Pregel aggregate-messages pattern re-expressed on
    DataFrames).

    Returns (id, rank) for every node appearing in ``edges``; ranks
    sum to 1.0 (dangling-node mass is redistributed uniformly each
    round, the standard stochastic-matrix correction, so the result
    is a true probability distribution and iteration count is the
    only approximation).

    Shape per iteration: one equi-join of the static out-degree-
    annotated edge list against the current rank frame (a shuffle on
    src), one sum-aggregation on dst (map-side combined), plus a
    1-row dangling-mass aggregate cross-joined back (broadcast of a
    scalar — no driver round-trip in the lineage).  Lineage is cut
    per round with an eager ``localCheckpoint``; the edge list is
    computed once and persisted.  Cost per round is independent of
    round number — the survival criterion for any 100 TB iterative
    job.

    ``iters`` is a CAP, not a schedule: when ``tol`` is set (default
    1e-6) iteration stops as soon as the L1 rank delta
    ``sum(|rank - prev|)`` falls below it — the standard power-method
    convergence test.  The delta rides on the aggregate already
    computed each round (one extra tiny sum over the checkpointed rank
    frame, no extra pass over edges), and on well-connected graphs it
    typically halves the fixed-iteration cost.  Pass ``tol=None`` for
    exactly ``iters`` rounds (the reproducible-benchmark mode).

    ``no_dangling=True`` is a caller ASSERTION that every node has at
    least one out-edge (true by construction for symmetric graphs,
    e.g. a co-purchase union of both directions).  It lets the
    operator skip the node-universe union+distinct over 2|E| rows
    (nodes ≡ the out-degree frame) and drop the per-round dangling-
    mass term, which r5 profiling showed was ~40% of setup on the
    co-purchase graph.  Asserting it on a graph WITH dangling nodes
    silently loses their mass — leave it False unless symmetry is
    structural.

    Two per-round join strategies, picked by |V| (r5, measured):

    * |V| <= ``broadcast_ranks_rows``: the rank frame BROADCASTS into
      the persisted edge list, so the 2|E|-row side never moves at
      all, and the loop runs under a loop-scoped shuffle-partition
      count sized to |V| with AQE disabled — per-round work is a
      handful of small tasks, and AQE's per-stage re-planning (~0.5 s
      per tiny round at |V|=20 k) is pure overhead when every frame
      in the loop is already known-small.  12.9 s -> 5.3 s at sf0.1.
    * larger |V|: the r4 shape — edge list persisted hash-partitioned
      AND sorted on src (cached frames preserve outputPartitioning/
      outputOrdering), the |V|-row rank frame re-shuffles to meet it
      each round (sort-merge join), session confs untouched so AQE
      handles skew.  Per-round cost stays edge-stationary either way.

    Reference scope: net-new (generalizes the reference's recursive
    creator-tree traversal, person-users.js:568-601, from reachability
    to stationary-distribution scoring).
    """
    sess = edges.sparkSession
    # repartition BEFORE the dedup aggregate: hash(src) clusters
    # (src, dst), so distinct's HashAggregate reuses this exchange and
    # edge ingest pays ONE shuffle of the edge rows, not two; the
    # explicit count pins it against AQE byte-coalescing.  Static,
    # reused every round — persisted hash-partitioned AND sorted on
    # the join key under the SESSION conf (the big-frame choice: this
    # is the 2|E|-row side); the src partitioning also makes the
    # out-degree aggregate below exchange-free.
    links = (
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        )
        .repartition(
            int(sess.conf.get("spark.sql.shuffle.partitions")), "src"
        )
        .dropDuplicates()
        .sortWithinPartitions("src")
        .persist()
    )
    outdeg = links.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    if no_dangling:
        # caller asserts src covers every node: the node universe IS
        # the out-degree frame — no union+distinct over 2|E| rows
        nodes = outdeg
    else:
        # out-degree with 0 for dangling nodes, so the per-round
        # dangling-mass scalar is a conditional sum over the rank
        # frame itself (no per-round anti join); built from the CACHED
        # links frame so the edge enumeration runs once, not twice
        nodes = (
            links.select(F.col("src").alias("id"))
            .union(links.select(F.col("dst").alias("id")))
            .distinct()
            .join(outdeg, "id", "left")
            .select("id", F.coalesce("deg", F.lit(0)).alias("deg"))
        )
    # deg rides IN the checkpointed rank frame: the per-round rank/deg
    # projection is then join-free, and the tol probe is a scalar agg
    ranks = nodes.select("id", "deg", F.lit(0.0).alias("rank")).localCheckpoint(
        eager=True
    )
    n = ranks.count()  # scalar graph size (materializes links en route)
    ranks = ranks.select("id", "deg", F.lit(1.0 / n).alias("rank")).localCheckpoint(
        eager=True
    )
    use_bcast = n <= broadcast_ranks_rows
    # loop-scoped confs only (shared helper): every eager action below
    # runs under them; the returned frame is already checkpointed
    with _iter_loop_confs(sess, n // 2500 if use_bcast else None):
        if use_bcast:
            # re-lay the static edge list on the AGGREGATION key, once:
            # the broadcast join preserves the stream side's
            # partitioning, so the per-round sum-by-dst then needs NO
            # exchange at all — rounds become zero-shuffle jobs (the
            # src layout only served the one-time out-degree aggregate
            # above and the SMJ path's per-round join).  One extra
            # 2|E|-row shuffle at loop width buys R rounds x (exchange
            # stage + its partial-agg rows); the loop conf count is
            # already clamped, and the explicit count pins the layout
            # against coalescing.
            links_dst = links.repartition(
                int(sess.conf.get("spark.sql.shuffle.partitions")), "dst"
            ).persist()
            links_dst.count()
            links.unpersist()
            links = links_dst
        for _ in range(iters):
            # deg=0 (dangling) rows contribute no edge mass and would
            # trip ANSI DIVIDE_BY_ZERO — their mass flows via dmass
            rside = ranks.filter(F.col("deg") > 0).select(
                F.col("id").alias("src"), (F.col("rank") / F.col("deg")).alias("w")
            )
            if use_bcast:
                rside = F.broadcast(rside)
            contribs = (
                links.join(rside, "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("w").alias("contrib"))
            )
            if use_bcast:
                contribs = F.broadcast(contribs)
            updated = ranks.select(
                "id", "deg", F.col("rank").alias("prev_rank")
            ).join(contribs, "id", "left")
            if no_dangling:
                new_rank = F.lit((1.0 - damping) / n) + F.lit(damping) * F.coalesce(
                    "contrib", F.lit(0.0)
                )
            else:
                # mass held by dangling nodes (deg 0) — 1-row frame,
                # broadcast-cross-joined so the loop stays declarative
                dangling = ranks.agg(
                    F.coalesce(
                        F.sum(F.when(F.col("deg") == 0, F.col("rank"))), F.lit(0.0)
                    ).alias("dmass")
                )
                updated = updated.crossJoin(F.broadcast(dangling))
                new_rank = F.lit((1.0 - damping) / n) + F.lit(damping) * (
                    F.coalesce("contrib", F.lit(0.0)) + F.col("dmass") / n
                )
            ranks = updated.select(
                "id", "deg", new_rank.alias("rank"), "prev_rank"
            ).localCheckpoint(eager=True)
            if tol is not None:
                delta = ranks.agg(
                    F.sum(F.abs(F.col("rank") - F.col("prev_rank"))).alias("d")
                ).first()["d"]
                if delta is not None and delta < tol:
                    break
    links.unpersist()
    return ranks.select("id", "rank")



def _canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirected ``(u, v)`` long edges canonicalized to u < v
    (either input orientation accepted — including both at once),
    self-loop-free, deduped.  The shared ingest for every undirected
    whole-graph operator here (r5 review: kcore consumed raw
    orientation and a symmetric edge list silently doubled degrees)."""
    u, v = F.col("u").cast("long"), F.col("v").cast("long")
    return (
        edges.select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _degrees(e: DataFrame) -> DataFrame:
    """(id, d) node degrees of a canonical deduped edge frame."""
    return (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def triangle_counts(
    edges: DataFrame, broadcast_adjacency: bool = True
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph given
    as ``(u, v)`` edges in any orientation (canonicalized + deduped
    here; self-loops dropped).  Returns ``(id, triangles)`` for
    every node in at least one triangle.

    Skew guard (both strategies): every edge is ORIENTED from its
    (degree, id)-smaller endpoint to the larger, which bounds every
    node's out-degree by O(sqrt(2m)) on ANY degree distribution — the
    power-law hub that would otherwise fan out deg^2 wedges instead
    RECEIVES its edges (Suri & Vassilvitskii WWW'11).  Each triangle
    {x < y < z in orientation order} is then found exactly once, at
    edge (x, y) via z in N+(x) & N+(y), and attributed to all three
    corners.  Integer arithmetic end to end, so results are
    hash-exact.

    ``broadcast_adjacency=True`` (default): the oriented adjacency map
    (|V| rows, sqrt(2m)-bounded arrays) broadcasts to both sides of
    the per-edge intersection, so NOTHING but the final count agg
    shuffles and the wedge set is never materialized — per-edge work
    is one array_intersect of two out-neighbor lists.  Right whenever
    the adjacency fits an executor (tens of millions of edges).

    ``broadcast_adjacency=False``: the classic MR pattern for graphs
    whose adjacency exceeds broadcast — wedges enumerate from a
    per-apex sorted adjacency array (bounded JVM fan-out, no self-join
    for the wedge side) and close with one equi-join against the
    oriented edge list; shuffle volume is O(#wedges) <= m^(3/2).

    The (degree, id) pair packs into one BIGINT as ``d * scale + id``
    with ``scale`` sized to the graph's actual max id (one tiny agg on
    the cached edge frame — it doubles as the cache fill), so ANY id
    range short of BIGINT packing overflow works; the overflow bound
    is asserted, never silent (r5 review: a hardcoded 1e6 multiplier
    stopped being a total order at id >= 1e6, and because orientation
    is an internal choice, counts would have been wrong with no error
    on BOTH engines).  The contribution explode is a SINGLE pass — the
    naive 3-way union of the triangle frame re-evaluates the closure
    plan once per branch (measured 3x the whole query's cost).
    """
    e = _canonical_edges(edges).persist()
    bounds = e.agg(
        F.max(F.greatest("u", "v")).alias("mx"),
        F.min(F.least("u", "v")).alias("mn"),
    ).first()
    mx = bounds["mx"]
    if mx is None:
        e.unpersist()
        return e.sparkSession.createDataFrame([], "id long, triangles long")
    assert bounds["mn"] >= 0, "triangle_counts: node ids must be non-negative"
    scale = 10 ** len(str(int(mx)))  # next power of 10 > max id
    # worst-case packed key: degree <= |V| <= mx + 1
    assert (mx + 1) * scale + mx < 2**63, (
        f"triangle_counts: packed (degree, id) order key overflows "
        f"BIGINT at max id {mx}"
    )
    deg = _degrees(e)
    ewd = e.join(
        F.broadcast(deg.select(F.col("id").alias("u"), F.col("d").alias("du"))),
        "u",
    ).join(
        F.broadcast(deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))),
        "v",
    )
    ord_u = F.col("du") * F.lit(scale) + F.col("u")
    ord_v = F.col("dv") * F.lit(scale) + F.col("v")
    fwd = ord_u <= ord_v
    # oriented edge list feeds two plan branches (adjacency + probe);
    # localCheckpoint materializes it once and truncates the
    # pairs->distinct->orient lineage (renamed-projection reuse does
    # not get ReusedExchange)
    o = ewd.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(fwd, ord_v).otherwise(ord_u).alias("dst_ord"),
    ).localCheckpoint(eager=True)
    e.unpersist()

    if broadcast_adjacency:
        adj = o.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
        probe = o.join(
            F.broadcast(adj.select("src", F.col("nbrs").alias("nu"))), "src"
        ).join(
            F.broadcast(
                adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("nv"))
            ),
            "dst",
        )
        # inner joins drop edges whose dst has no out-neighbors — those
        # edges close no wedge, so dropping them is the count semantics
        per_edge = probe.select(
            "src", "dst", F.array_intersect("nu", "nv").alias("ix")
        ).filter(F.size("ix") > 0)
        t = F.size("ix").cast("long")
        contrib = F.concat(
            F.array(
                F.struct(F.col("src").alias("id"), t.alias("t")),
                F.struct(F.col("dst").alias("id"), t.alias("t")),
            ),
            F.transform(
                F.col("ix"),
                lambda w: F.struct(
                    w.alias("id"), F.lit(1).cast("long").alias("t")
                ),
            ),
        )
        exploded = per_edge.select(F.explode(contrib).alias("c")).select(
            F.col("c.id").alias("id"), F.col("c.t").alias("t")
        )
    else:
        adj = o.groupBy("src").agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("dst_ord"), F.col("dst")))
            ).alias("nbrs")
        )
        wedge_arr = F.flatten(
            F.transform(
                F.col("nbrs"),
                lambda a, i: F.transform(
                    F.slice(F.col("nbrs"), i + 2, F.size(F.col("nbrs"))),
                    lambda b: F.struct(a["dst"].alias("v"), b["dst"].alias("w")),
                ),
            )
        )
        wedges = (
            adj.filter(F.size("nbrs") >= 2)
            .select(F.col("src").alias("a"), F.explode(wedge_arr).alias("p"))
            .select("a", F.col("p.v").alias("b"), F.col("p.w").alias("c"))
        )
        tri = wedges.join(
            o.select(F.col("src").alias("b"), F.col("dst").alias("c")),
            ["b", "c"],
        )
        exploded = tri.select(
            F.explode(F.array("a", "b", "c")).alias("id")
        ).withColumn("t", F.lit(1).cast("long"))

    return exploded.groupBy("id").agg(F.sum("t").alias("triangles"))


def kcore(edges: DataFrame, k: int, max_iter: int = 100) -> DataFrame:
    """Members of the k-core — the maximal subgraph where every node
    keeps degree >= k — by distributed peeling (Seidman 1983; the
    batch step of Montresor et al.'s distributed coreness): each round
    drops every node whose CURRENT degree is below ``k`` and the edges
    touching it, until nothing changes.  Returns ``(id, core_degree)``
    with the node's degree INSIDE the k-core.  The density screen for
    community/boilerplate analysis — triangle counts say how clustered
    a neighborhood is, the k-core says which nodes survive peeling.

    Scale shape: per round, one map-side-combinable degree aggregation
    over the live edge frame and one semi-join filtering edges to
    surviving endpoints — node-keyed bounded shuffles, no driver-side
    graph state; the live frame only ever SHRINKS.  Rounds are
    topology-bound (a long chain peels one layer per round), which is
    the known cost of exact peeling; the round frame localCheckpoints
    eagerly so lineage stays flat.  Convergence = edge count
    unchanged (peeling is monotone, so equal counts mean a fixed
    point); hitting ``max_iter`` without converging RAISES — k-core is
    an exact answer, so a truncated peel would silently report
    sub-k-degree nodes as core members (r5 review).  Runs under the
    shared small-loop confs when the graph is small enough to drown in
    per-stage overhead.  Edges are accepted in any orientation
    (canonicalized + deduped by the shared ingest — a symmetric input
    would otherwise double every degree).
    """
    sess = edges.sparkSession
    live = _canonical_edges(edges).localCheckpoint(eager=True)
    n_edges = live.count()
    loop_parts = n_edges // 250_000 if n_edges <= 50_000_000 else None
    deg = None
    converged = n_edges == 0
    with _iter_loop_confs(sess, loop_parts):
        prev = n_edges
        for _ in range(max_iter):
            if converged:
                break
            deg = _degrees(live)
            keep = deg.filter(F.col("d") >= k).select("id")
            live = (
                live.join(keep.withColumnRenamed("id", "u"), "u", "left_semi")
                .join(keep.withColumnRenamed("id", "v"), "v", "left_semi")
                .select("u", "v")
                .localCheckpoint(eager=True)
            )
            cur = live.count()
            # fixed point: nothing peeled this round (every remaining
            # node already has d >= k — the deg just computed IS the
            # answer), or the graph peeled to nothing
            converged = cur == prev or cur == 0
            prev = cur
    if not converged:
        raise RuntimeError(
            f"kcore: peel did not converge within {max_iter} rounds "
            f"(k={k}; a truncated peel would report sub-k nodes as core "
            "members) — raise max_iter for this topology"
        )
    if deg is None or prev == 0:
        return live.sparkSession.createDataFrame([], "id long, core_degree long")
    # deg was computed from the frame the converged round started with,
    # which the fixed point proved identical to the final frame — reuse
    # it instead of rebuilding the same aggregation as a fresh job
    return deg.filter(F.col("d") >= k).select(
        "id", F.col("d").cast("long").alias("core_degree")
    )

# r12 note: an r11 degree-maintenance variant of this peel (maintain
# only the |V|-row degree frame, decrement partners on drop) was
# REVERTED here after the driver's ground truth and two same-day
# interleaved A/Bs measured it 0.5-1.9 s slower at sf0.1 (best-of-N
# 4.83/5.04 s for this batch shape vs 5.80/6.70 s) — the per-round
# decrement join + full-adjacency scans cost more than this shape's
# shrinking-frame rewrites on the shipped topologies (3-5 peel
# rounds).  Its at-scale write argument (O(peeled-delta + |V|) vs
# O(|E|) checkpoint bytes per round) remains valid for deep peels of
# huge graphs; revisit only with a measured deep-peel workload.


def tree_rollup(
    edges: DataFrame,
    costs: DataFrame,
    child: str = "child",
    parent: str = "parent",
    qty: str = "qty",
    id_col: str = "id",
    cost_col: str = "cost",
    max_iter: int = 100,
) -> DataFrame:
    """Bottom-up aggregation over a FOREST (every child has exactly
    one parent edge) — the bill-of-materials cost rollup:

        total(n)  = cost(n)  + sum over child edges (c -> n): qty * total(c)
        n_desc(n) = 1        + sum over child edges (c -> n): n_desc(c)

    Returns ``(id, total, n_desc)`` for every node in ``costs``.  All
    arithmetic is exact BIGINT (caller supplies integer costs/qty), so
    the result is bit-identical to a recursive-CTE evaluation.

    This generalizes the reference's recursive creator-tree walk
    (person-users.js:568-601) from reachability to AGGREGATION up the
    tree — what a per-ancestor rollup (org headcount, BOM cost,
    nested-category totals) actually needs.

    Shape: level-synchronous leaf peeling.  Each round finalizes every
    node with no REMAINING child edges, pushes its weighted total to
    its parent (one equi-join + one map-side-combinable agg on parent
    keys), and drops the resolved edges (one anti join) — node-keyed
    bounded shuffles only, both frames strictly shrink, rounds =
    forest height (O(log n) on bushy trees).  Per-round lineage is cut
    with eager ``localCheckpoint``; finalized slices accumulate in a
    list and union once at the end (height-bounded, so the union tree
    stays shallow).  A node whose children resolve across different
    rounds accumulates partial contributions in place and finalizes
    only when its last child edge is gone.

    EXACT-operator contract: exhausting ``max_iter`` (a cycle, or a
    forest deeper than the cap) RAISES rather than returning a
    truncated rollup — a partial answer here silently lies (the k-core
    lesson).
    """
    from functools import reduce

    sess = edges.sparkSession
    e = edges.select(
        F.col(child).cast("long").alias("c"),
        F.col(parent).cast("long").alias("p"),
        F.col(qty).cast("long").alias("q"),
    ).localCheckpoint(eager=True)
    t = (
        costs.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(cost_col).cast("long").alias("total"),
        )
        .withColumn("n_desc", F.lit(1).cast("long"))
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    n_nodes = t.count()
    finalized = []
    kids = F.lit(True).alias("_kids")

    def flag(frame, edge_frame):
        # annotate each node with whether it still has child edges:
        # the leaf/survivor split then needs no anti/semi joins — both
        # are FILTERS over the one checkpointed frame (r11: this folds
        # the former parents_d + leaves checkpoints into t's, cutting
        # the per-round actions from 5 to 3)
        pd = edge_frame.select(F.col("p").alias("id")).distinct()
        return frame.join(pd.select("id", kids), "id", "left").localCheckpoint(
            eager=True
        )

    with _iter_loop_confs(sess, n_nodes // 250_000 if n_nodes <= 50_000_000 else None):
        if n_edges == 0:
            return t
        t = flag(t, e)
        for _ in range(max_iter):
            # no remaining child edges -> this node's total is FINAL
            leaves = t.filter(F.col("_kids").isNull()).select(
                "id", "total", "n_desc"
            )
            finalized.append(leaves)
            contrib = (
                e.join(leaves.select(F.col("id").alias("c"), "total", "n_desc"), "c")
                .groupBy(F.col("p").alias("id"))
                .agg(
                    F.sum(F.col("q") * F.col("total")).alias("ct"),
                    F.sum("n_desc").alias("cn"),
                )
            )
            e = e.join(
                leaves.select(F.col("id").alias("c")), "c", "left_anti"
            ).localCheckpoint(eager=True)
            n_edges = e.count()
            # contrib lazily reads the PRE-anti edge frame captured
            # above; survivors accumulate their resolved children's
            # mass in place and finalize when their last edge is gone
            surv = (
                t.filter(F.col("_kids").isNotNull())
                .select("id", "total", "n_desc")
                .join(contrib, "id", "left")
                .select(
                    "id",
                    (F.col("total") + F.coalesce("ct", F.lit(0))).alias("total"),
                    (F.col("n_desc") + F.coalesce("cn", F.lit(0))).alias("n_desc"),
                )
            )
            # completion is checked HERE, not at the top of the next
            # iteration: a forest whose height equals max_iter drains
            # its last edges in the final round, and the error path
            # below must never fire with 0 edges remaining (r7 advisory)
            if n_edges == 0:
                finalized.append(surv)
                break
            t = flag(surv, e)
        else:
            raise RuntimeError(
                f"tree_rollup did not resolve within {max_iter} rounds "
                f"({n_edges} edges remain): cycle in the input or a "
                "deeper forest than the cap — raising rather than "
                "returning a truncated rollup"
            )
    return reduce(lambda a, b: a.unionByName(b), finalized)


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    id_col: str = "id",
    max_iter: int = 64,
    broadcast_dist_rows: int = 100_000,
) -> DataFrame:
    """Single-source (or multi-source) WEIGHTED shortest paths by
    frontier Bellman-Ford relaxation — :func:`bfs_levels` upgraded
    from hop counts to an additive edge metric (non-negative integer
    weights; the distributed shape every Pregel/GraphX SSSP uses).

    Returns ``(id, dist)`` with exact BIGINT distances for every node
    reachable from ``sources`` (distance 0 there).  Per round, only
    the FRONTIER (nodes whose distance improved last round) re-relaxes
    its out-edges: one equi-join frontier><edges, one min-combine per
    destination (map-side combinable), one left merge into the
    distance frame — the distance frame is SEEDED with the full node
    universe (unreached rows carry NULL until a path arrives), so the
    merge is a left join, never a full-outer, and the improved flag
    rides IN the checkpointed frame: one lineage cut per round, the
    next frontier is a filter over it.  Rounds are bounded by the
    longest shortest-path HOP count (tree height / graph diameter),
    not |V|, because a settled node re-enters the frontier only when a
    strictly shorter path arrives.

    Two per-round join strategies, picked by |V| exactly as in
    :func:`pagerank` (r11): |V| <= ``broadcast_dist_rows`` re-lays the
    persisted edge list on the AGGREGATION key ``v`` once and
    broadcasts the frontier and candidate frames — rounds are
    ZERO-shuffle (two |V|-bounded broadcasts, partial->final min fused
    with no exchange); larger graphs keep the edge list persisted
    hash-partitioned and sorted on ``u`` (the per-round join key), so
    only the |V|-row frames move each round.

    EXACT-operator contract: exhausting ``max_iter`` with a non-empty
    frontier RAISES (truncated distances lie); negative weights are
    rejected up front (Bellman-Ford would need |V| rounds and cycle
    detection — out of scope for the shortest-path metric this serves).

    Reference parity: the reference walks its creator tree for
    REACHABILITY (person-users.js:568-601); this adds the weighted
    metric along those paths, as net-new §2.8 capability.
    """
    sess = edges.sparkSession
    e0 = edges.select(
        F.col(src).cast("long").alias("u"),
        F.col(dst).cast("long").alias("v"),
        F.col(weight).cast("long").alias("w"),
    )
    # distance frame seeded with the FULL node universe (sources
    # included even when isolated): unreached rows carry NULL dist, so
    # every per-round merge is a plain left join — broadcastable,
    # unlike the former full-outer.  The improved flag rides in the
    # frame; round 1's frontier is exactly the sources.
    srcs = (
        sources.select(F.col(id_col).cast("long").alias("id"))
        .distinct()
        .withColumn("sdist", F.lit(0).cast("long"))
    )
    dist = (
        e0.select(F.col("u").alias("id"))
        .union(e0.select(F.col("v").alias("id")))
        .union(srcs.select("id"))
        .distinct()
        .join(srcs, "id", "left")
        .select(
            "id",
            F.col("sdist").alias("dist"),
            F.col("sdist").isNotNull().alias("_improved"),
        )
        .localCheckpoint(eager=True)
    )
    # the small-graph clamp heuristic is keyed on NODE count (as in
    # tree_rollup) — the seeded frame's count, not |E| (r7 advisory:
    # e.count() here silently fed edge count to a threshold tuned for
    # |V|); the count picks the loop strategy BEFORE the edge layout
    # is chosen, so the list is laid out and materialized exactly once
    n_nodes = dist.count()
    use_bcast = n_nodes <= broadcast_dist_rows
    with _iter_loop_confs(
        sess, n_nodes // 250_000 if n_nodes <= 50_000_000 else None
    ):
        if use_bcast:
            # static edge list laid out on the AGGREGATION key (the
            # r11 pagerank move): the broadcast join preserves the
            # stream side's partitioning, so the per-round min-combine
            # needs no exchange — rounds are zero-shuffle jobs
            e = e0.repartition(
                int(sess.conf.get("spark.sql.shuffle.partitions")), "v"
            ).persist()
        else:
            # big-graph path: hash-partitioned AND sorted on the
            # per-round JOIN key (the pagerank SMJ layout) so the
            # 2|E|-row side never re-exchanges; only the |V|-row
            # frames move each round
            e = (
                e0.repartition(
                    int(sess.conf.get("spark.sql.shuffle.partitions")), "u"
                )
                .sortWithinPartitions("u")
                .persist()
            )
        # the negative-weight guard doubles as the materializing action
        neg = e.filter(F.col("w") < 0).count()
        if neg:
            raise ValueError(
                f"sssp requires non-negative weights ({neg} negative)"
            )
        for _ in range(max_iter):
            frontier = dist.filter(F.col("_improved")).select(
                F.col("id").alias("u"), "dist"
            )
            cand = (
                e.join(F.broadcast(frontier) if use_bcast else frontier, "u")
                .groupBy(F.col("v").alias("id"))
                .agg(F.min(F.col("dist") + F.col("w")).alias("nd"))
            )
            # least() skips NULLs, so one expression covers all four
            # reached/unreached x candidate/no-candidate cases
            merged = (
                dist.select("id", "dist")
                .join(F.broadcast(cand) if use_bcast else cand, "id", "left")
                .select(
                    "id",
                    F.least(F.col("dist"), F.col("nd")).alias("dist"),
                    (
                        F.col("nd").isNotNull()
                        & (F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
                    ).alias("_improved"),
                )
            )
            dist = merged.localCheckpoint(eager=True)
            if dist.filter(F.col("_improved")).isEmpty():
                break
        else:
            raise RuntimeError(
                f"sssp frontier still active after {max_iter} rounds — "
                "raising rather than returning truncated distances"
            )
    e.unpersist()
    return dist.filter(F.col("dist").isNotNull()).select("id", "dist")
