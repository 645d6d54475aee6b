"""Core query surface: merge-parity operators (SURVEY.md §2) expressed
over the driver's TPC-H-ish tables, plus headline analytic queries.

Each query cites the reference behavior it generalizes
(file:line into /root/reference) and carries a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from beehive_spark.operators import (
    assign_ids,
    consolidate,
    disjunctive_match,
    next_id_base,
    orphan_check,
    remap_fks,
    uuid_collisions,
)
from beehive_spark.queries import load, query


# ---------------------------------------------------------------------------
# S2/P1 — projected, filtered scan (pushdown + pruning)
# ---------------------------------------------------------------------------
@query(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def scan_project(spark, sf_dir):
    """Narrow scan with filter (S2+P1, reference utils.js:85-87,
    person-users.js:804-805). Filter and 4-column projection must reach
    the parquet scan (PushedFilters/ReadSchema)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


# ---------------------------------------------------------------------------
# P2/P3 — IN / NOT IN / compound predicates
# ---------------------------------------------------------------------------
@query(
    "filter_in_notin",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_nationkey
    FROM customer
    WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')
      AND c_nationkey NOT IN (1, 2, 3)
    """,
)
def filter_in_notin(spark, sf_dir):
    """IN/NOT-IN exclusion filters (P2, reference utils.js:248-253,
    person-users.js:643-651 `user_id NOT IN (1,2)`)."""
    c = load(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        & ~F.col("c_nationkey").isin(1, 2, 3)
    ).select("c_custkey", "c_name", "c_mktsegment", "c_nationkey")


@query(
    "filter_compound",
    oracle="""
    SELECT event_id, user_id, event_type, ROUND(value, 2) AS value
    FROM events
    WHERE value IS NOT NULL AND value > 100.0
      AND event_type IN ('click','purchase')
    """,
)
def filter_compound(spark, sf_dir):
    """Compound + NULL-sensitive predicates (P3/P4, reference
    person-users.js:645,801-805)."""
    e = load(spark, sf_dir, "events")
    return (
        e.filter(
            F.col("value").isNotNull()
            & (F.col("value") > 100.0)
            & F.col("event_type").isin("click", "purchase")
        )
        .select("event_id", "user_id", "event_type", F.round("value", 2).alias("value"))
    )


# ---------------------------------------------------------------------------
# J1 — semi join (EXISTS)
# ---------------------------------------------------------------------------
@query(
    "semi_join_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_join_exists(spark, sf_dir):
    """left_semi join — rows whose key exists on the other side (J1,
    reference uuid-checks.js:59-70 collision probe)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey"))
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# J2 — anti join (NOT EXISTS): orphan/integrity check
# ---------------------------------------------------------------------------
@query(
    "anti_join_orphans",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer c
    WHERE c_custkey IS NOT NULL AND c_custkey > 0
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
          AND o.o_custkey = c.c_custkey
      )
    """,
)
def anti_join_orphans(spark, sf_dir):
    """Orphan detection via left_anti (J2, reference
    integrity-checks.js:5-24): customers with no early-1995 order —
    the 'parent' side is a filtered key set so the check is
    non-vacuous on this data.  Uses the engine's orphan_check
    operator (filter is pushed into the parquet scan)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp")
    )
    return orphan_check(c, o, fk="c_custkey", ref="o_custkey").select(
        "c_custkey", "c_name", "c_nationkey"
    )


# ---------------------------------------------------------------------------
# J3 — consolidation (dedup-split with id mapping)
# ---------------------------------------------------------------------------
@query(
    "consolidate_mapping",
    oracle="""
    WITH src AS (SELECT * FROM nation WHERE n_nationkey < 15),
         dst AS (SELECT * FROM nation WHERE n_nationkey >= 10),
         base AS (SELECT MAX(n_nationkey) + 1 AS b FROM dst),
         matched AS (
           SELECT s.n_nationkey AS src_id, CAST(d.n_nationkey AS BIGINT) AS dest_id
           FROM src s JOIN dst d ON s.n_name = d.n_name
         ),
         fresh AS (
           SELECT s.n_nationkey AS src_id,
                  CAST((SELECT b FROM base) + ROW_NUMBER() OVER (ORDER BY s.n_nationkey) - 1 AS BIGINT) AS dest_id
           FROM src s
           WHERE NOT EXISTS (SELECT 1 FROM dst d WHERE d.n_name = s.n_name)
         )
    SELECT src_id, dest_id FROM matched
    UNION ALL
    SELECT src_id, dest_id FROM fresh
    """,
)
def consolidate_mapping(spark, sf_dir):
    """Generic consolidate (J3, reference utils.js:83-150): two
    'instances' simulated by splitting nation; overlap (keys 10-14 by
    n_name) maps to existing dest ids, the rest get fresh contiguous
    ids from the dest id ceiling."""
    nation = load(spark, sf_dir, "nation")
    src = nation.filter(F.col("n_nationkey") < 15)
    dst = nation.filter(F.col("n_nationkey") >= 10)
    res = consolidate(
        src,
        dst,
        "n_nationkey",
        "n_nationkey",
        ["n_name"],
        next_id_base=next_id_base(dst, "n_nationkey"),
    )
    return res.mapping


# ---------------------------------------------------------------------------
# J5 — disjunctive match (OR of key groups)
# ---------------------------------------------------------------------------
@query(
    "disjunctive_match_users",
    oracle="""
    WITH dst AS (
      SELECT CAST(c_custkey + 10000 AS BIGINT) AS pk, c_name, CAST(NULL AS DOUBLE) AS c_acctbal
      FROM customer WHERE c_custkey % 2 = 0
      UNION ALL
      SELECT CAST(c_custkey + 20000 AS BIGINT) AS pk, 'zz-' || c_custkey AS c_name, c_acctbal
      FROM customer WHERE c_custkey % 3 = 0
    ),
    cand AS (
      SELECT s.c_custkey AS src_id, d.pk AS dest_id, 0 AS prio
      FROM customer s JOIN dst d ON s.c_name = d.c_name
      UNION ALL
      SELECT s.c_custkey AS src_id, d.pk AS dest_id, 1 AS prio
      FROM customer s JOIN dst d ON s.c_acctbal = d.c_acctbal
    )
    SELECT src_id, dest_id
    FROM (SELECT src_id, dest_id,
                 ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY prio, dest_id) AS rn
          FROM cand)
    WHERE rn = 1
    """,
)
def disjunctive_match_users(spark, sf_dir):
    """Disjunctive user matching (J5, reference preparation.js:140-157
    — (system_id AND username) OR uuid) as a union of equi-joins with
    first-group-wins precedence, never an un-optimizable OR theta-join."""
    c = load(spark, sf_dir, "customer")
    dst = (
        c.filter(F.col("c_custkey") % 2 == 0)
        .select(
            (F.col("c_custkey") + 10000).cast("long").alias("pk"),
            F.col("c_name"),
            F.lit(None).cast("double").alias("c_acctbal"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 3 == 0).select(
                (F.col("c_custkey") + 20000).cast("long").alias("pk"),
                F.concat(F.lit("zz-"), F.col("c_custkey")).alias("c_name"),
                F.col("c_acctbal"),
            )
        )
    )
    return disjunctive_match(c, dst, "c_custkey", "pk", [["c_name"], ["c_acctbal"]])


# ---------------------------------------------------------------------------
# J7 + A2 — FK remap through mapping DFs built by window id assignment
# ---------------------------------------------------------------------------
@query(
    "fk_remap_chain",
    oracle="""
    WITH omap AS (
      SELECT o_orderkey AS src_id,
             CAST(1000000 + ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS dest_id
      FROM orders
    ),
    pmap AS (
      SELECT p_partkey AS src_id,
             CAST(2000000 + ROW_NUMBER() OVER (ORDER BY p_partkey) - 1 AS BIGINT) AS dest_id
      FROM part
    )
    SELECT om.dest_id AS l_orderkey, pm.dest_id AS l_partkey,
           l.l_linenumber, l.l_quantity
    FROM lineitem l
    LEFT JOIN omap om ON l.l_orderkey = om.src_id
    LEFT JOIN pmap pm ON l.l_partkey = pm.src_id
    """,
)
def fk_remap_chain(spark, sf_dir):
    """The merge workhorse (J7+A2, reference obs.js:24-29 FK ternaries
    + utils.js:11-26 id probe): assign new contiguous ids to two parent
    tables, then rewrite the fact table's FKs through broadcast joins."""
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    omap = assign_ids(orders.select("o_orderkey"), "o_orderkey", base=1_000_000).select(
        F.col("o_orderkey").alias("src_id"), F.col("dest_id")
    )
    pmap = assign_ids(part.select("p_partkey"), "p_partkey", base=2_000_000).select(
        F.col("p_partkey").alias("src_id"), F.col("dest_id")
    )
    out = remap_fks(
        li.select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity"),
        {"l_orderkey": omap, "l_partkey": pmap},
    )
    return out.select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_partkey").cast("long").alias("l_partkey"),
        "l_linenumber",
        "l_quantity",
    )


# ---------------------------------------------------------------------------
# A2 — deterministic contiguous id assignment
# ---------------------------------------------------------------------------
@query(
    "assign_ids_window",
    oracle="""
    SELECT c_custkey AS src_id,
           CAST(5000 + ROW_NUMBER() OVER (ORDER BY c_custkey) - 1 AS BIGINT) AS dest_id
    FROM customer
    """,
)
def assign_ids_window(spark, sf_dir):
    """Contiguous dest-id assignment (A2, reference utils.js:11-26 +
    nextId++ in every preparer) as base + row_number — the strict-parity
    global-window mode."""
    c = load(spark, sf_dir, "customer")
    return assign_ids(
        c.select("c_custkey"), "c_custkey", base=5000, mode="contiguous"
    ).select(F.col("c_custkey").alias("src_id"), F.col("dest_id"))


@query(
    "assign_ids_scalable",
    oracle="""
    SELECT o_orderkey AS src_id,
           CAST(100000 + ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) - 1
                AS BIGINT) AS dest_id
    FROM orders
    """,
)
def assign_ids_scalable(spark, sf_dir):
    """Distributed contiguous dest-id assignment (A2 at scale): range
    repartition on the order key + per-partition row_number offset by a
    prefix sum of partition counts.  Ids equal the global
    ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) — same output
    as contiguous mode, but the sort is a range exchange across
    partitions instead of a single-partition window (the WindowExec
    'No Partition Defined' path this replaces as the pipeline default).
    ``small_threshold=0`` pins the distributed plan here so the query
    demonstrates (and the oracle verifies) the at-scale path; real
    callers keep the default size-aware dispatch, which sorts
    dimension-sized inputs in one task like any broadcast decision."""
    o = load(spark, sf_dir, "orders")
    return assign_ids(
        o.select("o_orderkey", "o_orderdate"),
        "o_orderkey",
        order_cols=["o_orderdate", "o_orderkey"],
        base=100000,
        mode="scalable",
        small_threshold=0,
    ).select(F.col("o_orderkey").alias("src_id"), "dest_id")


# ---------------------------------------------------------------------------
# J1 variant — uuid collision detection across two instances
# ---------------------------------------------------------------------------
@query(
    "uuid_collision_semi",
    oracle="""
    SELECT s.o_orderkey, s.o_custkey
    FROM orders s
    WHERE s.o_orderkey % 3 = 0
      AND EXISTS (
        SELECT 1 FROM orders d WHERE d.o_orderkey % 2 = 0
          AND d.o_orderkey = s.o_orderkey
      )
    """,
)
def uuid_collision_semi(spark, sf_dir):
    """UUID-collision probe (J1, reference uuid-checks.js:59-70):
    'src' and 'dst' instances simulated as modulo slices of orders;
    collision key = o_orderkey standing in for uuid."""
    o = load(spark, sf_dir, "orders")
    src = o.filter(F.col("o_orderkey") % 3 == 0)
    dst = o.filter(F.col("o_orderkey") % 2 == 0)
    return uuid_collisions(src, dst, "o_orderkey").select("o_orderkey", "o_custkey")


# ---------------------------------------------------------------------------
# A1/A3 — counts driving reconciliation
# ---------------------------------------------------------------------------
@query(
    "count_by_group",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def count_by_group(spark, sf_dir):
    """Counting (A1, reference utils.js:28-36) generalized to grouped
    counts — the building block of the reconciliation gate (A3)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


# ---------------------------------------------------------------------------
# O1/O3 — ordered limit / first-match pick
# ---------------------------------------------------------------------------
@query(
    "order_limit_first",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 5
    """,
)
def order_limit_first(spark, sf_dir):
    """Ordered first-match pick (O3, reference person-users.js:940-953
    admin-user probe) — deterministic via pk tiebreak."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(5)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


# ---------------------------------------------------------------------------
# Headline analytics (net-new capability, TPC-H shapes)
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)      AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)      AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4)      AS avg_disc,
           CAST(COUNT(*) AS BIGINT)       AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 pricing summary — the flagship scan+agg. Single
    shuffle on tiny (flag,status) key; partial aggregation map-side."""
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           STRFTIME(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 — selective 3-way join + top-k. customer side is
    filtered then broadcast; lineitem side stays shuffle-free."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cb = F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"))
    return (
        li.filter(F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp"))
        .join(
            o.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")).select(
                "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cb, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


@query(
    "q5_local_supplier",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 — six-way join; all dimension sides broadcastable, the
    only shuffle is the final tiny groupBy."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s.select("s_suppkey", "s_nationkey")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n.select("n_nationkey", "n_name", "n_regionkey")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA").select("r_regionkey")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "group_topn_window",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 2
    """,
)
def group_topn_window(spark, sf_dir):
    """Per-group top-N via ranking window — generalizes the
    reference's ordered first-match picks (O1/O3) to grouped data."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


@query(
    "events_windowed_agg",
    oracle="""
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def events_windowed_agg(spark, sf_dir):
    """Tumbling-window aggregation over the events table — the batch
    twin of the Structured Streaming pipeline in
    beehive_spark.streaming (same plan shape: window + groupBy)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("ws"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("ws", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# Behavioral analytics — ordered funnel and cohort retention
# ---------------------------------------------------------------------------
@query(
    "funnel_steps",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT 'view' AS step, CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_users
    UNION ALL
    SELECT 'view>click', CAST((SELECT COUNT(*) FROM c) AS BIGINT)
    UNION ALL
    SELECT 'view>click>purchase', CAST((SELECT COUNT(*) FROM p) AS BIGINT)
    """,
)
def funnel_steps(spark, sf_dir):
    """Ordered three-step funnel (view -> click -> purchase) with
    strict sequencing: a user converts a step only with an event
    strictly AFTER their earliest completion of the previous step —
    the standard product-analytics funnel, not mere set intersection.

    Scale shape: each step is one filtered scan aggregated to a single
    row per user (map-side-combined MIN), then an equi-join on user_id
    with the previous step's (user, ts) frontier — the frontier is one
    row per surviving user, so it broadcasts once smaller than the
    fact side, and per-step cost shrinks monotonically down the
    funnel.  No window over all events, no per-user event-list
    materialization (collect_list funnels blow memory on power users
    at 100 TB; this shape never holds more than one timestamp per
    user per step)."""
    e = load(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    row = lambda name, df: df.agg(  # noqa: E731
        F.lit(name).alias("step"), F.count(F.lit(1)).cast("long").alias("n_users")
    )
    return (
        row("view", v)
        .unionByName(row("view>click", c))
        .unionByName(row("view>click>purchase", p))
    )


@query(
    "cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_w
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_w FROM events
    )
    SELECT strftime(f.cohort_w, '%Y-%m-%d') AS cohort_week,
           CAST(datediff('day', f.cohort_w, a.active_w) / 7 AS BIGINT)
             AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM activity a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark, sf_dir):
    """Cohort retention triangle: users grouped by the ISO week of
    their first event, counted once per later week they were active —
    the (cohort_week, week_offset) -> active-user matrix every growth
    dashboard draws.

    Scale shape: first-seen is one MIN aggregation (map-side
    combined); activity distinct-projects to (user, week) BEFORE the
    join, collapsing each user's events per week to one row, so the
    join and the final count-distinct shuffle rows proportional to
    user-weeks, not raw events.  At 100 TB the first_seen side is one
    row per user — bucket both sides by user_id and the join is
    exchange-free."""
    e = load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_w")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_w")
    ).distinct()
    # (cohort_w, active_w) maps 1:1 onto (cohort_week, week_offset),
    # so one grouped count-distinct suffices
    return (
        activity.join(first_seen, "user_id")
        .groupBy("cohort_w", "active_w")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        .select(
            F.date_format("cohort_w", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("active_w", "cohort_w") / 7).cast("long").alias(
                "week_offset"
            ),
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# Trailing-window anomaly detection over event-rate time series
# ---------------------------------------------------------------------------
@query(
    "events_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT event_type, DATE_TRUNC('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, h, cnt,
             SUM(cnt)       OVER w AS s1,
             SUM(cnt * cnt) OVER w AS s2,
             COUNT(cnt)     OVER w AS k
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS hour,
           cnt,
           ROUND((cnt - s1 / 24.0)
                 / SQRT((s2 - s1 * s1 / 24.0) / 23.0), 4) AS z
    FROM stats
    WHERE k = 24 AND s2 * 24 > s1 * s1
      AND ABS((cnt - s1 / 24.0) / SQRT((s2 - s1 * s1 / 24.0) / 23.0)) > 2.0
    """,
)
def events_anomaly(spark, sf_dir):
    """Event-rate anomaly detection: hourly counts per event type,
    z-scored against the trailing 24-hour window (mean/stddev over
    rows -24..-1, current hour excluded), flagging |z| > 2 — the
    standard ops-dashboard spike/drop detector.

    The z-score is computed from the window's exact integer sums
    (s1 = SUM cnt, s2 = SUM cnt^2) rather than stddev_samp: counts
    are integers, so s1/s2 are exact in both engines and the identical
    IEEE expression yields bit-identical z on Spark and DuckDB —
    one-pass variance aggregators may differ in final-ULP and would
    flake the |z|>2 boundary.  Guard ``s2*24 > s1*s1`` (integer math)
    excludes zero-variance windows without a float epsilon.

    Scale shape: the raw event stream collapses to (type, hour)
    counts FIRST (map-side combined; output rows = types x hours, not
    events), then the window runs per event_type — tiny partitions,
    bounded frame, no events-table window.  The streaming twin is a
    watermarked tumbling-window count feeding the same trailing-frame
    logic in foreachBatch."""
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return score_hourly_anomalies(hourly)


def score_hourly_anomalies(hourly, frame: int = 24, threshold: float = 2.0):
    """Trailing-window z-scoring over an (event_type, h, cnt) frame —
    shared by the batch ``events_anomaly`` query and the streaming
    foreachBatch sink (``streaming.events.run_anomaly_foreachbatch``),
    so both layers flag the identical anomalies by construction."""
    w = (
        Window.partitionBy("event_type").orderBy("h").rowsBetween(-frame, -1)
    )
    stats = hourly.select(
        "event_type",
        "h",
        "cnt",
        F.sum("cnt").over(w).alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("s2"),
        F.count("cnt").over(w).alias("k"),
    )
    fr = float(frame)
    z = (F.col("cnt") - F.col("s1") / fr) / F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / fr) / (fr - 1.0)
    )
    return (
        stats.filter(
            (F.col("k") == frame)
            & (F.col("s2") * frame > F.col("s1") * F.col("s1"))
            & (F.abs(z) > threshold)
        )
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "cnt",
            F.round(z, 4).alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# Per-group trend slopes (closed-form OLS from exact integer sums)
# ---------------------------------------------------------------------------
@query(
    "trend_slopes",
    oracle="""
    WITH daily AS (
      SELECT event_type, DATE_TRUNC('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(DATEDIFF('day', DATE '1970-01-01', d)) AS sx,
             SUM(DATEDIFF('day', DATE '1970-01-01', d)
                 * DATEDIFF('day', DATE '1970-01-01', d)) AS sxx,
             SUM(y) AS sy,
             SUM(DATEDIFF('day', DATE '1970-01-01', d) * y) AS sxy
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 6)
             AS slope_per_day,
           ROUND((sy - ((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE))
                  * sx) / CAST(n AS DOUBLE), 6) AS intercept
    FROM s WHERE n * sxx - sx * sx <> 0
    """,
)
def trend_slopes(spark, sf_dir):
    """Per-event-type trend line over daily counts: closed-form OLS
    slope/intercept computed from EXACT integer sums (n, Σx, Σx²,
    Σy, Σxy with x = epoch day) so both engines evaluate the identical
    IEEE expression — one-pass regr_slope/regr_avg aggregators are the
    convenient alternative but differ in final-ULP between engines.

    Scale shape: raw events collapse to (type, day) counts first
    (map-side combined), then one tiny aggregation per type computes
    the five sums — the regression itself is arithmetic on a handful
    of numbers however large the corpus.  The same five-sums pattern
    extends to any per-group linear fit (bytes/day, revenue/week)."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("y"))
    x = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).cast("long")
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(x * F.col("y")).alias("sxy"),
    )
    denom = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n").cast("double")
    return (
        s.filter(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0)
        .select(
            "event_type",
            "n",
            F.round(slope, 6).alias("slope_per_day"),
            F.round(intercept, 6).alias("intercept"),
        )
    )


# ---------------------------------------------------------------------------
# Sweep-line interval concurrency — peak simultaneous activity
# ---------------------------------------------------------------------------
@query(
    "peak_concurrency",
    oracle="""
    WITH endpoints AS (
      SELECT event_type, ts AS t, 1 AS delta FROM events
      UNION ALL
      SELECT event_type, ts + INTERVAL 5 MINUTE, -1 FROM events
    ),
    swept AS (
      SELECT event_type, t,
             SUM(delta) OVER (
               PARTITION BY event_type
               ORDER BY t, delta
               ROWS UNBOUNDED PRECEDING) AS live
      FROM endpoints
    ),
    peaks AS (
      SELECT event_type, MAX(live) AS peak FROM swept GROUP BY event_type
    )
    SELECT p.event_type, CAST(p.peak AS BIGINT) AS peak,
           MIN(s.t) AS first_peak_ts
    FROM peaks p JOIN swept s
      ON s.event_type = p.event_type AND s.live = p.peak
    GROUP BY p.event_type, p.peak
    """,
)
def peak_concurrency(spark, sf_dir):
    """Peak concurrent activity per event type — each event held open
    for 5 minutes — via the classic sweep line: every interval becomes
    a +1 start and a -1 end endpoint, a per-type running sum over the
    time-ordered endpoints is the live-interval count, and its max is
    the peak (with the earliest instant it is reached).  Half-open
    [t, t+5m) semantics come from the (t, delta) sort order: ends sort
    before starts at the same instant, so back-to-back intervals never
    double-count.  The sweep is how capacity questions (max concurrent
    sessions / connections / jobs) are answered without materializing
    a row per (interval x time-grain) — 2n endpoint rows, one
    per-type sort, versus the interval-join blowup of comparing every
    pair of overlapping windows.

    Scale shape: one map-side endpoint expansion (2x rows, no join),
    one hash exchange on event_type for the ordered window, one
    aggregate.  Skewed single-type streams at 100 TB would switch the
    partition key to (type, day) with per-day carry-in — the
    streaming twin of this op is watermark-ordered by construction.

    Reference scope: net-new; temporal family next to asof/range
    joins (SURVEY §2 has no temporal operators at all)."""
    e = load(spark, sf_dir, "events")
    starts = e.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    )
    ends = e.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    endpoints = starts.unionByName(ends)
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = endpoints.withColumn("live", F.sum("delta").over(w)).alias("s")
    peaks = (
        swept.groupBy("event_type").agg(F.max("live").alias("peak")).alias("p")
    )
    return (
        swept.join(
            F.broadcast(peaks),
            (F.col("s.event_type") == F.col("p.event_type"))
            & (F.col("s.live") == F.col("p.peak")),
        )
        .groupBy(F.col("p.event_type").alias("event_type"), "peak")
        .agg(F.min("t").alias("first_peak_ts"))
        .select(
            "event_type", F.col("peak").cast("long").alias("peak"), "first_peak_ts"
        )
    )


# ---------------------------------------------------------------------------
# Gaps and islands — longest consecutive-day activity streak per user
# ---------------------------------------------------------------------------
@query(
    "user_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    grouped AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, COUNT(*) AS len, MIN(day) AS streak_start
      FROM grouped GROUP BY user_id, grp
    ),
    best AS (
      SELECT user_id, len, streak_start,
             row_number() OVER (
               PARTITION BY user_id ORDER BY len DESC, streak_start) AS rn
      FROM streaks
    )
    SELECT user_id, CAST(len AS BIGINT) AS streak_days, streak_start
    FROM best WHERE rn = 1
    """,
)
def user_activity_streaks(spark, sf_dir):
    """Longest run of CONSECUTIVE active days per user — the classic
    gaps-and-islands pattern: distinct active days, then ``day -
    row_number()`` is constant exactly within a consecutive run (the
    island key), so one more aggregate yields every streak and a
    ranked pick returns the longest (earliest start on ties).
    Retention/engagement building block next to ``cohort_retention``;
    the reference has no temporal analytics at all.

    Scale shape: one distinct-day aggregate (map-side combined), one
    per-user window over that user's few dozen day rows, one streak
    aggregate — everything after the distinct operates on |user x
    active-day| rows, not events.  Integer date arithmetic end to end:
    bit-identical across engines, no doubles anywhere."""
    e = load(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grouped = days.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("day").alias("streak_start"),
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("streak_days").desc(), "streak_start"
    )
    return (
        streaks.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("user_id", "streak_days", "streak_start")
    )


# ---------------------------------------------------------------------------
# Markov transitions — consecutive event-type pairs per user
# ---------------------------------------------------------------------------
@query(
    "event_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM ordered WHERE next_type IS NOT NULL
      GROUP BY from_type, to_type
    ),
    tot AS (
      SELECT from_type, SUM(n) AS row_n FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, CAST(t.n AS BIGINT) AS n,
           ROUND(CAST(t.n AS DOUBLE) / row_n, 6) AS p
    FROM trans t JOIN tot ON tot.from_type = t.from_type
    """,
)
def event_transitions(spark, sf_dir):
    """First-order Markov transition matrix of user behavior:
    consecutive event-type pairs per user (``lead`` over the per-user
    time order, event_id tiebreak for simultaneous events) counted and
    row-normalized into transition probabilities — the building block
    of behavioral modeling, next-action prediction baselines, and
    bot-pattern detection.  Counts are exact integers; only the final
    row-normalization divides (same exact-count-then-divide shape as
    ``text_perplexity``).

    Scale shape: one per-user window (hash exchange on user_id; a
    user's events fit a partition by construction), one
    map-side-combined pair count over |types|^2 keys, a broadcast-size
    row-total join.  Reference scope: net-new temporal analytics."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = ordered.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(wt), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# Second-order Markov model — event-type trigram transition table
# ---------------------------------------------------------------------------
@query(
    "event_trigram_lm",
    oracle="""
    WITH o AS (
      SELECT event_type AS t1,
             LEAD(event_type, 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS t2,
             LEAD(event_type, 2) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS t3
      FROM events),
    tri AS (
      SELECT t1, t2, t3, COUNT(*) AS n FROM o
      WHERE t3 IS NOT NULL GROUP BY 1, 2, 3)
    SELECT t1, t2, t3, CAST(n AS BIGINT) AS n,
           CAST((n * 1000000) // SUM(n) OVER (PARTITION BY t1, t2)
                AS BIGINT) AS p_ppm
    FROM tri
    """,
)
def event_trigram_lm(spark, sf_dir):
    """Second-order Markov transition table of user behavior: the
    trigram upgrade of :func:`event_transitions` — consecutive
    event-type TRIPLES per user (two ``lead``s over the per-user time
    order, event_id tiebreak) counted exactly, with the conditional
    next-action probability p(t3 | t1, t2) as integer
    parts-per-million over the context total.  Sequence-mining /
    next-action-prediction baseline; the context-conditioned
    distribution is what a behavioral LM backs off to.

    Exactness: counts are exact BIGINTs; the only division is the
    final ppm floor division (engine parity pinned) — the same
    exact-count-then-divide shape as ``event_transitions`` but with
    the house ppm discipline instead of a rounded double.

    Scale shape: ONE per-user window exchange serves both leads
    (identical window spec), then a map-side-combinable count on
    |types|^3 keys and a |types|^2-partition window for the context
    totals — both bounded by the type vocabulary, not the event
    count."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    tri = o.groupBy("t1", "t2", "t3").agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("t1", "t2")
    return (
        tri.withColumn("ctx_total", F.sum("n").over(wt))
        .select(
            "t1",
            "t2",
            "t3",
            F.col("n").cast("long").alias("n"),
            F.expr("(n * 1000000) DIV ctx_total").alias("p_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Session co-occurrence — event-type pairs with support and lift
# ---------------------------------------------------------------------------
@query(
    "session_cooccurrence",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_type,
             CASE WHEN ts - lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL 30 MINUTE OR lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    sess AS (
      SELECT user_id, event_type,
             SUM(is_start) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    ),
    st AS (
      SELECT DISTINCT user_id, session_id, event_type FROM sess
    ),
    n_sessions AS (SELECT COUNT(DISTINCT (user_id, session_id)) AS ns FROM st),
    singles AS (
      SELECT event_type, COUNT(*) AS c FROM st GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS nb
      FROM st a JOIN st b
        ON a.user_id = b.user_id AND a.session_id = b.session_id
       AND a.event_type < b.event_type
      GROUP BY type_a, type_b
    )
    SELECT type_a, type_b, CAST(nb AS BIGINT) AS n_sessions_both,
           ROUND(CAST(nb AS DOUBLE) / ns, 6) AS support,
           ROUND(CAST(nb AS DOUBLE) * ns / (sa.c * sb.c), 6) AS lift
    FROM pairs
    JOIN singles sa ON sa.event_type = type_a
    JOIN singles sb ON sb.event_type = type_b
    CROSS JOIN n_sessions
    """,
)
def session_cooccurrence(spark, sf_dir):
    """Association-mining lite: which event types occur in the SAME
    session (30-minute inactivity gaps), with support and lift — the
    co-occurrence statistics behind "users who do A also do B",
    feature co-activation checks, and funnel hypothesis generation.
    Sessions come from the same gap rule as ``events_sessionize``
    (lag + running start-count); each session collapses to its
    DISTINCT types before the pair self-join, so the join is bounded
    by |types| per session — 5 types here means <= 10 pair rows per
    session, never |events|^2.  Counts exact; support = P(a,b), lift
    = P(a,b)/(P(a)P(b)) over the session universe, divided once at
    the end (exact-count-then-divide).

    Scale shape: one per-user window, one distinct, one equi-join on
    (user, session) between type-sets — all shuffles on user_id.
    Reference scope: net-new temporal analytics."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = e.select(
        "user_id",
        "ts",
        "event_type",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0).alias("is_start"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    st = (
        marked.withColumn("session_id", F.sum("is_start").over(ws))
        .select("user_id", "session_id", "event_type")
        .distinct()
    )
    ns = st.select("user_id", "session_id").distinct().agg(
        F.count(F.lit(1)).alias("ns")
    )
    singles = st.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a = st.select("user_id", "session_id", F.col("event_type").alias("type_a"))
    b = st.select("user_id", "session_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, ["user_id", "session_id"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("both"))
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("c").alias("ca"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(ns))
        .select(
            "type_a",
            "type_b",
            F.col("both").cast("long").alias("n_sessions_both"),
            F.round(F.col("both") / F.col("ns"), 6).alias("support"),
            F.round(
                F.col("both") * F.col("ns") / (F.col("ca") * F.col("cb")), 6
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Unpivot / melt — wide measures to long (metric, value) rows
# ---------------------------------------------------------------------------
@query(
    "lineitem_unpivot",
    oracle="""
    WITH m AS (
      SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
             l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    )
    SELECT metric, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total,
           ROUND(MIN(value), 2) AS min_v, ROUND(MAX(value), 2) AS max_v
    FROM m GROUP BY metric
    """,
)
def lineitem_unpivot(spark, sf_dir):
    """Wide-to-long reshape via the native ``unpivot`` operator (the
    melt every metrics pipeline needs before generic per-metric
    processing), aggregated per metric so the result is small and the
    whole unpivot executes.  Spark's ``unpivot`` expands rows in the
    Expand node — one scan, no join, no UNION re-scan — whereas the
    oracle pays the honest four-scan UNION ALL; both reach identical
    totals.  Same Expand machinery as GROUPING SETS
    (`grouping_sets_revenue`), exposed through the reshape API."""
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="value",
    ).withColumn("metric", F.expr("substring(metric, 3)"))
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
        F.round(F.min("value"), 2).alias("min_v"),
        F.round(F.max("value"), 2).alias("max_v"),
    )


# ---------------------------------------------------------------------------
# Robust statistics — trimmed mean per group
# ---------------------------------------------------------------------------
@query(
    "trimmed_mean_prices",
    oracle="""
    WITH bounds AS (
      SELECT o_orderpriority,
             ROUND(quantile_cont(o_totalprice, 0.05), 2) AS lo,
             ROUND(quantile_cont(o_totalprice, 0.95), 2) AS hi
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           ROUND(AVG(o.o_totalprice), 2) AS trimmed_mean,
           ROUND(MIN(b.lo), 2) AS lo, ROUND(MAX(b.hi), 2) AS hi
    FROM orders o JOIN bounds b ON b.o_orderpriority = o.o_orderpriority
    WHERE o.o_totalprice >= b.lo AND o.o_totalprice <= b.hi
    GROUP BY o.o_orderpriority
    """,
)
def trimmed_mean_prices(spark, sf_dir):
    """Robust central tendency: the mean of order totals WITHIN each
    group's [p5, p95] — the winsorization-style outlier-proof KPI used
    when a handful of whale orders would otherwise own the average.
    Two passes: per-group interpolated percentile bounds (Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the linear
    interpolation definition — the equivalence `group_percentiles`
    already pins by hash), broadcast back, filter, exact mean.
    Bounds round to 2 decimals in BOTH engines before filtering so a
    1-ulp percentile divergence cannot flip a boundary row's
    membership (prices live on the 2-decimal grid).

    Scale shape: one percentile aggregate (|groups| rows, broadcast
    back), one filtered scan + mean — two passes over the fact, no
    shuffle of it."""
    o = load(spark, sf_dir, "orders")
    bounds = o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.05)"), 2).alias("lo"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 2).alias("hi"),
    )
    return (
        o.join(F.broadcast(bounds), "o_orderpriority")
        .filter(
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") <= F.col("hi"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.round(F.avg("o_totalprice"), 2).alias("trimmed_mean"),
            F.round(F.min("lo"), 2).alias("lo"),
            F.round(F.max("hi"), 2).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# Week-over-week growth — lag comparison on exact integer sums
# ---------------------------------------------------------------------------
@query(
    "weekly_revenue_wow",
    oracle="""
    WITH weekly AS (
      SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY week
    )
    SELECT w.week,
           ROUND(w.cents / 100.0, 2) AS revenue,
           ROUND((w.cents - p.cents) / (p.cents / 100.0), 4) AS wow_pct
    FROM weekly w LEFT JOIN weekly p ON p.week + 7 = w.week
    """,
)
def weekly_revenue_wow(spark, sf_dir):
    """Week-over-week revenue growth — the lag-comparison KPI every
    reporting layer ships: weekly totals as exact integer cents
    (bit-identical in any aggregation order), then a percent change
    against the previous CALENDAR week; only the final division
    rounds.  A week with no predecessor (first week, or a gap) yields
    NULL, not zero — no fabricated baseline.

    "Previous week" is defined by the calendar (week - 7 days), not by
    an ordered-row ``lag``, so the comparison is a broadcast self-join
    on the calendar-sized weekly aggregate: no global-order window, no
    single-partition WindowExec, and identical semantics at any
    partitioning.  Scale shape: one map-side-combined weekly
    aggregate, one broadcast hash join over |weeks| rows."""
    o = load(spark, sf_dir, "orders")
    weekly = o.groupBy(
        F.to_date(F.date_trunc("week", "o_orderdate")).alias("week")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    prev = weekly.select(
        F.date_add("week", 7).alias("week"), F.col("cents").alias("prev_cents")
    )
    return weekly.join(F.broadcast(prev), "week", "left").select(
        "week",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.round(
            (F.col("cents") - F.col("prev_cents")) / (F.col("prev_cents") / 100.0), 4
        ).alias("wow_pct"),
    )


# ---------------------------------------------------------------------------
# Calendar gap fill + forward fill — hourly event counts without holes
# ---------------------------------------------------------------------------
@query(
    "events_gap_fill",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM hourly),
    calendar AS (
      -- generate_series takes constants only; synthesize the hour axis
      -- from a wide range() and clip to [lo, hi]
      SELECT b.lo + INTERVAL 1 HOUR * CAST(t.i AS INT) AS hr
      FROM bounds b, range(200000) t(i)
      WHERE b.lo + INTERVAL 1 HOUR * CAST(t.i AS INT) <= b.hi
    ),
    grid AS (
      SELECT t.event_type, c.hr
      FROM (SELECT DISTINCT event_type FROM hourly) t, calendar c
    ),
    filled AS (
      SELECT g.event_type, g.hr, h.n
      FROM grid g LEFT JOIN hourly h
        ON h.event_type = g.event_type AND h.hr = g.hr
    )
    SELECT event_type, hr,
           CAST(COALESCE(n, 0) AS BIGINT) AS n,
           CAST(COALESCE(last_value(n IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY hr), 0) AS BIGINT) AS carried_n
    FROM filled
    """,
)
def events_gap_fill(spark, sf_dir):
    """Dense hourly series per event type: the calendar grid is
    generated (min..max hour x types), daily... hourly counts join
    onto it, holes become explicit 0 rows, and ``carried_n`` forward-
    fills the last observed count (``last(.., ignorenulls)`` over the
    per-type hour order) — the resample + ffill primitive every
    time-series feature pipeline needs, done with a generated
    dimension instead of a Pandas resample.

    Scale shape: the grid is |types| x |hours| (calendar-sized, NOT
    event-sized) built from one explode of a 1-row bounds aggregate;
    the fact collapses to hourly counts before any join; the ffill
    window partitions by type so no global ordering exists.  At 100 TB
    the same plan holds: the grid stays tiny while the one expensive
    step (hourly aggregation) is a map-side-combined groupBy."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = hourly.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    calendar = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("hr")
    )
    types = hourly.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(calendar))
    filled = grid.join(hourly, ["event_type", "hr"], "left")
    w = Window.partitionBy("event_type").orderBy("hr")
    return filled.select(
        "event_type",
        "hr",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.last("n", ignorenulls=True).over(w), F.lit(0))
        .cast("long")
        .alias("carried_n"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation — recency/frequency/monetary quintile scores per customer
# ---------------------------------------------------------------------------
@query(
    "orders_rfm_segments",
    oracle="""
    WITH ref AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS ref_day FROM orders),
    rfm AS (
      SELECT o_custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)), MAX(ref_day))
               AS recency_days,
             COUNT(*) AS frequency,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS monetary_cents
      FROM orders, ref GROUP BY o_custkey
    ),
    b AS (
      SELECT ROUND(quantile_cont(recency_days, 0.2), 2) AS r20,
             ROUND(quantile_cont(recency_days, 0.4), 2) AS r40,
             ROUND(quantile_cont(recency_days, 0.6), 2) AS r60,
             ROUND(quantile_cont(recency_days, 0.8), 2) AS r80,
             ROUND(quantile_cont(frequency, 0.2), 2) AS f20,
             ROUND(quantile_cont(frequency, 0.4), 2) AS f40,
             ROUND(quantile_cont(frequency, 0.6), 2) AS f60,
             ROUND(quantile_cont(frequency, 0.8), 2) AS f80,
             ROUND(quantile_cont(monetary_cents, 0.2), 2) AS m20,
             ROUND(quantile_cont(monetary_cents, 0.4), 2) AS m40,
             ROUND(quantile_cont(monetary_cents, 0.6), 2) AS m60,
             ROUND(quantile_cont(monetary_cents, 0.8), 2) AS m80
      FROM rfm
    )
    SELECT o_custkey,
           CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency,
           ROUND(monetary_cents / 100.0, 2) AS monetary,
           CAST(5 - (CAST(recency_days > r20 AS INT)
                   + CAST(recency_days > r40 AS INT)
                   + CAST(recency_days > r60 AS INT)
                   + CAST(recency_days > r80 AS INT)) AS INT) AS r_score,
           CAST(1 + (CAST(frequency > f20 AS INT)
                   + CAST(frequency > f40 AS INT)
                   + CAST(frequency > f60 AS INT)
                   + CAST(frequency > f80 AS INT)) AS INT) AS f_score,
           CAST(1 + (CAST(monetary_cents > m20 AS INT)
                   + CAST(monetary_cents > m40 AS INT)
                   + CAST(monetary_cents > m60 AS INT)
                   + CAST(monetary_cents > m80 AS INT)) AS INT) AS m_score
    FROM rfm, b
    """,
)
def orders_rfm_segments(spark, sf_dir):
    """RFM customer segmentation — the marketing-analytics staple:
    per-customer recency (days since last order vs corpus max day),
    frequency (order count) and monetary value (exact cents), each
    scored 1-5 against the population's quintile BOUNDARIES.  High
    r_score = recent (recency inverted), high f/m = heavy.

    Deliberately NOT ``ntile``: a global ntile is a total sort of all
    customers through one partition — the anti-pattern at 100 TB.
    Quintile boundaries instead come from one 1-row percentile
    aggregate (broadcast back), and each customer scores by comparing
    its exact-integer metrics against them: no global window anywhere.
    Bounds round to the 2-decimal grid in both engines so 1-ulp
    interpolation divergence cannot flip a boundary customer (the
    `trimmed_mean_prices` trick; metrics are integers, so a
    2-decimal-rounded bound decides every comparison identically)."""
    o = load(spark, sf_dir, "orders")
    ref = o.agg(F.max(F.to_date("o_orderdate")).alias("ref_day"))
    rfm = (
        o.crossJoin(F.broadcast(ref))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("ref_day"), F.max(F.to_date("o_orderdate"))).alias(
                "recency_days"
            ),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "monetary_cents"
            ),
        )
    )
    qs = {}
    for m in ("recency_days", "frequency", "monetary_cents"):
        for p in (20, 40, 60, 80):
            qs[f"{m[0]}{p}"] = F.round(
                F.expr(f"percentile({m}, {p / 100})"), 2
            ).alias(f"{m[0]}{p}")
    bounds = rfm.agg(*qs.values())

    def score(metric, prefix, invert=False):
        hits = sum(
            (F.col(metric) > F.col(f"{prefix}{p}")).cast("int")
            for p in (20, 40, 60, 80)
        )
        return (F.lit(5) - hits) if invert else (F.lit(1) + hits)

    return rfm.crossJoin(F.broadcast(bounds)).select(
        "o_custkey",
        F.col("recency_days").cast("long").alias("recency_days"),
        F.col("frequency").cast("long").alias("frequency"),
        F.round(F.col("monetary_cents") / 100.0, 2).alias("monetary"),
        score("recency_days", "r", invert=True).cast("int").alias("r_score"),
        score("frequency", "f").cast("int").alias("f_score"),
        score("monetary_cents", "m").cast("int").alias("m_score"),
    )


# ---------------------------------------------------------------------------
# Exact-sum dispersion — per-group stddev from decimal power sums
# ---------------------------------------------------------------------------
@query(
    "stddev_prices_exact",
    oracle="""
    WITH sums AS (
      SELECT o_orderpriority,
             COUNT(*) AS n,
             SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      AS DECIMAL(38, 0))) AS s1,
             SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      AS DECIMAL(38, 0))
                 * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                        AS DECIMAL(38, 0))) AS s2
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           CAST(n AS BIGINT) AS n,
           ROUND(CAST(s1 AS DOUBLE) / n / 100.0, 2) AS mean_price,
           ROUND(
             sqrt((CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                  / (n - 1)) / 100.0, 4) AS stddev_price
    FROM sums
    """,
)
def stddev_prices_exact(spark, sf_dir):
    """Per-group standard deviation computed from EXACT decimal power
    sums (sum of cents, sum of squared cents) rather than a streaming
    variance: the two sums are integers with no rounding error in any
    aggregation order, so both engines feed bit-identical values into
    one final closed-form evaluation — the only doubles are the last
    divide/sqrt, applied identically.  A naive stddev_samp would hash-
    diverge across engines because Welford/merge order changes the
    floating-point result; exact-sum-then-formula is how a columnar
    warehouse makes dispersion deterministic.  (Squared cents overflow
    int64 at warehouse row counts — hence DECIMAL(38,0) accumulators,
    which Spark and DuckDB both sum exactly.)

    Scale shape: one map-side-combined aggregate over the fact; |groups|
    rows out.  No second pass, no window."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long").cast("decimal(38,0)")
    sums = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s1"),
        F.sum(cents * cents).alias("s2"),
    )
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    n = F.col("n")
    return sums.select(
        "o_orderpriority",
        n.cast("long").alias("n"),
        F.round(s1d / n / 100.0, 2).alias("mean_price"),
        F.round(
            F.sqrt((s2d - s1d * s1d / n) / (n - 1)) / 100.0, 4
        ).alias("stddev_price"),
    )


# ---------------------------------------------------------------------------
# Last-touch attribution — purchases credited to the preceding touch event
# ---------------------------------------------------------------------------
@query(
    "session_attribution",
    oracle="""
    WITH seqd AS (
      SELECT user_id, ts, event_id, event_type, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS seq
      FROM events
    ),
    packed AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type IN ('click', 'view')
                  THEN seq * 2 + CASE WHEN event_type = 'view'
                                      THEN 1 ELSE 0 END
             END AS touch_code
      FROM seqd
    ),
    carried AS (
      SELECT user_id, event_type, value,
             MAX(touch_code) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS last_touch
      FROM packed
    )
    SELECT CASE WHEN last_touch IS NULL THEN 'none'
                WHEN last_touch % 2 = 1 THEN 'view'
                ELSE 'click' END AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(last_touch) AS BIGINT) AS n_attributed,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM carried
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def session_attribution(spark, sf_dir):
    """Last-touch attribution: every purchase is credited to the most
    recent preceding click/view by the same user (the standard
    marketing-attribution join), then revenue rolls up by touch type —
    purchases with no prior touch land in 'none'.  Revenue sums as
    exact integer cents.

    Implementation note: the obvious forward-fill is ``last_value(...
    IGNORE NULLS)`` over the user window, but windowed IGNORE-NULLS is
    a known cross-engine edge area (round 3's only differential hash
    mismatch was exactly that construct).  Both sides instead pack each
    touch as a monotone BIGINT — ``row_number * 2 + view-flag`` in the
    user's (ts, event_id) order — and take a plain running MAX: the
    ANSI rule that aggregates skip NULLs is semantics every engine
    agrees on, and the max of a monotone packing IS the latest touch.
    The flag bit decodes back to the touch type.

    Oracle note (r5): the final ``SUM(BIGINT)`` is wrapped in
    ``CAST(... AS BIGINT)`` — DuckDB widens SUM(BIGINT) to HUGEINT
    (int128), which pandas-based harnesses render as float
    (``"123.0" != "123"``); every other integer-cents oracle consumes
    its SUM inside a CTE and never hits this.  check_oracle.py now
    lints the whole oracle surface for exactly this dtype drift.

    Scale shape: two windows over the same user_id partitioning (one
    shuffle, millions of small partitions, never global); everything
    else is a map-side-combined group-by.  The reference has no events
    surface at all — this is net-new analytics over the stream table."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = F.row_number().over(w)
    touch_code = F.when(
        F.col("event_type").isin("click", "view"),
        seq * 2 + F.when(F.col("event_type") == "view", 1).otherwise(0),
    ).cast("long")
    packed = e.select(
        "user_id", "ts", "event_id", "event_type", "value",
        touch_code.alias("touch_code"),
    )
    carried = packed.select(
        "user_id", "event_type", "value",
        F.max("touch_code").over(w).alias("last_touch"),
    )
    touch_type = (
        F.when(F.col("last_touch").isNull(), "none")
        .when(F.col("last_touch") % 2 == 1, "view")
        .otherwise("click")
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .groupBy(touch_type.alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count("last_touch").alias("n_attributed"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "revenue_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket affinity — brand pairs co-purchased within an order
# ---------------------------------------------------------------------------
@query(
    "brand_affinity",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob),
    brand_n AS (SELECT p_brand, COUNT(*) AS n_b FROM ob GROUP BY p_brand),
    pair_n AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_ab
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b,
           CAST(n_ab AS BIGINT) AS n_ab,
           ROUND(n_ab / CAST(n.n_orders AS DOUBLE), 4) AS support,
           ROUND(n_ab * CAST(n.n_orders AS DOUBLE)
                 / (ba.n_b * CAST(bb.n_b AS DOUBLE)), 4) AS lift
    FROM pair_n
    JOIN brand_n ba ON ba.p_brand = brand_a
    JOIN brand_n bb ON bb.p_brand = brand_b
    CROSS JOIN n
    WHERE n_ab >= 5
    """,
)
def brand_affinity(spark, sf_dir, min_pairs: int = 5):
    """Market-basket analysis on the order/part graph: which part
    BRANDS are bought together?  Support (co-purchase frequency) and
    lift (observed vs independence) per brand pair, over distinct
    brands per order — the classic association-rule building block,
    grouped at brand grain so pair counts are statistically meaningful
    at any SF (raw part pairs are support-1 noise at small scale).

    Scale shape: orders collapse to DISTINCT (order, brand) first —
    the pair join then fans out at most C(|brands in order|, 2) ≈ 20
    rows per order regardless of lineitem count, and the brand
    dimension (|brands| ~ 25) broadcasts everywhere.  Exact integer
    counts; one final rounded divide per output row.

    Formulation note (r5, measured): the round-3/4 version ran a
    driver-side ``.count()`` action for n_orders before building the
    final plan, so the base frame executed once for the action and
    again per plan branch (PLANS.md r4: 3 lineitem scans).  Carrying
    n_orders as a broadcast 1-row aggregate (exactly like the oracle's
    ``CROSS JOIN n``) folds everything into ONE job: best-of-4 at
    sf0.1 local[32] is 1.70 s vs 2.04 s (count action) vs 2.59 s
    (persist + count — the cache-write barrier serializes what the
    one-job plan overlaps; same lesson as the q21 window rewrite:
    measure, don't assume).  The branches still each scan the base,
    but they run concurrently inside one job; on a cluster where the
    scan dominates, a ``.persist()`` on ``ob`` is the one-line flip
    and the bench history records why the default is not that."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n = ob.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    brand_n = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_b"))
    x, y = ob.alias("x"), ob.alias("y")
    pair_n = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.p_brand") < F.col("y.p_brand")),
        )
        .select(
            F.col("x.p_brand").alias("brand_a"),
            F.col("y.p_brand").alias("brand_b"),
        )
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pairs)
    )
    na = brand_n.select(F.col("p_brand").alias("brand_a"), F.col("n_b").alias("na"))
    nb = brand_n.select(F.col("p_brand").alias("brand_b"), F.col("n_b").alias("nb"))
    return (
        pair_n.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a", "brand_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(
                F.col("n_ab") / F.col("n_orders").cast("double"), 4
            ).alias("support"),
            F.round(
                F.col("n_ab") * F.col("n_orders").cast("double")
                / (F.col("na") * F.col("nb").cast("double")),
                4,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Revenue concentration — decile-bucketed customer revenue share
# ---------------------------------------------------------------------------
@query(
    "revenue_concentration",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ),
    b AS (
      SELECT ROUND(quantile_cont(cents, 0.1), 2) AS b1,
             ROUND(quantile_cont(cents, 0.2), 2) AS b2,
             ROUND(quantile_cont(cents, 0.3), 2) AS b3,
             ROUND(quantile_cont(cents, 0.4), 2) AS b4,
             ROUND(quantile_cont(cents, 0.5), 2) AS b5,
             ROUND(quantile_cont(cents, 0.6), 2) AS b6,
             ROUND(quantile_cont(cents, 0.7), 2) AS b7,
             ROUND(quantile_cont(cents, 0.8), 2) AS b8,
             ROUND(quantile_cont(cents, 0.9), 2) AS b9
      FROM rev
    ),
    bucketed AS (
      SELECT r.o_custkey, r.cents,
             1 + CAST(r.cents > b.b1 AS INT) + CAST(r.cents > b.b2 AS INT)
               + CAST(r.cents > b.b3 AS INT) + CAST(r.cents > b.b4 AS INT)
               + CAST(r.cents > b.b5 AS INT) + CAST(r.cents > b.b6 AS INT)
               + CAST(r.cents > b.b7 AS INT) + CAST(r.cents > b.b8 AS INT)
               + CAST(r.cents > b.b9 AS INT) AS decile
      FROM rev r, b
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(cents) / 100.0, 2) AS revenue,
           ROUND(SUM(cents) / CAST((SELECT SUM(cents) FROM rev) AS DOUBLE), 4)
             AS revenue_share
    FROM bucketed GROUP BY decile
    """,
)
def revenue_concentration(spark, sf_dir):
    """Revenue concentration curve ("do 20% of customers carry 80% of
    revenue?"): per-customer exact-cents revenue bucketed into deciles
    against broadcast percentile BOUNDARIES — same no-global-ntile
    design as ``orders_rfm_segments`` (a total sort of all customers
    is the 100 TB anti-pattern; nine 1-row bounds + a comparison
    ladder is not).  Output is one row per decile with its customer
    count, exact revenue, and share of total.

    Bounds round to the cent grid before comparison so interpolation
    ulps cannot move a boundary customer between deciles; shares
    divide two exact integers and round identically in both engines."""
    o = load(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    bounds = rev.agg(
        *[
            F.round(F.expr(f"percentile(cents, {d / 10})"), 2).alias(f"b{d}")
            for d in range(1, 10)
        ]
    )
    total = rev.agg(F.sum("cents").alias("t"))
    decile = F.lit(1) + sum(
        (F.col("cents") > F.col(f"b{d}")).cast("int") for d in range(1, 10)
    )
    return (
        rev.crossJoin(F.broadcast(bounds))
        .select("o_custkey", "cents", decile.alias("decile"))
        .groupBy(F.col("decile").cast("int").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").alias("cents"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "decile",
            F.col("n_customers").cast("long").alias("n_customers"),
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.round(F.col("cents") / F.col("t").cast("double"), 4).alias(
                "revenue_share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Dwell time — inter-event gaps per event type via lead()
# ---------------------------------------------------------------------------
@query(
    "events_dwell_time",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) - ts) AS dwell_us
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(dwell_us) AS BIGINT) AS n_gaps,
           CAST(SUM(dwell_us) AS BIGINT) AS total_dwell_us,
           ROUND(AVG(dwell_us) / 1e6, 3) AS avg_dwell_sec
    FROM gaps
    WHERE dwell_us IS NOT NULL
    GROUP BY event_type
    """,
)
def events_dwell_time(spark, sf_dir):
    """Dwell time after each event: the gap to the SAME user's next
    event (lead over the per-user order), aggregated by the event type
    the user was dwelling ON — the engagement metric behind
    time-on-page.  A user's last event has no successor and drops out
    (no fabricated dwell).

    Gaps are exact integer MICROSECONDS (timestamp subtraction never
    touches doubles), so sums are bit-identical across engines; only
    the final average divides and rounds.  Scale shape: one per-user
    window (partitioned, no global order), one map-side-combined
    aggregate."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
        ).alias("dwell_us"),
    ).filter(F.col("dwell_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("dwell_us").alias("n_gaps"),
        F.sum("dwell_us").alias("total_dwell_us"),
        F.round(F.avg("dwell_us") / 1e6, 3).alias("avg_dwell_sec"),
    )


# ---------------------------------------------------------------------------
# Seasonality — month-of-year revenue index vs the all-time monthly mean
# ---------------------------------------------------------------------------
@query(
    "orders_seasonality",
    oracle="""
    WITH monthly AS (
      SELECT CAST(month(o_orderdate) AS INT) AS month_of_year,
             CAST(year(o_orderdate) AS INT) AS yr,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1, 2
    ),
    moy AS (
      SELECT month_of_year,
             CAST(SUM(cents) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n_months
      FROM monthly GROUP BY month_of_year
    )
    SELECT month_of_year,
           ROUND(cents / 100.0, 2) AS revenue,
           n_months,
           ROUND((cents / CAST(n_months AS DOUBLE))
                 / ((SELECT SUM(cents) FROM moy)
                    / CAST((SELECT SUM(n_months) FROM moy) AS DOUBLE)), 4)
             AS seasonal_index
    FROM moy
    """,
)
def orders_seasonality(spark, sf_dir):
    """Month-of-year seasonality index: each calendar month's average
    monthly revenue relative to the overall monthly average (1.0 = an
    average month; December retail spikes show up as > 1) — the
    decomposition step before any demand forecast.  Exact integer
    cents through every aggregate; the index divides two exact
    averages once, rounded identically in both engines.

    Scale shape: fact -> (month, year) aggregate (map-side combined,
    calendar-sized output) -> month-of-year rollup; the global totals
    ride along as a broadcast 1-row frame."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.month("o_orderdate").cast("int").alias("month_of_year"),
        F.year("o_orderdate").cast("int").alias("yr"),
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    moy = monthly.groupBy("month_of_year").agg(
        F.sum("cents").alias("cents"), F.count(F.lit(1)).alias("n_months")
    )
    totals = moy.agg(
        F.sum("cents").alias("tc"), F.sum("n_months").alias("tm")
    )
    return (
        moy.crossJoin(F.broadcast(totals))
        .select(
            "month_of_year",
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.col("n_months").cast("long").alias("n_months"),
            F.round(
                (F.col("cents") / F.col("n_months").cast("double"))
                / (F.col("tc") / F.col("tm").cast("double")),
                4,
            ).alias("seasonal_index"),
        )
    )


# ---------------------------------------------------------------------------
# Cohort LTV — cumulative purchase value by signup cohort and week age
# ---------------------------------------------------------------------------
@query(
    "user_ltv_cohort",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    purchases AS (
      SELECT f.cohort_week,
             CAST(floor(date_diff('day', f.cohort_week,
                                  CAST(date_trunc('day', e.ts) AS DATE)) / 7)
                  AS INT) AS week_age,
             CAST(ROUND(e.value * 100) AS BIGINT) AS cents
      FROM events e JOIN firsts f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
    )
    SELECT cohort_week, week_age,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(SUM(cents) / 100.0, 2) AS revenue
    FROM purchases GROUP BY cohort_week, week_age
    """,
)
def user_ltv_cohort(spark, sf_dir):
    """Cohort lifetime-value triangle: users grouped by first-seen
    week, purchase revenue bucketed by whole weeks since cohort entry
    — the money-dimension sibling of ``cohort_retention`` (who comes
    back) that answers what they are WORTH as they age.  Integer date
    math for the age bucket, exact cents for revenue.

    Scale shape: one per-user MIN aggregate (the cohort map — user-
    dimension-sized, shuffles once on user_id), one equi-join back to
    the purchase slice of the fact, one map-side-combined aggregate to
    the |cohorts x ages| triangle."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "cohort_week",
            F.floor(
                F.datediff(F.to_date(F.date_trunc("day", "ts")), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_age"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    return purchases.groupBy("cohort_week", "week_age").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Point-in-time state — AS OF reconstruction from the event log
# ---------------------------------------------------------------------------
@query(
    "point_in_time_state",
    oracle="""
    WITH cutoff AS (
      -- exact integer microseconds so both engines pick the identical
      -- boundary instant
      SELECT MIN(epoch_us(ts))
             + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 2 AS t_us
      FROM events
    ),
    ranked AS (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_events
      FROM events, cutoff WHERE epoch_us(ts) <= cutoff.t_us
    )
    SELECT user_id,
           event_type AS last_event_type,
           ts AS last_event_ts,
           CAST(n_events AS BIGINT) AS n_events,
           ROUND(value, 4) AS last_value
    FROM ranked WHERE rn = 1
    """,
)
def point_in_time_state(spark, sf_dir):
    """AS OF state reconstruction — the time-travel query every
    event-sourced system needs: each user's state at a historical
    cutoff (here the corpus midpoint, derived from the data so the
    query is SF-agnostic), defined as their latest event at or before
    the cutoff plus how many events they had accumulated.  Users with
    no events by the cutoff correctly do not exist yet.

    Scale shape: the cutoff predicate prunes the scan FIRST (on a
    time-clustered layout this is file skipping — see
    ``write_clustered``), then one per-user window picks the frontier
    row; no self-join, no global order.  The same plan answers any
    cutoff, which is how a lakehouse emulates snapshot reads over an
    append-only log."""
    e = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    cut = e.agg(
        (
            F.min(us)
            + F.floor((F.max(us) - F.min(us)) / 2)
        ).alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wn = Window.partitionBy("user_id")
    return (
        e.crossJoin(F.broadcast(cut))
        .filter(us <= F.col("t_us"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_events", F.count(F.lit(1)).over(wn))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("ts").alias("last_event_ts"),
            F.col("n_events").cast("long").alias("n_events"),
            F.round("value", 4).alias("last_value"),
        )
    )


# ---------------------------------------------------------------------------
# Open-order backlog timeline — interval facts folded to +1/-1 delta events
# ---------------------------------------------------------------------------
@query(
    "orders_backlog_timeline",
    oracle="""
    WITH closes AS (
      SELECT l_orderkey, MAX(l_shipdate) AS close_ts
      FROM lineitem GROUP BY l_orderkey
    ),
    ev AS (
      SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS month,
             1 AS op, 0 AS cl
      FROM orders o JOIN closes c ON c.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT CAST(date_trunc('month', c.close_ts) AS TIMESTAMP), 0, 1
      FROM orders o JOIN closes c ON c.l_orderkey = o.o_orderkey
    ),
    m AS (
      SELECT month, SUM(op) AS n_opened, SUM(cl) AS n_closed
      FROM ev GROUP BY month
    )
    SELECT month,
           CAST(n_opened AS BIGINT) AS n_opened,
           CAST(n_closed AS BIGINT) AS n_closed,
           CAST(SUM(n_opened - n_closed) OVER (
                  ORDER BY month
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS backlog
    FROM m
    """,
)
def orders_backlog_timeline(spark, sf_dir):
    """Month-end open-order backlog: every order is an interval —
    opened at ``o_orderdate``, closed when its LAST lineitem ships —
    and the timeline asks how many sit open at each month end.  The
    WIP/inventory question every operations dashboard runs against an
    interval fact table.

    Scale shape: the classic sweep-line reduction — intervals fold to
    +1/-1 delta EVENTS, events aggregate to month grain FIRST (one
    map-side-combined shuffle over the fact; the close timestamp is
    itself one agg over lineitem), and only then does a running-sum
    window touch the tiny month axis (~85 rows — a global window is
    fine at calendar grain because the aggregation already happened;
    windowing the raw fact on a global order would be the scale
    killer).  Counts are exact integers.  Orders with no lineitems
    (impossible in TPC-H) would be excluded by the inner join on
    both sides.

    Reference scope: net-new analytics (the reference's visit tables
    carry the same open/close interval shape it never aggregates)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    closes = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close_ts"))
    oc = o.join(closes, o.o_orderkey == closes.l_orderkey)
    # both sweep events emit from ONE pass over the joined frame (an
    # exploded 2-struct array) — the former open/close unionAll re-ran
    # the close aggregate and the join per branch
    ev = oc.select(
        F.explode(
            F.array(
                F.struct(
                    F.date_trunc("month", "o_orderdate").alias("month"),
                    F.lit(1).alias("op"),
                    F.lit(0).alias("cl"),
                ),
                F.struct(
                    F.date_trunc("month", "close_ts").alias("month"),
                    F.lit(0).alias("op"),
                    F.lit(1).alias("cl"),
                ),
            )
        ).alias("e")
    ).select("e.month", "e.op", "e.cl")
    m = ev.groupBy("month").agg(
        F.sum("op").alias("n_opened"), F.sum("cl").alias("n_closed")
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return m.select(
        "month",
        F.col("n_opened").cast("long").alias("n_opened"),
        F.col("n_closed").cast("long").alias("n_closed"),
        F.sum(F.col("n_opened") - F.col("n_closed"))
        .over(w)
        .cast("long")
        .alias("backlog"),
    )


# ---------------------------------------------------------------------------
# Supplier-base churn — quarter-over-quarter retained / new / churned
# ---------------------------------------------------------------------------
@query(
    "supplier_churn_quarters",
    oracle="""
    WITH qx AS (
      SELECT DISTINCT CAST(year(l_shipdate) AS INTEGER) AS y,
                      CAST(quarter(l_shipdate) AS INTEGER) AS q,
                      CAST(year(l_shipdate) * 4 + quarter(l_shipdate) - 1
                           AS BIGINT) AS qidx,
                      l_suppkey AS s
      FROM lineitem
    ),
    act AS (
      SELECT qidx, MIN(y) AS y, MIN(q) AS q, COUNT(*) AS n_active
      FROM qx GROUP BY qidx
    ),
    ret AS (
      SELECT a.qidx, COUNT(*) AS n_retained
      FROM qx a JOIN qx b ON b.qidx = a.qidx - 1 AND b.s = a.s
      GROUP BY a.qidx
    ),
    chn AS (
      SELECT b.qidx + 1 AS qidx, COUNT(*) AS n_churned
      FROM qx b LEFT JOIN qx a ON a.qidx = b.qidx + 1 AND a.s = b.s
      WHERE a.s IS NULL GROUP BY b.qidx + 1
    )
    SELECT act.y AS year, act.q AS quarter,
           CAST(act.n_active AS BIGINT) AS n_active,
           CAST(COALESCE(ret.n_retained, 0) AS BIGINT) AS n_retained,
           CAST(act.n_active - COALESCE(ret.n_retained, 0)
                AS BIGINT) AS n_new,
           CAST(COALESCE(chn.n_churned, 0) AS BIGINT) AS n_churned
    FROM act
    LEFT JOIN ret ON ret.qidx = act.qidx
    LEFT JOIN chn ON chn.qidx = act.qidx
    """,
)
def supplier_churn_quarters(spark, sf_dir):
    """Quarter-over-quarter supplier-base accounting: per quarter, how
    many suppliers shipped anything (active), how many of those also
    shipped last quarter (retained), how many are new, and how many of
    last quarter's suppliers went silent (churned, attributed to the
    quarter they missed).  The standard cohort-churn ledger, here over
    the supply side.

    Scale shape: the fact collapses to DISTINCT (quarter, supplier)
    first — one shuffle over lineitem, after which every join touches
    only |quarters|x|suppliers| rows.  Adjacency is an equi-join on a
    DENSE quarter index (year*4+quarter), not a window over a global
    order, so the plan stays shuffle-bounded by the distinct frame
    regardless of history length.  Exact integer counts; identity
    n_active = n_retained + n_new holds by construction.

    Reference scope: net-new analytics; generalizes the reference's
    per-table row reconciliation counts (A3) into a temporal ledger."""
    li = load(spark, sf_dir, "lineitem")
    qx = (
        li.select(
            F.year("l_shipdate").alias("y"),
            F.quarter("l_shipdate").alias("q"),
            F.col("l_suppkey").alias("s"),
        )
        .distinct()
        .withColumn(
            "qidx", (F.col("y") * 4 + F.col("q") - 1).cast("long")
        )
    )
    act = qx.groupBy("qidx").agg(
        F.min("y").alias("y"),
        F.min("q").alias("q"),
        F.count(F.lit(1)).alias("n_active"),
    )
    a, b = qx.alias("a"), qx.alias("b")
    ret = (
        a.join(
            b,
            (F.col("b.qidx") == F.col("a.qidx") - 1)
            & (F.col("b.s") == F.col("a.s")),
        )
        .groupBy(F.col("a.qidx").alias("qidx"))
        .agg(F.count(F.lit(1)).alias("n_retained"))
    )
    chn = (
        b.join(
            a,
            (F.col("a.qidx") == F.col("b.qidx") + 1)
            & (F.col("a.s") == F.col("b.s")),
            "left_anti",
        )
        .groupBy((F.col("b.qidx") + 1).alias("qidx"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    return (
        act.join(ret, "qidx", "left")
        .join(chn, "qidx", "left")
        .select(
            F.col("y").alias("year"),
            F.col("q").alias("quarter"),
            F.col("n_active").cast("long").alias("n_active"),
            F.coalesce("n_retained", F.lit(0)).cast("long").alias("n_retained"),
            (F.col("n_active") - F.coalesce("n_retained", F.lit(0)))
            .cast("long")
            .alias("n_new"),
            F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
        )
    )


# ---------------------------------------------------------------------------
# Per-user feature matrix — the feature-extraction leg of a training pipeline
# ---------------------------------------------------------------------------
@query(
    "user_feature_matrix",
    oracle="""
    WITH base AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(ROUND(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS revenue_cents,
             MIN(ts) AS first_seen,
             MAX(ts) AS last_seen
      FROM events GROUP BY user_id
    ),
    tc AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT user_id, event_type AS top_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY c DESC, event_type) AS rk
      FROM tc
    )
    SELECT b.user_id, b.n_events, b.active_days, b.n_purchases,
           b.revenue_cents, b.first_seen, b.last_seen,
           (b.n_events * 1000) // b.active_days AS events_per_day_milli,
           m.top_type
    FROM base b JOIN m ON m.user_id = b.user_id AND m.rk = 1
    """,
)
def user_feature_matrix(spark, sf_dir):
    """Per-user feature extraction over the event log — the feature
    matrix a training pipeline materializes before model fitting
    (activity volume, tenure bounds, monetization, dominant behavior):
    n_events, active days, purchase count, exact-integer revenue
    cents, first/last seen, events-per-active-day (integer
    milli-units via BIGINT floor division — no float drift), and the
    modal event type (ties broken lexicographically).

    Scale shape: ONE aggregation pass over the fact for the numeric
    features plus one (user, type) count for the mode — both map-side
    combinable, both keyed on user, so at cluster scale the final join
    reuses the same hash partitioning; nothing driver-side, no global
    window (the mode's row_number partitions by user).  The bare
    SUM(BIGINT)s are wrapped in CAST inside the oracle's final
    projection — the DuckDB HUGEINT widening the r4->r5
    `session_attribution` forensics isolated (the driver's pandas
    canonicalizer floats int128 columns).
    """
    e = load(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    cents = F.round(F.col("value") * 100).cast("long")
    base = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(F.to_date("ts")).alias("active_days"),
        F.sum(F.when(is_purchase, 1).otherwise(0)).cast("long").alias("n_purchases"),
        F.sum(F.when(is_purchase, cents).otherwise(0)).cast("long").alias(
            "revenue_cents"
        ),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
    )
    tc = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("user_id").orderBy(F.col("c").desc(), "event_type")
    mode = (
        tc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("top_type"))
    )
    return base.join(mode, "user_id").select(
        "user_id",
        "n_events",
        "active_days",
        "n_purchases",
        "revenue_cents",
        "first_seen",
        "last_seen",
        F.expr("(n_events * 1000) DIV active_days").alias("events_per_day_milli"),
        "top_type",
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier) — dominance query via the two-level prefix-min
# ---------------------------------------------------------------------------
@query(
    "part_skyline_brand",
    oracle="""
    WITH p AS (
      SELECT p_brand, p_partkey,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
             CAST(p_size AS BIGINT) AS size
      FROM part
    )
    SELECT a.p_brand, a.p_partkey, a.price_cents, a.size
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.p_brand = a.p_brand
        AND b.price_cents <= a.price_cents AND b.size <= a.size
        AND (b.price_cents < a.price_cents OR b.size < a.size)
    )
    """,
)
def part_skyline_brand(spark, sf_dir):
    """Per-brand Pareto frontier (skyline) of parts minimizing
    (price, size) — the multi-criteria shortlist query (Borzsony,
    Kossmann & Stocker, ICDE'01).  A part is on its brand's skyline
    iff no same-brand part is <= on both dimensions and < on one;
    ties on BOTH dimensions are mutually non-dominating and all kept.

    Spark formulation — the 2-D sort-scan reduced to aggregations and
    a SMALL-frame prefix scan, no quadratic pass anywhere: collapse to
    one row per (brand, price) with that price's minimal size (an agg,
    map-side combinable), compute each price's strictly-cheaper
    running minimum with a lag-shifted window over the COLLAPSED frame
    (bounded by distinct prices per brand, orders of magnitude smaller
    than parts; at 100 TB the same shape buckets prices first and
    prefix-scans bucket minima — the classic two-level scan), then
    keep parts that (a) hit their price's minimal size and (b) beat
    every strictly-cheaper price's minimum.  The oracle states the
    NOT EXISTS dominance definition directly — a structurally
    different formulation, which is what makes the hash gate strong.

    Reference scope: net-new (no counterpart in mhawila/beehive);
    integer cents keep the hash exact."""
    p = load(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    per_price = p.groupBy("p_brand", "price_cents").agg(
        F.min("size").alias("min_size")
    )
    w = (
        Window.partitionBy("p_brand")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pref = per_price.withColumn("cheaper_min", F.min("min_size").over(w))
    return (
        p.join(pref, ["p_brand", "price_cents"])
        .filter(
            (F.col("size") == F.col("min_size"))
            & (
                F.col("cheaper_min").isNull()
                | (F.col("size") < F.col("cheaper_min"))
            )
        )
        .select("p_brand", "p_partkey", "price_cents", "size")
    )


# ---------------------------------------------------------------------------
# Z-order layout — Morton-curve clustering buckets with per-bucket stats
# ---------------------------------------------------------------------------
_Z_BITS = 16
_Z_BUCKETS = 64


def _zorder_oracle() -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((gx >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((gy >> {i}) & 1) * {1 << (2 * i + 1)}")
    zexpr = " + ".join(terms)
    gmax = (1 << _Z_BITS) - 1
    return f"""
    WITH c AS (
      SELECT o_custkey AS x,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
      FROM orders
    ),
    b AS (SELECT MIN(x) mnx, MAX(x) mxx, MIN(y) mny, MAX(y) mxy FROM c),
    g AS (
      SELECT x, y,
             CASE WHEN mxx = mnx THEN 0
                  ELSE (x - mnx) * {gmax} // (mxx - mnx) END AS gx,
             CASE WHEN mxy = mny THEN 0
                  ELSE (y - mny) * {gmax} // (mxy - mny) END AS gy
      FROM c, b
    ),
    z AS (SELECT x, y, {zexpr} AS zval FROM g)
    SELECT CAST(zval * {_Z_BUCKETS} // {1 << (2 * _Z_BITS)} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(x) AS min_custkey, MAX(x) AS max_custkey,
           MIN(y) AS min_cents, MAX(y) AS max_cents
    FROM z GROUP BY 1
    """


@query("zorder_layout", oracle=_zorder_oracle())
def zorder_layout(spark, sf_dir):
    """Z-order (Morton-curve) clustering assignment over orders on the
    (customer, total price) plane — the multi-dimensional layout key
    behind Delta/Iceberg ``ZORDER BY`` (``functions/zorder.py``).
    Each order's two dimensions map onto a 16-bit grid (pure BIGINT
    arithmetic off 1-row min/max bounds), interleave into a Morton
    code, and fall into one of 64 equal-width Z-ranges — the "file"
    a clustered rewrite would place them in.  The output is the
    per-bucket row count plus min/max of BOTH dimensions: the
    demonstration IS those ranges, tight on customer AND price
    simultaneously, which is what lets file-level min/max statistics
    prune scans for predicates on either column.  A single-column
    sort would show one tight dimension and the other spanning the
    whole domain.

    Scale shape: the bounds are one map-side-combined aggregate
    broadcast back as a 1-row frame; the Morton code is 2*16 unrolled
    shift/mask terms inside whole-stage codegen; bucket stats are one
    map-side-combinable agg on the bucket key.  In a real rewrite the
    bucket id feeds ``repartitionByRange`` + ``sortWithinPartitions``
    before the write — the assignment computed here is that plan's
    partition key, and the integer `div` keeps it identical on any
    engine."""
    from beehive_spark.functions.zorder import grid_scale, z_value

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    bounds = o.agg(
        F.min("x").alias("mnx"),
        F.max("x").alias("mxx"),
        F.min("y").alias("mny"),
        F.max("y").alias("mxy"),
    )
    g = o.crossJoin(F.broadcast(bounds)).select(
        "x",
        "y",
        grid_scale(F.col("x"), F.col("mnx"), F.col("mxx"), _Z_BITS).alias("gx"),
        grid_scale(F.col("y"), F.col("mny"), F.col("mxy"), _Z_BITS).alias("gy"),
    )
    z = g.select("x", "y", z_value(F.col("gx"), F.col("gy"), _Z_BITS).alias("zval"))
    bucket = F.call_function(
        "div", F.col("zval") * _Z_BUCKETS, F.lit(1 << (2 * _Z_BITS)).cast("long")
    )
    return z.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("x").alias("min_custkey"),
        F.max("x").alias("max_custkey"),
        F.min("y").alias("min_cents"),
        F.max("y").alias("max_cents"),
    )


# ---------------------------------------------------------------------------
# Interval concurrency — sweep-line max-overlap via two-level prefix sums
# ---------------------------------------------------------------------------
@query(
    "interval_concurrency",
    oracle="""
    WITH iv AS (
      SELECT epoch_us(ts) AS s,
             epoch_us(ts)
               + (((CAST(ROUND(value * 100) AS BIGINT) % 3540) + 3540) % 3540
                  + 60) * 1000000
               AS e
      FROM events
    ),
    d AS (
      SELECT t, SUM(delta) AS net FROM (
        SELECT s AS t, 1 AS delta FROM iv
        UNION ALL SELECT e AS t, -1 AS delta FROM iv
      ) GROUP BY t
    ),
    r AS (
      SELECT t, t // 3600000000 AS h,
             SUM(net) OVER (ORDER BY t) AS run
      FROM d
    ),
    r2 AS (
      SELECT *, COALESCE(LAG(run) OVER (ORDER BY t), 0) AS prev FROM r
    )
    SELECT make_timestamp(h * 3600000000) AS hour_start,
           CAST(GREATEST(FIRST(prev ORDER BY t), MAX(run)) AS BIGINT)
             AS max_concurrent
    FROM r2 GROUP BY h
    """,
)
def interval_concurrency(spark, sf_dir):
    """Maximum number of concurrently-open sessions per hour — the
    sweep-line / max-overlap primitive (room bookings, connection
    pools, ad impressions), over intervals opened at each event's
    timestamp and held for a value-derived 1-60-minute duration
    (non-negative modulo on BOTH engines — Spark ``pmod`` vs DuckDB's
    sign-of-dividend ``%`` wrapped as ``((x%m)+m)%m`` — so a negative
    event value cannot produce an end-before-start interval on one
    side only).
    Each interval contributes +1 at its start and -1 at its
    (exclusive) end; concurrency at any instant is the prefix sum of
    those deltas, and the per-hour answer is the max of that step
    function over the hour — including its carry-in level before the
    hour's first boundary.  Hours containing no boundary emit no row
    (their level equals the previous hour's closing value).

    Scale shape — the textbook GLOBAL running sum decomposed into the
    Blelloch two-level scan, because a single global window is the
    canonical 100 TB anti-pattern: deltas net per exact timestamp (one
    map-side-combinable agg), the within-hour running sum partitions
    by hour (bounded windows, full parallelism), and only the
    per-hour NET totals — a frame bounded by the time span in hours,
    orders of magnitude smaller than events — pass through the
    cross-hour cumulative window that produces each hour's carry-in.
    At a century of hourly buckets that frame is <1M rows; bucket
    granularity is the knob.  Everything is BIGINT microseconds, so
    the oracle (the honest single global window) hash-matches
    exactly."""
    e = load(spark, sf_dir, "events")
    dur_us = (
        (F.pmod(F.round(F.col("value") * 100).cast("long"), F.lit(3540)) + 60)
        * F.lit(1_000_000)
    )
    iv = e.select(
        F.unix_micros("ts").alias("s"), (F.unix_micros("ts") + dur_us).alias("e")
    )
    deltas = iv.select(F.col("s").alias("t"), F.lit(1).alias("delta")).unionByName(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    d = (
        deltas.groupBy("t")
        .agg(F.sum("delta").alias("net"))
        .withColumn(
            "h", F.call_function("div", F.col("t"), F.lit(3_600_000_000).cast("long"))
        )
    )
    wb = (
        Window.partitionBy("h")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d2 = d.withColumn("run_in", F.sum("net").over(wb))
    per_h = d2.groupBy("h").agg(
        F.max("run_in").alias("mxr"), F.sum("net").alias("net_h")
    )
    wg = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, -1)
    per_h2 = per_h.withColumn(
        "carry", F.coalesce(F.sum("net_h").over(wg), F.lit(0)).cast("long")
    )
    return per_h2.select(
        F.timestamp_micros((F.col("h") * F.lit(3_600_000_000)).cast("long")).alias(
            "hour_start"
        ),
        F.greatest(F.col("carry"), F.col("carry") + F.col("mxr"))
        .cast("long")
        .alias("max_concurrent"),
    )


# ---------------------------------------------------------------------------
# Time-series resample — hourly grid + exact integer linear interpolation
# ---------------------------------------------------------------------------
@query(
    "events_resample",
    oracle="""
    WITH pts AS (
      SELECT user_id, epoch_us(ts) AS t,
             MIN(CAST(ROUND(value * 1000) AS BIGINT)) AS v
      FROM events GROUP BY user_id, epoch_us(ts)
    ),
    b AS (
      SELECT user_id,
             (MIN(t) + 3599999999) // 3600000000 AS h0,
             MAX(t) // 3600000000 AS h1
      FROM pts GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(range(h0, h1 + 1)) * 3600000000 AS g
      FROM b WHERE h0 <= h1
    ),
    pv AS (
      SELECT grid.user_id, grid.g, pts.t AS tp, pts.v AS vp
      FROM grid ASOF JOIN pts
        ON grid.user_id = pts.user_id AND pts.t <= grid.g
    ),
    nx AS (
      SELECT grid.user_id, grid.g, pts.t AS tn, pts.v AS vn
      FROM grid ASOF JOIN pts
        ON grid.user_id = pts.user_id AND pts.t >= grid.g
    )
    SELECT pv.user_id, make_timestamp(pv.g) AS hour_start,
           CAST(CASE WHEN nx.tn = pv.tp THEN pv.vp
                ELSE (pv.vp * (nx.tn - pv.g) + nx.vn * (pv.g - pv.tp))
                     // (nx.tn - pv.tp) END AS BIGINT) AS v_milli
    FROM pv JOIN nx ON pv.user_id = nx.user_id AND pv.g = nx.g
    """,
)
def events_resample(spark, sf_dir):
    """Per-user resampling of the event value series onto an hourly
    grid with LINEAR INTERPOLATION between the surrounding
    observations — the gap-fill primitive of every time-series
    pipeline (metrics rollups, sensor alignment, feature windows).
    The grid spans each user's own [first, last] observation, so
    both neighbors always exist; a grid point landing exactly on an
    observation takes its value.

    Exactness: values are integer MILLI-units and the interpolation
    is ``(vp*(tn-g) + vn*(g-tp)) div (tn-tp)`` in BIGINT
    microseconds.  Spark's registered ``div`` and DuckDB's ``//``
    BOTH truncate toward zero (empirically verified on negatives —
    see ``functions/__init__.py``), so the parity is bit-exact for
    ANY value sign, negative fixture vintages included — no doubles
    anywhere and no non-negativity assumption.

    Scale shape: BOTH neighbor lookups ride ONE union-trick pass —
    grid points and observations union once, and the backward and
    forward running ``last(obs_struct)`` windows share the same
    user_id partitioning, so the whole resample is a single exchange
    plus two in-partition sorts (r11; the former shape ran
    :func:`operators.temporal.asof_join` twice and equi-joined the two
    outputs — three shuffles and ~5 evaluations of the points frame;
    isolated best 5.46 -> 1.44 s at sf0.1).  The per-direction
    semantics are identical to ``asof_join``'s: the observation struct
    is non-null exactly on observation rows, ties at equal timestamp
    order observations first, so equal timestamps match in both
    directions.  The oracle uses DuckDB's native ASOF JOIN — an
    independent implementation of the same semantics."""
    e = load(spark, sf_dir, "events")
    HOUR = 3_600_000_000
    pts = e.groupBy(
        "user_id", F.unix_micros("ts").alias("t")
    ).agg(F.min(F.round(F.col("value") * 1000).cast("long")).alias("v"))
    b = pts.groupBy("user_id").agg(
        F.call_function(
            "div", F.min("t") + F.lit(HOUR - 1), F.lit(HOUR).cast("long")
        ).alias("h0"),
        F.call_function("div", F.max("t"), F.lit(HOUR).cast("long")).alias("h1"),
    )
    grid = (
        b.filter(F.col("h0") <= F.col("h1"))
        .select(
            "user_id", F.explode(F.sequence("h0", "h1")).alias("h")
        )
        .select("user_id", (F.col("h") * HOUR).cast("long").alias("g"))
    )
    obs = pts.select(
        "user_id",
        F.col("t").alias("tt"),
        F.lit(0).alias("side"),
        F.struct(F.col("t").alias("ot"), F.col("v").alias("ov")).alias("o"),
    )
    u = grid.select(
        "user_id",
        F.col("g").alias("tt"),
        F.lit(1).alias("side"),
        F.lit(None).cast("struct<ot:bigint,ov:bigint>").alias("o"),
    ).unionByName(obs)
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("tt").asc(), F.col("side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("tt").desc(), F.col("side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    j = (
        u.withColumn("p", F.last("o", ignorenulls=True).over(wb))
        .withColumn("n", F.last("o", ignorenulls=True).over(wf))
        .filter(F.col("side") == 1)
        .select(
            "user_id",
            F.col("tt").alias("g"),
            F.col("p.ot").alias("tp"),
            F.col("p.ov").alias("vp"),
            F.col("n.ot").alias("tn"),
            F.col("n.ov").alias("vn"),
        )
    )
    interp = F.call_function(
        "div",
        F.col("vp") * (F.col("tn") - F.col("g"))
        + F.col("vn") * (F.col("g") - F.col("tp")),
        F.col("tn") - F.col("tp"),
    )
    return j.select(
        "user_id",
        F.timestamp_micros(F.col("g")).alias("hour_start"),
        F.when(F.col("tn") == F.col("tp"), F.col("vp"))
        .otherwise(interp)
        .cast("long")
        .alias("v_milli"),
    )


# ---------------------------------------------------------------------------
# EWMA — exact-integer exponential smoothing as a per-key array fold
# ---------------------------------------------------------------------------
@query(
    "events_ewma",
    oracle="""
    WITH pts AS (
      SELECT user_id, epoch_us(ts) AS t,
             CAST(ROUND(value * 1000) AS BIGINT) AS v
      FROM events
    ),
    l AS (
      SELECT user_id, list(v ORDER BY t, v) AS vs,
             CAST(COUNT(*) AS BIGINT) AS n_points
      FROM pts GROUP BY user_id
    )
    SELECT user_id, n_points,
           CAST(list_reduce(vs, (acc, x) -> (3 * x + 7 * acc) // 10)
                AS BIGINT) AS ewma_milli
    FROM l
    """,
)
def events_ewma(spark, sf_dir):
    """Per-user exponentially-weighted moving average of event values
    (alpha = 0.3) — the standard streaming smoother for rate/level
    tracking, computed as an EXACT INTEGER recurrence:
    ``s_i = (3*v_i + 7*s_{i-1}) div 10`` over milli-unit values,
    seeded with the first observation.  Rounding at every step makes
    the result bit-identical on any engine (no float accumulation
    order to disagree about) — DuckDB folds the same recurrence with
    ``list_reduce``, an independent implementation of the fold.

    Scale shape: EWMA has an inherent SEQUENTIAL dependency per key —
    the per-step integer truncation is non-associative, so unlike sums it
    cannot be split map-side without changing the answer.  The
    distributed shape is therefore keys-in-parallel: one shuffle
    groups each user's series, ``array_sort`` orders it (ties broken
    by value, deterministically), and a JVM ``aggregate`` lambda folds
    it — memory bounded by the longest single series, never the
    corpus.  A key whose series outgrows an executor needs windowed
    re-seeding or a float EWMA with documented tolerance; this
    operator keeps the exact contract and states the bound.  Ordering
    by event time, the fold is also exactly what a Structured
    Streaming ``applyInPandasWithState`` smoother would carry as its
    per-key state — the batch and streaming shapes share the
    recurrence."""
    e = load(spark, sf_dir, "events")
    pts = e.select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.round(F.col("value") * 1000).cast("long").alias("v"),
    )
    l = pts.groupBy("user_id").agg(
        F.collect_list(F.struct("t", "v")).alias("ps"),
        F.count(F.lit(1)).alias("n_points"),
    )
    vs = F.transform(F.array_sort("ps"), lambda s: s["v"])
    l = l.withColumn("vs", vs)
    fold = F.aggregate(
        F.slice(F.col("vs"), 2, F.size("vs") - 1),
        F.element_at(F.col("vs"), 1),
        lambda acc, x: F.call_function(
            "div",
            F.lit(3).cast("long") * x + F.lit(7).cast("long") * acc,
            F.lit(10).cast("long"),
        ),
    )
    return l.select("user_id", "n_points", fold.cast("long").alias("ewma_milli"))


# ---------------------------------------------------------------------------
# Holt double exponential smoothing — exact integer (level, trend) fold
# ---------------------------------------------------------------------------
@query(
    "events_holt",
    oracle="""
    WITH pts AS (
      SELECT user_id, epoch_us(ts) AS t,
             CAST(ROUND(value * 1000) AS BIGINT) AS v
      FROM events
    ),
    l AS (
      SELECT user_id, list(v ORDER BY t, v) AS vs,
             CAST(COUNT(*) AS BIGINT) AS n_points
      FROM pts GROUP BY user_id
    ),
    f AS (
      SELECT user_id, n_points,
             list_reduce(
               list_transform(vs, v -> [v, v, CAST(0 AS BIGINT)]),
               (acc, x) -> [
                 x[1],
                 (3 * x[1] + 7 * (acc[2] + acc[3])) // 10,
                 (2 * ((3 * x[1] + 7 * (acc[2] + acc[3])) // 10 - acc[2])
                  + 8 * acc[3]) // 10
               ]) AS s
      FROM l
    )
    SELECT user_id, n_points,
           CAST(s[2] AS BIGINT) AS level_milli,
           CAST(s[3] AS BIGINT) AS trend_milli,
           CAST(s[2] + s[3] AS BIGINT) AS forecast_milli
    FROM f
    """,
)
def events_holt(spark, sf_dir):
    """Per-user Holt double exponential smoothing (level + trend,
    alpha = 0.3, beta = 0.2) — the forecasting upgrade of
    :func:`events_ewma`: the same exact integer milli-unit recurrence
    discipline, but the fold state is the PAIR
    ``l_i = (3*v_i + 7*(l+b)) div 10``,
    ``b_i = (2*(l_i - l) + 8*b) div 10``, seeded (l, b) = (v_1, 0),
    and the one-step-ahead forecast is ``l + b``.  Per-step integer
    truncation makes the result bit-identical on any engine.

    ENGINE FINDING (the r7 division-parity lesson applied forward —
    test the engines before trusting a construct): DuckDB 1.0.0's
    ``list_reduce`` MISCOMPUTES this recurrence when the accumulator
    is a STRUCT (struct_pack state returned trend 0 where the python
    fold and step-by-step composition give 1, reproduced this
    session); the LIST-accumulator form folds correctly and matches
    the python twin, so both the oracle and this docstring pin the
    state as a 3-element BIGINT list ``[v, l, b]``.

    Scale shape: identical to events_ewma — the truncated fold is
    sequential PER KEY by construction, so the distributed shape is
    keys-in-parallel: one shuffle groups each user's series,
    array_sort orders it (ties by value, deterministic), one JVM
    ``aggregate`` lambda folds it; memory bounds at the longest single
    series.  The (level, trend) pair is also exactly the per-key state
    a Structured Streaming ``applyInPandasWithState`` forecaster would
    carry."""
    e = load(spark, sf_dir, "events")
    pts = e.select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.round(F.col("value") * 1000).cast("long").alias("v"),
    )
    grouped = pts.groupBy("user_id").agg(
        F.collect_list(F.struct("t", "v")).alias("ps"),
        F.count(F.lit(1)).alias("n_points"),
    )
    vs = F.transform(F.array_sort("ps"), lambda s: s["v"])
    grouped = grouped.withColumn("vs", vs)

    def _step(acc, x):
        ten = F.lit(10).cast("long")
        nl = F.call_function(
            "div",
            F.lit(3).cast("long") * x
            + F.lit(7).cast("long") * (F.element_at(acc, 1) + F.element_at(acc, 2)),
            ten,
        )
        nb = F.call_function(
            "div",
            F.lit(2).cast("long") * (nl - F.element_at(acc, 1))
            + F.lit(8).cast("long") * F.element_at(acc, 2),
            ten,
        )
        return F.array(nl, nb)

    fold = F.aggregate(
        F.slice(F.col("vs"), 2, F.size("vs") - 1),
        F.array(F.element_at(F.col("vs"), 1), F.lit(0).cast("long")),
        _step,
    )
    return grouped.select(
        "user_id",
        "n_points",
        F.element_at(fold, 1).alias("level_milli"),
        F.element_at(fold, 2).alias("trend_milli"),
        (F.element_at(fold, 1) + F.element_at(fold, 2)).alias("forecast_milli"),
    )


# ---------------------------------------------------------------------------
# TWAP — time-weighted average as exact integer interval weighting
# ---------------------------------------------------------------------------
@query(
    "events_twap",
    oracle="""
    WITH pts AS (
      SELECT user_id, epoch_us(ts) AS t,
             CAST(ROUND(value * 1000) AS BIGINT) AS v
      FROM events
    ),
    agg AS (
      SELECT user_id, t,
             MIN(v) AS v
      FROM pts GROUP BY user_id, t
    ),
    iv AS (
      SELECT user_id, v, t,
             lead(t) OVER (PARTITION BY user_id ORDER BY t) AS tn
      FROM agg
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(tn - t) AS BIGINT) AS span_us,
           CAST(SUM(v * (tn - t)) // SUM(tn - t) AS BIGINT) AS twap_milli
    FROM iv WHERE tn IS NOT NULL
    GROUP BY user_id
    """,
)
def events_twap(spark, sf_dir):
    """Per-user TIME-WEIGHTED average value (TWAP — the standard
    execution-quality/metrics-rollup statistic): each observation's
    value is held until the next one, so the average weights values by
    HOLD DURATION, not by sample count — the correct summary for
    irregularly sampled series where a plain mean over-represents
    bursts.  Values are integer MILLI-units, durations exact BIGINT
    microseconds, and the final divide is the registered ``div`` —
    truncating toward zero exactly like the oracle's ``//`` for ANY
    value sign (see ``functions/__init__.py``) — so the result is
    bit-identical across engines (same exact-integer discipline as
    ``events_ewma`` /
    ``events_resample``, which share the per-(user, ts) MIN
    pre-aggregation for duplicate-timestamp determinism).

    Scale shape: one shuffle groups each user's points, one lead
    window computes hold intervals inside the partition, one
    map-side-combinable agg folds the weighted sums — no self-join,
    no grid materialization; users with a single observation hold
    nothing and drop out (zero-span TWAP is undefined).

    Reference scope: net-new temporal capability (the reference is
    relational-only)."""
    e = load(spark, sf_dir, "events")
    pts = e.groupBy(
        "user_id", F.unix_micros("ts").alias("t")
    ).agg(F.min(F.round(F.col("value") * 1000).cast("long")).alias("v"))
    w = Window.partitionBy("user_id").orderBy("t")
    iv = pts.withColumn("tn", F.lead("t").over(w)).filter(
        F.col("tn").isNotNull()
    )
    return (
        iv.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum(F.col("tn") - F.col("t")).cast("long").alias("span_us"),
            F.sum(F.col("v") * (F.col("tn") - F.col("t"))).alias("wsum"),
        )
        .select(
            "user_id",
            "n_intervals",
            "span_us",
            F.call_function("div", F.col("wsum"), F.col("span_us")).alias(
                "twap_milli"
            ),
        )
    )


# ---------------------------------------------------------------------------
# OHLC bars — open/high/low/close per type-hour bucket
# ---------------------------------------------------------------------------
@query(
    "events_ohlc_bars",
    oracle="""
    WITH r AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket, value,
             row_number() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, bucket,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM r GROUP BY event_type, bucket
    """,
)
def events_ohlc_bars(spark, sf_dir):
    """OHLC candle bars per (event_type, hour): the first/last value
    by (ts, event_id) plus the extrema and event count — the standard
    downsampling summary for irregular telemetry/market series (the
    complement of ``events_resample``'s last-observation grid: bars
    keep intra-bucket extremes that resampling discards).

    Exactness: open/close are SELECTED values (row_number over the
    total (ts, event_id) order — deterministic under timestamp ties),
    high/low are min/max of raw doubles; no arithmetic touches any
    value, so both engines hash identical bits.

    Scale shape: one shuffle on the (type, hour) bucket key; both
    window passes and the final aggregate share that partitioning
    (Spark plans ONE Exchange — asc and desc orders are two sorts
    within the same partition, and buckets are bounded by
    |types| x |hours|, so no partition outgrows an executor).  At
    100 TB the bucket key is the natural layout partition too —
    the window never sees more than one bucket."""
    e = load(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    w = Window.partitionBy("event_type", "bucket")
    r = e.select(
        "event_type",
        bucket.alias("bucket"),
        "value",
        "ts",
        "event_id",
    ).select(
        "event_type",
        "bucket",
        "value",
        F.row_number()
        .over(w.orderBy("ts", "event_id"))
        .alias("rn_a"),
        F.row_number()
        .over(w.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn_d"),
    )
    return r.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Rolling median — exact order statistic over a trailing row frame
# ---------------------------------------------------------------------------
@query(
    "events_rolling_median",
    oracle="""
    WITH pts AS (
      SELECT event_id, user_id, epoch_us(ts) AS t,
             CAST(ROUND(value * 1000) AS BIGINT) AS v
      FROM events
    ),
    w AS (
      SELECT event_id, user_id, v,
             list(v) OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS win
      FROM pts
    )
    SELECT event_id, user_id,
           CAST(len(win) AS BIGINT) AS n_window,
           CAST(list_sort(win)[CAST((len(win) + 1) // 2 AS BIGINT)]
                AS BIGINT) AS med_milli
    FROM w
    """,
)
def events_rolling_median(spark, sf_dir):
    """Per-user rolling MEDIAN of the last 5 observations — the
    robust-smoothing twin of the rolling mean (``events_sliding_agg``):
    a median filter kills single-point spikes that drag any
    mean-family smoother, which is why it is the standard pre-step
    before thresholding noisy metrics.  Median here is the LOWER
    median (element ceil(n/2) of the sorted window) so every output
    is a SELECTED value — an exact integer milli-unit, never an
    average of two middles — making the result bit-identical across
    engines with no float arithmetic at all.

    Scale shape: one shuffle partitions by user; the trailing
    5-row frame is a bounded ``collect_list`` window (state = 5
    BIGINTs per row, sorted per-row JVM-side by ``sort_array``) —
    cost is O(rows * w log w) with w=5, no self-join, no explode.
    At 100 TB the window never crosses partitions (frames are
    per-user), so the plan is scan -> one Exchange on user ->
    one in-partition sort -> map.  A w-row frame is exactly the
    shape Structured Streaming's bounded per-key state would carry.

    Reference scope: net-new temporal capability (mhawila/beehive has
    no window analytics — SURVEY.md §2.4)."""
    e = load(spark, sf_dir, "events")
    pts = e.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.round(F.col("value") * 1000).cast("long").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(-4, 0)
    )
    r = pts.select(
        "event_id",
        "user_id",
        F.sort_array(F.collect_list("v").over(w)).alias("win"),
    )
    idx = ((F.size("win") + F.lit(1)) / F.lit(2)).cast("int")
    return r.select(
        "event_id",
        "user_id",
        F.size("win").cast("long").alias("n_window"),
        F.element_at("win", idx).cast("long").alias("med_milli"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection — exact integer one-sided drift monitor
# ---------------------------------------------------------------------------
@query(
    "events_cusum_changepoint",
    oracle="""
    WITH pts AS (
      SELECT user_id, epoch_us(ts) AS t,
             CAST(ROUND(value * 1000) AS BIGINT) AS v
      FROM events
    ),
    l AS (
      SELECT user_id, list(v ORDER BY t, v) AS vs,
             CAST(COUNT(*) AS BIGINT) AS n_points,
             CAST(SUM(v) AS BIGINT) AS sv
      FROM pts GROUP BY user_id
    ),
    m AS (SELECT user_id, vs, n_points, sv // n_points AS mean_m FROM l),
    f AS (
      -- list_reduce seeds with the FIRST element (no explicit init),
      -- so the transform emits the AFTER-FIRST-STEP state inline:
      -- slot 1 carries the raw value (the only slot later steps read
      -- from x), slots 2..6 carry [S, maxS, n_alarms, first_idx, idx]
      -- already advanced past element 1 — the events_holt seeding
      -- trick extended to a wider state
      SELECT user_id, n_points, mean_m,
             list_reduce(
               list_transform(vs, v -> [v,
                 greatest(CAST(0 AS BIGINT), v - mean_m - 25000),
                 greatest(CAST(0 AS BIGINT), v - mean_m - 25000),
                 CASE WHEN greatest(CAST(0 AS BIGINT), v - mean_m - 25000)
                           > 150000 THEN 1 ELSE 0 END,
                 CASE WHEN greatest(CAST(0 AS BIGINT), v - mean_m - 25000)
                           > 150000 THEN 1 ELSE 0 END,
                 CAST(1 AS BIGINT)]),
               (acc, x) -> [
                 x[1],
                 greatest(CAST(0 AS BIGINT),
                          acc[2] + x[1] - mean_m - 25000),
                 greatest(acc[3],
                          greatest(CAST(0 AS BIGINT),
                                   acc[2] + x[1] - mean_m - 25000)),
                 acc[4] + CASE WHEN greatest(CAST(0 AS BIGINT),
                                   acc[2] + x[1] - mean_m - 25000)
                                   > 150000 THEN 1 ELSE 0 END,
                 CASE WHEN acc[5] > 0 THEN acc[5]
                      WHEN greatest(CAST(0 AS BIGINT),
                            acc[2] + x[1] - mean_m - 25000) > 150000
                      THEN acc[6] + 1 ELSE 0 END,
                 acc[6] + 1
               ]) AS s
      FROM m
    )
    SELECT user_id, n_points,
           CAST(s[3] AS BIGINT) AS max_cusum_milli,
           CAST(s[4] AS BIGINT) AS n_alarms,
           CAST(s[5] AS BIGINT) AS first_alarm_idx
    FROM f
    """,
)
def events_cusum_changepoint(spark, sf_dir):
    """Per-user one-sided CUSUM drift detector (Page 1954) — the
    classic changepoint monitor: ``S_i = max(0, S_{i-1} + (v_i -
    mean - slack))`` accumulates only sustained upward deviation;
    an alarm fires whenever S crosses the decision threshold h.
    Slack = 25000 milli (~0.5 sigma of the events value
    distribution), h = 150000 milli (~3 sigma): single spikes drain
    back to zero, level shifts integrate and alarm.  The per-user
    reference level is the series' own truncated-mean
    (``sv div n``), so the monitor is self-calibrating per key.

    Exactness: values are integer milli-units, the reference mean is
    a truncating BIGINT ``div`` (bit-identical to the oracle's
    ``//`` per the engine-verified parity note in
    ``functions/__init__``), and the fold state is a 5-element
    BIGINT list ``[S, maxS, n_alarms, first_idx, idx]`` folded with
    the SAME per-step integer recurrence in both engines — the
    ``events_holt`` discipline, including its engine finding that
    DuckDB list_reduce needs a LIST (not struct) accumulator.

    Scale shape: identical to events_holt — the recurrence is
    sequential PER KEY, so the distributed shape is
    keys-in-parallel: one shuffle groups each user's series, one
    array_sort orders it (ties by value, deterministic), one JVM
    ``aggregate`` lambda folds it; memory bounds at the longest
    single series, and the (S, maxS, counts) tuple is exactly the
    bounded per-key state of a streaming monitor.

    Reference scope: net-new temporal capability (no counterpart in
    mhawila/beehive)."""
    e = load(spark, sf_dir, "events")
    pts = e.select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.round(F.col("value") * 1000).cast("long").alias("v"),
    )
    grouped = pts.groupBy("user_id").agg(
        F.collect_list(F.struct("t", "v")).alias("ps"),
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("v").cast("long").alias("sv"),
    )
    grouped = grouped.select(
        "user_id",
        "n_points",
        F.transform(F.array_sort("ps"), lambda s: s["v"]).alias("vs"),
        F.call_function("div", F.col("sv"), F.col("n_points")).alias("mean_m"),
    )
    zero = F.lit(0).cast("long")
    slack = F.lit(25000).cast("long")
    h = F.lit(150000).cast("long")

    def _step(acc, x):
        s_new = F.greatest(zero, F.element_at(acc, 1) + x - F.col("mean_m") - slack)
        idx_new = F.element_at(acc, 5) + F.lit(1).cast("long")
        return F.array(
            s_new,
            F.greatest(F.element_at(acc, 2), s_new),
            F.element_at(acc, 3)
            + F.when(s_new > h, F.lit(1).cast("long")).otherwise(zero),
            F.when(F.element_at(acc, 4) > 0, F.element_at(acc, 4))
            .when(s_new > h, idx_new)
            .otherwise(zero),
            idx_new,
        )

    fold = F.aggregate(
        F.col("vs"), F.array(zero, zero, zero, zero, zero), _step
    )
    return grouped.select(
        "user_id",
        "n_points",
        F.element_at(fold, 2).alias("max_cusum_milli"),
        F.element_at(fold, 3).alias("n_alarms"),
        F.element_at(fold, 4).alias("first_alarm_idx"),
    )


# ---------------------------------------------------------------------------
# ABC / Pareto classification — cumulative-share revenue classes
# ---------------------------------------------------------------------------
@query(
    "orders_pareto_abc",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM rev),
    cum AS (
      SELECT o_custkey, cents,
             SUM(cents) OVER (ORDER BY cents DESC, o_custkey) AS c,
             t
      FROM rev CROSS JOIN tot
    ),
    cls AS (
      SELECT CASE WHEN c * 100 <= t * 80 THEN 'A'
                  WHEN c * 100 <= t * 95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             cents
      FROM cum
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM cls GROUP BY abc_class
    """,
)
def orders_pareto_abc(spark, sf_dir):
    """ABC / Pareto inventory classification of customers by revenue:
    rank customers by total order value, take the running cumulative
    share, and bucket A (first 80% of revenue), B (to 95%), C (tail)
    — the standard concentration report behind "20% of customers
    drive 80% of revenue" decisions, and the classification twin of
    ``revenue_concentration``.

    Exactness: money is exact integer cents; the class boundaries
    compare ``cum * 100 <= total * K`` as pure BIGINT
    cross-multiplications — NO division, no floats, so the class of
    every customer (including the straddling boundary rows) is
    engine-independent by construction.  The running order is the
    discrete (cents DESC, custkey) key.

    Scale shape: the facts aggregate once (map-side combinable) down
    to the |customers| frame, and the global cumulative sum over it
    runs as the TWO-LEVEL Blelloch scan (the interval_concurrency
    pattern): customers bucket by a cents band (any monotone function
    of the sort key keeps buckets contiguous in the cents-desc
    order), running sums stay partition-local per bucket, and only
    the <= 257 bucket TOTALS cross a global window before
    broadcasting back as prefix offsets — no single partition ever
    holds the customer frame.  The grand total and the band ride
    1-row broadcasts.  Final output is 3 rows."""
    o = load(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    tot = rev.agg(
        F.sum("cents").cast("long").alias("t"),
        F.greatest(
            F.lit(1).cast("long"),
            F.call_function(
                "div", F.max("cents").cast("long"), F.lit(256).cast("long")
            ),
        ).alias("band"),
    )
    bucketed = rev.crossJoin(F.broadcast(tot)).withColumn(
        "bkt", F.call_function("div", F.col("cents"), F.col("band"))
    )
    w_local = (
        Window.partitionBy("bkt")
        .orderBy(F.col("cents").desc(), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bucketed.withColumn("lc", F.sum("cents").over(w_local))
    # prefix offsets: total cents of all STRICTLY HIGHER buckets —
    # a <= 257-row frame, the only thing that crosses a global window
    btot = bucketed.groupBy("bkt").agg(F.sum("cents").alias("bc"))
    w_b = Window.orderBy(F.col("bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = btot.select(
        "bkt", F.coalesce(F.sum("bc").over(w_b), F.lit(0)).alias("off")
    )
    cum = local.join(F.broadcast(offs), "bkt").withColumn(
        "c", F.col("lc") + F.col("off")
    )
    cls = cum.select(
        F.when(F.col("c") * 100 <= F.col("t") * 80, "A")
        .when(F.col("c") * 100 <= F.col("t") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "cents",
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# Exact quantiles by two-pass selection — no global sort, ever
# ---------------------------------------------------------------------------
@query(
    "lineitem_exact_quantiles",
    oracle="""
    WITH u AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
    ranks AS (
      SELECT 'p25' AS quantile, (n + 3) // 4 AS rank, n FROM n
      UNION ALL SELECT 'p50', (n + 1) // 2, n FROM n
      UNION ALL SELECT 'p75', (3 * n + 3) // 4, n FROM n
    ),
    ordered AS (
      SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM u
    )
    SELECT r.quantile, r.n AS n_rows, r.rank,
           o.cents AS value_cents
    FROM ranks r JOIN ordered o ON o.rn = r.rank
    """,
)
def lineitem_exact_quantiles(spark, sf_dir, n_buckets: int = 4096):
    """EXACT p25/p50/p75 of lineitem price by two-pass distributed
    selection — the classic answer to "exact quantiles without a
    global sort": pass 1 histograms the column into ``n_buckets``
    value bands (one map-side-combinable count), the driver walks the
    <= 4096-row prefix to locate each rank's band, and pass 2 counts
    raw values ONLY inside the <= 3 located bands (band width =
    range/4096 distinct values, bounded regardless of row count) and
    selects the exact order statistic from their prefix.  Rank k is
    the k-th smallest with ``k = ceil(q*n)`` (lower quantile — a
    SELECTED value, the events_rolling_median convention).

    The oracle sorts (ROW_NUMBER over the full column) — the honest
    from-first-principles definition; agreement proves the selection
    algebra.  At 100 TB the contrast IS the point: the oracle's shape
    costs a full range-partitioned sort of the fact table, this plan
    costs two combinable aggregations and moves 4096 + O(band)
    numbers to the driver — both passes independent of n beyond the
    scans.  (percentile/ntile approximations trade exactness for one
    pass; this trades one extra scan for exactness.)

    Driver state is bounded by construction: the histogram collect is
    <= n_buckets rows and the refinement collect <= 3 * band distinct
    values — both documented constants, never O(n)."""
    li = load(spark, sf_dir, "lineitem")
    u = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    lo_hi = u.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).first()
    lo, hi, n = lo_hi["lo"], lo_hi["hi"], lo_hi["n"]
    schema = "quantile string, n_rows long, rank long, value_cents long"
    if not n or lo is None:  # empty input: empty frame, like the other queries
        return spark.createDataFrame([], schema)
    band = max(1, (hi - lo) // n_buckets + 1)
    ranks = {
        "p25": (n + 3) // 4,
        "p50": (n + 1) // 2,
        "p75": (3 * n + 3) // 4,
    }
    hist = (
        u.groupBy(((F.col("cents") - lo) / band).cast("long").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    counts = {int(r["b"]): r["c"] for r in hist}
    targets = {}  # quantile -> (bucket, rank_within_prefix_before_bucket)
    for q, k in ranks.items():
        acc = 0
        for b in sorted(counts):
            if acc + counts[b] >= k:
                targets[q] = (b, k - acc)
                break
            acc += counts[b]
    need = sorted({b for b, _ in targets.values()})
    fine = (
        u.withColumn("b", ((F.col("cents") - lo) / band).cast("long"))
        .filter(F.col("b").isin(need))
        .groupBy("b", "cents")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_bucket: dict[int, list] = {}
    for r in fine:
        by_bucket.setdefault(int(r["b"]), []).append((r["cents"], r["c"]))
    rows = []
    for q, (b, within) in targets.items():
        acc = 0
        for v, c in sorted(by_bucket[b]):
            acc += c
            if acc >= within:
                rows.append((q, n, ranks[q], v))
                break
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


# ---------------------------------------------------------------------------
# Forecast backtesting — rolling one-step Holt MAE on a held-out suffix
# ---------------------------------------------------------------------------
@query(
    "events_holt_backtest",
    oracle="""
    WITH pts AS (
      SELECT user_id, epoch_us(ts) AS t,
             CAST(ROUND(value * 1000) AS BIGINT) AS v
      FROM events
    ),
    l AS (
      SELECT user_id, list(v ORDER BY t, v) AS vs,
             CAST(COUNT(*) AS BIGINT) AS n_points
      FROM pts GROUP BY user_id
    ),
    m AS (
      SELECT user_id, vs, n_points,
             greatest(CAST(1 AS BIGINT), (4 * n_points) // 5) AS n_train
      FROM l
    ),
    f AS (
      -- list_reduce seeds with the first element; the transform emits
      -- the after-first-step state [x, l, b, err, idx] (the
      -- events_cusum_changepoint seeding trick)
      SELECT user_id, n_points, n_train,
             list_reduce(
               list_transform(vs, v -> [v, v, CAST(0 AS BIGINT),
                                        CAST(0 AS BIGINT),
                                        CAST(1 AS BIGINT)]),
               (acc, x) -> [
                 x[1],
                 (3 * x[1] + 7 * (acc[2] + acc[3])) // 10,
                 (2 * ((3 * x[1] + 7 * (acc[2] + acc[3])) // 10 - acc[2])
                  + 8 * acc[3]) // 10,
                 acc[4] + CASE WHEN acc[5] + 1 > n_train
                               THEN abs(x[1] - (acc[2] + acc[3]))
                               ELSE 0 END,
                 acc[5] + 1
               ]) AS s
      FROM m
    )
    SELECT user_id, n_points,
           CAST(n_points - n_train AS BIGINT) AS n_test,
           CAST(s[4] // (n_points - n_train) AS BIGINT) AS mae_milli
    FROM f WHERE n_points > n_train
    """,
)
def events_holt_backtest(spark, sf_dir):
    """Walk-forward backtest of the Holt forecaster: the first 80% of
    each user's series trains the (level, trend) state, and every
    held-out point is scored by the ROLLING one-step-ahead forecast
    error ``|v - (l + b)|`` with the state updated after each test
    point — the standard time-series evaluation protocol (train
    window grows, never shuffles the future into the past).  Output
    is per-user test MAE in exact milli-units.

    This closes the forecasting loop: ``events_holt`` fits,
    ``holt_forecast_stream`` serves, this query EVALUATES — all three
    share the bit-identical integer recurrence, so a backtest MAE
    measured here is exactly the error the streaming forecaster would
    have produced on the same data.

    Exactness: the fold state is a BIGINT list [l, b, err_sum, idx]
    advanced by the events_holt recurrence; the error accumulates
    absolute integer differences only past the train cutoff
    (``greatest(1, (4n) div 5)``), and MAE is a final truncating
    division — every engine computes identical integers at every
    step.  The oracle seeds list_reduce with the after-first-step
    state (the CUSUM transform trick).

    Scale shape: identical to events_holt — one shuffle groups each
    user's series, one JVM fold; keys in parallel, memory bounded by
    the longest single series."""
    e = load(spark, sf_dir, "events")
    pts = e.select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.round(F.col("value") * 1000).cast("long").alias("v"),
    )
    grouped = pts.groupBy("user_id").agg(
        F.collect_list(F.struct("t", "v")).alias("ps"),
        F.count(F.lit(1)).cast("long").alias("n_points"),
    )
    grouped = grouped.select(
        "user_id",
        "n_points",
        F.transform(F.array_sort("ps"), lambda s: s["v"]).alias("vs"),
        F.greatest(
            F.lit(1).cast("long"),
            F.call_function(
                "div", F.lit(4).cast("long") * F.col("n_points"),
                F.lit(5).cast("long"),
            ),
        ).alias("n_train"),
    )
    zero = F.lit(0).cast("long")
    ten = F.lit(10).cast("long")

    def _step(acc, x):
        l, b = F.element_at(acc, 1), F.element_at(acc, 2)
        idx_new = F.element_at(acc, 4) + F.lit(1).cast("long")
        err_new = F.element_at(acc, 3) + F.when(
            idx_new > F.col("n_train"), F.abs(x - (l + b))
        ).otherwise(zero)
        nl = F.call_function(
            "div", F.lit(3).cast("long") * x + F.lit(7).cast("long") * (l + b), ten
        )
        nb = F.call_function(
            "div",
            F.lit(2).cast("long") * (nl - l) + F.lit(8).cast("long") * b,
            ten,
        )
        return F.array(nl, nb, err_new, idx_new)

    fold = F.aggregate(
        F.slice(F.col("vs"), 2, F.size("vs") - 1),
        F.array(
            F.element_at(F.col("vs"), 1), zero, zero, F.lit(1).cast("long")
        ),
        _step,
    )
    n_test = F.col("n_points") - F.col("n_train")
    # filter BEFORE the dividing projection: under ANSI mode a
    # single-point series (n_test = 0) must never reach div()
    return grouped.filter(n_test > 0).select(
        "user_id",
        "n_points",
        n_test.alias("n_test"),
        F.call_function("div", F.element_at(fold, 3), n_test).alias("mae_milli"),
    )


# ---------------------------------------------------------------------------
# Windowed funnel — greedy earliest chain with a per-step deadline
# ---------------------------------------------------------------------------
@query(
    "events_funnel_windowed",
    oracle="""
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN t1 USING (user_id)
      WHERE e.event_type = 'click'
        AND e.ts > t1.t_view AND e.ts <= t1.t_view + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN t2 USING (user_id)
      WHERE e.event_type = 'purchase'
        AND e.ts > t2.t_click AND e.ts <= t2.t_click + INTERVAL 24 HOUR
      GROUP BY e.user_id
    )
    SELECT t1.user_id,
           CAST(1 + (t2.user_id IS NOT NULL)::INT
                  + (t3.user_id IS NOT NULL)::INT AS BIGINT)
             AS steps_completed,
           t1.t_view, t2.t_click, t3.t_purchase
    FROM t1
    LEFT JOIN t2 ON t1.user_id = t2.user_id
    LEFT JOIN t3 ON t2.user_id = t3.user_id
    """,
)
def events_funnel_windowed(spark, sf_dir):
    """Windowed funnel (view -> click -> purchase, each step within
    24 h of the previous): the greedy earliest-chain semantics of
    ClickHouse's ``windowFunnel`` — step k's timestamp is the EARLIEST
    qualifying event after step k-1's, and the deadline restarts at
    each completed step.  Greedy-earliest is the documented industry
    semantics (not maximal reachability: a user whose only converting
    chain starts at a LATER view counts as stalled — deterministic and
    cheap, which is why the engines that popularized funnels chose
    it).  Complements ``funnel_steps``, which sequences strictly but
    never expires.

    Exactness: pure MIN over microsecond timestamps with interval
    arithmetic — no doubles anywhere.

    Scale shape: three cascaded user-keyed conditional aggregates,
    each a combinable MIN joined back by user key — the same single
    partitioning reused, no windows over the raw stream, no per-user
    arrays."""
    e = load(spark, sf_dir, "events")
    day = F.expr("INTERVAL 24 HOURS")
    t1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    t2 = (
        e.join(t1, "user_id")
        .filter(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + day)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    t3 = (
        e.join(t2, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + day)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).cast("long").alias("steps_completed"),
            "t_view",
            "t_click",
            "t_purchase",
        )
    )


# ---------------------------------------------------------------------------
# Sequential pattern mining — existential subsequence support (SPADE-style)
# ---------------------------------------------------------------------------
def _seq_prefix_frames(e):
    """The two greedy-prefix frames of :func:`sequence_mining_triples`
    — ``a1`` (|users| x |types| earliest-occurrence rows) and ``ab``
    (|users| x |types|^2) — exposed so the STRESS attribution can
    COUNT the same frames the query joins (never a local
    re-implementation that could drift; the record_linkage candidate
    discipline)."""
    a1 = e.groupBy("user_id", F.col("event_type").alias("a")).agg(
        F.min("ts").alias("ta")
    )
    ab = (
        a1.join(e, "user_id")
        .filter(F.col("ts") > F.col("ta"))
        .groupBy("user_id", "a", F.col("event_type").alias("b"))
        .agg(F.min("ts").alias("tb"))
    )
    return a1, ab


@query(
    "sequence_mining_triples",
    oracle="""
    WITH a1 AS (
      SELECT user_id, event_type AS a, MIN(ts) AS ta
      FROM events GROUP BY 1, 2
    ),
    ab AS (
      SELECT f.user_id, f.a, e.event_type AS b, MIN(e.ts) AS tb
      FROM a1 f JOIN events e
        ON e.user_id = f.user_id AND e.ts > f.ta
      GROUP BY 1, 2, 3
    ),
    abc AS (
      SELECT DISTINCT p.user_id, p.a, p.b, e.event_type AS c
      FROM ab p JOIN events e
        ON e.user_id = p.user_id AND e.ts > p.tb
    )
    SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS support
    FROM abc GROUP BY a, b, c
    """,
)
def sequence_mining_triples(spark, sf_dir):
    """Sequential pattern mining, length-3 existential support: pattern
    ``a -> b -> c`` is supported by a user iff some events of those
    types occur in that order (NOT necessarily adjacent — the
    subsequence semantics of SPADE/PrefixSpan, which the adjacency
    views ``event_transitions`` / ``event_trigram_lm`` cannot express;
    a user whose sequence is view, error, click, error, purchase
    supports view -> click -> purchase).  Support counts users, the
    sequence-mining convention.

    Correctness by the greedy-prefix lemma: a subsequence embedding
    exists iff the greedy one does (taking the EARLIEST occurrence of
    each prefix step never forecloses a later step), so two cascaded
    per-(user, prefix) MINs and one existence join decide all
    |types|^3 patterns exactly — no per-user sequence scan.

    Scale shape: the prefix frames are |users| x |types| and
    |users| x |types|^2 slim rows; each extension is one equi-join
    back to the events table on the user key followed by a combinable
    MIN/DISTINCT — three reuses of the same user-keyed partitioning.
    The type vocabulary bounds the fan-out (restrict to the top-K
    types first when mining a wide vocabulary, exactly as SPADE
    prunes by 1-pattern support)."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    a1, ab = _seq_prefix_frames(e)
    abc = (
        ab.join(e, "user_id")
        .filter(F.col("ts") > F.col("tb"))
        .select("user_id", "a", "b", F.col("event_type").alias("c"))
        .distinct()
    )
    return abc.groupBy("a", "b", "c").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )


# ---------------------------------------------------------------------------
# A/B experiment analysis — two-proportion z-test on exact counts
# ---------------------------------------------------------------------------
# conversion = purchase-event count at or above the corpus median; ONE
# constant rendered into both the oracle f-string and the Spark
# expression (the _MIX_ALPHA/_RRF_K_LIST discipline — r9 advisory:
# the literal was duplicated on both sides, the drift class f32bf06
# fixed elsewhere; tests/test_oracle_constants.py sweeps for new
# instances of the class)
_AB_CONV_MIN = 14


@query(
    "ab_test_conversion",
    oracle=f"""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) >= {_AB_CONV_MIN}
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    v AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converted
      FROM u GROUP BY variant
    ),
    w AS (
      SELECT
        MAX(CASE WHEN variant = 0 THEN n_users END) AS n_a,
        MAX(CASE WHEN variant = 0 THEN n_converted END) AS c_a,
        MAX(CASE WHEN variant = 1 THEN n_users END) AS n_b,
        MAX(CASE WHEN variant = 1 THEN n_converted END) AS c_b
      FROM v
    )
    SELECT n_a, c_a, n_b, c_b,
           CAST((1000000 * c_a) // n_a AS BIGINT) AS rate_a_ppm,
           CAST((1000000 * c_b) // n_b AS BIGINT) AS rate_b_ppm,
           CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN NULL
                ELSE CAST(ROUND(
             (CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
             / SQRT(
                 (CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                 * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 / n_a + 1.0 / n_b)
               ) * 1000) AS BIGINT) END AS z_milli
    FROM w
    """,
)
def ab_test_conversion(spark, sf_dir):
    """A/B experiment readout with a pooled two-proportion z-test —
    the statistical-inference leg the analytics suite lacked: users
    split into variants by ``user_id % 2`` (the deterministic stand-in
    for an assignment column), conversion = a purchase-event count at
    or above the corpus-median ``_AB_CONV_MIN`` (a flat has-any-
    purchase flag converts every synthetic user — zero variance, no
    test), and the one-row report carries exact per-variant counts,
    ppm conversion rates, and the pooled z statistic
    ``(p_b - p_a) / sqrt(p(1-p)(1/n_a + 1/n_b))`` in milli-units —
    the number an experimentation platform thresholds at ±1.96.

    Exactness: counts and ppm rates are exact integers; the z
    statistic is the identical double expression on those integers in
    both engines, micro... milli-rounded before hashing (the
    feature_woe_iv discipline).

    Scale shape: one user-keyed conditional MAX (map-side
    combinable), a 2-row variant aggregate, and a 1-row pivot — the
    fact table is touched once; at 100 TB the entire readout after
    the first aggregate moves four longs."""
    e = load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ) >= _AB_CONV_MIN,
            1,
        ).otherwise(0).alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("long").alias("variant"), "converted"
    )
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c_b"),
    )
    mil = F.lit(1_000_000).cast("long")
    p_pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (
        F.col("c_b").cast("double") / F.col("n_b")
        - F.col("c_a").cast("double") / F.col("n_a")
    ) / F.sqrt(
        p_pool * (1 - p_pool)
        * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    degenerate = (F.col("c_a") + F.col("c_b") == 0) | (
        F.col("c_a") + F.col("c_b") == F.col("n_a") + F.col("n_b")
    )
    return w.select(
        "n_a", "c_a", "n_b", "c_b",
        F.call_function("div", mil * F.col("c_a"), F.col("n_a")).alias(
            "rate_a_ppm"
        ),
        F.call_function("div", mil * F.col("c_b"), F.col("n_b")).alias(
            "rate_b_ppm"
        ),
        # all-convert / none-convert corpora have no sampling variance:
        # z is undefined, not infinite (and ANSI must never see the 0)
        F.when(~degenerate, F.round(z * 1000).cast("long")).alias("z_milli"),
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution — linear credit over preceding touches
# ---------------------------------------------------------------------------
@query(
    "attribution_linear_multitouch",
    oracle="""
    WITH pre AS (
      SELECT user_id, event_type, value,
             COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS k_click,
             COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS k_view
      FROM events
    ),
    p AS (
      SELECT k_click, k_view, k_click + k_view AS k,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM pre WHERE event_type = 'purchase'
    ),
    a AS (
      SELECT
        SUM(CASE WHEN k > 0 THEN CAST(k_click AS DOUBLE) / k
                 ELSE 0 END) AS conv_click,
        SUM(CASE WHEN k > 0 THEN CAST(k_view AS DOUBLE) / k
                 ELSE 0 END) AS conv_view,
        CAST(SUM(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS conv_none,
        SUM(CASE WHEN k > 0 THEN CAST(k_click AS DOUBLE) / k * cents
                 ELSE 0 END) AS rev_click,
        SUM(CASE WHEN k > 0 THEN CAST(k_view AS DOUBLE) / k * cents
                 ELSE 0 END) AS rev_view,
        CAST(SUM(CASE WHEN k = 0 THEN cents ELSE 0 END) AS BIGINT) AS rev_none
      FROM p
    )
    SELECT 'click' AS channel,
           CAST(ROUND(conv_click * 1000000) AS BIGINT) AS conv_credit_micro,
           CAST(ROUND(rev_click) AS BIGINT) AS rev_credit_cents FROM a
    UNION ALL
    SELECT 'view', CAST(ROUND(conv_view * 1000000) AS BIGINT),
           CAST(ROUND(rev_view) AS BIGINT) FROM a
    UNION ALL
    SELECT 'none', conv_none * 1000000, rev_none FROM a
    """,
)
def attribution_linear_multitouch(spark, sf_dir):
    """Linear multi-touch attribution: every purchase splits one unit
    of conversion credit (and its revenue) EQUALLY across all of the
    user's preceding click/view touches — the fractional-credit
    counterpart to :func:`session_attribution`'s winner-takes-all
    last-touch model, and with it the two canonical attribution
    models a marketing warehouse ships.  Purchases with no prior
    touch credit the 'none' channel in full.

    No purchase-x-touch pair join: per purchase the only facts needed
    are the RUNNING per-channel touch counts at that point (two
    conditional window sums over the user's (ts, event_id) order), so
    the whole model is one user-partitioned window pass plus a global
    combinable aggregate — the same single-shuffle shape as the
    last-touch query, and the reason this scales to 100 TB while the
    naive "join each conversion to its path" explodes on power users.

    Exactness: 'none' rows are pure integers; fractional credits are
    the identical double expression both sides, summed then rounded
    (micro for conversions, whole cents for revenue — magnitudes keep
    fp error orders below the rounding grain)."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    def pre_count(et):
        return F.coalesce(
            F.sum(
                F.when(F.col("event_type") == et, 1).otherwise(0)
            ).over(w),
            F.lit(0),
        )

    p = (
        e.select(
            "event_type",
            "value",
            pre_count("click").alias("k_click"),
            pre_count("view").alias("k_view"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "k_click",
            "k_view",
            (F.col("k_click") + F.col("k_view")).alias("k"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    frac = lambda c: F.when(  # noqa: E731
        F.col("k") > 0, F.col(c).cast("double") / F.col("k")
    ).otherwise(F.lit(0.0))
    a = p.agg(
        F.sum(frac("k_click")).alias("conv_click"),
        F.sum(frac("k_view")).alias("conv_view"),
        F.sum(F.when(F.col("k") == 0, 1).otherwise(0))
        .cast("long")
        .alias("conv_none"),
        F.sum(frac("k_click") * F.col("cents")).alias("rev_click"),
        F.sum(frac("k_view") * F.col("cents")).alias("rev_view"),
        F.sum(F.when(F.col("k") == 0, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("rev_none"),
    )
    # pivot the 1-row aggregate to 3 channel rows with stack, NOT a
    # 3-way union of selects — a union re-executes the whole
    # window+agg pipeline once per branch (6 exchanges vs 2; caught
    # by test_plan_regressions.py::test_r10_analytics_plans)
    return a.select(
        F.round(F.col("conv_click") * 1_000_000).cast("long").alias("cc"),
        F.round(F.col("rev_click")).cast("long").alias("rc"),
        F.round(F.col("conv_view") * 1_000_000).cast("long").alias("cv"),
        F.round(F.col("rev_view")).cast("long").alias("rv"),
        (F.col("conv_none") * 1_000_000).alias("cn"),
        F.col("rev_none").alias("rn"),
    ).select(
        F.expr(
            "stack(3, 'click', cc, rc, 'view', cv, rv, 'none', cn, rn)"
            " AS (channel, conv_credit_micro, rev_credit_cents)"
        )
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction — covariate-adjusted experiment readout
# ---------------------------------------------------------------------------
@query(
    "conversion_cuped",
    oracle="""
    WITH cut AS (
      SELECT MIN(epoch_us(ts))
             + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 2 AS mid
      FROM events
    ),
    u AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                            AND epoch_us(ts) <= cut.mid
                           THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                            AND epoch_us(ts) > cut.mid
                           THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events, cut GROUP BY user_id, cut.mid
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM u
    ),
    th AS (
      SELECT n, sx,
             CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                  ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                       / (n * sxx - sx * sx) END AS theta
      FROM g
    )
    SELECT variant,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(x) AS BIGINT) AS sum_x,
           CAST(SUM(y) AS BIGINT) AS sum_y,
           CAST(ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*) * 1000)
                AS BIGINT) AS mean_y_milli,
           CAST(ROUND(
             (CAST(SUM(y) AS DOUBLE) / COUNT(*)
              - th.theta * (CAST(SUM(x) AS DOUBLE) / COUNT(*)
                            - CAST(th.sx AS DOUBLE) / th.n)) * 1000)
                AS BIGINT) AS mean_y_cuped_milli,
           CAST(ROUND(th.theta * 1000000) AS BIGINT) AS theta_micro
    FROM u, th GROUP BY variant, th.theta, th.sx, th.n
    """,
)
def conversion_cuped(spark, sf_dir):
    """CUPED covariate adjustment for the A/B readout (Deng, Xu,
    Kohavi & Walker, WSDM'13) — the variance-reduction step every
    experimentation platform applies before the z-test: the
    experiment-period metric ``y`` (per-user purchase count in the
    second half of the time range) is adjusted by the PRE-period
    covariate ``x`` (purchase count in the first half),
    ``y_adj = y - theta (x - mean x)`` with
    ``theta = cov(x, y) / var(x)`` pooled across variants.  Because
    randomization makes x independent of assignment, the adjusted
    per-variant means are unbiased for the same lift while the
    correlated component of the variance is removed.

    Exactness: theta and both means derive ENTIRELY from integer
    sums (n, sum x, sum y, sum x^2, sum xy) — the one double division
    is the identical expression both sides, so milli/micro rounding
    is deterministic, no summation-order exposure at all.

    Scale shape: one 1-row MIN/MAX broadcast for the period cut, one
    user-keyed combinable aggregate, a 1-row moment frame broadcast
    back — the fact table is scanned once; at 100 TB the readout
    after the first aggregate moves five longs."""
    e = load(spark, sf_dir, "events")
    cut = e.agg(
        (
            F.min(F.unix_micros("ts"))
            + F.floor(
                (
                    F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))
                ) / 2
            )
        ).alias("mid")
    )
    us = F.unix_micros("ts")
    is_p = F.col("event_type") == "purchase"
    u = (
        e.crossJoin(F.broadcast(cut))
        .groupBy("user_id", "mid")
        .agg(
            F.sum(F.when(is_p & (us <= F.col("mid")), 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(is_p & (us > F.col("mid")), 1).otherwise(0))
            .cast("long")
            .alias("y"),
        )
        .select(
            (F.col("user_id") % 2).cast("long").alias("variant"), "x", "y"
        )
    )
    g = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    th = g.select(
        "n",
        "sx",
        F.when(denom == 0, F.lit(0.0))
        .otherwise(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / denom
        )
        .alias("theta"),
    )
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum("y").cast("long").alias("sum_y"),
    )
    mean_y = F.col("sum_y").cast("double") / F.col("n_users")
    mean_x = F.col("sum_x").cast("double") / F.col("n_users")
    grand_x = F.col("sx").cast("double") / F.col("n")
    return v.crossJoin(F.broadcast(th)).select(
        "variant",
        "n_users",
        "sum_x",
        "sum_y",
        F.round(mean_y * 1000).cast("long").alias("mean_y_milli"),
        F.round(
            (mean_y - F.col("theta") * (mean_x - grand_x)) * 1000
        )
        .cast("long")
        .alias("mean_y_cuped_milli"),
        F.round(F.col("theta") * 1_000_000).cast("long").alias("theta_micro"),
    )


# ---------------------------------------------------------------------------
# Path analysis — top early-journey signatures
# ---------------------------------------------------------------------------
_PATH_LEN = 5
_PATH_TOP = 20


@query(
    "user_path_signatures",
    oracle=f"""
    WITH r AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    p AS (
      SELECT user_id,
             STRING_AGG(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= {_PATH_LEN} GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM p GROUP BY path
    ORDER BY n_users DESC, path LIMIT {_PATH_TOP}
    """,
)
def user_path_signatures(spark, sf_dir):
    """Top early-journey path signatures: each user's first
    ``_PATH_LEN`` events (by event time) concatenated into an ordered
    type path, then the ``_PATH_TOP`` most common signatures — the
    "what do new users actually do first" table product analytics
    builds Sankeys from, and the categorical companion to
    ``sequence_mining_triples``'s existential patterns (this is
    literal-prefix frequency; that is order-embedding support).

    Exactness: the path string is assembled in the total
    (ts, event_id) order on both sides, counts are integers, and the
    head order key (n_users DESC, path) is fully discrete.

    Scale shape: one user-window pass marks the first K events, one
    user-keyed ordered aggregation builds K-bounded strings, one
    combinable count per signature, TakeOrdered head — the signature
    domain is |types|^K at worst but concentration makes the count
    frame tiny in practice; nothing joins."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first_k = (
        e.select(
            "user_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= _PATH_LEN)
    )
    paths = first_k.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(_PATH_TOP)
    )


# ---------------------------------------------------------------------------
# Data-quality audit — Benford first-digit conformance of order totals
# ---------------------------------------------------------------------------
@query(
    "orders_benford_audit",
    oracle="""
    WITH v AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_totalprice > 0
    ),
    d AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM v GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM d)
    SELECT digit, n,
           CAST(ROUND(CAST(n AS DOUBLE) / total * 1000000) AS BIGINT)
             AS observed_micro,
           CAST(ROUND(log10(1.0 + 1.0 / digit) * 1000000) AS BIGINT)
             AS expected_micro,
           CAST(ROUND(
             (CAST(n AS DOUBLE) - total * log10(1.0 + 1.0 / digit))
             * (CAST(n AS DOUBLE) - total * log10(1.0 + 1.0 / digit))
             / (total * log10(1.0 + 1.0 / digit)) * 1000000
           ) AS BIGINT) AS chi2_micro
    FROM d CROSS JOIN t
    """,
)
def orders_benford_audit(spark, sf_dir):
    """Benford's-law first-significant-digit audit of order totals
    (Benford 1938; Nigrini's forensic-accounting screen): per digit
    1-9, the observed share vs the Benford expectation
    ``log10(1 + 1/d)`` and the chi-square contribution — the standard
    fabricated-data / truncation-artifact detector a warehouse runs
    over money columns.  (TPC-H totals are sums of uniform prices, so
    they deviate from Benford — the AUDIT is the operator; the verdict
    is the user's.)

    Exactness: the first digit comes from the integer-cents DECIMAL
    STRING (never float log10 of the value — a boundary ULP could
    flip 999999 vs 1000000's digit); counts are exact BIGINTs; the
    share/expectation/chi-square doubles are identical expressions on
    identical integers both sides, micro-rounded.

    Scale shape: one scan with the digit computed in-row, a 9-group
    combinable aggregate, and a 1-row broadcast total — the flattest
    plan in the audit family; at 100 TB it is scan-bound and the
    shuffle moves 9 rows."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    v = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    d = (
        v.select(
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    t = d.agg(F.sum("n").cast("long").alias("total"))
    nd = F.col("n").cast("double")
    exp_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    dev = nd - F.col("total") * exp_p
    return d.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.round(nd / F.col("total") * 1_000_000)
        .cast("long")
        .alias("observed_micro"),
        F.round(exp_p * 1_000_000).cast("long").alias("expected_micro"),
        F.round(dev * dev / (F.col("total") * exp_p) * 1_000_000)
        .cast("long")
        .alias("chi2_micro"),
    )


# ---------------------------------------------------------------------------
# Behavioral profile — per-user event-type Shannon entropy
# ---------------------------------------------------------------------------
@query(
    "events_user_entropy",
    oracle="""
    WITH ct AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT user_id, c,
             SUM(c) OVER (PARTITION BY user_id) AS n
      FROM ct
    )
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CAST(ROUND(
             -(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)
             * 1000000) AS BIGINT)) AS BIGINT) AS entropy_micro
    FROM w GROUP BY user_id
    """,
)
def events_user_entropy(spark, sf_dir):
    """Per-user Shannon entropy of the event-type distribution in
    micro-nats — the behavioral-diversity feature (bot screens flag
    near-zero entropy; exploratory users score near ln(k)) computed
    with the repo's exact-grid discipline: each type's contribution
    ``-(c/n) * ln(c/n)`` is evaluated on exact integer (c, n) by the
    identical double expression in both engines and MICRO-ROUNDED
    BEFORE the per-user sum (the BM25/perplexity pattern — a <=1-ulp
    ln() divergence dies at the grid instead of flaking the hash).

    Scale shape: one (user, type) combinable count, a window
    partitioned by the HIGH-CARDINALITY user key over the already
    aggregated frame (|users|*|types| rows, never raw events — the
    window_rank_suite precedent), then a user-keyed sum that reuses
    the same partitioning.  Per-user state is |event types|, bounded
    by the domain."""
    ev = load(spark, sf_dir, "events")
    ct = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = F.sum("c").over(Window.partitionBy("user_id"))
    w = ct.select("user_id", "c", n.alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    contrib = F.round(-p * F.log(p) * 1_000_000).cast("long")
    return w.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(contrib).cast("long").alias("entropy_micro"),
    )


# ---------------------------------------------------------------------------
# Concentration audit — supplier revenue Gini coefficient
# ---------------------------------------------------------------------------
@query(
    "supplier_gini",
    oracle="""
    WITH r AS (
      SELECT l_suppkey AS sk,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ),
    o AS (
      SELECT sk, cents,
             ROW_NUMBER() OVER (ORDER BY cents, sk) AS i,
             COUNT(*) OVER () AS n
      FROM r
    ),
    a AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s0,
             CAST(SUM(i * cents) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN i > n - (n + 9) // 10
                           THEN cents ELSE 0 END) AS BIGINT) AS top_cents
      FROM o
    )
    SELECT n AS n_suppliers, s0 AS total_cents,
           CAST(ROUND((2.0 * CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * s0)
                       - (CAST(n AS DOUBLE) + 1.0) / n) * 1000000)
                AS BIGINT) AS gini_micro,
           CAST(ROUND(CAST(top_cents AS DOUBLE) / s0 * 1000000)
                AS BIGINT) AS top_decile_share_micro
    FROM a
    """,
)
def supplier_gini(spark, sf_dir):
    """Gini coefficient of revenue concentration across suppliers via
    the rank formula ``G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n`` over
    ascending-sorted per-supplier revenue, plus the top-decile revenue
    share — the one-number supply-chain concentration diagnostic next
    to :func:`orders_pareto_abc`'s class table.

    Exactness: revenue rounds to integer cents PER ROW before the
    BIGINT supplier sum (both engines, same expression); the rank
    weights are exact; the closing Gini/share doubles are identical
    expressions on identical integers, micro-rounded.

    Scale shape: the fact table collapses to |suppliers| rows with one
    combinable agg; the rank window then sorts the AGGREGATE frame in
    a single partition — the orders_pareto_abc precedent: bounded by
    the supplier dimension, never by fact rows (at 100 TB |suppliers|
    is millions of slim rows at worst; if that ever dominates, the
    two-level banded count of pareto_abc is the drop-in fix)."""
    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_suppkey").alias("sk")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        )
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("cents", "sk")
    o = rev.select(
        "cents",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    a = o.agg(
        F.max("n").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s0"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("s1"),
        F.sum(
            F.when(
                F.col("i") > F.col("n") - F.expr("(n + 9) DIV 10"),
                F.col("cents"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("top_cents"),
    )
    nd = F.col("n").cast("double")
    gini = (
        F.lit(2.0) * F.col("s1").cast("double") / (nd * F.col("s0"))
        - (nd + F.lit(1.0)) / F.col("n")
    )
    return a.select(
        F.col("n").alias("n_suppliers"),
        F.col("s0").alias("total_cents"),
        F.round(gini * 1_000_000).cast("long").alias("gini_micro"),
        F.round(
            F.col("top_cents").cast("double") / F.col("s0") * 1_000_000
        )
        .cast("long")
        .alias("top_decile_share_micro"),
    )


# ---------------------------------------------------------------------------
# Uncertainty at scale — single-pass Poisson bootstrap CI for the mean
# ---------------------------------------------------------------------------
# Poisson(1) CDF thresholds for the inverse-CDF draw (exp(-1) *
# cumsum(1/k!), k = 0..7; u past the last threshold maps to 8 — the
# residual mass there is 1e-5, and the clip biases a replicate weight
# by < 1e-4 events per million rows).  Module constants so the
# oracle-constant drift sweep sees ONE definition rendered into both
# engines' CASE chains.
_POIS1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
)
_BOOT_B = 64  # bootstrap replicates
_BOOT_LO_I = 2  # ceil(0.025 * B): 2.5th-percentile order statistic
_BOOT_HI_I = 63  # ceil(0.975 * B): 97.5th-percentile order statistic

_POIS1_SQL_CASE = "\n".join(
    f"               WHEN u < {t!r} THEN {k}" for k, t in enumerate(_POIS1_CDF)
)


@query(
    "poisson_bootstrap_ci",
    oracle=f"""
    WITH rep AS (SELECT r FROM range({_BOOT_B}) t(r)),
    base AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS k,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    wts AS (
      SELECT r, cents,
             CASE
{_POIS1_SQL_CASE}
               ELSE 8 END AS w
      FROM (
        SELECT rep.r, base.cents,
               ('0x' || substr(md5(base.k || ':' || CAST(rep.r AS VARCHAR)),
                               1, 8))::UBIGINT / 4294967296.0 AS u
        FROM base CROSS JOIN rep
      )
    ),
    reps AS (
      SELECT r,
             CAST(SUM(w * cents) AS BIGINT) AS s1,
             CAST(SUM(w) AS BIGINT) AS s0,
             CAST(SUM(cents) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM wts GROUP BY r
    ),
    m AS (
      SELECT tot, n,
             CAST(ROUND(CAST(s1 AS DOUBLE) / s0 * 1000000) AS BIGINT)
               AS rep_mean_micro,
             ROW_NUMBER() OVER (
               ORDER BY CAST(ROUND(CAST(s1 AS DOUBLE) / s0 * 1000000)
                             AS BIGINT), r) AS i
      FROM reps
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST({_BOOT_B} AS BIGINT) AS n_boot,
           CAST(ROUND(CAST(MAX(tot) AS DOUBLE) / MAX(n) * 1000000)
                AS BIGINT) AS mean_micro,
           CAST(MAX(CASE WHEN i = {_BOOT_LO_I} THEN rep_mean_micro END)
                AS BIGINT) AS ci_lo_micro,
           CAST(MAX(CASE WHEN i = {_BOOT_HI_I} THEN rep_mean_micro END)
                AS BIGINT) AS ci_hi_micro
    FROM m
    """,
)
def poisson_bootstrap_ci(spark, sf_dir):
    """95% bootstrap CI for the mean order total in micro-cents via the
    SINGLE-PASS Poisson bootstrap (Chamandy, Muralidharan, Najmi &
    Naidu 2012, "Estimating Uncertainty for Massive Data Streams"):
    instead of resampling n rows with replacement B times (B extra
    shuffles of the fact table), each row independently contributes
    Poisson(1) copies to each of the ``_BOOT_B`` replicates — the
    multinomial resample's limit as n grows, and the only bootstrap
    whose replicate statistics are COMBINABLE aggregates.

    Determinism: the Poisson draw is inverse-CDF over a md5-derived
    uniform on the 2^-32 grid (the stratified_sample idiom), with the
    ``_POIS1_CDF`` thresholds rendered from one module constant into
    both engines' CASE chains.  Replicate means are micro-rounded
    BEFORE the order-statistic selection (the exact-grid discipline),
    and the 2.5/97.5 empirical percentiles are ceiling-rank order
    statistics (i = ceil(q*B)) with (mean, r) tie-break.

    Scale shape: ONE fact scan, a slim-row repartition so the fan-out
    stage's parallelism is the cluster's (not the scan's file count),
    then the B-fold explode fused by whole-stage codegen with the
    partial hash aggregate (Generate -> HashAggregate in one stage),
    so each task emits <= B rows into the replicate exchange
    regardless of input size — never B*n.  The uniform draw is
    materialized in its own projection so the 8-arm CASE chain never
    re-evaluates the md5.  The unweighted total/count ride the same
    aggregate (each row appears exactly once per replicate), so the
    point estimate costs no second scan.  The final order-statistic
    pass sorts B = 64 rows."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # spread the SLIM base before the B-fold fan-out: the replicate
    # stage does B md5s per input row, so its parallelism must come
    # from the cluster, not from however many files the scan happened
    # to split into (a single-file 1x input otherwise runs the whole
    # 64x stage in one task); the exchange moves ~24 bytes/row, noise
    # next to the work it unlocks.  The partition count MUST be
    # explicit: a bare repartition(col) exchange is AQE-coalesced by
    # MAP-OUTPUT BYTES, and the base here is ~25 bytes/row — tiny —
    # while the downstream cost is B md5s per row; AQE folded it to
    # ONE partition and serialized the whole fan-out stage on one
    # core (measured 7.6 s -> 0.9 s at sf0.1 with the pin).  The
    # session's shuffle-partition conf is the scale knob (cluster
    # deployments size it to 2-3x total cores), so the spread stays
    # conf-driven, not a local constant.
    o = o.repartition(
        int(o.sparkSession.conf.get("spark.sql.shuffle.partitions")),
        F.col("k"),
    )
    r = o.select(
        "k",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("r"),
    )
    # materialize u ONCE per (row, replicate): inlining it into the
    # 8-arm CASE chain re-evaluates conv(md5(..)) per arm wherever
    # codegen's subexpression elimination doesn't reach (the _tokens
    # per-element lambda lesson, measured ~2x here)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("k"), F.lit(":"), F.col("r").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    ru = r.select("r", "cents", u.alias("u"))
    w = F.lit(8)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(F.col("u") < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(w)
    reps = (
        ru.select(F.col("r"), F.col("cents"), w.alias("w"))
        .groupBy("r")
        .agg(
            F.sum(F.col("w").cast("long") * F.col("cents"))
            .cast("long")
            .alias("s1"),
            F.sum("w").cast("long").alias("s0"),
            F.sum("cents").cast("long").alias("tot"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    rep_mean = (
        F.round(F.col("s1").cast("double") / F.col("s0") * 1_000_000)
        .cast("long")
        .alias("rep_mean_micro")
    )
    m = reps.select(
        "tot",
        "n",
        rep_mean,
        F.row_number()
        .over(
            Window.orderBy(
                F.round(F.col("s1").cast("double") / F.col("s0") * 1_000_000)
                .cast("long"),
                F.col("r"),
            )
        )
        .alias("i"),
    )
    return m.agg(
        F.max("n").cast("long").alias("n_orders"),
        F.lit(_BOOT_B).cast("long").alias("n_boot"),
        F.round(F.max("tot").cast("double") / F.max("n") * 1_000_000)
        .cast("long")
        .alias("mean_micro"),
        F.max(F.when(F.col("i") == _BOOT_LO_I, F.col("rep_mean_micro")))
        .cast("long")
        .alias("ci_lo_micro"),
        F.max(F.when(F.col("i") == _BOOT_HI_I, F.col("rep_mean_micro")))
        .cast("long")
        .alias("ci_hi_micro"),
    )


# ---------------------------------------------------------------------------
# Mergeable frequency sketch — Count-Min estimate audit on heavy keys
# ---------------------------------------------------------------------------
_CM_D = 4  # sketch depth (independent hash rows)
_CM_W = 256  # sketch width (buckets per row)
_CM_TOPK = 10  # heavy keys audited


@query(
    "countmin_heavy_keys",
    oracle=f"""
    WITH counts AS (
      SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ),
    cells AS (
      SELECT d.d,
             ('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':' ||
                                 CAST(counts.k AS VARCHAR)), 1, 8))::UBIGINT
               % {_CM_W} AS bucket,
             counts.c
      FROM counts CROSS JOIN (SELECT d FROM range({_CM_D}) t(d)) d
    ),
    sketch AS (
      SELECT d, bucket, CAST(SUM(c) AS BIGINT) AS cell
      FROM cells GROUP BY 1, 2
    ),
    heavy AS (
      SELECT k, c FROM (
        SELECT k, c, ROW_NUMBER() OVER (ORDER BY c DESC, k) AS rnk
        FROM counts
      ) WHERE rnk <= {_CM_TOPK}
    ),
    probes AS (
      SELECT heavy.k, heavy.c, d.d,
             ('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':' ||
                                 CAST(heavy.k AS VARCHAR)), 1, 8))::UBIGINT
               % {_CM_W} AS bucket
      FROM heavy CROSS JOIN (SELECT d FROM range({_CM_D}) t(d)) d
    )
    SELECT probes.k AS partkey,
           CAST(MAX(probes.c) AS BIGINT) AS exact_n,
           CAST(MIN(sketch.cell) AS BIGINT) AS est_n,
           CAST(MIN(sketch.cell) - MAX(probes.c) AS BIGINT) AS overcount
    FROM probes
    JOIN sketch ON sketch.d = probes.d AND sketch.bucket = probes.bucket
    GROUP BY probes.k
    """,
)
def countmin_heavy_keys(spark, sf_dir):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over lineitem
    part-key frequencies, audited against exact counts on the top-10
    heavy keys: ``est = min_d sketch[d][h_d(k)]`` never undercounts
    (every row's count lands in the probed cell plus non-negative
    collision mass), so ``overcount >= 0`` is a hard invariant and its
    magnitude is the audit readout — with depth 4 x width 256 the
    expected overestimate is <= e*N/w per probe at failure
    probability e^-d.

    The sketch here is what replaces exact per-key counting when the
    KEY DOMAIN itself no longer fits a shuffle (billions of distinct
    n-grams/URLs): it is a fixed d*w integer grid whose cells are
    plain SUMs — partial-aggregated map-side, merged across days or
    partitions by cell-wise addition, the same mergeability contract
    as the repo's Misra-Gries (operators/freq.py) and HLL maintainers,
    trading the MG top-K-only view for any-key point queries.

    Determinism: bucket = md5("d:k") 32-bit prefix mod w, rendered
    from the shared ``_CM_D``/``_CM_W`` module constants into both
    engines.  Scale shape: one combinable (key, count) aggregate off
    the scan, the sketch a 4x-explode of the KEY AGGREGATE (never the
    raw rows) into a 4*256-cell grid, the probe a broadcast join of
    40 probe cells against the tiny sketch; the heavy-key pick
    compiles to TakeOrderedAndProject (per-partition top-10 merged on
    the driver — no global sort even with billions of distinct keys).
    No stage touches more than |distinct keys| rows."""
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # both the sketch and the heavy-key pick consume this slim
    # (key, count) aggregate — persist it so the fact table is scanned
    # once, not once per branch (the qgram/assortativity idiom; the
    # cached frame is |distinct keys| x 16 bytes, the price any
    # two-consumer plan pays)
    counts = counts.persist()

    def bucket(dcol, kcol):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        dcol.cast("string"), F.lit(":"), kcol.cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long") % _CM_W

    d = F.explode(F.sequence(F.lit(0), F.lit(_CM_D - 1))).alias("d")
    cells = counts.select("k", "c", d).select(
        "d", bucket(F.col("d"), F.col("k")).alias("bucket"), "c"
    )
    sketch = cells.groupBy("d", "bucket").agg(
        F.sum("c").cast("long").alias("cell")
    )
    heavy = counts.orderBy(F.desc("c"), F.asc("k")).limit(_CM_TOPK)
    probes = heavy.select("k", "c", d).select(
        "k", "c", "d", bucket(F.col("d"), F.col("k")).alias("bucket")
    )
    est = (
        F.broadcast(probes)
        .join(sketch, ["d", "bucket"])
        .groupBy("k")
        .agg(
            F.max("c").cast("long").alias("exact_n"),
            F.min("cell").cast("long").alias("est_n"),
        )
    )
    return est.select(
        F.col("k").alias("partkey"),
        "exact_n",
        "est_n",
        (F.col("est_n") - F.col("exact_n")).cast("long").alias("overcount"),
    )
