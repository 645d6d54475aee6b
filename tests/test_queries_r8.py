"""Round-8 additions: exact planted twins for the two rows-only slots
(PQ/ADC path, SemDeDup pair stage) plus their contract guards.

Each driver-gated query gets an in-test pin against an INDEPENDENT
brute-force python twin on the real sf0.001 ids — the twins recompute
the plants from scratch (digits / sphere points), not through any of
the Spark helpers, so a bug in the plant construction itself would
also show."""

import itertools

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# similarity_ann_pq_planted: digit-arithmetic twin
# ---------------------------------------------------------------------------
_CENTS = [(2, 0), (0, 2), (-2, 0), (0, -2)]


def _digits(i):
    return [(i // 4**j) % 4 for j in range(4)]


def _grid_vec(i):
    v = []
    for d in _digits(i):
        v.extend(_CENTS[d])
    return v


def test_similarity_ann_pq_planted_matches_digit_arithmetic(spark, sf_dir):
    from beehive_spark.queries import load
    from beehive_spark.queries.llm import similarity_ann_pq_planted

    ids = [r["vec_id"] for r in load(spark, sf_dir, "embeddings").select("vec_id").collect()]
    queries = sorted(i for i in ids if i < 10)
    corpus = sorted(i for i in ids if i >= 10)
    want = []
    for q in queries:
        qv = _grid_vec(q)
        scored = sorted(
            (
                (-sum(a * b for a, b in zip(qv, _grid_vec(c))), c)
                for c in corpus
            ),
        )[:5]
        want.extend((q, c, round(-negdot / 16.0, 4)) for negdot, c in scored)
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in similarity_ann_pq_planted(spark, sf_dir).collect()
    )
    assert got == sorted(want) and len(got) == 5 * len(queries)


def test_pq_planted_codes_roundtrip_exactly(spark, sf_dir):
    """The persisted code table must recover every vector's base-4
    digits exactly — the encode-argmax half of the ADC path, checked
    directly against integer arithmetic."""
    import os

    from beehive_spark.queries import load
    from beehive_spark.queries.llm import _ann_index_dir, similarity_ann_pq_planted

    similarity_ann_pq_planted(spark, sf_dir).count()  # ensure index exists
    idx = _ann_index_dir(sf_dir, "pq_planted")
    codes = {
        r["vec_id"]: list(r["codes"])
        for r in spark.read.parquet(os.path.join(idx, "codes.parquet")).collect()
    }
    assert codes and all(codes[i] == _digits(i) for i in codes)
    assert all(i >= 10 for i in codes)  # queries are not in the corpus


# ---------------------------------------------------------------------------
# dedup_semantic_planted: sphere-point twin
# ---------------------------------------------------------------------------
_TRI = [(4, 4, 2), (4, 2, 4), (2, 4, 4)]


def _sphere_vec(p):
    if p <= 6:
        return _TRI[p % 3]
    if p <= 13:
        return tuple(-x for x in _TRI[(p - 7) % 3])
    return (4, -4, 2)


def test_dedup_semantic_planted_matches_brute(spark, sf_dir):
    from beehive_spark.queries import load
    from beehive_spark.queries.llm import dedup_semantic_planted

    ids = [
        r["id"]
        for r in load(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("id"))
        .collect()
    ]
    byblock = {}
    for i in sorted(ids):
        byblock.setdefault(i // 15, []).append(i)
    want = {}
    for b, members in byblock.items():
        for a, d in itertools.combinations(members, 2):
            va = [x / 6.0 for x in _sphere_vec(a % 15)]
            vd = [x / 6.0 for x in _sphere_vec(d % 15)]
            sim = sum(x * y for x, y in zip(va, vd))
            if sim >= 0.45:
                keep, cl, mx = want.get(d, (a, b, sim))
                want[d] = (min(keep, a), b, max(mx, sim))
    want = {d: (k, c, round(m, 4)) for d, (k, c, m) in want.items()}
    got = {
        r["drop_id"]: (r["keep_id"], r["cluster_id"], r["max_cosine"])
        for r in dedup_semantic_planted(spark, sf_dir).collect()
    }
    assert got == want
    # the closed-form survivor set: positions 1-6 and 8-13 drop, with
    # keepers at positions 0 and 7 — nothing else
    for d, (k, c, _) in got.items():
        p = d % 15
        assert (1 <= p <= 6 and k == d - p) or (8 <= p <= 13 and k == d - p + 7)
    assert len(got) == 12 * len(byblock)


# ---------------------------------------------------------------------------
# record_linkage_blocked: exact true-pair recall vs the unblocked scorer
# ---------------------------------------------------------------------------
def test_record_linkage_blocked_keeps_every_link(spark, sf_dir):
    """The stagger bound guarantees every true link survives blocking
    with an IDENTICAL score; the blocked output must also be a subset
    of the unblocked scored candidates (blocking only removes pairs,
    never invents or rescores them)."""
    from beehive_spark.queries.relational import (
        record_linkage_blocked,
        record_linkage_fs,
    )

    fs = {
        (r["dirty_id"], r["clean_id"]): (r["score_milli"], r["decision"])
        for r in record_linkage_fs(spark, sf_dir).collect()
    }
    bl = {
        (r["dirty_id"], r["clean_id"]): (r["score_milli"], r["decision"])
        for r in record_linkage_blocked(spark, sf_dir).collect()
    }
    links = {k: v for k, v in fs.items() if v[1] == "link"}
    assert links and all(bl.get(k) == v for k, v in links.items())
    assert set(bl) <= set(fs)
    n_dirty = sum(1 for (d, c) in links if d - 10_000_000 == c)
    assert n_dirty == len(links)  # every link is a true planted pair


# ---------------------------------------------------------------------------
# pmi_collocations: python counting twin
# ---------------------------------------------------------------------------
def test_pmi_collocations_matches_python_counts(spark, sf_dir):
    import math
    import re
    from collections import Counter

    from beehive_spark.queries import load
    from beehive_spark.queries.llm import pmi_collocations

    texts = [
        r["text"] for r in load(spark, sf_dir, "documents").select("text").collect()
    ]
    pc, nl, nr = Counter(), Counter(), Counter()
    for t in texts:
        w = re.findall(r"[a-z0-9]+", t.lower())
        for a, b in zip(w, w[1:]):
            pc[(a, b)] += 1
            nl[a] += 1
            nr[b] += 1
    nt = sum(pc.values())
    scored = []
    for (a, b), n11 in pc.items():
        if n11 >= 5:
            pmi = math.log((n11 * nt) / (nl[a] * nr[b]))
            # match F.round's exact semantics (BigDecimal.valueOf =
            # shortest decimal repr, then HALF_UP): floor(abs+0.5)
            # misrounds doubles one ulp below a .5 boundary (r8 review)
            from decimal import ROUND_HALF_UP, Decimal

            mv = pmi * 1_000_000
            pm = int(
                Decimal(repr(mv)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
            )
            scored.append((-pm, a, b, n11))
    scored.sort()
    want = [(a, b, n11, -negpm) for negpm, a, b, n11 in scored[:50]]
    got = [
        (r["w1"], r["w2"], r["n_pair"], r["pmi_micro"])
        for r in pmi_collocations(spark, sf_dir).collect()
    ]
    assert got == want and len(got) == 50


# ---------------------------------------------------------------------------
# events_ohlc_bars: python fold twin
# ---------------------------------------------------------------------------
def test_events_ohlc_bars_matches_python_fold(spark, sf_dir):
    from beehive_spark.queries import load
    from beehive_spark.queries.core import events_ohlc_bars

    rows = (
        load(spark, sf_dir, "events")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    buckets = {}
    for r in rows:
        b = r["ts"].replace(minute=0, second=0, microsecond=0)
        buckets.setdefault((r["event_type"], b), []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    want = {}
    for k, evs in buckets.items():
        evs.sort()
        vals = [v for _, _, v in evs]
        want[k] = (evs[0][2], max(vals), min(vals), evs[-1][2], len(evs))
    got = {
        (r["event_type"], r["bucket"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"],
        )
        for r in events_ohlc_bars(spark, sf_dir).collect()
    }
    assert got == want and got


# ---------------------------------------------------------------------------
# table_checksum_buckets: python md5 twin + corruption-detection contract
# ---------------------------------------------------------------------------
def _order_row_hash(r):
    import hashlib

    cents = int(
        __import__("decimal").Decimal(repr(r["o_totalprice"] * 100)).quantize(
            __import__("decimal").Decimal(1),
            rounding=__import__("decimal").ROUND_HALF_UP,
        )
    )
    s = "|".join(
        [
            str(r["o_orderkey"]),
            str(r["o_custkey"]),
            r["o_orderstatus"],
            str(cents),
            r["o_orderdate"].strftime("%Y-%m-%d"),
            r["o_orderpriority"],
        ]
    )
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_table_checksum_buckets_matches_python_md5(spark, sf_dir):
    from beehive_spark.queries import load
    from beehive_spark.queries.relational import table_checksum_buckets

    rows = load(spark, sf_dir, "orders").collect()
    want = {}
    for r in rows:
        h = _order_row_hash(r)
        b = h % 256
        n, x, s = want.get(b, (0, 0, 0))
        want[b] = (n + 1, x ^ h, s + h % 1_000_000_007)
    got = {
        r["bucket"]: (r["n_rows"], r["xor_fp"], r["sum_fp"])
        for r in table_checksum_buckets(spark, sf_dir).collect()
    }
    assert got == want and got


def test_table_checksum_buckets_localizes_a_single_corrupt_row(spark, sf_dir):
    """The reconciliation contract, EXECUTED: run the same fingerprint
    computation over a copy of orders with ONE row's content mutated
    (same cardinality) and diff the two Spark-computed frames — the
    change must surface, and only in the corrupt row's old/new
    buckets.  (The first version of this test hand-adjusted the
    expected dict and could never fail — r8 review.)"""
    from beehive_spark.operators.ivm import build_checksum
    from beehive_spark.queries import load
    from beehive_spark.queries.relational import (
        _orders_row_hash,
        table_checksum_buckets,
    )

    base = {
        r["bucket"]: (r["n_rows"], r["xor_fp"], r["sum_fp"])
        for r in table_checksum_buckets(spark, sf_dir).collect()
    }
    o = load(spark, sf_dir, "orders")
    victim_key = o.first()["o_orderkey"]
    corrupt = o.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == victim_key, F.lit("Z")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    got = {
        r["bucket"]: (r["n_rows"], r["xor_fp"], r["sum_fp"])
        for r in build_checksum(corrupt.select(_orders_row_hash().alias("rh"))).collect()
    }
    victim = o.filter(F.col("o_orderkey") == victim_key).first()
    b_old = _order_row_hash(victim) % 256
    b_new = (
        _order_row_hash(type(victim)(**{**victim.asDict(), "o_orderstatus": "Z"}))
        % 256
    )
    changed = {b for b in set(base) | set(got) if base.get(b) != got.get(b)}
    assert changed and changed <= {b_old, b_new}
    # total row count is conserved — the diff counts cannot see
    assert sum(v[0] for v in got.values()) == sum(v[0] for v in base.values())


def test_incremental_checksum_random_history_equals_recompute(spark):
    """Property-style pin for operators.ivm.incremental_checksum: a
    random multi-round CDC history (inserts incl. exact clones,
    deletes, value updates) maintained incrementally must equal
    build_checksum recomputed from the surviving multiset after EVERY
    round — including the XOR parity case (clone insert then delete)."""
    import random

    from pyspark.sql import functions as F2

    from beehive_spark.operators.ivm import build_checksum, incremental_checksum

    rng = random.Random(88)
    rows = [rng.randrange(1, 2**59) for _ in range(300)]

    def frame(hs, sign=None):
        data = [(h,) if sign is None else (h, sign) for h in hs]
        schema = "rh long" if sign is None else "rh long, _sign int"
        return spark.createDataFrame(data, schema)

    live = list(rows)
    view = build_checksum(frame(live), n_buckets=16)
    for _ in range(4):
        retr = []
        # deletes
        for _ in range(20):
            h = live.pop(rng.randrange(len(live)))
            retr.append((h, -1))
        # clone inserts (xor parity) + fresh inserts
        for _ in range(10):
            h = rng.choice(live)
            live.append(h)
            retr.append((h, 1))
        for _ in range(15):
            h = rng.randrange(1, 2**59)
            live.append(h)
            retr.append((h, 1))
        # updates: old out, new in
        for _ in range(10):
            i = rng.randrange(len(live))
            old, new = live[i], rng.randrange(1, 2**59)
            live[i] = new
            retr.extend([(old, -1), (new, 1)])
        rdf = spark.createDataFrame(retr, "rh long, _sign int")
        view = incremental_checksum(view, rdf, n_buckets=16).localCheckpoint()
        want = {
            r["bucket"]: (r["n_rows"], r["xor_fp"], r["sum_fp"])
            for r in build_checksum(frame(live), n_buckets=16).collect()
        }
        got = {
            r["bucket"]: (r["n_rows"], r["xor_fp"], r["sum_fp"])
            for r in view.collect()
        }
        assert got == want


# ---------------------------------------------------------------------------
# incremental_histogram_orders: python recompute twin over the mutated snapshot
# ---------------------------------------------------------------------------
def test_incremental_histogram_matches_python_recompute(spark, sf_dir):
    from collections import Counter

    from beehive_spark.queries import load
    from beehive_spark.queries.relational import incremental_histogram_orders

    rows = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).collect()
    snap = []
    for r in rows:
        k = r["o_orderkey"]
        cents = round(r["o_totalprice"] * 100)
        if k % 97 != 0:
            pr = "1-URGENT" if k % 11 == 0 else r["o_orderpriority"]
            snap.append((pr, cents + (1000 if k % 5 == 0 else 0)))
        if k % 101 == 0:
            snap.append((r["o_orderpriority"], cents))
    hist = Counter((pr, c // 65536) for pr, c in snap)
    want = {}
    for pr in {p for p, _ in hist}:
        bins = sorted((b, n) for (p, b), n in hist.items() if p == pr)
        total = sum(n for _, n in bins)
        idx = (95 * total + 99) // 100
        cum = 0
        for b, n in bins:
            cum += n
            if cum >= idx:
                want[pr] = (total, b * 65536)
                break
    got = {
        r["o_orderpriority"]: (r["n_rows"], r["p95_lo_cents"])
        for r in incremental_histogram_orders(spark, sf_dir).collect()
    }
    assert got == want and got
