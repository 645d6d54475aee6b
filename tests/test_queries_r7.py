"""Round-7 additions: planted PageRank twin (and siblings as they land).

Each driver-gated query gets an in-test pin against an INDEPENDENT
brute-force twin on the real sf0.001 data — here a full |V|-dimensional
python power iteration, NOT the two-scalar symmetry collapse the oracle
uses, so a symmetry-breaking bug in the plant itself would also show."""

from pyspark.sql import functions as F


def _brute_pagerank_star_forest(n: int, iters: int, damping: float = 0.85):
    """Dense per-node power iteration over the planted star forest,
    replicating the operator's no_dangling update order exactly:
    r' = (1-d)/n + d * sum(in-contribs)."""
    out_deg = [14 if i % 15 == 0 else 1 for i in range(n)]
    ranks = [1.0 / n] * n
    for _ in range(iters):
        contrib = [0.0] * n
        for i in range(n):
            hub = (i // 15) * 15
            if i == hub:
                continue
            # leaf -> hub and hub -> leaf
            contrib[hub] += ranks[i] / out_deg[i]
            contrib[i] += ranks[hub] / out_deg[hub]
        ranks = [
            (1.0 - damping) / n + damping * contrib[i] for i in range(n)
        ]
    return ranks


def test_pagerank_planted_matches_dense_power_iteration(spark, sf_dir):
    from beehive_spark.queries.relational import (
        _PR_PLANTED_ITERS,
        pagerank_planted,
    )

    got = {
        (r["id"], r["rank_nano"])
        for r in pagerank_planted(spark, sf_dir).collect()
    }
    n = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert n % 15 == 0 and n > 0
    ranks = _brute_pagerank_star_forest(n, _PR_PLANTED_ITERS)
    # the dense twin and the operator disagree only at fl-sum ulp
    # scale, ~9 orders below the nano grid — exact match expected
    want = {(i, round(ranks[i] * 1e9)) for i in range(n)}
    assert got == want and got
    # ranks form a probability distribution (mass conservation is the
    # property the planted oracle is designed to catch violations of)
    total = sum(ranks)
    assert abs(total - 1.0) < 1e-9
    # non-uniform by construction: hub mass well above leaf mass
    hubs = {v for i, v in want if i % 15 == 0}
    leaves = {v for i, v in want if i % 15 != 0}
    assert min(hubs) > 5 * max(leaves)
