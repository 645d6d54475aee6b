"""Round-8 planted twins, batch 2: MinHash-LSH, SimHash, and IVF get
the hash-green planted treatment (the three remaining rows-only slots
with deterministic closed-form plants; sketches/PQ-free approximates
stay rows-only by nature).

Each test pins the Spark query against an INDEPENDENT python twin that
derives the expected output from id arithmetic alone — never through
the Spark helpers — so a bug in the plant construction itself would
also show.  The load-bearing data assumptions (0-based contiguous ids,
group-divisible counts) are asserted across ALL shipped SFs via
DuckDB, mirroring the r6/r8 planted-twin contract guards.
"""

import duckdb

_SHIPPED = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _ids_contiguous(table, key, divisor):
    for d in _SHIPPED:
        n, lo, hi, nd = duckdb.sql(
            f"SELECT COUNT(*), MIN({key}), MAX({key}), COUNT(DISTINCT {key}) "
            f"FROM '{d}/{table}.parquet'"
        ).fetchone()
        assert (lo, hi, nd) == (0, n - 1, n), f"{d}/{table}: ids not contiguous"
        assert n % divisor == 0, f"{d}/{table}: count {n} not divisible by {divisor}"


def test_planted_group_assumptions_hold_at_every_shipped_sf():
    _ids_contiguous("documents", "doc_id", 4)
    _ids_contiguous("embeddings", "vec_id", 20)
    # 16 sign bits bound the group space for the IVF plant
    for d in _SHIPPED:
        (n,) = duckdb.sql(
            f"SELECT COUNT(*) FROM '{d}/embeddings.parquet'"
        ).fetchone()
        assert n // 20 <= 1 << 16


def _group_pairs(ids, width):
    want = []
    by_g = {}
    for i in sorted(ids):
        by_g.setdefault(i // width, []).append(i)
    for members in by_g.values():
        want.extend(
            (a, b) for ai, a in enumerate(members) for b in members[ai + 1 :]
        )
    return sorted(want)


def test_dedup_minhash_lsh_planted_matches_id_arithmetic(spark, sf_dir):
    from beehive_spark.queries import load
    from beehive_spark.queries.llm import dedup_minhash_lsh_planted

    ids = [
        r["doc_id"]
        for r in load(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    want = [(a, b, 1.0) for a, b in _group_pairs(ids, 4)]
    got = sorted(
        (r["doc_i"], r["doc_j"], r["jaccard"])
        for r in dedup_minhash_lsh_planted(spark, sf_dir).collect()
    )
    assert got == want and len(got) == 6 * (len(ids) // 4)


def test_dedup_simhash_planted_matches_id_arithmetic(spark, sf_dir):
    from beehive_spark.queries import load
    from beehive_spark.queries.llm import dedup_simhash_planted

    ids = [
        r["doc_id"]
        for r in load(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    want = [(a, b, 0) for a, b in _group_pairs(ids, 4)]
    got = sorted(
        (r["doc_i"], r["doc_j"], r["hamming"])
        for r in dedup_simhash_planted(spark, sf_dir).collect()
    )
    # equality with the closed form ALSO proves no cross-group pair
    # sneaked under hamming <= 3 on this fixed corpus/hash
    assert got == want and len(got) == 6 * (len(ids) // 4)


def test_similarity_ann_ivf_planted_matches_id_arithmetic(spark, sf_dir):
    from beehive_spark.queries import load
    from beehive_spark.queries.llm import similarity_ann_ivf_planted

    ids = [
        r["vec_id"]
        for r in load(spark, sf_dir, "embeddings").select("vec_id").collect()
    ]
    want = sorted(
        (20 * g, 20 * g + s, 1.0)
        for g in range(len(ids) // 20)
        for s in range(1, 6)
    )
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in similarity_ann_ivf_planted(spark, sf_dir).collect()
    )
    assert got == want and len(got) == 5 * (len(ids) // 20)


def test_similarity_ann_lsh_planted_matches_id_arithmetic(spark, sf_dir):
    from beehive_spark.queries import load
    from beehive_spark.queries.llm import similarity_ann_lsh_planted

    ids = [
        r["vec_id"]
        for r in load(spark, sf_dir, "embeddings").select("vec_id").collect()
    ]
    want = sorted(
        (20 * g, 20 * g + s, 1.0)
        for g in range(len(ids) // 20)
        for s in range(1, 6)
    )
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in similarity_ann_lsh_planted(spark, sf_dir).collect()
    )
    assert got == want and len(got) == 5 * (len(ids) // 20)


def test_refactored_hosts_still_produce(spark, sf_dir):
    """The three planted twins landed via shared-pipeline refactors of
    their host queries (_minhash_lsh_pairs / _simhash_pairs /
    _ivf_search); pin that each host still runs and keeps its output
    contract on the real corpus."""
    from beehive_spark.queries.llm import (
        dedup_minhash_lsh,
        dedup_simhash,
        similarity_ann_ivf,
    )

    mh = dedup_minhash_lsh(spark, sf_dir).collect()
    assert all(r["doc_i"] < r["doc_j"] and r["jaccard"] >= 0.5 for r in mh)
    sh = dedup_simhash(spark, sf_dir).collect()
    assert all(r["doc_i"] < r["doc_j"] and r["hamming"] <= 3 for r in sh)
    ivf = similarity_ann_ivf(spark, sf_dir).collect()
    per_q = {}
    for r in ivf:
        per_q.setdefault(r["query_id"], []).append(r["cosine"])
    assert set(per_q) == set(range(10))
    assert all(len(v) == 5 for v in per_q.values())
    from beehive_spark.queries.llm import similarity_ann_lsh

    lsh = similarity_ann_lsh(spark, sf_dir).collect()
    per_q = {}
    for r in lsh:
        per_q.setdefault(r["query_id"], []).append(r["cosine"])
    assert set(per_q) <= set(range(10))
    assert all(len(v) <= 5 for v in per_q.values())
