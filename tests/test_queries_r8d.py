"""Round-8 additions, batch 4: negative sampling, min-max feature
scaling, k-anonymity audit — python twins computed straight off the
parquet, never through the Spark helpers."""

import hashlib

import duckdb


def _md5_ordinal(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_negative_sampling_matches_python_twin(spark, sf_dir):
    from beehive_spark.queries.curation import negative_sampling

    custs = [
        r[0]
        for r in duckdb.sql(
            f"SELECT c_custkey FROM '{sf_dir}/customer.parquet'"
        ).fetchall()
    ]
    (n_parts,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/part.parquet'"
    ).fetchone()
    pos = set(
        duckdb.sql(
            f"SELECT DISTINCT o.o_custkey, l.l_partkey "
            f"FROM '{sf_dir}/orders.parquet' o "
            f"JOIN '{sf_dir}/lineitem.parquet' l ON o.o_orderkey = l.l_orderkey"
        ).fetchall()
    )
    want = []
    for c in custs:
        first_slot = {}
        for i in range(20):
            p = _md5_ordinal(f"{c}:{i}") % n_parts
            if (c, p) in pos:
                continue
            first_slot.setdefault(p, i)
        keep = sorted(first_slot.items(), key=lambda t: t[1])[:5]
        want.extend((c, p, rk + 1) for rk, (p, _) in enumerate(keep))
    got = sorted(
        (r["custkey"], r["neg_partkey"], r["rk"])
        for r in negative_sampling(spark, sf_dir).collect()
    )
    assert got == sorted(want)
    # the shipped corpora never undersupply: every customer fills k=5
    assert len(got) == 5 * len(custs)


def test_negative_sampling_excludes_every_positive(spark, sf_dir):
    from beehive_spark.queries.curation import negative_sampling

    pos = set(
        duckdb.sql(
            f"SELECT DISTINCT o.o_custkey, l.l_partkey "
            f"FROM '{sf_dir}/orders.parquet' o "
            f"JOIN '{sf_dir}/lineitem.parquet' l ON o.o_orderkey = l.l_orderkey"
        ).fetchall()
    )
    got = negative_sampling(spark, sf_dir).collect()
    assert pos and all((r["custkey"], r["neg_partkey"]) not in pos for r in got)


def test_feature_minmax_scaled_matches_python_twin(spark, sf_dir):
    from beehive_spark.queries.curation import feature_minmax_scaled

    rows = duckdb.sql(
        f"SELECT p_partkey, p_brand, p_retailprice FROM '{sf_dir}/part.parquet'"
    ).fetchall()
    lo, hi = {}, {}
    for _, b, x in rows:
        lo[b] = min(lo.get(b, x), x)
        hi[b] = max(hi.get(b, x), x)
    want = sorted(
        (pk, b, round((x - lo[b]) / (hi[b] - lo[b]), 6)) for pk, b, x in rows
    )
    got = sorted(
        (r["p_partkey"], r["brand"], r["price_scaled"])
        for r in feature_minmax_scaled(spark, sf_dir).collect()
    )
    assert got == want
    assert all(0.0 <= v <= 1.0 for _, _, v in got)


def test_no_constant_price_brand_at_any_shipped_sf():
    """The query's no-divide-by-zero promise: every brand spans at
    least two distinct prices at every shipped SF."""
    for d in ("sf0.001", "sf0.01", "sf0.1"):
        (n,) = duckdb.sql(
            f"SELECT COUNT(*) FROM ("
            f"  SELECT p_brand FROM '/root/testdata/{d}/part.parquet'"
            f"  GROUP BY 1 HAVING MIN(p_retailprice) = MAX(p_retailprice))"
        ).fetchone()
        assert n == 0, f"{d}: {n} constant-price brands"


def test_k_anonymity_audit_matches_python_twin(spark, sf_dir):
    from beehive_spark.queries.curation import k_anonymity_audit

    rows = duckdb.sql(
        f"SELECT c_nationkey, c_mktsegment FROM '{sf_dir}/customer.parquet'"
    ).fetchall()
    sizes = {}
    for key in rows:
        sizes[key] = sizes.get(key, 0) + 1
    want = sorted((n, s, c, c < 6) for (n, s), c in sizes.items())
    got = sorted(
        (r["nationkey"], r["segment"], r["group_size"], r["at_risk"])
        for r in k_anonymity_audit(spark, sf_dir).collect()
    )
    assert got == want
    assert sum(c for *_, c, _r in got) == len(rows)
    assert any(r for *_, r in got)  # the audit has something to report
