"""delta_join: the bilinear join-maintenance identity against a
brute-force multiset recompute on seeded random inputs, including
cross-term (dA x dB) collisions, retractions of existing rows, brand
new keys, and multiset duplicates."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from beehive_spark.operators.ivm import SIGN, delta_join


def _apply(old: Counter, delta: Counter) -> Counter:
    out = Counter(old)
    for row, s in delta.items():
        out[row] += s
    bad = {r: c for r, c in out.items() if c < 0}
    assert not bad, f"negative multiplicity after apply: {bad}"
    return Counter({r: c for r, c in out.items() if c > 0})


def _join(a: Counter, b: Counter) -> Counter:
    out = Counter()
    for (k1, av), ca in a.items():
        for (k2, bv), cb in b.items():
            if k1 == k2:
                out[(k1, av, bv)] += ca * cb
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_delta_join_equals_recompute(spark, seed):
    rng = random.Random(seed)
    keys = list(range(8))  # small key space -> many collisions
    a_old = Counter(
        (rng.choice(keys), rng.randrange(100)) for _ in range(40)
    )
    b_old = Counter(
        (rng.choice(keys), rng.randrange(100, 200)) for _ in range(25)
    )
    # duplicates: bump some multiplicities
    for r in list(a_old)[:5]:
        a_old[r] += 1

    def mk_delta(old: Counter, lo: int, hi: int, n: int) -> Counter:
        d = Counter()
        rows = list(old)
        for _ in range(n):
            if rows and rng.random() < 0.5:
                r = rng.choice(rows)  # retract an existing row
                if old[r] + d[r] > 0:
                    d[r] -= 1
                    continue
            d[(rng.choice(keys + [99]), rng.randrange(lo, hi))] += 1
        return Counter({r: s for r, s in d.items() if s != 0})

    da = mk_delta(a_old, 0, 100, 15)
    db = mk_delta(b_old, 100, 200, 10)

    def df_unsigned(cnt, vcol):
        rows = [(k, v) for (k, v), c in cnt.items() for _ in range(c)]
        return spark.createDataFrame(rows, f"k long, {vcol} long")

    def df_signed(cnt, vcol):
        rows = [(int(s), k, v) for (k, v), s in cnt.items()]
        return spark.createDataFrame(rows, f"{SIGN} long, k long, {vcol} long")

    dv = delta_join(
        df_unsigned(a_old, "av"),
        df_signed(da, "av"),
        df_unsigned(b_old, "bv"),
        df_signed(db, "bv"),
        on="k",
    )
    got_delta = Counter()
    for r in dv.collect():
        got_delta[(r["k"], r["av"], r["bv"])] += r[SIGN]
    got = _apply(_join(a_old, b_old), got_delta)
    want = _join(_apply(a_old, da), _apply(b_old, db))
    assert got == want and want


def test_delta_join_rejects_column_collisions(spark):
    a = spark.createDataFrame([(1, 2)], "k long, v long")
    d = spark.createDataFrame([(1, 1, 2)], f"{SIGN} long, k long, v long")
    with pytest.raises(ValueError, match="collision"):
        delta_join(a, d, a, d, on="k")


def test_delta_join_rejects_internal_rename_collisions(spark):
    a = spark.createDataFrame([(1, 2)], "k long, _sign_a long")
    da = spark.createDataFrame(
        [(1, 1, 2)], f"{SIGN} long, k long, _sign_a long"
    )
    b = spark.createDataFrame([(1, 3)], "k long, bv long")
    db = spark.createDataFrame([(1, 1, 3)], f"{SIGN} long, k long, bv long")
    with pytest.raises(ValueError, match="collision"):
        delta_join(a, da, b, db, on="k")
