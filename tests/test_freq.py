"""Exact heavy hitters (`operators.freq.frequent_items`).

The output contract is exactness: for ANY partitioning, the result
equals the brute-force GROUP BY/HAVING answer.  Pinned on a skewed
synthetic stream across several partitionings (the MG candidate set
changes with partitioning; the exact recount must not), plus typed
(non-string) keys and the degenerate all-distinct stream.
"""

import pytest

pytestmark = pytest.mark.slow  # sketch property sweep (covered fast by test_sketches)
from pyspark.sql import functions as F

from beehive_spark.operators.freq import frequent_items


def _exact(df, col, phi):
    n = df.count()
    return {
        (r[0], r[1])
        for r in df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > phi * n)
        .collect()
    }


def _skewed(spark):
    # zipf-ish: value v repeated ~ 3000/v times, v = 1..200, plus a
    # long unique tail -> a few true heavy hitters over ~25k rows
    rows = spark.range(1, 201).select(
        F.explode(
            F.sequence(F.lit(1), (F.lit(3000) / F.col("id")).cast("int"))
        ).alias("_"),
        F.concat(F.lit("v"), F.col("id")).alias("item"),
    )
    tail = spark.range(0, 5000).select(
        F.lit(0).alias("_"), F.concat(F.lit("u"), F.col("id")).alias("item")
    )
    return rows.unionByName(tail).select("item")


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_matches_bruteforce_any_partitioning(spark, parts):
    df = _skewed(spark).repartition(parts)
    phi = 0.01
    got = {(r[0], r[1]) for r in frequent_items(df, "item", phi).select("item", "cnt").collect()}
    assert got == _exact(df, "item", phi)
    assert got  # non-degenerate: there ARE heavy hitters at this phi


def test_long_keys_and_frac(spark):
    df = spark.range(0, 1000).select((F.col("id") % 7).alias("k"))
    out = frequent_items(df, "k", 0.1)
    rows = {r["k"]: (r["cnt"], r["frac"]) for r in out.collect()}
    assert set(rows) == {0, 1, 2, 3, 4, 5, 6}
    assert rows[0] == (143, 0.143)


def test_all_distinct_returns_empty(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    assert frequent_items(df, "k", 0.01).count() == 0


def test_phi_validation(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    for bad in (0.0, 1.0, -0.5, 2.0):
        with pytest.raises(ValueError):
            frequent_items(df, "k", bad)


def test_empty_partitions_and_sparse_stream(spark):
    # many partitions, few rows: most partitions are EMPTY — the
    # candidate pass must still emit a well-typed (string) frame
    # (regression: empty pandas index is int64 and broke Arrow cast)
    df = (
        spark.range(0, 20)
        .select(F.concat(F.lit("x"), (F.col("id") % 2)).alias("item"))
        .repartition(64)
    )
    got = {(r[0], r[1]) for r in frequent_items(df, "item", 0.3).select("item", "cnt").collect()}
    assert got == {("x0", 10), ("x1", 10)}


def test_grouped_matches_per_stratum_bruteforce(spark):
    # two strata with different sizes and different heavy hitters
    df = (
        spark.range(0, 900)
        .select(
            F.when(F.col("id") < 600, "big").otherwise("small").alias("src"),
            F.when(F.col("id") % 3 == 0, "hot")
            .otherwise(F.concat(F.lit("t"), F.col("id")))
            .alias("item"),
        )
        .repartition(8)
    )
    got = {
        (r["src"], r["item"], r["cnt"])
        for r in frequent_items(df, "item", 0.2, by=["src"]).collect()
    }
    want = set()
    for src in ("big", "small"):
        sub = df.filter(F.col("src") == src)
        n = sub.count()
        want |= {
            (src, r["item"], r["cnt"])
            for r in sub.groupBy("item")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > 0.2 * n)
            .collect()
        }
    assert got == want and got
