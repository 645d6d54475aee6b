"""salted_join must match the plain join's result exactly — salting
is a physical-placement change only."""

from pyspark.sql import functions as F

from beehive_spark.operators.skew import salted_join


def _fixtures(spark):
    # skewed large side: key 1 dominates
    large = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 900), (3, 901)], ["k", "payload"]
    )
    small = spark.createDataFrame(
        [(1, "hot"), (2, "warm"), (4, "unmatched")], ["k", "label"]
    )
    return large, small


def test_salted_inner_matches_plain(spark):
    large, small = _fixtures(spark)
    got = salted_join(large, small, "k").groupBy("k", "label").count()
    want = large.join(small, "k").groupBy("k", "label").count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_left_keeps_unmatched(spark):
    large, small = _fixtures(spark)
    out = salted_join(large, small, "k", how="left")
    assert out.count() == large.count()
    assert out.filter(F.col("k") == 3).collect()[0]["label"] is None


def test_salted_spreads_hot_key(spark):
    large, small = _fixtures(spark)
    lg = large.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8))
    )
    n_salts = lg.filter(F.col("k") == 1).select("__salt").distinct().count()
    assert n_salts > 1  # the hot key really is scattered


def test_salted_bounds_hot_key_task_share(spark):
    """The scale pin behind the STRESS skew_join rows, made
    deterministic: a shuffled equi-join's max task work is
    proportional to the largest join-key group, so we pin GROUP
    SIZES instead of wall-clock.  With the STRESS zipf shape (80% of
    rows on one key) the plain join's hottest key owns 80% of the
    shuffle at ANY scale; after salt=32 scattering, the hottest
    (key, salt) group must hold at most ~1/32 of that hot key (2x
    slack for hash imbalance).  Checked at two sizes so the bound is
    shown scale-free — the property that makes salting survive a
    100x scale-up while the plain join's hot task grows linearly."""
    import pyspark.sql.functions as F

    salt = 32
    for n in (20_000, 200_000):
        large = spark.range(n).select(
            F.when(F.pmod("id", F.lit(5)) != 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(2_000)))
            .alias("k"),
            (F.col("id") % 1000).alias("v"),
        )
        plain_max = (
            large.groupBy("k").count().agg(F.max("count")).collect()[0][0]
        )
        assert plain_max >= 0.75 * n  # the zipf shape really is hot

        salted = large.withColumn(
            "__salt",
            F.pmod(F.xxhash64("k", "v", F.lit(42)), F.lit(salt)),
        )
        salted_max = (
            salted.groupBy("k", "__salt")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert salted_max <= 2 * plain_max / salt, (
            f"n={n}: salted max group {salted_max} vs plain {plain_max} — "
            f"salting no longer spreads the hot key across {salt} tasks"
        )


def test_salted_join_equivalence_randomized(spark):
    """Property check over randomized (but seeded) frames: for inner
    and left joins, salted_join's full result multiset equals the
    plain join's — including duplicate keys on BOTH sides (each large
    row must match every small row with its key exactly once per
    replica pairing) and keys present on only one side."""
    import random

    rnd = random.Random(7)
    for trial in range(3):
        large = spark.createDataFrame(
            [
                (rnd.randint(0, 6), rnd.randint(0, 99))
                for _ in range(rnd.randint(30, 80))
            ],
            ["k", "payload"],
        )
        small = spark.createDataFrame(
            [
                (rnd.randint(0, 8), f"v{rnd.randint(0, 3)}")
                for _ in range(rnd.randint(2, 12))
            ],
            ["k", "label"],
        )
        for how in ("inner", "left"):
            got = sorted(
                map(tuple, salted_join(large, small, "k", salt=4, how=how)
                    .select("k", "payload", "label").collect())
            )
            want = sorted(
                map(tuple, large.join(small, "k", how)
                    .select("k", "payload", "label").collect())
            )
            assert got == want, f"trial {trial} how={how}"
