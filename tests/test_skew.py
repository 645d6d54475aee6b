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
