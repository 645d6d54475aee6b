"""CDC round-trip: snapshot_diff's change feed applied to the old
snapshot must reproduce the new snapshot exactly — diff and apply are
inverse operations (the property that makes delta pipelines safe to
substitute for full re-merges)."""

import pytest

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from beehive_spark.queries import load
from beehive_spark.sources.writers import apply_cdc_parquet


def _mutated_snapshot(c):
    """The same deterministic 'new snapshot' construction snapshot_diff
    diffs against (drop %97, bump acctbal %5, clone %101 shifted)."""
    base = c.filter(F.col("c_custkey") % 97 != 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        "c_mktsegment",
    )
    clones = c.filter(F.col("c_custkey") % 101 == 0).select(
        (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
        "c_acctbal",
        "c_mktsegment",
    )
    return base.unionByName(clones)


def test_diff_then_apply_reproduces_new_snapshot(spark, sf_dir, tmp_path):
    from beehive_spark.queries.relational import snapshot_diff

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    path = str(tmp_path / "cust_table")
    c.write.parquet(path)

    # snapshot_diff emits (change_type, key, bal_old, bal_new) — a
    # report shape; rebuild the applyable feed with payload columns
    diff = snapshot_diff(spark, sf_dir)
    new = _mutated_snapshot(c)
    feed = diff.select("change_type", "c_custkey").join(
        new.unionByName(  # deletes need a payload row too (ignored)
            c.join(new, "c_custkey", "left_anti")
        ),
        "c_custkey",
    )
    res = apply_cdc_parquet(spark, path, feed, keys="c_custkey")
    assert res["deleted"] > 0 and res["upserted"] > 0

    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    want = sorted(map(tuple, new.collect()))
    assert got == want


def test_apply_cdc_creates_table_from_inserts(spark, tmp_path):
    path = str(tmp_path / "fresh")
    feed = spark.createDataFrame(
        [("insert", 1, 10.0), ("insert", 2, 20.0)], ["change_type", "k", "v"]
    )
    res = apply_cdc_parquet(spark, path, feed, keys="k")
    assert res == {"deleted": 0, "upserted": 2, "total": 2}
    assert spark.read.parquet(path).count() == 2


@pytest.mark.slow  # heavy member of an otherwise-fast suite
def test_apply_cdc_delete_only(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)], ["k", "v"]).write.parquet(
        path
    )
    feed = spark.createDataFrame(
        [("delete", 2, None)], "change_type string, k bigint, v double"
    )
    res = apply_cdc_parquet(spark, path, feed, keys="k")
    assert res["deleted"] == 1 and res["total"] == 2
    assert sorted(r["k"] for r in spark.read.parquet(path).collect()) == [1, 3]


def test_delete_where_null_safe_and_crash_safe(spark, sf_dir, tmp_path):
    """delete_where removes exactly the predicate-true rows (NULL
    predicate rows survive, SQL DELETE semantics), leaves no scratch
    dirs, and a pre-existing stale staging dir does not corrupt it."""
    import os

    from beehive_spark.queries import load
    from beehive_spark.sources.writers import delete_where

    path = str(tmp_path / "t")
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    c.write.parquet(path)
    os.makedirs(path + ".staging")  # stale leftovers from a "crash"
    n = c.count()
    doomed = c.filter(F.col("bal") < 0).count()
    nulls = c.filter(F.col("bal").isNull()).count()
    stats = delete_where(spark, path, "bal < 0")
    assert stats == {"deleted": doomed, "remaining": n - doomed}
    left = spark.read.parquet(path)
    assert left.filter(F.col("bal") < 0).count() == 0
    assert left.filter(F.col("bal").isNull()).count() == nulls
    assert not os.path.isdir(path + ".staging")
    assert not os.path.isdir(path + ".old")


def test_apply_cdc_recovers_mid_swap_crash_window(spark, tmp_path):
    """r6 review finding: a crash between the swap's two renames
    leaves NO live table (old state in .old, complete new state in
    .staging); a rerun without recovery would read the table as empty
    and publish only the batch's own rows, losing all history.  The
    recovery preamble must roll FORWARD (staging is complete by
    construction there) — and with the staging also gone, roll back
    to the backup."""
    import os
    import shutil

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    ).write.parquet(path)
    feed = spark.createDataFrame(
        [("update", 2, "B")], "change_type string, k long, v string"
    )

    # simulate the window: staging fully written, first rename done,
    # second rename not
    staging, backup = path + ".staging", path + ".old"
    spark.read.parquet(path).withColumn(
        "v", __import__("pyspark.sql.functions", fromlist=["upper"]).upper("v")
    ).write.parquet(staging)
    os.replace(path, backup)

    from beehive_spark.sources.writers import apply_cdc_parquet

    res = apply_cdc_parquet(spark, path, feed, keys="k")
    got = sorted((r["k"], r["v"]) for r in spark.read.parquet(path).collect())
    # staging (upper-cased) was promoted, THEN the feed applied on top
    assert got == [(1, "A"), (2, "B"), (3, "C")]
    assert res["total"] == 3 and not os.path.exists(backup)

    # staging gone too -> roll back to the backup
    os.replace(path, backup)
    shutil.rmtree(path + ".staging", ignore_errors=True)
    apply_cdc_parquet(spark, path, feed, keys="k")
    got2 = sorted((r["k"], r["v"]) for r in spark.read.parquet(path).collect())
    assert got2 == [(1, "A"), (2, "B"), (3, "C")]
