"""Idempotent partition backfill (`pipeline.backfill`)."""

import os

from pyspark.sql import functions as F

from beehive_spark.pipeline.backfill import backfill_partitions
from beehive_spark.queries import load


def _daily(df):
    return df.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )


def test_backfill_processes_only_missing_and_is_idempotent(spark, sf_dir, tmp_path):
    out = str(tmp_path / "daily")
    e = load(spark, sf_dir, "events").withColumn(
        "day", F.to_date(F.date_trunc("day", "ts"))
    )
    days = sorted(r[0] for r in e.select("day").distinct().collect())
    assert len(days) >= 3

    # first run: seed all but the last two days
    seed = e.filter(F.col("day") < days[-2])
    r1 = backfill_partitions(spark, seed, _daily, out, "day")
    assert len(r1["missing"]) == len(days) - 2

    # second run over the FULL source: only the two new days process
    r2 = backfill_partitions(spark, e, _daily, out, "day")
    assert r2["missing"] == [str(d) for d in days[-2:]]

    # third run: nothing missing, nothing written
    r3 = backfill_partitions(spark, e, _daily, out, "day")
    assert r3 == {"missing": [], "written": 0}

    # final content equals a from-scratch full computation
    got = sorted(map(tuple, spark.read.parquet(out)
                 .select("day", "event_type", "n", "total").collect()))
    want = sorted(map(tuple, _daily(e)
                  .select("day", "event_type", "n", "total").collect()))
    assert got == want


def test_backfill_retry_replaces_interrupted_partition(spark, sf_dir, tmp_path):
    out = str(tmp_path / "daily")
    e = load(spark, sf_dir, "events").withColumn(
        "day", F.to_date(F.date_trunc("day", "ts"))
    )
    backfill_partitions(spark, e, _daily, out, "day")
    days = sorted(r[0] for r in e.select("day").distinct().collect())
    # simulate a half-written partition: clobber one day's directory
    victim = os.path.join(out, f"day={days[0]}")
    for f in os.listdir(victim):
        os.remove(os.path.join(victim, f))
    os.rmdir(victim)
    r = backfill_partitions(spark, e, _daily, out, "day")
    assert r["missing"] == [str(days[0])]
    got = sorted(map(tuple, spark.read.parquet(out)
                 .select("day", "event_type", "n", "total").collect()))
    want = sorted(map(tuple, _daily(e)
                  .select("day", "event_type", "n", "total").collect()))
    assert got == want
