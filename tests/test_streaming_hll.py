"""Streaming HLL sketch maintainer: streamed union must estimate
exactly what the one-shot batch sketch estimates (the register state
is a deterministic function of the value set), replay is a no-op, and
the commit-vs-checkpoint crash window repairs."""

import os
import shutil

from pyspark.sql import functions as F

from beehive_spark.queries import load
from beehive_spark.streaming.materialize import run_hll_stream

SF = "/root/testdata/sf0.001"


def _slices(spark, out_dir, n_files=3):
    e = load(spark, SF, "events")
    n = e.agg(F.max("event_id")).collect()[0][0] + 1
    import time

    paths = []
    for i in range(n_files):
        lo, hi = i * n // n_files, (i + 1) * n // n_files
        p = os.path.join(out_dir, f"slice_{i}")
        e.filter(
            (F.col("event_id") >= lo) & (F.col("event_id") < hi)
        ).coalesce(1).write.parquet(p)
        paths.append(p)
    base = time.time() - 3600
    for i, p in enumerate(paths):
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (base + i, base + i))


def _run(spark, src, table, ck):
    e = load(spark, SF, "events")
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    run_hll_stream(spark, stream, table, ck)


def _estimates(spark, table):
    return {
        r["event_type"]: (r["est"], r["n_events"])
        for r in spark.read.parquet(table)
        .select(
            "event_type",
            F.hll_sketch_estimate("sk").cast("long").alias("est"),
            "n_events",
        )
        .collect()
    }


def test_hll_stream_matches_batch_and_replays_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    _slices(spark, src)
    table = str(tmp_path / "hll")
    spark.createDataFrame(
        [], "event_type string, sk binary, n_events long"
    ).write.parquet(table)

    _run(spark, src, table, str(tmp_path / "ck"))

    e = load(spark, SF, "events")
    want = {
        r["event_type"]: (r["est"], r["n"])
        for r in e.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
            .cast("long")
            .alias("est"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .collect()
    }
    got = _estimates(spark, table)
    assert got == want  # union register state == one-shot state

    # accuracy floor: the estimate is within 5% of exact (the
    # test_sketches pin, applied to the streamed state)
    exact = {
        r["event_type"]: r["x"]
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("x"))
        .collect()
    }
    for k, (est, _) in got.items():
        assert abs(est - exact[k]) <= max(1, int(0.05 * exact[k]))

    # replay under a fresh checkpoint: recorded ids make it a no-op
    _run(spark, src, table, str(tmp_path / "ck2"))
    assert _estimates(spark, table) == want


def test_hll_stream_survives_commit_vs_checkpoint_crash(spark, tmp_path):
    """Single-artifact crash window (the ohlc/mg pattern): table swap
    landed, last checkpoint commit marker lost; the replayed batch
    must skip (union idempotence makes even a double-fold harmless
    for the sketch, but n_events would inflate — the guard protects
    the count)."""
    src = str(tmp_path / "src")
    _slices(spark, src, n_files=2)
    table = str(tmp_path / "hll")
    spark.createDataFrame(
        [], "event_type string, sk binary, n_events long"
    ).write.parquet(table)
    ck = str(tmp_path / "ck")
    _run(spark, src, table, ck)
    want = _estimates(spark, table)

    ck2 = str(tmp_path / "ck_after_crash")
    shutil.copytree(ck, ck2)
    commits = os.path.join(ck2, "hll", "commits")
    last = max((f for f in os.listdir(commits) if f.isdigit()), key=int)
    os.remove(os.path.join(commits, last))
    os.remove(os.path.join(commits, f".{last}.crc"))

    _run(spark, src, table, ck2)
    assert _estimates(spark, table) == want
