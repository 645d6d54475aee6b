"""Streaming Holt forecaster must be bit-identical to the batch fold
(queries/core.py::events_holt) on a time-ordered source."""

import os
import time

from pyspark.sql import functions as F

from beehive_spark.sources.readers import normalize_ts
from beehive_spark.streaming import holt_forecast_stream, run_stream_to_memory


def _time_split_source(spark, sf_dir, out_dir, n_files=3):
    """Write the events table as n contiguous event-time slices, one
    file each, with ascending mtimes so the file stream replays them
    in event-time order (equal timestamps never straddle files)."""
    raw = normalize_ts(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    )
    bounds = list(
        raw.select(
            F.percentile_approx(
                "ts", [i / n_files for i in range(1, n_files)], 10000
            )
        ).first()[0]
    )
    lo = None
    paths = []
    for i, hi in enumerate(list(bounds) + [None]):
        part = raw
        if lo is not None:
            part = part.filter(F.col("ts") > F.lit(lo))
        if hi is not None:
            part = part.filter(F.col("ts") <= F.lit(hi))
        p = os.path.join(out_dir, f"slice_{i}")
        part.coalesce(1).write.parquet(p)
        paths.append(p)
        lo = hi
    # guarantee strictly ascending mtimes for the file-stream ordering
    base = time.time() - 3600
    for i, p in enumerate(paths):
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (base + i, base + i))
    return raw


def test_holt_stream_final_state_matches_batch_fold(spark, sf_dir, tmp_path):
    src = str(tmp_path / "holt_src")
    raw = _time_split_source(spark, sf_dir, src)

    stream = normalize_ts(
        spark.readStream.schema(
            spark.read.option("recursiveFileLookup", "true").parquet(src).schema
        )
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    run_stream_to_memory(
        holt_forecast_stream(stream), "holt_stream", str(tmp_path), "append"
    )
    rows = spark.sql("SELECT * FROM holt_stream").collect()

    # final state per user = the row with the largest n_points
    final = {}
    batches_seen = {}
    for r in rows:
        u = r["user_id"]
        batches_seen[u] = batches_seen.get(u, 0) + (r["batch_points"] > 0)
        if u not in final or r["n_points"] > final[u]["n_points"]:
            final[u] = r

    from beehive_spark.queries.core import events_holt

    want = {
        r["user_id"]: (
            r["n_points"],
            r["level_milli"],
            r["trend_milli"],
            r["forecast_milli"],
        )
        for r in events_holt(spark, sf_dir).collect()
    }
    got = {
        u: (
            r["n_points"],
            r["level_milli"],
            r["trend_milli"],
            r["forecast_milli"],
        )
        for u, r in final.items()
    }
    assert got == want
    # the state must genuinely have crossed micro-batches
    multi = sum(1 for v in batches_seen.values() if v > 1)
    assert multi > len(batches_seen) * 0.5
