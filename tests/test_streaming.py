"""Streaming plans must agree with their batch twins (availableNow)."""

from pyspark.sql import functions as F

from beehive_spark.queries import load
from beehive_spark.streaming import (
    read_event_stream,
    run_stream_to_memory,
    sessionized_events,
    windowed_event_counts,
)


def test_windowed_counts_match_batch(spark, sf_dir, tmp_path):
    stream = read_event_stream(spark, sf_dir)
    run_stream_to_memory(
        windowed_event_counts(stream), "win_counts", str(tmp_path), "complete"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("ws"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .select(F.date_format("ws", "yyyy-MM-dd HH:mm:ss").alias("ws"),
                "event_type", "n", "s")
    )
    want = {(r["ws"], r["event_type"]): (r["n"], r["s"]) for r in batch.collect()}
    assert got == want and len(got) > 10


def test_sessionize_stream_matches_batch_session_count(spark, sf_dir, tmp_path):
    stream = read_event_stream(spark, sf_dir)
    run_stream_to_memory(
        sessionized_events(stream), "sessions", str(tmp_path), "complete"
    )
    got = spark.sql("SELECT * FROM sessions")
    from beehive_spark.queries.llm import events_sessionize

    batch = events_sessionize(spark, sf_dir)
    # identical session starts & event counts per user
    g = sorted((r["user_id"], r["session_start"], r["n_events"]) for r in got.collect())
    b = sorted((r["user_id"], r["session_start"], r["n_events"]) for r in batch.collect())
    assert g == b and len(g) > 100
