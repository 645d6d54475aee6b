"""Streaming plans must agree with their batch twins (availableNow)."""

import os

import pytest

pytestmark = pytest.mark.slow  # file-stream e2e (maintainer math covered fast by the per-operator streaming suites)
from pyspark.sql import functions as F

from beehive_spark.queries import load
from beehive_spark.streaming import (
    read_event_stream,
    run_stream_to_memory,
    sessionized_events,
    windowed_event_counts,
)
from beehive_spark.sources.readers import normalize_ts
from beehive_spark.streaming.events import (
    dedup_event_stream,
    running_user_stats,
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


def test_running_user_stats_accumulates_across_microbatches(spark, sf_dir, tmp_path):
    """applyInPandasWithState must carry state across micro-batches:
    3 input files + maxFilesPerTrigger=1 -> 3 batches; the final
    cum_events per user must equal the batch-mode count even though
    each batch only saw a slice."""
    src_dir = str(tmp_path / "events_src")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    raw.repartition(3).write.parquet(src_dir)

    stream = normalize_ts(
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    run_stream_to_memory(
        running_user_stats(stream), "user_stats", str(tmp_path), "append"
    )
    rows = spark.sql("SELECT * FROM user_stats").collect()

    # per user: emitted batch deltas must sum to the final running total
    per_user: dict[int, dict[str, float]] = {}
    for r in rows:
        u = per_user.setdefault(r["user_id"], {"delta_sum": 0, "cum_max": 0, "rows": 0})
        u["delta_sum"] += r["batch_events"]
        u["cum_max"] = max(u["cum_max"], r["cum_events"])
        u["rows"] += 1

    want = {
        r["user_id"]: r["n"]
        for r in raw.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(per_user) == set(want)
    for uid, stats in per_user.items():
        assert stats["delta_sum"] == want[uid]
        assert stats["cum_max"] == want[uid]
    # state must actually have crossed batches for most users
    multi_batch_users = sum(1 for s in per_user.values() if s["rows"] > 1)
    assert multi_batch_users > len(per_user) * 0.5


def test_stream_dedup_drops_redelivered_events(spark, sf_dir, tmp_path):
    """An at-least-once source re-delivering the same file content must
    come out exactly-once per event_id."""
    src_dir = str(tmp_path / "dup_src")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # two copies of the same events = simulated redelivery
    raw.coalesce(1).write.mode("overwrite").parquet(src_dir)
    raw.coalesce(1).write.mode("append").parquet(src_dir)

    stream = normalize_ts(spark.readStream.schema(raw.schema).parquet(src_dir))
    run_stream_to_memory(
        dedup_event_stream(stream), "dedup_stream", str(tmp_path), "append"
    )
    got = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM dedup_stream").collect()[0]
    assert got["n"] == raw.count()          # doubled input, deduped output
    assert got["d"] == got["n"]             # one row per event_id


def test_enrich_stream_matches_batch_join(spark, sf_dir, tmp_path):
    """Stream-static broadcast enrichment must agree with the batch
    join: same row count, same per-segment distribution."""
    from beehive_spark.streaming import enrich_stream

    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stream = read_event_stream(spark, sf_dir)
    enriched = enrich_stream(stream, dim).groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    run_stream_to_memory(enriched, "enriched_counts", str(tmp_path), "complete")
    got = {
        r["c_mktsegment"]: r["n"]
        for r in spark.sql("SELECT * FROM enriched_counts").collect()
    }
    batch = (
        load(spark, sf_dir, "events")
        .join(
            dim.withColumnRenamed("c_custkey", "user_id"), "user_id", "left"
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {r["c_mktsegment"]: r["n"] for r in batch.collect()}
    assert got == want and sum(got.values()) == load(spark, sf_dir, "events").count()


def test_topk_foreachbatch_matches_batch_topk(spark, sf_dir, tmp_path):
    """The foreachBatch-materialized top-k must equal the batch top-k
    after the stream drains (availableNow processes everything)."""
    from beehive_spark.streaming import run_topk_foreachbatch, top_event_types

    out = str(tmp_path / "topk_out")
    stream = read_event_stream(spark, sf_dir)
    run_topk_foreachbatch(top_event_types(stream), out, str(tmp_path), k=3)
    got = sorted(
        (r["event_type"], r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    )
    batch = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .orderBy(F.col("n").desc(), "event_type")
        .limit(3)
    )
    want = sorted((r["event_type"], r["n"], r["s"]) for r in batch.collect())
    assert got == want and len(got) == 3


def test_correlate_streams_matches_batch_interval_join(spark, sf_dir, tmp_path):
    """The watermarked stream-stream join must produce exactly the
    batch interval-join pairs once both streams drain."""
    from beehive_spark.streaming import correlate_streams

    stream = read_event_stream(spark, sf_dir)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    joined = correlate_streams(clicks, purchases)
    run_stream_to_memory(joined, "correlated", str(tmp_path), "append")
    got = sorted(
        (r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM correlated").collect()
    )
    ev = load(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    want = sorted(
        (r["click_id"], r["purchase_id"])
        for r in c.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 minutes")),
        ).collect()
    )
    assert got == want and len(got) > 0


def test_transform_with_state_extremes_accumulate(spark, sf_dir, tmp_path):
    """transformWithStateInPandas must carry typed state across
    micro-batches: split input into 3 files, 1 per trigger; the final
    per-user extremes must equal the batch-mode min/max/count.

    Spark's StatefulProcessor Python worker speaks protobuf to the JVM;
    the container lacks the protobuf runtime, so this skips there and
    runs wherever `google.protobuf` is installed (the operator itself
    is plain public API).  The applyInPandasWithState twin
    (test_running_user_stats_accumulates_across_microbatches) covers
    the cross-batch-state behavior in this environment."""
    import os

    pytest.importorskip("google.protobuf")

    from beehive_spark.streaming import run_stream_to_memory
    from beehive_spark.streaming.events import (
        event_schema,
        user_value_extremes,
    )

    src = str(tmp_path / "ev_parts")
    batch = load(spark, sf_dir, "events")
    batch.repartition(3).write.mode("overwrite").parquet(src)
    schema = event_schema(spark, os.path.join(src))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    from beehive_spark.sources.readers import normalize_ts

    run_stream_to_memory(
        user_value_extremes(normalize_ts(stream)),
        "extremes",
        str(tmp_path),
        "update",
    )
    # update mode re-emits per batch; keep the final (max n_events) row
    rows = spark.sql(
        """SELECT user_id, min_value, max_value, n_events FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY n_events DESC) rn
             FROM extremes) WHERE rn = 1"""
    ).collect()
    got = {
        r["user_id"]: (r["min_value"], r["max_value"], r["n_events"]) for r in rows
    }
    want = {
        r["user_id"]: (r["mn"], r["mx"], r["n"])
        for r in batch.groupBy("user_id")
        .agg(
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert got == want and len(got) > 50


def test_anomaly_stream_matches_batch(spark, sf_dir, tmp_path):
    from beehive_spark.streaming.events import (
        hourly_type_counts,
        run_anomaly_foreachbatch,
    )
    from beehive_spark.queries.core import events_anomaly

    stream = read_event_stream(spark, sf_dir)
    out = str(tmp_path / "anomalies")
    run_anomaly_foreachbatch(
        hourly_type_counts(stream), out, str(tmp_path / "ckpt"), threshold=1.0
    )
    got = sorted(
        (r["event_type"], r["hour"], r["cnt"], r["z"])
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["event_type"], r["hour"], r["cnt"], r["z"])
        for r in events_anomaly(spark, sf_dir).collect()
    )
    # batch query uses threshold 2.0; rerun the shared scorer at the
    # test threshold for an exact-set comparison
    from beehive_spark.queries.core import score_hourly_anomalies
    from beehive_spark.queries import load

    hourly = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    want_t1 = sorted(
        (r["event_type"], r["hour"], r["cnt"], r["z"])
        for r in score_hourly_anomalies(hourly, threshold=1.0).collect()
    )
    assert got == want_t1 and len(got) > 0
    # and the batch query's stricter flags are a subset of the stream's
    assert set(want) <= set(got)


def test_cdc_apply_stream_converges_to_expected_table(spark, tmp_path):
    from beehive_spark.streaming.events import run_cdc_apply_stream

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    schema = "change_type string, k bigint, v double, seq bigint"
    # file 1: initial inserts
    spark.createDataFrame(
        [("insert", 1, 10.0, 1), ("insert", 2, 20.0, 2), ("insert", 3, 30.0, 3)],
        schema,
    ).coalesce(1).write.parquet(str(feed_dir / "f1.parquet"))
    # file 2: update k2, delete k3, insert k5 then delete it (the
    # within-batch conflict: compaction must keep only the later delete)
    spark.createDataFrame(
        [
            ("update", 2, 21.0, 4),
            ("delete", 3, None, 5),
            ("insert", 5, 50.0, 6),
            ("delete", 5, None, 7),
        ],
        schema,
    ).coalesce(1).write.parquet(str(feed_dir / "f2.parquet"))

    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed_dir) + "/*/")
    )
    table = str(tmp_path / "table")
    run_cdc_apply_stream(
        spark, changes, table, str(tmp_path / "ckpt"), keys="k"
    )
    got = sorted((r["k"], r["v"]) for r in spark.read.parquet(table).collect())
    assert got == [(1, 10.0), (2, 21.0)]


def test_ivm_agg_stream_maintains_aggregate(spark, tmp_path):
    """Streaming materialized-view maintenance: the aggregate parquet
    table must converge to the from-scratch aggregate of the final
    row-level state, across multi-change-per-key micro-batches (the
    telescoping-sum property of retractions), and a replayed batch id
    must be a no-op."""
    from beehive_spark.streaming.materialize import run_ivm_agg_stream

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    schema = (
        "change_type string, g_old string, g_new string, "
        "v_old bigint, v_new bigint"
    )
    # batch 1: inserts into groups a/b
    spark.createDataFrame(
        [
            ("insert", None, "a", None, 10),
            ("insert", None, "a", None, 20),
            ("insert", None, "b", None, 30),
        ],
        schema,
    ).coalesce(1).write.parquet(str(feed_dir / "f1.parquet"))
    # batch 2: same-key churn (update twice), a group move, a delete
    spark.createDataFrame(
        [
            ("update", "a", "a", 10, 11),   # then immediately...
            ("update", "a", "a", 11, 15),   # ...updated again: net 10->15
            ("update", "b", "a", 30, 30),   # moves b -> a
            ("delete", "a", None, 20, None),
        ],
        schema,
    ).coalesce(1).write.parquet(str(feed_dir / "f2.parquet"))

    table = str(tmp_path / "agg")
    # initial (empty) aggregate, written by the "batch backfill"
    spark.createDataFrame(
        [], "g string, n_rows bigint, sv bigint, sv_nn bigint"
    ).write.parquet(
        table
    )
    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed_dir) + "/*/")
    )
    run_ivm_agg_stream(
        spark, changes, table, str(tmp_path / "ckpt"), keys=["g"], sums={"sv": "v"}
    )
    got = sorted(tuple(r) for r in spark.read.parquet(table).collect())
    # final rows: a={15, 30}, b={} -> a:(n_rows=2, sv=45, sv_nn=2)
    assert got == [("a", 2, 45, 2)]

    # replay: a fresh checkpoint re-delivers everything as batch 0;
    # the recorded batch id must make it a no-op
    changes2 = spark.readStream.schema(schema).parquet(str(feed_dir) + "/*/")
    run_ivm_agg_stream(
        spark, changes2, table, str(tmp_path / "ckpt2"), keys=["g"], sums={"sv": "v"}
    )
    again = sorted(tuple(r) for r in spark.read.parquet(table).collect())
    assert again == got


def test_cdc_materialize_stream_rows_sums_and_max(spark, tmp_path):
    """One feed -> row table AND aggregate (sum + evict-rescanned max)
    both converge to the from-scratch answers, across micro-batches
    that delete the current maximum."""
    from pyspark.sql import functions as F

    from beehive_spark.streaming.materialize import run_cdc_materialize_stream

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    schema = (
        "change_type string, seq bigint, k_old bigint, k_new bigint, "
        "g_old string, g_new string, v_old double, v_new double"
    )
    spark.createDataFrame(
        [
            ("insert", 1, None, 1, None, "a", None, 10.0),
            ("insert", 2, None, 2, None, "a", None, 30.0),
            ("insert", 3, None, 3, None, "b", None, 7.0),
        ],
        schema,
    ).coalesce(1).write.parquet(str(feed_dir / "f1.parquet"))
    spark.createDataFrame(
        [
            ("delete", 4, 2, None, "a", None, 30.0, None),  # evicts a's max
            ("update", 5, 3, 3, "b", "b", 7.0, 9.0),
        ],
        schema,
    ).coalesce(1).write.parquet(str(feed_dir / "f2.parquet"))

    row_path, agg_path = str(tmp_path / "rows"), str(tmp_path / "agg")
    spark.createDataFrame(
        [], "g string, n_rows bigint, sv double, sv_nn bigint, mx double"
    ).write.parquet(agg_path)
    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed_dir) + "/*/")
    )
    run_cdc_materialize_stream(
        spark,
        changes,
        row_path,
        agg_path,
        row_keys=["k"],
        agg_keys=["g"],
        sums={"sv": "v"},
        minmax={"mx": "v"},
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    rows = sorted(
        (r["k"], r["g"], r["v"]) for r in spark.read.parquet(row_path).collect()
    )
    assert rows == [(1, "a", 10.0), (3, "b", 9.0)]
    agg = {
        r["g"]: (r["n_rows"], r["sv"], r["mx"])
        for r in spark.read.parquet(agg_path).collect()
    }
    assert agg == {"a": (1, 10.0, 10.0), "b": (1, 9.0, 9.0)}


def test_ivm_commit_is_atomic_and_recovers_mid_swap(spark, tmp_path):
    """The replay marker must commit WITH the data (round-2 ADVICE: a
    crash between the directory swap and a trailing sidecar write let a
    replayed batch fold its retractions twice).  The marker now rides
    inside the staged directory, so (a) after a normal run it sits
    inside the table and Spark's reader ignores it, and (b) a swap
    interrupted between the two renames — no live table, complete
    staging — rolls FORWARD, with the batch id intact so the replay is
    skipped."""
    import json
    import os

    from beehive_spark.streaming.materialize import (
        _commit_swap,
        _last_applied,
        run_ivm_agg_stream,
    )

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    schema = (
        "change_type string, g_old string, g_new string, "
        "v_old bigint, v_new bigint"
    )
    spark.createDataFrame(
        [("insert", None, "a", None, 10), ("insert", None, "b", None, 30)],
        schema,
    ).coalesce(1).write.parquet(str(feed_dir / "f1.parquet"))
    table = str(tmp_path / "agg")
    spark.createDataFrame(
        [], "g string, n_rows bigint, sv bigint, sv_nn bigint"
    ).write.parquet(table)
    changes = spark.readStream.schema(schema).parquet(str(feed_dir) + "/*/")
    run_ivm_agg_stream(
        spark, changes, table, str(tmp_path / "ck"), keys=["g"], sums={"sv": "v"}
    )
    # (a) marker lives inside the table dir, reader ignores it
    assert os.path.exists(os.path.join(table, "_ivm_meta.json"))
    assert not os.path.exists(table + ".ivm_meta.json")
    assert _last_applied(table) == 0
    base = sorted(tuple(r) for r in spark.read.parquet(table).collect())
    assert base == [("a", 1, 10, 1), ("b", 1, 30, 1)]

    # (b) simulate the mid-swap crash: commit a new version but stop
    # after the first rename (table moved away, staging not yet
    # promoted) — exactly the window between materialize's two
    # os.replace calls
    fresh = spark.createDataFrame(
        [("a", 2, 45, 2)], "g string, n_rows bigint, sv bigint, sv_nn bigint"
    )
    staging = table + ".staging"
    fresh.write.parquet(staging)
    with open(os.path.join(staging, "_ivm_meta.json"), "w") as f:
        json.dump({"batch_id": 1}, f)
    os.replace(table, table + ".old")
    assert not os.path.exists(table)
    # recovery (first touch of the table) rolls the swap forward
    assert _last_applied(table) == 1
    got = sorted(tuple(r) for r in spark.read.parquet(table).collect())
    assert got == [("a", 2, 45, 2)]

    # a replay of batch <= 1 is now a no-op even though the "crash"
    # happened mid-swap
    changes2 = spark.readStream.schema(schema).parquet(str(feed_dir) + "/*/")
    run_ivm_agg_stream(
        spark, changes2, table, str(tmp_path / "ck2"), keys=["g"], sums={"sv": "v"}
    )
    assert sorted(tuple(r) for r in spark.read.parquet(table).collect()) == got
    # exercise _commit_swap directly once more on the recovered table
    _commit_swap(fresh, table, 2)
    assert _last_applied(table) == 2


def test_ivm_join_agg_stream_maintains_join_view(spark, tmp_path):
    """Streaming aggregate-over-a-join maintenance: fact updates,
    fact deletes, a DIMENSION group move (which re-buckets every
    joined fact row), and a same-batch fact+dimension change (the
    dA x dB cross term) must all converge the view to the
    from-scratch aggregate of the post-change join; a replayed feed
    must be a no-op."""
    from beehive_spark.streaming.materialize import run_ivm_join_agg_stream

    a_path, b_path = str(tmp_path / "orders"), str(tmp_path / "cust")
    view = str(tmp_path / "view")
    spark.createDataFrame(
        [(1, 10, 100), (2, 10, 200), (3, 20, 300)], "k long, ck long, v long"
    ).write.parquet(a_path)
    spark.createDataFrame([(10, "x"), (20, "y")], "ck long, seg string").write.parquet(
        b_path
    )
    # initial view = build_agg shape over the join
    spark.createDataFrame(
        [("x", 2, 300, 2), ("y", 1, 300, 1)],
        "seg string, n_rows bigint, sv bigint, sv_nn bigint",
    ).write.parquet(view)

    schema = (
        "change_type string, seq bigint, src_table string, "
        "k_old bigint, k_new bigint, ck_old bigint, ck_new bigint, "
        "v_old bigint, v_new bigint, seg_old string, seg_new string"
    )
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    # batch 1: fact update + fact insert
    spark.createDataFrame(
        [
            ("update", 1, "a", 1, 1, 10, 10, 100, 150, None, None),
            ("insert", 2, "a", None, 4, None, 20, None, 50, None, None),
        ],
        schema,
    ).coalesce(1).write.parquet(str(feed_dir / "f1.parquet"))
    # batch 2: dimension move ck=10 x->z, fact delete, AND a fact
    # update on a ck=10 order in the same batch (dA x dB cross term)
    spark.createDataFrame(
        [
            ("update", 3, "b", None, None, 10, 10, None, None, "x", "z"),
            ("delete", 4, "a", 3, None, 20, None, 300, None, None, None),
            ("update", 5, "a", 2, 2, 10, 10, 200, 250, None, None),
        ],
        schema,
    ).coalesce(1).write.parquet(str(feed_dir / "f2.parquet"))

    def run(ck_dir, src=None):
        changes = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(feed_dir) + "/*/")
            if src is None
            else src
        )
        run_ivm_join_agg_stream(
            spark, changes, a_path, b_path, view, str(tmp_path / ck_dir),
            join_key="ck", a_keys=["k"], a_values=["v"], b_values=["seg"],
            agg_keys=["seg"], sums={"sv": "v"},
        )

    run("ck1")
    got = {
        r["seg"]: (r["n_rows"], r["sv"]) for r in spark.read.parquet(view).collect()
    }
    # post-state: A={1:(10,150), 2:(10,250), 4:(20,50)}, B={10:z, 20:y}
    assert got == {"z": (2, 400), "y": (1, 50)}
    rows_a = sorted(tuple(r) for r in spark.read.parquet(a_path).collect())
    rows_b = sorted(tuple(r) for r in spark.read.parquet(b_path).collect())
    assert rows_a == [(1, 10, 150), (2, 10, 250), (4, 20, 50)]
    assert rows_b == [(10, "z"), (20, "y")]
    # replay from a fresh checkpoint: recorded batch ids make it a no-op
    run("ck2", src=spark.readStream.schema(schema).parquet(str(feed_dir) + "/*/"))
    again = {
        r["seg"]: (r["n_rows"], r["sv"]) for r in spark.read.parquet(view).collect()
    }
    assert again == got


def test_stage_and_promote_helpers_roundtrip(spark, tmp_path):
    """A staging with meta is complete and promotable; one without
    meta (crash before fsync) reads as absent."""
    import os

    from beehive_spark.streaming.materialize import (
        _meta_file,
        _promote,
        _stage,
        _staged_batch_id,
    )

    table = str(tmp_path / "t")
    spark.createDataFrame([(1,)], "x long").write.parquet(table)
    fresh = spark.createDataFrame([(2,)], "x long")
    staging = _stage(fresh, table, batch_id=7)
    assert _staged_batch_id(table) == 7
    # incomplete staging (no meta) must read as -1
    os.remove(_meta_file(staging))
    assert _staged_batch_id(table) == -1
    staging = _stage(fresh, table, batch_id=8)
    _promote(staging, table)
    assert [r["x"] for r in spark.read.parquet(table).collect()] == [2]
    assert not os.path.exists(staging)


def test_ivm_distinct_stream_maintains_view_and_aux(spark, tmp_path):
    """Streaming COUNT(DISTINCT) maintenance: the view and its
    multiplicity aux table must converge to a from-scratch recompute of
    the final row state across micro-batches that exercise the
    zero-crossing cases (duplicate insert = view no-op, partial delete
    = view no-op, last-copy delete = decrement, group move), and a
    replayed feed must be a no-op."""
    from beehive_spark.operators.ivm import build_multiplicity
    from beehive_spark.streaming.materialize import run_ivm_distinct_stream

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    schema = (
        "change_type string, g_old string, g_new string, "
        "v_old bigint, v_new bigint"
    )
    # batch 1: a={10 x2, 20}, b={30} (the duplicate 10 is the
    # multiplicity case)
    spark.createDataFrame(
        [
            ("insert", None, "a", None, 10),
            ("insert", None, "a", None, 10),
            ("insert", None, "a", None, 20),
            ("insert", None, "b", None, 30),
        ],
        schema,
    ).coalesce(1).write.parquet(str(feed_dir / "f1.parquet"))
    # batch 2: partial delete (a keeps one 10), group move 30 b->a,
    # last-copy delete of 20
    spark.createDataFrame(
        [
            ("delete", "a", None, 10, None),
            ("update", "b", "a", 30, 30),
            ("delete", "a", None, 20, None),
        ],
        schema,
    ).coalesce(1).write.parquet(str(feed_dir / "f2.parquet"))

    mult_path = str(tmp_path / "mult")
    counts_path = str(tmp_path / "counts")
    empty = spark.createDataFrame([], "g string, v bigint")
    build_multiplicity(empty, ["g"], "v").write.parquet(mult_path)
    spark.createDataFrame([], "g string, n_distinct bigint").write.parquet(
        counts_path
    )
    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed_dir) + "/*/")
    )
    run_ivm_distinct_stream(
        spark, changes, mult_path, counts_path, str(tmp_path / "ck"),
        keys=["g"], value_col="v",
    )
    # final rows: a={10, 30}, b={} -> view a:2; aux a:(10,1),(30,1)
    view = sorted(tuple(r) for r in spark.read.parquet(counts_path).collect())
    aux = sorted(tuple(r) for r in spark.read.parquet(mult_path).collect())
    assert view == [("a", 2)]
    assert aux == [("a", 10, 1), ("a", 30, 1)]

    # replay under a fresh checkpoint: recorded batch ids make it a no-op
    changes2 = spark.readStream.schema(schema).parquet(str(feed_dir) + "/*/")
    run_ivm_distinct_stream(
        spark, changes2, mult_path, counts_path, str(tmp_path / "ck2"),
        keys=["g"], value_col="v",
    )
    assert sorted(
        tuple(r) for r in spark.read.parquet(counts_path).collect()
    ) == view
    assert sorted(
        tuple(r) for r in spark.read.parquet(mult_path).collect()
    ) == aux


def test_ivm_distinct_stream_repairs_counts_behind_mult(spark, tmp_path):
    """The only crash window (mult at N, counts at N-1) must repair by
    rebuilding the view from the aux table on replay."""
    from beehive_spark.operators.ivm import build_multiplicity
    from beehive_spark.streaming.materialize import (
        _commit_swap,
        run_ivm_distinct_stream,
    )

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    schema = (
        "change_type string, g_old string, g_new string, "
        "v_old bigint, v_new bigint"
    )
    spark.createDataFrame(
        [("insert", None, "a", None, 1), ("insert", None, "b", None, 2)],
        schema,
    ).coalesce(1).write.parquet(str(feed_dir / "f1.parquet"))

    mult_path = str(tmp_path / "mult")
    counts_path = str(tmp_path / "counts")
    # simulate the crash: mult already holds batch 0's fold...
    post = spark.createDataFrame([("a", 1, 1), ("b", 2, 1)], "g string, v bigint, m bigint")
    post.write.parquet(mult_path)
    _commit_swap(spark.read.parquet(mult_path), mult_path, 0)
    # ...while the view is still the (stale, unstamped) backfill
    spark.createDataFrame(
        [("stale", 99)], "g string, n_distinct bigint"
    ).write.parquet(counts_path)

    changes = spark.readStream.schema(schema).parquet(str(feed_dir) + "/*/")
    run_ivm_distinct_stream(
        spark, changes, mult_path, counts_path, str(tmp_path / "ck"),
        keys=["g"], value_col="v",
    )
    assert sorted(
        tuple(r) for r in spark.read.parquet(counts_path).collect()
    ) == [("a", 1), ("b", 1)]
    # the aux table was not double-folded
    assert sorted(
        tuple(r) for r in spark.read.parquet(mult_path).collect()
    ) == [("a", 1, 1), ("b", 2, 1)]


def test_ivm_checksum_stream_converges_and_replays_noop(spark, tmp_path):
    """Streaming fingerprint maintenance: after micro-batches with
    inserts (incl. an exact clone — the XOR parity case), an update,
    and a delete, the table must equal build_checksum recomputed from
    the surviving multiset; a replayed feed must be a no-op."""
    from beehive_spark.operators.ivm import build_checksum
    from beehive_spark.streaming.materialize import run_ivm_checksum_stream

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    schema = "rh bigint, _sign int"
    h = [11, 22, 33, 44, 55]
    # batch 1: five inserts plus an exact clone of h[0]
    spark.createDataFrame(
        [(x, 1) for x in h] + [(h[0], 1)], schema
    ).coalesce(1).write.parquet(str(feed_dir / "f1.parquet"))
    # batch 2: delete the clone (XOR parity round-trip), update 22->99
    spark.createDataFrame(
        [(h[0], -1), (22, -1), (99, 1)], schema
    ).coalesce(1).write.parquet(str(feed_dir / "f2.parquet"))

    table = str(tmp_path / "cksum")
    spark.createDataFrame(
        [], "bucket int, n_rows bigint, xor_fp bigint, sum_fp bigint"
    ).write.parquet(table)
    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed_dir) + "/*/")
    )
    run_ivm_checksum_stream(
        spark, changes, table, str(tmp_path / "ckpt"), n_buckets=8
    )
    final = [11, 33, 44, 55, 99]
    want = sorted(
        tuple(r)
        for r in build_checksum(
            spark.createDataFrame([(x,) for x in final], "rh bigint"),
            n_buckets=8,
        ).collect()
    )
    got = sorted(tuple(r) for r in spark.read.parquet(table).collect())
    assert got == want

    changes2 = spark.readStream.schema(schema).parquet(str(feed_dir) + "/*/")
    run_ivm_checksum_stream(
        spark, changes2, table, str(tmp_path / "ckpt2"), n_buckets=8
    )
    assert sorted(tuple(r) for r in spark.read.parquet(table).collect()) == want


def test_ohlc_stream_merges_bars_and_handles_late_data(spark, tmp_path):
    """Streaming OHLC: micro-batches that split a bucket's events —
    including a LATE batch carrying the bucket's true earliest event —
    must converge to the batch OHLC of the union; replay is a no-op."""
    import datetime as dt

    from beehive_spark.streaming.materialize import run_ohlc_stream

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    schema = "event_type string, ts timestamp, event_id bigint, value double"
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(minute, eid, val, typ="click"):
        return (typ, t0.replace(minute=minute), eid, val)

    # batch 1: mid-hour events
    spark.createDataFrame(
        [ev(30, 3, 5.0), ev(40, 4, 9.0), ev(50, 5, 2.0)], schema
    ).coalesce(1).write.parquet(str(feed_dir / "f1.parquet"))
    # batch 2: LATE data — earlier ts than anything in batch 1 (new
    # open), plus a later close and a second bucket
    spark.createDataFrame(
        [ev(10, 1, 7.0), ev(55, 9, 4.0), ev(5, 2, 1.0, typ="view")], schema
    ).coalesce(1).write.parquet(str(feed_dir / "f2.parquet"))

    table = str(tmp_path / "ohlc")
    spark.createDataFrame(
        [],
        "event_type string, bucket timestamp, open_ts timestamp, "
        "open_id bigint, open double, close_ts timestamp, close_id bigint, "
        "close double, high double, low double, n_events bigint",
    ).write.parquet(table)
    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed_dir) + "/*/")
    )
    run_ohlc_stream(spark, changes, table, str(tmp_path / "ckpt"))
    got = {
        (r["event_type"], r["bucket"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"],
        )
        for r in spark.read.parquet(table).collect()
    }
    want = {
        ("click", t0): (7.0, 9.0, 2.0, 4.0, 5),  # late open won; close 55'
        ("view", t0): (1.0, 1.0, 1.0, 1.0, 1),
    }
    assert got == want

    # replay under a fresh checkpoint: recorded batch id makes it a no-op
    changes2 = spark.readStream.schema(schema).parquet(str(feed_dir) + "/*/")
    run_ohlc_stream(spark, changes2, table, str(tmp_path / "ckpt2"))
    got2 = {
        (r["event_type"], r["bucket"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"],
        )
        for r in spark.read.parquet(table).collect()
    }
    assert got2 == want


def test_mg_summary_stream_matches_python_twin_and_guarantee(spark, tmp_path):
    """Streaming Misra-Gries: three micro-batches over a vocabulary
    wide enough to force two prunes must leave EXACTLY the summary the
    reference python fold produces, keep bounded state, retain every
    true phi-heavy item, and no-op on replay."""
    from beehive_spark.streaming.materialize import run_mg_summary_stream

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    batches = [
        ["hh"] * 20 + [f"a{i}" for i in range(20)],
        ["hh"] * 10 + [f"b{i}" for i in range(20)],
        ["x"] * 5 + ["hh"] * 2 + [f"c{i}" for i in range(10)],
    ]
    for n, items in enumerate(batches):
        spark.createDataFrame(
            [(it,) for it in items], "event_type string"
        ).coalesce(1).write.parquet(str(feed_dir / f"f{n}.parquet"))

    k, cap = 4, 16  # phi = 0.25
    table = str(tmp_path / "mg")
    spark.createDataFrame(
        [(None, 0, 0)], "item string, cnt long, n_total long"
    ).write.parquet(table)
    changes = (
        spark.readStream.schema("event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed_dir) + "/*/")
    )
    run_mg_summary_stream(
        spark, changes, table, str(tmp_path / "ckpt"), phi=0.25
    )

    # independent python fold of the same rule over the same batching
    s, n_total = {}, 0
    for items in batches:
        n_total += len(items)
        for it in items:
            s[it] = s.get(it, 0) + 1
        if len(s) > cap:
            thr = sorted(s.values(), reverse=True)[k]
            s = {i: c - thr for i, c in s.items() if c - thr > 0}

    rows = spark.read.parquet(table).collect()
    assert all(r["n_total"] == n_total for r in rows)
    got = {r["item"]: r["cnt"] for r in rows if r["item"] is not None}
    assert got == s
    assert len(got) <= cap  # bounded state
    # pigeonhole guarantee: every item with true count > N/(k+1) is
    # present, with an MG lower bound no larger than the true count
    true = {}
    for items in batches:
        for it in items:
            true[it] = true.get(it, 0) + 1
    for it, c in true.items():
        if c > n_total / (k + 1):
            assert it in got and got[it] <= c

    # replay under a fresh checkpoint: recorded batch id makes it a no-op
    changes2 = spark.readStream.schema("event_type string").parquet(
        str(feed_dir) + "/*/"
    )
    run_mg_summary_stream(
        spark, changes2, table, str(tmp_path / "ckpt2"), phi=0.25
    )
    rows2 = spark.read.parquet(table).collect()
    assert {r["item"]: r["cnt"] for r in rows2 if r["item"] is not None} == s
    assert all(r["n_total"] == n_total for r in rows2)


def test_ohlc_stream_survives_commit_vs_checkpoint_crash(spark, tmp_path):
    """The single-artifact crash window, killed in the middle: the
    table swap (data + batch id in one rename) lands but the streaming
    checkpoint's commit marker does not.  On restart Spark replays the
    same batch id with the same files; the _last_applied guard must
    skip the re-fold (no double-counted bars) while later, genuinely
    new batches still fold."""
    import datetime as dt
    import os as _os
    import shutil

    from beehive_spark.streaming.materialize import run_ohlc_stream

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    schema = "event_type string, ts timestamp, event_id bigint, value double"
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    spark.createDataFrame(
        [("click", t0.replace(minute=30), 3, 5.0)], schema
    ).coalesce(1).write.parquet(str(feed_dir / "f1.parquet"))

    table = str(tmp_path / "ohlc")
    spark.createDataFrame(
        [],
        "event_type string, bucket timestamp, open_ts timestamp, "
        "open_id bigint, open double, close_ts timestamp, close_id bigint, "
        "close double, high double, low double, n_events bigint",
    ).write.parquet(table)

    ckpt = str(tmp_path / "ckpt")

    def run(ck):
        changes = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(feed_dir) + "/*/")
        )
        run_ohlc_stream(spark, changes, table, ck)

    run(ckpt)  # batch 0 folds f1; table committed at batch id 0

    # simulate the crash between the two artifacts: the table rename
    # happened, the last checkpoint commit marker did not.  A real
    # crash kills the JVM, so the restart is modeled as a NEW
    # checkpoint path holding the pre-crash state minus that marker
    # (deleting in place would trip Spark 4's same-JVM external-
    # modification guard, which reads as a concurrent writer).
    ckpt2 = str(tmp_path / "ckpt_after_crash")
    shutil.copytree(ckpt, ckpt2)
    commits = _os.path.join(ckpt2, "ohlc", "commits")
    last = max(
        (f for f in _os.listdir(commits) if f.isdigit()), key=int
    )
    _os.remove(_os.path.join(commits, last))
    _os.remove(_os.path.join(commits, f".{last}.crc"))  # checksum sidecar
    # new data arrives before the restart
    spark.createDataFrame(
        [("click", t0.replace(minute=50), 5, 9.0)], schema
    ).coalesce(1).write.parquet(str(feed_dir / "f2.parquet"))

    run(ckpt2)  # replays batch 0 (skipped by the id guard), folds batch 1

    rows = spark.read.parquet(table).collect()
    assert len(rows) == 1
    r = rows[0]
    # a double-fold of f1 would read n_events=3; losing f2 would be 1
    assert (r["open"], r["close"], r["high"], r["low"], r["n_events"]) == (
        5.0, 9.0, 9.0, 5.0, 2,
    )


def test_mg_summary_stream_survives_commit_vs_checkpoint_crash(spark, tmp_path):
    """Same kill-between-artifacts window for the Misra-Gries
    maintainer: summary swap committed, checkpoint commit marker lost.
    The replayed batch must not re-add its counts (n_total and cnt
    would inflate); the post-crash batch must still fold."""
    import os as _os
    import shutil

    from beehive_spark.streaming.materialize import run_mg_summary_stream

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    spark.createDataFrame(
        [("hh",)] * 6 + [("aa",)], "event_type string"
    ).coalesce(1).write.parquet(str(feed_dir / "f1.parquet"))

    table = str(tmp_path / "mg")
    spark.createDataFrame(
        [(None, 0, 0)], "item string, cnt long, n_total long"
    ).write.parquet(table)
    ckpt = str(tmp_path / "ckpt")

    def run(ck):
        changes = (
            spark.readStream.schema("event_type string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(feed_dir) + "/*/")
        )
        run_mg_summary_stream(spark, changes, table, ck, phi=0.25)

    run(ckpt)
    # crash window: summary swap landed, commit marker lost (restart
    # modeled from a copied checkpoint — see the ohlc twin above)
    ckpt2 = str(tmp_path / "ckpt_after_crash")
    shutil.copytree(ckpt, ckpt2)
    commits = _os.path.join(ckpt2, "mg", "commits")
    last = max(
        (f for f in _os.listdir(commits) if f.isdigit()), key=int
    )
    _os.remove(_os.path.join(commits, last))
    _os.remove(_os.path.join(commits, f".{last}.crc"))  # checksum sidecar
    spark.createDataFrame(
        [("hh",)] * 2 + [("bb",)], "event_type string"
    ).coalesce(1).write.parquet(str(feed_dir / "f2.parquet"))
    run(ckpt2)

    rows = spark.read.parquet(table).collect()
    assert all(r["n_total"] == 10 for r in rows)  # 7 + 3, folded once each
    got = {r["item"]: r["cnt"] for r in rows if r["item"] is not None}
    assert got == {"hh": 8, "aa": 1, "bb": 1}
