"""Streaming novelty maintainer: batch equivalence on a doc-id-ordered
feed, replay no-op, and the kill-between-artifacts crash window."""

import os
import shutil
import time

from pyspark.sql import functions as F

from beehive_spark.queries import load
from beehive_spark.queries.llm import text_ngram_novelty
from beehive_spark.streaming.materialize import run_novelty_stream

SF = "/root/testdata/sf0.001"
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _doc_slices(spark, out_dir, n_files=3):
    """documents split into contiguous doc_id ranges with ascending
    mtimes (crawl-log order)."""
    d = load(spark, SF, "documents")
    n = d.agg(F.max("doc_id")).collect()[0][0] + 1
    paths = []
    for i in range(n_files):
        lo, hi = i * n // n_files, (i + 1) * n // n_files
        p = os.path.join(out_dir, f"slice_{i}")
        d.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.parquet(p)
        paths.append(p)
    base = time.time() - 3600
    for i, p in enumerate(paths):
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (base + i, base + i))


def _read_out(spark, out_dir):
    return {
        r["doc_id"]: (r["n_shingles"], r["n_new"], r["novelty_micro"])
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .collect()
    }


def _run(spark, src, store, out, ck):
    docs = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    run_novelty_stream(spark, docs, store, out, ck)


def test_novelty_stream_matches_batch_and_replays_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    _doc_slices(spark, src)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    spark.createDataFrame([], "s string, fd long").write.parquet(store)

    _run(spark, src, store, out, str(tmp_path / "ck"))

    want = {
        r["doc_id"]: (r["n_shingles"], r["n_new"], r["novelty_micro"])
        for r in text_ngram_novelty(spark, SF).collect()
    }
    assert _read_out(spark, out) == want
    # the store is the batch min-per-shingle table
    d = load(spark, SF, "documents")
    from beehive_spark.queries.llm import _shingles, _tokens

    batch_store = {
        r["s"]: r["fd"]
        for r in d.select(
            "doc_id", F.explode(_shingles(_tokens(F.col("text")))).alias("s")
        )
        .groupBy("s")
        .agg(F.min("doc_id").alias("fd"))
        .collect()
    }
    got_store = {
        r["s"]: r["fd"] for r in spark.read.parquet(store).collect()
    }
    assert got_store == batch_store

    # replay under a fresh checkpoint: store ids short-circuit, out
    # dirs rewrite to identical content
    _run(spark, src, store, out, str(tmp_path / "ck2"))
    assert _read_out(spark, out) == want
    assert {
        r["s"]: r["fd"] for r in spark.read.parquet(store).collect()
    } == batch_store


def test_novelty_stream_survives_out_written_store_behind(spark, tmp_path):
    """Kill between the two artifacts: the out partition for the last
    batch landed, the store swap did not.  The replayed batch must
    rewrite the out dir to the same content and fold the store ONCE
    (restart modeled from a copied checkpoint, as the ohlc/mg twins)."""
    src = str(tmp_path / "src")
    _doc_slices(spark, src, n_files=2)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    spark.createDataFrame([], "s string, fd long").write.parquet(store)
    ck = str(tmp_path / "ck")

    _run(spark, src, store, out, ck)
    want_out = _read_out(spark, out)
    want_store = {
        r["s"]: r["fd"] for r in spark.read.parquet(store).collect()
    }

    # crash simulation: the checkpoint loses the final commit marker
    # AND the store reverts to its pre-final-batch state, while the
    # final out partition (written first) survives.  Rebuild that
    # pre-state by rerunning only slice_0 into fresh paths.
    store2 = str(tmp_path / "store_pre")
    out2 = str(tmp_path / "out_pre")
    src0 = str(tmp_path / "src0")
    os.makedirs(src0)
    shutil.copytree(
        os.path.join(src, "slice_0"), os.path.join(src0, "slice_0")
    )
    spark.createDataFrame([], "s string, fd long").write.parquet(store2)
    _run(spark, src0, store2, out2, str(tmp_path / "ck_pre"))

    # assemble the crash state: pre-batch store + full out log +
    # checkpoint missing the last commit marker
    crash_store = str(tmp_path / "store_crash")
    shutil.copytree(store2, crash_store)
    crash_ck = str(tmp_path / "ck_crash")
    shutil.copytree(ck, crash_ck)
    commits = os.path.join(crash_ck, "novelty", "commits")
    last = max((f for f in os.listdir(commits) if f.isdigit()), key=int)
    os.remove(os.path.join(commits, last))
    os.remove(os.path.join(commits, f".{last}.crc"))

    _run(spark, src, crash_store, out, crash_ck)
    assert _read_out(spark, out) == want_out
    assert {
        r["s"]: r["fd"] for r in spark.read.parquet(crash_store).collect()
    } == want_store
