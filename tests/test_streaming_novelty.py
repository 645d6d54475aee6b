"""Streaming novelty maintainer over the BUCKETED shingle store:
batch equivalence on a doc-id-ordered feed, replay no-op, the
kill-between-artifacts crash window, the incremental-touch property
(a small batch rewrites only the buckets it hashes into), and
out-of-order feeds reconciling through correction records."""

import pytest

pytestmark = pytest.mark.slow  # long stream property sweep

import os
import shutil
import time

from pyspark.sql import functions as F

from beehive_spark.queries import load
from beehive_spark.queries.llm import text_ngram_novelty
from beehive_spark.streaming.materialize import run_novelty_stream
from beehive_spark.streaming.shingle_store import (
    init_shingle_store,
    read_manifest,
    read_store,
)

SF = "/root/testdata/sf0.001"
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
CORR_SCHEMA = "doc_id long, n_new_delta long"


def _doc_slices(spark, out_dir, n_files=3, reverse=False):
    """documents split into contiguous doc_id ranges with ascending
    mtimes (crawl-log order); ``reverse=True`` feeds the HIGH ranges
    first (an out-of-order backfill)."""
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
    if reverse:
        paths = paths[::-1]
    base = time.time() - 3600
    for i, p in enumerate(paths):
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (base + i, base + i))


def _read_out(spark, out_dir):
    return {
        r["doc_id"]: (r["n_shingles"], r["n_new"], r["novelty_micro"])
        for r in spark.read.parquet(os.path.join(out_dir, "batch=*")).collect()
    }


def _read_corrections(spark, out_dir):
    """doc_id -> summed n_new_delta over all batches (0 if none)."""
    path = os.path.join(out_dir, "corrections")
    if not os.path.isdir(path):
        return {}
    df = (
        spark.read.schema(CORR_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )
    return {
        r["doc_id"]: r["d"]
        for r in df.groupBy("doc_id")
        .agg(F.sum("n_new_delta").alias("d"))
        .collect()
    }


def _batch_store(spark):
    from beehive_spark.queries.llm import _shingles, _tokens

    d = load(spark, SF, "documents")
    return {
        r["s"]: r["fd"]
        for r in d.select(
            "doc_id", F.explode(_shingles(_tokens(F.col("text")))).alias("s")
        )
        .groupBy("s")
        .agg(F.min("doc_id").alias("fd"))
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
    init_shingle_store(spark, store, n_buckets=16)

    _run(spark, src, store, out, str(tmp_path / "ck"))

    want = {
        r["doc_id"]: (r["n_shingles"], r["n_new"], r["novelty_micro"])
        for r in text_ngram_novelty(spark, SF).collect()
    }
    assert _read_out(spark, out) == want
    # an IN-ORDER feed emits no corrections
    assert _read_corrections(spark, out) == {}
    # the store is the batch min-per-shingle table
    batch_store = _batch_store(spark)
    got_store = {r["s"]: r["fd"] for r in read_store(spark, store).collect()}
    assert got_store == batch_store

    # replay under a fresh checkpoint: store ids short-circuit, out
    # dirs rewrite to identical content
    _run(spark, src, store, out, str(tmp_path / "ck2"))
    assert _read_out(spark, out) == want
    assert {
        r["s"]: r["fd"] for r in read_store(spark, store).collect()
    } == batch_store


def test_novelty_out_of_order_feed_reconciles_via_corrections(
    spark, tmp_path
):
    """HIGH doc_id slices first: late lower-id docs steal first-seen
    credit; the maintainer must debit the prior holders through the
    corrections log so folded (n_new + deltas) equals the batch
    answer — never silently-wrong novelty (r9 verdict ask #6)."""
    src = str(tmp_path / "src")
    _doc_slices(spark, src, reverse=True)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    init_shingle_store(spark, store, n_buckets=16)

    _run(spark, src, store, out, str(tmp_path / "ck"))

    # the STORE is order-independent: still the batch min table
    assert {
        r["s"]: r["fd"] for r in read_store(spark, store).collect()
    } == _batch_store(spark)

    want = {
        r["doc_id"]: (r["n_shingles"], r["n_new"], r["novelty_micro"])
        for r in text_ngram_novelty(spark, SF).collect()
    }
    got = _read_out(spark, out)
    corr = _read_corrections(spark, out)
    assert corr, "reversed feed must produce correction records"
    # n_shingles is order-independent; n_new folds exactly
    assert set(got) == set(want)
    for doc_id, (n_sh, n_new, _) in got.items():
        assert n_sh == want[doc_id][0]
        assert n_new + corr.get(doc_id, 0) == want[doc_id][1], doc_id
    # corrections only ever retract
    assert all(d < 0 for d in corr.values())


def test_novelty_small_batch_touches_only_its_buckets(spark, tmp_path):
    """The incremental-I/O pin (r9 verdict ask #1): after a large
    backfill batch, folding ONE small document rewrites at most
    min(|batch distinct shingles|, n_buckets) bucket directories and
    leaves every other bucket's files untouched on disk (same version
    names in the manifest, same mtimes)."""
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    init_shingle_store(spark, store, n_buckets=64)

    src = str(tmp_path / "src")
    os.makedirs(src)
    big = load(spark, SF, "documents").filter(F.col("doc_id") < 400)
    big.coalesce(1).write.parquet(os.path.join(src, "slice_0"))
    text = "alpha beta gamma delta epsilon zeta eta theta"
    small = spark.createDataFrame(
        [(100000, text, "en", "unit", len(text))], SCHEMA
    )
    small.coalesce(1).write.parquet(os.path.join(src, "slice_1"))
    base = time.time() - 3600
    for i in (0, 1):
        p = os.path.join(src, f"slice_{i}")
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (base + i, base + i))

    _run(spark, src, store, out, str(tmp_path / "ck"))

    m = read_manifest(store)
    n_shingles_small = len(text.split()) - 2  # 3-gram shingles, 6 distinct
    changed = {
        b for b, d in m["buckets"].items() if d.endswith("-v1")
    }
    assert 1 <= len(changed) <= n_shingles_small
    # every untouched bucket still points at its batch-0 directory,
    # and those directories' data files were not rewritten
    untouched = {
        b: d for b, d in m["buckets"].items() if b not in changed
    }
    assert untouched, "backfill must populate more buckets than one doc"
    for d in untouched.values():
        assert d.endswith("-v0")
    # folded result: the small doc's novelty is exact vs the store
    got = _read_out(spark, out)
    assert got[100000][0] == n_shingles_small


def test_novelty_stream_survives_out_written_store_behind(spark, tmp_path):
    """Kill between the artifacts: the out partition for the last
    batch landed, the store manifest rename did not.  The replayed
    batch must rewrite the out dir to the same content and fold the
    store ONCE (restart modeled from a copied checkpoint, as the
    ohlc/mg twins)."""
    src = str(tmp_path / "src")
    _doc_slices(spark, src, n_files=2)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    init_shingle_store(spark, store, n_buckets=16)
    ck = str(tmp_path / "ck")

    _run(spark, src, store, out, ck)
    want_out = _read_out(spark, out)
    want_store = {
        r["s"]: r["fd"] for r in read_store(spark, store).collect()
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
    init_shingle_store(spark, store2, n_buckets=16)
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
        r["s"]: r["fd"] for r in read_store(spark, crash_store).collect()
    } == want_store

def test_novelty_backfilled_store_folds_batch_zero(spark, tmp_path):
    """A store initialized WITH a backfill must survive stream batch
    id 0: backfill dirs are versioned `-vinit`, not `-v0`, so the
    first batch's deterministic version names cannot collide with
    (and rmtree) the live backfill buckets before the manifest
    commit."""
    from beehive_spark.queries.llm import _shingles, _tokens

    d = load(spark, SF, "documents")
    backfill = (
        d.filter(F.col("doc_id") < 300)
        .select("doc_id", _tokens(F.col("text")).alias("w"))
        .select("doc_id", F.explode(_shingles(F.col("w"))).alias("s"))
        .groupBy("s")
        .agg(F.min("doc_id").alias("fd"))
    )
    store = str(tmp_path / "store")
    init_shingle_store(spark, store, n_buckets=16, backfill=backfill)

    src = str(tmp_path / "src")
    os.makedirs(src)
    d.filter(F.col("doc_id") >= 300).coalesce(1).write.parquet(
        os.path.join(src, "slice_0")
    )
    out = str(tmp_path / "out")
    _run(spark, src, store, out, str(tmp_path / "ck"))

    assert {
        r["s"]: r["fd"] for r in read_store(spark, store).collect()
    } == _batch_store(spark)
    want = {
        r["doc_id"]: (r["n_shingles"], r["n_new"], r["novelty_micro"])
        for r in text_ngram_novelty(spark, SF).collect()
        if r["doc_id"] >= 300
    }
    assert _read_out(spark, out) == want
