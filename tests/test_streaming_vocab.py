"""Streaming exact-vocabulary maintainer (the THIRD rider on the
bucketed store, and the first with a SUM merge): final store counts
equal the one-shot batch word count under any feed order, the growth
log's novelty column telescopes to the distinct-type total, replays
are no-ops, and the size-triggered split changes layout only."""

import os
import re
import time
from collections import Counter

from beehive_spark.queries import load
from beehive_spark.streaming.materialize import run_vocab_stream
from beehive_spark.streaming.shingle_store import (
    init_shingle_store,
    read_manifest,
    read_store,
)

SF = "/root/testdata/sf0.001"
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _corpus_rows(spark):
    return [
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in load(spark, SF, "documents").collect()
    ]


def _token_counts(rows):
    c = Counter()
    for _, text, *_ in rows:
        c.update(re.findall(r"[a-z0-9]+", (text or "").lower()))
    return c


def _slices(spark, rows, out_dir, n_files=3, reverse=False):
    rows = sorted(rows)
    per = (len(rows) + n_files - 1) // n_files
    paths = []
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        p = os.path.join(out_dir, f"slice_{i}")
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(p)
        paths.append(p)
    if reverse:
        paths = paths[::-1]
    base = time.time() - 3600
    for i, p in enumerate(paths):
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (base + i, base + i))


def _run(spark, src, store, out, ck, **kw):
    docs = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    run_vocab_stream(spark, docs, store, out, ck, **kw)


def _store_counts(spark, store):
    return {r["s"]: r["fd"] for r in read_store(spark, store).collect()}


def _growth_log(spark, out):
    rows = spark.read.parquet(os.path.join(out, "batch=*")).collect()
    return [
        (r["n_tokens"], r["n_types_batch"], r["n_new_types"]) for r in rows
    ]


def test_vocab_stream_matches_batch_word_count(spark, tmp_path):
    rows = _corpus_rows(spark)
    want = _token_counts(rows)
    src = str(tmp_path / "src")
    _slices(spark, rows, src)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    init_shingle_store(spark, store, n_buckets=16)

    _run(spark, src, store, out, str(tmp_path / "ck"))

    assert _store_counts(spark, store) == dict(want)
    log = _growth_log(spark, out)
    # token mass conserved, novelty telescopes to the distinct total
    assert sum(r[0] for r in log) == sum(want.values())
    assert sum(r[2] for r in log) == len(want)
    assert all(r[2] <= r[1] for r in log)  # new types are batch types

    # replay under a fresh checkpoint is a no-op fold
    _run(spark, src, store, out, str(tmp_path / "ck2"))
    assert _store_counts(spark, store) == dict(want)


def test_vocab_store_is_feed_order_invariant(spark, tmp_path):
    """SUM is commutative: the reversed feed yields the IDENTICAL
    store (novelty attribution shifts between batches — documented —
    but its telescoped total is unchanged)."""
    rows = _corpus_rows(spark)
    want = _token_counts(rows)
    src = str(tmp_path / "src")
    _slices(spark, rows, src, reverse=True)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    init_shingle_store(spark, store, n_buckets=16)
    _run(spark, src, store, out, str(tmp_path / "ck"))
    assert _store_counts(spark, store) == dict(want)
    assert sum(r[2] for r in _growth_log(spark, out)) == len(want)


def test_vocab_stream_with_splits_is_layout_only(spark, tmp_path):
    rows = _corpus_rows(spark)
    want = _token_counts(rows)
    src = str(tmp_path / "src")
    _slices(spark, rows, src)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    init_shingle_store(spark, store, n_buckets=2)
    _run(
        spark,
        src,
        store,
        out,
        str(tmp_path / "ck"),
        split_threshold_bytes=512,
    )
    assert read_manifest(store)["n_buckets"] > 2
    assert _store_counts(spark, store) == dict(want)
