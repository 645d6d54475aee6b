"""Streaming exact-dedup maintainer over the bucketed fingerprint
store: min-canonical batch equivalence on an id-ordered feed, replay
no-op, and out-of-order canonical handoff through correction records.

The synthetic documents corpus has NO exact duplicates (500 docs, 500
fingerprints), so each test PLANTS duplicate texts under fresh doc_ids
— otherwise the dup/correction branches would pass vacuously."""

import pytest

pytestmark = pytest.mark.slow  # long stream e2e (dedup math covered fast by test_ngram_hash_property)

import os
import time

from pyspark.sql import functions as F

from beehive_spark.queries import load
from beehive_spark.streaming.materialize import run_dedup_stream
from beehive_spark.streaming.shingle_store import (
    init_shingle_store,
    read_store,
)

SF = "/root/testdata/sf0.001"
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
CORR_SCHEMA = "old_canonical long, new_canonical long"
N_DUP = 40


def _corpus_rows(spark):
    """The real docs plus N_DUP planted exact duplicates (same text,
    doc_id shifted to 100000+i, whitespace-padded so normalization is
    exercised too)."""
    base = [
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in load(spark, SF, "documents").collect()
    ]
    dups = [
        (100000 + i, "  " + t.upper() + " ", lg, "dup", n)
        for i, (d, t, lg, s, n) in enumerate(base[:N_DUP])
    ]
    return base + dups


def _canon(rows):
    """fp-group min-canonical over the planted corpus, using the same
    normalization (lower + trim + whitespace collapse) in Python."""
    import hashlib
    import re

    canon = {}
    fps = {}
    for doc, text, *_ in rows:
        fp = hashlib.md5(
            re.sub(r"\s+", " ", text.lower().strip()).encode()
        ).hexdigest()
        fps[doc] = fp
        canon[fp] = min(canon.get(fp, doc), doc)
    return fps, canon


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


def _run(spark, src, store, out, ck):
    docs = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    run_dedup_stream(spark, docs, store, out, ck)


def _read_out(spark, out):
    return {
        r["doc_id"]: (r["is_new"], r["dup_of"])
        for r in spark.read.parquet(os.path.join(out, "batch=*")).collect()
    }


def _read_corr(spark, out):
    df = (
        spark.read.schema(CORR_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(os.path.join(out, "corrections"))
    )
    return {(r["old_canonical"], r["new_canonical"]) for r in df.collect()}


def test_dedup_stream_matches_global_min_canonical(spark, tmp_path):
    rows = _corpus_rows(spark)
    fps, canon = _canon(rows)
    src = str(tmp_path / "src")
    _slices(spark, rows, src)  # ascending ids: dups arrive LAST
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    init_shingle_store(spark, store, n_buckets=16)

    _run(spark, src, store, out, str(tmp_path / "ck"))

    want = {
        doc: (canon[fp] == doc, None if canon[fp] == doc else canon[fp])
        for doc, fp in fps.items()
    }
    got = _read_out(spark, out)
    assert got == want
    # the planted dups were actually classified as dups
    assert sum(1 for v in got.values() if not v[0]) == N_DUP
    # in-order feed: no corrections; store is the min-canonical table
    assert _read_corr(spark, out) == set()
    assert {
        r["s"]: r["fd"] for r in read_store(spark, store).collect()
    } == {fp: d for fp, d in canon.items()}

    # replay under a fresh checkpoint is a no-op fold
    _run(spark, src, store, out, str(tmp_path / "ck2"))
    assert _read_out(spark, out) == want


def test_dedup_stream_out_of_order_hands_off_canonical(spark, tmp_path):
    """Duplicates (high ids) stream FIRST and are flagged new; when
    the true originals (smaller ids) arrive later, the maintainer
    emits (old_canonical, new_canonical) handoffs — remapping emitted
    dup_of pointers through the correction chain reproduces the
    global-min canonical everywhere, never a silently-stale store."""
    rows = _corpus_rows(spark)
    fps, canon = _canon(rows)
    src = str(tmp_path / "src")
    _slices(spark, rows, src, reverse=True)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    init_shingle_store(spark, store, n_buckets=16)

    _run(spark, src, store, out, str(tmp_path / "ck"))

    # the store is order-independent
    assert {
        r["s"]: r["fd"] for r in read_store(spark, store).collect()
    } == {fp: d for fp, d in canon.items()}

    got = _read_out(spark, out)
    corr = _read_corr(spark, out)
    assert corr, "late originals must hand the canonical off"
    # every correction is a strict improvement toward the global min
    assert all(new < old for old, new in corr)
    remap = {}
    for old, new in corr:
        remap[old] = min(new, remap.get(old, new))

    def resolve(doc):
        seen = set()
        while doc in remap and doc not in seen:
            seen.add(doc)
            doc = remap[doc]
        return doc

    assert set(got) == set(fps)
    for doc, fp in fps.items():
        is_new, dup_of = got[doc]
        target = resolve(doc) if dup_of is None else resolve(dup_of)
        assert target == canon[fp], (doc, got[doc], target)


def test_dedup_stream_splits_store_and_stays_exact(spark, tmp_path):
    """With a growth threshold the fold doubles the bucket count as
    the store fills (r11: size-triggered splits), and the verdicts /
    final store are BIT-identical to the fixed-B run — the split is
    pure layout."""
    from beehive_spark.streaming.materialize import run_dedup_stream
    from beehive_spark.streaming.shingle_store import read_manifest

    rows = _corpus_rows(spark)
    fps, canon = _canon(rows)
    src = str(tmp_path / "src")
    _slices(spark, rows, src)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    init_shingle_store(spark, store, n_buckets=2)

    docs = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    run_dedup_stream(
        spark,
        docs,
        store,
        out,
        str(tmp_path / "ck"),
        split_threshold_bytes=2048,
    )

    m = read_manifest(store)
    assert m["n_buckets"] > 2  # at least one doubling actually fired
    want = {
        doc: (canon[fp] == doc, None if canon[fp] == doc else canon[fp])
        for doc, fp in fps.items()
    }
    assert _read_out(spark, out) == want
    assert {
        r["s"]: r["fd"] for r in read_store(spark, store).collect()
    } == {fp: d for fp, d in canon.items()}


def test_dedup_stream_null_text_gets_verdict_rows(spark, tmp_path):
    """NULL-text docs must not vanish from the verdict log (r10
    advisory: md5(NULL) -> NULL key silently dropped by the fp join);
    they dedup into ONE sentinel group, min id canonical."""
    rows = _corpus_rows(spark)[:20] + [
        (200001, None, "xx", "null-src", 0),
        (200002, None, "xx", "null-src", 0),
        (200003, None, "xx", "null-src", 0),
    ]
    src = str(tmp_path / "src")
    _slices(spark, rows, src)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    init_shingle_store(spark, store, n_buckets=4)
    _run(spark, src, store, out, str(tmp_path / "ck"))
    got = _read_out(spark, out)
    assert got[200001] == (True, None)
    assert got[200002] == (False, 200001)
    assert got[200003] == (False, 200001)
    assert len(got) == len(rows)
    # the sentinel key is stored like any fingerprint
    assert {
        r["s"]: r["fd"] for r in read_store(spark, store).collect()
    }["null"] == 200001
