"""Streaming Count-Min maintainer (the FOURTH rider on the bucketed
store, and the first with constant-bounded state): the stream-built
sketch is cell-identical to a Python-built batch sketch of the same
corpus under any feed order, point estimates never undercount, the
store never exceeds the D*W grid, and replays are no-ops."""

import hashlib
import os
import re
import time
from collections import Counter

from beehive_spark.queries import load
from beehive_spark.queries.core import _CM_D, _CM_W
from beehive_spark.streaming.materialize import run_countmin_stream
from beehive_spark.streaming.shingle_store import (
    init_shingle_store,
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


def _py_sketch(counts):
    cells = Counter()
    for t, c in counts.items():
        for d in range(_CM_D):
            b = int(hashlib.md5(f"{d}:{t}".encode()).hexdigest()[:8], 16) % _CM_W
            cells[f"{d}:{b}"] += c
    return dict(cells)


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
    run_countmin_stream(spark, docs, store, out, ck)


def _store_cells(spark, store):
    return {r["s"]: r["fd"] for r in read_store(spark, store).collect()}


def test_countmin_stream_matches_python_sketch(spark, tmp_path):
    rows = _corpus_rows(spark)
    counts = _token_counts(rows)
    want = _py_sketch(counts)
    src = str(tmp_path / "src")
    _slices(spark, rows, src)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    init_shingle_store(spark, store, n_buckets=4)

    _run(spark, src, store, out, str(tmp_path / "ck"))

    got = _store_cells(spark, store)
    assert got == want
    assert len(got) <= _CM_D * _CM_W  # constant-bounded state

    # point estimates: min over the d probed cells never undercounts
    for t, c in sorted(counts.items(), key=lambda kv: -kv[1])[:20]:
        est = min(
            got[
                f"{d}:{int(hashlib.md5(f'{d}:{t}'.encode()).hexdigest()[:8], 16) % _CM_W}"
            ]
            for d in range(_CM_D)
        )
        assert est >= c

    # the growth log conserves token mass
    log = spark.read.parquet(os.path.join(out, "batch=*")).collect()
    assert sum(r["n_tokens"] for r in log) == sum(counts.values())
    assert all(r["n_cells_touched"] <= _CM_D * _CM_W for r in log)

    # replay under a fresh checkpoint is a no-op fold
    _run(spark, src, store, out, str(tmp_path / "ck2"))
    assert _store_cells(spark, store) == want


def test_countmin_store_is_feed_order_invariant(spark, tmp_path):
    """SUM commutes: the reversed feed builds the IDENTICAL grid."""
    rows = _corpus_rows(spark)
    want = _py_sketch(_token_counts(rows))
    src = str(tmp_path / "src")
    _slices(spark, rows, src, reverse=True)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    init_shingle_store(spark, store, n_buckets=4)
    _run(spark, src, store, out, str(tmp_path / "ck"))
    assert _store_cells(spark, store) == want
