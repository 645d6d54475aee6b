"""Unit pins for the bucketed shingle store's commit protocol —
each crash window exercised DIRECTLY against the module API (the
streaming suites exercise them end-to-end through foreachBatch; these
prove the invariants without a stream in the loop)."""

import json
import os

from pyspark.sql import functions as F

from beehive_spark.streaming.shingle_store import (
    MANIFEST,
    bucket_of,
    commit_buckets,
    gc_store,
    init_shingle_store,
    read_buckets,
    read_manifest,
    read_store,
    store_batch_id,
)


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "s string, fd long")


def _fresh(spark, pairs, n_buckets):
    return _df(spark, pairs).withColumn(
        "bk", bucket_of(F.col("s"), n_buckets)
    )


def _store_dict(spark, path):
    return {r["s"]: r["fd"] for r in read_store(spark, path).collect()}


def test_init_backfill_and_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "store")
    rows = [(f"sh{i}", i) for i in range(50)]
    init_shingle_store(spark, path, n_buckets=8, backfill=_df(spark, rows))
    assert store_batch_id(path) == -1
    assert _store_dict(spark, path) == dict(rows)
    m = read_manifest(path)
    # every backfill dir is -vinit, every row sits in its hash bucket
    assert all(d.endswith("-vinit") for d in m["buckets"].values())
    for b in (int(k) for k in m["buckets"]):
        got = read_buckets(spark, path, m, [b]).collect()
        for r in got:
            assert r["s"] is not None
    # re-init refuses to clobber
    import pytest

    with pytest.raises(ValueError):
        init_shingle_store(spark, path, n_buckets=8)


def test_commit_touches_only_present_buckets(spark, tmp_path):
    path = str(tmp_path / "store")
    rows = [(f"sh{i}", i) for i in range(50)]
    init_shingle_store(spark, path, n_buckets=8, backfill=_df(spark, rows))
    m0 = read_manifest(path)
    # new content for whatever buckets 'zz1' lands in, leaving others
    fresh = _fresh(spark, [("zz1", 999)], 8)
    commit_buckets(fresh, path, m0, batch_id=0)
    m1 = read_manifest(path)
    assert m1["batch_id"] == 0
    changed = {
        b for b in m1["buckets"] if m1["buckets"][b] != m0["buckets"].get(b)
    }
    assert len(changed) == 1  # one key -> one bucket
    # WARNING-shaped subtlety pinned: commit_buckets publishes the
    # frame as the COMPLETE new content of touched buckets — the old
    # rows of the touched bucket are gone unless the caller merged
    # them (the maintainers always full-outer-merge first)
    survivors = _store_dict(spark, path)
    assert survivors["zz1"] == 999
    lost_bucket = next(iter(changed))
    for s, fd in rows:
        if str(
            spark.range(1)
            .select(bucket_of(F.lit(s), 8))
            .collect()[0][0]
        ) != lost_bucket:
            assert survivors[s] == fd


def test_crash_before_manifest_is_invisible_and_replay_heals(
    spark, tmp_path
):
    """Version dirs written for a batch that never reached its
    manifest rename must not change what readers see; a replayed
    commit under the same batch id rewrites those dirs in place."""
    path = str(tmp_path / "store")
    rows = [(f"sh{i}", i) for i in range(30)]
    init_shingle_store(spark, path, n_buckets=4, backfill=_df(spark, rows))
    before = _store_dict(spark, path)
    m = read_manifest(path)

    # simulate the crash: stage written, SOME version dirs replaced,
    # manifest NOT — i.e. plant a half-baked b<k>-v0 dir by hand
    victim_bucket = int(next(iter(m["buckets"])))
    junk = os.path.join(path, f"b{victim_bucket:05d}-v0")
    os.makedirs(junk)
    with open(os.path.join(junk, "garbage"), "w") as f:
        f.write("not parquet")
    # also a torn staging dir and a torn manifest temp file
    os.makedirs(os.path.join(path, "_stage-v0", "bk=1"), exist_ok=True)
    with open(os.path.join(path, MANIFEST + ".tmp"), "w") as f:
        f.write("{half")

    # readers see only manifest-referenced dirs: unchanged
    assert _store_dict(spark, path) == before
    assert store_batch_id(path) == -1

    # the maintainer's next fold starts with gc: debris removed
    gc_store(path, read_manifest(path))
    assert not os.path.exists(junk)
    assert not os.path.exists(os.path.join(path, "_stage-v0"))

    # replayed commit (same batch id) now lands cleanly; merged frame
    # includes prior content of the touched bucket, as maintainers do
    merged = _fresh(spark, rows + [("new0", 1000)], 4)
    commit_buckets(merged, path, read_manifest(path), batch_id=0)
    after = _store_dict(spark, path)
    assert after == {**dict(rows), "new0": 1000}
    assert store_batch_id(path) == 0


def test_gc_never_touches_live_dirs(spark, tmp_path):
    path = str(tmp_path / "store")
    rows = [(f"sh{i}", i) for i in range(30)]
    init_shingle_store(spark, path, n_buckets=4, backfill=_df(spark, rows))
    m = read_manifest(path)
    commit_buckets(_fresh(spark, rows, 4), path, m, batch_id=0)
    # superseded -vinit dirs linger until gc; live -v0 dirs must stay
    gc_store(path, read_manifest(path))
    live = set(read_manifest(path)["buckets"].values())
    on_disk = {
        d for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d))
    }
    assert on_disk == live
    assert _store_dict(spark, path) == dict(rows)


def test_manifest_rename_is_the_single_commit_point(spark, tmp_path):
    """Flipping the manifest back to its pre-commit content restores
    the pre-commit view even though the new version dirs exist — the
    definition of 'the rename is the only commit point'."""
    path = str(tmp_path / "store")
    rows = [(f"sh{i}", i) for i in range(20)]
    init_shingle_store(spark, path, n_buckets=4, backfill=_df(spark, rows))
    m_pre = read_manifest(path)
    commit_buckets(
        _fresh(spark, rows + [("zz", 77)], 4), path, m_pre, batch_id=0
    )
    assert _store_dict(spark, path)["zz"] == 77
    # roll the manifest back by hand (no dir was deleted yet)
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(m_pre, f)
    assert _store_dict(spark, path) == dict(rows)
    assert store_batch_id(path) == -1


def test_split_doubles_buckets_preserves_content_and_routing(
    spark, tmp_path
):
    from beehive_spark.streaming.shingle_store import (
        maybe_split_store,
        split_store,
    )

    path = str(tmp_path / "store")
    rows = [(f"sh{i}", i) for i in range(200)]
    init_shingle_store(spark, path, n_buckets=4, backfill=_df(spark, rows))
    before = _store_dict(spark, path)
    m0 = read_manifest(path)
    m1 = split_store(spark, path, m0)
    # layout doubled, content identical, batch id untouched
    assert m1["n_buckets"] == 8
    assert m1["batch_id"] == m0["batch_id"]
    assert read_manifest(path) == m1
    assert _store_dict(spark, path) == before == dict(rows)
    # split dirs carry the s-suffix (never collide with batch names)
    assert all(d.endswith("s8") for d in m1["buckets"].values())
    # every surviving row sits in its NEW-modulus hash bucket
    for b in (int(k) for k in m1["buckets"]):
        got = read_buckets(spark, path, m1, [b]).withColumn(
            "bk", bucket_of(F.col("s"), 8)
        )
        assert all(r["bk"] == b for r in got.collect())
    # the old 4-bucket dirs are unreferenced -> GC sweeps them
    gc_store(path, m1)
    live = {d for d in os.listdir(path) if d.startswith("b")}
    assert live == set(m1["buckets"].values())
    # policy wrapper: huge threshold is a no-op, small one doubles once
    m2 = maybe_split_store(spark, path, m1, threshold_bytes=1 << 40)
    assert m2["n_buckets"] == 8
    m3 = maybe_split_store(spark, path, m2, threshold_bytes=1)
    assert m3["n_buckets"] == 16
    assert _store_dict(spark, path) == dict(rows)


def test_crashed_split_is_invisible_and_replay_heals(spark, tmp_path):
    """Debris from a split that died before the manifest rename (stage
    dir + orphan s-suffixed version dirs) must leave the old layout
    fully live, be swept by GC, and not confuse a re-run split."""
    import shutil

    from beehive_spark.streaming.shingle_store import split_store

    path = str(tmp_path / "store")
    rows = [(f"sh{i}", i) for i in range(60)]
    init_shingle_store(spark, path, n_buckets=4, backfill=_df(spark, rows))
    m0 = read_manifest(path)
    # simulate the crash window: run the split's writes, then restore
    # the pre-split manifest (commit never happened)
    manifest_bytes = open(os.path.join(path, MANIFEST), "rb").read()
    split_store(spark, path, dict(m0))
    with open(os.path.join(path, MANIFEST), "wb") as f:
        f.write(manifest_bytes)
    os.makedirs(os.path.join(path, "_stage-split0s8"), exist_ok=True)
    # old layout still fully live
    assert read_manifest(path) == m0
    assert _store_dict(spark, path) == dict(rows)
    # fold-start GC sweeps the orphans, replayed split converges
    gc_store(path, m0)
    assert not any(
        d.endswith("s8") or d.startswith("_stage-")
        for d in os.listdir(path)
    )
    m1 = split_store(spark, path, m0)
    assert m1["n_buckets"] == 8
    assert _store_dict(spark, path) == dict(rows)
