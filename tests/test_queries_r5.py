"""Round-5 regression pins: staged-swap marker guard, lock vacuum,
bench-extras run-id attribution."""

import json
import os
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow  # query pins duplicated by the driver/local oracle gate

from beehive_spark.sources.layout import (
    promote_staging,
    vacuum_artifacts,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mkdir_with(path, *files):
    os.makedirs(path, exist_ok=True)
    for f in files:
        with open(os.path.join(path, f), "w") as fh:
            fh.write("x")


def test_promote_refuses_foreign_incomplete_staging(tmp_path):
    """After a recoverer promotes a writer's complete staging, the
    writer's RETRIED promotion must not demote the (now good) live dir
    in favor of a newly-started rebuild's incomplete staging (ADVICE
    r4): with a complete live dir that is the recoverer-already-did-it
    no-op."""
    live = str(tmp_path / "idx")
    staging = live + ".staging"
    _mkdir_with(live, "MARKER", "data.parquet")
    _mkdir_with(staging, "part-0.parquet")  # mid-write rebuild: no marker
    assert promote_staging(staging, live, marker="MARKER") is False
    # live untouched, foreign staging untouched
    assert os.path.exists(os.path.join(live, "MARKER"))
    assert os.path.exists(os.path.join(staging, "part-0.parquet"))


def test_promote_incomplete_staging_no_live_raises(tmp_path):
    """With NO complete live dir, promoting an incomplete staging would
    publish a partial table — hard error, nothing deleted."""
    live = str(tmp_path / "idx")
    staging = live + ".staging"
    _mkdir_with(staging, "part-0.parquet")  # no marker
    with pytest.raises(RuntimeError, match="incomplete staging"):
        promote_staging(staging, live, marker="MARKER")
    assert os.path.exists(staging)
    assert not os.path.exists(live)


def test_promote_complete_staging_still_swaps(tmp_path):
    live = str(tmp_path / "idx")
    staging = live + ".staging"
    _mkdir_with(live, "MARKER", "old.parquet")
    _mkdir_with(staging, "MARKER", "new.parquet")
    assert promote_staging(staging, live, marker="MARKER") is True
    assert os.path.exists(os.path.join(live, "new.parquet"))
    assert not os.path.exists(staging)


def test_vacuum_collects_dangling_locks_only(tmp_path):
    """.lock sentinels are collected only when old AND their base
    artifact is missing; a lock whose artifact exists stays (ADVICE
    r4: read_meta on a nonexistent index leaves a lock behind)."""
    root = str(tmp_path)
    live = os.path.join(root, "idx")
    _mkdir_with(live, "meta.json")
    old = time.time() - 100_000
    for name in ("idx.lock", "ghost.lock", "fresh_ghost.lock"):
        p = os.path.join(root, name)
        with open(p, "w"):
            pass
    os.utime(os.path.join(root, "idx.lock"), (old, old))
    os.utime(os.path.join(root, "ghost.lock"), (old, old))
    # fresh_ghost.lock keeps its current mtime (too young to collect)
    removed = vacuum_artifacts(root)
    assert removed == [os.path.join(root, "ghost.lock")]
    assert os.path.exists(os.path.join(root, "idx.lock"))  # artifact alive
    assert os.path.exists(os.path.join(root, "fresh_ghost.lock"))  # young


def test_bench_diff_attributes_extras_by_run_id(tmp_path):
    """Two runs with float-identical headline totals must not resolve
    to each other's extras records (the 1.00x self-comparison ADVICE
    r4 flagged): attribution is by run_id when present."""
    hist = tmp_path / "BENCH_EXTRA_HISTORY.jsonl"
    recs = [
        {"metric": "extra_queries", "headline_value": 10.0,
         "run_id": "aaa", "queries": {"x": 1.0}},
        {"metric": "extra_queries", "headline_value": 10.0,
         "run_id": "bbb", "queries": {"x": 2.0}},
    ]
    hist.write_text("".join(json.dumps(r) + "\n" for r in recs))
    base = tmp_path / "base.json"
    cur = tmp_path / "cur.json"
    base.write_text(json.dumps(
        {"value": 10.0, "queries": {"q": 1.0}, "run_id": "aaa",
         "extras_file": "BENCH_EXTRA.json"}))
    cur.write_text(json.dumps(
        {"value": 10.0, "queries": {"q": 1.0}, "run_id": "bbb",
         "extras_file": "BENCH_EXTRA.json"}))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bench_diff.py"),
         str(base), str(cur), "--ratio", "1.5"],
        capture_output=True, text=True,
    )
    assert out.returncode == 1, out.stdout + out.stderr
    # x: 1.0 (run aaa) vs 2.0 (run bbb) => 2.00x regression, NOT 1.00x
    assert "2.00x" in out.stdout


def test_bench_diff_headline_value_fallback_for_old_records(tmp_path):
    """Pre-r5 history records carry no run_id; a pre-r5 baseline side
    still attributes by headline_value."""
    hist = tmp_path / "BENCH_EXTRA_HISTORY.jsonl"
    hist.write_text(json.dumps(
        {"metric": "extra_queries", "headline_value": 7.5,
         "queries": {"x": 3.0}}) + "\n")
    base = tmp_path / "base.json"
    cur = tmp_path / "cur.json"
    base.write_text(json.dumps(
        {"value": 7.5, "queries": {"q": 1.0},
         "extras_file": "BENCH_EXTRA.json"}))
    cur.write_text(json.dumps(
        {"value": 9.9, "queries": {"q": 1.0}, "run_id": "ccc",
         "extras_file": "BENCH_EXTRA.json"}))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bench_diff.py"),
         str(base), str(cur)],
        capture_output=True, text=True,
    )
    # baseline folded its extras (x shows as only-one-side since cur
    # has no matching record), and the run completes without error
    assert "x" in out.stdout
    assert "only one side" in out.stdout


def test_mmr_rerank_is_diverse_and_relevant(spark):
    """MMR picks must (a) start with the single most relevant
    candidate, (b) never repeat, and (c) be more mutually diverse than
    the naive top-k prefix of the same pool (the property the operator
    exists for), measured by max pairwise cosine."""
    from beehive_spark.queries import all_queries, load
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    out = all_queries()["embedding_mmr_rerank"](spark, sf).collect()
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    ids = [r["vec_id"] for r in out]
    assert len(set(ids)) == 5
    rels = [r["relevance"] for r in out]
    assert rels[0] == max(rels)

    emb = load(spark, sf, "embeddings")
    vecs = {
        r["vec_id"]: r["e"]
        for r in emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
        .filter(F.col("vec_id").isin([int(i) for i in ids] + list(range(60))))
        .collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb)

    q = vecs[0] if 0 in vecs else None
    # naive top-5 = 5 highest-relevance candidates (vec_id >= 1)
    cand = {
        i: cos(v, q) for i, v in vecs.items() if i >= 1
    }
    naive = sorted(cand, key=lambda i: (-cand[i], i))[:5]

    def max_pair(sel):
        return max(
            cos(vecs[a], vecs[b])
            for i, a in enumerate(sel)
            for b in sel[i + 1 :]
        )

    if set(ids) != set(naive):  # MMR changed the set: diversity improved
        assert max_pair([int(i) for i in ids]) <= max_pair(naive) + 1e-12


def test_promote_missing_staging_incomplete_live_raises_before_demoting(tmp_path):
    """r5 review: with marker set, staging MISSING and an incomplete
    live dir, promote must error out WITHOUT demoting the live dir
    (the old fall-through moved live to .old and then crashed on the
    staging rename, stranding the data)."""
    live = str(tmp_path / "idx")
    _mkdir_with(live, "data.parquet")  # no marker
    with pytest.raises(RuntimeError, match="missing"):
        promote_staging(live + ".staging", live, marker="MARKER")
    assert os.path.exists(os.path.join(live, "data.parquet"))
    assert not os.path.exists(live + ".old")


def test_dir_swap_lock_reacquires_after_unlink(tmp_path):
    """r5 review: if the lockfile is unlinked between open() and
    flock() (vacuum collecting a dangling lock), the acquirer must
    detect the orphaned inode and retry on the fresh file — holding a
    lock on an unlinked inode is no lock at all."""
    from beehive_spark.sources.layout import dir_swap_lock

    path = str(tmp_path / "idx")
    lockfile = path + ".lock"
    with dir_swap_lock(path):
        # lock held: the path must resolve to the inode we locked
        assert os.path.exists(lockfile)
    # simulate the race: stale lockfile vanishes, then a new acquire
    # must create a fresh file and still succeed
    os.unlink(lockfile)
    with dir_swap_lock(path):
        assert os.path.exists(lockfile)


def test_twophase_cc_keeps_self_loop_only_nodes(spark):
    """r5 review: a node appearing only in self-loop edges must label
    itself, matching connected_components."""
    from beehive_spark.operators.graph import (
        connected_components,
        connected_components_twophase,
    )

    edges = [(5, 5), (7, 8)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    two = {
        r["id"]: r["component"]
        for r in connected_components_twophase(df).collect()
    }
    prop = {
        r["id"]: r["component"] for r in connected_components(df).collect()
    }
    assert two == prop == {5: 5, 7: 7, 8: 7}


def test_bloom_semi_join_exact_and_selective(spark):
    """The bloom pre-filter must (a) keep the result EXACTLY equal to
    the plain semi join and (b) actually prune: the pre-filtered fact
    row count sits near |matches| + ~1% false positives, far below
    the full fact."""
    from pyspark.sql import functions as F

    from beehive_spark.operators.bloom import (
        bloom_semi_join,
        build_bloom,
        might_contain,
    )

    fact = spark.range(20_000).select(F.col("id").alias("k"))
    dim = spark.range(300).select((F.col("id") * 50).alias("k"))  # 300 keys
    got = sorted(r["k"] for r in bloom_semi_join(fact, dim, "k").collect())
    want = sorted(
        r["k"] for r in fact.join(dim, "k", "left_semi").collect()
    )
    assert got == want and len(got) == 300
    # selectivity of the raw pre-filter
    bitmap = build_bloom(dim, "k")
    kept = fact.filter(might_contain(F.col("k"), bitmap, len(bitmap) * 64)).count()
    assert kept < 300 + 0.05 * 20_000  # matches + well under 5% fp


def test_bloom_handles_fp_and_missing_keys(spark):
    from pyspark.sql import functions as F

    from beehive_spark.operators.bloom import bloom_semi_join

    fact = spark.createDataFrame([(i,) for i in range(50)], "k long")
    dim = spark.createDataFrame([(1,), (7,), (999,)], "k long")  # 999 unmatched
    got = sorted(r["k"] for r in bloom_semi_join(fact, dim, "k").collect())
    assert got == [1, 7]


def test_dir_swap_lock_mutual_exclusion_survives_vacuum_hammer(tmp_path):
    """r5 review follow-up: N workers repeatedly enter the critical
    section while a vacuum thread keeps unlinking the (dangling)
    lockfile; the inode re-check must keep the section exclusive —
    without it two workers holding different inodes overlap."""
    import multiprocessing as mp

    from beehive_spark.sources.layout import dir_swap_lock

    path = str(tmp_path / "idx")  # base artifact never exists
    shared = str(tmp_path / "counter")

    def worker(n_iters: int):
        for _ in range(n_iters):
            with dir_swap_lock(path):
                # read-modify-write a counter file: lost updates reveal
                # any mutual-exclusion break
                try:
                    with open(shared) as f:
                        v = int(f.read())
                except FileNotFoundError:
                    v = 0
                with open(shared, "w") as f:
                    f.write(str(v + 1))

    def vacuum(stop_file: str):
        # mirrors vacuum_artifacts' collection protocol: unlink ONLY
        # while holding a non-blocking exclusive flock on the inode —
        # an unconditional unlink genuinely breaks exclusion (a worker
        # past its re-check can lose the file under it), which is why
        # the production vacuum never does that
        import fcntl

        while not os.path.exists(stop_file):
            try:
                fd = os.open(path + ".lock", os.O_RDWR)
            except FileNotFoundError:
                continue
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                os.close(fd)
                continue
            try:
                os.unlink(path + ".lock")
            except FileNotFoundError:
                pass
            finally:
                os.close(fd)

    stop = str(tmp_path / "stop")
    vac = mp.Process(target=vacuum, args=(stop,))
    vac.start()
    workers = [mp.Process(target=worker, args=(60,)) for _ in range(4)]
    for w in workers:
        w.start()
    for w in workers:
        w.join()
    with open(stop, "w"):
        pass
    vac.join()
    with open(shared) as f:
        assert int(f.read()) == 4 * 60  # zero lost updates


def test_bloom_mixed_integral_key_types_no_false_negatives(spark):
    """xxhash64 is type-sensitive: INT vs BIGINT keys hashed uncast
    turned every probe into a false negative (r5 review, verified) —
    both sides must hash through a common cast."""
    from pyspark.sql import functions as F

    from beehive_spark.operators.bloom import bloom_semi_join

    fact = spark.createDataFrame(
        [(i,) for i in range(100)], "k int"  # INT fact keys
    )
    dim = spark.createDataFrame(
        [(i * 7,) for i in range(15)], "k long"  # BIGINT dim keys
    )
    got = sorted(r["k"] for r in bloom_semi_join(fact, dim, "k").collect())
    want = sorted(r["k"] for r in fact.join(dim, "k", "left_semi").collect())
    assert got == want and len(got) == 15


def test_bloom_cross_family_key_types_raise(spark):
    import pytest as _pytest
    from beehive_spark.operators.bloom import bloom_semi_join

    fact = spark.createDataFrame([(1,)], "k int")
    dim = spark.createDataFrame([("1",)], "k string")
    with _pytest.raises(ValueError, match="type families"):
        bloom_semi_join(fact, dim, "k")


def test_bloom_unaligned_m_bits(spark):
    """m_bits that is not a multiple of 64 must round the word array UP
    (15-word array for 1000 bits crashed at build, r5 review)."""
    from beehive_spark.operators.bloom import bloom_semi_join

    fact = spark.createDataFrame([(i,) for i in range(50)], "k long")
    dim = spark.createDataFrame([(1,), (7,), (49,)], "k long")
    got = sorted(
        r["k"] for r in bloom_semi_join(fact, dim, "k", m_bits=1000).collect()
    )
    assert got == [1, 7, 49]


def test_bloom_broadcast_bitmap_path_exact_and_no_cache_leak(spark):
    """r6: bitmaps past _INLINE_WORDS ship as a broadcast single-row
    array frame instead of a codegen-bloating literal — the result
    must stay exactly the plain semi join, and the operator must leave
    NOTHING persisted in the session cache (the r5 leak)."""
    from pyspark.sql import functions as F

    from beehive_spark.operators.bloom import _INLINE_WORDS, bloom_semi_join

    # scope the leak check to THIS operator: other suites may leave
    # documented caller-managed caches behind (fuzzy_join_names et
    # al.), so a global isEmpty assertion is order-dependent under the
    # full suite (r6: failed at 93% of tests/, passed in isolation)
    spark.catalog.clearCache()
    fact = spark.range(5_000).select(F.col("id").alias("k"))
    dim = spark.createDataFrame([(i * 9,) for i in range(400)], "k long")
    big_m = (_INLINE_WORDS + 1) * 64 * 2  # forces the broadcast-data path
    out = bloom_semi_join(fact, dim, "k", m_bits=big_m)
    assert "__bloom_bits" not in out.columns
    got = sorted(r["k"] for r in out.collect())
    want = sorted(r["k"] for r in fact.join(dim, "k", "left_semi").collect())
    assert got == want
    # auto-sized (inline-literal) path: same leak check
    sorted(r["k"] for r in bloom_semi_join(fact, dim, "k").collect())
    jcache = spark._jsparkSession.sharedState().cacheManager()
    assert jcache.isEmpty(), "bloom_semi_join leaked a persisted frame"


def _brute_peel(edges, k):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        doomed = [n for n in adj if len(adj[n]) < k]
        for n in doomed:
            changed = True
            for m in adj.pop(n):
                adj[m].discard(n)
    return {n: len(ns) for n, ns in adj.items()}


def test_graph_kcore_query_matches_brute_peel_on_real_data(spark):
    """The registered query's exact member set + within-core degrees
    equal a pure-python peel of the same co-purchase graph at sf0.01 —
    a real non-trivial pin (1,857 of 2,000 parts survive k=80 there;
    at the sf0.001 test default the 80-core is empty, which would be
    exactly the 0==0 trap the workflow notes warn about)."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from beehive_spark.queries import all_queries
    from beehive_spark.queries.relational import copurchase_pairs, load

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(os.path.join(sf, "lineitem.parquet")):
        _pytest.skip("sf0.01 testdata not present")
    edges = {
        (r["u"], r["v"])
        for r in copurchase_pairs(load(spark, sf, "lineitem"))
        .select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .distinct()
        .collect()
    }
    want = _brute_peel(edges, 80)
    assert len(want) > 0 and len(want) < 2000  # non-trivial strict subset
    got = {
        r["part_id"]: r["core_degree"]
        for r in all_queries()["graph_kcore"](spark, sf).collect()
    }
    assert got == want
