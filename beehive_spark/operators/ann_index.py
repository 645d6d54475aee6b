"""Persistent ANN indexes — build once, probe many, append increments.

``queries/llm.py``'s ANN queries train their quantizers inside the
query call, which is the right shape for a self-contained benchmark
entry but the wrong lifecycle at scale: at 100 TB the codebook and the
assignment table are ARTIFACTS — built in one job, persisted, then
reused by every probe and refreshed incrementally as new vectors land
(nobody retrains a coarse quantizer per query).  This module is that
lifecycle:

- :func:`build_ivf_index` — train the spherical-k-means coarse
  quantizer on a bounded deterministic sample, assign every corpus
  vector to its top-``replicas`` lists, and persist
  ``out_dir/codebook.parquet`` (k rows) plus
  ``out_dir/assignments.parquet`` partitioned BY LIST ID, all via a
  staged write + atomic directory swap (readers never see a partial
  index; a rebuild interrupted before the swap leaves the old index
  live, and one interrupted MID-swap is rolled forward by the next
  reader — ``_recover`` promotes a complete ``.staging``, else
  restores ``.old``).
- :func:`probe_ivf_index` — answer top-k cosine queries from the
  persisted index: pick each query's ``nprobe`` closest lists from the
  (broadcast) codebook, then scan ONLY those list partitions —
  Hive-partition pruning turns nprobe/k into a bytes-read fraction,
  which is the entire point of IVF.
- :func:`append_ivf_index` — assign NEW vectors with the EXISTING
  codebook and append their list files; cost is proportional to the
  increment, never the corpus.  (The standard IVF contract: the
  codebook drifts only on explicit rebuild.)
- :func:`delete_from_ivf_index` / :func:`compact_ivf_index` — the
  delete leg (r5): deletions land as TOMBSTONE files (cost
  O(|delete|), no corpus pass — the same economics as append), probes
  anti-join the tombstone set, and compaction folds tombstones into a
  rewritten assignments table under the frozen codebook via the same
  staged atomic swap as a rebuild.  Contract: ids are append-once —
  re-inserting a previously deleted id stays masked by its tombstone
  until :func:`compact_ivf_index` clears the slate (documented, like
  FAISS's remove_ids + rebuild guidance).
- :func:`build_pq_index` / :func:`probe_pq_index` — same lifecycle for
  the product-quantization compressed index: per-subspace codebooks +
  an m-byte code per vector (the 32x memory lever), probed via ADC
  lookup tables + exact top-``refine`` re-rank.

Shared trainer/carrier helpers (`train_ivf_codebook`,
`train_pq_codebooks`, `normalized_sample`, `codebook_df`,
`codebook_sims`, `pq_subspace_sims`) live here; ``queries/llm.py``
imports them, so the per-query training path and the persisted-index
path provably share one implementation.

Reference scope: net-new (the reference has no vector surface);
lifecycle follows FAISS's train/add/search split re-expressed as
Spark artifacts.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from beehive_spark.sources.layout import dir_swap_lock, promote_staging

META_NAME = "_ann_meta.json"


# ---------------------------------------------------------------------------
# trainers + broadcast carriers (moved from queries/llm.py; one source
# of truth for both the per-query and the persisted-index paths)
# ---------------------------------------------------------------------------
def normalized_sample(emb_raw: DataFrame, sample_cap: int = 8192):
    """Bounded deterministic driver-side training sample as a numpy
    matrix of unit-normalized vectors.

    Samples the RAW float embedding column (``emb_raw`` has
    (vec_id, embedding)) with a content-hash filter
    (``xxhash64(vec_id) % m == 0`` — partition-count independent),
    sorts by vec_id driver-side, and normalizes in numpy.  Collecting
    raw floats instead of a JVM-normalized array column keeps the two
    sampling jobs (count + collect) on the plain parquet scan — the
    higher-order-function normalization projection costs more per
    element than the whole numpy normalization does per sample.
    """
    import numpy as np

    n = emb_raw.count()
    if n > sample_cap:
        m = max(1, n // sample_cap)
        samp = emb_raw.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(m)) == 0)
    else:
        samp = emb_raw
    rows = sorted(samp.collect(), key=lambda r: r[0])[:sample_cap]
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    return X


def codebook_df(spark: SparkSession, cents: list, extra: dict | None = None):
    """A ONE-ROW DataFrame carrying a driver-trained codebook (plus
    optional extra nested-list columns), for ``crossJoin(broadcast(...))``
    into the frame that needs it.

    Why not a literal expression: building k*dim ``F.lit`` calls costs
    one py4j round-trip each (~1.5s at k=32, dim=64, measured), every
    time the query is PLANNED.  A one-row Arrow-created frame ships the
    same floats in one call, broadcasts once, and keeps the expression
    tree tiny — analysis time becomes independent of codebook size.
    """
    cols = {"cb": cents}
    cols.update(extra or {})

    def _typ(v):
        return "array<" + (_typ(v[0]) if isinstance(v[0], list) else "double") + ">"

    schema = ", ".join(f"{name}: {_typ(val)}" for name, val in cols.items())
    # one EXPLICIT slice: the default parallelize spreads this single
    # row over defaultParallelism pickled slices, so every broadcast
    # build pays a fleet of empty Python-worker tasks for one row
    return spark.createDataFrame(
        spark.sparkContext.parallelize([tuple(cols.values())], 1), schema
    )


def codebook_sims(cb: str = "cb"):
    """``array<struct<sim,cid>>`` of dot products between the
    unit-vector column ``en`` and a codebook carried in column ``cb``
    (crossJoin the `codebook_df` broadcast row to provide it).

    The codebook rides in as DATA, not as literals: a k*dim literal
    tree costs one py4j call per float to build and re-enters Catalyst
    analysis on every plan; a broadcast one-row frame ships once and
    keeps planning time independent of k.  (k separate
    ``aggregate(zip_with(en, <dim literals>))`` expressions were worse
    still — codebook embedded k times over, ~27s analysis+codegen at
    k=16, dim=64.)"""
    return F.transform(
        F.col(cb),
        lambda c, i: F.named_struct(
            F.lit("sim"),
            F.aggregate(
                F.zip_with(F.col("en"), c, lambda a, b: a * b),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            F.lit("cid"),
            i,
        ),
    )


def assign_topr_lists(
    vecs: DataFrame,
    cents: list,
    r: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``r`` centroid-list assignment of ``(id_col, vec_col)``
    vectors against a driver-trained codebook, computed in ONE
    ``mapInArrow`` stage with numpy — returns
    ``(centroid_id int, <id_col> bigint, en array<double>)``, one row
    per (vector, assigned list), with ``en`` the unit-normalized
    vector.

    This is the Arrow re-expression of the
    ``_unit -> crossJoin(codebook) -> codebook_sims -> array_sort ->
    reverse -> slice -> explode`` JVM pipeline (guide §4.2: Spark's
    higher-order functions evaluate INTERPRETED, outside whole-stage
    codegen — measured ~300 µs/row for k=16, dim=64 against ~1 µs/row
    for the same math as numpy array ops, plus ~2 s of one-time
    analysis/codegen for the HOF expression tree per session).  The
    codebook rides in the task closure (k*dim floats — tiny), so there
    is no crossJoin and no broadcast exchange at all.

    BIT-EXACT with the HOF formulation, which the planted-twin gates
    and the probe/assignment parity tests rely on:

    - the norm and every dot product accumulate SEQUENTIALLY over the
      dimension axis (one vectorized add per dimension), reproducing
      ``aggregate(zip_with(...), 0.0, (a,x) -> a+x)``'s left-fold IEEE
      rounding exactly — never ``np.dot``/``einsum``, whose pairwise /
      SIMD summation rounds differently;
    - ties rank sim-DESC then cid-DESC, exactly
      ``reverse(array_sort(struct(sim, cid)))``;
    - NaN sims rank LARGEST (Spark's sort order for NaN), so a
      zero-norm vector lands on the same lists either way.
    """
    import numpy as np

    C = np.asarray(cents, dtype=np.float64)
    k, dim = C.shape
    r = min(r, k)
    out_schema = f"centroid_id int, {id_col} bigint, en array<double>"

    def assign(batches):
        import pyarrow as pa

        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            ids = b.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            lst = b.column(1)
            lengths = lst.value_lengths().to_numpy(zero_copy_only=False)
            if not (lengths == dim).all():
                raise ValueError(
                    f"assign_topr_lists: expected {dim}-dim vectors, "
                    f"got lengths {set(lengths.tolist())}"
                )
            X = np.asarray(lst.flatten(), dtype=np.float64).reshape(n, dim)
            # sequential left-fold norm, then unit-normalize
            acc = np.zeros(n)
            for d in range(dim):
                acc = acc + X[:, d] * X[:, d]
            en = X / np.sqrt(acc)[:, None]
            # sequential left-fold dot against every centroid
            S = np.zeros((n, k))
            for d in range(dim):
                S = S + en[:, d][:, None] * C[:, d][None, :]
            # rank sim-desc, ties cid-desc; NaN ranks largest like Spark
            S_rank = np.where(np.isnan(S), np.inf, S)
            neg_cid = np.broadcast_to(-np.arange(k, dtype=np.int64), (n, k))
            order = np.lexsort((neg_cid, -S_rank), axis=1)
            top = order[:, :r]
            rep = np.repeat(np.arange(n), r)
            offsets = np.arange(0, (n * r + 1) * dim, dim, dtype=np.int32)
            en_arr = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(en[rep].ravel(), pa.float64()),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(top.ravel().astype(np.int32), pa.int32()),
                    pa.array(ids[rep], pa.int64()),
                    en_arr,
                ],
                names=["centroid_id", id_col, "en"],
            )

    return vecs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).mapInArrow(assign, out_schema)


def train_ivf_codebook(
    emb_raw: DataFrame, k: int = 16, iters: int = 10, sample_cap: int = 8192
) -> list:
    """Spherical k-means codebook over the raw embedding column,
    trained on a bounded deterministic sample driver-side
    (`normalized_sample`) — the way FAISS/ScaNN train coarse
    quantizers.

    Codebook quality needs only ~hundreds of vectors per centroid, so
    training cost is O(sample_cap * k * dim) numpy work regardless of
    corpus size; the full corpus is only ever touched by the JVM-side
    assignment projection in the caller.  (A distributed Lloyd loop was
    tried first: each iteration's tiny groupBy job paid ~2.5s of
    Catalyst analysis+codegen on the k*dim-literal assignment
    expression — 10s+ per query for no quality gain at any scale where
    a sample fits the driver.)

    Determinism: content-hash sample, sorted by vec_id; init is k
    evenly-spaced sample vectors; Lloyd is plain argmax/mean with ties
    broken by index.  Empty clusters keep their previous centroid.
    """
    import numpy as np

    X = normalized_sample(emb_raw, sample_cap)
    k = max(1, min(k, len(X)))
    step = max(1, len(X) // k)
    C = X[::step][:k].copy()
    for _ in range(iters):
        a = (X @ C.T).argmax(axis=1)
        for j in range(k):
            members = X[a == j]
            if len(members):
                v = members.sum(axis=0)
                C[j] = v / (np.linalg.norm(v) or 1.0)
    return [[float(x) for x in c] for c in C]


def train_pq_codebooks(
    emb_raw: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 10,
    sample_cap: int = 8192,
) -> list:
    """Per-subspace L2 k-means codebooks for product quantization,
    trained on the same bounded deterministic driver-side sample as
    :func:`train_ivf_codebook` (content-hash filter, sorted, evenly
    spaced init, index-tiebroken Lloyd — `normalized_sample`).
    Returns ``m`` codebooks of ``ksub`` centroids, each of dim/m
    floats — the classic Jegou et al. 2011 PQ trainer,
    O(sample_cap * ksub * dim) numpy work regardless of corpus size."""
    import numpy as np

    X = normalized_sample(emb_raw, sample_cap)
    dim = X.shape[1]
    sd = dim // m
    books = []
    for j in range(m):
        Xj = X[:, j * sd : (j + 1) * sd]
        kj = max(1, min(ksub, len(Xj)))
        step = max(1, len(Xj) // kj)
        C = Xj[::step][:kj].copy()
        for _ in range(iters):
            d2 = ((Xj[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(kj):
                members = Xj[a == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append([[float(x) for x in c] for c in C])
    return books


def pq_subspace_sims(j: int, sd: int, books: str = "books"):
    """``array<struct<sim,cid>>`` of dot products between subvector
    ``j`` of the unit-vector column ``en`` and subspace ``j``'s
    codebook, read from the nested-array column ``books`` (crossJoin
    the `codebook_df` broadcast row — data, not literals; see
    codebook_sims for why)."""
    sub = F.slice(F.col("en"), j * sd + 1, sd)
    return F.transform(
        F.element_at(F.col(books), j + 1),
        lambda c, i: F.named_struct(
            F.lit("sim"),
            F.aggregate(
                F.zip_with(sub, c, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
            ),
            F.lit("cid"),
            i,
        ),
    )


# ---------------------------------------------------------------------------
# shared plumbing
# ---------------------------------------------------------------------------
def _unit(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"):
    """(vec_id, en) with en unit-normalized, norm computed in its own
    projection so it evaluates once per row, not once per element."""
    norm = F.sqrt(
        F.aggregate(F.col("ed"), F.lit(0.0), lambda a, x: a + x * x)
    )
    return (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("ed"),
        )
        .withColumn("nrm", norm)
        .select("vec_id", F.transform("ed", lambda x: x / F.col("nrm")).alias("en"))
    )


def _swap_in(staging: str, path: str) -> None:
    """Atomic-with-backup directory promotion (same protocol as
    ``sources.layout.compact_parquet``; artifacts are vacuum-safe).

    A concurrent reader's ``_recover`` may promote OUR complete
    staging before this writer reaches its critical section — the
    shared `sources.layout.promote_staging` treats that as a no-op
    success (see its docstring)."""
    promote_staging(staging, path, marker=META_NAME)


def _recover(path: str) -> None:
    """Roll the staged swap forward after a crash.

    ``_swap_in`` has a window between demoting the live dir to
    ``.old`` and promoting ``.staging`` where NO live index exists; a
    crash there would otherwise fail every probe with
    FileNotFoundError until a manual rebuild, with the complete
    ``.staging``/``.old`` copies sitting unrecovered (mirrors
    ``streaming.materialize._recover``).  A complete copy is one whose
    meta file exists — the meta is always written last, so a mid-build
    staging dir is never promoted.  Preference order: ``.staging``
    (the newer artifact — the interrupted swap's whole point) then
    ``.old``.  The cheap already-live check runs unlocked (the hot
    probe path takes no lock); the promotion itself serializes with
    ``_swap_in`` and other recoveries, re-checking liveness inside the
    lock.

    The non-promoted sibling is removed only if it is itself COMPLETE
    (has meta): an incomplete ``.staging`` next to a complete ``.old``
    may be a live writer's in-progress rebuild — deleting it would let
    that writer commit a gutted index once its meta lands (review
    finding); incomplete leftovers are the age-guarded vacuum's job,
    not recovery's."""
    if os.path.exists(os.path.join(path, META_NAME)):
        return
    with dir_swap_lock(path):
        if os.path.exists(os.path.join(path, META_NAME)):
            return  # a concurrent swap/recovery already made it live
        staging = path.rstrip("/") + ".staging"
        backup = path.rstrip("/") + ".old"
        for cand, other in ((staging, backup), (backup, staging)):
            if os.path.exists(os.path.join(cand, META_NAME)):
                shutil.rmtree(path, ignore_errors=True)
                os.replace(cand, path)
                if os.path.exists(os.path.join(other, META_NAME)):
                    shutil.rmtree(other, ignore_errors=True)
                return


def read_meta(index_dir: str) -> dict:
    _recover(index_dir)
    with open(os.path.join(index_dir, META_NAME)) as f:
        return json.load(f)


def write_meta(dir_path: str, meta: dict) -> None:
    """Durably write ``_ann_meta.json`` into ``dir_path``: fsynced temp
    file + atomic rename (one shared implementation for the build,
    append and streaming paths — the sequence was previously copied in
    five places)."""
    tmp = os.path.join(dir_path, META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(dir_path, META_NAME))


# ---------------------------------------------------------------------------
# IVF index
# ---------------------------------------------------------------------------
def build_ivf_index(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    k: int = 16,
    replicas: int = 3,
    iters: int = 10,
    sample_cap: int = 8192,
) -> dict:
    """Train + assign + persist an IVF index for ``emb``
    (``vec_id``, ``embedding``).  Returns the meta dict.

    Layout (all under ``index_dir``, committed by one directory swap):

    - ``codebook.parquet`` — k rows (cid int, centroid array<double>)
    - ``assignments.parquet/centroid_id=C/`` — the inverted lists,
      Hive-partitioned by list id, rows (vec_id, en); probes prune to
      their nprobe partitions, so bytes read scale with nprobe/k
    - ``_ann_meta.json`` — k, replicas, dim, n_vectors, kind

    The unit-normalized vector is stored WITH the list entry: the
    probe-time scan then feeds dot products directly — no join back to
    the raw corpus, the classic space-for-read-locality trade every
    IVF implementation makes.
    """
    cents = train_ivf_codebook(emb, k=k, iters=iters, sample_cap=sample_cap)
    # Arrow+numpy assignment (bit-identical to the former codebook_sims
    # HOF pipeline — see assign_topr_lists): one mapInArrow stage, no
    # crossJoin, ~300x less per-row compute at any corpus size
    lists = assign_topr_lists(emb, cents, replicas)

    staging = index_dir.rstrip("/") + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    cb_rows = [(i, c) for i, c in enumerate(cents)]
    # one EXPLICIT slice: createDataFrame(list) parallelizes into
    # defaultParallelism pickled slices, and coalesce(1) then pulls
    # all of them SEQUENTIALLY through one task — ~32 Python-worker
    # round-trips in series, measured 4-5 s for 16 rows.  A 1-slice
    # parallelize is one worker call (~0.3 s) and the same one file.
    spark.createDataFrame(
        spark.sparkContext.parallelize(cb_rows, 1),
        "cid int, centroid array<double>",
    ).write.parquet(os.path.join(staging, "codebook.parquet"))
    (
        lists.write.partitionBy("centroid_id").parquet(
            os.path.join(staging, "assignments.parquet")
        )
    )
    meta = {
        "kind": "ivf",
        "k": len(cents),
        "replicas": replicas,
        "dim": len(cents[0]),
        "n_vectors": emb.count(),
    }
    write_meta(staging, meta)
    _swap_in(staging, index_dir)
    return meta


def _load_codebook(spark: SparkSession, index_dir: str) -> list:
    _recover(index_dir)
    rows = (
        spark.read.parquet(os.path.join(index_dir, "codebook.parquet"))
        .orderBy("cid")
        .collect()
    )
    return [list(r["centroid"]) for r in rows]


def probe_ivf_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    nprobe: int = 6,
    k: int = 5,
) -> DataFrame:
    """Top-``k`` cosine neighbors for each query vector (``vec_id``,
    ``embedding``) from a persisted IVF index — NO training, no pass
    over the corpus beyond the probed lists.

    The probed list ids become an ``isin`` partition filter on the
    assignments table, so the scan reads only nprobe/k of the index
    bytes (PartitionFilters in the plan).  The query side is broadcast
    (queries are few); scoring is JVM dot products; per-query top-k is
    a window over candidates."""
    cents = _load_codebook(spark, index_dir)
    probes = assign_topr_lists(queries, cents, nprobe).select(
        F.col("vec_id").alias("query_id"),
        F.col("en").alias("qe"),
        "centroid_id",
    )
    lists = spark.read.parquet(os.path.join(index_dir, "assignments.parquet"))
    tombs = _tombstones(spark, index_dir)
    if tombs is not None:
        # deleted vectors never surface: tombstones are small until
        # compaction, so the anti-join broadcasts
        lists = lists.join(
            F.broadcast(tombs.select("vec_id").distinct()), "vec_id", "left_anti"
        )
    cands = (
        lists.join(F.broadcast(probes), "centroid_id")
        .dropDuplicates(["query_id", "vec_id"])
        .withColumnRenamed("vec_id", "neighbor_id")
    )
    dot = F.aggregate(
        F.zip_with("qe", "en", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    w_top = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("sim", dot)
        .withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("cosine"))
    )


def append_ivf_index(
    spark: SparkSession, index_dir: str, new_emb: DataFrame
) -> dict:
    """Fold new vectors into a persisted IVF index WITHOUT retraining:
    assign against the existing codebook, append the new list entries,
    bump the meta count.  Cost is O(|increment| * k) projections plus
    the append write — never a corpus pass (pairs with
    ``dedup_incremental``'s batch-vs-corpus pattern).

    The standard IVF contract applies: appended vectors are indexed
    under the FROZEN codebook, so list balance decays as the
    distribution drifts; rebuild (``build_ivf_index``) when the drift
    or the append fraction warrants.  Appends are new files inside
    existing list partitions — concurrent probes see either the old or
    the new file set, both complete answers over their respective
    vector sets.

    Maintenance ops (append / delete / compact / recover) serialize
    under ``dir_swap_lock``: the append + meta update is one critical
    section, so a concurrent compaction can neither interleave its
    swap between them nor silently drop this increment (its conflict
    check sees the new files).  The vector count comes from the files
    this call just WROTE — re-executing the caller's ``new_emb`` plan
    for a count would run it twice and desynchronize the meta when the
    plan is non-deterministic (r5 review)."""
    cents = _load_codebook(spark, index_dir)
    adir = os.path.join(index_dir, "assignments.parquet")
    with dir_swap_lock(index_dir):
        meta = read_meta(index_dir)
        lists = assign_topr_lists(new_emb, cents, meta["replicas"])
        before = _data_files(adir)
        lists.write.mode("append").partitionBy("centroid_id").parquet(adir)
        new = [os.path.join(adir, f) for f in _data_files(adir) - before]
        n_new = (
            spark.read.parquet(*new).select("vec_id").distinct().count()
            if new
            else 0
        )
        meta["n_vectors"] += n_new
        write_meta(index_dir, meta)
    return meta


TOMBSTONES = "tombstones.parquet"


def _data_files(root: str) -> set:
    """Relative paths of data files under ``root`` (recursive),
    excluding ``_SUCCESS``/dot markers.  Parquet jobs only ever ADD
    uniquely-named part files inside a live artifact (removal happens
    solely via the locked staged swap), so set difference on this
    listing is both an exact new-rows detector (count what an append
    just wrote without re-executing the caller's plan) and a sound
    concurrent-maintenance conflict detector for compaction."""
    out = set()
    if not os.path.exists(root):
        return out
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            out.add(os.path.relpath(os.path.join(dirpath, f), root))
    return out


def delete_from_ivf_index(
    spark: SparkSession, index_dir: str, ids: DataFrame, id_col: str = "vec_id"
) -> dict:
    """Mark vectors deleted in a persisted IVF index WITHOUT touching
    the inverted lists: the id set appends to ``tombstones.parquet``
    and probes anti-join it.  Cost is O(|delete|) — the same
    increment-not-corpus economics as :func:`append_ivf_index` — and
    concurrent probes see either the old or the new tombstone file
    set, both consistent answer sets.

    ``n_deleted`` in the meta counts tombstone ROWS (ids never present
    in the index still cost a tombstone row until compaction; the
    exact live count is recomputed by :func:`compact_ivf_index`).
    Contract: ids are append-once — a re-appended id stays masked by
    its tombstone until compaction clears it.

    The append + meta update runs under ``dir_swap_lock`` (maintenance
    ops serialize; probes stay lock-free), and the row count comes
    from the tombstone files this call just wrote — never from a
    second execution of the caller's ``ids`` plan (r5 review: a
    non-deterministic ids source desynchronized meta from the written
    rows, and every delete paid a redundant job)."""
    tids = ids.select(F.col(id_col).cast("long").alias("vec_id")).distinct()
    tdir = os.path.join(index_dir, TOMBSTONES)
    with dir_swap_lock(index_dir):
        meta = read_meta(index_dir)
        before = _data_files(tdir)
        tids.write.mode("append").parquet(tdir)
        new = [os.path.join(tdir, f) for f in _data_files(tdir) - before]
        n_new = spark.read.parquet(*new).count() if new else 0
        meta["n_deleted"] = int(meta.get("n_deleted", 0)) + n_new
        write_meta(index_dir, meta)
    return meta


def _tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    p = os.path.join(index_dir, TOMBSTONES)
    if not os.path.exists(p):
        return None
    return spark.read.parquet(p)


def compact_ivf_index(spark: SparkSession, index_dir: str, attempts: int = 3) -> dict:
    """Fold tombstones into the index: rewrite the assignments table
    minus the deleted ids under the FROZEN codebook, recompute the
    exact live-vector count, and publish via the same staged atomic
    swap as a rebuild (crash-safe; readers never see a partial index;
    the shared ``promote_staging`` protocol applies).  Run when the
    tombstone fraction makes the probe-side anti-join or the dead-row
    scan fraction worth reclaiming — the OPTIMIZE step of the delete
    leg, exactly like ``compact_parquet`` for small files.

    Concurrency (r5 review): the long rewrite runs UNLOCKED, so a
    delete/append can land in the live dir meanwhile — swapping the
    stale rewrite in would silently discard those rows (a delete's
    "successfully deleted" ids would resurrect).  The swap therefore
    happens inside ``dir_swap_lock`` only after verifying the live
    file set (assignments + tombstones, snapshotted before the
    rewrite and read AS that exact snapshot) is unchanged; on conflict
    the rewrite retries against the fresh state, ``attempts`` times,
    then raises — quiesce maintenance traffic or retry later."""
    staging = index_dir.rstrip("/") + ".staging"
    adir = os.path.join(index_dir, "assignments.parquet")
    tdir = os.path.join(index_dir, TOMBSTONES)
    for _ in range(attempts):
        snap_a = _data_files(adir)
        snap_t = _data_files(tdir)
        shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(staging)
        shutil.copytree(
            os.path.join(index_dir, "codebook.parquet"),
            os.path.join(staging, "codebook.parquet"),
        )
        # read the SNAPSHOTS, not the dirs: files appended mid-job must
        # not leak into a rewrite that claims to be of the snapshot
        lists = spark.read.option("basePath", adir).parquet(
            *[os.path.join(adir, f) for f in sorted(snap_a)]
        )
        if snap_t:
            tombs = spark.read.parquet(
                *[os.path.join(tdir, f) for f in sorted(snap_t)]
            )
            lists = lists.join(
                F.broadcast(tombs.select("vec_id").distinct()),
                "vec_id",
                "left_anti",
            )
        lists.select("vec_id", "en", "centroid_id").write.partitionBy(
            "centroid_id"
        ).parquet(os.path.join(staging, "assignments.parquet"))
        n_live = (
            spark.read.parquet(os.path.join(staging, "assignments.parquet"))
            .select("vec_id")
            .distinct()
            .count()
        )
        with dir_swap_lock(index_dir):
            if _data_files(adir) != snap_a or _data_files(tdir) != snap_t:
                continue  # maintenance landed mid-rewrite; retry fresh
            meta = read_meta(index_dir)
            meta["n_vectors"] = n_live
            meta["n_deleted"] = 0
            write_meta(staging, meta)
            promote_staging(staging, index_dir, marker=META_NAME, assume_locked=True)
            return meta
    raise RuntimeError(
        f"compact_ivf_index: live index at {index_dir!r} changed during "
        f"each of {attempts} rewrite attempts (concurrent append/delete "
        "traffic); quiesce maintenance or retry later"
    )


# ---------------------------------------------------------------------------
# PQ index
# ---------------------------------------------------------------------------
def build_pq_index(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    m: int = 8,
    ksub: int = 32,
    iters: int = 10,
    sample_cap: int = 8192,
    books: list | None = None,
) -> dict:
    """Train per-subspace codebooks and persist the m-byte PQ codes
    for every corpus vector (``codes.parquet``: vec_id, codes
    array<int>, en array<double>), plus ``books.parquet`` (one row,
    nested codebooks) and meta — the compressed-index artifact whose
    code table is ~32x smaller than the raw vectors.  The raw unit
    vector rides along for exact refine locality (drop ``en`` by
    passing store_vectors=False in a future knob if the corpus table
    is co-resident).

    ``books`` (optional) supplies PRECOMPUTED per-subspace codebooks
    (``m`` lists of centroids, each dim/m floats), skipping the
    sampling trainer — the FAISS pattern of attaching an externally
    trained quantizer.  Encoding, persistence, and probe behavior are
    identical either way; ``similarity_ann_pq_planted`` uses this to
    drive the full ADC path through a closed-form grid codebook whose
    expected output is exact arithmetic."""
    if books is None:
        books = train_pq_codebooks(
            emb, m=m, ksub=ksub, iters=iters, sample_cap=sample_cap
        )
    else:
        # a shape-mismatched external codebook would not error — the
        # encode's zip_with against wrong-length centroids yields NULL
        # sims and garbage codes PERSIST silently (r8 review); validate
        # every dimension that the encode relies on before writing
        if len(books) != m:
            raise ValueError(f"expected {m} codebooks, got {len(books)}")
        sd0 = len(books[0][0]) if books[0] else 0
        for j, bk in enumerate(books):
            if not bk or any(len(c) != sd0 for c in bk):
                raise ValueError(
                    f"codebook {j} is empty or ragged (expected {sd0}-dim "
                    "centroids in every subspace)"
                )
        row = emb.select(F.size(F.col("embedding")).alias("d")).first()
        if row is not None and row["d"] != m * sd0:
            raise ValueError(
                f"codebooks cover {m}x{sd0}={m * sd0} dims but the "
                f"embedding column is {row['d']}-dimensional"
            )
    sd = len(books[0][0])
    half_sq = [[sum(x * x for x in c) / 2.0 for c in books[j]] for j in range(m)]
    cbdf = codebook_df(spark, books, extra={"halfsq": half_sq})
    embc = _unit(emb).crossJoin(F.broadcast(cbdf))
    codes = F.array(
        *[
            F.element_at(
                F.reverse(
                    F.array_sort(
                        F.transform(
                            pq_subspace_sims(j, sd, books="cb"),
                            lambda s: F.named_struct(
                                F.lit("sim"),
                                s["sim"]
                                - F.element_at(
                                    F.element_at(F.col("halfsq"), j + 1),
                                    s["cid"] + 1,
                                ),
                                F.lit("cid"),
                                s["cid"],
                            ),
                        )
                    )
                ),
                1,
            )["cid"]
            for j in range(m)
        ]
    )
    enc = embc.select("vec_id", codes.alias("codes"), "en")

    staging = index_dir.rstrip("/") + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    # same one-row frame already broadcast into the encode — reuse it
    cbdf.coalesce(1).write.parquet(os.path.join(staging, "books.parquet"))
    enc.write.parquet(os.path.join(staging, "codes.parquet"))
    meta = {
        "kind": "pq",
        "m": m,
        "ksub": len(books[0]),
        "sd": sd,
        "n_vectors": emb.count(),
    }
    write_meta(staging, meta)
    _swap_in(staging, index_dir)
    return meta


def append_pq_index(
    spark: SparkSession, index_dir: str, new_emb: DataFrame
) -> dict:
    """Fold new vectors into a persisted PQ index without retraining:
    encode the increment with the FROZEN per-subspace codebooks and
    append the codes — the PQ twin of :func:`append_ivf_index`, same
    contract (codebooks drift only on explicit rebuild; appends are
    new files, concurrent probes see a complete old or new file set).
    Cost is O(|increment| * m * ksub) JVM projections plus the append
    write."""
    meta = read_meta(index_dir)
    m, sd = meta["m"], meta["sd"]
    books_row = spark.read.parquet(os.path.join(index_dir, "books.parquet"))
    embc = _unit(new_emb).crossJoin(F.broadcast(books_row))
    codes = F.array(
        *[
            F.element_at(
                F.reverse(
                    F.array_sort(
                        F.transform(
                            pq_subspace_sims(j, sd, books="cb"),
                            lambda s: F.named_struct(
                                F.lit("sim"),
                                s["sim"]
                                - F.element_at(
                                    F.element_at(F.col("halfsq"), j + 1),
                                    s["cid"] + 1,
                                ),
                                F.lit("cid"),
                                s["cid"],
                            ),
                        )
                    )
                ),
                1,
            )["cid"]
            for j in range(m)
        ]
    )
    enc = embc.select("vec_id", codes.alias("codes"), "en")
    enc.write.mode("append").parquet(os.path.join(index_dir, "codes.parquet"))
    meta["n_vectors"] += new_emb.count()
    write_meta(index_dir, meta)
    return meta


def probe_pq_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    refine: int = 256,
    k: int = 5,
) -> DataFrame:
    """ADC scan of the persisted code table + exact top-``refine``
    re-rank, emitting true-cosine top-``k`` per query — the
    FAISS ``search`` half of :func:`build_pq_index`, with lookup
    tables computed from the PERSISTED codebooks (no retraining)."""
    meta = read_meta(index_dir)
    m, sd = meta["m"], meta["sd"]
    books_row = spark.read.parquet(os.path.join(index_dir, "books.parquet"))
    qunit = _unit(queries).crossJoin(F.broadcast(books_row))
    tabs = F.array(
        *[
            F.transform(pq_subspace_sims(j, sd, books="cb"), lambda s: s["sim"])
            for j in range(m)
        ]
    )
    q = qunit.select(
        F.col("vec_id").alias("query_id"),
        F.col("en").alias("qe"),
        tabs.alias("tabs"),
    )
    enc = spark.read.parquet(os.path.join(index_dir, "codes.parquet"))
    adc = F.aggregate(
        F.zip_with("tabs", "codes", lambda t, c: F.element_at(t, c + 1)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    cands = (
        enc.withColumnRenamed("vec_id", "neighbor_id")
        .crossJoin(F.broadcast(q))
        .withColumn("adc", adc)
        .withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= refine)
    )
    dot = F.aggregate(
        F.zip_with("qe", "en", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    w_top = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("sim", dot)
        .withColumn("rn2", F.row_number().over(w_top))
        .filter(F.col("rn2") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("cosine"))
    )
