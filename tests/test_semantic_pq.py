"""dedup_semantic and similarity_ann_pq quality regressions.

Both operators are approximate-by-construction (cluster/quantize
first, exact math second), so the driver runs rows-only checks; these
tests pin the quality floor against exact numpy/brute-force truth so a
codebook-training or assignment regression fails fast.  All inputs and
parameters are deterministic (hash-sampled training, fixed init), so
the pinned numbers are exact at the test SF, not flaky bounds.
"""

import numpy as np
import pyarrow.parquet as pq

from beehive_spark.queries.llm import (
    dedup_semantic,
    similarity_ann_pq,
    similarity_cosine_topk,
)


def _exact_sims(sf_dir):
    t = pq.read_table(sf_dir + "/embeddings.parquet").to_pandas()
    X = np.stack(t["embedding"].apply(lambda v: np.asarray(v, dtype=np.float64)))
    ids = t["vec_id"].to_numpy()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    return ids, Xn @ Xn.T


def test_semantic_dedup_exact_precision(spark, sf_dir):
    """Every emitted (keep, drop) pair must be a true >=threshold pair
    — the within-cluster cosine is exact, so precision is 1.0."""
    ids, S = _exact_sims(sf_dir)
    id2i = {int(v): i for i, v in enumerate(ids)}
    rows = dedup_semantic(spark, sf_dir).collect()
    assert rows
    for r in rows:
        sim = S[id2i[r["keep_id"]], id2i[r["drop_id"]]]
        assert sim >= 0.45 - 1e-6, (r, sim)
        assert abs(sim - r["max_cosine"]) < 5e-4 or sim > r["max_cosine"]
        assert r["keep_id"] < r["drop_id"]


def test_semantic_dedup_drop_recall(spark, sf_dir):
    """With multi-assignment (replicas=3) the planted near-dup drops
    are all found at the test SF; top-1 assignment measured 0.29."""
    ids, S = _exact_sims(sf_dir)
    iu = np.triu_indices(len(ids), 1)
    hit = S[iu] >= 0.45
    exact_drops = {
        int(max(a, b))
        for a, b in zip(ids[iu[0][hit]], ids[iu[1][hit]])
    }
    got = {r["drop_id"] for r in dedup_semantic(spark, sf_dir).collect()}
    assert exact_drops, "test corpus lost its planted near-dups"
    recall = len(got & exact_drops) / len(exact_drops)
    assert recall >= 0.99, (recall, sorted(exact_drops - got))


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_pq_recall_at_least_090(spark, sf_dir):
    exact = _topk_sets(similarity_cosine_topk(spark, sf_dir))
    ann = _topk_sets(similarity_ann_pq(spark, sf_dir))
    assert exact
    per_q = [len(exact[q] & ann.get(q, set())) / len(exact[q]) for q in exact]
    assert sum(per_q) / len(per_q) >= 0.9, per_q


def test_pq_output_shape(spark, sf_dir):
    rows = similarity_ann_pq(spark, sf_dir).collect()
    assert {r["query_id"] for r in rows} == set(range(10))
    assert all(len([r for r in rows if r["query_id"] == q]) == 5 for q in range(10))
    assert all(-1.0001 <= r["cosine"] <= 1.0001 for r in rows)
