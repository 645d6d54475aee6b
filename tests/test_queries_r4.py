"""Semantic invariants for the round-4 query batch.

Same contract as test_queries_r3: the driver's differential gate
proves Spark == DuckDB where an oracle exists; these pin properties
both engines could get wrong together, plus invariants for the
rows-only (iterative) queries the gate can't hash-check."""

import pytest
from pyspark.sql import functions as F

from beehive_spark.queries import all_queries, load


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def test_copurchase_pagerank_is_a_distribution_head(spark, sf_dir, qs):
    rows = qs["pagerank_copurchase"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    # ranks are probabilities, emitted in deterministic descending order
    assert all(0.0 < r["rank"] < 1.0 for r in rows)
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # every scored node is a real part co-purchased at least once
    parts = {
        r["l_partkey"]
        for r in load(spark, sf_dir, "lineitem").select("l_partkey").collect()
    }
    assert all(r["id"] in parts for r in rows)


def test_copurchase_pagerank_early_exit_matches_capped_run(spark, sf_dir):
    """tol must change WHEN iteration stops, never WHAT it converges
    to: the early-exited ranks agree with a longer capped run to well
    inside the tolerance."""
    from beehive_spark.operators.graph import pagerank
    from beehive_spark.queries.relational import copurchase_edges

    edges = copurchase_edges(load(spark, sf_dir, "lineitem"))
    early = {r["id"]: r["rank"] for r in pagerank(edges, iters=30, tol=1e-6).collect()}
    capped = {r["id"]: r["rank"] for r in pagerank(edges, iters=25, tol=None).collect()}
    assert early.keys() == capped.keys()
    assert max(abs(early[k] - capped[k]) for k in early) < 1e-6


def test_image_resize_matches_numpy_reference(spark, sf_dir, qs):
    """Independent check of the real decode+resample path: re-derive
    the expected cell values with numpy's own nearest-neighbor
    indexing over the synthesized gradient (not the closed form the
    oracle uses), and check coverage/shape."""
    import numpy as np

    rows = qs["media_image_resize"](spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents").count()
    assert len(rows) == docs * 16
    assert all(r["out_bytes"] == 48 for r in rows)
    base = np.arange(256, dtype=np.int64).reshape(16, 16)
    ys = np.minimum((np.arange(4) * 16) // 4, 15)
    for r in rows[:64]:
        gray = (r["media_id"] + base) % 256
        want = gray[ys][:, ys][r["cy"], r["cx"]]
        assert r["px_val"] == want


def test_embedding_gram_is_psd_consistent(spark, sf_dir, qs):
    """Properties both engines could get wrong together: the Gram
    matrix must be symmetric-by-construction (upper triangle only),
    Cauchy-Schwarz-consistent, and match a dense numpy X^T X."""
    import numpy as np

    rows = qs["embedding_gram"](spark, sf_dir).collect()
    d = max(r["j"] for r in rows) + 1
    assert len(rows) == d * (d + 1) // 2
    g = {(r["i"], r["j"]): r["gram"] for r in rows}
    assert all(g[(i, i)] >= 0 for i in range(d))
    assert all(
        g[(i, j)] ** 2 <= g[(i, i)] * g[(j, j)] + 1e-6
        for (i, j) in g
    )
    x = np.array(
        [
            r["embedding"]
            for r in load(spark, sf_dir, "embeddings").collect()
        ],
        dtype=np.float64,
    )
    want = x.T @ x
    err = max(abs(want[i, j] - g[(i, j)]) for (i, j) in g)
    assert err < 1e-5, err
