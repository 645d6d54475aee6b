"""similarity_ann_ivf trained-codebook recall regression.

Pins recall@5 >= 0.9 vs the brute-force baseline at the test SF, so a
codebook-training or probe-logic regression fails fast.  The quoted
docstring numbers (0.92 @ sf0.01 / 0.96 @ sf0.1) come from
scripts/measure_ivf_recall.py over the larger scales.
"""

from beehive_spark.queries.llm import similarity_ann_ivf, similarity_cosine_topk


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall_at_least_090(spark, sf_dir):
    exact = _topk_sets(similarity_cosine_topk(spark, sf_dir))
    ann = _topk_sets(similarity_ann_ivf(spark, sf_dir))
    assert exact
    per_q = [len(exact[q] & ann.get(q, set())) / len(exact[q]) for q in exact]
    assert sum(per_q) / len(per_q) >= 0.9, per_q


def test_ivf_output_shape(spark, sf_dir):
    rows = similarity_ann_ivf(spark, sf_dir).collect()
    assert {r["query_id"] for r in rows} == set(range(10))
    assert all(len([r for r in rows if r["query_id"] == q]) == 5 for q in range(10))
    assert all(-1.0001 <= r["cosine"] <= 1.0001 for r in rows)
