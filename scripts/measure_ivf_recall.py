"""Measure ANN top-5 recall (IVF and PQ) vs the brute-force baseline.

Recall@5 = |ANN top-5 ∩ exact top-5| / 5, averaged over the 10 query
vectors.  Run at both oracle scales:

    PYTHONPATH=/root/repo python scripts/measure_ivf_recall.py

The measured numbers are quoted in the similarity_ann_ivf and
similarity_ann_pq docstrings; re-run this after touching codebook
training, probe logic, or PQ encoding.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beehive_spark.session import get_spark
from beehive_spark.queries.llm import (
    similarity_ann_ivf,
    similarity_ann_pq,
    similarity_cosine_topk,
)


def recall_at(spark, sf_dir, ann_fn=similarity_ann_ivf, **kw):
    exact = {}
    for r in similarity_cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ann = {}
    for r in ann_fn(spark, sf_dir, **kw).collect():
        ann.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    per_q = [
        len(exact[q] & ann.get(q, set())) / len(exact[q]) for q in sorted(exact)
    ]
    return sum(per_q) / len(per_q), per_q


def main():
    spark = get_spark()
    for sf in ("sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        for name, fn in (("ivf", similarity_ann_ivf), ("pq", similarity_ann_pq)):
            rec, per_q = recall_at(spark, sf_dir, ann_fn=fn)
            print(
                f"{sf} {name}: recall@5 = {rec:.3f}"
                f"  per-query = {[round(r, 2) for r in per_q]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
