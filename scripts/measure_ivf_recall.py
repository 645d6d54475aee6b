"""Measure ANN top-5 recall (IVF, PQ, sign-LSH) vs the brute-force
baseline, and emit the STRESS.md RECALL table.

Recall@5 = |ANN top-5 ∩ exact top-5| / 5, averaged over the 10 query
vectors.  The planted twins prove each pipeline is BIT-correct; this
measures whether the approximations are GOOD on the real corpus — a
codebook / nprobe / plane regression moves these numbers while every
hash gate stays green.  Run at both oracle scales:

    PYTHONPATH=/root/repo python scripts/measure_ivf_recall.py

Paste the emitted block into STRESS.md §RECALL after touching codebook
training, probe logic, PQ encoding, or the LSH planes;
tests/test_ann_recall.py pins per-method floors at sf0.01 so a silent
quality regression fails the suite, not just the table.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beehive_spark.session import get_spark
from beehive_spark.queries.llm import (
    similarity_ann_ivf,
    similarity_ann_lsh,
    similarity_ann_pq,
    similarity_cosine_topk,
)

METHODS = (
    ("ivf", similarity_ann_ivf),
    ("pq", similarity_ann_pq),
    ("lsh", similarity_ann_lsh),
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
    import json

    spark = get_spark()
    rows = []
    sidecar: dict[str, dict[str, dict[str, float]]] = {}
    for sf in ("sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        for name, fn in METHODS:
            rec, per_q = recall_at(spark, sf_dir, ann_fn=fn)
            rows.append((sf, name, rec, min(per_q)))
            sidecar.setdefault(sf, {})[name] = {
                "mean": round(rec, 3), "worst": round(min(per_q), 2),
            }
            print(
                f"{sf} {name}: recall@5 = {rec:.3f}"
                f"  per-query = {[round(r, 2) for r in per_q]}"
            )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "RECALL.json"), "w") as f:
        json.dump(sidecar, f, indent=2)
    print(f"wrote {os.path.join(root, 'RECALL.json')}")
    print("\n--- STRESS.md RECALL block ---\n")
    print("| sf | method | recall@5 (mean over 10 queries) | worst query |")
    print("|---|---|---|---|")
    for sf, name, rec, worst in rows:
        print(f"| {sf} | similarity_ann_{name} | {rec:.3f} | {worst:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
