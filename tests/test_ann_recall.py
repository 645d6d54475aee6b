"""ANN quality floors: recall@5 vs the exact brute-force baseline.

The planted twins (similarity_ann_*_planted) hash-gate each pipeline's
ALGEBRA; nothing there notices a codebook trained on garbage, an
nprobe that stops probing, or LSH planes that collapsed — those bugs
only move RECALL on a real corpus.  This pins per-method floors at
sf0.01 (measured r9: ivf 0.96, pq 1.00, lsh 0.68 — see RECALL.json /
STRESS.md §ANN recall for both scales); the floors sit far enough
below the measured values to absorb corpus vintage noise while still
failing on any structural quality regression.
"""

import os

import pytest

from beehive_spark.queries.llm import (
    similarity_ann_ivf,
    similarity_ann_lsh,
    similarity_ann_pq,
    similarity_cosine_topk,
)

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="sf0.01 testdata not present"
)


def _recall(spark, ann_fn):
    exact: dict[int, set[int]] = {}
    for r in similarity_cosine_topk(spark, SF_DIR).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ann: dict[int, set[int]] = {}
    for r in ann_fn(spark, SF_DIR).collect():
        ann.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    per_q = [
        len(exact[q] & ann.get(q, set())) / len(exact[q]) for q in sorted(exact)
    ]
    return sum(per_q) / len(per_q)


@pytest.mark.parametrize(
    "ann_fn,floor",
    [
        (similarity_ann_ivf, 0.90),   # measured 1.00 (nprobe 8, reps 5, r11)
        (similarity_ann_pq, 0.90),    # measured 1.00
        (similarity_ann_lsh, 0.90),   # measured 1.00 (3 probes, 5 bands, r11)
    ],
    ids=["ivf", "pq", "lsh"],
)
def test_recall_floor(spark, ann_fn, floor):
    rec = _recall(spark, ann_fn)
    assert rec >= floor, (
        f"{ann_fn.__name__} recall@5 {rec:.3f} fell below the {floor} floor "
        "— codebook/probe/plane quality regression (hash gates stay green "
        "on this class of bug; see RECALL.json for the measured baseline)"
    )
