"""Bucketed exact-cosine dedup must reproduce the all-pairs baseline.

The LSH bucketing only limits which pairs are *considered*; verified
values are exact.  With the deterministic planes the pair set is stable,
and on the testdata corpus recall is 1.0 (measured also at sf0.01 and
sf0.1 — see the query docstring).
"""

from beehive_spark.queries.llm import dedup_embedding_bucketed, dedup_embedding_cosine


def test_bucketed_matches_all_pairs_baseline(spark, sf_dir):
    baseline = {
        (r["id_i"], r["id_j"]): r["cosine"]
        for r in dedup_embedding_cosine(spark, sf_dir).collect()
    }
    bucketed = {
        (r["id_i"], r["id_j"]): r["cosine"]
        for r in dedup_embedding_bucketed(spark, sf_dir).collect()
    }
    assert bucketed == baseline
    assert baseline  # non-empty at sf0.001
