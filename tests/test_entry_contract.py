"""Guards on the driver contract (__spark_entry__): the flagship
entry must produce rows, every oracle must belong to a registered
query, and registration must be collision-free."""

import pytest

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) == 10  # stable flagship schema


def test_registry_consistency():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 60
    # every oracle belongs to a registered query
    assert set(oracles) <= set(qs)
    # the approximate ops are the only rows-only entries
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_semantic",
        "similarity_ann_lsh",
        "similarity_ann_ivf",
        "similarity_ann_pq",
        "approx_sketches",
        "pagerank_hierarchy",
        "pagerank_copurchase",
        "sketch_uniques_rollup",
        "bpe_encode",
        # persisted-ANN lifecycle: manifest/probe results depend on the
        # trained codebook, so no SQL oracle (equivalence to the
        # in-query ANN paths is pinned in tests/test_ann_index.py)
        "ann_index_build",
        "ann_index_probe",
        "ann_index_delete",
        # iterative peeling (topology-bound rounds): brute-force pinned
        # in tests/test_graph.py; the registered query's full member
        # set + degrees equal a python peel of the real sf0.01 graph
        # (tests/test_queries_r5.py)
        "graph_kcore",
    }


@pytest.mark.slow  # heavy member of an otherwise-fast suite
def test_all_queries_run_at_smallest_sf(spark):
    """Every registered query must at least plan and execute at
    sf0.001 (the driver's smoke tier) — count() forces execution."""
    sf = "/root/testdata/sf0.001"
    failures = {}
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, sf).count()
        except Exception as e:  # pragma: no cover - report which broke
            failures[name] = repr(e)[:200]
    assert not failures, failures


def test_bench_tiers_are_registered_and_disjoint():
    """Every bench tier name must be a registered query (a typo'd tier
    entry would KeyError mid-bench and lose the round's record), the
    tiers must not overlap, and EXTRA must be duplicate-free (a dupe
    silently re-times one query and inflates the sweep-coverage
    census the close-commit message reports)."""
    import bench

    qs = set(entrymod.queries())
    assert set(bench.HEADLINE) <= qs
    assert set(bench.EXTRA) <= qs
    assert not set(bench.HEADLINE) & set(bench.EXTRA)
    assert len(bench.EXTRA) == len(set(bench.EXTRA))
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
