"""Unit tests for beehive_spark.operators.graph.bfs_levels — the
iterative replacement for the reference's recursive user tree
(person-users.js:568-601)."""

from pyspark.sql import functions as F

from beehive_spark.operators.graph import bfs_levels


def test_bfs_levels_tree(spark):
    # 1 -> {2, 3}, 2 -> {4}, 4 -> {5}
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (4, 5)], ["parent_id", "child_id"]
    )
    roots = spark.createDataFrame([(1,)], ["id"])
    got = {(r["id"], r["depth"]) for r in bfs_levels(roots, edges).collect()}
    assert got == {(1, 0), (2, 1), (3, 1), (4, 2), (5, 3)}


def test_bfs_levels_dag_min_depth(spark):
    # diamond: 1 -> 2 -> 4 and 1 -> 4 directly; 4 must keep depth 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 4), (1, 4)], ["parent_id", "child_id"]
    )
    roots = spark.createDataFrame([(1,)], ["id"])
    got = {(r["id"], r["depth"]) for r in bfs_levels(roots, edges).collect()}
    assert got == {(1, 0), (2, 1), (4, 1)}


def test_bfs_levels_unreachable_excluded(spark):
    edges = spark.createDataFrame([(1, 2), (8, 9)], ["parent_id", "child_id"])
    roots = spark.createDataFrame([(1,)], ["id"])
    ids = {r["id"] for r in bfs_levels(roots, edges).collect()}
    assert ids == {1, 2}


def test_bfs_levels_cycle_terminates(spark):
    # 1 -> 2 -> 3 -> 1: the seen-set must stop the loop
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], ["parent_id", "child_id"]
    )
    roots = spark.createDataFrame([(1,)], ["id"])
    got = {(r["id"], r["depth"]) for r in bfs_levels(roots, edges).collect()}
    assert got == {(1, 0), (2, 1), (3, 2)}


def test_bfs_levels_multiple_roots(spark):
    edges = spark.createDataFrame([(1, 3), (2, 4)], ["parent_id", "child_id"])
    roots = spark.createDataFrame([(1,), (2,)], ["id"])
    df = bfs_levels(roots, edges)
    assert df.filter(F.col("depth") == 0).count() == 2
    assert df.count() == 4
