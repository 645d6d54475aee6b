"""Iterative hierarchy traversal — the Spark replacement for the
reference's recursive user-creation-tree walk (J9,
person-users.js:568-601 ``createUserTree`` + 746-770
``traverseUserTree``).

The reference recurses row-at-a-time over ``users.creator``; here the
whole frontier advances per iteration as one distributed join, so a
hierarchy over N rows costs depth-many joins, not N queries.  Each
level is ``localCheckpoint``-ed to cut the growing lineage (the classic
iterative-algorithm trap on Spark) and the loop terminates on an empty
frontier, exactly like a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_levels(
    roots: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    child_col: str = "child_id",
    max_depth: int = 64,
) -> DataFrame:
    """Breadth-first depth assignment over a parent->child edge set.

    roots:  DataFrame with ``id_col`` — the depth-0 nodes.
    edges:  DataFrame with ``parent_col``, ``child_col``.
    Returns (id, depth) for every node reachable from the roots;
    a node reachable at several depths keeps its first (minimum)
    depth, matching recursive-CTE-with-DISTINCT semantics on trees
    and DAGs alike.
    """
    frontier = roots.select(F.col(id_col).cast("long").alias("id")).distinct()
    result = frontier.withColumn("depth", F.lit(0))
    seen = frontier
    for depth in range(1, max_depth + 1):
        nxt = (
            edges.join(
                frontier.select(F.col("id").alias(parent_col)),
                parent_col,
            )
            .select(F.col(child_col).cast("long").alias("id"))
            .distinct()
            .join(seen, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        result = result.unionByName(nxt.withColumn("depth", F.lit(depth)))
        seen = seen.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return result
