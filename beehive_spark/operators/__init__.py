"""Primitive dataflow operators (pure DataFrame -> DataFrame functions).

Each operator re-expresses one behavior class from the reference
(SURVEY.md §2) as declarative Spark, designed so Catalyst/AQE pick
the physical strategy (broadcast vs shuffle) at any scale; graph/
temporal/skew are net-new capabilities beyond the reference surface.
"""

from beehive_spark.operators.ids import assign_ids, next_id_base
from beehive_spark.operators.remap import remap_fks
from beehive_spark.operators.consolidate import consolidate, disjunctive_match
from beehive_spark.operators.checks import (
    orphan_check,
    uuid_collisions,
    regenerate_uuids,
    reconcile,
    ReconciliationError,
)
from beehive_spark.operators.graph import bfs_levels
from beehive_spark.operators.skew import salted_join
from beehive_spark.operators.temporal import asof_join
from beehive_spark.operators.scd import scd2_merge, scd2_snapshot

__all__ = [
    "assign_ids",
    "next_id_base",
    "remap_fks",
    "consolidate",
    "disjunctive_match",
    "orphan_check",
    "uuid_collisions",
    "regenerate_uuids",
    "reconcile",
    "ReconciliationError",
    "bfs_levels",
    "salted_join",
    "asof_join",
    "scd2_merge",
    "scd2_snapshot",
]
