"""Primitive dataflow operators (pure DataFrame -> DataFrame functions).

Each operator re-expresses one behavior class from the reference
(SURVEY.md §2) as declarative Spark, designed so Catalyst/AQE pick
the physical strategy (broadcast vs shuffle) at any scale.
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
]
