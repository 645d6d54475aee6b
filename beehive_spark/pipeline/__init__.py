"""Merge-pipeline layer: declarative table specs + two-phase DAG runner.

Re-expresses the reference's 31-table OpenMRS merge (orchestrator.js
+ one hand-written mover module per table family) as data: every
table is a TableSpec; one generic runner interprets all of them.
"""

from beehive_spark.pipeline.specs import TableSpec, SPECS, AUDIT_V_FKS, AUDIT_R_FKS
from beehive_spark.pipeline.merge import MergePipeline, MergeResult

__all__ = [
    "TableSpec",
    "SPECS",
    "AUDIT_V_FKS",
    "AUDIT_R_FKS",
    "MergePipeline",
    "MergeResult",
]
