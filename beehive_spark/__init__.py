"""beehive_spark — a PySpark-native analytics/ETL engine.

Re-expresses the dataflow capabilities of the reference ETL merge
pipeline (mhawila/beehive, see SURVEY.md) as idiomatic, scale-first
Spark: declarative DataFrame plans, broadcast-join FK remapping,
semi/anti-join dedup and integrity checks, window-based ID
assignment, staged atomic publishing — plus a generalized analytics
layer (dedup, similarity search, text analysis, streaming) designed
for 100 TB workloads.

Nothing in this package is copied from the reference; it is a
from-scratch Spark-first design. Reference citations in docstrings
(``file:line``) point at /root/reference for behavioral parity only.
"""

__version__ = "0.1.0"

from beehive_spark.session import get_spark  # noqa: F401
