from beehive_spark.sources.readers import Endpoint, read_table, table_exists
from beehive_spark.sources.writers import (
    append_table,
    build_upsert_sql,
    upsert_partition,
    upsert_jdbc,
)

__all__ = [
    "Endpoint",
    "read_table",
    "table_exists",
    "append_table",
    "build_upsert_sql",
    "upsert_partition",
    "upsert_jdbc",
]
