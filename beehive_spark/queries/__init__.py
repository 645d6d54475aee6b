"""Query registry — the engine's user-facing query surface.

Every operator class from SURVEY.md §2 (plus the generalized
LLM-data-pipeline operators) is exposed here as a named query:
``(spark, sf_dir) -> DataFrame`` with, where SQL-expressible, a
DuckDB-equivalent oracle SQL string for differential testing.

Contract (driver harness): column names AND types must match between
the Spark result and the oracle result; computed columns are aliased
identically on both sides; doubles are rounded identically on both
sides so order-insensitive value hashes agree.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# name -> (query_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def query(name: str, oracle: str | None = None):
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn):
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes nanosecond timestamps.

    The events table is written with TIMESTAMP(NANOS), which Spark's
    parquet reader only accepts as raw INT64 (nanosAsLong).  We set
    the conf at runtime (it is a dynamic SQL conf) so this also works
    under the driver harness's own SparkSession, then convert ns ->
    TimestampType so downstream queries see a real timestamp.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - conf may be locked; reads may still work
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


_loaded = False


def _ensure_loaded() -> None:
    global _loaded
    if not _loaded:
        # import for registration side effects
        from beehive_spark.queries import core  # noqa: F401
        from beehive_spark.queries import llm  # noqa: F401
        from beehive_spark.queries import relational  # noqa: F401
        from beehive_spark.queries import tpch  # noqa: F401

        _loaded = True
