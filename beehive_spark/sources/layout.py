"""Physical table layout for scale: partitioned and bucketed writes.

The reference has no layout concept — every scan is a full MySQL
table read (SURVEY.md §2.1 S2).  At 100 TB, layout IS the query plan:

- **Hive-style partitioning** (`write_partitioned`) turns equality /
  range predicates on the partition column into directory pruning —
  the scan never opens non-matching files (shows as PartitionFilters
  in the plan, bytes read drop proportionally).  Choose low-moderate
  cardinality columns (date, region); never a high-cardinality key
  (millions of tiny dirs kill the metastore and the filesystem).
- **Bucketing** (`write_bucketed`) pre-shuffles rows into a fixed
  number of hash buckets on the join/agg key AT WRITE TIME.  Two
  tables bucketed the same way join with ZERO runtime exchange —
  the single biggest lever for repeated large-fact joins (e.g. the
  merge pipeline's fact-to-mapping joins, run once per source
  instance).  Bucket count should approximate target parallelism;
  it is fixed at write time, so pick for the cluster, not the laptop.

Both are plain Spark writers — no custom file format — so Catalyst,
AQE, and any reader interoperate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | str,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet: one directory per partition value;
    predicates on ``partition_by`` columns prune at planning time."""
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str] | str,
    n_buckets: int = 32,
    sort_by: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed table.

    Equi-joins and aggregations on ``bucket_by`` between tables with
    the same bucket spec run without any Exchange; adding ``sort_by``
    lets sort-merge joins skip the sort as well.
    """
    keys = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_by:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sorts)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog;
    a plain path read would lose it)."""
    return spark.table(table)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str] | str,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet: rows range-partitioned AND sorted on
    ``cluster_by``, so every output file covers a disjoint value range.

    Parquet footers then carry tight min/max per file and row group;
    any reader (Spark, DuckDB, Trino) skips files whose range misses
    the predicate — the poor man's Z-order, and the right layout for
    the one column most queries filter on (e.g. event time).  Unlike
    Hive partitioning it handles high-cardinality/continuous columns
    without directory explosion."""
    cols = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int = 16,
    sort_within: list[str] | str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Final-stage training-data export: deterministic content-hash
    sharding with a row/byte manifest.  Returns the manifest DataFrame
    (shard, n_rows) after writing ``path/shard=K/`` parquet dirs and
    ``path/_manifest`` alongside.

    Shard assignment is ``xxhash64(key) mod n_shards`` — a pure
    function of the data, so the SAME rows land in the SAME shard on
    any cluster, any partitioning, any retry (dataloader resume and
    ablation reproducibility depend on this; Spark's default
    round-robin file split does not provide it).  Rows are
    repartitioned BY the shard column so each shard is written by one
    task (sequential reads per shard downstream), optionally sorted
    within the shard for curriculum or locality.  At 100 TB pick
    n_shards ~ total_bytes / desired_shard_bytes; the write itself is
    the only full-data pass, and the manifest aggregation reuses the
    same shuffle since it groups by the partition key.
    """
    from pyspark.sql import functions as F

    shard = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int")
    sharded = df.withColumn("shard", shard).repartition(n_shards, "shard")
    if sort_within:
        sorts = [sort_within] if isinstance(sort_within, str) else list(sort_within)
        sharded = sharded.sortWithinPartitions("shard", *sorts)
    sharded.write.mode(mode).partitionBy("shard").parquet(path)
    spark = df.sparkSession
    out = spark.read.parquet(path)
    manifest = out.groupBy("shard").agg(F.count(F.lit(1)).alias("n_rows"))
    manifest.coalesce(1).write.mode(mode).parquet(path + "/_manifest")
    return spark.read.parquet(path + "/_manifest")
