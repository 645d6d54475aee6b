"""Multi-format file sources and sinks: CSV, JSON(L), ORC, parquet.

The reference reads exactly one source shape — MySQL tables over a
mysql2 connection (connection.js:5-22) — so every interchange format
is net-new surface here.  A training-data pipeline ingests whatever
the upstream emits (CSV dumps, JSONL crawls, ORC/parquet lakes) and
re-emits columnar; these helpers make each leg explicit, schema-safe,
and scale-aware:

- **Reads take an explicit schema or an opt-in sample-bounded
  inference.**  Full-file schema inference is an extra pass over the
  data (at 100 TB, a second 100 TB scan before the first real one);
  `samplingRatio`/`read_jsonl(infer_rows=...)` bounds it, and
  production paths should pass the schema.
- **Text formats are row-oriented and splittable only when
  uncompressed (or zstd/bzip2) — never gzip for big files** (a .gz
  file is ONE split = one task however large).  The writers default
  to uncompressed CSV/JSONL shards sized by upstream partitioning and
  columnar (snappy/zstd) for parquet/ORC.
- **Round-trips preserve types** via DDL schema strings; CSV carries
  no types at all, JSON only JSON's, so both readers apply the
  declared schema rather than trusting the file.

All of it is plain `spark.read`/`df.write` — predicate pushdown and
column pruning work on ORC/parquet; CSV/JSON prune columns only
(shown in the plan's ReadSchema), which is exactly why the ingest
job's FIRST act is converting to columnar (`convert_to_parquet`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
    sampling_ratio: float = 0.1,
) -> DataFrame:
    """CSV with explicit schema (preferred) or bounded inference.

    ``mode=PERMISSIVE`` + ``_corrupt`` capture keeps one malformed row
    from failing a 100 TB ingest; callers filter/route the corrupt
    column instead (see `read_csv_strict` for the fail-fast variant).
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true").option(
            "samplingRatio", str(sampling_ratio)
        )
    return reader.csv(path)


def read_csv_strict(
    spark: SparkSession, path: str, schema: T.StructType | str, **kw
) -> DataFrame:
    """Fail-fast CSV: any row not matching the declared schema aborts
    the job (FAILFAST) — for sources that are contracts, not crawls."""
    return (
        spark.read.schema(schema)
        .option("header", str(kw.pop("header", True)).lower())
        .option("mode", "FAILFAST")
        .options(**{k: str(v) for k, v in kw.items()})
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    infer_rows: int | None = 10_000,
) -> DataFrame:
    """JSON-lines with explicit schema or row-bounded inference
    (``samplingRatio`` picked so ~``infer_rows`` rows are sampled is
    not expressible directly; Spark bounds inference by ratio, so we
    expose the ratio knob and default it small)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_rows is not None:
        reader = reader.option("samplingRatio", "0.1")
    return reader.json(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    """CSV shards (uncompressed => splittable); one file per upstream
    partition — repartition before calling to control shard count."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC (zstd): the other columnar interchange format — same
    pushdown/pruning class as parquet for engines that prefer ORC."""
    df.write.mode(mode).option("compression", "zstd").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def convert_to_parquet(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    fmt: str,
    schema: T.StructType | str | None = None,
    **read_options: str,
) -> DataFrame:
    """Ingest-normalize: read any supported format, write parquet, and
    return the parquet-backed DataFrame.  The first job of every
    text-format corpus at scale — all downstream scans then get
    columnar pruning + pushdown instead of re-parsing text."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    reader = reader.options(**{k: str(v) for k, v in read_options.items()})
    df = reader.format(fmt).load(src_path)
    df.write.mode("overwrite").parquet(dest_path)
    return spark.read.parquet(dest_path)
