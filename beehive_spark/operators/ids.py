"""Deterministic ID assignment.

Parity target: the reference assigns contiguous destination PKs by
reading the destination table's AUTO_INCREMENT and incrementing a
counter per row in arrival order (reference utils.js:11-26 +
``nextId++`` in every insert preparer, e.g. person-users.js:27).

Spark-first re-expression: ``dest_id = base + row_number() OVER
(ORDER BY order_cols) - 1``.  A global row_number requires a total
order — a single-partition sort of just the key columns.  That is
acceptable per-table (keys are a few GB even at 100 TB of fact
data), but for the largest tables we also provide a scalable mode:

- mode="scalable" (default): range-repartition on order_cols, count
  rows per partition, prefix-sum the counts on the driver (tiny),
  then offset a per-partition row_number.  Because range partitions
  are globally ordered, the result ids EQUAL the global
  ``row_number() OVER (ORDER BY order_cols)`` whenever order_cols
  is a unique key — identical output to contiguous mode with no
  single-partition window.  Sort work is distributed: one range
  exchange plus per-partition sorts, the plan that survives 100 TB.
- mode="contiguous": the literal global window (single-partition
  sort of the pruned order_cols projection).  Kept as the
  strict-parity opt-in; prefer scalable.
- mode="hash": ``dest_id = xxhash64(source_tag, src_id)`` —
  deterministic, shuffle-free, non-contiguous; the 100 TB design
  choice when nothing downstream needs density (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def next_id_base(dst: DataFrame, pk: str) -> int:
    """Next available PK in the destination table (A2, utils.js:11-26).

    ``max(pk)+1`` instead of AUTO_INCREMENT probing — identical result
    for append-only merges, and works on any source, not just MySQL.
    """
    row = dst.agg(F.max(F.col(pk)).alias("m")).first()
    m = row["m"] if row is not None else None
    return int(m) + 1 if m is not None else 1


def assign_ids(
    df: DataFrame,
    src_pk: str,
    order_cols: list[str] | None = None,
    base: int = 1,
    out_col: str = "dest_id",
    mode: str = "scalable",
    source_tag: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a deterministic destination id column to every row.

    Returns the input with an ``out_col`` LongType column.  The
    (src_pk, out_col) projection of the result is the *mapping
    DataFrame* used by :func:`beehive_spark.operators.remap.remap_fks`
    (replaces the reference's driver-side ``Map<srcId,destId>``,
    preparation.js:10-29).

    scalable and contiguous produce IDENTICAL ids when order_cols is a
    unique key (callers append src_pk as tiebreak); they differ only in
    physical plan — scalable distributes the sort.
    """
    if order_cols is None:
        order_cols = [src_pk]
    if mode == "contiguous":
        w = Window.orderBy(*[F.col(c) for c in order_cols])
        return df.withColumn(out_col, (F.lit(base) + F.row_number().over(w) - 1).cast("long"))
    if mode == "scalable":
        # Range-repartition on the order key so partition p holds keys
        # strictly below partition p+1's, then offset a per-partition
        # row_number by a driver-side prefix sum of partition counts:
        # ids equal the global rank without a global single-partition
        # sort.  The counts collect is one tiny job (num_partitions
        # rows), the price of density without a serial window.
        ocols = [F.col(c) for c in order_cols]
        n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        # persist: the counts job and the id job must see the SAME range
        # boundaries (repartitionByRange samples per execution, so an
        # unpersisted lineage could re-sample between the two jobs and
        # misalign the offsets)
        dfp = (
            df.repartitionByRange(int(n), *ocols)
            .withColumn("__pid", F.spark_partition_id())
            .persist()
        )
        counts = {
            r["__pid"]: r["cnt"]
            for r in dfp.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        offsets, acc = {}, base
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        off_map = F.create_map(
            *[x for pid, off in sorted(offsets.items()) for x in (F.lit(pid), F.lit(off))]
        )
        w = Window.partitionBy("__pid").orderBy(*ocols)
        return (
            dfp.withColumn(out_col, (off_map[F.col("__pid")] + F.row_number().over(w) - 1).cast("long"))
            .drop("__pid")
        )
    if mode == "hash":
        tag = source_tag or ""
        return df.withColumn(out_col, F.xxhash64(F.lit(tag), F.col(src_pk)))
    raise ValueError(f"unknown assign_ids mode: {mode}")


def mapping_of(df_with_ids: DataFrame, src_pk: str, out_col: str = "dest_id") -> DataFrame:
    """Project the slim (src_id, dest_id) mapping DataFrame."""
    return df_with_ids.select(F.col(src_pk).alias("src_id"), F.col(out_col).alias("dest_id"))
