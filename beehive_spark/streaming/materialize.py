"""Streaming materialized-view maintenance.

``run_ivm_agg_stream`` keeps a grouped-aggregate parquet table fresh
from a STREAM of CDC change records, reusing the exact batch algebra of
``operators.ivm`` inside ``foreachBatch`` — the same one-code-path,
two-latencies seam as ``streaming.events.run_cdc_apply_stream`` (which
maintains the row-level table; this maintains its aggregates).

Why the retraction algebra is the right streaming primitive: signed
deltas are ADDITIVE, so within-micro-batch ordering is irrelevant —
an entity updated five times in one batch contributes a telescoping
sum in which intermediate states cancel exactly (no last-change-per-key
compaction pass needed, unlike the row-level apply).  Exactly-once on
an at-least-once source comes from foreachBatch's deterministic batch
ids: the last applied id is recorded in a sidecar next to the table and
replayed batches are skipped, making the whole sink idempotent.

At scale this is the materialized-view answer to the reference's
recompute-everything loop (orchestrator.js:22-121): the aggregate table
is rewritten once per micro-batch with broadcast-only maintenance joins
(see operators/ivm.py — the base never shuffles), cost proportional to
the stream, not to history.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from beehive_spark.operators.ivm import cdc_to_retractions, incremental_agg


def _meta_path(table_path: str) -> str:
    return table_path.rstrip("/") + ".ivm_meta.json"


def _last_applied(table_path: str) -> int:
    try:
        with open(_meta_path(table_path)) as f:
            return json.load(f)["batch_id"]
    except (OSError, ValueError, KeyError):
        return -1


def run_ivm_agg_stream(
    spark: SparkSession,
    changes: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    keys: list[str],
    sums: dict[str, str],
    values: list[str] | None = None,
    count_col: str = "n_rows",
    timeout_sec: int = 120,
) -> None:
    """Maintain the aggregate table at ``table_path`` (in the
    ``operators.ivm.build_agg`` shape: ``keys + [count_col]`` plus each
    sum and its ``_nn`` companion) from a streaming CDC feed
    shaped like ``operators.ivm.cdc_to_retractions`` expects
    (``change_type`` + ``<col>_old`` / ``<col>_new`` payloads).

    The table must exist (write the initial aggregate once from a
    batch backfill); each micro-batch is folded in with a staged
    write + atomic swap, and the applied batch id is recorded so
    source replays are no-ops.
    """
    value_cols = list(sums.values()) if values is None else list(values)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if batch_id <= _last_applied(table_path):
            return  # replayed micro-batch: already folded in
        retr = cdc_to_retractions(batch_df, keys=keys, values=value_cols)
        base = spark.read.parquet(table_path)
        fresh = incremental_agg(base, retr, keys, sums, count_col=count_col)
        staging = table_path.rstrip("/") + ".staging"
        backup = table_path.rstrip("/") + ".old"
        shutil.rmtree(staging, ignore_errors=True)
        fresh.write.mode("overwrite").parquet(staging)
        shutil.rmtree(backup, ignore_errors=True)
        os.replace(table_path, backup)
        os.replace(staging, table_path)
        with open(_meta_path(table_path), "w") as f:
            json.dump({"batch_id": batch_id}, f)
        shutil.rmtree(backup, ignore_errors=True)

    q = (
        changes.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "ivm_agg"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:  # pragma: no cover
        q.stop()


def run_cdc_materialize_stream(
    spark: SparkSession,
    changes: DataFrame,
    row_path: str,
    agg_path: str,
    row_keys: list[str],
    agg_keys: list[str],
    sums: dict[str, str],
    minmax: dict[str, str] | None = None,
    count_col: str = "n_rows",
    seq_col: str = "seq",
    checkpoint_dir: str | None = None,
    timeout_sec: int = 120,
) -> None:
    """One CDC feed, two maintained artifacts per micro-batch: the
    row-level table at ``row_path`` (the bronze copy, via the same
    crash-safe ``apply_cdc_parquet`` rewrite as
    ``events.run_cdc_apply_stream``) and its aggregate at ``agg_path``
    (the silver copy, via the ``operators.ivm`` retraction algebra) —
    the standard lakehouse medallion step collapsed into one
    exactly-once sink.

    The ordering inside each batch is what makes the composition
    correct: the aggregate folds its retractions FIRST (they reference
    pre-batch old values), then the row table applies — except when
    ``minmax`` extremes are maintained, whose evict-rescan must consult
    the POST-batch row table, so rows apply first and extremes rescan
    against the fresh table.  Replays skip via the recorded batch id
    on the aggregate sidecar (the row apply is idempotent by
    construction: last-change-per-key compaction + keyed rewrite).

    ``changes`` rows: ``change_type`` + ``seq_col`` + ``<col>_old`` /
    ``<col>_new`` payloads for every key/value column.  ``minmax``
    maps extra aggregate columns to source value columns maintained as
    MAX.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from beehive_spark.operators.ivm import incremental_minmax
    from beehive_spark.sources.writers import apply_cdc_parquet

    value_cols = sorted({*sums.values(), *(minmax or {}).values()})

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if batch_id <= _last_applied(agg_path):
            return
        retr = cdc_to_retractions(batch_df, keys=agg_keys, values=value_cols)
        base = spark.read.parquet(agg_path)
        sum_state = [count_col] + [x for o in sums for x in (o, f"{o}_nn")]
        fresh = incremental_agg(
            base.select(*agg_keys, *sum_state), retr, agg_keys, sums,
            count_col=count_col,
        )
        # row table next: compact to last change per key, then apply —
        # so the minmax rescan below sees the post-batch rows.  Row
        # keys are IMMUTABLE in the feed (standard CDC contract: a
        # key-changing update must arrive as delete+insert), so each
        # column resolves as coalesce(new, old) — deletes carry their
        # key only on the _old side.
        def col_of(c):
            new_c, old_c = f"{c}_new", f"{c}_old"
            if new_c in batch_df.columns:
                return F.coalesce(F.col(new_c), F.col(old_c)).alias(c)
            return F.col(c)

        w = Window.partitionBy(
            *[col_of(k).alias(f"__k_{k}") for k in row_keys]
        ).orderBy(F.col(seq_col).desc())
        compacted = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                "change_type",
                *[
                    col_of(c)
                    for c in dict.fromkeys([*row_keys, *agg_keys, *value_cols])
                ],
            )
        )
        apply_cdc_parquet(spark, row_path, compacted, keys=row_keys)
        if minmax:
            fact = spark.read.parquet(row_path)
            for out, src in minmax.items():
                mm = incremental_minmax(
                    base.select(*agg_keys, count_col, out),
                    retr,
                    fact,
                    agg_keys,
                    src,
                    agg="max",
                    count_col=count_col,
                    out_col=out,
                )
                fresh = fresh.drop(out).join(
                    mm.select(*agg_keys, out), agg_keys, "left"
                )
        staging = agg_path.rstrip("/") + ".staging"
        backup = agg_path.rstrip("/") + ".old"
        shutil.rmtree(staging, ignore_errors=True)
        fresh.write.mode("overwrite").parquet(staging)
        shutil.rmtree(backup, ignore_errors=True)
        os.replace(agg_path, backup)
        os.replace(staging, agg_path)
        with open(_meta_path(agg_path), "w") as f:
            json.dump({"batch_id": batch_id}, f)
        shutil.rmtree(backup, ignore_errors=True)

    q = (
        changes.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option(
            "checkpointLocation",
            os.path.join(checkpoint_dir or agg_path + "_ckpt", "m"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:  # pragma: no cover
        q.stop()
