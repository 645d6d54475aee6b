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
