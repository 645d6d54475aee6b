"""Streaming ANN index maintenance — embeddings stream in, the
persisted IVF index stays fresh.

The batch lifecycle (``operators.ann_index``: build once / probe many /
append increments) composes with Structured Streaming through
``foreachBatch``: every micro-batch of new vectors is folded into the
persisted index with :func:`append_ivf_index` under the FROZEN
codebook — the same one-code-path, two-latencies seam as
``streaming.materialize`` (one implementation serves the nightly bulk
append and the minutes-latency stream).

Delivery semantics, stated precisely: appends are AT-LEAST-ONCE (a
crash between the file append and the batch-id record lets the replayed
batch append its list entries again — parquet file appends cannot be
made atomic with a sidecar write), but probe RESULTS are exactly-once
regardless, because ``probe_ivf_index`` already deduplicates candidates
per (query, vector) — IVF multi-assignment requires that dedupe anyway,
so replay-duplicated list entries are absorbed by construction.  The
recorded batch id makes the common replay (restart without a crash
mid-append) a no-op; ``meta['n_vectors']`` is exact except across a
crash-mid-append replay, where it may overcount (the index CONTENT
stays correct — recount from the assignments table if the number must
be exact).

At 100 TB this is the standard freshness architecture for vector
search: rebuild the codebook on a schedule (distribution drift),
stream appends between rebuilds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from beehive_spark.operators.ann_index import append_ivf_index, read_meta, write_meta


def _last_stream_batch(index_dir: str) -> int:
    try:
        return read_meta(index_dir).get("last_stream_batch", -1)
    except OSError:
        return -1


def run_ann_index_append_stream(
    spark: SparkSession,
    vectors: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """Fold a stream of (vec_id, embedding) rows into the persisted IVF
    index at ``index_dir`` (which must exist — run
    ``build_ivf_index`` once from the batch backfill first).

    Each micro-batch appends under the frozen codebook at increment
    cost; the applied batch id rides in the index meta so a replayed
    batch (restart, checkpoint recovery) is skipped.  See the module
    docstring for the precise delivery semantics."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if batch_id <= _last_stream_batch(index_dir):
            return  # replayed micro-batch: already appended
        meta = append_ivf_index(spark, index_dir, batch_df)
        meta["last_stream_batch"] = batch_id
        write_meta(index_dir, meta)

    q = (
        vectors.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "ann_append"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:  # pragma: no cover
        q.stop()
