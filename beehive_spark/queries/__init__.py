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
    """Load one testdata table; normalizes the events time column.

    The events ``ts`` column has shipped as INT64 TIMESTAMP(NANOS) in
    some testdata vintages (readable only via nanosAsLong) and plain
    TIMESTAMP(MICROS)/NTZ in others; ``normalize_ts`` folds both into
    TimestampType so downstream queries are encoding-agnostic.  The
    conf is set at runtime (it is a dynamic SQL conf) so this also
    works under the driver harness's own SparkSession.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - conf may be locked; reads may still work
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from beehive_spark.sources.readers import normalize_ts

        df = normalize_ts(df)
    return df


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


_loaded = False

# Registry order is the driver's ORACLE-VERIFICATION order, and the driver
# differentially checks the FIRST 50 registered queries per round.  The
# window rotates each round so the cross-round union covers every
# registered query (169/169 after r06, 154/154 oracle-bearing
# hash-green).  The round-7 window leads with (a) everything round 7
# changes or adds, then (b) the SEVEN entries whose newest driver
# evidence was still r02 — census EXECUTED over CORRECTNESS_r01..r06
# this round (the r6 note's claim of an r03 floor was wrong: the r5
# verdict's named-nine list undercounted the r02 cohort), then (c) the
# full 21-entry r03-vintage cohort (oracle-bearing first, then the
# three rows-only).  Everything past this explicit head backfills
# OLDEST-EVIDENCE-FIRST, COMPUTED from the committed CORRECTNESS_r*.json
# files (see _evidence_vintage) — the static per-round fill chain this
# replaced is exactly how the r6 census drifted from reality.  The
# local scripts/check_oracle.py sweep still verifies ALL registered
# queries each round.
_PRIORITY = [
    # --- new in round 8 (appended as they land)
    "similarity_ann_pq_planted",   # r8 new: exact-grid ADC-path twin
    "dedup_semantic_planted",      # r8 new: exact planted SemDeDup pair stage
    "record_linkage_blocked",      # r8 new: staggered-band multi-pass blocking
    "pmi_collocations",            # r8 new: PMI multi-word-expression mining
    "events_ohlc_bars",            # r8 new: OHLC bars per type-hour bucket
    # --- changed in round 7 (advisory fixes: sign-safe floor_div in the
    # resample/EWMA folds, half-away argmax rounding, 1-char gram guard,
    # exact integer block div)
    "events_resample", "events_ewma", "embedding_mmr_rerank",
    "qgram_editdist_join", "graph_kcore_planted",
    # --- new in round 7 (appended as they land)
    "pagerank_planted",            # r7 new: planted star-forest PR, fixed 8 rounds
    "media_caption_luma",          # r7 new: cross-modal image-luma x caption join
    "bom_cost_rollup",             # r7 new: bottom-up BOM tree aggregation
    "record_linkage_fs",           # r7 new: Fellegi-Sunter scored linkage
    "bm25_retrieval",              # r7 new: Okapi BM25 top-k retrieval
    "events_twap",                 # r7 new: exact time-weighted average
    "incremental_distinct_orders",  # r7 new: COUNT(DISTINCT) IVM
    "tree_shortest_paths",         # r7 new: weighted SSSP over the part tree
    "dedup_semantic",              # r7: assignment rides the persisted ANN index
    # --- newest driver evidence still r02 (executed census, see above)
    "dedup_substring_spans", "funnel_steps", "cohort_retention",
    "scd2_customer_history", "snapshot_diff", "sample_weighted",
    "events_anomaly",
    # --- the complete r03-vintage cohort (executed census), oracle-bearing
    "q4_order_priority", "q6_revenue_forecast", "q7_volume_shipping",
    "q8_market_share", "bigram_next_word", "dataset_interleave",
    "dataset_split_manifest", "doc_prefix_clusters", "events_dwell_time",
    "events_gap_fill", "fuzzy_join_names", "media_video_frames",
    "orders_rfm_segments", "orders_seasonality", "point_in_time_state",
    "revenue_concentration", "stddev_prices_exact", "user_ltv_cohort",
    # --- r03-vintage rows-only (weaker driver signal, stalest evidence;
    # exactness pinned in tests/test_{semantic_pq,sketches}.py;
    # dedup_semantic moved up with the r7 changes)
    "similarity_ann_pq", "sketch_uniques_rollup",
]
# ROUND-8 NOTE: after CORRECTNESS_r07 the evidence floor should be r04
# — verify by EXECUTING a census over all seven CORRECTNESS files
# before believing it (the r6 note failed exactly this way; the
# computed backfill below now does it automatically).  Lead the next
# head with whatever round 8 changes; the backfill self-rotates.


def _evidence_vintage() -> dict[str, int]:
    """Newest driver-evidence round per query, COMPUTED from the
    committed CORRECTNESS_r*.json files at import time — never
    transcribed from a verdict or a comment (the r6 bookkeeping
    lesson: a hand-maintained census claimed an r03 evidence floor
    while seven queries actually sat at r02).  Queries absent from
    every file have never been driver-verified and sort FIRST."""
    import glob
    import json

    # queries/__init__.py -> queries/ -> beehive_spark/ -> repo root
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    vint: dict[str, int] = {}
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if not files:
        # the window ordering would silently degrade to registration
        # order — the exact quiet-bookkeeping-drift failure this
        # computed census replaced; raise rather than lie (r7 review)
        raise RuntimeError(
            f"no CORRECTNESS_r*.json evidence files found under {root}; "
            "the oracle-window backfill cannot be ordered without them"
        )
    for f in files:
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        with open(f) as fh:
            recs = json.load(fh)  # malformed sidecar: raise, don't skip
        if not isinstance(recs, dict):
            raise RuntimeError(f"malformed correctness sidecar: {f}")
        for q in recs:
            vint[q] = max(rnd, vint.get(q, 0))
    return vint


def _ensure_loaded() -> None:
    global _loaded
    if not _loaded:
        # import for registration side effects
        from beehive_spark.queries import core  # noqa: F401
        from beehive_spark.queries import curation  # noqa: F401
        from beehive_spark.queries import llm  # noqa: F401
        from beehive_spark.queries import media  # noqa: F401
        from beehive_spark.queries import relational  # noqa: F401
        from beehive_spark.queries import tpch  # noqa: F401

        ordered = {n: _REGISTRY[n] for n in _PRIORITY if n in _REGISTRY}
        # slots the explicit head leaves open backfill OLDEST driver
        # evidence first (never-verified entries FIRST as a safety net
        # for a head the author forgot to extend); within a vintage,
        # oracle-bearing entries outrank rows-only ones (stronger
        # driver signal per slot), then registration order for a
        # deterministic window
        vint = _evidence_vintage()
        reg_pos = {n: i for i, n in enumerate(_REGISTRY)}
        rest = [n for n in _REGISTRY if n not in ordered]
        rest.sort(
            key=lambda n: (vint.get(n, -1), _REGISTRY[n][1] is None, reg_pos[n])
        )
        for n in rest:
            ordered[n] = _REGISTRY[n]
        _REGISTRY.clear()
        _REGISTRY.update(ordered)
        _loaded = True
