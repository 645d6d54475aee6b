"""Oracle-constant drift sweep — makes the duplicated-literal class
fail loudly instead of silently drifting.

The class (r8 advisory on mixture_temperature_schedule /
retrieval_rrf_fusion, r9 advisory on ab_test_conversion): a tuning
constant hard-coded INDEPENDENTLY in a query's oracle SQL string and
in its Spark expression.  Editing one side leaves a green-looking
registry whose oracle now checks a different query.  The fix
discipline is one module constant rendered into an f-string oracle
(``_MIX_ALPHA``, ``_RRF_K_LIST``, ``_AB_CONV_MIN``).

This sweep enforces the discipline structurally, no running Spark
needed: for every ``@query(name, oracle=...)`` whose oracle is a
PLAIN string literal (an f-string/JoinedStr is exempt — its numbers
arrive via interpolated constants, the approved pattern), any
DISTINCTIVE numeric literal appearing in BOTH the SQL text and the
decorated function's body is flagged.  Distinctive = not in the
generic allowlist (tiny ints, powers of ten, rounding scales, clock
constants) — values like 14 or 0.7 that only mean something to one
query.  Pre-existing shared literals are frozen in ``_LEGACY``; the
list must only ever SHRINK (hoist the constant and render the oracle
as an f-string to clear an entry — never add one).
"""

import ast
import os
import re

QUERY_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "beehive_spark",
    "queries",
)

# Generic values that legitimately appear on both sides everywhere:
# tiny structural ints (band counts, round digits, top-k), powers of
# ten (micro/milli/ppm fixed-point scales), clock arithmetic.
_GENERIC = (
    {float(v) for v in range(0, 17)}
    | {10.0**e for e in range(1, 10)}
    | {0.5, 24.0, 32.0, 60.0, 64.0, 100.0, 128.0, 256.0, 365.0, 1024.0,
       3600.0, 86400.0, 32768.0, 65536.0}
)

# Frozen pre-r10 offenders: (query_name, literal) pairs that predate
# the sweep.  DO NOT ADD ENTRIES — hoist the literal into a module
# constant rendered into an f-string oracle instead (that exempts the
# query from this check by construction).
# Pre-existing offenders surfaced only by the r11 CLOSURE walk (the
# r10 advisory's helper-hoisting blind spot): literals shared between a
# plain-string oracle and a module-level helper the query calls.  Same
# freeze discipline as _LEGACY — only ever shrink this set (hoist the
# constant, render the oracle as an f-string).  The record_linkage
# trio shares the Fellegi-Sunter weight/threshold table via
# _fs_weights-style helpers; the media queries share the vendored
# synthetic payload geometry (dims, luma planes) with oracles that
# re-derive expectations from the same payload bytes.
_LEGACY_HELPER: set[tuple[str, float]] = {
    ('entity_resolution_pipeline', 30.0),
    ('entity_resolution_pipeline', 50.0),
    ('entity_resolution_pipeline', 800.0),
    ('entity_resolution_pipeline', 1200.0),
    ('entity_resolution_pipeline', 1500.0),
    ('entity_resolution_pipeline', 2500.0),
    ('entity_resolution_pipeline', 4000.0),
    ('entity_resolution_pipeline', 5000.0),
    ('media_audio_features', 50.0),
    ('media_audio_vad', 50.0),
    ('media_caption_luma', 37.0),
    ('media_caption_luma', 251.0),
    ('media_exif_harvest', 120.0),
    ('media_exif_harvest', 160.0),
    ('media_exif_harvest', 480.0),
    ('media_exif_harvest', 640.0),
    ('media_scene_cuts', 53.0),
    ('media_scene_cuts', 71.0),
    ('media_scene_cuts', 254.0),
    ('record_linkage_blocked', 30.0),
    ('record_linkage_blocked', 50.0),
    ('record_linkage_blocked', 800.0),
    ('record_linkage_blocked', 1200.0),
    ('record_linkage_blocked', 1500.0),
    ('record_linkage_blocked', 2000.0),
    ('record_linkage_blocked', 2500.0),
    ('record_linkage_blocked', 4000.0),
    ('record_linkage_blocked', 5000.0),
    ('record_linkage_fs', 30.0),
    ('record_linkage_fs', 800.0),
    ('record_linkage_fs', 1200.0),
    ('record_linkage_fs', 1500.0),
    ('record_linkage_fs', 2000.0),
    ('record_linkage_fs', 2500.0),
    ('record_linkage_fs', 4000.0),
    ('record_linkage_fs', 5000.0),
}

_LEGACY: set[tuple[str, float]] = {
    ('array_funcs_suite', 200.0),
    ('assign_ids_window', 5000.0),
    ('bigram_next_word', 20.0),
    ('bpe_top_merges', 20.0),
    ('corpus_drift', 40.0),
    ('dataset_split_manifest', 0.9),
    ('dataset_split_manifest', 0.95),
    ('dataset_split_manifest', 4294967296.0),
    ('dedup_containment', 0.8),
    ('dedup_embedding_bucketed', 0.45),
    ('dedup_embedding_cosine', 0.45),
    ('dedup_semantic_planted', 0.45),
    ('disjunctive_match_users', 20000.0),
    ('doc_length_outliers', 0.6745),
    ('doc_length_outliers', 1.5),
    ('dq_orders_audit', 0.01),
    ('embedding_quantize_int8', 255.0),
    ('events_cusum_changepoint', 25000.0),
    ('events_cusum_changepoint', 150000.0),
    ('events_histogram_rollup', 0.95),
    ('events_histogram_rollup', 63.0),
    ('events_resample', 3600000000.0),
    ('events_sessionize', 30.0),
    ('fk_remap_chain', 2000000.0),
    ('group_percentiles', 0.9),
    ('heavy_hitters_by_source', 0.002),
    ('heavy_hitters_shingles', 0.0002),
    ('incremental_agg_orders', 97.0),
    ('incremental_agg_orders', 101.0),
    ('incremental_checksum_orders', 97.0),
    ('incremental_checksum_orders', 101.0),
    ('incremental_corr_orders', 97.0),
    ('incremental_corr_orders', 101.0),
    ('incremental_distinct_orders', 97.0),
    ('incremental_distinct_orders', 101.0),
    ('incremental_histogram_orders', 95.0),
    ('incremental_histogram_orders', 97.0),
    ('incremental_histogram_orders', 99.0),
    ('incremental_histogram_orders', 101.0),
    ('incremental_join_orders', 50.0),
    ('incremental_join_orders', 70.0),
    ('incremental_join_orders', 97.0),
    ('incremental_max_orders', 97.0),
    ('incremental_max_orders', 101.0),
    ('incremental_topk_orders', 97.0),
    ('incremental_topk_orders', 101.0),
    ('interval_concurrency', 3540.0),
    ('interval_concurrency', 3600000000.0),
    ('kmeans_planted', 1500.0),
    ('kmeans_planted', 150000.0),
    ('kmeans_planted', 200000.0),
    ('kmeans_planted', 300000.0),
    ('kmeans_planted', 800000.0),
    ('link_prediction_adamic_adar', 50.0),
    ('media_audio_features', 800.0),
    ('orders_pareto_abc', 80.0),
    ('orders_pareto_abc', 95.0),
    ('pmi_collocations', 50.0),
    ('q10_returned_items', 20.0),
    ('q11_important_stock', 0.001),
    ('q16_supplier_count', 19.0),
    ('q16_supplier_count', 23.0),
    ('q16_supplier_count', 36.0),
    ('q16_supplier_count', 45.0),
    ('q17_small_qty_revenue', 0.2),
    ('q18_large_volume_customer', 250.0),
    ('q19_disjunctive_revenue', 20.0),
    ('q19_disjunctive_revenue', 25.0),
    ('q19_disjunctive_revenue', 30.0),
    ('q19_disjunctive_revenue', 35.0),
    ('q20_part_promotion', 30.0),
    ('q21_waiting_suppliers', 20.0),
    ('q6_revenue_forecast', 0.05),
    ('q6_revenue_forecast', 0.07),
    ('quality_filter', 0.02),
    ('quality_filter', 0.35),
    ('quality_filter', 25.0),
    ('range_join_windows', 20.0),
    ('sample_weighted', 50.0),
    ('sample_weighted', 4294967296.0),
    ('scd2_customer_history', 50.0),
    ('self_fk_remap', 900000.0),
    ('session_cooccurrence', 30.0),
    ('similarity_ann_ivf_planted', 20.0),
    ('similarity_ann_lsh_planted', 20.0),
    ('snapshot_diff', 97.0),
    ('snapshot_diff', 101.0),
    ('stratified_sample', 0.2),
    ('stratified_sample', 4294967296.0),
    ('text_keyphrases', 30.0),
    ('time_series_split_purged', 20.0),
}


def _numbers_in_sql(sql: str) -> set[float]:
    out = set()
    for m in re.finditer(r"(?<![\w.])(\d+(?:\.\d+)?)(?![\w.])", sql):
        out.add(float(m.group(1)))
    return out


def _numbers_in_fn(fn: ast.AST) -> set[float]:
    out = set()
    for node in ast.walk(fn):
        if isinstance(node, ast.Constant) and isinstance(
            node.value, (int, float)
        ) and not isinstance(node.value, bool):
            out.add(float(node.value))
    return out


def _called_names(fn: ast.AST) -> set[str]:
    """Names invoked as plain calls inside ``fn`` (``_helper(...)``) —
    the hoisting escape hatch the r10 advisory flagged: moving Spark
    code into a module helper exempted its literals from the sweep."""
    out = set()
    for node in ast.walk(fn):
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
            out.add(node.func.id)
    return out


def _numbers_in_fn_closure(fn: ast.AST, module_fns: dict) -> set[float]:
    """Literals in ``fn`` plus every module-level helper it calls,
    transitively (cycle-safe)."""
    seen, todo, out = set(), [fn], set()
    while todo:
        cur = todo.pop()
        out |= _numbers_in_fn(cur)
        for name in _called_names(cur):
            helper = module_fns.get(name)
            if helper is not None and name not in seen:
                seen.add(name)
                todo.append(helper)
    return out


def _scan():
    """Yield (query_name, shared_distinctive_literals) per registered
    query whose oracle is a plain (non-f-string) literal."""
    for fname in sorted(os.listdir(QUERY_DIR)):
        if not fname.endswith(".py"):
            continue
        with open(os.path.join(QUERY_DIR, fname)) as f:
            tree = ast.parse(f.read())
        module_fns = {
            n.name: n
            for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        }
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            for deco in node.decorator_list:
                if not (
                    isinstance(deco, ast.Call)
                    and (
                        (isinstance(deco.func, ast.Name) and deco.func.id == "query")
                        or (
                            isinstance(deco.func, ast.Attribute)
                            and deco.func.attr == "query"
                        )
                    )
                ):
                    continue
                if not (deco.args and isinstance(deco.args[0], ast.Constant)):
                    continue
                qname = deco.args[0].value
                oracle_node = None
                if len(deco.args) > 1:
                    oracle_node = deco.args[1]
                for kw in deco.keywords:
                    if kw.arg == "oracle":
                        oracle_node = kw.value
                # exempt: no oracle, or f-string/expression oracle
                # (numbers arrive via interpolated module constants)
                if not (
                    isinstance(oracle_node, ast.Constant)
                    and isinstance(oracle_node.value, str)
                ):
                    continue
                shared = (
                    _numbers_in_sql(oracle_node.value)
                    & _numbers_in_fn_closure(node, module_fns)
                ) - _GENERIC
                if shared:
                    yield qname, shared


def test_no_new_oracle_constant_drift():
    found = {
        (q, lit) for q, shared in _scan() for lit in shared
    }
    new = found - _LEGACY - _LEGACY_HELPER
    assert not new, (
        "oracle-constant drift: these queries hard-code the same "
        "distinctive literal in BOTH the plain-string oracle SQL and "
        "the Spark function body — hoist each into a module constant "
        f"and render the oracle as an f-string: {sorted(new)}"
    )
    gone = (_LEGACY | _LEGACY_HELPER) - found
    assert not gone, (
        "stale _LEGACY entries (the offender was fixed — delete them "
        f"so the freeze list only shrinks): {sorted(gone)}"
    )
