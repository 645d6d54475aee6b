"""Slowly-changing-dimension type-2 merge (history-preserving upsert).

The reference's strongest write primitive is the correcting upsert —
ON DUPLICATE KEY UPDATE overwrites the old attribute values in place
(SURVEY.md §2.1 S6/S8; reference utils.js:161-213 builds exactly that
statement).  ``scd2_merge`` is the history-preserving generalization a
warehouse needs: instead of overwriting, the changed row's open
version is CLOSED (``valid_to`` stamped, ``is_current`` false) and a
new version appended, so every past state stays queryable with a
``valid_from <= t < valid_to`` predicate (Kimball type-2).

Scale shape: one equi-join of the dimension's OPEN rows with the
update snapshot on the business key — closed history rows are
filtered out before the join and pass through untouched (at 100 TB
the closed majority of a big SCD table never shuffles; only the open
slice does, and AQE broadcasts the update side when it is small, the
common case for dimension deltas).  Change detection is a
null-safe tracked-column comparison (eqNullSafe fold), all JVM
expressions.  The result is a plain DataFrame — write it with the
keyed parquet upsert sink (`sources/writers.py upsert_parquet`) or
any warehouse MERGE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _changed(left_prefix: str, right_prefix: str, tracked: list[str]) -> Column:
    """True when any tracked column differs (NULL-safe) between the
    open row and its update."""
    cond = F.lit(False)
    for c in tracked:
        cond = cond | ~F.col(f"{left_prefix}.{c}").eqNullSafe(
            F.col(f"{right_prefix}.{c}")
        )
    return cond


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    tracked: list[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Merge an update snapshot into an SCD2 history table.

    ``current`` carries the history schema: the business ``key``
    column(s), the ``tracked`` attribute columns, ``valid_from``
    (timestamp), ``valid_to`` (timestamp, NULL = open) and
    ``is_current`` (boolean).  ``updates`` carries key + tracked +
    ``effective_col`` (the change timestamp).  Returns the merged
    history:

    - closed rows pass through untouched (never joined);
    - an open row whose update changes any tracked column is closed at
      the update's effective time and its new version appended (open);
    - an open row with no update, or an update equal on every tracked
      column, passes through unchanged (idempotent re-runs);
    - a key new to the table inserts as an open first version.

    One update row per key per call (enforce upstream with a window
    max on ``effective_col``); multiple snapshots apply as successive
    calls, each a single open-slice join.
    """
    keys = [key] if isinstance(key, str) else list(key)
    out_cols = current.columns

    closed = current.filter(~F.col(is_current))
    open_rows = current.filter(F.col(is_current)).alias("o")
    up = updates.alias("u")

    j = open_rows.join(up, keys, "full_outer")
    has_open = F.col(f"o.{valid_from}").isNotNull()
    has_upd = F.col(f"u.{effective_col}").isNotNull()
    changed = _changed("o", "u", tracked)

    # open rows: keep as-is when no (differing) update arrived
    # (list-form join keys coalesce into single unambiguous columns)
    keep_open = j.filter(has_open & (~has_upd | ~changed)).select(
        *keys,
        *[F.col(f"o.{c}").alias(c) for c in out_cols if c not in keys],
    )
    # open rows superseded by a change: close at the update's time
    closed_out = j.filter(has_open & has_upd & changed).select(
        *keys,
        *[
            F.col(f"u.{effective_col}").alias(c)
            if c == valid_to
            else F.lit(False).alias(c)
            if c == is_current
            else F.col(f"o.{c}").alias(c)
            for c in out_cols
            if c not in keys
        ],
    )
    # new versions: changed keys and brand-new keys
    inserts = j.filter(has_upd & (~has_open | changed)).select(
        *keys,
        *[
            F.col(f"u.{effective_col}").alias(c)
            if c == valid_from
            else F.lit(None).cast("timestamp").alias(c)
            if c == valid_to
            else F.lit(True).alias(c)
            if c == is_current
            else F.col(f"u.{c}").alias(c)
            for c in out_cols
            if c not in keys
        ],
    )
    return (
        closed.select(*out_cols)
        .unionByName(keep_open.select(*out_cols))
        .unionByName(closed_out.select(*out_cols))
        .unionByName(inserts.select(*out_cols))
    )


def scd2_snapshot(history: DataFrame, at, valid_from="valid_from", valid_to="valid_to") -> DataFrame:
    """Point-in-time view of an SCD2 table: the version of each key
    live at ``at`` (``valid_from <= at < valid_to``, open rows count).
    A pure filter — with the history z-ordered or range-clustered on
    ``valid_from`` this prunes to the files overlapping ``at``."""
    t = F.lit(at).cast("timestamp")
    return history.filter(
        (F.col(valid_from) <= t)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > t))
    )
