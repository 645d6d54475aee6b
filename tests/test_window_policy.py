"""Regression pins for the driver-window evidence policy (r8 verdict
asks #1/#2): the explicit head must stay small enough that >= 35 of
the 50 slots backfill oldest-evidence-first, and no rows-only query
may occupy a window slot while oracled queries queue behind it."""

from beehive_spark.queries import (
    _PRIORITY,
    all_oracles,
    all_queries,
)


def test_head_leaves_35_backfill_slots():
    assert len(_PRIORITY) <= 15, (
        f"window head has {len(_PRIORITY)} names; the driver checks 50 "
        "per round and >= 35 must go to the computed oldest-first queue"
    )


def test_window_carries_no_rows_only_queries():
    qs = list(all_queries())
    oracles = all_oracles()
    missing = [n for n in qs[:50] if n not in oracles]
    assert not missing, (
        f"rows-only queries occupy driver window slots: {missing} — "
        "their evidence is their planted twins; stale oracled queries "
        "should hold these slots instead"
    )


def test_every_head_name_is_registered():
    qs = set(all_queries())
    ghosts = [n for n in _PRIORITY if n not in qs]
    assert not ghosts, f"head names not in the registry: {ghosts}"
