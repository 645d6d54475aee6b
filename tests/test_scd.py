"""SCD2 merge semantics: close-and-insert on change, idempotent no-op
updates, first-version inserts, and point-in-time snapshots."""

import datetime

from pyspark.sql import functions as F

from beehive_spark.operators import scd2_merge, scd2_snapshot

SCHEMA = (
    "k long, seg string, bal double, valid_from timestamp, "
    "valid_to timestamp, is_current boolean"
)
UP_SCHEMA = "k long, seg string, bal double, effective_ts timestamp"

T0 = datetime.datetime(1992, 1, 1)
T1 = datetime.datetime(1995, 6, 1)
T2 = datetime.datetime(1998, 1, 1)


def _hist(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _upd(spark, rows):
    return spark.createDataFrame(rows, UP_SCHEMA)


def test_scd2_change_closes_and_inserts(spark):
    cur = _hist(spark, [(1, "A", 10.0, T0, None, True)])
    upd = _upd(spark, [(1, "B", 10.0, T1)])
    out = scd2_merge(cur, upd, "k", ["seg", "bal"]).collect()
    by_state = {(r["is_current"]): r for r in out}
    assert len(out) == 2
    closed = by_state[False]
    assert closed["seg"] == "A" and closed["valid_to"] == T1
    opened = by_state[True]
    assert opened["seg"] == "B" and opened["valid_from"] == T1
    assert opened["valid_to"] is None


def test_scd2_noop_update_is_idempotent(spark):
    cur = _hist(spark, [(1, "A", 10.0, T0, None, True)])
    upd = _upd(spark, [(1, "A", 10.0, T1)])
    out = scd2_merge(cur, upd, "k", ["seg", "bal"]).collect()
    assert len(out) == 1
    assert out[0]["valid_from"] == T0 and out[0]["is_current"]


def test_scd2_new_key_inserts_first_version(spark):
    cur = _hist(spark, [(1, "A", 10.0, T0, None, True)])
    upd = _upd(spark, [(2, "C", 5.0, T1)])
    out = {r["k"]: r for r in scd2_merge(cur, upd, "k", ["seg", "bal"]).collect()}
    assert set(out) == {1, 2}
    assert out[2]["valid_from"] == T1 and out[2]["is_current"]


def test_scd2_null_safe_change_detection(spark):
    cur = _hist(spark, [(1, None, 10.0, T0, None, True)])
    # NULL -> NULL is NOT a change; NULL -> value is
    same = _upd(spark, [(1, None, 10.0, T1)])
    assert scd2_merge(cur, same, "k", ["seg", "bal"]).count() == 1
    diff = _upd(spark, [(1, "A", 10.0, T1)])
    assert scd2_merge(cur, diff, "k", ["seg", "bal"]).count() == 2


def test_scd2_closed_history_passes_through_unjoined(spark):
    cur = _hist(
        spark,
        [
            (1, "A", 10.0, T0, T1, False),  # closed version
            (1, "B", 10.0, T1, None, True),
        ],
    )
    upd = _upd(spark, [(1, "C", 10.0, T2)])
    out = scd2_merge(cur, upd, "k", ["seg", "bal"])
    assert out.count() == 3
    segs = {r["seg"]: r for r in out.collect()}
    assert segs["A"]["valid_to"] == T1  # untouched
    assert segs["B"]["valid_to"] == T2 and not segs["B"]["is_current"]
    assert segs["C"]["is_current"]


def test_scd2_snapshot_point_in_time(spark):
    cur = _hist(
        spark,
        [
            (1, "A", 10.0, T0, T1, False),
            (1, "B", 10.0, T1, None, True),
            (2, "X", 1.0, T1, None, True),
        ],
    )
    at_t0 = scd2_snapshot(cur, T0).collect()
    assert {r["seg"] for r in at_t0} == {"A"}
    mid = scd2_snapshot(cur, datetime.datetime(1996, 1, 1)).collect()
    assert {r["seg"] for r in mid} == {"B", "X"}
    # boundary: a version closing exactly at t is no longer live at t
    at_t1 = scd2_snapshot(cur, T1).collect()
    assert {r["seg"] for r in at_t1} == {"B", "X"}


def test_scd2_successive_snapshots_compose(spark):
    cur = _hist(spark, [(1, "A", 10.0, T0, None, True)])
    s1 = scd2_merge(cur, _upd(spark, [(1, "B", 10.0, T1)]), "k", ["seg", "bal"])
    s2 = scd2_merge(s1, _upd(spark, [(1, "C", 10.0, T2)]), "k", ["seg", "bal"])
    rows = sorted(s2.collect(), key=lambda r: r["valid_from"])
    assert [r["seg"] for r in rows] == ["A", "B", "C"]
    assert [r["valid_to"] for r in rows] == [T1, T2, None]
    assert [r["is_current"] for r in rows] == [False, False, True]
