"""Unit tests for beehive_spark.operators.temporal.asof_join."""

import datetime

from beehive_spark.operators.temporal import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _mk(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),
            (2, "u1", _ts("2024-01-01T12:00:00")),
            (3, "u2", _ts("2024-01-01T09:00:00")),
            (4, "u3", _ts("2024-01-01T09:00:00")),
        ],
        ["id", "user", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T09:30:00"), 100.0),
            ("u1", _ts("2024-01-01T11:00:00"), 200.0),
            ("u2", _ts("2024-01-01T09:00:00"), 300.0),  # equal ts -> matches
            ("u2", _ts("2024-01-01T10:00:00"), 400.0),
        ],
        ["user", "ts", "amount"],
    )
    return left, right


def test_asof_backward(spark):
    left, right = _mk(spark)
    got = {
        r["id"]: r["amount_right"]
        for r in asof_join(left, right, on="user").collect()
    }
    assert got == {1: 100.0, 2: 200.0, 3: 300.0, 4: None}


def test_asof_forward(spark):
    left, right = _mk(spark)
    got = {
        r["id"]: r["amount_right"]
        for r in asof_join(left, right, on="user", direction="forward").collect()
    }
    # id=1 at 10:00 -> next right at 11:00; id=2 at 12:00 -> none;
    # id=3 at 09:00 -> equal ts matches (300.0)
    assert got == {1: 200.0, 2: None, 3: 300.0, 4: None}


def test_asof_keeps_all_left_columns_and_row_count(spark):
    left, right = _mk(spark)
    out = asof_join(left, right, on="user")
    assert out.count() == left.count()
    assert set(out.columns) == {"id", "user", "ts", "ts_right", "amount_right"}


def test_asof_multi_key(spark):
    left = spark.createDataFrame(
        [(1, "a", 1, _ts("2024-01-01T10:00:00"))], ["id", "k1", "k2", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("a", 1, _ts("2024-01-01T09:00:00"), 1.0),
            ("a", 2, _ts("2024-01-01T09:30:00"), 2.0),  # wrong k2 -> no match
        ],
        ["k1", "k2", "ts", "v"],
    )
    rows = asof_join(left, right, on=["k1", "k2"]).collect()
    assert len(rows) == 1 and rows[0]["v_right"] == 1.0
