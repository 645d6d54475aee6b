"""Property tests for the round-8 integer fold queries on GENERATED
series including negative values — the corpus twins only exercise
positive values, and the truncating mean is sign-sensitive."""

import datetime
import math
import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _series():
    val = st.floats(
        min_value=-500.0, max_value=500.0, allow_nan=False, allow_infinity=False
    )
    return st.lists(
        st.tuples(st.integers(min_value=0, max_value=10_000), val),
        min_size=1,
        max_size=60,
    )


def _milli(v):
    return int(math.copysign(math.floor(abs(v * 1000) + 0.5), v))


def _tdiv(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def _write_events(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(_series())
def test_cusum_fold_matches_python_on_any_series(spark, pts):
    from beehive_spark.queries.core import events_cusum_changepoint

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=t), 1, "t", v, "{}")
        for i, (t, v) in enumerate(pts)
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, rows, d)
        out = events_cusum_changepoint(spark, d).collect()
    assert len(out) == 1
    r = out[0]

    # python replay with the engines' exact semantics: milli rounding
    # half-away, truncating mean, sort by (t, v)
    vs = sorted((t * 1_000_000, _milli(v)) for t, v in pts)
    milli = [v for _, v in vs]
    mean = _tdiv(sum(milli), len(milli))
    s = max_s = alarms = first = 0
    for i, vm in enumerate(milli, start=1):
        s = max(0, s + vm - mean - 25000)
        max_s = max(max_s, s)
        if s > 150000:
            alarms += 1
            if first == 0:
                first = i
    assert (
        r["n_points"],
        r["max_cusum_milli"],
        r["n_alarms"],
        r["first_alarm_idx"],
    ) == (len(milli), max_s, alarms, first)


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(_series())
def test_rolling_median_matches_python_on_any_series(spark, pts):
    from beehive_spark.queries.core import events_rolling_median

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=t), 1, "t", v, "{}")
        for i, (t, v) in enumerate(pts)
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, rows, d)
        out = {
            r["event_id"]: (r["n_window"], r["med_milli"])
            for r in events_rolling_median(spark, d).collect()
        }
    ordered = sorted(
        (t * 1_000_000, i, _milli(v)) for i, (t, v) in enumerate(pts)
    )
    want = {}
    for j in range(len(ordered)):
        win = sorted(x[2] for x in ordered[max(0, j - 4) : j + 1])
        want[ordered[j][1]] = (len(win), win[(len(win) + 1) // 2 - 1])
    assert out == want
