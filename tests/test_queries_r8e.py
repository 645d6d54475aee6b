"""Round-8 additions, batch 5: rolling median and CUSUM changepoint —
python twins computed straight off the parquet, never through the
Spark helpers."""

import duckdb


def _milli(v: float) -> int:
    # round-half-away like F.round / DuckDB ROUND (python round is
    # half-even — the twap-twin lesson, ADVICE r7 #3)
    import math

    return int(math.copysign(math.floor(abs(v * 1000) + 0.5), v))


def _series(sf_dir):
    """Per-user [(t_us, v_milli)] sorted by (t, v) — the engines' key."""
    rows = duckdb.sql(
        f"SELECT user_id, epoch_us(ts), value "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    by_user = {}
    for u, t, v in rows:
        by_user.setdefault(u, []).append((t, _milli(v)))
    for u in by_user:
        by_user[u].sort()
    return by_user


def test_rolling_median_matches_python_twin(spark, sf_dir):
    from beehive_spark.queries.core import events_rolling_median

    rows = duckdb.sql(
        f"SELECT user_id, epoch_us(ts), event_id, value "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    by_user = {}
    for u, t, eid, v in rows:
        by_user.setdefault(u, []).append((t, eid, _milli(v)))
    want = {}
    for u, pts in by_user.items():
        pts.sort()
        for i in range(len(pts)):
            win = sorted(p[2] for p in pts[max(0, i - 4) : i + 1])
            # lower median: element ceil(n/2) of the sorted window
            want[pts[i][1]] = (u, len(win), win[(len(win) + 1) // 2 - 1])
    got = {
        r["event_id"]: (r["user_id"], r["n_window"], r["med_milli"])
        for r in events_rolling_median(spark, sf_dir).collect()
    }
    assert got == want


def test_rolling_median_kills_single_spikes(spark, sf_dir):
    """A median-filtered spike never exceeds the window's 3rd-largest
    raw value — the robustness property a rolling mean lacks."""
    from beehive_spark.queries.core import events_rolling_median

    by_user = _series(sf_dir)
    meds = events_rolling_median(spark, sf_dir)
    top = meds.agg({"med_milli": "max"}).first()[0]
    grand_max = max(v for pts in by_user.values() for _, v in pts)
    assert top < grand_max  # the global spike itself never survives


def test_cusum_matches_python_twin(spark, sf_dir):
    from beehive_spark.queries.core import events_cusum_changepoint

    by_user = _series(sf_dir)
    want = {}
    for u, pts in by_user.items():
        vs = [v for _, v in pts]
        sv, n = sum(vs), len(vs)
        # truncating div (Spark div / DuckDB //), NOT python floor-div
        mean = abs(sv) // n if sv >= 0 else -(abs(sv) // n)
        s = max_s = alarms = first = 0
        for i, v in enumerate(vs, start=1):
            s = max(0, s + v - mean - 25000)
            max_s = max(max_s, s)
            if s > 150000:
                alarms += 1
                if first == 0:
                    first = i
        want[u] = (n, max_s, alarms, first)
    got = {
        r["user_id"]: (
            r["n_points"],
            r["max_cusum_milli"],
            r["n_alarms"],
            r["first_alarm_idx"],
        )
        for r in events_cusum_changepoint(spark, sf_dir).collect()
    }
    assert got == want


def test_cusum_level_shift_alarms_single_spike_does_not(spark):
    """Property on constructed series: a one-point spike drains back
    (no alarm); a sustained level shift integrates and alarms."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: flat at 10.0 with one +150 spike at i=10 — big enough to
    # lift S well off zero, below the h=150 milli-unit decision bar
    for i in range(40):
        v = 160.0 if i == 10 else 10.0
        rows.append((i, base + datetime.timedelta(seconds=i), 1, "t", v, "{}"))
    # user 2: 10.0 for 20 points then shifts to 110.0
    for i in range(40):
        v = 10.0 if i < 20 else 110.0
        rows.append(
            (100 + i, base + datetime.timedelta(seconds=i), 2, "t", v, "{}")
        )
    import os
    import tempfile

    from beehive_spark.queries.core import events_cusum_changepoint

    spark_df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        spark_df.write.parquet(os.path.join(d, "events.parquet"))
        out = {
            r["user_id"]: r
            for r in events_cusum_changepoint(spark, d).collect()
        }
    # user 1's spike raises S once, then the negative drift drains it
    assert out[1]["n_alarms"] == 0
    # user 2's shift (mean lands between the two levels) accumulates
    assert out[2]["n_alarms"] > 0
    assert out[2]["first_alarm_idx"] > 20


def test_holt_backtest_matches_python_twin(spark, sf_dir):
    from beehive_spark.queries.core import events_holt_backtest

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    by_user = _series(sf_dir)
    want = {}
    for u, pts in by_user.items():
        vs = [v for _, v in pts]
        n = len(vs)
        n_train = max(1, (4 * n) // 5)
        if n - n_train <= 0:
            continue
        level, trend, err = vs[0], 0, 0
        for i, v in enumerate(vs[1:], start=2):
            if i > n_train:
                err += abs(v - (level + trend))
            nl = tdiv(3 * v + 7 * (level + trend), 10)
            trend = tdiv(2 * (nl - level) + 8 * trend, 10)
            level = nl
        want[u] = (n, n - n_train, err // (n - n_train))
    got = {
        r["user_id"]: (r["n_points"], r["n_test"], r["mae_milli"])
        for r in events_holt_backtest(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) > 0
