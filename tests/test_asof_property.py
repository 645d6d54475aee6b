"""Property test: asof_join must agree with pandas.merge_asof (an
independent reference implementation) on random inputs, both
directions, including equal-timestamp and no-match cases."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from beehive_spark.operators.temporal import asof_join

_key = st.integers(min_value=0, max_value=3)
_ts = st.integers(min_value=0, max_value=30)


@st.composite
def _tables(draw):
    left = draw(st.lists(st.tuples(_key, _ts), min_size=1, max_size=15))
    right = draw(
        st.lists(st.tuples(_key, _ts), min_size=0, max_size=15, unique=True)
    )
    return left, right


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=_tables())
def test_asof_matches_pandas_merge_asof(spark, data):
    left_rows, right_rows = data
    left_pd = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        columns=["id", "k", "t"],
    )
    right_pd = pd.DataFrame(
        [(k, t, k * 1000 + t) for (k, t) in right_rows], columns=["k", "t", "v"]
    )
    left_df = spark.createDataFrame(left_pd)
    right_df = (
        spark.createDataFrame(right_pd)
        if len(right_pd)
        else spark.createDataFrame([], "k long, t long, v long")
    )

    for direction in ("backward", "forward"):
        got_rows = asof_join(
            left_df, right_df, on="k", left_ts="t", right_ts="t",
            direction=direction,
        ).collect()
        got = {r["id"]: r["v_right"] for r in got_rows}

        if len(right_pd):
            want_pd = pd.merge_asof(
                left_pd.sort_values(["t", "id"]),
                right_pd.sort_values("t"),
                on="t",
                by="k",
                direction=direction,
            )
            want = {
                int(r.id): (None if pd.isna(r.v) else int(r.v))
                for r in want_pd.itertuples()
            }
        else:
            want = {int(r.id): None for r in left_pd.itertuples()}

        assert got == want, f"direction={direction}"
        assert len(got_rows) == len(left_pd)
