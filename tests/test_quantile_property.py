"""Edge-case properties for the two-pass exact quantile selection on
GENERATED price distributions — all-equal columns, bucket-edge
straddles, and random lists with heavy duplication (the corpus twin
only sees a smooth distribution)."""

import math
import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _cents(v):
    return int(math.copysign(math.floor(abs(v * 100) + 0.5), v))


def _want(prices):
    vals = sorted(_cents(v) for v in prices)
    n = len(vals)
    return {
        "p25": (n, (n + 3) // 4, vals[(n + 3) // 4 - 1]),
        "p50": (n, (n + 1) // 2, vals[(n + 1) // 2 - 1]),
        "p75": (n, (3 * n + 3) // 4, vals[(3 * n + 3) // 4 - 1]),
    }


def _run(spark, prices, **kw):
    from beehive_spark.queries.core import lineitem_exact_quantiles

    df = spark.createDataFrame(
        [(float(p),) for p in prices], "l_extendedprice double"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "lineitem.parquet"))
        return {
            r["quantile"]: (r["n_rows"], r["rank"], r["value_cents"])
            for r in lineitem_exact_quantiles(spark, d, **kw).collect()
        }


def test_all_equal_values_degenerate_band(spark):
    """max == min makes the band collapse to 1 — every rank must still
    resolve to the single value."""
    got = _run(spark, [42.0] * 17)
    assert got == _want([42.0] * 17)


def test_two_values_straddling_bucket_edges(spark):
    """Values sitting just either side of a band boundary must not
    shift any rank across buckets."""
    prices = [1.0] * 5 + [9999.99] * 5 + [10000.0] * 5
    got = _run(spark, prices, n_buckets=4)
    assert got == _want(prices)


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    st.lists(
        st.integers(min_value=0, max_value=500).map(lambda c: c / 4.0),
        min_size=1,
        max_size=80,
    )
)
def test_random_duplicated_lists_match_sort_twin(spark, prices):
    got = _run(spark, prices, n_buckets=8)
    assert got == _want(prices)
