"""Property test: for ANY consistent CDC history, incremental
maintenance equals a from-scratch recompute of the final state.

Hypothesis drives a random sequence of insert/update/delete ops against
a python dict model (the "database"); the generated feed is converted
to retractions and folded into the INITIAL aggregate, then compared to
aggregating the model's final rows.  Catches algebra bugs (sign errors,
NULL handling, group-move accounting) that example tests can miss.
Example count is kept small because each case runs real Spark jobs.
"""

import pytest

pytestmark = pytest.mark.slow  # randomized IVM property sweep (operators covered fast by test_ivm/test_ivm_join)

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from beehive_spark.operators.ivm import build_agg, cdc_to_retractions, incremental_agg

GROUPS = ["a", "b", "c"]
VALUES = st.one_of(st.none(), st.integers(min_value=-50, max_value=50))


@st.composite
def history(draw):
    """(initial rows, op list) — ops are always consistent with state."""
    n0 = draw(st.integers(min_value=0, max_value=5))
    state = {}
    next_id = 0
    initial = []
    for _ in range(n0):
        g, v = draw(st.sampled_from(GROUPS)), draw(VALUES)
        state[next_id] = (g, v)
        initial.append((next_id, g, v))
        next_id += 1
    ops = []
    for _ in range(draw(st.integers(min_value=1, max_value=8))):
        kind = draw(st.sampled_from(["insert", "update", "delete"]))
        if kind == "insert" or not state:
            g, v = draw(st.sampled_from(GROUPS)), draw(VALUES)
            state[next_id] = (g, v)
            ops.append(("insert", None, g, None, v))
            next_id += 1
        elif kind == "delete":
            rid = draw(st.sampled_from(sorted(state)))
            g, v = state.pop(rid)
            ops.append(("delete", g, None, v, None))
        else:
            rid = draw(st.sampled_from(sorted(state)))
            g_old, v_old = state[rid]
            g_new, v_new = draw(st.sampled_from(GROUPS)), draw(VALUES)
            state[rid] = (g_new, v_new)
            ops.append(("update", g_old, g_new, v_old, v_new))
    final = [(rid, g, v) for rid, (g, v) in state.items()]
    return initial, ops, final


def _agg(df):
    return build_agg(df, ["g"], {"sv": "v"}, count_col="n_rows")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(history())
def test_any_history_matches_recompute(spark, h):
    initial, ops, final = h
    row_schema = "rid int, g string, v int"
    base = _agg(spark.createDataFrame(initial, row_schema))
    feed = spark.createDataFrame(
        ops, "change_type string, g_old string, g_new string, v_old int, v_new int"
    )
    retr = cdc_to_retractions(feed, keys=["g"], values=["v"])
    got = incremental_agg(base, retr, ["g"], {"sv": "v"}, count_col="n_rows")
    want = _agg(spark.createDataFrame(final, row_schema))
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(got) == as_set(want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(history())
def test_minmax_any_history_matches_recompute(spark, h):
    from beehive_spark.operators.ivm import incremental_minmax

    initial, ops, final = h
    row_schema = "rid int, g string, v int"

    def mm(df):
        return df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n_rows"), F.max("v").alias("mx")
        )

    base = mm(spark.createDataFrame(initial, row_schema))
    feed = spark.createDataFrame(
        ops, "change_type string, g_old string, g_new string, v_old int, v_new int"
    )
    retr = cdc_to_retractions(feed, keys=["g"], values=["v"])
    fact = spark.createDataFrame(final, row_schema)
    got = incremental_minmax(
        base, retr, fact, ["g"], "v", agg="max", out_col="mx"
    )
    want = mm(fact)
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(got) == as_set(want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(history())
def test_topk_any_history_matches_recompute(spark, h):
    from beehive_spark.operators.ivm import incremental_topk

    initial, ops, final = h
    row_schema = "rid int, g string, v int"

    def tk(df):
        return df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.slice(
                F.reverse(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("v").isNotNull(), F.col("v")).cast(
                                "double"
                            )
                        )
                    )
                ),
                1,
                2,
            ).alias("topk"),
        )

    base = tk(spark.createDataFrame(initial, row_schema))
    feed = spark.createDataFrame(
        ops, "change_type string, g_old string, g_new string, v_old int, v_new int"
    )
    retr = cdc_to_retractions(feed, keys=["g"], values=["v"]).withColumn(
        "v", F.col("v").cast("double")
    )
    fact = spark.createDataFrame(final, row_schema).withColumn(
        "v", F.col("v").cast("double")
    )
    got = incremental_topk(base, retr, fact, ["g"], "v", k=2)
    want = tk(fact)
    canon = lambda df: {  # noqa: E731
        (r["g"], r["n_rows"], tuple(r["topk"])) for r in df.collect()
    }
    assert canon(got) == canon(want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(history())
def test_distinct_any_history_matches_recompute(spark, h):
    from beehive_spark.operators.ivm import (
        build_multiplicity,
        incremental_distinct,
    )

    initial, ops, final = h
    row_schema = "rid int, g string, v int"
    init_df = spark.createDataFrame(initial, row_schema)
    mult = build_multiplicity(init_df, ["g"], "v")
    counts = mult.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    )
    feed = spark.createDataFrame(
        ops, "change_type string, g_old string, g_new string, v_old int, v_new int"
    )
    retr = cdc_to_retractions(feed, keys=["g"], values=["v"])
    new_mult, new_counts = incremental_distinct(mult, counts, retr, ["g"], "v")
    final_df = spark.createDataFrame(final, row_schema)
    want_mult = build_multiplicity(final_df, ["g"], "v")
    # COUNT(DISTINCT) ignores NULLs; the maintained view carries only
    # groups with count > 0 (matching the operator's contract)
    want_counts = (
        final_df.filter(F.col("v").isNotNull())
        .groupBy("g")
        .agg(F.count_distinct("v").cast("long").alias("n_distinct"))
        .filter(F.col("n_distinct") > 0)
    )
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(new_mult) == as_set(want_mult)
    assert as_set(new_counts) == as_set(want_counts)
