"""validate_table: declarative expectation suite (dq_violations query
is oracle-checked; these pin the rule semantics on adversarial toy
data, including NULL handling per rule kind)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beehive_spark.operators.checks import Rule, validate_table


def _report(df, rules, refs=None):
    return {
        r["rule"]: r["n_violations"] for r in validate_table(df, rules, refs).collect()
    }


def test_row_local_rules_count_violations_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "O", 5.0), (2, None, -1.0), (None, "X", None), (4, "F", 0.0)],
        "k bigint, status string, price double",
    )
    got = _report(
        df,
        [
            Rule("k_not_null", "not_null", col="k"),
            Rule("status_ok", "in_set", col="status", values=("O", "F")),
            Rule("price_pos", "range", col="price", lo=0.0),
            Rule("k_small", "expr", expr="k IS NULL OR k < 10"),
        ],
    )
    # nulls violate in_set and range (an expectation unmet is a
    # violation, the GE convention), expr rule is explicit about NULL
    assert got == {"k_not_null": 1, "status_ok": 2, "price_pos": 2, "k_small": 0}


def test_unique_counts_extra_copies_only(spark):
    df = spark.createDataFrame([(1,), (1,), (1,), (2,)], "k bigint")
    got = _report(df, [Rule("k_unique", "unique", col="k")])
    assert got == {"k_unique": 2}  # three copies of 1 -> 2 violations


def test_ref_rule_ignores_nulls(spark):
    child = spark.createDataFrame([(1,), (2,), (None,)], "fk bigint")
    parent = spark.createDataFrame([(1,)], "pk bigint")
    got = _report(
        child,
        [Rule("fk_exists", "ref", col="fk")],
        refs={"fk_exists": (parent, "pk")},
    )
    assert got == {"fk_exists": 1}  # 2 is orphaned; NULL passes


def test_empty_table_reports_zero_rows_per_rule(spark):
    df = spark.createDataFrame([], "k bigint")
    got = _report(
        df,
        [Rule("k_not_null", "not_null", col="k"), Rule("u", "unique", col="k")],
    )
    assert got == {"k_not_null": 0, "u": 0}


def test_schema_diff_reports_add_remove_retype(spark):
    from beehive_spark.operators.checks import schema_diff

    old = spark.createDataFrame([], "a int, b string, c double")
    new = spark.createDataFrame([], "a bigint, b string, d date")
    got = schema_diff(old, new)
    assert got == [
        {"column": "c", "change": "removed", "old_type": "double", "new_type": None},
        {"column": "d", "change": "added", "old_type": None, "new_type": "date"},
        {"column": "a", "change": "retyped", "old_type": "int", "new_type": "bigint"},
    ]
    assert schema_diff(old, old) == []
