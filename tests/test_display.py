"""D1/D2 printer parity (reference display-utils.js / uuid-checks.js)."""

import io

import pytest

from beehive_spark.functions.display import (
    pretty_print_rows,
    pretty_print_uuid_changes,
    show_df,
)


def test_list_rows_bordered_table():
    buf = io.StringIO()
    out = pretty_print_rows(
        [["kilosa", "kilosa", "morogoro"], ["Sima", "Bariadi", "Simiyu"]],
        ["Shule", "Wilaya", "Mkoa"],
        out=buf,
    )
    lines = out.splitlines()
    # border / header / border / 2 rows / border
    assert len(lines) == 6
    assert lines[0] == lines[2] == lines[5]
    assert lines[0].startswith("+") and lines[0].endswith("+")
    assert set(lines[0]) == {"+", "-"}
    # all lines equal width; header cells padded to widest value + 2
    assert len({len(ln) for ln in lines}) == 1
    assert "| Shule " in lines[1] and "| kilosa " in lines[3]
    assert buf.getvalue() == out


def test_dict_rows_require_dict_headers():
    with pytest.raises(ValueError, match="mapping the keys"):
        pretty_print_rows([{"item": "cup"}], ["Item"], out=io.StringIO())
    out = pretty_print_rows(
        [{"item": "sahani", "value": 20}, {"item": "cup", "value": 23}],
        {"item": "Item", "value": "Value"},
        out=io.StringIO(),
    )
    assert "| sahani " in out and "| Item " in out


def test_uuid_changes_fixed_layout():
    changes = [
        {"person_id": 7, "initial": "a" * 36, "new": "b" * 36},
        {"person_id": 8123456789, "initial": "c" * 36, "new": "d" * 36},
    ]
    out = pretty_print_uuid_changes(changes, out=io.StringIO())
    lines = out.splitlines()
    assert len(lines) == 6  # border, header, border, 2 rows, border
    # first column floors at width 12 for short key names
    assert lines[0].startswith("+" + "-" * 12 + "+")
    # uuid columns are 40 wide (39 dashes + separator in the border)
    assert lines[0] == "+" + "-" * 12 + "+" + "-" * 39 + "+" + "-" * 39 + "+"
    assert "| Initial UUID" in lines[1] and "| New UUID" in lines[1]
    assert pretty_print_uuid_changes([], out=io.StringIO()).startswith("(no uuid")


def test_show_df_takes_bounded_rows(spark):
    df = spark.range(100).withColumnRenamed("id", "n")
    out = show_df(df, limit=3, out=io.StringIO())
    lines = out.splitlines()
    assert len(lines) == 7  # border, header, border, 3 rows, border
    assert "| n " in lines[1]
