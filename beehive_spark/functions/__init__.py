"""Column-level function library (text, multimodal)."""

from pyspark.sql import Column
from pyspark.sql import functions as F


def floor_div(num: Column, den: Column) -> Column:
    """Sign-safe exact BIGINT floor division, bit-identical to
    DuckDB's ``//`` for ANY sign of ``num`` (``den`` must be > 0).

    Spark's registered ``div`` truncates toward zero, DuckDB's ``//``
    floors; they disagree on negative numerators.  Subtracting the
    non-negative ``pmod`` first makes the numerator exactly divisible,
    so truncation == floor and everything stays in exact BIGINT
    (no double round-trip, no 2^53 cliff).
    """
    return F.call_function("div", num - F.pmod(num, den), den)
