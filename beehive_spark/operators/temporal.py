"""Temporal joins Spark's DataFrame API lacks as built-ins, expressed
as scale-correct compositions (net-new capability beyond the
reference's batch-merge surface, SURVEY.md §2.8).

as-of join
----------
The naive formulation (per-left-row MAX-subquery, or an inequality
join + argmax) either re-executes a correlated aggregate or builds an
O(left x right-per-key) intermediate.  The scalable form used here is
the union trick: tag both sides, union them, and run ONE window over
(key, ts) — the running "last right payload seen" at each left row IS
the as-of match.  Cost: a single shuffle on the key, zero row
blow-up, no skew beyond the key's own distribution.  This is how
kdb/Flink/QuestDB implement asof internally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (direction='backward') or smallest
    ``right_ts >= left_ts`` ('forward') within the same ``on`` key.

    Equal timestamps match (<=/>= semantics, like DuckDB ASOF and
    pandas merge_asof with allow_exact_matches).  Right payload
    columns come back suffixed; left rows with no match keep NULLs.
    Right side should be unique per (on, right_ts) for deterministic
    output — pre-aggregate if it is not.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys]
    payload_struct = F.struct(*[F.col(c) for c in payload_cols])

    ru = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload_struct.alias("__r"),
    )
    # null literal with the exact payload struct type, derived from ru
    null_payload = F.lit(None).cast(dict(ru.dtypes)["__r"])
    lu = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        null_payload.alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    ru = ru.withColumn("__l", F.lit(None).cast(dict(lu.dtypes)["__l"]))

    order = [F.col("__ts").asc(), F.col("__side").asc()]
    if direction == "forward":
        # right rows must still precede left rows at equal __ts so the
        # running last() sees them; only the ts direction flips
        order = [F.col("__ts").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        lu.unionByName(ru)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in payload_cols]
    return matched.select(*out_cols)
