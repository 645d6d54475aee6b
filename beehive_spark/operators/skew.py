"""Skew-mitigated join: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime by splitting oversized shuffle partitions, but it cannot
split a SINGLE hot key's hash bucket when one key alone exceeds a
task's capacity (the classic null-key / celebrity-user / default-value
problem at 100 TB).  Salting can: the skewed (large) side scatters
each hot key across ``salt`` sub-keys, the small side replicates each
row ``salt`` times, and the join key becomes (key, salt) — one hot
key now fills ``salt`` tasks instead of one.

Cost model: replication multiplies the SMALL side by ``salt``, so use
this only when the small side is modest and a specific key is known
hot; for diffuse skew leave it to AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``large`` with ``small`` on ``on`` with salt-scattered
    keys.  Semantics match ``large.join(small, on, how)`` for inner and
    left joins (each large row matches exactly the same small rows —
    salting only changes physical placement).

    The salt is ``xxhash64(<all columns>, seed) % salt`` — a pure
    function of row content, so plans are deterministic across retries
    and replays (``monotonically_increasing_id``/``rand`` are not).
    Hashing the whole row (not just the join key) is what scatters a
    hot key: its rows differ in the other columns.  Only pathological
    full-row duplicates share a salt, and those collapse in size anyway.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    lg = large.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in large.columns], F.lit(seed)), F.lit(salt)),
    )
    sm = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = lg.join(sm, [on, "__salt"], how)
    return out.drop("__salt")
