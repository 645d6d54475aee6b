"""Heavy hitters — exact frequent items with sketch-bounded shuffle.

``groupBy(item).count().filter(cnt > phi*N)`` is the one-shuffle
textbook answer, and map-side combine keeps it viable surprisingly far.
But over a 100 TB stream of high-cardinality items (n-grams, URLs,
session keys) the combined map output is still vocabulary-sized: the
shuffle moves one record per DISTINCT item per map partition, almost
all of which are far below any interesting threshold.

This module bounds that cost with the classic two-pass scheme:

1. **Candidate pass** — a per-partition Misra-Gries summary with
   ``k = ceil(1/phi)`` counters (Arrow-batched ``mapInPandas``; MG is
   sequential per-partition state that no built-in aggregate
   expresses).  The batched merge rule — add a batch's value counts,
   then if more than ``k`` counters survive, subtract the (k+1)-th
   largest count from all and drop non-positives — is the mergeable-
   summaries form of MG (Agarwal et al., PODS'12), so the pigeonhole
   guarantee survives arbitrary batching: every item with global count
   > N/(k+1) appears in SOME partition's summary.  Each partition
   emits at most ``k`` candidate rows, so the collected candidate set
   is ``k × partitions`` — kilobytes, not vocabulary-sized.
2. **Exact pass** — the stream is filtered to candidates with a
   broadcast semi-join (map-side, no shuffle of non-candidates) and
   only the surviving sliver is counted exactly; the final
   ``count > phi*N`` filter makes the output EXACT and independent of
   partitioning (extra candidates are harmlessly re-counted and
   dropped), which is what lets a DuckDB GROUP BY/HAVING oracle verify
   a sketch-powered plan.

Reference scope: net-new; generalizes the reference's exact grouped
counts (integrity-checks.js:5-137) to cardinalities where exact
grouping is the bottleneck.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_items(
    df: DataFrame, col: str, phi: float, by: Sequence[str] = ()
) -> DataFrame:
    """All values of ``df[col]`` with frequency strictly above
    ``phi * N``, with exact counts and fractions — globally, or PER
    STRATUM when ``by`` grouping columns are given (N is then each
    stratum's row count, and MG state is kept per stratum: the
    per-source / per-day heavy-hitter rollup shape, where each
    stratum's summary is independent and thresholds are local).

    Returns columns ``by + (col, cnt long, frac double)``.  Output is
    exact and deterministic for any partitioning; only candidate
    DISCOVERY uses the MG sketch.  ``0 < phi < 1``; memory per
    partition is ``O(|strata| / phi)`` counters.
    """
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0,1), got {phi}")
    by = list(by)
    k = math.ceil(1.0 / phi)

    # amortized prune: let each stratum's dict grow to a multiple of k
    # before subtracting the (k+1)-th largest.  The mergeable-summaries
    # bound is unchanged — every prune subtracts its threshold t from
    # >= k+1 surviving-or-dropped counters, so the total subtracted per
    # item stays <= N_p/(k+1) — but prunes become 4x rarer and each one
    # drops far more of the tail, which cut the candidate pass ~5x on
    # the 10x stress corpus vs prune-at-k.
    cap = 4 * k

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        strata: dict = {}
        for b in batches:
            if by:
                groups = b.groupby(by, sort=False, dropna=False)[col]
                items = ((g, s.value_counts()) for g, s in groups)
            else:
                items = [((), b[col].value_counts())]
            for g, vc in items:
                g = g if isinstance(g, tuple) else (g,)
                counters = strata.setdefault(g, {})
                get = counters.get
                for item, c in zip(vc.index.tolist(), vc.to_numpy()):
                    counters[item] = get(item, 0) + int(c)
                if len(counters) > cap:
                    vals = np.fromiter(counters.values(), dtype="int64")
                    kth = np.partition(vals, len(vals) - (k + 1))[
                        len(vals) - (k + 1)
                    ]
                    strata[g] = {
                        i: c - kth for i, c in counters.items() if c > kth
                    }
        # plain lists keep the empty case object-dtyped (an empty
        # pandas index is int64 and broke the Arrow cast to string —
        # caught by the 10x stress run)
        out = {c: [] for c in (*by, col)}
        for g, counters in strata.items():
            for item in counters:
                for c, v in zip(by, g):
                    out[c].append(v)
                out[col].append(item)
        yield pd.DataFrame(out, dtype=object)

    typ = lambda c: df.schema[c].dataType.simpleString()  # noqa: E731
    schema = ", ".join(f"{c} {typ(c)}" for c in (*by, col))
    candidates = F.broadcast(
        df.select(*by, col).mapInPandas(mg, schema=schema).distinct()
    )
    keys = [*by, col]
    counted = (
        df.join(candidates, keys, "left_semi")
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if by:
        total = F.broadcast(
            df.groupBy(*by).agg(F.count(F.lit(1)).alias("n"))
        )
        counted = counted.join(total, by)
    else:
        counted = counted.crossJoin(
            F.broadcast(df.agg(F.count(F.lit(1)).alias("n")))
        )
    return counted.filter(F.col("cnt") > F.lit(phi) * F.col("n")).select(
        *by,
        col,
        "cnt",
        F.round(F.col("cnt") / F.col("n"), 6).alias("frac"),
    )
