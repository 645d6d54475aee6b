"""Z-order (Morton) curve expressions — multi-dimensional clustering
keys for data layout.

Sorting files by the interleaved bits of several columns keeps rows
close in EVERY interleaved dimension close on disk, so min/max file
statistics prune scans for predicates on ANY of the dimensions — the
technique behind Delta Lake's and Iceberg's ``ZORDER BY`` / sort-order
clustering (public designs; Morton 1966).  A single-column sort gives
perfect pruning on one column and none on the others; the Z-curve
trades a little locality per dimension for pruning on all of them.

Everything here is pure JVM bit arithmetic (shifts, masks, integer
sums) unrolled per bit, so the key computation rides whole-stage
codegen and adds no shuffle of its own — the expensive part of a
Z-order rewrite is the range partition + sort the caller already pays
for any clustered write.

Reference scope: net-new (the reference has no storage layout
control); included because at 100 TB layout IS query performance.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def grid_scale(col: Column, mn: Column, mx: Column, bits: int = 16) -> Column:
    """Map a value into the ``[0, 2**bits)`` integer grid given its
    column's min/max (pass them as 1-row broadcast aggregates).  Pure
    BIGINT arithmetic — ``(v - mn) * (2**bits - 1) DIV (mx - mn)`` —
    so the mapping is exactly reproducible in any engine's integer
    floor division (numerator is non-negative by construction; a
    double round-trip would silently corrupt cells past 2^53).
    Degenerate ranges (mx == mn) map everything to grid cell 0 rather
    than dividing by zero.

    Spans too wide for the BIGINT multiply (span * (2^bits - 1)
    overflowing 2^63 — spans past ~2^46 at 16 bits) take a pre-shift
    branch: value and span drop their low 17 bits before scaling.
    That quantization moves a point at most one grid cell — harmless
    for LAYOUT (cell boundaries are arbitrary anyway) but no longer
    the exact closed form, so oracle-checked queries should stay
    under the exact span (every shipped dataset does, by orders of
    magnitude)."""
    m = (1 << bits) - 1
    span = (mx - mn).cast("long")
    a = col.cast("long") - mn.cast("long")
    exact_max = ((1 << 62) - 1) // m
    shifted_span = F.call_function(
        "div", span, F.lit(1 << 17).cast("long")
    ) + F.lit(1)
    wide = F.least(
        F.call_function(
            "div",
            F.call_function("div", a, F.lit(1 << 17).cast("long")) * F.lit(m),
            shifted_span,
        ),
        F.lit(m).cast("long"),
    )
    return (
        F.when(span == 0, F.lit(0).cast("long"))
        .when(span <= F.lit(exact_max), F.call_function("div", a * F.lit(m), span))
        .otherwise(wide)
        .cast("long")
    )


def z_value_n(grids: list[Column], bits: int = 16) -> Column:
    """Interleave ``m`` ``bits``-wide grid coordinates into their
    Morton code: bit ``j`` of column ``i`` lands at position
    ``j*m + i``.  Unrolled per bit into shift/mask/sum terms —
    ``m*bits`` integer expressions, all inside whole-stage codegen.
    ``m*bits`` must stay under 63 so the code fits a BIGINT.

    This is THE shared interleave: ``sources/layout.zorder_value``
    (the N-column layout key with double quantization and NULL
    policy) and the exact-arithmetic 2-D path here both build on
    it."""
    m = len(grids)
    if m * bits > 62:
        raise ValueError(f"z_value_n: {m}*{bits} bit planes overflow BIGINT")
    terms = []
    for j in range(bits):
        for i, g in enumerate(grids):
            b = F.shiftright(g, j).bitwiseAND(F.lit(1).cast("long"))
            terms.append(b * F.lit(1 << (j * m + i)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def z_value(gx: Column, gy: Column, bits: int = 16) -> Column:
    """Two-dimensional Morton code: bit i of ``gx`` at position 2i,
    bit i of ``gy`` at 2i+1 (the ``m=2`` case of :func:`z_value_n`)."""
    return z_value_n([gx, gy], bits)
