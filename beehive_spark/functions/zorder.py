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
    floor division (numerator is non-negative by construction).
    Degenerate ranges (mx == mn) map everything to grid cell 0 rather
    than dividing by zero."""
    span = (mx - mn).cast("long")
    num = (col.cast("long") - mn.cast("long")) * F.lit((1 << bits) - 1)
    # BIGINT `div`, not float division: a double round-trip silently
    # corrupts grid cells once the numerator passes 2^53
    return F.when(span == 0, F.lit(0).cast("long")).otherwise(
        F.call_function("div", num, span)
    ).cast("long")


def z_value(gx: Column, gy: Column, bits: int = 16) -> Column:
    """Interleave two ``bits``-wide grid coordinates into their Morton
    code: bit i of ``gx`` lands at position 2i, bit i of ``gy`` at
    2i+1.  Unrolled per bit into shift/mask/sum terms — 2*bits integer
    expressions, all inside codegen.  2*bits must stay under 63 so the
    code fits a BIGINT."""
    if 2 * bits > 62:
        raise ValueError(f"z_value: 2*bits={2 * bits} overflows BIGINT")
    terms = []
    for i in range(bits):
        bx = F.shiftright(gx, i).bitwiseAND(F.lit(1).cast("long"))
        by = F.shiftright(gy, i).bitwiseAND(F.lit(1).cast("long"))
        terms.append(bx * F.lit(1 << (2 * i)))
        terms.append(by * F.lit(1 << (2 * i + 1)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")
