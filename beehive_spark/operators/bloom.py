"""Bloom-filter runtime join pruning — the "runtime filter" / dynamic
semi-join reduction every warehouse applies to selective star joins.

At 100 TB the dominant cost of ``fact JOIN selective_dim`` is shuffling
fact rows that will never match.  A Bloom filter built over the dim's
join keys and broadcast into a fact-side pre-filter drops most of them
BEFORE the exchange, at the price of one tiny dim aggregation — the
same mechanism as Spark's own injected runtime bloom filters
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) and Trino's
dynamic filtering, exposed here as an explicit, inspectable operator:
the engine's automatic injection only fires under planner heuristics,
while a pipeline author often KNOWS the dim is selective.

Everything is JVM-side expression arithmetic: k hash positions come
from seeded ``xxhash64`` calls, the bitmap is assembled with a per-word
``bit_or`` aggregate, collected to the driver (m/64 longs — a few KB
for millions of keys) and re-broadcast as an array literal.  False
positives only ever ADD back rows the exact join then discards, so any
query built on :func:`bloom_semi_join` is EXACTLY equivalent to the
plain join — which is what makes it oracle-checkable.

Reference scope: net-new (the reference joins row-at-a-time in JS);
pattern follows Bloom 1970 + the runtime-filter designs in Spark
(SPARK-32268) and Trino's dynamic filtering, public designs both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a value: independent seeded xxhash64 draws
    (seeding via literal salt columns keeps everything whole-stage
    codegen)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i * 0x9E3779B9)), F.lit(m_bits))
        for i in range(k)
    ]


_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _hash_cast_type(fact_type: str, dim_type: str) -> str | None:
    """Common type both join keys are cast to BEFORE hashing.

    xxhash64 is type-sensitive (hash(42 as int) != hash(42 as long)),
    so hashing each side in its native type silently turns every probe
    into a false negative when the key dtypes differ — wrong results,
    not just a slow plan.  Equal-after-cast values always hash equal,
    and a cast can only MERGE values (adding false positives the exact
    join discards), never split them, so casting both sides to a
    common type preserves the no-false-negative contract."""
    def fam(t: str) -> str:
        if t in _INT_TYPES:
            return "int"
        if t in ("float", "double") or t.startswith("decimal"):
            return "num"
        return t

    ff, df_ = fam(fact_type), fam(dim_type)
    if ff == "int" and df_ == "int":
        return "long"
    if ff in ("int", "num") and df_ in ("int", "num"):
        # equal join values cast to the same double; beyond-2^53
        # precision loss only merges values (false positives only)
        return "double"
    if fact_type == dim_type:
        return None
    raise ValueError(
        f"bloom_semi_join: join key types {fact_type!r} vs {dim_type!r} "
        "are in different type families; align them explicitly before "
        "the join (implicit cross-family coercion would make the hash "
        "pre-filter unsound)"
    )


def build_bloom(dim: DataFrame, key: str, m_bits: int = 1 << 20, k: int = 5) -> list:
    """Build the bitmap: one row per SET bit -> word/bit split ->
    per-word ``bit_or`` aggregate -> driver list of m_bits/64 longs
    (zeros filled).  The only action is the tiny word-count collect.

    Sizing: for n keys, m_bits ~ 10n gives ~1% false positives at
    k=5 (standard Bloom arithmetic); the bitmap is m/8 bytes — 1.25 MB
    for 1M keys — well inside broadcast budgets."""
    n_words = (m_bits + 63) // 64  # round UP: m_bits need not be word-aligned
    pos = F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("p")
    words = (
        dim.select(pos)
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            # the python shiftleft wrapper takes only an int shift; the
            # SQL expression takes columns — call it directly
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.pmod("p", F.lit(64)).cast("int"),
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[int(r["w"])] = int(r["bits"])
    return bitmap


def might_contain(
    col: Column, bitmap: list, m_bits: int = 1 << 20, k: int = 5
) -> Column:
    """Membership test expression over the broadcast bitmap literal:
    AND over the k probed bits.  Pure JVM arithmetic (array literal +
    element_at + shifts), stays inside whole-stage codegen."""
    arr = F.array(*[F.lit(w).cast("long") for w in bitmap])
    cond = None
    for p in _positions(col, m_bits, k):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, F.pmod(p, F.lit(64)).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        c = bit == 1
        cond = c if cond is None else (cond & c)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    m_bits: int | None = None,
    k: int = 5,
) -> DataFrame:
    """``fact`` semi-joined to ``dim`` with a Bloom pre-filter: rows
    failing the membership test never reach the exchange; survivors
    (matches + ~1% false positives) go through the EXACT semi join, so
    the result equals ``fact.join(dim, key, "left_semi")`` row for
    row — the filter is purely a shuffle-volume reduction.

    ``m_bits=None`` auto-sizes to the dim: ~12 bits/key rounded up to
    a power of two (>= 1024).  Auto-sizing matters doubly here: the
    bitmap rides the fact-side filter as an ARRAY LITERAL, and an
    oversized literal is evaluated per row — a fixed 2^20-bit default
    measured 40 s where the auto-sized filter runs the same query in
    ~2 s (r5)."""
    dk = dim_key or fact_key
    cast_t = _hash_cast_type(
        dict(fact.dtypes)[fact_key], dict(dim.dtypes)[dk]
    )
    # persisted: the distinct key set feeds three consumers (the sizing
    # count, the bitmap build, the exact semi join) — without the cache
    # the dim aggregation runs three times (r5 review)
    keys = dim.select(F.col(dk).alias(dk)).distinct().persist()
    if m_bits is None:
        n = keys.count()
        m_bits = 1024
        while m_bits < 12 * n:
            m_bits <<= 1
    hk = f"__{dk}_hashkey"
    build_side = keys.select(
        (F.col(dk).cast(cast_t) if cast_t else F.col(dk)).alias(hk)
    )
    bitmap = build_bloom(build_side, hk, m_bits=m_bits, k=k)
    probe = F.col(fact_key).cast(cast_t) if cast_t else F.col(fact_key)
    pruned = fact.filter(might_contain(probe, bitmap, m_bits, k))
    return pruned.join(
        keys.withColumnRenamed(dk, fact_key), fact_key, "left_semi"
    )
