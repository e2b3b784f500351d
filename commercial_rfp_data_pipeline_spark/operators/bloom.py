"""Broadcast Bloom-filter semi-join: prefilter the BIG side of a
semi-join before it ever reaches a shuffle.

At 100 TB the dominant cost of ``big.join(keys, 'left_semi')`` is
shuffling the big side on the join key. When the key set is selective
(a filtered dimension), a Bloom filter of the keys — a few KB to MB of
bitset — broadcast to every scan task eliminates the vast majority of
big-side rows BEFORE the exchange; the exact semi-join then runs on
the small survivor set. This is the same idea as Spark's AQE runtime
row-level filtering / DPP, expressed as an explicit, testable
operator with a tunable bit budget.

Correctness contract: a Bloom filter has false POSITIVES but never
false negatives, and the exact semi-join downstream removes the false
positives — so ``bloom_semi_join(big, keys) == big.join(keys,
'left_semi')`` EXACTLY, for any bitset size. The oracle for any query
built on this operator is therefore the plain semi-join SQL.

Construction is fully distributed: per key, ``k`` positions from
seeded ``xxhash64`` (cheap JVM codegen hash — the bloom's internals
never need cross-engine parity, only the final joined result does);
positions fold into a (word -> 64-bit mask) table via one
``bit_or`` aggregation (map-side partial combine, at most ``m_words``
groups); a final single-group ``map_from_entries(collect_list(...))``
packs the tiny table into ONE row, which Spark broadcasts. The only
single-reducer step handles <= ``m_words`` rows (default 1024 — 8 KB
of bitset), far below any skew concern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    """``k`` deterministic bit positions for a key: seeded xxhash64
    mod m. Seeding by literal i gives k independent hash families."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_words: int = 1024,
    k_hashes: int = 3,
) -> DataFrame:
    """ONE-row DataFrame ``(bloom: map<long, long>)`` — word index ->
    64-bit mask — over the distinct values of ``keys[key_col]``.

    m_words * 64 bits total; size the bit budget at ~10 bits/key for
    ~1% false-positive rate (false positives cost only wasted rows into
    the exact join, never wrong results)."""
    m_bits = m_words * 64
    pos = F.explode(
        F.array(*_positions(F.col(key_col), m_bits, k_hashes))
    ).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            # SQL shiftleft takes a column bit count (the Python
            # wrapper insists on a literal, hence expr)
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bloom")
    )


def bloom_might_contain(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_words: int = 1024,
    k_hashes: int = 3,
) -> DataFrame:
    """Rows of ``df`` whose key passes the bloom — a superset of the
    true matches. The 1-row bloom joins via broadcast nested loop
    (one row replicated to every task, no shuffle of ``df``), and the
    membership test is pure codegen: k hash + map lookups per row."""
    m_bits = m_words * 64
    staged = df.crossJoin(F.broadcast(bloom))
    for i, p in enumerate(_positions(F.col(key_col), m_bits, k_hashes)):
        staged = staged.withColumn(f"_bp{i}", p)
    tests = []
    for i in range(k_hashes):
        w = F.coalesce(
            F.element_at(F.col("bloom"), (F.col(f"_bp{i}") / 64).cast("long")),
            F.lit(0).cast("long"),
        )
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_bp{i} % 64 AS INT))")
        tests.append(w.bitwiseAND(mask) != 0)
    cond = tests[0]
    for t in tests[1:]:
        cond = cond & t
    return staged.filter(cond).drop(
        "bloom", *[f"_bp{i}" for i in range(k_hashes)]
    )


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    key_col: str,
    m_words: int = 1024,
    k_hashes: int = 3,
) -> DataFrame:
    """EXACT semi-join of ``big`` against ``keys[key_col]``, with a
    broadcast bloom prefilter so the big-side exchange (or the exact
    join's probe) sees only bloom survivors. Result is identical to
    ``big.join(keys.select(key_col).distinct(), key_col, 'left_semi')``
    for every bitset size — false positives die in the exact join."""
    key_set = keys.select(key_col).distinct()
    bloom = bloom_build(key_set, key_col, m_words=m_words, k_hashes=k_hashes)
    survivors = bloom_might_contain(
        big, bloom, key_col, m_words=m_words, k_hashes=k_hashes
    )
    return survivors.join(key_set, key_col, "left_semi")
