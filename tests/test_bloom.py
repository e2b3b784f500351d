"""Broadcast bloom-filter semi-join: exactness under false positives,
no false negatives, and the prefilter's plan shape (filter below the
exact join, bloom side broadcast)."""

from __future__ import annotations

from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
)


def test_bloom_semi_join_exact_even_with_tiny_bitset(spark):
    """With m_words=1 (64 bits for 300 keys) the bloom saturates and
    false-positives heavily — the exact join downstream must still
    make the result IDENTICAL to the plain semi-join."""
    big = spark.range(0, 5000).select(F.col("id").alias("k"))
    keys = spark.range(0, 900, 3).select(F.col("id").alias("k"))
    expect = sorted(
        r.k for r in big.join(keys, "k", "left_semi").collect()
    )
    for m_words in (1, 4, 1024):
        got = sorted(
            r.k
            for r in bloom_semi_join(big, keys, "k", m_words=m_words).collect()
        )
        assert got == expect, f"m_words={m_words}"


def test_bloom_never_false_negative_and_prunes(spark):
    """Every true key passes the bloom (no false negatives), and at a
    sane bit budget the prefilter drops the vast majority of
    non-matching rows before the exact join."""
    big = spark.range(0, 20000).select(F.col("id").alias("k"))
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k", m_words=64)  # 4096 bits / 100 keys
    passed = bloom_might_contain(big, bloom, "k", m_words=64)
    ks = {r.k for r in passed.collect()}
    assert set(range(100)) <= ks  # no false negatives -- the contract
    # ~3 hashes into 4096 bits for 100 keys -> fp rate well under 5%
    assert len(ks) - 100 < 1000, f"false-positive blowup: {len(ks)}"


def test_bloom_prefilter_sits_below_exact_join(spark):
    """Plan shape: the membership test is a Filter fed by a broadcast
    of the one-row bitset — the big side is pruned BEFORE the exact
    semi-join's exchange/probe."""
    big = spark.range(0, 1000).select(F.col("id").alias("k"))
    keys = spark.range(0, 10).select(F.col("id").alias("k"))
    plan = bloom_semi_join(big, keys, "k")._jdf.queryExecution().toString()
    assert "LeftSemi" in plan
    # the bloom bitset row arrives via broadcast, never a shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # membership test compiled to codegen'd bit ops, not a Python UDF
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan
