"""Hypothesis property tests for the custom text operators — the
invariants that must hold for ANY input, not just the fixtures:
chunker reconstruction, winnowing's match-coverage guarantee, dedup
partitioning-invariance.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from commercial_rfp_data_pipeline_spark.operators.chunking import chunk_text


TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
    min_size=0,
    max_size=400,
)


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(TEXT, min_size=1, max_size=5))
def test_chunker_rebuilds_any_text(spark, texts):
    """For arbitrary ASCII text: chunks cap at `size`, consecutive
    chunks share exactly `overlap` chars, stitching rebuilds the
    original."""
    size, overlap, step = 50, 10, 40
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_text(df, size=size, overlap=overlap).collect()
    by_doc: dict[str, list] = {}
    for r in out:
        by_doc.setdefault(r.parent_id, []).append(r)
    for i, t in rows:
        chunks = sorted(by_doc.get(str(i), []), key=lambda r: r.pos)
        if t == "":
            stitched = chunks[0].chunk if chunks else ""
            assert stitched == t
            continue
        assert all(len(c.chunk) <= size for c in chunks)
        for a, b in zip(chunks, chunks[1:]):
            assert a.chunk[step:] == b.chunk[: len(a.chunk) - step]
        stitched = chunks[0].chunk + "".join(c.chunk[overlap:] for c in chunks[1:])
        assert stitched == t


WORD = st.text(alphabet="abcd", min_size=1, max_size=3)


@settings(max_examples=10, deadline=None)
@given(
    base=st.lists(WORD, min_size=8, max_size=20),
    prefix=st.lists(WORD, min_size=0, max_size=5),
    suffix=st.lists(WORD, min_size=0, max_size=5),
)
def test_winnowing_guarantee(spark, base, prefix, suffix):
    """Winnowing's coverage guarantee: two documents sharing a common
    word run of length >= w + k - 1 (here 6) MUST share at least one
    fingerprint."""
    from commercial_rfp_data_pipeline_spark.operators.textops import (
        winnowing_fingerprints,
    )

    doc_a = " ".join(base)
    doc_b = " ".join(prefix + base + suffix)
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    fps = winnowing_fingerprints(df, k=3, w=4).collect()
    a = {r.fp for r in fps if r.doc_id == 1}
    b = {r.fp for r in fps if r.doc_id == 2}
    assert a & b, (doc_a, doc_b)


def test_dedup_partitioning_invariance(spark, sf_dir):
    """Deterministic dedup returns identical survivors under 1/3/16
    partitions (pandas keep='first' semantics need no source order)."""
    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.operators.dedup import dedup_keep_first

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    from pyspark.sql import functions as F

    li = li.withColumn("__ord", F.col("l_orderkey") * 100 + F.col("l_linenumber"))
    want = None
    for nparts in (1, 3, 16):
        got = sorted(
            (r.l_orderkey, r.l_linenumber)
            for r in dedup_keep_first(
                li.repartition(nparts), ["l_partkey", "l_suppkey"], ordinal="__ord"
            ).collect()
        )
        if want is None:
            want = got
        assert got == want
