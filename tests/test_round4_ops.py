"""Tests for the round-4 additions: C4 span dedup semantics, PageRank
fast-path/general-path agreement, unigram LM smoothing."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.operators.graph import pagerank
from commercial_rfp_data_pipeline_spark.operators.textops import (
    span_dedup,
    unigram_lm_score,
)


def test_span_dedup_keep_first_semantics(spark):
    """A span repeated across docs survives only at its first
    (doc_id, idx) occurrence; unique spans always survive; null text
    yields an empty rewrite row, not a dropped doc."""
    rows = [
        (1, "a b c d e f"),          # spans (len 3): 'a b c', 'd e f'
        (2, "a b c x y z"),          # 'a b c' duplicates doc1 idx0
        (3, "d e f"),                # duplicates doc1's second span
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in span_dedup(df, span_len=3).collect()}
    assert len(out) == 4
    assert out[1].text_dedup == "a b c d e f"
    assert (out[1].n_spans, out[1].n_spans_kept) == (2, 2)
    assert out[2].text_dedup == "x y z"
    assert (out[2].n_spans, out[2].n_spans_kept) == (2, 1)
    assert out[3].text_dedup == ""
    assert (out[3].n_spans, out[3].n_spans_kept) == (1, 0)
    assert out[4].text_dedup == ""
    assert (out[4].n_spans, out[4].n_spans_kept) == (0, 0)


def test_span_dedup_partition_invariant(spark):
    """The keep-first rule depends on (doc_id, idx) only — results
    must not change with input partitioning."""
    rows = [(i, f"w{i % 7} x y z common span here pad{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {
        (r.doc_id, r.text_dedup, r.n_spans_kept)
        for r in span_dedup(df.repartition(1), span_len=4).collect()
    }
    b = {
        (r.doc_id, r.text_dedup, r.n_spans_kept)
        for r in span_dedup(df.repartition(13), span_len=4).collect()
    }
    assert a == b


def test_pagerank_symmetric_fast_path_matches_general(spark):
    """On a symmetrized graph the closed-form dangling recurrence must
    reproduce the in-plan aggregate path; mass sums to 1; the hub
    outranks leaves; the isolated vertex ranks lowest."""
    # star: 1-2, 1-3, 1-4 (symmetrized), vertex 5 isolated
    e = [(1, 2), (2, 1), (1, 3), (3, 1), (1, 4), (4, 1)]
    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    edges = spark.createDataFrame(e, "src long, dst long")
    fast = {
        r.id: r.rank
        for r in pagerank(nodes, edges, symmetric=True, checkpoint=False).collect()
    }
    gen = {
        r.id: r.rank
        for r in pagerank(nodes, edges, symmetric=False, checkpoint=False).collect()
    }
    assert set(fast) == set(gen) == {1, 2, 3, 4, 5}
    for k in fast:
        assert math.isclose(fast[k], gen[k], rel_tol=0, abs_tol=1e-12), k
    assert math.isclose(sum(fast.values()), 1.0, abs_tol=1e-9)
    assert fast[1] > fast[2] > fast[5]
    assert math.isclose(fast[2], fast[3], abs_tol=1e-12)


def test_unigram_lm_smoothing_and_ranking(spark):
    """Unseen tokens get finite add-one-smoothed mass; a doc of rare
    tokens scores below a doc of common tokens; hand-computed value
    matches."""
    train = spark.createDataFrame(
        [(1, "the the the the cat"), (2, "the dog")],
        "doc_id long, text string",
    )
    score_df = spark.createDataFrame(
        [(10, "the the"), (11, "cat dog"), (12, "zebra")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in unigram_lm_score(score_df, train_df=train).collect()
    }
    # training counts: the=5, cat=1, dog=1 -> N=7, V=3
    n, v = 7, 3
    lp = lambda c: math.log(c + 1) - math.log(n + v + 1)
    assert math.isclose(out[10].avg_logprob, round(lp(5), 6), abs_tol=1e-6)
    assert math.isclose(out[11].avg_logprob, round((lp(1) + lp(1)) / 2, 6), abs_tol=1e-6)
    assert math.isclose(out[12].avg_logprob, round(lp(0), 6), abs_tol=1e-6)
    assert out[10].avg_logprob > out[11].avg_logprob > out[12].avg_logprob
    assert all(r.ppl > 0 for r in out.values())


def test_pagerank_rejects_nothing_but_handles_empty_edges(spark):
    """A graph with no edges degenerates to uniform teleport rank."""
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id long")
    edges = spark.createDataFrame([], "src long, dst long")
    out = pagerank(nodes, edges, symmetric=True, checkpoint=False).collect()
    ranks = [r.rank for r in out]
    assert math.isclose(sum(ranks), 1.0, abs_tol=1e-9)
    assert max(ranks) - min(ranks) < 1e-15
