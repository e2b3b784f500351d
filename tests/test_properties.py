"""Hypothesis property tests for the custom text operators — the
invariants that must hold for ANY input, not just the fixtures:
chunker reconstruction, winnowing's match-coverage guarantee, dedup
partitioning-invariance.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

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


VEC = st.lists(
    st.floats(
        min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
    ),
    min_size=0,
    max_size=130,
)


@settings(max_examples=10, deadline=None)
@given(vecs=st.lists(VEC, min_size=1, max_size=4))
def test_binary_pack_matches_python_for_any_vectors(spark, vecs):
    """For ARBITRARY float vectors (any dim 0..130, any signs incl.
    zeros): the packed sign words equal a driver-side Python packing,
    word count is ceil(d/64), and every bit beyond n_dims is clear."""
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        quantize_binary,
    )

    def py_pack(v):
        words = []
        for w in range((len(v) + 63) // 64):
            acc = 0
            for i in range(w * 64, min(w * 64 + 64, len(v))):
                if v[i] > 0:
                    acc |= 1 << (i - w * 64)
            if acc >= 1 << 63:
                acc -= 1 << 64
            words.append(acc)
        return words

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: (list(r.bits), r.n_dims) for r in quantize_binary(df).collect()}
    for i, v in rows:
        bits, n_dims = got[i]
        assert n_dims == len(v)
        assert bits == py_pack(v), f"vec {i}"
        assert len(bits) == (len(v) + 63) // 64


@settings(max_examples=10, deadline=None)
@given(
    base=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30, unique=True),
    upserts=st.lists(st.integers(min_value=0, max_value=60), max_size=15, unique=True),
    deletes=st.lists(st.integers(min_value=0, max_value=60), max_size=15, unique=True),
)
def test_merge_apply_set_semantics_for_any_changeset(spark, base, upserts, deletes):
    """For ARBITRARY base/upsert/delete key sets (deletes win only
    where not also upserted — disjoint by construction): the result key
    set is exactly (base - deletes - upserts) ∪ upserts, and upserted
    rows carry the changeset payload."""
    from commercial_rfp_data_pipeline_spark.operators.incremental import (
        merge_apply,
    )

    deletes = [d for d in deletes if d not in upserts]
    bdf = spark.createDataFrame([(k, f"b{k}") for k in base], "k long, v string")
    changes = spark.createDataFrame(
        [(k, "U", f"u{k}") for k in upserts]
        + [(k, "D", None) for k in deletes],
        "k long, op string, v string",
    )
    out = {r.k: r.v for r in merge_apply(bdf, changes, keys=["k"], validate=True).collect()}
    want_keys = (set(base) - set(deletes) - set(upserts)) | set(upserts)
    assert set(out) == want_keys
    for k in upserts:
        assert out[k] == f"u{k}"
    for k in want_keys - set(upserts):
        assert out[k] == f"b{k}"


def test_bpe_encode_decode_roundtrip_lossless(spark, sf_dir):
    """Tokenization must be LOSSLESS: for every unique word, the BPE
    segmentation's tokens concatenate back to the exact word
    (decode(encode(w)) == w), and n_tokens equals the segment count —
    the invariant that lets a 100-TB corpus be encoded and later
    reconstructed without a reference to the original text."""
    from pyspark.sql import functions as F

    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.operators.textops import (
        bpe_encode_words,
    )

    docs = load_table(spark, sf_dir, "documents")
    enc = bpe_encode_words(docs, n_merges=3)
    total = enc.count()
    assert total > 0
    bad_decode = enc.filter(
        F.regexp_replace("seq", " ", "") != F.col("word")
    ).count()
    assert bad_decode == 0
    bad_count = enc.filter(
        F.size(F.split("seq", " ")) != F.col("n_tokens")
    ).count()
    assert bad_count == 0


def test_isotonic_fit_monotone_and_projection_properties(spark):
    """PAVA output must be (a) non-decreasing, (b) the identity on an
    already-monotone series, (c) mean-preserving (the L2 projection
    onto the monotone cone keeps the total), and (d) invariant to the
    input's partitioning."""
    from pyspark.sql import functions as F

    from commercial_rfp_data_pipeline_spark.operators.ordered import (
        isotonic_fit,
    )

    rows = [(0, i, y) for i, y in enumerate([5.0, 3.0, 4.0, 1.0, 6.0, 6.0, 2.0, 8.0])]
    df = spark.createDataFrame(rows, "k int, t int, y double")
    out = sorted(
        (r.i, r.y, r.y_iso)
        for r in isotonic_fit(df, ["k"], "t", "y").collect()
    )
    fits = [f for _, _, f in out]
    assert all(a <= b for a, b in zip(fits, fits[1:])), fits
    assert abs(sum(fits) - sum(y for _, y, _ in out)) < 1e-6
    mono = spark.createDataFrame(
        [(0, i, float(i)) for i in range(6)], "k int, t int, y double"
    )
    got = sorted(
        (r.i, r.y_iso) for r in isotonic_fit(mono, ["k"], "t", "y").collect()
    )
    assert got == [(i + 1, float(i)) for i in range(6)]
    out2 = sorted(
        (r.i, r.y, r.y_iso)
        for r in isotonic_fit(df.repartition(5), ["k"], "t", "y").collect()
    )
    assert out2 == out


def test_conformal_coverage_near_nominal(spark, sf_dir):
    """Split-conformal guarantee, measured: every event type's holdout
    coverage sits near the 0.9 nominal level (finite-sample noise
    band [0.8, 1.0]) — the distribution-free promise the order-
    statistic construction makes."""
    from commercial_rfp_data_pipeline_spark.queries.stats_q import (
        q_conformal_coverage,
    )

    rows = q_conformal_coverage(spark, sf_dir).collect()
    assert len(rows) >= 3
    for r in rows:
        assert 0.8 <= r.coverage <= 1.0, (r.event_type, r.coverage)


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60
    ),
    nparts=st.integers(min_value=1, max_value=8),
)
def test_prefix_agg_matches_sequential_reference(spark, vals, nparts):
    """distributed_prefix_agg (round 7: generalized to min/max) must
    equal the sequential single-pass reference for ANY values and ANY
    partition count — inclusive and exclusive forms, all three
    aggregates. The exclusive min/max of the first row is NULL
    (matching ROWS UNBOUNDED PRECEDING..-1 semantics); exclusive sum
    of the first row is 0."""
    from commercial_rfp_data_pipeline_spark.operators.ordered import (
        distributed_prefix_agg,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v long"
    )
    out = distributed_prefix_agg(
        df,
        {
            "s": (F.col("v"), "sum"),
            "mn": (F.col("v"), "min"),
            "mx": (F.col("v"), "max"),
        },
        order_by=[F.col("i")],
        n_partitions=nparts,
    )
    got = {r.i: r for r in out.collect()}
    run_s, run_mn, run_mx = 0, None, None
    for i, v in enumerate(vals):
        r = got[i]
        assert r.s_before == run_s
        assert r.mn_before == run_mn
        assert r.mx_before == run_mx
        run_s += v
        run_mn = v if run_mn is None else min(run_mn, v)
        run_mx = v if run_mx is None else max(run_mx, v)
        assert r.s_incl == run_s
        assert r.mn_incl == run_mn
        assert r.mx_incl == run_mx


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(
                ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta"]
            ),
            min_size=2,
            max_size=30,
        ),
        min_size=2,
        max_size=8,
    )
)
def test_ahash_band_candidates_complete_for_low_hamming(spark, texts):
    """Pigeonhole completeness of the 8-band aHash candidate join: for
    ANY payload set, every pair at Hamming distance <= 7 must appear in
    the banded candidate pairs (threshold set to 7, the completeness
    bound) — checked against brute-force Hamming over the hash bits."""
    from commercial_rfp_data_pipeline_spark.operators.multimodal import (
        ahash_neardup_pairs,
        attach_binary,
        perceptual_ahash,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(texts)],
        "doc_id long, text string",
    )
    hashes = perceptual_ahash(attach_binary(docs))
    rows = hashes.select("doc_id", "bits").collect()
    bits = {r.doc_id: r.bits for r in rows}
    want = set()
    ids = sorted(bits)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            h = sum(1 for p, q in zip(bits[a], bits[b]) if p != q)
            if h <= 7:
                want.add((a, b, h))
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in ahash_neardup_pairs(hashes, max_hamming=7).collect()
    }
    assert got == want
