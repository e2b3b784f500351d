"""Tests for the LLM-pipeline extension operators: chunking
properties, ANN recall vs the exact oracle, multimodal plumbing,
streaming/batch parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.operators.chunking import chunk_text


def test_chunker_properties(spark):
    """Every chunk <= size; consecutive chunks overlap by exactly
    `overlap` chars; stitching chunks minus overlaps rebuilds the
    original text."""
    texts = [
        (1, "x" * 50),
        (2, "abcdefghij" * 30),  # 300 chars
        (3, "short"),
        (4, ""),
        (5, "y" * 121),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = chunk_text(df, size=120, overlap=30).collect()
    by_doc: dict[str, list] = {}
    for r in out:
        by_doc.setdefault(r.parent_id, []).append(r)
    originals = dict((str(i), t) for i, t in texts)
    step = 90
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.pos)
        assert all(len(r.chunk) <= 120 for r in chunks)
        for a, b in zip(chunks, chunks[1:]):
            assert a.chunk[step:] == b.chunk[: len(a.chunk) - step]
        stitched = chunks[0].chunk + "".join(c.chunk[30:] for c in chunks[1:])
        assert stitched == originals[doc], doc
        assert [c.chunk_id for c in chunks] == [f"{doc}_{i}" for i in range(len(chunks))]


def test_chunker_reference_constants(spark):
    """Default 2000/500 (indexer:168-169): a 5000-char doc -> 3 chunks."""
    df = spark.createDataFrame([(1, "a" * 5000)], "doc_id long, text string")
    out = chunk_text(df).collect()
    assert len(out) == 3
    assert all(len(r.chunk) <= 2000 for r in out)


def test_ann_lsh_recall_vs_exact(spark, sf_dir):
    """LSH ANN is rows-only for the driver; here we judge it against
    the exact oracle. With 6 independent 4-bit Gaussian tables the
    OR-amplified recall is 1-(1-p^4)^6 ~ 0.5 on this corpus (measured
    0.48); pin it above 0.4."""
    from commercial_rfp_data_pipeline_spark.queries.vector_q import (
        q_ann_lsh,
        q_knn_exact,
    )

    exact = {(r.q_id, r.vec_id) for r in q_knn_exact(spark, sf_dir).collect()}
    ann = {(r.q_id, r.vec_id) for r in q_ann_lsh(spark, sf_dir).collect()}
    assert ann, "LSH returned nothing"
    recall = len(exact & ann) / len(exact)
    assert recall > 0.4, f"recall collapsed: {recall}"


def test_ivf_recall_vs_exact(spark, sf_dir):
    """IVF@nprobe=2 recall against the exact top-5: deterministic, so
    the value is pinned by construction (trained Lloyd centroids
    measured 0.48 here) — assert it stays above 0.4 and that every IVF
    hit's sim <= the exact top-1's sim per query."""
    from commercial_rfp_data_pipeline_spark.queries.vector_q import (
        q_ivf_search,
        q_knn_exact,
    )

    exact_rows = q_knn_exact(spark, sf_dir).collect()
    ivf_rows = q_ivf_search(spark, sf_dir).collect()
    exact = {(r.q_id, r.vec_id) for r in exact_rows}
    ivf = {(r.q_id, r.vec_id) for r in ivf_rows}
    assert ivf, "IVF returned nothing"
    recall = len(exact & ivf) / len(exact)
    assert recall > 0.4, f"recall collapsed: {recall}"
    top1 = {r.q_id: r.sim for r in exact_rows if r.rnk == 1}
    assert all(r.sim <= top1[r.q_id] for r in ivf_rows)


def test_ivf_search_match_cols_same_name_and_contract(spark, sf_dir):
    """ADVICE-r5: (a) match_cols works when the corpus and query
    metadata columns share a NAME (internal aliasing — previously an
    ambiguous-reference AnalysisException); (b) an externally-supplied
    ``assigned`` missing the column fails up front with a descriptive
    ValueError, not a deep join error."""
    import pytest

    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        ivf_assign,
        ivf_centroids,
        ivf_search,
    )

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    q = (
        v.filter(F.col("vec_id") < 3)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_vec"),
            "label",  # SAME name as the corpus column
        )
    )
    got = ivf_search(v, q, k=3, match_cols=("label", "label")).collect()
    assert got, "same-name filtered search returned nothing"
    # every hit honors the filter: corpus label == query label
    lbl = {r.vec_id: r.label for r in v.select("vec_id", "label").collect()}
    for r in got:
        assert lbl[r.vec_id] == lbl[r.q_id], r

    # distinct-name spelling must give identical results
    q2 = q.withColumnRenamed("label", "q_label")
    got2 = ivf_search(v, q2, k=3, match_cols=("label", "q_label")).collect()
    assert {tuple(r) for r in got} == {tuple(r) for r in got2}

    # external assigned WITHOUT the metadata column -> loud contract
    cents = ivf_centroids(v, 16, "vec_id", "embedding")
    bare = ivf_assign(v, cents=cents).select(
        "vec_id", "embedding", "cent_id", "_n"
    )
    with pytest.raises(ValueError, match="match_cols"):
        ivf_search(
            None, q2, cents=cents, assigned=bare,
            match_cols=("label", "q_label"),
        )


def test_simhash_banding_exhaustive(spark, sf_dir):
    """The 4x4-bit band join must find EXACTLY the all-pairs Hamming<=3
    set (pigeonhole), under different partitionings."""
    from commercial_rfp_data_pipeline_spark.operators.textops import (
        simhash,
        simhash_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").limit(200)
    sh = simhash(docs).collect()
    naive = set()
    for i, a in enumerate(sh):
        for b in sh[i + 1 :]:
            d = sum(x != y for x, y in zip(a.simhash, b.simhash))
            if d <= 3:
                pair = (min(a.doc_id, b.doc_id), max(a.doc_id, b.doc_id))
                naive.add(pair)
    for nparts in (1, 7):
        sh_df = simhash(docs).repartition(nparts)
        got = {
            (r.doc_a, r.doc_b) for r in simhash_pairs(sh_df).collect()
        }
        assert got == naive


def test_multimodal_stub_and_plumbing(spark, sf_dir):
    from commercial_rfp_data_pipeline_spark.operators.multimodal import (
        attach_binary,
        decode_image_stub,
        extract_features,
    )

    # round 8 closed the real=True seam with the in-sandbox PNG codec:
    # valid PNGs decode (test_png_codec_roundtrip_all_filters); invalid
    # bytes / unsupported mimes are loud ValueErrors, never silent
    with pytest.raises(ValueError):
        decode_image_stub(b"bytes", "image/png", real=True)
    with pytest.raises(ValueError):
        decode_image_stub(b"bytes", "audio/wav", real=True)

    docs = load_table(spark, sf_dir, "documents").limit(50)
    feats = extract_features(attach_binary(docs))
    rows = feats.collect()
    assert len(rows) == 50
    assert all(r.n_bytes > 0 and len(r.content_md5) == 32 for r in rows)
    assert {r.mime for r in rows} <= {"image/png", "audio/wav", "video/mp4"}


def test_perceptual_ahash_clusters_what_byte_dedup_cannot(spark):
    """The round-7 contrast: byte-DISTINCT but perceptually-identical
    payloads (same content, different whitespace/case — the re-encoded
    duplicate) land in ONE aHash cluster, while exact byte dedup
    (content_md5) keeps them apart; an unrelated payload stays in its
    own cluster. Also pins the pigeonhole completeness claim: the
    banded candidate join finds the pair without any brute-force
    fallback."""
    from commercial_rfp_data_pipeline_spark.operators.dedup import (
        dup_clusters,
    )
    from commercial_rfp_data_pipeline_spark.operators.multimodal import (
        ahash_neardup_pairs,
        attach_binary,
        extract_features,
        perceptual_ahash,
    )

    base = "the quick brown fox jumps over the lazy dog near the old river bank"
    docs = spark.createDataFrame(
        [
            (0, base),
            # byte-distinct re-encoding: case + whitespace variants
            (1, "  The   QUICK brown fox JUMPS over the lazy dog near the old river BANK "),
            (2, "completely different payload about spark shuffles joins aggregates windows partitions executors stages"),
        ],
        "doc_id long, text string",
    )
    b = attach_binary(docs)

    # exact byte dedup: all three payloads are byte-distinct
    md5s = [r.content_md5 for r in extract_features(b).collect()]
    assert len(set(md5s)) == 3

    hashes = perceptual_ahash(b)
    pairs = ahash_neardup_pairs(hashes, max_hamming=6)
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
    assert (0, 1) in got and got[(0, 1)] == 0  # normalization-identical
    assert (0, 2) not in got and (1, 2) not in got

    clusters = {
        r.doc_id: r.cluster_id
        for r in dup_clusters(docs.select("doc_id"), pairs).collect()
    }
    assert clusters[0] == clusters[1] == 0 and clusters[2] == 2


def test_perceptual_hash_gramless_payloads_never_cluster(spark):
    """ADVICE r7 (low): payloads with fewer than 2 words used to hash
    to identical all-zero bit vectors and weld into one spurious
    Hamming-0 mega-cluster. They must now carry NULL hash/bits/bands
    (aHash AND dHash), generate NO candidate pairs, and come out of
    clustering as singletons."""
    from commercial_rfp_data_pipeline_spark.operators.dedup import (
        dup_clusters,
    )
    from commercial_rfp_data_pipeline_spark.operators.multimodal import (
        ahash_neardup_pairs,
        attach_binary,
        perceptual_ahash,
        perceptual_dhash,
    )

    docs = spark.createDataFrame(
        [
            (0, "one"),  # single word: no bigrams
            (1, "word"),  # another gram-less payload
            (2, ""),  # empty payload
            (3, "a real payload with enough words to hash properly"),
            (4, "a real payload with enough words to hash properly"),
        ],
        "doc_id long, text string",
    )
    b = attach_binary(docs)
    for fn, hcol in [(perceptual_ahash, "ahash"), (perceptual_dhash, "dhash")]:
        rows = {r.doc_id: r for r in fn(b).collect()}
        assert len(rows) == 5  # gram-less docs keep their row
        for d in (0, 1, 2):
            assert rows[d][hcol] is None and rows[d].bits is None
            assert rows[d].bands is None
        assert rows[3][hcol] is not None and rows[3].bits is not None

    hashes = perceptual_ahash(b)
    pairs = ahash_neardup_pairs(hashes, max_hamming=6)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert got == {(3, 4)}  # only the real near-dup pair, no 0-1-2 weld
    clusters = {
        r.doc_id: r.cluster_id
        for r in dup_clusters(docs.select("doc_id"), pairs).collect()
    }
    assert clusters == {0: 0, 1: 1, 2: 2, 3: 3, 4: 3}


def _mk_png(seed: int, noise_px: int = 0, **enc_kw) -> bytes:
    """Deterministic 16x16 RGB test image from an md5-seeded pixel
    pattern; noise_px perturbs that many pixels (small edits)."""
    import hashlib as _h

    from commercial_rfp_data_pipeline_spark.functions.png import encode_png

    px = bytearray()
    for y in range(16):
        row_seed = _h.md5(f"{seed}:{y}".encode()).digest()
        for x in range(16):
            px.extend(
                row_seed[(3 * x) % 16 : (3 * x) % 16 + 3].ljust(3, b"\x00")
            )
    for k in range(noise_px):
        o = (k * 97) % (len(px) - 3)
        px[o] = (px[o] + 128) % 256
    return encode_png(16, 16, bytes(px), color_type=2, **enc_kw)


def test_png_codec_roundtrip_all_filters(spark):
    """functions/png.py: encode -> decode round-trips pixels exactly
    for gray/RGB/RGBA across filter and compression choices, and the
    decoder handles all five scanline filter types (a crafted stream
    using None/Sub/Up/Average/Paeth per row decodes exactly)."""
    import struct
    import zlib

    from commercial_rfp_data_pipeline_spark.functions.png import (
        decode_png,
        encode_png,
    )

    import random

    rng = random.Random(7)
    for w, h, ct in [(16, 16, 2), (32, 20, 0), (13, 9, 6)]:
        ch = {0: 1, 2: 3, 6: 4}[ct]
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        for ft in (0, 2):
            b = encode_png(w, h, px, color_type=ct, filter_type=ft)
            d = decode_png(b)
            assert bytes(d["pixels"]) == px
            assert (d["width"], d["height"], d["channels"]) == (w, h, ch)

    # craft one row per filter type (gray, 4 wide)
    w, h = 4, 5
    px = bytes((x * 17 + y * 31) % 256 for y in range(h) for x in range(w))

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    prev = [0] * w
    for y, f in enumerate([0, 1, 2, 3, 4]):
        row = list(px[y * w : (y + 1) * w])
        raw.append(f)
        if f == 0:
            enc = row
        elif f == 1:
            enc = [
                (row[x] - (row[x - 1] if x > 0 else 0)) & 0xFF
                for x in range(w)
            ]
        elif f == 2:
            enc = [(row[x] - prev[x]) & 0xFF for x in range(w)]
        elif f == 3:
            enc = [
                (row[x] - (((row[x - 1] if x > 0 else 0) + prev[x]) >> 1))
                & 0xFF
                for x in range(w)
            ]
        else:
            enc = [
                (
                    row[x]
                    - paeth(
                        row[x - 1] if x > 0 else 0,
                        prev[x],
                        prev[x - 1] if x > 0 else 0,
                    )
                )
                & 0xFF
                for x in range(w)
            ]
        raw.extend(enc)
        prev = row

    def chunk(t, b):
        return (
            struct.pack(">I", len(b))
            + t
            + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert bytes(decode_png(data)["pixels"]) == px

    # the decode_image_stub(real=True) seam is CLOSED for PNG
    from commercial_rfp_data_pipeline_spark.operators.multimodal import (
        decode_image_stub,
    )

    feats = decode_image_stub(_mk_png(1), "image/png", real=True)
    assert feats == {"width": 16, "height": 16, "n_frames": 1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_image_stub(b"not a png", "image/png", real=True)
    with _pytest.raises(ValueError):
        decode_image_stub(_mk_png(1), "audio/wav", real=True)


def test_perceptual_ahash_over_real_pixels(spark):
    """Round 8 (VERDICT r7 #5): aHash/dHash over ACTUAL decoded PNG
    pixels. Byte-distinct re-encodings of the same image (different
    filter/compression) hash IDENTICALLY; a lightly-noised variant
    lands within the near-dup Hamming budget of its source while a
    different image does not; invalid payloads surface as NULL-hash
    singletons; and the banded candidate join clusters exactly the
    re-encode + noise family."""
    from commercial_rfp_data_pipeline_spark.operators.dedup import (
        dup_clusters,
    )
    from commercial_rfp_data_pipeline_spark.operators.multimodal import (
        ahash_neardup_pairs,
        perceptual_ahash_image,
        perceptual_dhash_image,
    )

    img_a0 = _mk_png(1, filter_type=0, compress_level=9)
    img_a1 = _mk_png(1, filter_type=2, compress_level=1)  # re-encoded
    img_a2 = _mk_png(1, noise_px=2)  # small edit
    img_b = _mk_png(2)  # different content
    assert img_a0 != img_a1  # byte-distinct
    docs = spark.createDataFrame(
        [
            (0, bytearray(img_a0)),
            (1, bytearray(img_a1)),
            (2, bytearray(img_a2)),
            (3, bytearray(img_b)),
            (4, bytearray(b"corrupt payload")),
        ],
        "doc_id long, payload binary",
    )
    for fn, hcol in [
        (perceptual_ahash_image, "ahash"),
        (perceptual_dhash_image, "dhash"),
    ]:
        rows = {r.doc_id: r for r in fn(docs).collect()}
        assert rows[0][hcol] == rows[1][hcol]  # re-encode invariant
        assert rows[0].bits == rows[1].bits
        assert rows[4][hcol] is None and rows[4].bits is None
        assert rows[0][hcol] != rows[3][hcol]  # different content

    hashes = perceptual_ahash_image(docs)
    pairs = ahash_neardup_pairs(hashes, max_hamming=6)
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
    assert got.get((0, 1)) == 0
    assert (0, 2) in got and got[(0, 2)] <= 6  # noised variant caught
    assert not any(3 in p or 4 in p for p in got)
    clusters = {
        r.doc_id: r.cluster_id
        for r in dup_clusters(docs.select("doc_id"), pairs).collect()
    }
    assert clusters[0] == clusters[1] == clusters[2] == 0
    assert clusters[3] == 3 and clusters[4] == 4


def _mk_wav(freqs, n=4096, rate=8000, gain=3000.0, stereo=False):
    """Deterministic test tone: a sum of sines at the given
    frequencies, optionally duplicated into two channels."""
    import math

    from commercial_rfp_data_pipeline_spark.functions.wav import encode_wav

    mono = [
        int(
            gain
            * sum(math.sin(2 * math.pi * f * t / rate) for f in freqs)
        )
        for t in range(n)
    ]
    if stereo:
        inter = []
        for s in mono:
            inter.extend((s, s))
        return encode_wav(inter, rate, n_channels=2)
    return encode_wav(mono, rate)


def test_wav_codec_and_audio_perceptual_hash(spark):
    """Round 8 audio seam: WAV round-trips exactly; byte-distinct
    re-encodings of the same SIGNAL (mono vs duplicated-stereo) hash
    identically through the time x freq-band energy grid; a
    gain-scaled copy lands within the near-dup Hamming budget; a
    different tone does not; corrupt payloads carry the NULL
    sentinel."""
    from commercial_rfp_data_pipeline_spark.functions.wav import (
        decode_wav,
        encode_wav,
    )
    from commercial_rfp_data_pipeline_spark.operators.dedup import (
        dup_clusters,
    )
    from commercial_rfp_data_pipeline_spark.operators.multimodal import (
        ahash_neardup_pairs,
        decode_audio_stub,
        perceptual_ahash_audio,
    )

    samples = [0, 1000, -1000, 32767, -32768, 7, -7]
    d = decode_wav(encode_wav(samples, 8000))
    assert d["samples"] == samples and d["sample_rate"] == 8000

    mono = _mk_wav([440, 1200])
    stereo = _mk_wav([440, 1200], stereo=True)  # byte-distinct re-encode
    louder = _mk_wav([440, 1200], gain=6000.0)  # gain-scaled copy
    other = _mk_wav([300, 2600, 3500])  # different content
    assert mono != stereo
    feats = decode_audio_stub(stereo, "audio/wav", real=True)
    assert feats["n_channels"] == 2 and feats["n_samples"] == 4096
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_audio_stub(b"junk", "audio/wav", real=True)
    with _pytest.raises(ValueError):
        decode_audio_stub(mono, "video/mp4", real=True)

    docs = spark.createDataFrame(
        [
            (0, bytearray(mono)),
            (1, bytearray(stereo)),
            (2, bytearray(louder)),
            (3, bytearray(other)),
            (4, bytearray(b"corrupt")),
        ],
        "doc_id long, payload binary",
    )
    hashes = perceptual_ahash_audio(docs)
    rows = {r.doc_id: r for r in hashes.collect()}
    assert rows[0].ahash == rows[1].ahash  # channel-layout invariant
    assert rows[4].ahash is None and rows[4].bits is None

    pairs = ahash_neardup_pairs(hashes, max_hamming=6)
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
    assert got.get((0, 1)) == 0
    assert (0, 2) in got  # gain-scaled copy caught
    assert not any(3 in p or 4 in p for p in got)
    clusters = {
        r.doc_id: r.cluster_id
        for r in dup_clusters(docs.select("doc_id"), pairs).collect()
    }
    assert clusters[0] == clusters[1] == clusters[2] == 0
    assert clusters[3] == 3 and clusters[4] == 4


def test_streaming_matches_batch(spark, sf_dir):
    """Streaming tumbling counts == batch tumbling counts on the finite
    events table (batch is the DuckDB-checked oracle)."""
    from commercial_rfp_data_pipeline_spark.queries.events_q import q_tumbling
    from commercial_rfp_data_pipeline_spark.streaming.windows import (
        read_events_stream,
        run_to_completion,
        tumbling_counts,
    )

    stream = read_events_stream(spark, sf_dir)
    got = run_to_completion(tumbling_counts(stream), "t_tumbling", mode="complete")
    want = q_tumbling(spark, sf_dir).select("window_start", "event_type", "n")
    g = {(r.window_start, r.event_type): r.n for r in got.collect()}
    w = {(r.window_start, r.event_type): r.n for r in want.collect()}
    assert g == w


def test_streaming_sliding_matches_batch(spark, sf_dir):
    """Streaming sliding-window counts == the oracle-checked batch
    sliding query on finite replay."""
    from commercial_rfp_data_pipeline_spark.queries.events_q import q_sliding
    from commercial_rfp_data_pipeline_spark.streaming.windows import (
        read_events_stream,
        run_to_completion,
        sliding_counts,
    )

    stream = read_events_stream(spark, sf_dir)
    got = run_to_completion(sliding_counts(stream), "t_sliding", mode="complete")
    want = q_sliding(spark, sf_dir).select("window_start", "event_type", "n")
    g = {(r.window_start, r.event_type): r.n for r in got.collect()}
    w = {(r.window_start, r.event_type): r.n for r in want.collect()}
    assert g == w


def test_streaming_dedup(spark, sf_dir):
    from commercial_rfp_data_pipeline_spark.streaming.windows import (
        read_events_stream,
        run_to_completion,
        streaming_dedup,
    )

    stream = read_events_stream(spark, sf_dir)
    got = run_to_completion(streaming_dedup(stream), "t_dedup", mode="append")
    n = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert got.count() == n


def test_exactly_once_sink_crash_replay_no_dupes(spark, tmp_path):
    """Exactly-once by idempotent batch_id overwrite: inject a crash in
    the window AFTER the sink write but BEFORE the checkpoint commit
    (where an at-least-once sink duplicates data), restart from the
    same checkpoint, and assert the replayed batch overwrote itself —
    every input row exactly once. A third no-new-data run emits
    nothing."""
    import pytest
    from pyspark.errors import StreamingQueryException

    from commercial_rfp_data_pipeline_spark.streaming.sinks import (
        exactly_once_parquet_sink,
    )

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for lo, hi in ((0, 10), (10, 20), (20, 30)):
        spark.range(lo, hi).coalesce(1).write.mode("append").parquet(inp)
    schema = spark.read.parquet(inp).schema

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(inp)
        )

    calls = {"n": 0}

    def boom(batch_id: int) -> None:
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash after write, before commit")

    q = exactly_once_parquet_sink(stream(), out, ckpt, on_batch_written=boom)
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()

    q2 = exactly_once_parquet_sink(stream(), out, ckpt)
    q2.awaitTermination()
    got = sorted(r.id for r in spark.read.parquet(out).select("id").collect())
    assert got == list(range(30)), "replay duplicated or dropped rows"

    q3 = exactly_once_parquet_sink(stream(), out, ckpt)
    q3.awaitTermination()
    assert spark.read.parquet(out).count() == 30


def test_dedup_ingest_sink_incremental_and_replay_safe(spark, tmp_path):
    """Incremental dedup ingest: later batches drop content already in
    the store; a crash after the sink write replays the batch against
    the same store state and overwrites itself — the final corpus has
    exactly one doc per distinct content, even across the crash."""
    import pytest
    from pyspark.errors import StreamingQueryException

    from commercial_rfp_data_pipeline_spark.streaming.sinks import dedup_ingest_sink

    inp = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    # three files; content B repeats in file 2, C repeats in file 3
    files = [
        [(1, "content A"), (2, "content B")],
        [(3, "content  B"), (4, "content C")],  # B again (ws-normalized)
        [(5, "content C"), (6, "content D")],
    ]
    # pin file mtimes: the file source orders batches by modification
    # time, and three back-to-back writes can tie on the same
    # millisecond — explicit increasing mtimes make the batch order
    # (and therefore the first-arrival assertion) deterministic
    import glob as _glob
    import os as _os

    seen: set[str] = set()
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(inp)
        for f in _glob.glob(inp + "/*.parquet"):
            if f not in seen:
                _os.utime(f, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
                seen.add(f)
    schema = spark.read.parquet(inp).schema

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(inp)
        )

    calls = {"n": 0}

    def boom(batch_id: int) -> None:
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash after write, before commit")

    q = dedup_ingest_sink(stream(), store, ckpt, on_batch_written=boom)
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()
    q2 = dedup_ingest_sink(stream(), store, ckpt)
    q2.awaitTermination()

    got = spark.read.parquet(store).select("doc_id", "fp").collect()
    # one row per distinct content: A, B, C, D
    assert len(got) == 4
    assert len({r.fp for r in got}) == 4
    # survivors are the FIRST arrival of each content
    assert sorted(r.doc_id for r in got) == [1, 2, 4, 6]


def test_streaming_parquet_sink_end_to_end(spark, sf_dir, tmp_path):
    """Full incremental pipeline shape: stream -> watermarked tumbling
    agg -> parquet file sink with checkpoint — the durable-output path
    a production run uses (append mode; finite replay flushes windows
    the watermark passes)."""
    from commercial_rfp_data_pipeline_spark.streaming.windows import (
        read_events_stream,
        tumbling_counts,
    )

    out = str(tmp_path / "agg_out")
    ckpt = str(tmp_path / "ckpt")
    stream = tumbling_counts(read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    back = spark.read.parquet(out)
    assert set(back.columns) == {"window_start", "event_type", "n"}
    # append mode emits only watermark-closed windows: every emitted
    # row must agree with the batch computation
    from commercial_rfp_data_pipeline_spark.queries.events_q import q_tumbling

    want = {
        (r.window_start, r.event_type): r.n
        for r in q_tumbling(spark, sf_dir).collect()
    }
    rows = back.collect()
    assert rows, "sink produced no files"
    for r in rows:
        assert want[(r.window_start.replace(tzinfo=None), r.event_type)] == r.n


def test_production_conf_sanity():
    from commercial_rfp_data_pipeline_spark.session import production_conf

    conf = production_conf(total_cores=4000, executor_mem_gb=32)
    assert int(conf["spark.sql.shuffle.partitions"]) == 10000
    assert int(conf["spark.sql.files.maxPartitionBytes"]) == 128 * 1024 * 1024
    assert "RocksDBStateStoreProvider" in conf[
        "spark.sql.streaming.stateStore.providerClass"
    ]


def test_stateful_running_stats_matches_batch(spark, sf_dir):
    """applyInPandasWithState running stats on finite replay == batch
    groupBy (the batch side is the oracle-checked plan family)."""
    from commercial_rfp_data_pipeline_spark.streaming.stateful import (
        user_running_stats,
    )
    from commercial_rfp_data_pipeline_spark.streaming.windows import (
        read_events_stream,
        run_to_completion,
    )

    stream = read_events_stream(spark, sf_dir)
    got_df = run_to_completion(user_running_stats(stream), "t_stateful", mode="update")
    # update mode may emit once per key per batch: keep the final row
    # (max n_events) per user
    rows = got_df.collect()
    got = {}
    for r in rows:
        if r.user_id not in got or r.n_events > got[r.user_id][0]:
            got[r.user_id] = (r.n_events, round(r.total_value, 6), r.last_ts)
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    )
    want = {r.user_id: (r.n, float(r.total), r.last_ts) for r in batch}
    assert set(got) == set(want)
    for uid in want:
        gn, gt, gts = got[uid]
        wn, wt, wts = want[uid]
        assert gn == wn and gt == pytest.approx(wt, abs=1e-6), uid
        assert gts.replace(tzinfo=None) == wts.replace(tzinfo=None), uid


def test_salted_agg_equals_plain(spark, sf_dir):
    """Salted two-phase aggregation must equal the plain groupBy for
    every decomposable aggregate, under different salt counts."""
    from commercial_rfp_data_pipeline_spark.operators.skew import (
        salted_two_phase_agg,
    )

    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r.l_returnflag: (r.n, round(r.s, 2), r.mx)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("s"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    for n_salts in (2, 16):
        out = salted_two_phase_agg(
            li.withColumn("qd", F.col("l_quantity").cast("decimal(12,2)")),
            keys=["l_returnflag"],
            salt_src="l_orderkey",
            aggs={"n": ("l_quantity", "count"), "s": ("qd", "sum"), "mx": ("l_extendedprice", "max")},
            n_salts=n_salts,
        )
        got = {r.l_returnflag: (r.n, round(r.s, 2), r.mx) for r in out.collect()}
        assert got == plain


def test_save_and_ensure_table_lifecycle(spark, sf_dir, tmp_path):
    """K2/K4 + idempotent DDL: overwrite-rebuild keeps counts stable;
    ensure_table builds once and is a no-op when present."""
    from commercial_rfp_data_pipeline_spark.io import ensure_table, save_table

    df = load_table(spark, sf_dir, "region")
    out = str(tmp_path / "archive")
    save_table(df, out)
    save_table(df, out)  # overwrite, not append
    assert spark.read.parquet(out).count() == df.count()

    calls = []

    def builder():
        calls.append(1)
        return df

    p2 = str(tmp_path / "ensured")
    ensure_table(spark, p2, builder)
    ensure_table(spark, p2, builder)
    assert calls == [1]


def test_streaming_sessions_run(spark, sf_dir):
    from commercial_rfp_data_pipeline_spark.streaming.windows import (
        read_events_stream,
        run_to_completion,
        session_counts,
    )

    stream = read_events_stream(spark, sf_dir)
    got = run_to_completion(session_counts(stream), "t_sessions", mode="complete")
    assert got.count() > 0


def test_embedding_neardup_lsh_subset_of_exact(spark, sf_dir):
    """The bucketed near-dup path returns a SUBSET of the exact
    all-pairs result (same scoring, restricted candidates); recall is
    a deterministic property of the (bits, tables) config — 4x4-bit
    Gaussian tables measured 0.47 here; pin above 0.35."""
    from commercial_rfp_data_pipeline_spark.queries.vector_q import (
        _q_embedding_neardup_lsh,
        q_embedding_neardup,
    )

    exact = {(r.id_a, r.id_b): r.sim for r in q_embedding_neardup(spark, sf_dir).collect()}
    lsh = {(r.id_a, r.id_b): r.sim for r in _q_embedding_neardup_lsh(spark, sf_dir).collect()}
    assert lsh, "LSH near-dup returned nothing"
    assert set(lsh) <= set(exact)
    assert all(exact[k] == lsh[k] for k in lsh)  # identical scoring
    assert len(lsh) / len(exact) > 0.35


def test_stream_stream_join_matches_batch_range_join(spark, sf_dir):
    """The watermarked stream-stream interval join replayed over the
    finite events table produces exactly the batch range-join pairs
    (which are DuckDB-oracle-checked)."""
    from commercial_rfp_data_pipeline_spark.queries.advanced_q import q_range_join
    from commercial_rfp_data_pipeline_spark.streaming.windows import (
        read_events_stream,
        run_to_completion,
        stream_click_pairs,
    )

    pairs = stream_click_pairs(
        read_events_stream(spark, sf_dir), read_events_stream(spark, sf_dir)
    )
    got = run_to_completion(pairs, "stream_click_pairs", mode="append")
    stream_set = {(r.user_id, r.id_a, r.id_b, r.gap_s) for r in got.collect()}
    batch_set = {
        (r.user_id, r.id_a, r.id_b, r.gap_s)
        for r in q_range_join(spark, sf_dir).collect()
    }
    assert stream_set == batch_set
    assert stream_set, "no pairs produced"


def test_dup_clusters_chain_and_singletons(spark):
    """Connected components: a 12-node chain (worst-case diameter for
    label propagation — exercises path-halving), a triangle, and
    singletons all resolve to min-id cluster labels."""
    from commercial_rfp_data_pipeline_spark.operators.dedup import dup_clusters

    chain = [(i, i + 1) for i in range(100, 111)]
    triangle = [(200, 201), (201, 202), (200, 202)]
    pairs = spark.createDataFrame(chain + triangle, ["doc_a", "doc_b"])
    node_ids = sorted({n for p in chain + triangle for n in p} | {300, 301})
    nodes = spark.createDataFrame([(n,) for n in node_ids], ["doc_id"])
    got = {r.doc_id: r.cluster_id for r in dup_clusters(nodes, pairs).collect()}
    assert all(got[n] == 100 for n in range(100, 112))
    assert all(got[n] == 200 for n in (200, 201, 202))
    assert got[300] == 300 and got[301] == 301


def test_compression_ratio_matches_zlib(spark):
    """The mapInPandas compressibility signal must agree exactly with
    driver-side zlib (level 6) — the rows-only driver check's pytest
    counterpart. Repetitive text must compress far better than prose."""
    import zlib

    from commercial_rfp_data_pipeline_spark.operators.textops import (
        compression_ratio,
    )

    texts = {
        1: "the quick brown fox jumps over the lazy dog while nobody watches",
        2: "spam " * 200,
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r.doc_id: r for r in compression_ratio(df).collect()}
    for i, t in texts.items():
        raw = len(t.encode())
        comp = len(zlib.compress(t.encode(), 6))
        assert (got[i].raw_bytes, got[i].comp_bytes) == (raw, comp)
        assert abs(got[i].ratio - round(comp / raw, 6)) < 1e-9
    assert got[2].ratio < 0.1 < got[1].ratio


def test_redact_pii_patterns(spark):
    """Each PII shape is counted and replaced with its typed token."""
    from commercial_rfp_data_pipeline_spark.operators.textops import redact_pii

    df = spark.createDataFrame(
        [(1, "Mail a.b@x.co or 555-123-4567, ssn 123-45-6789, ip 10.1.2.3")],
        "doc_id long, text string",
    )
    r = redact_pii(df).collect()[0]
    assert (r.n_email, r.n_ssn, r.n_phone, r.n_ipv4) == (1, 1, 1, 1)
    red = r.text_redacted
    assert "[EMAIL]" in red and "@" not in red
    assert "[SSN]" in red and "[PHONE]" in red and "[IP]" in red


def test_repetition_features_flags_boilerplate(spark):
    """Clean prose keeps; templated repetition and symbol soup drop."""
    from commercial_rfp_data_pipeline_spark.operators.textops import (
        repetition_features,
    )

    good = "the quick brown fox jumps over a lazy dog near the river bank today"
    bad = " ".join(["buy now"] * 30)
    symb = "a b " + "$%#@! " * 40
    df = spark.createDataFrame(
        [(1, good), (2, bad), (3, symb)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in repetition_features(df).collect()}
    assert got[1].keep
    assert not got[2].keep and got[2].top_gram_frac > 0.5
    assert not got[3].keep and got[3].symbol_ratio > 0.1


def test_contamination_overlap_detects_copy(spark):
    """A doc sharing 5-grams with the eval set is flagged; an unrelated
    doc reports zero overlap."""
    from commercial_rfp_data_pipeline_spark.operators.textops import (
        contamination_overlap,
    )

    eval_docs = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "totally different words with no overlap here at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r for r in contamination_overlap(docs, eval_docs, k=5).collect()
    }
    assert got[1].contaminated and got[1].n_shared == 2
    assert not got[2].contaminated and got[2].n_shared == 0


def test_lang_id_ten_languages(spark):
    """The widened stopword-vote lang ID assigns obvious sentences of
    each of the 10 supported languages correctly, and ties fall to the
    priority order (empty text -> 'en')."""
    from commercial_rfp_data_pipeline_spark.operators.textops import lang_id

    samples = [
        (0, "the cat is on the mat and it is warm", "en"),
        (1, "el perro es de la casa y los gatos que", "es"),
        (2, "le chien est pour la maison et les chats", "fr"),
        (3, "der hund ist nicht mit der katze und das haus für", "de"),
        (4, "il cane di casa che per un gatto con del si", "it"),
        (5, "o cachorro do que da casa em um para com", "pt"),
        (6, "de hond is het een van dat op niet met", "nl"),
        (7, "och att det som en på är av för med", "sv"),
        (8, "i w na z do że się nie jest to", "pl"),
        (9, "yang dan di itu dengan untuk tidak ini dari akan", "id"),
        (10, "", "en"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in samples], "doc_id long, text string"
    )
    got = {r.doc_id: r.lang_pred for r in lang_id(df).collect()}
    assert got == {i: lang for i, _, lang in samples}


def test_cluster_survivors_argmax_and_sizes(spark):
    """Survivor selection: highest quality wins per cluster, ascending
    doc_id breaks ties, singletons survive themselves, and n_members
    reports the cluster multiplicity."""
    from commercial_rfp_data_pipeline_spark.operators.dedup import cluster_survivors

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)],
        ["doc_id", "cluster_id"],
    )
    scores = spark.createDataFrame(
        # cluster 1: doc 2 best; cluster 4: tie -> doc 4 (lower id)
        [(1, 0.1), (2, 0.9), (3, 0.5), (4, 0.7), (5, 0.7), (6, 0.3)],
        ["doc_id", "quality_score"],
    )
    got = {
        r.cluster_id: (r.doc_id, r.quality_score, r.n_members)
        for r in cluster_survivors(clusters, scores).collect()
    }
    assert got == {1: (2, 0.9, 3), 4: (4, 0.7, 2), 6: (6, 0.3, 1)}


def test_stratified_sample_partition_invariant(spark):
    """The hash-ranked sample must pick the SAME survivors under any
    physical partitioning (no rand(), no zipWithIndex) — the property
    that makes the training mix reproducible across cluster layouts
    and speculative retries."""
    from commercial_rfp_data_pipeline_spark.operators.textops import (
        stratified_sample,
    )

    rows = [(i, f"s{i % 3}") for i in range(200)]
    results = []
    for nparts in (1, 7, 32):
        df = spark.createDataFrame(rows, ["doc_id", "stratum"]).repartition(nparts)
        got = sorted(
            (r.stratum, r.doc_id)
            for r in stratified_sample(df, ["stratum"], n_per_stratum=5).collect()
        )
        results.append(got)
    assert results[0] == results[1] == results[2]
    assert len(results[0]) == 15


def test_dup_clusters_partition_invariant(spark):
    """Cluster labels must not depend on physical partitioning."""
    from commercial_rfp_data_pipeline_spark.operators.dedup import dup_clusters

    pairs = [(i, i + 1) for i in range(0, 40, 2)] + [(0, 38)]
    nodes = [(n,) for n in range(41)]
    results = []
    for nparts in (1, 7):
        p = spark.createDataFrame(pairs, ["doc_a", "doc_b"]).repartition(nparts)
        n = spark.createDataFrame(nodes, ["doc_id"]).repartition(nparts)
        results.append({r.doc_id: r.cluster_id for r in dup_clusters(n, p).collect()})
    assert results[0] == results[1]


def test_percentiles_approx_error_bound(spark, sf_dir):
    """The sketch path must land near the exact interpolated
    percentiles (within 2% relative on this data) — the accuracy
    contract that justifies using it at scale."""
    from commercial_rfp_data_pipeline_spark.queries.advanced_q import (
        q_percentiles,
        q_percentiles_approx,
    )

    exact = {r.o_orderpriority: r for r in q_percentiles(spark, sf_dir).collect()}
    approx = {
        r.o_orderpriority: r for r in q_percentiles_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        assert abs(approx[k].p50_approx - exact[k].p50) / exact[k].p50 < 0.02
        assert abs(approx[k].p90_approx - exact[k].p90) / exact[k].p90 < 0.02


def test_pq_adc_recall_vs_exact_l2(spark, sf_dir):
    """PQ@4x8 (one Lloyd round) against the exact L2 top-5 at
    sf0.001: deterministic construction pins the measured recall —
    assert it stays above 0.25 (quantization to 4 bytes is lossy by
    design; the oracle checks exactness of the COMPUTATION, this
    checks it still ranks usefully) and codes stay in range."""
    from pyspark.sql import functions as F
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
        _sq_l2,
    )

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    books = pq_codebooks(v, dim=64)
    codes = pq_encode(v, books, dim=64)
    rng = codes.agg(
        F.min("code").alias("lo"), F.max("code").alias("hi"),
        F.countDistinct("vec_id").alias("n"),
    ).first()
    assert rng.lo >= 0 and rng.hi <= 7
    assert rng.n == v.count()

    adc = {(r.q_id, r.vec_id) for r in pq_adc_topk(v, [0, 1, 2], dim=64).collect()}
    q = v.filter(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    full = v.crossJoin(F.broadcast(q)).select(
        "q_id",
        "vec_id",
        _sq_l2(
            F.col("embedding").cast("array<double>"), F.col("qv").cast("array<double>")
        ).alias("d"),
    )
    from pyspark.sql import Window
    w = Window.partitionBy("q_id").orderBy("d", "vec_id")
    exact = {
        (r.q_id, r.vec_id)
        for r in full.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 5")
        .collect()
    }
    recall = len(adc & exact) / len(exact)
    assert recall >= 0.25, f"ADC recall collapsed: {recall}"


def test_kcenter_radius_non_increasing_and_spread(spark):
    """Gonzalez invariants on a known layout: the coverage-radius
    sequence is non-increasing, the first pick after the seed is the
    farthest point, and no vector is selected twice."""
    from pyspark.sql import functions as F
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        kcenter_coreset,
    )

    # three tight clusters far apart on a line (1-D embedded in 4-D)
    rows = []
    for c, base in [(0, 0.0), (1, 100.0), (2, 200.0)]:
        for j in range(5):
            rows.append((c * 10 + j, [base + j * 0.1, 0.0, 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sel = kcenter_coreset(df, k=3)
    assert len(sel) == 3
    ids = [i for _, i, _ in sel]
    assert len(set(ids)) == 3
    dists = [d for _, _, d in sel if d is not None]
    assert all(a >= b for a, b in zip(dists, dists[1:]))
    # the 3 selections must cover all 3 clusters (one per cluster)
    assert {i // 10 for i in ids} == {0, 1, 2}


def test_streaming_windowed_topk_matches_batch(spark, sf_dir, tmp_path):
    """Windowed top-k via the foreachBatch re-rank: the streaming
    counts + per-window overwrite must end at exactly the batch
    answer — top-3 event types per tumbling hour — after the finite
    stream drains."""
    from pyspark.sql import Window as W

    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.streaming.sinks import (
        windowed_topk_sink,
    )
    from commercial_rfp_data_pipeline_spark.streaming.windows import (
        read_events_stream,
    )

    stream = read_events_stream(spark, sf_dir)
    counts = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(
            F.window("ts", "1 hour").getField("start").alias("window_start"),
            "event_type",
        )
        .count()
        .withColumnRenamed("count", "n")
    )
    out = str(tmp_path / "topk")
    q = windowed_topk_sink(
        counts, out, str(tmp_path / "ckpt"), k=3, rank_by="n"
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).select(
        "window_start", "event_type", "n", "rnk"
    )
    e = load_table(spark, sf_dir, "events")
    batch = e.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("window_start").orderBy(F.col("n").desc(), "event_type")
    want = (
        batch.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )
    got_set = {tuple(r) for r in got.collect()}
    want_set = {tuple(r) for r in want.collect()}
    assert got_set == want_set and len(got_set) > 0


def test_search_serving_funnel_is_strictly_narrowing(spark, sf_dir):
    """The serving composition's retrieval-funnel discipline, asserted
    as data: reranked top-3 ⊆ hybrid top-10 shortlist ⊆ BM25 candidate
    set, per query — the expensive stages provably never touch rows
    the cheaper stages didn't admit."""
    from pyspark.sql import Window as W

    from commercial_rfp_data_pipeline_spark.queries.pipeline_q import (
        _hybrid_final,
        q_search_serving,
    )

    final = _hybrid_final(spark, sf_dir)
    cand = {(r.q_id, r.chunk_id) for r in final.select("q_id", "chunk_id").collect()}
    w = W.partitionBy("q_id").orderBy(F.col("hybrid").desc(), F.col("chunk_id"))
    short = {
        (r.q_id, r.chunk_id)
        for r in final.withColumn("rnh", F.row_number().over(w))
        .filter(F.col("rnh") <= 10)
        .collect()
    }
    top3 = {(r.q_id, r.chunk_id) for r in q_search_serving(spark, sf_dir).collect()}
    assert top3 and top3 <= short <= cand
    # and the funnel genuinely narrows when the corpus allows it
    assert len(short) <= len(cand)


def test_knn_graph_exact_and_partition_invariant(spark, sf_dir):
    """The block-grid m-NN graph build must equal the naive all-pairs
    rank regardless of how the corpus is partitioned: local top-m per
    grid cell + global top-m is exact, and xxhash block assignment is
    row-deterministic."""
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        knn_exact,
        knn_graph,
    )
    from commercial_rfp_data_pipeline_spark.queries.vector_q import _vectors

    v = _vectors(spark, sf_dir).select("vec_id", "embedding")
    g = knn_graph(v, m=8)
    rows = {(r.src_id, r.nbr_id, r.sim, r.rnk) for r in g.collect()}
    n_src = v.count()
    assert len(rows) == n_src * 8
    # naive reference: every vector is its own query
    naive = knn_exact(
        v,
        v.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")),
        k=8,
    )
    expect = {(r.q_id, r.vec_id, r.sim, r.rnk) for r in naive.collect()}
    assert rows == expect
    # partition invariance: a different layout + block count, same graph
    g2 = knn_graph(v.repartition(7), m=8, n_blocks=3)
    assert {(r.src_id, r.nbr_id, r.sim, r.rnk) for r in g2.collect()} == rows


def test_graph_ann_beam_recall_and_determinism(spark, sf_dir):
    """Beam search over the m=8 graph (ef=16, 4 rounds) measures 1.0
    recall@5 on this corpus — pin it above 0.8, and pin run-to-run
    determinism (fixed entry point, fixed rounds, (sim DESC, id)
    ranking leave nothing to scheduling)."""
    from commercial_rfp_data_pipeline_spark.queries.vector_q import (
        q_graph_ann_beam,
        q_knn_exact,
    )

    exact = {(r.q_id, r.vec_id) for r in q_knn_exact(spark, sf_dir).collect()}
    run1 = q_graph_ann_beam(spark, sf_dir).collect()
    beam = {(r.q_id, r.vec_id) for r in run1}
    recall = len(exact & beam) / len(exact)
    assert recall > 0.8, f"beam recall collapsed: {recall}"
    run2 = {(r.q_id, r.vec_id, r.sim, r.rnk) for r in q_graph_ann_beam(spark, sf_dir).collect()}
    assert {(r.q_id, r.vec_id, r.sim, r.rnk) for r in run1} == run2


def test_graph_ann_hnsw_recall_and_hierarchy_advantage(spark, sf_dir):
    """Hierarchical HNSW (2 upper + 3 base rounds, 4 entry points)
    must (a) stay near-exact on the smoke corpus (measured 0.96 —
    one borderline tie differs from the flat search's perfect 1.0 on
    500 trivially-navigable vectors), (b) be deterministic run to run,
    and (c) at sf0.01 — where navigation starts to matter — meet or
    beat the flat 4-round beam's recall with FEWER base-layer hops
    (measured 1.00 vs 0.88; 0.72 vs 0.36 at sf0.1). (c) is the entire
    justification for the upper layer: per-query entry points already
    near the target replace expansion rounds from a fixed global
    node."""
    from commercial_rfp_data_pipeline_spark.queries.vector_q import (
        q_graph_ann_beam,
        q_graph_ann_hnsw,
        q_knn_exact,
    )

    exact = {(r.q_id, r.vec_id) for r in q_knn_exact(spark, sf_dir).collect()}
    run1 = q_graph_ann_hnsw(spark, sf_dir).collect()
    hnsw = {(r.q_id, r.vec_id) for r in run1}
    recall = len(exact & hnsw) / len(exact)
    assert recall >= 0.9, f"hnsw recall collapsed: {recall}"
    run2 = {
        (r.q_id, r.vec_id, r.sim, r.rnk)
        for r in q_graph_ann_hnsw(spark, sf_dir).collect()
    }
    assert {(r.q_id, r.vec_id, r.sim, r.rnk) for r in run1} == run2

    sf01 = "/root/testdata/sf0.01"
    exact01 = {(r.q_id, r.vec_id) for r in q_knn_exact(spark, sf01).collect()}
    flat01 = {(r.q_id, r.vec_id) for r in q_graph_ann_beam(spark, sf01).collect()}
    hnsw01 = {(r.q_id, r.vec_id) for r in q_graph_ann_hnsw(spark, sf01).collect()}
    r_flat = len(exact01 & flat01) / len(exact01)
    r_hnsw = len(exact01 & hnsw01) / len(exact01)
    assert r_hnsw >= r_flat, f"hierarchy lost to flat: {r_hnsw} < {r_flat}"


def test_crossmodal_alignment_own_image_top1(spark, sf_dir):
    """The dual encoders' shared-signal construction must be strong
    enough that every caption retrieves its OWN image at rank 1 (16
    centered dims, 0.3x modality noise -> corr ~0.92, measured 5/5 at
    both test SFs) — the property that makes the retrieval eval
    meaningful rather than decorative."""
    from commercial_rfp_data_pipeline_spark.queries.multimodal_q import (
        q_crossmodal_retrieval,
    )

    rows = q_crossmodal_retrieval(spark, sf_dir).collect()
    top1 = {r.q_id: r.is_own for r in rows if r.rnk == 1}
    assert len(top1) == 5 and all(top1.values()), top1


def test_arrow_udf_matches_expression_token_count(spark, sf_dir):
    """Spark 4's named Arrow UDF (@arrow_udf — pyarrow batches in/out,
    no pandas conversion) computes the whitespace token count with
    Arrow compute kernels and must agree with the native expression
    path row-for-row. This pins the THIRD Python seam tier (rowwise
    pandas_udf < mapInPandas < arrow_udf) the embedder seams can adopt
    — while the registered queries stay expression-only."""
    import pyarrow as pa
    from pyspark.sql.functions import arrow_udf

    from commercial_rfp_data_pipeline_spark.io import load_table

    def _tok(text):
        import pyarrow.compute as pc

        trimmed = pc.utf8_trim_whitespace(text)
        n = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
        empty = pc.equal(pc.utf8_length(trimmed), 0)
        return pc.cast(pc.if_else(empty, pa.scalar(0, pa.int32()), n), pa.float64())

    # this module's `from __future__ import annotations` stringifies
    # inline hints, which arrow_udf cannot resolve — attach real ones
    _tok.__annotations__ = {"text": pa.Array, "return": pa.Array}
    tok_count = arrow_udf(_tok, "double")

    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r.doc_id, r.n)
        for r in docs.select("doc_id", tok_count("text").alias("n")).collect()
    }
    want = {
        (r.doc_id, r.n)
        for r in docs.select(
            "doc_id",
            F.when(F.length(F.trim("text")) == 0, F.lit(0.0))
            .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
            .cast("double")
            .alias("n"),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_nn_descent_recall_vs_exact_graph(spark, sf_dir):
    """NN-descent's approximate build must recover most of the exact
    m-NN graph: measured 0.72 edge recall at sf0.01 and ~0.7 at
    sf0.001 on this near-orthogonal corpus (the hardest case for
    neighbor-of-neighbor transitivity) — pin above 0.55. Refinement
    must also HELP: recall after the 2-hop rounds strictly exceeds the
    LSH-init-only graph's."""
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        nn_descent_graph,
    )
    from commercial_rfp_data_pipeline_spark.queries.vector_q import (
        _vectors,
        q_knn_graph,
        q_nn_descent,
    )

    exact = {(r.src_id, r.nbr_id) for r in q_knn_graph(spark, sf_dir).collect()}
    approx = {(r.src_id, r.nbr_id) for r in q_nn_descent(spark, sf_dir).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall > 0.55, f"nn-descent recall collapsed: {recall}"
    v = _vectors(spark, sf_dir).select("vec_id", "embedding")
    init_only = {
        (r.src_id, r.nbr_id)
        for r in nn_descent_graph(v, dim=64, m=8, rounds=0, n_tables=6).collect()
    }
    recall0 = len(exact & init_only) / len(exact)
    assert recall > recall0, (recall, recall0)


def test_prefix_filter_prunes_candidates_without_losing_pairs(spark, sf_dir):
    """The PPJoin prefix rule must (a) generate STRICTLY fewer
    candidate pairs than full postings-list expansion, and (b) still
    find every pair the full expansion finds at the threshold — the
    completeness theorem, checked empirically on top of the oracle
    equality the registered query already pins."""
    from commercial_rfp_data_pipeline_spark.io import load_table, release_pinned
    from commercial_rfp_data_pipeline_spark.operators.textops import (
        jaccard_pairs,
        jaccard_prefix_filter_pairs,
        shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = shingles(docs)
    full = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(sh, threshold=0.5, max_doc_freq=100).collect()
    }
    release_pinned()
    pref_rows = jaccard_prefix_filter_pairs(
        sh, t_num=1, t_den=2, max_doc_freq=100
    ).collect()
    pref = {(r.doc_a, r.doc_b) for r in pref_rows}
    assert pref == full, (len(pref), len(full))

    # candidate-stream sizes: prefix postings vs full postings
    from pyspark.sql import functions as F

    distinct_sh = sh.select("doc_id", "sh").distinct()
    dft = distinct_sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    capped = distinct_sh.join(dft.filter(F.col("df") <= 100), "sh")
    full_cands = (
        capped.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.expr("d * (d - 1) / 2")).alias("c"))
        .collect()[0]["c"]
    )
    n = capped.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("df", "sh")
    plen = F.col("n_sh") - F.floor((1 * F.col("n_sh") + 1) / 2) + 1
    prefix = (
        capped.join(n, "doc_id")
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= plen)
    )
    pref_cands = (
        prefix.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.expr("d * (d - 1) / 2")).alias("c"))
        .collect()[0]["c"]
    )
    assert pref_cands < full_cands, (pref_cands, full_cands)
    release_pinned()


def test_spacesaving_exact_under_eviction_pressure(spark):
    """The SpaceSaving candidate pass must stay COMPLETE when the
    summary is under real eviction pressure: 600 distinct tail keys
    against capacity 32, with the heavy key's occurrences arriving
    LAST within each partition (the worst case for replace-min — the
    heavy item must displace established counters). The exact recount
    must still return exactly the direct groupBy answer, and the
    candidate set must stay bounded by capacity x partitions."""
    from pyspark.sql import functions as F

    from commercial_rfp_data_pipeline_spark.operators.sketch import (
        spacesaving_heavy_hitters,
    )

    # id-ordered within partitions: tail keys first (ids 0..5999 ->
    # 600 keys x 10 rows), then 4000 rows of the single heavy key
    df = (
        spark.range(0, 10000, 1, 4)
        .select(
            F.when(F.col("id") < 6000, (F.col("id") % 600) + 1000)
            .otherwise(F.lit(7))
            .cast("long")
            .alias("k")
        )
    )
    got = {
        (r.k, r.freq)
        for r in spacesaving_heavy_hitters(df, "k", k=10, capacity=32).collect()
    }
    want = {
        (r.k, r.freq)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * 10 > 10000)
        .collect()
    }
    assert got == want and got == {(7, 4000)}, (got, want)
