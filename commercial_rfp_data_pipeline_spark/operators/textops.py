"""Text-analysis operators for the LLM training-data pipeline
(BASELINE.json extension surface): token counting, quality scoring,
language ID, fingerprinting, shingling, MinHash signatures, SimHash.

Everything is native column expressions (codegen'd, zero Python in the
executor). Hashing uses md5 hex so the DuckDB oracle computes
bit-identical values — engine-specific hashes (xxhash64 etc.) would be
faster but unverifiable; swap ``HASH = F.md5`` for xxhash64 in
production if oracle parity is not needed.

Scale notes per operator are in the docstrings; the common theme: all
shapes are either narrow maps (per-row expressions) or single-shuffle
groupBy/self-join on content keys, with document-frequency caps
guarding the shingle inverted index against hot-key explosion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import pin

# language -> 10 highest-signal stopwords; dict ORDER is the
# deterministic tiebreak priority for lang_id (earlier wins ties).
# Shared words (de/la/en/...) are fine — they just vote for several
# languages and the distinctive ones break the tie.
LANG_STOPWORDS = {
    "en": ("the", "a", "of", "to", "and", "in", "is", "for", "on", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "los"),
    "fr": ("le", "la", "de", "et", "un", "en", "est", "que", "pour", "les"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "für"),
    "it": ("il", "di", "che", "e", "la", "per", "un", "con", "del", "si"),
    "pt": ("o", "de", "que", "e", "do", "da", "em", "um", "para", "com"),
    "nl": ("de", "het", "een", "van", "en", "is", "dat", "op", "niet", "met"),
    "sv": ("och", "att", "det", "som", "en", "på", "är", "av", "för", "med"),
    "pl": ("i", "w", "na", "z", "do", "że", "się", "nie", "jest", "to"),
    "id": ("yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari", "akan"),
}
STOPWORDS_EN = LANG_STOPWORDS["en"]
STOPWORDS_ES = LANG_STOPWORDS["es"]
STOPWORDS_FR = LANG_STOPWORDS["fr"]
PUNCT_PATTERN = r"[.,;:!?]"


def norm_text(col: Column | str) -> Column:
    """Canonical text form shared by all text operators: lowercase,
    whitespace-collapsed, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c.cast("string"), r"\s+", " ")))


def words(col: Column | str) -> Column:
    return F.split(norm_text(col), " ")


def token_count(col: Column | str) -> Column:
    """Whitespace token count; empty text -> 0."""
    t = norm_text(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, " ")))


def _count_in(arr: Column, vocab: tuple[str, ...]) -> Column:
    return F.size(F.filter(arr, lambda w: w.isin(*vocab)))


# BPE-style pre-tokenizer classes (contractions, letter runs, digit
# runs, punctuation runs) — the GPT-2 pattern family restricted to
# syntax both Java regex (Spark) and RE2 (DuckDB) execute identically
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9\s']+"


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish subword-boundary token count: splits letter runs, digit
    runs, punctuation runs, and English contractions separately —
    tracks LLM tokenizer pre-segmentation far closer than whitespace
    counting (e.g. 'don't stop!!' -> [don]['t][stop][!!] = 4, not 2).
    Narrow per-row expression, codegen'd."""
    return F.size(F.regexp_extract_all(norm_text(col), F.lit(BPE_PATTERN), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features (length, token count, punctuation
    ratio, stopword ratio) + a blended [0,1] score. Narrow map — scales
    embarrassingly."""
    t = norm_text(text_col)
    w = F.split(t, " ")
    n_chars = F.length(t)
    n_tokens = token_count(text_col)
    punct = F.size(F.regexp_extract_all(t, F.lit(PUNCT_PATTERN), 0))
    stop = _count_in(w, STOPWORDS_EN)
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens / F.lit(200.0), F.lit(1.0)) * 0.5
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2
    )
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID over the 10 LANG_STOPWORDS languages,
    deterministic tiebreak by dict order (en > es > fr > de > it > pt >
    nl > sv > pl > id) on equal votes. Heuristic lexicon approach —
    per-row expressions, no model, no shuffle. The Spark F.when chain
    and the oracle CASE chain are both GENERATED from LANG_STOPWORDS,
    so the two engines can't drift.

    The vote columns are projected through an intermediate select so
    the prediction chain compares plain attributes — array-HOF
    expressions (F.filter) get no codegen CSE, so without the barrier
    each vote would re-inline into up to 9 comparisons. The words()
    split itself is ALSO projected to an attribute first: inlined, the
    split re-executes once per language vote (10x after the ten-language
    widening — measured 1.55x on the stratified-sample consumer at
    sf0.1), the same HOF re-inlining trap fixed in char_trigrams."""
    langs = list(LANG_STOPWORDS)
    arr = df.select("doc_id", words(text_col).alias("_w"))
    base = arr.select(
        "doc_id",
        *[
            _count_in(F.col("_w"), LANG_STOPWORDS[lang]).alias(f"votes_{lang}")
            for lang in langs
        ],
    )
    pred = None
    for i, lang in enumerate(langs[:-1]):
        cond = F.lit(True)
        for later in langs[i + 1 :]:
            cond = cond & (F.col(f"votes_{lang}") >= F.col(f"votes_{later}"))
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    pred = pred.otherwise(F.lit(langs[-1]))
    return base.select(
        "doc_id",
        *[f"votes_{lang}" for lang in langs],
        pred.alias("lang_pred"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the normalized text (content
    identity robust to whitespace/case), plus a 16-hex-char prefix as a
    compact join key. Exact-dedup primitive: groupBy(fp) at any scale
    is one shuffle of (fp, id) pairs only."""
    fp = F.md5(norm_text(text_col))
    return df.select(
        "doc_id",
        fp.alias("fp"),
        F.substring(fp, 1, 16).alias("fp16"),
        F.length(norm_text(text_col)).alias("n_chars"),
    )


def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    parallelism: int | None = None,
) -> DataFrame:
    """Word k-gram shingles per document — the input to both Jaccard
    and MinHash dedup. One row per (doc, shingle) occurrence;
    duplicates are NOT removed here because every consumer is
    duplicate-insensitive (jaccard_pairs builds postings with
    collect_set, minhash_bands takes min over hashes) — a global
    distinct would shuffle the whole (doc, sh) index for nothing.

    Built as posexplode -> lead(k-1) window -> concat, NOT as an array
    higher-order function: lambda expressions (transform/element_at)
    are interpreted per element outside whole-stage codegen, and the
    HOF form measured ~9x slower than this window form on the same
    data. The window shuffles (doc_id, pos, word) rows once.
    ``parallelism`` repartitions first so a single source file doesn't
    pin tokenization to one task."""
    wdf = df.select(F.col(id_col), words(text_col).alias("w"))
    if parallelism:
        wdf = wdf.repartition(parallelism)
    toks = wdf.select(F.col(id_col), F.posexplode("w").alias("pos", "w0"))
    win = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("w0")] + [F.lead("w0", j).over(win) for j in range(1, k)]
    return (
        toks.select(
            F.col(id_col),
            F.concat_ws(" ", *parts).alias("sh"),
            F.lead("w0", k - 1).over(win).isNotNull().alias("_full"),
        )
        .filter("_full")
        .drop("_full")
    )


def jaccard_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_doc_freq: int = 100,
    keep_counts: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle POSTINGS LISTS:
    one groupBy(sh) builds the inverted index as a sorted doc array per
    shingle, the df cap drops hot shingles (boilerplate carries no
    dedup signal), and candidate pairs come from an array-combinations
    expression over each posting — no self-join of the index at all.
    J = common/(na+nb-common).

    Shape at scale: ONE shuffle of (sh, doc) into postings (map-side
    combine), then the pair stream is bounded by sum(df^2)/2 over
    surviving shingles (df <= max_doc_freq, so <= ~5k pairs per
    shingle) feeding a pair-keyed groupBy. The former self-join form
    shuffled the whole index twice more. The postings table is pinned —
    at 100 TB it becomes the parquet'd inverted index a dedup service
    keeps between runs."""
    postings = pin(
        sh.groupBy("sh")
        .agg(F.sort_array(F.collect_set(F.col(id_col))).alias("docs"))
        .filter(F.size("docs") <= max_doc_freq)
    )
    counts = (
        postings.select(F.explode("docs").alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    # combinations (docs[i], docs[j]) for i<j — codegen'd array ops;
    # docs is sorted, so doc_a < doc_b holds by construction
    docs = F.col("docs")
    pair_arr = F.flatten(
        F.transform(
            docs,
            lambda x, i: F.transform(
                F.slice(docs, i + F.lit(2), F.size(docs)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    common = (
        postings.select(F.explode(pair_arr).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    # na/nb are one row per doc — they GROW with the corpus, so no
    # forced broadcast: AQE converts to broadcast while they are small
    # and falls back to a shuffled join once they are not
    na = counts.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    nb = counts.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    out = (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "common", "jaccard", "na", "nb")
    )
    if not keep_counts:
        out = out.drop("na", "nb")
    return out


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme,
    Schleimer et al. 2003): hash every word k-gram, slide a window of
    ``w`` consecutive k-gram hashes, keep each window's minimum — the
    selected set is a position-robust fingerprint with guaranteed
    coverage (any match of length >= w+k-1 shares a fingerprint).

    Formulated as DISTINCT over per-window minima, which is exactly
    equivalent to the classic 'select minimum of each window' and maps
    to one window function + distinct in both Spark and SQL. Incomplete
    tail windows are excluded (count over window == w), matching the
    standard definition.

    Shape: one shuffle on doc_id for the window (shared with the
    k-gram construction), then a distinct on (doc, fp) — linear in
    corpus size, no joins."""
    wdf = df.select(F.col(id_col), words(text_col).alias("wd"))
    toks = wdf.select(F.col(id_col), F.posexplode("wd").alias("pos", "w0"))
    win = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("w0")] + [F.lead("w0", j).over(win) for j in range(1, k)]
    grams = (
        toks.select(
            F.col(id_col),
            F.col("pos"),
            F.md5(F.concat_ws(" ", *parts)).alias("h"),
            F.lead("w0", k - 1).over(win).isNotNull().alias("_full"),
        )
        .filter("_full")
        .drop("_full")
    )
    wwin = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    return (
        grams.select(
            F.col(id_col),
            F.min("h").over(wwin).alias("fp"),
            (F.count(F.lit(1)).over(wwin) == w).alias("_complete"),
        )
        .filter("_complete")
        .select(id_col, "fp")
        .distinct()
    )


N_MINHASH = 8
BAND_SIZE = 2


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-doc MinHash signature: h_s(x) = md5('s:' + x)
    (hex-lexicographic min) for seeds 0..N_MINHASH-1, as one aggregate
    column per seed — ONE groupBy(doc) with map-side combine, no seed
    explosion."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("sh")))).alias(f"mh{s}")
        for s in range(N_MINHASH)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_bands(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """MinHash signatures banded for LSH: bands of BAND_SIZE rows;
    band value = md5 of the seed-ordered minhash concat — then a tiny
    per-doc unpivot. Candidate recall/precision tunes via
    N_MINHASH/BAND_SIZE exactly as in the standard construction."""
    return minhash_bands_of(minhash_signatures(sh, id_col), id_col)


def minhash_bands_of(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Band a PRE-BUILT wide signature table (id, mh0..mh{N-1}) — the
    serving half of minhash_bands, split out so a durable signature
    artifact can feed the band join without re-shingling the corpus."""
    n_bands = N_MINHASH // BAND_SIZE
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"mh{b * BAND_SIZE + j}")
                            for j in range(BAND_SIZE)
                        ],
                    )
                ).alias("band_val"),
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select(
        id_col, F.explode(band_structs).alias("bv")
    ).select(id_col, F.col("bv.band").alias("band"), F.col("bv.band_val").alias("band_val"))


def minhash_candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """LSH candidate pairs: docs sharing any (band, band_val) bucket.
    The join key is the band hash — collisions are the candidates; no
    quadratic all-pairs comparison ever happens.

    The band table (4 rows/doc) is persisted: both self-join sides
    read the materialization instead of re-running the shingle build +
    signature groupBy twice. At 100 TB this is the parquet'd LSH index
    a dedup service keeps between runs."""
    bands = pin(bands)
    a = bands.select(F.col(id_col).alias("doc_a"), "band", "band_val")
    b = bands.select(F.col(id_col).alias("doc_b"), "band", "band_val")
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_jaccard_estimates(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Estimated Jaccard for the LSH candidate pairs from signature
    agreement: est = (# agreeing minhash seeds) / N_MINHASH — the
    standard MinHash estimator (E[agreement] = true Jaccard), which is
    what a dedup service thresholds on WITHOUT ever touching the
    shingle sets again. Completes the MinHash story: signatures ->
    banded candidates -> estimator.

    Shape: the signature table (one row per doc) is pinned and serves
    both the band join and the two estimator joins; candidate pairs
    carry only ids, so the estimator joins shuffle candidate rows
    against a one-row-per-doc table — linear in candidates."""
    return minhash_jaccard_estimates_of(
        pin(minhash_signatures(sh, id_col)), id_col
    )


def minhash_jaccard_estimates_of(
    sigs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The estimator over a PRE-BUILT wide signature table — split out
    so the durable signature artifact can feed it directly."""
    bands = minhash_bands_of(sigs, id_col)
    cand = (
        bands.select(F.col(id_col).alias("doc_a"), "band", "band_val")
        .join(
            bands.select(F.col(id_col).alias("doc_b"), "band", "band_val"),
            ["band", "band_val"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    a = sigs.select(
        F.col(id_col).alias("doc_a"),
        *[F.col(f"mh{s}").alias(f"_a{s}") for s in range(N_MINHASH)],
    )
    b = sigs.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(f"mh{s}").alias(f"_b{s}") for s in range(N_MINHASH)],
    )
    n_agree = None
    for s in range(N_MINHASH):
        term = F.when(F.col(f"_a{s}") == F.col(f"_b{s}"), 1).otherwise(0)
        n_agree = term if n_agree is None else n_agree + term
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_agree.cast("int").alias("n_agree"),
            F.round(n_agree / F.lit(float(N_MINHASH)), 6).alias("est_jaccard"),
        )
    )


SIMHASH_BITS = 64

# hex digits with bit r set (r = 3 is the digit's MSB): bit b of a
# token's md5 = bit (3 - b%4) of hex digit b//4 — i.e. the first
# SIMHASH_BITS bits of the digest's binary expansion, MSB-first
_HEX_WITH_BIT = {
    3: ("8", "9", "a", "b", "c", "d", "e", "f"),
    2: ("4", "5", "6", "7", "c", "d", "e", "f"),
    1: ("2", "3", "6", "7", "a", "b", "e", "f"),
    0: ("1", "3", "5", "7", "9", "b", "d", "f"),
}


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over distinct tokens (production width — a 16-bit
    variant degenerates on self-similar corpora: at sf0.1 it mapped
    5000 docs onto 1053 values). Bit b of token t = bit (3 - b%4) of
    hex digit b//4 of md5(t); document bit = majority vote. The
    '0'/'1'-string form keeps the oracle expressible; the pairs join
    packs it into longs.

    Shape: ONE groupBy(doc) computing all 64 bit-votes as aggregate
    columns (map-side combine collapses each partition to one row per
    doc before the single shuffle — the same no-explosion pattern as
    minhash_bands). A tokens-x-bits explode form shuffled 64x the
    token count and measured far slower."""
    # array_distinct already dedups tokens WITHIN each doc, and rows
    # carry one doc each — a global .distinct() here would be a full
    # extra shuffle for nothing
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(words(text_col))).alias("w")
    ).withColumn("h", F.md5(F.col("w")))
    # the 64 vote aggregates and the 64 sign bits are built as SQL TEXT
    # (one JVM parse each) instead of py4j Column trees: ~1,000 bridge
    # round-trips ≈ 2 s of pure DataFrame-construction per call
    # otherwise; the analyzed expressions are identical
    votes = [
        F.expr(
            f"sum(CASE WHEN substring(h, {b // 4 + 1}, 1) IN "
            f"({', '.join(repr(c) for c in _HEX_WITH_BIT[3 - b % 4])}) "
            "THEN 1 ELSE -1 END)"
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    sigs = toks.groupBy(id_col).agg(*votes)
    bits = F.expr(
        "concat("
        + ", ".join(
            f"CASE WHEN s{b} > 0 THEN '1' ELSE '0' END"
            for b in range(SIMHASH_BITS)
        )
        + ")"
    )
    return sigs.select(F.col(id_col), bits.alias("simhash"))


SIMHASH_BANDS = 4


def simhash_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: Hamming distance <= ``max_hamming`` on
    the 64-bit fingerprints, found via band-LSH rather than all-pairs.

    Pigeonhole guarantee: with 4 bands of 16 bits, any pair within
    Hamming distance 3 differs in at most 3 bands, so at least one band
    matches exactly — the banded candidate set is EXHAUSTIVE for
    ``max_hamming <= SIMHASH_BANDS - 1`` and the result equals the
    all-pairs scan (which is the DuckDB oracle). Hamming itself is
    bit_count(xor) on the fingerprints parsed as integers — codegen'd.

    Shape at scale: one narrow band explode (4x rows), an equi-join on
    (band, value) whose fanout is bounded by bucket occupancy, then the
    exact filter. No quadratic stage anywhere."""
    if max_hamming > SIMHASH_BANDS - 1:
        raise ValueError("banding is only exhaustive for max_hamming <= bands - 1")
    band_len = SIMHASH_BITS // SIMHASH_BANDS
    # integer form computed ONCE per doc (not per candidate pair), as
    # two 32-bit halves (a single 64-bit binary conv overflows long),
    # so the join-side Hamming check is two codegen'd bit_count(xor)es
    half = SIMHASH_BITS // 2
    # persist the (tiny, one-row-per-doc) fingerprint table so both
    # self-join sides read it instead of re-running the 64-vote token
    # aggregation twice
    sh = pin(
        sh.withColumn(
            "sh_hi", F.conv(F.substring("simhash", 1, half), 2, 10).cast("long")
        ).withColumn(
            "sh_lo", F.conv(F.substring("simhash", half + 1, half), 2, 10).cast("long")
        )
    )
    bvals = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.substring("simhash", b * band_len + 1, band_len).alias("val"),
            )
            for b in range(SIMHASH_BANDS)
        ]
    )
    banded = sh.select(
        F.col(id_col), "sh_hi", "sh_lo", F.explode(bvals).alias("bv")
    ).select(
        id_col, "sh_hi", "sh_lo", F.col("bv.band").alias("band"), F.col("bv.val").alias("val")
    )
    a = banded.select(
        F.col(id_col).alias("doc_a"),
        F.col("sh_hi").alias("hi_a"),
        F.col("sh_lo").alias("lo_a"),
        "band",
        "val",
    )
    b = banded.select(
        F.col(id_col).alias("doc_b"),
        F.col("sh_hi").alias("hi_b"),
        F.col("sh_lo").alias("lo_b"),
        "band",
        "val",
    )
    ham = F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b"))) + F.bit_count(
        F.col("lo_a").bitwiseXOR(F.col("lo_b"))
    )

    # Dedup of multi-band matches WITHOUT a distinct shuffle: keep a
    # candidate only where the matched band is the FIRST band the two
    # fingerprints agree on — for every earlier band j the 16-bit
    # slices must differ. Pure codegen'd bit arithmetic on the packed
    # halves, so the join output streams straight to the result.
    def _band_bits(side: str, j: int):
        src = F.col(f"hi_{side}") if j < 2 else F.col(f"lo_{side}")
        return F.shiftright(src, 16) if j % 2 == 0 else src.bitwiseAND(F.lit(65535))

    first_match = F.lit(True)
    for j in range(SIMHASH_BANDS - 1):
        first_match = first_match & (
            (F.col("band") <= j) | (_band_bits("a", j) != _band_bits("b", j))
        )
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .filter(first_match)
        .select("doc_a", "doc_b", "hamming")
    )


def assign_token_shards(
    df: DataFrame,
    shard_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pack documents into fixed-token-budget shards by global id
    order: shard_id = floor(tokens_before_doc / shard_tokens) — the
    write-layout step of a training-data pipeline (each shard is one
    output file of ~shard_tokens tokens).

    The global prefix sum is DISTRIBUTED — a naive cumulative window
    would funnel the whole corpus through ONE partition. Instead:
    range-partition by id, per-partition cumsum via a partition-local
    window, then combine with per-partition totals (n_partitions rows;
    that tiny table's own cumsum is the only single-partition window)
    broadcast back as offsets. The result is independent of where the
    sampled range boundaries fall, because the offset join
    reconstructs the exact global prefix sum."""
    toks = df.select(F.col(id_col), token_count(text_col).alias("n_tokens"))
    sc = df.sparkSession.sparkContext
    nparts = max(2, sc.defaultParallelism)
    parts = toks.repartitionByRange(nparts, F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(id_col)
    local = parts.withColumn("_cum_local", F.sum("n_tokens").over(w))
    totals = local.groupBy("_pid").agg(F.max("_cum_local").alias("_tot"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
    )
    out = local.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
    start = F.col("_cum_local") + F.col("_off") - F.col("n_tokens")
    return out.select(
        id_col,
        "n_tokens",
        F.floor(start / F.lit(shard_tokens)).cast("int").alias("shard_id"),
    )


def repetition_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 2,
    max_top_frac: float = 0.2,
    max_dup_frac: float = 0.3,
    max_symbol_ratio: float = 0.1,
) -> DataFrame:
    """Gopher/C4-style repetition + symbol quality features, the
    filters a pretraining pipeline runs before anything else: fraction
    of k-gram occurrences taken by the single most frequent k-gram
    (top_gram_frac — boilerplate/template detector), fraction of
    k-gram occurrences that are repeats (dup_gram_frac = 1 -
    distinct/total), symbol-to-char ratio, and mean word length; plus
    a ``keep`` verdict under the given thresholds.

    Shape at scale: one (doc, gram) groupBy for the frequency table
    (map-side combine), one per-doc aggregate, then a join back to the
    narrow per-row features — linear, no self-joins. Docs too short to
    have a k-gram get zero repetition fractions (can't be repetitive)
    and are judged on symbols alone."""
    t = norm_text(text_col)
    n_tokens = token_count(text_col)
    narrow = df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(r"[^a-z0-9 ]"), 0)).alias("_sym"),
        F.length(F.regexp_replace(t, " ", "")).alias("_nospace"),
    )
    counts = (
        shingles(df, text_col, id_col, k=k)
        .groupBy(id_col, "sh")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_doc = counts.groupBy(id_col).agg(
        F.sum("n").alias("_total"),
        F.max("n").alias("_top"),
        F.count(F.lit(1)).alias("_ndist"),
    )
    j = narrow.join(per_doc, id_col, "left")
    top_frac = F.round(
        F.coalesce(F.col("_top") / F.col("_total"), F.lit(0.0)), 6
    )
    dup_frac = F.round(
        F.coalesce(1 - F.col("_ndist") / F.col("_total"), F.lit(0.0)), 6
    )
    sym_ratio = F.round(
        F.when(F.col("n_chars") > 0, F.col("_sym") / F.col("n_chars")).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    mean_wl = F.round(
        F.when(
            F.col("n_tokens") > 0, F.col("_nospace") / F.col("n_tokens")
        ).otherwise(F.lit(0.0)),
        6,
    )
    return j.select(
        id_col,
        F.coalesce(F.col("_total"), F.lit(0)).alias("n_grams"),
        top_frac.alias("top_gram_frac"),
        dup_frac.alias("dup_gram_frac"),
        sym_ratio.alias("symbol_ratio"),
        mean_wl.alias("mean_word_len"),
        (
            (top_frac <= max_top_frac)
            & (dup_frac <= max_dup_frac)
            & (sym_ratio <= max_symbol_ratio)
        ).alias("keep"),
    )


def contamination_overlap(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_frac: float = 0.05,
) -> DataFrame:
    """Benchmark DECONTAMINATION check: for every training document,
    the fraction of its distinct word k-grams that also appear in the
    eval set's k-gram table, plus a ``contaminated`` verdict — the
    n-gram-overlap test every serious pretraining pipeline runs against
    held-out benchmarks (k=13 canonically; parameterized here).

    Shape at scale: the eval gram table is distinct-hashed once (eval
    sets are tiny next to the corpus); the probe is ONE equi-join on
    the gram value followed by a per-doc count — never an all-pairs
    document comparison. Docs sharing nothing still appear (left join,
    zero)."""
    eval_grams = (
        shingles(eval_docs, text_col, id_col, k=k).select("sh").distinct()
    )
    doc_grams = shingles(docs, text_col, id_col, k=k).dropDuplicates(
        [id_col, "sh"]
    )
    totals = doc_grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    shared = (
        doc_grams.join(eval_grams, "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    frac = F.round(
        F.coalesce(F.col("n_shared"), F.lit(0)) / F.col("n_grams"), 6
    )
    return (
        totals.join(shared, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
            frac.alias("contamination_frac"),
            (frac >= min_frac).alias("contaminated"),
        )
    )


# PII patterns restricted to syntax Java regex (Spark) and RE2 (DuckDB)
# treat identically; applied in order (ssn before phone: both are
# digit-dash shapes and ssn's is the more specific)
PII_PATTERNS = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII redaction for training-data hygiene: replace email / SSN /
    phone / IPv4 shapes with typed placeholder tokens and report a
    per-type match count. Pure regexp expressions — narrow map, scales
    embarrassingly; the pattern table is the tuning surface."""
    t = norm_text(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    red = t
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    return df.select(F.col(id_col), *counts, red.alias("text_redacted"))


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf (idf =
    ln(N/df), deterministic (score DESC, term) tiebreak) — the keyword
    extraction primitive behind corpus exploration and topic tagging.

    Shape: one (doc, term) groupBy for tf, one (term) groupBy for df,
    the scalar N broadcast via a 1-row cross join, one window top-k.
    All exact arithmetic — oracle-expressible."""
    toks = df.select(F.col(id_col), F.explode(words(text_col)).alias("tok"))
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_doc_freq: int = 100,
) -> DataFrame:
    """Real-valued sibling of ``jaccard_pairs``: document similarity as
    the cosine of tf-idf-weighted term vectors, computed as a SPARSE
    dot product over an inverted index — never a dense vector join.
    Terms with df > ``max_doc_freq`` are dropped from the vocabulary
    entirely (the classic stopword effect: hot terms carry no
    discrimination and would dominate the postings fanout); idf =
    ln(N/df) and every weight/norm/dot rounds at 6 dp so the oracle
    reproduces the trajectory.

    Shape at scale: one (doc, term) groupBy for tf, one (term) groupBy
    for df, weights via an equi-join on term; the pair stream comes
    from array-combinations over each term's posting (bounded by
    sum(df^2)/2, df <= cap) feeding ONE pair-keyed groupBy for the
    dots; norms join per-doc. Identical discipline to the Jaccard
    postings path — this is inverted-index sparse matmul."""
    toks = df.select(F.col(id_col), F.explode(words(text_col)).alias("tok"))
    tf = toks.filter(F.length("tok") > 0).groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_doc_freq)
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    wt = pin(
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("wt"),
        )
    )
    norms = wt.groupBy(id_col).agg(
        F.round(F.sqrt(F.sum(F.col("wt") * F.col("wt"))), 6).alias("nrm")
    )
    postings = wt.groupBy("tok").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(id_col).alias("d"), F.col("wt")))
        ).alias("docs")
    )
    docs = F.col("docs")
    pair_arr = F.flatten(
        F.transform(
            docs,
            lambda x, i: F.transform(
                F.slice(docs, i + F.lit(2), F.size(docs)),
                lambda y: F.struct(
                    x["d"].alias("doc_a"),
                    y["d"].alias("doc_b"),
                    (x["wt"] * y["wt"]).alias("prod"),
                ),
            ),
        )
    )
    dots = (
        postings.select(F.explode(pair_arr).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.prod")
        .groupBy("doc_a", "doc_b")
        .agg(F.round(F.sum("prod"), 6).alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col(id_col).alias("doc_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "cosine", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Deterministic stratified sample: rank rows within each stratum
    by md5(seed || id) and keep the first ``n_per_stratum`` — the
    training-data MIXING primitive (equal representation per language /
    quality bucket / source). No rand(): hash-rank is reproducible
    under any partitioning and across speculative retries, and
    oracle-expressible. One window shuffle on the strata key; at scale
    the per-stratum top-n is partially evaluated map-side by AQE's
    window-group-limit pushdown."""
    h = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(*strata_cols).orderBy(h, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def compression_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """zlib-compressed size over raw size per document — the cheap
    compressibility proxy for repetitive/boilerplate text (low ratio =
    highly repetitive). This is one of the few operators with NO
    native-expression form (no SQL engine exposes zlib), so it uses
    the engine's sanctioned Python seam: Arrow-batched ``mapInPandas``,
    deterministic (zlib level 6), payloads never on the driver.
    Output: (id, raw_bytes, comp_bytes, ratio rounded to 6 dp)."""
    import pandas as pd

    def run(batches):
        import zlib

        for b in batches:
            t = b[text_col].fillna("").astype(str)
            raw = t.map(lambda s: len(s.encode("utf-8")))
            comp = t.map(lambda s: len(zlib.compress(s.encode("utf-8"), 6)))
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "raw_bytes": raw,
                    "comp_bytes": comp,
                    "ratio": (comp / raw.where(raw > 0, 1)).round(6),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, raw_bytes long, comp_bytes long, ratio double"
    )


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_len: int = 10,
) -> DataFrame:
    """C4-style span-level corpus dedup (Raffel et al. 2020 §2.2
    deduplicated three-sentence spans; RefinedWeb/Dolma do the same at
    line granularity): cut each document into NON-overlapping
    ``span_len``-word segments of normalized text, and for any span
    occurring more than once in the whole corpus keep only its first
    occurrence in (doc_id, span_idx) order, dropping every other copy.
    Documents are then reassembled from their surviving spans.

    Output: (id, text_dedup, n_spans, n_spans_kept) for EVERY input
    document — a doc whose spans were all dropped (or that had no
    words) comes back with empty text, so the result is a full corpus
    rewrite, not a filter.

    Shape at scale (this is the whole point — the naive form is a
    corpus-wide self-join):
    - span extraction is a narrow map (slice over the word array);
    - duplicate detection is ONE groupBy on md5(span) computing
      (count, min(doc_id, idx)) with map-side partial aggregation —
      boilerplate spans repeated 10M times combine locally instead of
      flooding one reducer;
    - the keep-filter is one equi-join of spans to that stats table on
      the 32-hex key (AQE picks the strategy);
    - reassembly is one groupBy(doc_id) whose per-group size is bounded
      by document length.
    """
    # null text behaves like empty (no spans) — without the coalesce,
    # size(null) = -1 would feed sequence() a negative bound
    w = F.coalesce(words(text_col), F.array(F.lit("")))
    base = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size(w) / F.lit(span_len)).cast("int") - 1,
                ),
                lambda i: F.array_join(
                    F.slice(w, i * span_len + 1, span_len), " "
                ),
            )
        ).alias("idx", "span"),
    ).filter(F.length(F.trim("span")) > 0)
    # three consumers read the extracted spans (stats, keep-join,
    # totals) — pin so tokenization+slicing runs ONCE, not per branch
    spans = pin(base.withColumn("k", F.md5("span")))
    stats = spans.groupBy("k").agg(
        F.count(F.lit(1)).alias("freq"),
        F.min(F.struct(F.col(id_col), F.col("idx"))).alias("first"),
    )
    kept = spans.join(stats, "k").filter(
        (F.col("freq") == 1)
        | (
            (F.col(id_col) == F.col(f"first.{id_col}"))
            & (F.col("idx") == F.col("first.idx"))
        )
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "span"))),
                lambda s: s.span,
            ),
            " ",
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("n_spans_kept"),
    )
    totals = spans.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_spans"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_spans_kept", F.lit(0)).alias("n_spans_kept"),
        )
    )


def boilerplate_strip(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_len: int = 5,
    min_df: int = 3,
) -> DataFrame:
    """Boilerplate removal by cross-document span frequency (the
    CCNet / RefinedWeb line-dedup posture applied to fixed word
    windows): a span occurring in >= ``min_df`` DISTINCT documents is
    boilerplate (headers, footers, nav text, license blurbs) and is
    removed from EVERY document — unlike ``span_dedup`` no first copy
    survives. Documents are rewritten from their remaining spans.

    Output: (id, text_clean, n_spans, n_spans_kept) for every input
    document (a fully-boilerplate doc comes back with empty text).

    Shape at scale: identical discipline to ``span_dedup`` — span
    extraction is a narrow map; the document-frequency table is ONE
    groupBy on md5(span) aggregating count(DISTINCT id) (two-phase
    distinct, map-side partials); the strip is one equi-join on the
    32-hex key against only the spans' keys; reassembly is one
    groupBy(id) bounded by document length. Nothing is doc-vs-doc."""
    w = F.coalesce(words(text_col), F.array(F.lit("")))
    base = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size(w) / F.lit(span_len)).cast("int") - 1,
                ),
                lambda i: F.array_join(
                    F.slice(w, i * span_len + 1, span_len), " "
                ),
            )
        ).alias("idx", "span"),
    ).filter(F.length(F.trim("span")) > 0)
    # two consumers (df-stats build + strip join) read the spans — pin
    # so tokenization+slicing runs once
    spans = pin(base.withColumn("k", F.md5("span")))
    common = (
        spans.groupBy("k")
        .agg(F.countDistinct(F.col(id_col)).alias("docs"))
        .filter(F.col("docs") >= min_df)
        .select("k")
    )
    kept = spans.join(common, "k", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "span"))),
                lambda s: s.span,
            ),
            " ",
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_spans_kept"),
    )
    totals = spans.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_spans"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_spans_kept", F.lit(0)).alias("n_spans_kept"),
        )
    )


def unigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Unigram language-model scoring: train token frequencies on
    ``train_df`` (default: the corpus itself — in-domain typicality)
    and score each document by its mean token log-probability and
    perplexity. The CCNet/KenLM-filter pattern reduced to its
    distributed skeleton: a real pipeline swaps the unigram table for
    n-gram KenLM scores via mapInPandas, but the Spark shape — train
    once, join scores to the token stream — is identical.

    Add-one smoothing over the training vocabulary keeps unseen tokens
    finite when ``train_df`` differs from ``df``:
    p(tok) = (c(tok) + 1) / (N + V + 1), unseen c = 0.

    Output: (id, n_tokens, avg_logprob, ppl) for every doc with >= 1
    token; avg_logprob is mean ln p (rounded 6), ppl = exp(-avg)
    (rounded 4). Low avg_logprob = rare/atypical tokens — the quality
    signal you threshold or importance-weight on.

    Shape at scale: token explode is narrow; the frequency table is ONE
    groupBy(tok) with map-side combine; scoring is ONE equi-join of the
    token stream to that table (AQE broadcasts it while the vocab is
    small, shuffles when it is not) and ONE groupBy(doc) average. The
    (N, V) scalars ride a broadcast one-row aggregate — no driver
    round-trip."""
    def toks(frame: DataFrame) -> DataFrame:
        return (
            frame.select(F.col(id_col), F.explode(words(text_col)).alias("tok"))
            .filter(F.length("tok") > 0)
        )
    train = toks(train_df if train_df is not None else df)
    freqs = pin(train.groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    nv = freqs.agg(
        F.sum("c").alias("_N"), F.count(F.lit(1)).alias("_V")
    )
    scored = (
        toks(df)
        .join(freqs, "tok", "left")
        .crossJoin(F.broadcast(nv))
        .select(
            F.col(id_col),
            (
                F.log(F.coalesce(F.col("c"), F.lit(0)) + 1)
                - F.log(F.col("_N") + F.col("_V") + 1)
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("_lp"), 6).alias("avg_logprob"),
        F.round(F.exp(-F.avg("_lp")), 4).alias("ppl"),
    )


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Bigram language-model scoring — the conditional-probability step
    up from :func:`unigram_lm_score` and the closest oracle-exact
    stand-in for the KenLM perplexity filter (CCNet) a production
    corpus pipeline runs. Trains context counts c(w1) and bigram counts
    c(w1,w2) on ``train_df`` (default: the corpus itself) and scores
    each document by the mean negative log of the add-half-smoothed
    conditional probability over its bigram positions:

        p(w2|w1) = (c(w1,w2) + 0.5) / (c(w1) + 0.5 * V)

    with V = training vocabulary size; unseen bigrams/contexts fall
    back to the smoothing mass. Output: (id, n_bigrams, avg_nll
    rounded 6, ppl = exp(avg_nll) rounded 4) for docs with >= 1 bigram.
    High avg_nll = improbable token transitions — repetitive-garbage
    and wrong-language text score high even when every unigram is
    common, which is exactly what the unigram signal misses.

    Shape at scale: the bigram explode is a narrow posexplode+self-zip
    (no shuffle); training is TWO groupBys — (w1,w2) and (w1) — each
    with map-side combine; scoring is one join per count table keyed on
    the bigram / the context (AQE broadcasts while vocab² stays small,
    shuffles when it doesn't) and ONE groupBy(doc) average. V rides a
    broadcast one-row aggregate. Nothing driver-resident, nothing
    quadratic: cost is O(tokens) rows through two hash aggregates."""

    def bigrams(frame: DataFrame) -> DataFrame:
        w = words(text_col)
        return (
            frame.select(
                F.col(id_col),
                F.filter(w, lambda t: F.length(t) > 0).alias("_w"),
            )
            .select(
                F.col(id_col),
                F.posexplode(F.slice("_w", 1, F.greatest(F.size("_w") - 1, F.lit(0)))).alias("_i", "w1"),
                F.col("_w"),
            )
            .select(
                F.col(id_col),
                "w1",
                F.col("_w")[F.col("_i") + 1].alias("w2"),
            )
        )

    train = bigrams(train_df if train_df is not None else df)
    big = pin(train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")))
    ctx = pin(train.groupBy("w1").agg(F.count(F.lit(1)).alias("c1")))
    vocab = (
        train.select(F.explode(F.array("w1", "w2")).alias("t"))
        .agg(F.count_distinct("t").alias("_V"))
    )
    scored = (
        bigrams(df)
        .join(big, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            (
                F.log(F.coalesce(F.col("c1"), F.lit(0)) + 0.5 * F.col("_V"))
                - F.log(F.coalesce(F.col("c12"), F.lit(0)) + 0.5)
            ).alias("_nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("_nll"), 6).alias("avg_nll"),
        F.round(F.exp(F.avg("_nll")), 4).alias("ppl"),
    )


def importance_downsample(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "ds1",
    floor_p: float = 0.05,
) -> DataFrame:
    """Deterministic Bernoulli importance downsampling: keep each row
    with probability p = clamp(weight, floor_p, 1), decided by a
    content-independent md5 coin — the quality-weighted thinning step a
    training-data mix uses after scoring (higher-quality docs survive
    with higher probability; every doc keeps at least ``floor_p``).

    No rand(): the accept decision is u(id) < p where u is the first 60
    bits of md5(seed || id) — reproducible under retries, speculative
    execution, and any partitioning (same discipline as
    ``stratified_sample``). The comparison runs on zero-padded lowercase
    hex STRINGS (16 chars), so both engines compare the same 60-bit
    integers without bigint hex-parsing builtins: u_hex < to_hex(floor(
    p·2^60)). Narrow map — no shuffle at any scale.

    Output: kept rows only, (id, p, u_hex)."""
    w = F.col(weight_col)
    p = F.least(F.greatest(w, F.lit(floor_p)), F.lit(1.0))
    u_hex = F.lpad(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        "0",
    )
    thr_hex = F.lpad(
        F.lower(F.hex(F.floor(p * F.lit(float(1 << 60))).cast("bigint"))),
        16,
        "0",
    )
    return (
        df.select(
            F.col(id_col),
            F.round(p, 6).alias("p"),
            u_hex.alias("u_hex"),
            thr_hex.alias("_thr"),
        )
        .filter(F.col("u_hex") < F.col("_thr"))
        .drop("_thr")
    )


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Shannon entropy (bits/char) of each document's normalized text —
    the cheap randomness signal that separates natural prose (~4 bits)
    from base64/hex blobs (high) and repeated boilerplate (low); used
    alongside ``compression_ratio`` in pretraining quality stacks.

    H = log2(n) - (1/n)·Σ_c cnt_c·log2(cnt_c). Shape: one char explode
    (narrow), one (doc, char) groupBy and one (doc) groupBy — both with
    map-side combine; per-doc group size is bounded by alphabet size.
    Docs with no characters are excluded (entropy undefined).

    Output: (id, n_chars, entropy_bits rounded 6)."""
    chars = df.select(
        F.col(id_col), F.explode(F.split(norm_text(text_col), "")).alias("ch")
    ).filter(F.length("ch") > 0)
    cnt = chars.groupBy(id_col, "ch").agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.groupBy(id_col)
        .agg(
            F.sum("c").alias("n_chars"),
            F.sum(F.col("c") * F.log2("c")).alias("_s"),
        )
        .select(
            id_col,
            "n_chars",
            F.round(
                F.log2("n_chars") - F.col("_s") / F.col("n_chars"), 6
            ).alias("entropy_bits"),
        )
    )


def dataset_split(
    df: DataFrame,
    id_col: str = "doc_id",
    ratios: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: str = "split1",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in the
    split whose cumulative-ratio interval contains its 60-bit md5 coin
    u(id) ∈ [0, 1). Content-independent and id-stable — re-running on a
    grown corpus never reassigns an existing id (the property random
    splits lose and training pipelines need for eval hygiene).

    Same padded-hex comparison discipline as ``importance_downsample``
    (no bigint hex parsing, no rand()); narrow map, no shuffle.
    Output: all input columns + ``split``."""
    assert len(ratios) == len(names) and abs(sum(ratios) - 1.0) < 1e-9
    u_hex = F.lpad(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        "0",
    )
    cum = 0.0
    expr = None
    for ratio, name in zip(ratios[:-1], names[:-1]):
        cum += ratio
        thr = format(int(cum * (1 << 60)), "016x")
        cond = u_hex < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


# ---- BPE trainer ----------------------------------------------------------

BPE_WORD_RE = "^[a-z0-9]{2,}$"  # merge within letter/digit runs only (the
# GPT-2 pre-tokenizer already isolates punctuation runs); alphanumeric
# symbols keep the data-dependent merge patterns regex-safe in BOTH
# engines without an escaping layer
BPE_MERGE_PASSES = 4  # regexp fixpoint passes per round: one pass merges
# every other site of an a-b-a-b chain (the consumed separator hides the
# next site), so 4 passes cover chains up to ~16 — far beyond real words


def _bpe_merge_expr(seq_expr: str, pat: str, repl: str, dialect: str) -> str:
    """``seq_expr`` with BPE_MERGE_PASSES nested regexp_replace
    applications of (pattern, replacement) — generated for either
    dialect so both engines run the IDENTICAL pass structure."""
    out = seq_expr
    for _ in range(BPE_MERGE_PASSES):
        if dialect == "spark":
            out = f"regexp_replace({out}, {pat}, {repl})"
        else:
            out = f"regexp_replace({out}, {pat}, {repl}, 'g')"
    return out


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
) -> DataFrame:
    """Train the first ``n_merges`` BPE tokenizer merges over the
    corpus — the actual iterative loop, not just round-0 counts
    (`q_bpe_merge_candidates` is the one-shot form): per round, count
    adjacent symbol pairs weighted by word frequency, pick the most
    frequent pair ((count DESC, pair ASC) tiebreak), merge it
    everywhere left-to-right non-overlapping, repeat on the merged
    segmentation. Returns (round, sym_a, sym_b, merged, n) — the merge
    table, i.e. the trained tokenizer state.

    Scale shape (the HuggingFace-tokenizers/Sentencepiece discipline
    distributed): pair counting runs over the UNIQUE-WORD frequency
    table (a corpus word repeated 10^6 times counts once, weighted),
    each round is ONE groupBy(pair) with map-side combine + ONE narrow
    regexp map over unique words; the winning pair is a single-row
    driver fetch per round — the merge table IS trainer state, the
    documented metadata-sized-collect exception (exactly how every
    production BPE trainer alternates distributed counts with a
    driver-side argmax). The merge itself is the regex fixpoint
    (BPE_MERGE_PASSES passes) the oracle restates verbatim, so
    left-to-right non-overlap semantics — including a-a-a and
    a-b-a-b chains — are value-checked, not assumed.
    """
    from commercial_rfp_data_pipeline_spark.io import pin_eager

    wf = (
        df.select(F.explode(words(text_col)).alias("word"))
        .filter(F.col("word").rlike(BPE_WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wn"))
    )
    seqs = wf.select(
        F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("seq"), "wn"
    )
    merges = []
    for r in range(1, n_merges + 1):
        seqs = pin_eager(seqs, key=f"bpe_round_{r}")
        toks = seqs.select(F.split("seq", " ").alias("t"), "wn")
        pairs = toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
                )
            ).alias("pair"),
            "wn",
        )
        counts = pairs.groupBy("pair").agg(F.sum("wn").alias("n"))
        best = counts.orderBy(F.col("n").desc(), "pair").first()
        if best is None:
            break
        a, b = best.pair.split(" ")
        merges.append((r, a, b, a + b, best.n))
        pat = f"'( |^){a} {b}( |$)'"
        repl = f"'$1{a}{b}$2'"
        seqs = seqs.select(
            F.expr(_bpe_merge_expr("seq", pat, repl, "spark")).alias("seq"),
            "wn",
        )
    spark = df.sparkSession
    return spark.createDataFrame(
        merges, "round int, sym_a string, sym_b string, merged string, n bigint"
    )


def bpe_encode_words(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
) -> DataFrame:
    """Train ``n_merges`` BPE merges (same loop as :func:`bpe_train`)
    and APPLY them — the tokenizer's serving half: returns the
    unique-word table with its final segmentation, (word, seq,
    n_tokens, wn). Encoding a 100-TB corpus then costs ONE equi-join
    of the exploded token stream to this table (AQE broadcasts it while
    the vocab is small) — the segmentation fixpoint runs once per
    UNIQUE word, never once per occurrence, which is the entire
    distributed-BPE trick.

    Same trainer-state discipline as bpe_train: per round one
    weighted pair-count groupBy + a single-row driver argmax + a
    narrow regexp merge pass; rounds are pin_eager'd so round k+1
    reads a materialized segmentation."""
    from commercial_rfp_data_pipeline_spark.io import pin_eager

    wf = (
        df.select(F.explode(words(text_col)).alias("word"))
        .filter(F.col("word").rlike(BPE_WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wn"))
    )
    seqs = wf.select(
        "word",
        F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("seq"),
        "wn",
    )
    for r in range(1, n_merges + 1):
        seqs = pin_eager(seqs, key=f"bpe_enc_round_{r}")
        toks = seqs.select(F.split("seq", " ").alias("t"), "wn")
        pairs = toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
                )
            ).alias("pair"),
            "wn",
        )
        counts = pairs.groupBy("pair").agg(F.sum("wn").alias("n"))
        best = counts.orderBy(F.col("n").desc(), "pair").first()
        if best is None:
            break
        a, b = best.pair.split(" ")
        pat = f"'( |^){a} {b}( |$)'"
        repl = f"'$1{a}{b}$2'"
        seqs = seqs.select(
            "word",
            F.expr(_bpe_merge_expr("seq", pat, repl, "spark")).alias("seq"),
            "wn",
        )
    return seqs.select(
        "word", "seq", F.size(F.split("seq", " ")).alias("n_tokens"), "wn"
    )


def bpe_encode_oracle_sql(norm_sql: str, n_merges: int = 3) -> str:
    """DuckDB oracle for the encode path: the bpe_train_oracle_sql CTE
    chain with the word column carried through every segmentation
    round, finished by the token-stream join + per-doc aggregate."""
    ctes = [
        f"""wf AS (
          SELECT word, count(*) AS wn FROM (
            SELECT unnest(string_split({norm_sql}, ' ')) AS word FROM documents
          ) WHERE regexp_full_match(word, '[a-z0-9]{{2,}}')
          GROUP BY word
        )""",
        "seq0 AS (SELECT word, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq, wn FROM wf)",
    ]
    for r in range(1, n_merges + 1):
        p = f"seq{r - 1}"
        ctes.append(
            f"""pc{r} AS (
              SELECT t[i] || ' ' || t[i + 1] AS pair, CAST(sum(wn) AS BIGINT) AS n
              FROM (SELECT t, wn, unnest(generate_series(1, len(t) - 1)) AS i
                    FROM (SELECT string_split(seq, ' ') AS t, wn FROM {p}))
              GROUP BY 1
            )""")
        ctes.append(
            f"best{r} AS (SELECT pair, n FROM pc{r} ORDER BY n DESC, pair LIMIT 1)"
        )
        merge_expr = _bpe_merge_expr(
            "seq",
            "'( |^)' || pair || '( |$)'",
            "'\\1' || replace(pair, ' ', '') || '\\2'",
            "duckdb",
        )
        ctes.append(
            f"seq{r} AS (SELECT word, {merge_expr} AS seq, wn FROM {p} CROSS JOIN best{r})"
        )
    ctes.append(
        f"tok AS (SELECT word, len(string_split(seq, ' ')) AS n_tok FROM seq{n_merges})"
    )
    ctes.append(
        f"""dw AS (
          SELECT doc_id, word FROM (
            SELECT doc_id, unnest(string_split({norm_sql}, ' ')) AS word
            FROM documents
          ) WHERE regexp_full_match(word, '[a-z0-9]{{2,}}')
        )"""
    )
    return (
        "WITH " + ",\n".join(ctes) + """
    SELECT doc_id, count(*) AS n_words,
           CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens
    FROM dw JOIN tok USING (word)
    GROUP BY doc_id"""
    )


def bpe_train_oracle_sql(norm_sql: str, n_merges: int = 3) -> str:
    """DuckDB oracle for :func:`bpe_train`: the rounds unroll into
    chained CTEs; each round's winning pair is a scalar-subquery CTE
    cross-joined into the next segmentation, and the merge applies the
    SAME regexp pass structure via `_bpe_merge_expr`. Generated from
    the same constants so the engines cannot drift."""
    ctes = [
        f"""wf AS (
          SELECT word, count(*) AS wn FROM (
            SELECT unnest(string_split({norm_sql}, ' ')) AS word FROM documents
          ) WHERE regexp_full_match(word, '[a-z0-9]{{2,}}')
          GROUP BY word
        )""",
        "seq0 AS (SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq, wn FROM wf)",
    ]
    for r in range(1, n_merges + 1):
        p = f"seq{r - 1}"
        ctes.append(
            f"""pc{r} AS (
              SELECT t[i] || ' ' || t[i + 1] AS pair, CAST(sum(wn) AS BIGINT) AS n
              FROM (SELECT t, wn, unnest(generate_series(1, len(t) - 1)) AS i
                    FROM (SELECT string_split(seq, ' ') AS t, wn FROM {p}))
              GROUP BY 1
            )""")
        ctes.append(
            f"best{r} AS (SELECT pair, n FROM pc{r} ORDER BY n DESC, pair LIMIT 1)"
        )
        merge_expr = _bpe_merge_expr(
            "seq",
            "'( |^)' || pair || '( |$)'",
            "'\\1' || replace(pair, ' ', '') || '\\2'",
            "duckdb",
        )
        ctes.append(
            f"seq{r} AS (SELECT {merge_expr} AS seq, wn FROM {p} CROSS JOIN best{r})"
        )
    rows = "\nUNION ALL\n".join(
        f"""SELECT {r} AS round,
               string_split(pair, ' ')[1] AS sym_a,
               string_split(pair, ' ')[2] AS sym_b,
               replace(pair, ' ', '') AS merged, n
        FROM best{r}"""
        for r in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + rows


def containment_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.6,
    max_doc_freq: int = 100,
) -> DataFrame:
    """Asymmetric near-dup: containment C = common / min(na, nb)
    catches the QUOTE/SUBSET case Jaccard misses — a short document
    wholly embedded in a long one has high containment but low
    Jaccard (the union is dominated by the long doc). Same postings-
    list construction and scale shape as jaccard_pairs; only the
    final normalization differs."""
    pairs = jaccard_pairs(
        sh,
        id_col=id_col,
        threshold=0.0,
        max_doc_freq=max_doc_freq,
        keep_counts=True,
    )
    return (
        pairs.withColumn(
            "containment",
            F.round(F.col("common") / F.least("na", "nb"), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "common", "jaccard", "containment")
    )


def char_trigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct character 3-grams of the normalized text — the
    inverted-index feed for substring search. Narrow map + explode;
    at scale the (tri, doc) postings persist as the search index.

    The normalized text is PROJECTED to a column attribute before the
    transform: referencing the norm_text expression inside the HOF
    lambda re-inlines (and re-executes) the regexp once per array
    element — measured 2.4x slower end to end (the same trap
    chunk_embeddings documents)."""
    staged = docs.select(F.col(id_col), norm_text(text_col).alias("_t"))
    t = F.col("_t")
    tris = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - 2, F.lit(0))),
        lambda i: t.substr(i, F.lit(3)),
    )
    return staged.select(
        F.col(id_col), F.explode(F.array_distinct(tris)).alias("tri")
    )


def trigram_substring_search(
    docs: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring search through a trigram inverted index: candidates
    are docs containing EVERY character 3-gram of the pattern
    (AND-intersection of posting lists — one filtered scan of the
    trigram table + one groupBy counting matched trigrams), then the
    exact LIKE verifies candidates only. Trigram filtering has no
    false negatives (any occurrence of the pattern contains all its
    trigrams), so the result is EXACTLY the full-scan LIKE — which the
    oracle states. At 100 TB the postings are the persisted index and
    the expensive exact scan touches the candidate subset, not the
    corpus."""
    tris = sorted({pattern[i : i + 3] for i in range(len(pattern) - 2)})
    cand = (
        char_trigrams(docs, id_col, text_col)
        .filter(F.col("tri").isin(tris))
        .groupBy(id_col)
        .agg(F.countDistinct("tri").alias("n_hit"))
        .filter(F.col("n_hit") == len(tris))
        .select(id_col)
    )
    return docs.join(cand, id_col, "left_semi").filter(
        F.contains(norm_text(text_col), F.lit(pattern))
    )


def nfc_normalize(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode NFC normalization — the encoding-hygiene pass every
    web-scraped corpus runs before fingerprinting (decomposed
    e+COMBINING ACUTE and precomposed é md5 to different fingerprints;
    dedup and exact-match both break without canonical form). Spark
    SQL exposes no normalizer, so this is an honest Arrow-batched
    Python seam (`unicodedata.normalize` — same Unicode tables DuckDB's
    nfc_normalize uses, which is what makes it oracle-checkable).
    Narrow map, no shuffle; self-contained closure.

    Output: (id, text_nfc, changed, n_cp_before, n_cp_after)."""

    def run(batches):
        import unicodedata

        for pdf in batches:
            texts = pdf[text_col]
            norm = [
                None if t is None else unicodedata.normalize("NFC", str(t))
                for t in texts
            ]
            out = pdf[[id_col]].copy()
            out["text_nfc"] = norm
            out["changed"] = [
                False if t is None else str(t) != n
                for t, n in zip(texts, norm)
            ]
            out["n_cp_before"] = [
                0 if t is None else len(str(t)) for t in texts
            ]
            out["n_cp_after"] = [0 if n is None else len(n) for n in norm]
            yield out

    return df.mapInPandas(
        run,
        schema=f"{id_col} long, text_nfc string, changed boolean, "
        f"n_cp_before int, n_cp_after int",
    )


def jaccard_prefix_filter_pairs(
    sh: DataFrame | None,
    id_col: str = "doc_id",
    t_num: int = 1,
    t_den: int = 2,
    max_doc_freq: int = 100,
    distinct_sh: DataFrame | None = None,
    dft: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard pairs at threshold t = t_num/t_den via PREFIX
    FILTERING (the PPJoin/AllPairs candidate rule): order every
    document's shingles by a global rarity order (df ASC, shingle),
    and index only each document's first ``n - ceil(t*n) + 1``
    shingles — if J(A,B) >= t, the prefixes MUST share a shingle
    (pigeonhole: fewer than |A|-prefix_len shingles can be missing
    from the intersection), so candidates from prefix postings are
    COMPLETE. Verification then intersects the candidates' full
    (df-capped) shingle sets.

    The threshold is a RATIONAL (t_num/t_den) and prefix_len uses
    integer arithmetic — ceil(t*n) = (t_num*n + t_den - 1) div t_den —
    because an IEEE ``ceil(0.2 * 5)`` can round UP through float fuzz,
    shortening the prefix below the completeness bound.

    Scale vs :func:`jaccard_pairs`: same single (sh, doc) shuffle, but
    postings are built over PREFIX rows only — the candidate stream
    shrinks from sum(df^2) over all surviving shingles to sum(df_p^2)
    over prefix occurrences (measured 11533 -> a fraction at sf0.01,
    pinned by test); rarity ordering concentrates prefixes on rare
    shingles, exactly why AllPairs sorts by ascending frequency. The
    verify stage joins candidates to per-doc sorted sets and
    intersects arrays — bounded by candidates, no token re-shuffle.

    ``distinct_sh``/``dft`` (round 9, VERDICT r8 #5): callers that hold
    the durable token-index artifact (plans/artifacts.py — the same
    distinct (doc, shingle) postings + df table) pass it here and skip
    the shingle/distinct/df derivation entirely; ``sh`` may then be
    None. Semantics are identical — the artifact IS this derivation,
    materialized once per corpus."""
    if distinct_sh is None:
        distinct_sh = sh.select(id_col, "sh").distinct()
    else:
        distinct_sh = distinct_sh.select(id_col, "sh")
    if dft is None:
        dft = distinct_sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    else:
        dft = dft.select("sh", "df")
    # pinned: consumed three times (doc sizes, prefix ranking, verify
    # sets) — unpinned, the shingle->distinct->df chain recomputes per
    # consumer (measured 53s -> ~17s at sf0.1)
    capped = pin(
        distinct_sh.join(dft.filter(F.col("df") <= max_doc_freq), "sh").select(
            id_col, "sh", "df"
        ),
        "prefix_filter_capped",
    )
    n = capped.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    w = Window.partitionBy(id_col).orderBy("df", "sh")
    prefix_len = (
        F.col("n_sh")
        - F.floor((t_num * F.col("n_sh") + t_den - 1) / t_den)
        + 1
    )
    prefix = (
        capped.join(n, id_col)
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= prefix_len)
    )
    postings = prefix.groupBy("sh").agg(
        F.sort_array(
            F.collect_set(F.struct(F.col(id_col).alias("d"), F.col("n_sh")))
        ).alias("docs")
    )
    docs = F.col("docs")
    pair_arr = F.flatten(
        F.transform(
            docs,
            lambda x, i: F.transform(
                F.slice(docs, i + F.lit(2), F.size(docs)),
                lambda y: F.struct(
                    x["d"].alias("doc_a"),
                    y["d"].alias("doc_b"),
                    x["n_sh"].alias("_na"),
                    y["n_sh"].alias("_nb"),
                ),
            ),
        )
    )
    cand = (
        postings.select(F.explode(pair_arr).alias("p"))
        # LENGTH FILTER (AllPairs/PPJoin): J >= t forces the smaller
        # set to hold at least t of the larger — t_den*n_min >=
        # t_num*n_max — so size-mismatched candidates die here, before
        # the distinct shuffle and the set-intersection verify. Exact
        # integer arithmetic; never removes a qualifying pair, so the
        # brute-force oracle still proves completeness.
        .filter(
            F.least("p._na", "p._nb") * t_den
            >= F.greatest("p._na", "p._nb") * t_num
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    doc_sets = pin(
        capped.groupBy(id_col).agg(
            F.sort_array(F.collect_set("sh")).alias("s"),
            F.count(F.lit(1)).alias("n_sh"),
        ),
        "prefix_filter_doc_sets",
    )
    sa = doc_sets.select(
        F.col(id_col).alias("doc_a"), F.col("s").alias("sa"), F.col("n_sh").alias("na")
    )
    sb = doc_sets.select(
        F.col(id_col).alias("doc_b"), F.col("s").alias("sb"), F.col("n_sh").alias("nb")
    )
    out = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("common", F.size(F.array_intersect("sa", "sb")).cast("long"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
                6,
            ),
        )
        # rational-threshold filter in exact integer arithmetic:
        # common/(na+nb-common) >= t_num/t_den
        .filter(
            F.col("common") * t_den >= (F.col("na") + F.col("nb") - F.col("common")) * t_num
        )
        .select("doc_a", "doc_b", "common", "jaccard")
    )
    return out


def quality_ensemble_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_t: float = 0.44,
    entropy_t: float = 4.1,
    block_t: float = 0.05,
) -> DataFrame:
    """FineWeb/DCLM-style ensemble gate signals (round 7): four
    INDEPENDENT per-doc quality verdicts — blended quality score, char
    entropy, Gopher repetition keep, blocklist hit rate — plus the
    vote count and the >= 3/4 majority ``keep``. Shared by the batch
    query (`quality_signal_ensemble`, oracle-checked) and the
    streaming curated-ingest sink.

    Scale: each signal is a narrow map + per-doc aggregate; the
    ensemble is an id-keyed join of four bounded tables."""
    q = quality_features(df, text_col=text_col).select(
        id_col, (F.col("quality_score") >= quality_t).alias("s_quality")
    )
    e = char_entropy(df, text_col=text_col).select(
        id_col, F.col("entropy_bits").alias("_eb")
    )
    r = repetition_features(df, text_col=text_col, id_col=id_col).select(
        id_col, F.col("keep").alias("s_repetition")
    )
    toks = df.select(
        id_col, F.explode(F.split(norm_text(text_col), " ")).alias("w")
    ).filter(F.length("w") > 0)
    b = toks.groupBy(id_col).agg(
        (
            F.sum(
                F.when(F.substring(F.md5("w"), 1, 1) == "0", 1).otherwise(0)
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("_hr")
    )
    ens = (
        q.join(r, id_col)
        .join(e, id_col, "left")
        .join(b, id_col, "left")
        .select(
            id_col,
            "s_quality",
            (F.coalesce(F.col("_eb"), F.lit(0.0)) >= entropy_t).alias(
                "s_entropy"
            ),
            "s_repetition",
            (F.coalesce(F.col("_hr"), F.lit(0.0)) <= block_t).alias(
                "s_blocklist"
            ),
        )
    )
    votes = (
        F.when(F.col("s_quality"), 1).otherwise(0)
        + F.when(F.col("s_entropy"), 1).otherwise(0)
        + F.when(F.col("s_repetition"), 1).otherwise(0)
        + F.when(F.col("s_blocklist"), 1).otherwise(0)
    ).cast("int")
    return ens.withColumn("n_votes", votes).withColumn(
        "keep", F.col("n_votes") >= 3
    )
