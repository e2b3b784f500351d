"""Pretraining data-hygiene queries over ``documents``: Gopher/C4
repetition filters, benchmark decontamination, PII redaction, tf-idf
keyword extraction — the filter/audit stages that run before dedup in
a real training-data pipeline (BASELINE.json extension surface), each
value-checked against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.operators.textops import (
    PII_PATTERNS,
    contamination_overlap,
    redact_pii,
    repetition_features,
    tfidf_top_terms,
)
from commercial_rfp_data_pipeline_spark.registry import query

_NORM = "lower(trim(regexp_replace(CAST(text AS VARCHAR), '\\s+', ' ', 'g')))"


@query(
    "quality_repetition_filter",
    f"""
    WITH wl AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
    g2 AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] AS sh
      FROM (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i
            FROM wl)
    ),
    gc AS (SELECT doc_id, sh, count(*) AS n FROM g2 GROUP BY doc_id, sh),
    gs AS (SELECT doc_id, sum(n) AS total, max(n) AS top, count(*) AS ndist
           FROM gc GROUP BY doc_id),
    nf AS (
      SELECT doc_id, {_NORM} AS t,
             CASE WHEN length({_NORM}) = 0 THEN 0
                  ELSE len(string_split({_NORM}, ' ')) END AS n_tokens
      FROM documents
    )
    SELECT doc_id, n_grams, top_gram_frac, dup_gram_frac, symbol_ratio,
           mean_word_len,
           (top_gram_frac <= 0.2 AND dup_gram_frac <= 0.3
            AND symbol_ratio <= 0.1) AS keep
    FROM (
      SELECT nf.doc_id,
             CAST(coalesce(gs.total, 0) AS BIGINT) AS n_grams,
             round(coalesce(gs.top / CAST(gs.total AS DOUBLE), 0.0), 6) AS top_gram_frac,
             round(coalesce(1 - gs.ndist / CAST(gs.total AS DOUBLE), 0.0), 6) AS dup_gram_frac,
             round(CASE WHEN length(t) > 0
                        THEN len(regexp_extract_all(t, '[^a-z0-9 ]')) / CAST(length(t) AS DOUBLE)
                        ELSE 0.0 END, 6) AS symbol_ratio,
             round(CASE WHEN n_tokens > 0
                        THEN length(replace(t, ' ', '')) / CAST(n_tokens AS DOUBLE)
                        ELSE 0.0 END, 6) AS mean_word_len
      FROM nf LEFT JOIN gs USING (doc_id)
    )
    """,
)
def q_repetition(spark, sf_dir):
    """Gopher-style repetition/symbol quality verdicts: top-2-gram
    fraction, duplicate-2-gram fraction, symbol ratio, mean word
    length, and the keep flag under the module thresholds."""
    docs = load_table(spark, sf_dir, "documents")
    return repetition_features(docs)


_G5 = "w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]"


@query(
    "benchmark_decontamination",
    f"""
    WITH cw AS (SELECT doc_id, string_split({_NORM}, ' ') AS w
                FROM documents WHERE doc_id % 7 <> 0),
    cg AS (
      SELECT DISTINCT doc_id, {_G5} AS sh
      FROM (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 4, 0))) AS i
            FROM cw)
    ),
    ew AS (SELECT doc_id, string_split({_NORM}, ' ') AS w
           FROM documents WHERE doc_id % 7 = 0),
    eg AS (
      SELECT DISTINCT {_G5} AS sh
      FROM (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 4, 0))) AS i
            FROM ew)
    ),
    tot AS (SELECT doc_id, count(*) AS n_grams FROM cg GROUP BY doc_id),
    shr AS (SELECT cg.doc_id, count(*) AS n_shared
            FROM cg JOIN eg USING (sh) GROUP BY cg.doc_id)
    SELECT doc_id, n_grams, n_shared, contamination_frac,
           contamination_frac >= 0.05 AS contaminated
    FROM (
      SELECT t.doc_id, t.n_grams,
             coalesce(s.n_shared, 0) AS n_shared,
             round(coalesce(s.n_shared, 0) / CAST(t.n_grams AS DOUBLE), 6) AS contamination_frac
      FROM tot t LEFT JOIN shr s USING (doc_id)
    )
    """,
)
def q_decontamination(spark, sf_dir):
    """n-gram benchmark decontamination: every 7th document stands in
    for the held-out eval set; each remaining doc reports the fraction
    of its distinct 5-grams that appear in the eval gram table. The
    probe is one equi-join on the gram value — never doc-vs-doc."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    eval_docs = docs.filter(F.col("doc_id") % 7 == 0)
    return contamination_overlap(corpus, eval_docs, k=5)


def _pii_inject_sql() -> str:
    return (
        "CAST(text AS VARCHAR) || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com call 555-123-4567 or 123-45-6789 at 10.0.0.'"
        " || CAST(doc_id % 256 AS VARCHAR)"
    )


def _pii_oracle() -> str:
    norm = (
        "lower(trim(regexp_replace(" + _pii_inject_sql() + ", '\\s+', ' ', 'g')))"
    )
    counts = ",\n           ".join(
        f"len(regexp_extract_all(t, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    red = "t"
    for _, pat, token in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return f"""
    WITH t2 AS (SELECT doc_id, {norm} AS t FROM documents)
    SELECT doc_id,
           {counts},
           {red} AS text_redacted
    FROM t2
    """


@query("pii_redaction", _pii_oracle())
def q_pii(spark, sf_dir):
    """PII redaction over documents with deterministic injected PII
    (an email derived from doc_id, a phone, an SSN shape, an IPv4), so
    the operator is exercised on every row and both engines must agree
    on every replacement. Counts are per-type match counts on the
    pre-redaction text; the pattern chain is generated from
    PII_PATTERNS on both sides."""
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text").cast("string"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com call 555-123-4567 or 123-45-6789 at 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
        ).alias("text"),
    )
    return redact_pii(injected)


@query(
    "tfidf_top_terms",
    f"""
    WITH toks AS (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
                  FROM documents),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
    dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS score
      FROM tf JOIN dfreq USING (tok) CROSS JOIN nd
    )
    SELECT doc_id, tok, score, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                ORDER BY score DESC, tok) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
)
def q_tfidf(spark, sf_dir):
    """Top-3 characteristic terms per document by tf-idf with a
    deterministic (score DESC, term) tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, k=3)
