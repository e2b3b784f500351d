"""Round-9 LLM-pipeline additions.

DSIR-style importance resampling (Xie et al., "Data Selection for
Language Models via Importance Resampling", NeurIPS 2023): score every
raw-pool document by how target-domain-like its n-gram feature
distribution is — sum over the doc's features of
log(p_target(f) / p_raw(f)) under Laplace-smoothed feature LMs — and
keep the top-K. This is the selection step a pretraining pipeline runs
to up-weight quality-domain-like data without a trained classifier;
here the target domain is the corpus's 'en' slice and features are the
same word-3-gram shingles the dedup family indexes (served from the
durable token-index artifact — zero re-derivation).

Numeric discipline: each feature's log-ratio is rounded to 6 dp and
cast DECIMAL before the per-document sum, so the sum is
order-independent and bit-identical across engines (the same pattern
as the resource-allocation link-prediction score); ranking ties break
on doc_id.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.queries.text_q import _SHINGLES_CTE
from commercial_rfp_data_pipeline_spark.registry import query

_DSIR_TOPK = 100
_DSIR_TARGET_LANG = "en"


@query(
    "dsir_importance_resample",
    f"""
    WITH {_SHINGLES_CTE.strip()},
    dfreq AS (SELECT sh, count(*) AS cs FROM sh GROUP BY sh),
    tgt AS (
      SELECT s.sh, count(*) AS ct
      FROM sh s JOIN documents d USING (doc_id)
      WHERE d.lang = '{_DSIR_TARGET_LANG}'
      GROUP BY s.sh
    ),
    tot AS (
      SELECT (SELECT count(*) FROM dfreq) AS v,
             (SELECT sum(cs) FROM dfreq) AS ns,
             (SELECT coalesce(sum(ct), 0) FROM tgt) AS nt
    ),
    terms AS (
      SELECT f.sh,
             CAST(round(ln(
               ((coalesce(t.ct, 0) + 1) / CAST(tot.nt + tot.v AS DOUBLE))
               / ((f.cs + 1) / CAST(tot.ns + tot.v AS DOUBLE))
             ), 6) AS DECIMAL(12,6)) AS w
      FROM dfreq f LEFT JOIN tgt t ON t.sh = f.sh CROSS JOIN tot
    ),
    docw AS (
      SELECT s.doc_id, count(*) AS n_toks, sum(w) AS wsum
      FROM sh s JOIN terms USING (sh) GROUP BY s.doc_id
    )
    SELECT doc_id, lang, CAST(n_toks AS BIGINT) AS n_toks,
           CAST(wsum AS DOUBLE) AS dsir_weight,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT w.doc_id, d.lang, w.n_toks, w.wsum,
             row_number() OVER (ORDER BY w.wsum DESC, w.doc_id) AS rnk
      FROM docw w JOIN documents d USING (doc_id)
    )
    WHERE rnk <= {_DSIR_TOPK}
    """,
)
def q_dsir_importance_resample(spark, sf_dir):
    """DSIR importance resampling over the raw pool: per-document
    target-likeness = sum over the doc's DISTINCT 3-gram features of
    round(ln(p_target(f) / p_raw(f)), 6), with Laplace-smoothed
    feature LMs (counts are document frequencies; the vocabulary is
    the corpus's distinct feature set). Top-100 selected,
    deterministic doc_id tiebreak; lang rides along so the report
    shows the target slice dominating — the sanity a data curator
    checks first.

    Scale: features and df come from the durable token-index artifact
    (one parquet read); the target counts are one semi-joined groupBy;
    the per-feature term table is vocabulary-sized (broadcastable
    totals via one-row aggregates, never a driver collect); the
    per-doc sum is one map-side-combining groupBy over the postings;
    selection is orderBy().limit() -> TakeOrderedAndProject, with the
    rank window applied AFTER the limit (the registry's limit-first
    discipline)."""
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_token_index,
    )

    toks, dft, _ = ensure_token_index(spark, sf_dir, k=3)
    docs = load_table(spark, sf_dir, "documents")
    tgt = (
        toks.join(
            docs.filter(F.col("lang") == _DSIR_TARGET_LANG).select("doc_id"),
            "doc_id",
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    totals = (
        dft.agg(
            F.count(F.lit(1)).alias("v"), F.sum("df").alias("ns")
        )
        .crossJoin(
            F.broadcast(
                tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
            )
        )
    )
    terms = (
        dft.join(tgt, "tok", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "tok",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                        / (F.col("nt") + F.col("v")).cast("double")
                    )
                    / (
                        (F.col("df") + 1)
                        / (F.col("ns") + F.col("v")).cast("double")
                    )
                ),
                6,
            )
            .cast("decimal(12,6)")
            .alias("w"),
        )
    )
    docw = (
        toks.join(terms, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("w").alias("wsum"),
        )
    )
    top = (
        docw.join(docs.select("doc_id", "lang"), "doc_id")
        .orderBy(F.col("wsum").desc(), "doc_id")
        .limit(_DSIR_TOPK)
    )
    w = Window.orderBy(F.col("wsum").desc(), "doc_id")
    return top.withColumn("rnk", F.row_number().over(w).cast("int")).select(
        "doc_id",
        "lang",
        F.col("n_toks").cast("long").alias("n_toks"),
        F.col("wsum").cast("double").alias("dsir_weight"),
        "rnk",
    )


_TEMP_ALPHA = 0.3


@query(
    "multilingual_sampling_temperature",
    f"""
    WITH {{SH}},
    tokmass AS (
      SELECT d.lang, count(DISTINCT d.doc_id) AS n_docs, count(*) AS n_toks
      FROM sh s JOIN documents d USING (doc_id)
      GROUP BY d.lang
    ),
    tot AS (SELECT sum(n_toks) AS nt FROM tokmass),
    r AS (
      SELECT lang, n_docs, n_toks,
             n_toks / CAST(tot.nt AS DOUBLE) AS p_raw,
             CAST(round(pow(n_toks / CAST(tot.nt AS DOUBLE), {_TEMP_ALPHA}),
                        9) AS DECIMAL(12,9)) AS rw
      FROM tokmass CROSS JOIN tot
    ),
    rs AS (SELECT sum(rw) AS rsum FROM r)
    SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_toks AS BIGINT) AS n_toks,
           round(p_raw, 6) AS p_raw,
           round(CAST(rw AS DOUBLE) / CAST(rs.rsum AS DOUBLE), 6) AS q_temp,
           round((CAST(rw AS DOUBLE) / CAST(rs.rsum AS DOUBLE)) / p_raw, 4)
             AS upsample_factor
    FROM r CROSS JOIN rs
    """.replace("{SH}", _SHINGLES_CTE.strip()),
)
def q_multilingual_sampling_temperature(spark, sf_dir):
    """Temperature-scaled multilingual sampling weights (Conneau et
    al. XLM-R / mT5: q_l proportional to p_l^alpha, alpha = 0.3): the
    per-language sampling distribution a multilingual pretraining run
    uses to up-sample low-resource languages without drowning the
    high-resource ones. p_l = language share of indexable token mass
    (the durable token-index postings — the same unit the retrieval
    family serves); reports raw share, tempered share, and the
    realized up/down-sampling factor per language.

    Numeric discipline: pow(p, 0.3) is rounded to 9 dp and cast
    DECIMAL before the normalizing sum (order-independent, exact);
    final shares round to 6 dp — the same libm-boundary containment
    the Wilson/RA scores use.

    Scale: one groupBy(lang) over the postings (5 rows out), two
    broadcast one-row totals — corpus-sized work is a single
    map-side-combining aggregate of the artifact."""
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_token_index,
    )

    toks, _, _ = ensure_token_index(spark, sf_dir, k=3)
    docs = load_table(spark, sf_dir, "documents")
    mass = (
        toks.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_toks"),
        )
    )
    tot = mass.agg(F.sum("n_toks").alias("nt"))
    r = mass.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_toks",
        (F.col("n_toks") / F.col("nt").cast("double")).alias("p_raw"),
        F.round(
            F.pow(
                F.col("n_toks") / F.col("nt").cast("double"),
                F.lit(_TEMP_ALPHA),
            ),
            9,
        )
        .cast("decimal(12,9)")
        .alias("rw"),
    )
    rs = r.agg(F.sum("rw").alias("rsum"))
    return r.crossJoin(F.broadcast(rs)).select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_toks").cast("long").alias("n_toks"),
        F.round("p_raw", 6).alias("p_raw"),
        F.round(
            F.col("rw").cast("double") / F.col("rsum").cast("double"), 6
        ).alias("q_temp"),
        F.round(
            (F.col("rw").cast("double") / F.col("rsum").cast("double"))
            / F.col("p_raw"),
            4,
        ).alias("upsample_factor"),
    )
