"""Flagship plan: the full §3.2 cleaning chain over the driver's
``documents`` table.

The driver testdata has no RFP Excel, so we derive a deterministic
``rfp_raw`` view from ``documents`` (FIXTURES.md §2 mapping) — a
self-join ``d2.doc_id = d1.doc_id % 250`` manufactures duplicate
question/response groups (every base question appears on multiple rows
with different dates/lengths), and doc_id-modulo case branches inject
every §2.12 edge: 'none'/'None'/'nan'/'contact' markers, NULLs, empty
responses, all three date formats plus garbage, P9 canonicalization
variants, >120-char snippets with doubled internal whitespace.

The derivation is expressed identically in Spark (here) and ANSI SQL
(registry.py oracle) so the DuckDB oracle checks the WHOLE chain:
derivation -> keys -> P2 -> F1..F7 -> A6 -> J1(literal) -> A5 -> P9.

Chain order is the reference's (main:13-46, raw:279-322): keys are
derived BEFORE cleaning, so the `key` column itself is subject to the
P2 whitespace collapse (raw:291 -> :297); dedup compares
pre-canonicalized responses (P9 last, §2.12.7).

Scale: the only shuffles are the three question-partitioned windows
(A6 shares none — it partitions by (question,response)) and the tiny
broadcast of distinct max-dates in J1; filters and key derivation fuse
into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.operators.cleaning import (
    add_char_count,
    canonicalize_responses,
    derive_keys,
    filter_string_nulls,
    normalize_whitespace,
    parse_date_column,
    retention_filter,
)
from commercial_rfp_data_pipeline_spark.operators.dedup import (
    argmax_per_key,
    dedup_keep_first,
    keep_latest_global_date_semantics,
)

AS_OF = "1998-06-01"  # parameterized F2 reference date (SURVEY.md §2.12.6)
DUP_MOD = 250  # self-join modulus manufacturing duplicate q/r groups


def rfp_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the rfp_raw fixture view from documents (see module doc)."""
    d1 = load_table(spark, sf_dir, "documents").alias("d1")
    # the join key equality forces d2.doc_id ∈ [0, DUP_MOD) — state it
    # explicitly so the build side is provably 250 rows and broadcasts;
    # qtext is only ever read in its first 150 chars (question snippet
    # 1..130, response snippet 11..150), so truncate before shipping
    d2 = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < DUP_MOD)
        .select("doc_id", F.substring("text", 1, 150).alias("qtext"))
        .alias("d2")
    )
    joined = d1.join(
        F.broadcast(d2), F.col("d1.doc_id") % DUP_MOD == F.col("d2.doc_id"), "inner"
    )
    i = F.col("d1.doc_id")
    base_date = F.date_add(F.to_date(F.lit("1994-01-01")), ((i * 7) % 1600).cast("int"))
    date_str = (
        F.when(i % 4 == 0, F.date_format(base_date, "MM/dd/yyyy"))
        .when(i % 4 == 1, F.date_format(base_date, "yyyy-MM-dd"))
        .when(i % 4 == 2, F.date_format(base_date, "dd-MM-yyyy"))
        .otherwise(F.concat(F.lit("not a date "), i.cast("string")))
    )
    question = (
        F.when(i % 23 == 0, F.lit("none"))
        .when(i % 23 == 1, F.lit("None"))
        .when(i % 23 == 2, F.lit("nan"))
        .when(i % 23 == 3, F.lit("contact"))
        .when(i % 23 == 4, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("  "),
                F.regexp_replace(F.substring(F.col("d2.qtext"), 1, 130), " ", "  "),
                F.lit(" "),
            )
        )
    )
    response = (
        F.when(i % 19 == 0, F.lit("none"))
        .when(i % 19 == 1, F.lit("NaN"))
        .when(i % 19 == 2, F.lit("N/A"))
        .when(i % 19 == 3, F.lit("Not Applicable."))
        .when(i % 19 == 4, F.lit("CONFIRMED"))
        .when(i % 19 == 5, F.lit("Confirmed via BlueInsights."))
        .when(i % 19 == 6, F.lit("Yes. Confirmed."))
        .when(i % 19 == 7, F.lit(""))
        .when(i % 19 == 8, F.lit(None).cast("string"))
        # length varies with d1 so A5 argmax-by-length is meaningful
        .otherwise(F.expr("substring(d2.qtext, 11, 100 + (d1.doc_id % 40))"))
    )
    return joined.select(
        i.alias("ord"),
        F.col("d1.source").alias("client_name"),
        F.col("d1.lang").alias("rfp_type"),
        F.concat(F.lit("consultant_"), (i % 5).cast("string")).alias("consultant"),
        date_str.alias("date"),
        question.alias("question"),
        response.alias("response"),
        F.when(
            i % 6 == 0, F.concat(F.lit("sme_"), (i % 9).cast("string"))
        ).alias("sme"),
    )


def flagship(spark: SparkSession, sf_dir: str, as_of: str = AS_OF) -> DataFrame:
    """The full cleaning chain (SURVEY.md §3.2), reference order."""
    df = rfp_raw(spark, sf_dir)
    # F1 parse for key derivation only (keys precede cleaning, §2.12.5)
    df = df.withColumn(
        "date_parsed",
        F.coalesce(
            *[
                F.try_to_date(F.col("date"), f)
                for f in ("MM/dd/yyyy", "yyyy-MM-dd", "dd-MM-yyyy")
            ]
        ),
    )
    df = derive_keys(
        df,
        client="client_name",
        date="date_parsed",
        rfp_type="rfp_type",
        consultant="consultant",
        question="question",
        response="response",
    ).drop("date_parsed")
    # P2 over every string column (the reference applymaps the WHOLE
    # frame, key included)
    str_cols = [c for c in df.columns if c != "ord"]
    df = normalize_whitespace(df, str_cols)
    # F1 (drop unparseable) -> F2 -> F3..F7
    df = parse_date_column(df, col="date", out="date_parsed")
    df = retention_filter(df, as_of=as_of, months=36, col="date_parsed")
    df = filter_string_nulls(df)
    # A6: dedup on (question, response), pandas keep='first' by ordinal
    df = dedup_keep_first(df, ["question", "response"], ordinal="ord")
    # J1: literal global-date semantics (SURVEY.md §2.12.1)
    df = keep_latest_global_date_semantics(df, key="question", date_col="date_parsed")
    # A5: longest-response argmax per question, first-max tiebreak
    df = add_char_count(df, "response", "char_count")
    df = argmax_per_key(df, ["question"], "char_count", tiebreak="ord")
    df = df.drop("char_count")  # helper dropped (raw:302-303)
    # P9 on the final deduped table
    df = canonicalize_responses(df)
    return df.select(
        "ord",
        "client_name",
        "rfp_type",
        "consultant",
        F.date_format("date_parsed", "yyyy-MM-dd").alias("date"),
        "question",
        "response",
        "sme",
        "key",
        "key_hash",
    )
