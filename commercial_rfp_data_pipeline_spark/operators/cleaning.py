"""The RFP cleaning chain (SURVEY.md §3.2) as composable lazy
transforms.

Reference: ``commercial_rfp_raw_data_ingestion_and_cleaning.py``
(clean_data :179-241, key derivation :51-78, canonicalize :305-310).
The reference materializes a fresh pandas DataFrame per step; here the
whole chain is a single Catalyst plan — the seven sequential filters
fuse into one predicate evaluated in one codegen'd scan pass, and the
projection rewrites collapse (SURVEY.md §4.2).

Fidelity notes preserved verbatim (SURVEY.md §2.12):
- null filtering is STRING filtering: question drops lower=='none' but
  NOT 'nan'; response drops both ('nan' AND 'none') — asymmetric by
  design, do not "fix";
- key = client_date_rfptype_consultant_q[:120]_r[:120]; key_hash = md5
  of first 120 chars of the whitespace-STRIPPED key (strip then
  truncate);
- the 36-month cutoff is parameterized (``as_of``) so engine and oracle
  agree reproducibly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.functions.scalar import (
    DATE_FORMATS,
    canonicalize_confirmed,
    multi_format_to_date,
    norm_ws,
)


def lowercase_columns(df: DataFrame) -> DataFrame:
    """P1: lowercase all column names (raw:182,287)."""
    return df.toDF(*[c.lower() for c in df.columns])


def normalize_whitespace(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """P2: stringify + collapse whitespace + trim every (listed) column
    (raw:183). One projection — Catalyst folds it into the scan."""
    cols = cols or df.columns
    return df.select(
        *[norm_ws(c).alias(c) if c in cols else F.col(c) for c in df.columns]
    )


def parse_date_column(
    df: DataFrame, col: str = "date", out: str = "date", formats=DATE_FORMATS
) -> DataFrame:
    """F1: multi-format parse; unparseable -> NULL -> dropped
    (raw:169-177,199-203)."""
    return df.withColumn(out, multi_format_to_date(col, formats)).filter(
        F.col(out).isNotNull()
    )


def retention_filter(df: DataFrame, as_of: str, months: int = 36, col: str = "date") -> DataFrame:
    """F2: rolling window ``date >= as_of - months`` (raw:206-208).
    ``as_of`` is a parameter, not current_date(), for reproducibility
    (SURVEY.md §2.12.6)."""
    return df.filter(F.col(col) >= F.add_months(F.to_date(F.lit(as_of)), -months))


def filter_string_nulls(df: DataFrame) -> DataFrame:
    """F3-F7: the post-stringify predicate stack (raw:221-237).
    Asymmetry preserved: question keeps 'nan', response drops it."""
    q, r = F.col("question"), F.col("response")
    return df.filter(
        q.isNotNull()
        & (F.lower(q) != "none")                      # F3 (NOT 'nan')
        & r.isNotNull()
        & ~F.lower(r).isin("none", "nan")             # F4
        & (F.length(r) != 0)                          # F5
        & ~F.lower(r).isin("n/a", "not applicable.")  # F6
        & ~F.lower(q).isin("contact")                 # F7
    )


KEY_SNIPPET_LEN = 120  # raw:37,67-68


def _key_expr(
    client: str, date: str, rfp_type: str, consultant: str, question: str, response: str
) -> Column:
    """P3: composite natural key
    client_date_rfptype_consultant_q[:120]_r[:120] from trimmed fields
    (raw:59-72). Date contributes its ISO string form (raw:56-57).
    Snippets are trim-only (ends stripped, internal whitespace kept) —
    key derivation runs BEFORE the P2 collapse in the reference
    (SURVEY.md §2.12.5)."""
    return F.concat_ws(
        "_",
        F.trim(F.col(client)),
        F.date_format(F.col(date), "yyyy-MM-dd"),
        F.trim(F.col(rfp_type)),
        F.trim(F.col(consultant)),
        F.substring(F.trim(F.col(question)), 1, KEY_SNIPPET_LEN),
        F.substring(F.trim(F.col(response)), 1, KEY_SNIPPET_LEN),
    )


def derive_keys(
    df: DataFrame,
    client: str = "client name",
    date: str = "date",
    rfp_type: str = "rfp type",
    consultant: str = "consultant",
    question: str = "question",
    response: str = "response",
) -> DataFrame:
    """P3 + P4: natural key, then content-hash key
    ``RFP_Content_<md5(first 120 chars of ws-stripped key)>``
    (raw:32-49,73-77). Strip-then-truncate order is load-bearing
    (SURVEY.md §2.12.4)."""
    df = df.withColumn(
        "key", _key_expr(client, date, rfp_type, consultant, question, response)
    )
    stripped = F.regexp_replace(F.col("key"), r"\s+", "")
    return df.withColumn(
        "key_hash",
        F.concat(
            F.lit("RFP_Content_"), F.md5(F.substring(stripped, 1, KEY_SNIPPET_LEN))
        ),
    )


def canonicalize_responses(df: DataFrame, col: str = "response") -> DataFrame:
    """P9 on the final table (raw:305-310) — after dedup, by design
    (SURVEY.md §2.12.7)."""
    return df.withColumn(col, canonicalize_confirmed(col))


def add_char_count(df: DataFrame, col: str = "response", out: str = "char_count") -> DataFrame:
    """P8 (raw:272)."""
    return df.withColumn(out, F.length(F.col(col)))


def clean_chain(df: DataFrame, as_of: str, months: int = 36) -> DataFrame:
    """P1 -> P2 -> F1 -> F2 -> F3..F7: the filter/normalize half of the
    flagship chain (raw:179-241). Key derivation and dedup compose on
    top (see plans/flagship.py)."""
    df = lowercase_columns(df)
    str_cols = [c for c in df.columns if c != "ord"]
    df = normalize_whitespace(df, str_cols)
    df = parse_date_column(df)
    df = retention_filter(df, as_of=as_of, months=months)
    return filter_string_nulls(df)
