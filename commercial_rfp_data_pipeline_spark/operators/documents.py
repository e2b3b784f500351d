"""Document rendering + per-key document sink + reconciliation
(SURVEY.md §2.2 K3/K4, §2.3 P10/P11, §2.5 J2/J3).

The reference renders one .docx per cleaned row (labeled paragraphs,
blank fields skipped, named by key_hash —
commercial_rfp_content_doc_library_creation.py:46-69,105-131) and
reconciles two object stores by name set-difference
(commercial_rfp_content_citation_upload_mapping_creation.py:47-113,
133-156). Spark-first: rendering is a pure concat_ws projection
(docx bytes are a sink-side serialization detail, not a dataflow one);
reconciliation is a pair of left-anti joins over listing DataFrames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# field -> label, reference order (doc_library:50-58)
RENDER_FIELDS = (
    ("client_name", "Client Name"),
    ("rfp_type", "RFP Type"),
    ("consultant", "Consultant"),
    ("date", "Date"),
    ("question", "Question"),
    ("response", "Response"),
    ("sme", "SME"),
)


def _labeled(col: str, label: str) -> Column:
    """'Label: value' line, or NULL (skipped by concat_ws) when the
    field is null/blank — doc_library:60-64."""
    c = F.col(col)
    return F.when(
        c.isNotNull() & (F.trim(c) != ""), F.concat(F.lit(f"{label}: "), c)
    )


def render_documents(
    df: DataFrame,
    source_file: str,
    fields: tuple[tuple[str, str], ...] = RENDER_FIELDS,
) -> DataFrame:
    """P10+P11: rendered text ('Source File Name' line always first,
    doc_library:59) + derived file name.

    Column-fallback chains (doc_library:90-124, SURVEY.md §1.3):
    - response column resolves `response` -> `fixed answer` (raises
      with a did-you-mean if neither exists); the rendered label stays
      'Response' either way.
    - key column resolves `key_hash` -> FIRST column (legacy tables).
      With key_hash the name is '{key_hash}.docx' (no double suffix —
      doc_library:112-115); on the legacy path it is
      'RFP_Content_Library_{int(ref)}.docx' with integral floats
      coerced to int (doc_library:122-123)."""
    from commercial_rfp_data_pipeline_spark.validation import resolve_column

    resolved = resolve_column(df, ["response", "fixed answer"])
    fields = tuple((resolved if c == "response" else c, label) for c, label in fields)
    content = F.concat_ws(
        "\n",
        F.lit(f"Source File Name: {source_file}"),
        # absent columns render like blank ones: skipped
        *[_labeled(c, label) for c, label in fields if c in df.columns],
    )
    if "key_hash" in df.columns:
        file_name = F.when(
            F.lower(F.col("key_hash")).endswith(".docx"), F.col("key_hash")
        ).otherwise(F.concat(F.col("key_hash"), F.lit(".docx")))
    else:
        ref = F.col(df.columns[0])
        num = ref.cast("double")
        ref_str = F.when(
            num.isNotNull() & (num == F.floor(num)),
            num.cast("bigint").cast("string"),
        ).otherwise(ref.cast("string"))
        file_name = F.concat(
            F.lit("RFP_Content_Library_"), ref_str, F.lit(".docx")
        )
    return df.select(
        file_name.alias("file_name"),
        F.lit(source_file).alias("source_file"),
        content.alias("content"),
    )


def write_documents(df: DataFrame, out_dir: str) -> None:
    """K3/K4: truncate-and-rebuild per-key document sink. Text payloads
    partition by key prefix so a 100-TB corpus writes as many
    independent files; docx byte-rendering would wrap `content` in a
    foreachPartition writer (bytes = python-docx serialization of the
    same lines — driver-side concern, out of the data plane)."""
    (
        df.withColumn("prefix", F.substring("file_name", 13, 2))  # 2 hex chars
        .write.mode("overwrite")
        .partitionBy("prefix")
        .parquet(out_dir)
    )


def reconcile_listings(
    src: DataFrame, dst: DataFrame, name_col: str = "name"
) -> tuple[DataFrame, DataFrame]:
    """J2/J3: (to_upload, to_delete) = src∖dst, dst∖src on the name key
    — the reference's blob<->SharePoint reconciliation as two
    anti-joins. Both sides pre-filtered to .docx by callers (F9)."""
    to_upload = src.join(dst, name_col, "left_anti")
    to_delete = dst.join(src, name_col, "left_anti")
    return to_upload, to_delete


def docx_name_filter(df: DataFrame, name_col: str = "name") -> DataFrame:
    """F9: keep .docx names only (citation:62,79,150)."""
    return df.filter(F.lower(F.col(name_col)).endswith(".docx"))


def latest_by_parsed_stamp(
    df: DataFrame,
    name_col: str = "name",
    prefix: str = "RFP_content_library_",
    suffix: str = ".xlsx",
) -> DataFrame:
    """S3/F10/O2: blob-name scan — prefix+suffix predicate, parse
    yyyyMMdd from the name, keep the single latest (ties broken by
    name for determinism). orderBy(desc).limit(1) compiles to a
    TakeOrdered — no full sort at scale."""
    stamp = F.try_to_date(
        F.regexp_extract(F.col(name_col), r"(\d{8})", 1), "yyyyMMdd"
    )
    return (
        df.filter(
            F.col(name_col).startswith(prefix)
            & F.col(name_col).endswith(suffix)
        )
        .withColumn("stamp", stamp)
        .filter(F.col("stamp").isNotNull())
        .orderBy(F.col("stamp").desc(), F.col(name_col).desc())
        .limit(1)
    )
