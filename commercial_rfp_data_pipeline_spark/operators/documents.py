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
      with a did-you-mean if neither exists); the label is the resolved
      column title-cased, mirroring ``response_col.title()``
      (doc_library:55).
    - key column resolves `key_hash` -> FIRST column (legacy tables).
      With key_hash the name is '{key_hash}.docx' (no double suffix —
      doc_library:112-115); on the legacy path it is
      'RFP_Content_Library_{int(ref)}.docx' with integral floats
      coerced to int (doc_library:122-123).
    Rows whose key is null/blank are skipped entirely (F11,
    doc_library:107-109,120-121)."""
    from commercial_rfp_data_pipeline_spark.validation import resolve_column

    resolved = resolve_column(df, ["response", "fixed answer"])
    fields = tuple(
        (resolved, resolved.title()) if c == "response" else (c, label)
        for c, label in fields
    )
    content = F.concat_ws(
        "\n",
        F.lit(f"Source File Name: {source_file}"),
        # absent columns render like blank ones: skipped
        *[_labeled(c, label) for c, label in fields if c in df.columns],
    )
    key = F.col("key_hash" if "key_hash" in df.columns else df.columns[0])
    if "key_hash" in df.columns:
        file_name = F.when(
            F.lower(F.col("key_hash")).endswith(".docx"), F.col("key_hash")
        ).otherwise(F.concat(F.col("key_hash"), F.lit(".docx")))
    else:
        ref = key
        num = ref.cast("double")
        ref_str = F.when(
            num.isNotNull() & (num == F.floor(num)),
            num.cast("bigint").cast("string"),
        ).otherwise(ref.cast("string"))
        file_name = F.concat(
            F.lit("RFP_Content_Library_"), ref_str, F.lit(".docx")
        )
    return df.filter(key.isNotNull() & (F.trim(key) != "")).select(
        file_name.alias("file_name"),
        F.lit(source_file).alias("source_file"),
        content.alias("content"),
    )


_DOCX_DECL = '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
_DOCX_CT = (
    f'{_DOCX_DECL}<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)
_DOCX_RELS = (
    f'{_DOCX_DECL}<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)


def docx_bytes(content: str) -> bytes:
    """K3's byte payload: serialize rendered text as a REAL .docx
    container (OOXML zip with one <w:p> paragraph per line) — the same
    document python-docx's Document/add_paragraph produces for the
    reference (doc_library:46-69), minus styling parts no consumer of
    these documents reads. Pure function of the content string, so the
    sink below can run it inside foreachPartition executors."""
    import io
    import zipfile
    from xml.sax.saxutils import escape

    paras = "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{escape(line)}</w:t></w:r></w:p>'
        for line in content.split("\n")
    )
    doc = (
        f'{_DOCX_DECL}<w:document '
        'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{paras}</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _DOCX_CT)
        z.writestr("_rels/.rels", _DOCX_RELS)
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def write_docx_files(df: DataFrame, out_dir: str) -> int:
    """K3 byte sink: one real .docx file per rendered row, named by
    ``file_name``. A local-filesystem transport plugged into the K7
    upload seam — ``out_dir`` must be a shared filesystem path in
    cluster mode; object stores swap in an HTTP PUT transport
    (``upload_documents``)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def put(name: str, payload: bytes) -> None:
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(payload)

    return upload_documents(df, put)


def upload_documents(
    df: DataFrame,
    put,
    name_col: str = "file_name",
    content_col: str = "content",
    render=docx_bytes,
) -> int:
    """K7: per-row file upload PUT (reference
    commercial_rfp_data_ingestion_utils.py:76-88, driven by the
    citation mapper's upload loop at citation:148-164). The transport
    is an injectable ``put(name: str, payload: bytes) -> None``
    callable shipped to the executors — production wraps an HTTP PUT
    (overwrite semantics, like the reference's Graph ':/content'
    endpoint); tests inject a local writer. ``render`` turns the
    content column into payload bytes (default: the real .docx
    container).

    Shape: foreachPartition fans the I/O out across executors — the
    distributed form of the reference draft's ThreadPoolExecutor
    (1/citation:119-139). Returns the uploaded row count (counted on
    the same materialized frame, not a second scan)."""
    rendered = df.select(name_col, content_col).persist()
    n = rendered.count()

    def run(rows) -> None:
        for r in rows:
            put(r[name_col], render(r[content_col]))

    rendered.foreachPartition(run)
    rendered.unpersist()
    return n


def write_documents(df: DataFrame, out_dir: str) -> None:
    """K3/K4: truncate-and-rebuild per-key document sink. Text payloads
    partition by key prefix so a 100-TB corpus writes as many
    independent files; ``write_docx_files`` above is the byte-true
    variant emitting one real .docx container per row."""
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
