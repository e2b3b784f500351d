"""Reconciliation + listing-source queries (SURVEY.md §2.1 S3, §2.4
F9/F10, §2.5 J2/J3, §2.8 O2): the reference's blob<->SharePoint
set-difference machinery over deterministically derived listing
snapshots (driver testdata has no object store; `part`/`orders` stand
in as the name universes, mirrored exactly in the oracle SQL).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.operators.documents import (
    docx_name_filter,
    latest_by_parsed_stamp,
    reconcile_listings,
)
from commercial_rfp_data_pipeline_spark.registry import query


def _blob_listing(spark, sf_dir):
    """Blob-side snapshot: docx for partkey % 7 != 0, plus non-docx
    noise (exercises the F9 suffix filter)."""
    p = load_table(spark, sf_dir, "part")
    name = F.when(
        p.p_partkey % 13 == 0,
        F.concat(F.lit("doc_"), F.col("p_partkey").cast("string"), F.lit(".tmp")),
    ).otherwise(
        F.concat(F.lit("doc_"), F.col("p_partkey").cast("string"), F.lit(".docx"))
    )
    return p.filter(p.p_partkey % 7 != 0).select(name.alias("name"))


def _sp_listing(spark, sf_dir):
    """SharePoint-side snapshot: docx for partkey % 5 != 0."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(p.p_partkey % 5 != 0).select(
        F.concat(
            F.lit("doc_"), F.col("p_partkey").cast("string"), F.lit(".docx")
        ).alias("name")
    )


@query(
    "reconcile_upload_delete",
    """
    WITH blob AS (
      SELECT CASE WHEN p_partkey % 13 = 0
                  THEN 'doc_' || CAST(p_partkey AS VARCHAR) || '.tmp'
                  ELSE 'doc_' || CAST(p_partkey AS VARCHAR) || '.docx' END AS name
      FROM part WHERE p_partkey % 7 <> 0
    ),
    sp AS (
      SELECT 'doc_' || CAST(p_partkey AS VARCHAR) || '.docx' AS name
      FROM part WHERE p_partkey % 5 <> 0
    ),
    blob_docx AS (SELECT name FROM blob WHERE lower(name) LIKE '%.docx'),
    sp_docx AS (SELECT name FROM sp WHERE lower(name) LIKE '%.docx')
    SELECT 'upload' AS action, name FROM blob_docx WHERE name NOT IN (SELECT name FROM sp_docx)
    UNION ALL
    SELECT 'delete' AS action, name FROM sp_docx WHERE name NOT IN (SELECT name FROM blob_docx)
    """,
)
def q_reconcile(spark, sf_dir):
    """J2+J3 in one labeled result: upload = blob∖sp, delete = sp∖blob
    (citation:47-113,133-156), both sides F9-filtered to .docx."""
    blob = docx_name_filter(_blob_listing(spark, sf_dir))
    sp = docx_name_filter(_sp_listing(spark, sf_dir))
    to_upload, to_delete = reconcile_listings(blob, sp)
    return to_upload.select(F.lit("upload").alias("action"), "name").unionByName(
        to_delete.select(F.lit("delete").alias("action"), "name")
    )


@query(
    "latest_file_selection",
    """
    SELECT name, stamp FROM (
      SELECT name, CAST(try_strptime(regexp_extract(name, '([0-9]{8})', 1), '%Y%m%d') AS DATE) AS stamp
      FROM (
        SELECT CASE WHEN o_orderkey % 3 = 0
                    THEN 'RFP_content_library_' || strftime(o_orderdate, '%Y%m%d') || '.xlsx'
                    ELSE 'report_' || CAST(o_orderkey AS VARCHAR) || '.pdf' END AS name
        FROM orders
      )
      WHERE name LIKE 'RFP_content_library_%' AND name LIKE '%.xlsx' AND
            try_strptime(regexp_extract(name, '([0-9]{8})', 1), '%Y%m%d') IS NOT NULL
    )
    ORDER BY stamp DESC, name DESC LIMIT 1
    """,
)
def q_latest_file(spark, sf_dir):
    """S3+F10+O2: latest content-library file by name-embedded
    timestamp — prefix/suffix predicate, parse-or-drop, top-1 without a
    full sort (TakeOrderedAndProject)."""
    o = load_table(spark, sf_dir, "orders")
    listing = o.select(
        F.when(
            o.o_orderkey % 3 == 0,
            F.concat(
                F.lit("RFP_content_library_"),
                F.date_format("o_orderdate", "yyyyMMdd"),
                F.lit(".xlsx"),
            ),
        )
        .otherwise(
            F.concat(F.lit("report_"), F.col("o_orderkey").cast("string"), F.lit(".pdf"))
        )
        .alias("name")
    )
    return latest_by_parsed_stamp(listing)


@query(
    "citation_map_dedup_keep_last",
    """
    SELECT file_name, preview_url FROM (
      SELECT file_name, preview_url,
             row_number() OVER (PARTITION BY file_name ORDER BY ord DESC) AS rn
      FROM (
        SELECT 'doc_' || CAST(p_partkey % 50 AS VARCHAR) || '.docx' AS file_name,
               'https://host/preview/' || CAST(p_partkey AS VARCHAR) AS preview_url,
               p_partkey AS ord
        FROM part
      )
    ) WHERE rn = 1
    """,
)
def q_citation_map(spark, sf_dir):
    """A7 applied to the citation mapping (citation:207): duplicate
    file_names keep the LAST listing by explicit ordinal (the reference
    relied on unguaranteed listing order — §2.12.9)."""
    from commercial_rfp_data_pipeline_spark.operators.dedup import dedup_keep_last

    p = load_table(spark, sf_dir, "part")
    mapping = p.select(
        F.concat(
            F.lit("doc_"), (F.col("p_partkey") % 50).cast("string"), F.lit(".docx")
        ).alias("file_name"),
        F.concat(F.lit("https://host/preview/"), F.col("p_partkey").cast("string")).alias(
            "preview_url"
        ),
        F.col("p_partkey").alias("ord"),
    )
    return dedup_keep_last(mapping, ["file_name"], ordinal="ord").drop("ord")


KEEP_PREFIX = "1995-06"  # F12 keep_date parameter (utils:96)


@query(
    "retention_prune_by_date_prefix",
    f"""
    SELECT 'doc_' || CAST(o_orderkey AS VARCHAR) || '.docx' AS name,
           strftime(o_orderdate, '%Y-%m-%d') AS created
    FROM orders
    WHERE NOT starts_with(strftime(o_orderdate, '%Y-%m-%d'), '{KEEP_PREFIX}')
    """,
)
def q_retention_prune(spark, sf_dir):
    """F12 (utils:90-106): the delete-list — files whose createdDateTime
    does NOT start with the keep date. String-prefix date matching
    preserved as in the reference (not a range predicate); orders stand
    in as the file listing."""
    o = load_table(spark, sf_dir, "orders")
    created = F.date_format("o_orderdate", "yyyy-MM-dd")
    return o.select(
        F.concat(F.lit("doc_"), F.col("o_orderkey").cast("string"), F.lit(".docx")).alias(
            "name"
        ),
        created.alias("created"),
    ).filter(~created.startswith(KEEP_PREFIX))


@query(
    "gdpr_cascade_delete",
    """
    WITH dels AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 = 0),
    chunks AS (
      SELECT CAST(doc_id AS VARCHAR) || '_' || CAST(pos AS VARCHAR) AS chunk_id
      FROM (
        SELECT doc_id, unnest(generate_series(0,
                 (1 + (greatest(length(text) - 120, 0) + 89) // 90) - 1)) AS pos
        FROM dels
      )
    )
    SELECT 'documents' AS table_name, CAST(doc_id AS VARCHAR) AS row_key
    FROM dels
    UNION ALL
    SELECT 'chunks' AS table_name, chunk_id AS row_key FROM chunks
    UNION ALL
    SELECT 'chunk_embeddings' AS table_name, chunk_id AS row_key FROM chunks
    """,
)
def q_gdpr_cascade_delete(spark, sf_dir):
    """Right-to-erasure CASCADE: a deletion-request set (every 13th
    document standing in for the DSAR list) expands through the
    derivation graph — source rows, their chunks (the same
    size-120/overlap-30 arithmetic `chunk_documents` derives), and the
    chunk-embedding index entries — into one per-table deletion
    manifest. This is the governance operation the engine's own
    lineage makes mechanical: every derived table keys back to
    parent_id, so erasure is key expansion + anti-join application
    (merge_apply / reset_and_rebuild execute the manifest), never a
    corpus rescan.

    Scale: the manifest is O(deleted docs x chunks-per-doc); each
    downstream table applies it as one anti-join (bucketed tables:
    Exchange-free). Sits with k_anonymity_audit and pii_redaction as
    the compliance surface."""
    from commercial_rfp_data_pipeline_spark.operators.chunking import chunk_text

    docs = load_table(spark, sf_dir, "documents")
    dels = docs.filter(F.col("doc_id") % 13 == 0)
    chunk_ids = chunk_text(dels, size=120, overlap=30).select("chunk_id")
    return (
        dels.select(
            F.lit("documents").alias("table_name"),
            F.col("doc_id").cast("string").alias("row_key"),
        )
        .unionByName(
            chunk_ids.select(
                F.lit("chunks").alias("table_name"),
                F.col("chunk_id").alias("row_key"),
            )
        )
        .unionByName(
            chunk_ids.select(
                F.lit("chunk_embeddings").alias("table_name"),
                F.col("chunk_id").alias("row_key"),
            )
        )
    )
