"""Multimodal-column queries: binary payload metadata (oracle-checked
— byte lengths and hashes are engine-agnostic) and the Pandas-UDF
feature/frame-sample paths (rows-only: the stubbed decode is Python-
side by design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.operators.multimodal import (
    attach_binary,
    extract_features,
    frame_sample,
)
from commercial_rfp_data_pipeline_spark.registry import query


@query(
    "multimodal_binary_metadata",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def q_mm_metadata(spark, sf_dir):
    """Typed metadata over binary payloads — the JVM-side half of the
    multimodal surface (mime dispatch, sizes, content hash), fully
    oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    b = attach_binary(docs)
    return b.select(
        "doc_id",
        "mime",
        F.octet_length("payload").alias("n_bytes"),
        F.md5(F.col("payload")).alias("content_md5"),
    )


@query("multimodal_feature_extract", None)
def q_mm_features(spark, sf_dir):
    """Arrow-batched mapInPandas feature extraction (stubbed decode —
    see operators/multimodal.py). Rows-only by design."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_binary(docs))


@query("multimodal_frame_sample", None)
def q_mm_frames(spark, sf_dir):
    """Frame sampling for video payloads (rows-only)."""
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(attach_binary(docs), every_n=8)
