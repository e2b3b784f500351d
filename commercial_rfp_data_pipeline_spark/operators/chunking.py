"""Text chunking (SURVEY.md §2.11): the reference declares an Azure
SplitSkill with pages mode, maximum_page_length=2000,
page_overlap_length=500 (commercial_rfp_indexer.py:164-176), executed
server-side. Re-expressed as a pure Catalyst expression — sequence +
substring + posexplode — no UDF, whole-stage-codegen'd, scales as a
narrow map (zero shuffle).

Child rows carry ``chunk_id = {parent}_{pos}`` and ``parent_id`` per
the reference's index projection (commercial_rfp_indexer.py:192-209).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_SIZE = 2000  # indexer:168
CHUNK_OVERLAP = 500  # indexer:169


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Explode each document into overlapping chunks.

    start(i) = 1 + i*step (step = size-overlap);
    n_chunks = 1 + ceil(max(len-size, 0) / step)   (always >= 1).
    Consecutive chunks share exactly ``overlap`` chars; concatenating
    chunks minus overlaps reconstructs the original (property-tested).
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    step = size - overlap
    n = F.lit(1) + F.expr(
        f"(greatest(length({text_col}) - {size}, 0) + {step} - 1) div {step}"
    )
    out = df.withColumn("__n", n).select(
        F.col(id_col),
        F.col(text_col),
        F.posexplode(F.sequence(F.lit(0), F.col("__n") - 1)).alias("pos", "__i"),
    )
    return out.select(
        F.concat(F.col(id_col).cast("string"), F.lit("_"), F.col("pos").cast("string")).alias(
            "chunk_id"
        ),
        F.col(id_col).cast("string").alias("parent_id"),
        F.col("pos"),
        F.expr(f"substring({text_col}, 1 + pos * {step}, {size})").alias("chunk"),
    )
