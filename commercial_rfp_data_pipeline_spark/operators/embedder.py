"""Pluggable embedder (SURVEY.md §2.11, §4.3).

The reference declares an AzureOpenAIEmbeddingSkill producing 1536-dim
vectors per chunk, executed remotely (commercial_rfp_indexer.py:177-191).
The engine's contract mirrors that seam:

- ``Embedder`` protocol: ``embed(df, text_col) -> df + 'embedding'``;
- ``HashedBowEmbedder`` — the hermetic deterministic local
  implementation: L2-normalized hashed bag-of-words. Component j of
  dim d = count of tokens whose md5 maps to bucket j. Pure Catalyst
  expressions, so the DuckDB oracle can reproduce the vectors exactly;
- ``PandasBatchEmbedder`` — the production-shaped path: Arrow-batched
  ``mapInPandas`` calling a vectorized embed function per batch (this
  is where a real model/service client plugs in). Ships with the same
  hashed-BoW math in numpy; tests assert it matches the expression
  embedder bit-for-bit after rounding.

Scale: both paths are narrow maps. The remote-service variant of
PandasBatchEmbedder batches requests per Arrow chunk — the same
shape the reference's skillset batching performs server-side.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 64  # testdata embedding width; reference uses 1536 (indexer:55)


def _bucket_expr(dim: int) -> Column:
    """Token -> bucket: first two md5 hex chars as a 0..255 int, mod
    dim. Stated with instr arithmetic (not conv) so the DuckDB oracle
    reproduces it verbatim."""
    h = F.md5(F.col("tok"))
    hexd = "0123456789abcdef"
    v1 = F.expr(f"instr('{hexd}', substring(md5(tok), 1, 1))") - 1
    v2 = F.expr(f"instr('{hexd}', substring(md5(tok), 2, 1))") - 1
    return ((v1 * 16 + v2) % dim).cast("bigint")


class HashedBowEmbedder:
    """Deterministic local embedder: L2-normalized hashed BoW counts."""

    def __init__(self, dim: int = DEFAULT_DIM):
        self.dim = dim

    def embed(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        toks = df.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), " ")
            ).alias("tok"),
        )
        counts = (
            toks.withColumn("bucket", _bucket_expr(self.dim))
            .groupBy(id_col, "bucket")
            .agg(F.count(F.lit(1)).cast("double").alias("c"))
        )
        # assemble dense vector: sorted (bucket, c) pairs -> dim-length array
        dense = counts.groupBy(id_col).agg(
            F.map_from_entries(F.array_sort(F.collect_list(F.struct("bucket", "c")))).alias(
                "m"
            )
        )
        arr = F.transform(
            F.sequence(F.lit(0), F.lit(self.dim - 1)),
            lambda j: F.coalesce(F.element_at(F.col("m"), j.cast("bigint")), F.lit(0.0)),
        )
        norm = F.sqrt(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x))
        unit = F.transform(arr, lambda x: F.round(x / norm, 6))
        return dense.select(F.col(id_col), unit.alias("embedding"))


class PandasBatchEmbedder:
    """Arrow-batched embedding — the seam where a real model plugs in.
    Default batch_fn = the same hashed BoW in numpy (hermetic)."""

    def __init__(self, dim: int = DEFAULT_DIM, batch_fn=None):
        self.dim = dim
        self.batch_fn = batch_fn

    def embed(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        import hashlib

        dim = self.dim
        batch_fn = self.batch_fn

        def default_fn(texts):
            import numpy as np
            import re

            out = np.zeros((len(texts), dim))
            for i, t in enumerate(texts):
                toks = re.sub(r"\s+", " ", str(t)).strip().lower().split(" ")
                for tok in toks:
                    j = int(hashlib.md5(tok.encode()).hexdigest()[:2], 16) % dim
                    out[i, j] += 1.0
            norms = np.linalg.norm(out, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            return np.round(out / norms, 6)

        fn = batch_fn or default_fn

        def run(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                vecs = fn(pdf[text_col].tolist())
                yield pd.DataFrame(
                    {id_col: pdf[id_col], "embedding": [list(v) for v in vecs]}
                )

        return df.mapInPandas(run, schema=f"{id_col} string, embedding array<double>")
