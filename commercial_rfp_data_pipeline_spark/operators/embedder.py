"""Pluggable embedder (SURVEY.md §2.11, §4.3).

The reference declares an AzureOpenAIEmbeddingSkill producing 1536-dim
vectors per chunk, executed remotely (commercial_rfp_indexer.py:177-191).
The engine's contract mirrors that seam:

- ``Embedder`` protocol: ``embed(df, text_col) -> df + 'embedding'``;
- ``HashedBowEmbedder`` — the hermetic deterministic local
  implementation: L2-normalized hashed bag-of-words. Component j of
  dim d = count of tokens whose md5 maps to bucket j. Pure Catalyst
  expressions, so the DuckDB oracle can reproduce the vectors exactly.
  Shuffle-free by construction: the whole vector is assembled per row
  with higher-order array functions (transform/filter/aggregate) — a
  narrow map that scales linearly with no exchange, vs the naive
  explode -> groupBy(id, bucket) -> collect shape which shuffles every
  token twice;
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


def _bucket_of(tok: Column, dim: int) -> Column:
    """Token -> bucket: first two md5 hex chars as a 0..255 int, mod
    dim (conv base-16; the oracle states the same value with strpos
    arithmetic — identical results, compared by value not by plan)."""
    return F.conv(F.substring(F.md5(tok), 1, 2), 16, 10).cast("bigint") % dim


class HashedBowEmbedder:
    """Deterministic local embedder: L2-normalized hashed BoW counts.

    Entirely per-row (narrow): tokenize -> bucket each token -> count
    per component with filter/size -> normalize. O(dim x n_tokens)
    codegen'd comparisons per row, zero shuffles — at 100 TB this is a
    pure map stage limited only by scan bandwidth, where the exploded
    groupBy formulation would shuffle ~10^12 token rows."""

    def __init__(self, dim: int = DEFAULT_DIM):
        self.dim = dim

    def embed_parts(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        """(id, _arr, _norm): raw per-bucket counts + L2 norm, before
        normalization. Staged through separate projections on purpose:
        each stage's expensive expression (the md5-per-token bucket
        array, the count array) is referenced downstream as a
        *projected attribute*, evaluated once per row — nested
        directly, optimizer rules (CollapseProject across lambda
        bodies, InferFiltersFromGenerate) would inline the whole tree
        into every consumer and re-evaluate it per array element.
        Counting is a single `aggregate` pass over the bucket array
        (md5 once per token), not a per-component filter scan."""
        dim = self.dim
        toks = F.split(
            F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), " "
        )
        buckets = F.transform(toks, lambda t: _bucket_of(t, dim))
        counts = F.aggregate(
            F.col("_buckets"),
            F.array_repeat(F.lit(0.0), dim),
            lambda acc, b: F.transform(
                acc, lambda x, i: F.when(i.cast("bigint") == b, x + 1.0).otherwise(x)
            ),
        )
        norm = F.sqrt(F.aggregate(F.col("_arr"), F.lit(0.0), lambda a, x: a + x * x))
        return (
            df.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col), buckets.alias("_buckets"))
            .select(F.col(id_col), counts.alias("_arr"))
            .withColumn("_norm", norm)
        )

    def embed(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        parts = self.embed_parts(df, text_col, id_col)
        unit = F.transform(F.col("_arr"), lambda x: F.round(x / F.col("_norm"), 6))
        return parts.select(F.col(id_col), unit.alias("embedding"))


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


def crossencoder_rerank(
    pairs: DataFrame,
    q_col: str = "q_id",
    d_col: str = "vec_id",
    score_fn=None,
) -> DataFrame:
    """The RERANK seam of two-stage retrieval serving: a cross-encoder
    scores each (query, candidate) pair jointly — strictly better
    relevance than the bi-encoder cosine that built the shortlist, and
    affordable precisely BECAUSE it only ever sees the shortlist
    (k·n_queries rows, never the corpus). Batches of pairs flow through
    ``mapInPandas``; production swaps ``score_fn`` for the model
    forward pass over the Arrow batch (the batch shape IS the
    contract — same policy as the embedder seam above and the
    multimodal decoders).

    Default ``score_fn`` is the documented deterministic fake:
    score = int(md5('ce:q:d')[:6], 16) / 16^6 ∈ [0,1) — exact
    arithmetic (the divisor is a power of two), so the whole rerank
    pipeline stays value-checkable end to end.

    Appends ``ce_score`` (double) to the input columns."""
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in pairs.schema.fields)

    def run(batches):
        import hashlib

        for pdf in batches:
            pdf = pdf.copy()
            if score_fn is not None:
                pdf["ce_score"] = score_fn(pdf)
            else:
                pdf["ce_score"] = [
                    int(
                        hashlib.md5(f"ce:{q}:{d}".encode()).hexdigest()[:6], 16
                    )
                    / 16**6
                    for q, d in zip(pdf[q_col], pdf[d_col])
                ]
            yield pdf

    return pairs.mapInPandas(run, schema=f"{in_schema}, ce_score double")


class RemoteBatchEmbedder:
    """Remote embedding-service client — the full production shape of
    the reference's AzureOpenAIEmbeddingSkill seam
    (commercial_rfp_indexer.py:177-191), minus only the network:

    - **injectable transport** (same pattern as the REST data source's
      injectable session): ``transport(texts: list[str]) ->
      list[list[float]]`` — an HTTP client, an SDK call, or a local
      model wrap here; nothing else in the engine changes;
    - **one call per Arrow batch** — request batching falls out of
      ``mapInPandas`` chunking (tune
      ``spark.sql.execution.arrow.maxRecordsPerBatch`` to the
      service's batch limit);
    - **bounded retries** with an injectable ``on_retry(attempt,
      err)`` hook (backoff/telemetry), then fail the TASK — Spark's
      task retry then re-runs the batch, which is safe because
      embedding is pure;
    - **strict response validation**: row count and dimension checked
      per batch, so a truncated/reordered service response fails loudly
      instead of mis-assigning vectors.

    Executors must be able to construct the transport, so pass a
    top-level callable or a picklable closure (no open sockets)."""

    def __init__(self, transport, dim: int = DEFAULT_DIM, max_retries: int = 2, on_retry=None):
        self.transport = transport
        self.dim = dim
        self.max_retries = max_retries
        self.on_retry = on_retry

    def embed(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        transport = self.transport
        dim = self.dim
        max_retries = self.max_retries
        on_retry = self.on_retry

        def call_with_retry(texts):
            last = None
            for attempt in range(max_retries + 1):
                try:
                    vecs = transport(texts)
                except Exception as e:  # transient service failure
                    last = e
                    if on_retry is not None:
                        on_retry(attempt, e)
                    continue
                if len(vecs) != len(texts):
                    raise ValueError(
                        f"embedding service returned {len(vecs)} vectors "
                        f"for {len(texts)} texts"
                    )
                bad = [i for i, v in enumerate(vecs) if len(v) != dim]
                if bad:
                    raise ValueError(
                        f"embedding dim mismatch at rows {bad[:3]}: "
                        f"expected {dim}"
                    )
                return vecs
            raise RuntimeError(
                f"embedding service failed after {max_retries + 1} attempts"
            ) from last

        def run(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                vecs = call_with_retry(pdf[text_col].tolist())
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "embedding": [
                            [float(x) for x in v] for v in vecs
                        ],
                    }
                )

        return df.mapInPandas(
            run, schema=f"{id_col} string, embedding array<double>"
        )
