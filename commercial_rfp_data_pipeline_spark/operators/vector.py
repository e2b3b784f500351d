"""Vector similarity search (SURVEY.md §2.11, §4.3).

The reference declares an HNSW index (m=4, ef_construction=400,
ef_search=500, cosine) with an exhaustive-KNN fallback profile inside
Azure AI Search (commercial_rfp_indexer.py:95-137). Spark-first
re-expression:

- **exact top-k** (the correctness oracle, = myExhaustiveKnnProfile):
  broadcast the query vectors, cosine via native array expressions
  (F.zip_with dot product — codegen'd, no Python), per-query window
  top-k. Cost O(n_vectors x n_queries x dim) but perfectly
  data-parallel: the corpus never shuffles, only the (tiny) per-query
  top-k heaps do.
- **LSH-bucketed ANN** (the scale path): sign-random-projection
  hyperplane LSH — h bits from deterministic pseudo-random hyperplanes;
  candidates = bucket collisions, then exact re-rank within bucket.
  Equivalent role to HNSW's candidate pool; ef_search maps to the
  number of probed buckets/bits.
- **IVF variant**: coarse k-means-style centroids (deterministically
  seeded sample), assign each vector to nearest centroid (broadcast),
  probe nprobe centroids per query.

Deterministic everywhere: ties order by (similarity DESC, id) in both
engine and oracle (SURVEY.md §7 hard part 5); similarity rounded to 6
decimals to pin float formatting across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_exact(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k per query (O5). Queries broadcast; corpus
    stays put. Output (q_id, vec_id, sim, rnk) with deterministic
    (sim DESC, vec_id) ranking, sim rounded to 6 dp."""
    j = vectors.crossJoin(F.broadcast(queries))
    j = j.filter(F.col(id_col) != F.col(q_id_col))
    sim = F.round(cosine(F.col(vec_col), F.col(q_vec_col)), 6)
    w = Window.partitionBy(q_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        j.select(F.col(q_id_col), F.col(id_col), sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold.
    All-pairs form is the oracle; at scale, run it per LSH bucket
    (lsh_buckets below) so the quadratic term is bounded per bucket."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    sim = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return pairs.select("id_a", "id_b", sim.alias("sim")).filter(
        F.col("sim") >= threshold
    )


def _hyperplane(dim: int, bit: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j of
    plane b = sin(1 + (b * dim + j) * 0.7391) — fixed, engine-agnostic,
    reproducible in SQL. (Quality is adequate for bucketing; production
    would draw Gaussian planes from a seeded RNG.)"""
    import math

    return [math.sin(1 + (bit * dim + j) * 0.7391) for j in range(dim)]


def lsh_buckets(
    vectors: DataFrame,
    dim: int,
    n_bits: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection LSH: bucket = concat of sign bits of
    <v, plane_b>. Cosine-similar vectors collide with probability
    1 - theta/pi per bit. Narrow map; bucket id is a short string."""
    bits = []
    for b in range(n_bits):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, b)])
        bits.append(F.when(_dot(F.col(vec_col), plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return vectors.withColumn("bucket", F.concat(*bits))


def knn_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """ANN top-k: probe only the query's bucket, exact re-rank inside.
    Recall < 1 by construction (rows-only check; exact path is the
    oracle). Scale: candidate set per query = one bucket ~ n/2^bits."""
    vb = lsh_buckets(vectors, dim, n_bits, vec_col)
    qb = lsh_buckets(
        queries.withColumnRenamed(q_vec_col, vec_col), dim, n_bits, vec_col
    ).withColumnRenamed(vec_col, q_vec_col)
    j = vb.join(F.broadcast(qb), "bucket").filter(F.col(id_col) != F.col(q_id_col))
    sim = F.round(cosine(F.col(vec_col), F.col(q_vec_col)), 6)
    w = Window.partitionBy(q_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        j.select(F.col(q_id_col), F.col(id_col), sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def ivf_assign(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: centroids = the vectors whose id % step
    == 0 (deterministic 'sample' standing in for k-means — the Spark
    plumbing is identical); each vector joins its nearest centroid by
    cosine. Broadcast centroids; one narrow pass."""
    cents = vectors.filter(F.col(id_col) % (256 // n_centroids) == 0).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
    )
    j = vectors.crossJoin(F.broadcast(cents))
    sim = cosine(F.col(vec_col), F.col("cent_vec"))
    scored = j.select(id_col, vec_col, "cent_id", F.round(sim, 6).alias("cent_sim"))
    w = Window.partitionBy(id_col).orderBy(F.col("cent_sim").desc(), F.col("cent_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
