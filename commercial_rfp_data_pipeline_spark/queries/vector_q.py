"""Vector-similarity queries over ``embeddings`` (vec_id,
embedding float[64], label) — the reference's search surface (O5,
indexer:95-137) plus the LLM-pipeline ANN extensions.

Precision discipline: both engines cast float32 vectors to double
before the cosine kernel and round similarities to 6 dp, so values
hash-match. The exact path is the oracle (= the reference's
myExhaustiveKnnProfile); LSH/IVF are the scale paths.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table, pin
from commercial_rfp_data_pipeline_spark.operators.vector import (
    embedding_neardup_pairs,
    ivf_assign,
    ivf_search,
    knn_exact,
    knn_lsh,
    lsh_buckets,
)
from commercial_rfp_data_pipeline_spark.registry import query

DIM = 64
N_QUERIES = 5  # vec_id < 5 are the query vectors


def _vectors(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        "label",
    )


def _queries_df(spark, sf_dir):
    return (
        _vectors(spark, sf_dir)
        .filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )


@query(
    "knn_exact_cosine_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < {N_QUERIES}),
    sims AS (
      SELECT q.q_id, e.vec_id, round(list_cosine_similarity(e.v, q.q_vec), 6) AS sim
      FROM e JOIN q ON e.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, sim, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
      FROM sims
    ) WHERE rnk <= 5
    """,
)
def q_knn_exact(spark, sf_dir):
    """Exhaustive cosine top-5 for 5 query vectors — the correctness
    oracle for every ANN variant. Corpus never shuffles; queries
    broadcast."""
    out = knn_exact(_vectors(spark, sf_dir), _queries_df(spark, sf_dir), k=5)
    return out.select("q_id", "vec_id", "sim", F.col("rnk").cast("int").alias("rnk"))


@query(
    "embedding_neardup_pairs",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.35
    """,
)
def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (threshold 0.35 — the synthetic
    vectors are near-orthogonal, max pairwise sim ~0.48). All-pairs form
    IS the oracle; the LSH-bucketed variant below is the scale path."""
    v = _vectors(spark, sf_dir).select("vec_id", "embedding")
    return embedding_neardup_pairs(v, threshold=0.35)


_LSH_NEARDUP_ORACLE = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {buckets},
    eb AS (SELECT e.vec_id, e.v, b.tbl, b.bucket FROM e JOIN buckets b USING (vec_id))
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS sim
    FROM eb a JOIN eb b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.35
"""


def _q_embedding_neardup_lsh(spark, sf_dir):
    """Scale path for near-dup: candidates restricted to bucket-mates
    in ANY of 4 independent 4-bit LSH tables, exact per-bucket matmul
    scoring, pair-keyed dedup. Deterministic bucketing keeps even the
    approximate path hash-checked; pair recall vs the exact all-pairs
    variant is 1-(1-p^4)^4 (tests pin it)."""
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        embedding_neardup_pairs_lsh,
    )

    v = _vectors(spark, sf_dir).select("vec_id", "embedding")
    return embedding_neardup_pairs_lsh(v, dim=DIM, threshold=0.35, n_bits=4, n_tables=4)


def _planes_sql(n_bits: int) -> str:
    """Emit operators.vector._hyperplane's Gaussian plane constants as
    SQL list literals — the SAME driver-side values the Spark plan
    embeds, so oracle parity is by construction."""
    from commercial_rfp_data_pipeline_spark.operators.vector import _hyperplane

    planes = []
    for b in range(n_bits):
        comps = ", ".join(f"{x!r}" for x in _hyperplane(DIM, b))
        planes.append(f"[{comps}]")
    return ", ".join(planes)


def _multi_buckets_cte(n_bits: int, n_tables: int) -> str:
    """Multi-table LSH bucket CTE: plane idx // n_bits is the table,
    string_agg ordered by idx concatenates that table's bits."""
    n_planes = n_bits * n_tables
    return f"""
planes AS (SELECT unnest([{_planes_sql(n_planes)}]) AS plane,
                  unnest(generate_series(0, {n_planes - 1})) AS idx),
buckets AS (
  SELECT vec_id, idx // {n_bits} AS tbl,
         string_agg(CASE WHEN list_dot_product(v, plane) >= 0
                         THEN '1' ELSE '0' END, '' ORDER BY idx) AS bucket
  FROM e CROSS JOIN planes GROUP BY vec_id, idx // {n_bits}
)
"""


_BUCKETS_CTE = _multi_buckets_cte(4, 4)


@query(
    "ann_lsh_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {_multi_buckets_cte(4, 6).strip()},
    eb AS (SELECT e.vec_id, e.v, b.tbl, b.bucket FROM e JOIN buckets b USING (vec_id)),
    q AS (SELECT vec_id AS q_id, tbl, bucket FROM eb WHERE vec_id < {N_QUERIES}),
    qv AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < {N_QUERIES}),
    cand AS (
      SELECT DISTINCT q.q_id, eb.vec_id
      FROM eb JOIN q ON eb.tbl = q.tbl AND eb.bucket = q.bucket AND eb.vec_id <> q.q_id
    ),
    sims AS (
      SELECT c.q_id, c.vec_id, round(list_cosine_similarity(e.v, qv.q_vec), 6) AS sim
      FROM cand c JOIN e ON e.vec_id = c.vec_id JOIN qv ON qv.q_id = c.q_id
    )
    SELECT q_id, vec_id, sim, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
      FROM sims
    ) WHERE rnk <= 5
    """,
)
def q_ann_lsh(spark, sf_dir):
    """Multi-table sign-random-projection LSH ANN top-5 (6 tables x 4
    Gaussian bits; candidates = collision in any table). The planes are
    deterministic and reproduced as SQL literals, so — unusually for an
    ANN path — the WHOLE pipeline (bucketing, candidate probe, dedup,
    re-rank) is oracle-checked; recall vs knn_exact_cosine_topk is
    pinned in tests as 1-(1-p^bits)^tables, not noise."""
    out = knn_lsh(
        _vectors(spark, sf_dir),
        _queries_df(spark, sf_dir),
        dim=DIM,
        k=5,
        n_bits=4,
        n_tables=6,
    )
    return out.select("q_id", "vec_id", "sim", F.col("rnk").cast("int").alias("rnk"))


@query(
    "lsh_bucket_histogram",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    planes AS (SELECT unnest([{_planes_sql(6)}]) AS plane,
                      unnest(generate_series(0, 5)) AS bit),
    bits AS (
      SELECT e.vec_id, p.bit,
             CASE WHEN list_dot_product(e.v, p.plane) >= 0 THEN '1' ELSE '0' END AS b
      FROM e CROSS JOIN planes p
    ),
    buckets AS (
      SELECT vec_id, string_agg(b, '' ORDER BY bit) AS bucket FROM bits GROUP BY vec_id
    )
    SELECT bucket, count(*) AS n FROM buckets GROUP BY bucket
    """,
)
def q_lsh_histogram(spark, sf_dir):
    """Bucket occupancy of the LSH index — oracle-checks the bucketing
    itself (the deterministic hyperplanes reproduce in SQL), so the
    rows-only ANN path sits on a verified foundation."""
    v = _vectors(spark, sf_dir).select("vec_id", "embedding")
    return (
        lsh_buckets(v, dim=DIM, n_bits=6)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _kmeans_cte(n_iters: int = 2, n_cents: int = 16) -> tuple[str, str]:
    """Mirror operators.vector.ivf_centroids' deterministic Lloyd
    rounds as CTEs: hash-sample init, then per round nearest-centroid
    assignment (rounded cosine, (sim DESC, cent_id) tiebreak) and
    per-component member means rounded to 6 dp, empty clusters falling
    back to their init vector. Returns (cte_sql, final_cents_name)."""
    parts = [
        f"""cents0 AS (SELECT vec_id AS cent_id, v AS cent_vec FROM e
              ORDER BY md5('ivf' || CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_cents})"""
    ]
    prev = "cents0"
    for i in range(1, n_iters + 1):
        parts.append(
            f"""assign{i} AS (
      SELECT vec_id, v, cent_id FROM (
        SELECT e.vec_id, e.v, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(e.v, c.cent_vec), 6) DESC, c.cent_id) AS rn
        FROM e CROSS JOIN {prev} c
      ) WHERE rn = 1
    ),
    means{i} AS (
      SELECT cent_id, i.i AS idx, round(avg(v[i.i]), 6) AS m
      FROM assign{i}, (SELECT unnest(generate_series(1, {DIM})) AS i) i
      GROUP BY cent_id, i.i
    ),
    agg{i} AS (SELECT cent_id, array_agg(m ORDER BY idx) AS cent_vec FROM means{i} GROUP BY cent_id),
    cents{i} AS (
      SELECT c0.cent_id, coalesce(a.cent_vec, c0.cent_vec) AS cent_vec
      FROM cents0 c0 LEFT JOIN agg{i} a USING (cent_id)
    )"""
        )
        prev = f"cents{i}"
    return ",\n    ".join(parts), prev


_KMEANS_SQL, _KM_FINAL = _kmeans_cte(2, 16)


@query(
    "ivf_coarse_assignment",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {_KMEANS_SQL},
    sims AS (
      SELECT e.vec_id, c.cent_id,
             round(list_cosine_similarity(e.v, c.cent_vec), 6) AS cent_sim
      FROM e CROSS JOIN {_KM_FINAL} c
    )
    SELECT vec_id, cent_id, cent_sim FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cent_sim DESC, cent_id) AS rn
      FROM sims
    ) WHERE rn = 1
    """,
)
def q_ivf_assign(spark, sf_dir):
    """IVF coarse quantization: nearest-centroid assignment (broadcast
    centroids, narrow pass) against TRAINED centroids — deterministic
    Lloyd k-means (seeded init + 2 rounds), every round of which the
    oracle re-states in SQL. The assign -> partition-by-list plumbing
    is the 100-TB layout primitive.

    Round 11 (VERDICT r10 #5): serves from the SAME durable trained
    quantizer + cell layout (`ensure_ivf_models`) the other three IVF
    queries already read — this query alone was re-running the full
    Lloyd training per invocation; the asg table stores exactly its
    output columns. Warm vs inline cost is measurable under the
    SPARK_GRAFT_ARTIFACTS contract; the oracle still states the full
    training unroll."""
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_ivf_models,
    )

    _cents, asg = ensure_ivf_models(spark, sf_dir)
    return asg.select("vec_id", "cent_id", "cent_sim")


@query(
    "ivf_topk_search",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {_KMEANS_SQL},
    assigned AS (
      SELECT vec_id, v, cent_id FROM (
        SELECT e.vec_id, e.v, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(e.v, c.cent_vec), 6) DESC, c.cent_id) AS rn
        FROM e CROSS JOIN {_KM_FINAL} c
      ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < {N_QUERIES}),
    probes AS (
      SELECT q_id, q_vec, cent_id FROM (
        SELECT q.q_id, q.q_vec, c.cent_id,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY round(list_cosine_similarity(q.q_vec, c.cent_vec), 6) DESC, c.cent_id) AS rn
        FROM q CROSS JOIN {_KM_FINAL} c
      ) WHERE rn <= 2
    ),
    sims AS (
      SELECT p.q_id, a.vec_id, round(list_cosine_similarity(a.v, p.q_vec), 6) AS sim
      FROM assigned a JOIN probes p ON a.cent_id = p.cent_id AND a.vec_id <> p.q_id
    )
    SELECT q_id, vec_id, sim, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
      FROM sims
    ) WHERE rnk <= 5
    """,
)
def q_ivf_search(spark, sf_dir):
    """Full IVF ANN over TRAINED (Lloyd k-means) centroids: corpus in
    nearest-centroid cells, queries probe their 2 nearest cells, exact
    rank within. Deterministic end to end — init, both Lloyd rounds,
    assignment, probing, ranking — so unlike most ANN implementations
    the whole path is oracle-checked; recall loss vs
    knn_exact_cosine_topk is a measured property of nprobe, not noise
    (tests pin it). The trained centroids + cell layout serve from the
    durable `ensure_ivf_models` artifact (round 10) — the index a
    production ANN service maintains; the oracle states the full Lloyd
    unroll, so green verify proves artifact == inline."""
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_ivf_models,
    )

    cents, asg = ensure_ivf_models(spark, sf_dir)
    out = ivf_search(
        None,
        _queries_df(spark, sf_dir),
        nprobe=2,
        k=5,
        cents=cents,
        assigned=asg.select("vec_id", "embedding", "cent_id", "_n"),
    )
    return out.select("q_id", "vec_id", "sim", F.col("rnk").cast("int").alias("rnk"))


@query(
    "label_centroid_similarity",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    byidx AS (
      SELECT label, i.i AS idx, avg(v[i.i]) AS comp
      FROM e, (SELECT unnest(generate_series(1, 64)) AS i) i
      GROUP BY label, i.i
    ),
    cents AS (SELECT label, array_agg(comp ORDER BY idx) AS cent FROM byidx GROUP BY label),
    scored AS (
      SELECT e.vec_id, e.label,
             round(list_cosine_similarity(e.v, c.cent), 6) AS sim_to_own
      FROM e JOIN cents c ON e.label = c.label
    )
    SELECT label, count(*) AS n, round(avg(sim_to_own), 6) AS avg_sim
    FROM scored GROUP BY label
    """,
)
def q_label_centroid(spark, sf_dir):
    """Per-label mean vector + mean member-to-centroid cosine — the
    aggregate-over-arrays primitive (posexplode -> avg per index ->
    re-assemble) used for cluster QC at scale."""
    e = _vectors(spark, sf_dir)
    exploded = e.select("vec_id", "label", F.posexplode("embedding").alias("idx", "x"))
    cents = (
        exploded.groupBy("label", "idx")
        .agg(F.avg("x").alias("comp"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "comp"))),
                lambda s: s["comp"],
            ).alias("cent")
        )
    )
    from commercial_rfp_data_pipeline_spark.operators.vector import cosine

    scored = e.join(F.broadcast(cents), "label").select(
        "vec_id",
        "label",
        F.round(cosine(F.col("embedding"), F.col("cent")), 6).alias("sim_to_own"),
    )
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("sim_to_own"), 6).alias("avg_sim")
    )


# registered down here because the oracle reuses _BUCKETS_CTE
query(
    "embedding_neardup_lsh",
    _LSH_NEARDUP_ORACLE.format(buckets=_BUCKETS_CTE.strip()),
)(_q_embedding_neardup_lsh)


@query(
    "embedding_dedup_clusters",
    """
    WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.35
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT vec_id AS id, vec_id AS lbl FROM embeddings
      UNION
      SELECT e2.dst AS id, r.lbl FROM reach r JOIN edges e2 ON e2.src = r.id
    )
    SELECT id AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY id
    """,
)
def q_embedding_dedup_clusters(spark, sf_dir):
    """The MODALITY-AGNOSTIC half of the dedup chain: the same
    dup_clusters connected-components operator that consumes simhash
    pairs (dedup_survivors) here consumes EMBEDDING-cosine near-dup
    pairs — pair generation is pluggable (text fingerprints, vectors,
    LSH buckets), cluster formation is one shared primitive. Exact
    block-grid pairs feed the loop; the oracle is the all-pairs
    recursive closure."""
    from commercial_rfp_data_pipeline_spark.operators.dedup import dup_clusters

    v = _vectors(spark, sf_dir).select("vec_id", "embedding")
    pairs = embedding_neardup_pairs(v, threshold=0.35)
    return dup_clusters(
        v.select("vec_id"), pairs, id_col="vec_id", a_col="id_a", b_col="id_b"
    )


@query(
    "embedding_int8_quantize",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (
      SELECT vec_id, v,
             CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END AS scale
      FROM (SELECT vec_id, v,
                   list_max(list_transform(v, x -> abs(x))) AS m
            FROM e)
    )
    SELECT vec_id,
           round(scale, 9) AS scale,
           list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INTEGER)) AS qvec,
           CAST(len(v) AS INTEGER) AS n_dims
    FROM s
    """,
)
def q_quantize_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization of the embedding corpus —
    the 4x index-memory cut before ANN serving; exact arithmetic, fully
    value-checked (scale + every quantized component)."""
    from commercial_rfp_data_pipeline_spark.operators.vector import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings")
    return quantize_int8(emb)


@query(
    "semdedup_prune",
    f"""
    WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {_KMEANS_SQL},
    simsq AS (
      SELECT e.vec_id, c.cent_id,
             round(list_cosine_similarity(e.v, c.cent_vec), 6) AS cent_sim
      FROM e CROSS JOIN {_KM_FINAL} c
    ),
    asg AS (
      SELECT vec_id, cent_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY cent_sim DESC, cent_id) AS rn
        FROM simsq
      ) WHERE rn = 1
    ),
    pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM asg a
      JOIN asg b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
      WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.95
    ),
    edges AS (
      SELECT va AS src, vb AS dst FROM pairs
      UNION ALL
      SELECT vb AS src, va AS dst FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT vec_id AS id, vec_id AS lbl FROM e
      UNION
      SELECT g.dst AS id, r.lbl FROM reach r JOIN edges g ON g.src = r.id
    ),
    clusters AS (SELECT id AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY id)
    SELECT c.vec_id, a.cent_id, c.cluster_id,
           (c.cluster_id = c.vec_id) AS keep
    FROM clusters c JOIN asg a USING (vec_id)
    """,
)
def q_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): semantic dedup scoped to k-means
    cells — embeddings cluster to IVF centroids, cosine near-dup pairs
    form ONLY within a cell, connected components over those pairs,
    keep one representative (min vec_id) per component.

    Scale shape — this is why SemDeDup beats corpus-wide near-dup at
    100 TB: the pair join is cell-local (each side partitioned by
    cent_id, fanout bounded by cell occupancy, never corpus x corpus);
    clustering reuses the shared CC operator (edge-subgraph iteration);
    the final keep flag is a projection, not another shuffle."""
    from commercial_rfp_data_pipeline_spark.operators.dedup import dup_clusters
    from commercial_rfp_data_pipeline_spark.operators.vector import cosine
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_ivf_models,
    )

    v = _vectors(spark, sf_dir).select("vec_id", "embedding")
    # round 10: the k-means assignment serves from the durable
    # `ensure_ivf_models` cell layout (already a materialized parquet
    # table, so the CC loop's per-round actions re-read it instead of
    # re-planning the Lloyd prefix); oracle unchanged — green verify
    # proves artifact == inline
    _, asg_full = ensure_ivf_models(spark, sf_dir)
    asg = asg_full.select("vec_id", "embedding", "cent_id")
    a = asg.select(
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        "cent_id",
    )
    b = asg.select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        "cent_id",
    )
    pairs = (
        a.join(b, ["cent_id"])
        .filter(F.col("va") < F.col("vb"))
        .filter(F.round(cosine(F.col("ea"), F.col("eb")), 6) >= 0.95)
        .select("va", "vb")
    )
    clusters = dup_clusters(
        v.select("vec_id"), pairs, id_col="vec_id", a_col="va", b_col="vb"
    )
    return clusters.join(asg.select("vec_id", "cent_id"), "vec_id").select(
        "vec_id",
        "cent_id",
        "cluster_id",
        (F.col("cluster_id") == F.col("vec_id")).alias("keep"),
    )


_RESCORE_QIDS = (0, 1, 2)
_SHORTLIST = 50


@query(
    "int8_shortlist_rescore_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (
      SELECT vec_id, v,
             CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END AS scale
      FROM (SELECT vec_id, v,
                   list_max(list_transform(v, x -> abs(x))) AS m FROM e)
    ),
    q8 AS (
      SELECT vec_id,
             list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qv
      FROM s
    ),
    qry AS (SELECT vec_id AS q_id, qv AS qq FROM q8
            WHERE vec_id IN {_RESCORE_QIDS!r}),
    coarse AS (
      SELECT qry.q_id, c.vec_id,
             round(list_dot_product(c.qv, qry.qq)
                   / (sqrt(list_dot_product(c.qv, c.qv))
                      * sqrt(list_dot_product(qry.qq, qry.qq))), 6) AS sim8
      FROM q8 c, qry
      WHERE c.vec_id <> qry.q_id
        AND list_dot_product(c.qv, c.qv) > 0
    ),
    short AS (
      SELECT q_id, vec_id, sim8 FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                  ORDER BY sim8 DESC, vec_id) AS rn8
        FROM coarse
      ) WHERE rn8 <= {_SHORTLIST}
    ),
    exact AS (
      SELECT sh.q_id, sh.vec_id, sh.sim8,
             round(list_dot_product(ce.v, qe.v)
                   / (sqrt(list_dot_product(ce.v, ce.v))
                      * sqrt(list_dot_product(qe.v, qe.v))), 6) AS sim
      FROM short sh
      JOIN e ce ON ce.vec_id = sh.vec_id
      JOIN e qe ON qe.vec_id = sh.q_id
    )
    SELECT q_id, vec_id, sim8, sim, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                ORDER BY sim DESC, vec_id) AS rnk
      FROM exact
    ) WHERE rnk <= 5
    """,
)
def q_int8_rescore(spark, sf_dir):
    """The standard memory-optimized ANN SERVING pattern: a cheap
    int8 shortlist (quantized dot products — the scales cancel in the
    cosine, so the whole coarse stage runs on the 4x-smaller index)
    followed by exact float rescoring of only the top-{_SHORTLIST}
    candidates per query, final top-5 by exact cosine. Quantization is
    exact arithmetic, so the WHOLE two-stage path is value-checked —
    shortlist membership, both scores, and the rescored order.

    Scale: the coarse stage broadcasts the 3 quantized queries against
    the quantized corpus (narrow scan of the int8 index; at 10^10
    vectors this is the stage that must fit in memory, which is the
    point of int8); the rescore joins the 50-row-per-query shortlist
    back to the FLOAT corpus by id — a tiny fraction of the corpus is
    ever read at full precision."""
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        _dot,
        quantize_int8,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q8 = pin(
        quantize_int8(emb).select(
            "vec_id",
            F.transform("qvec", lambda x: x.cast("long")).alias("qv"),
        )
    )
    qry = q8.filter(F.col("vec_id").isin(*_RESCORE_QIDS)).select(
        F.col("vec_id").alias("q_id"), F.col("qv").alias("qq")
    )
    dot8 = _dot(F.col("qv"), F.col("qq"))
    self8 = _dot(F.col("qv"), F.col("qv"))
    qself8 = _dot(F.col("qq"), F.col("qq"))
    coarse = (
        q8.crossJoin(F.broadcast(qry))
        .filter((F.col("vec_id") != F.col("q_id")) & (self8 > 0))
        .select(
            "q_id",
            "vec_id",
            F.round(
                dot8 / (F.sqrt(self8) * F.sqrt(qself8)), 6
            ).alias("sim8"),
        )
    )
    w8 = Window.partitionBy("q_id").orderBy(F.col("sim8").desc(), "vec_id")
    short = (
        coarse.withColumn("rn8", F.row_number().over(w8))
        .filter(F.col("rn8") <= _SHORTLIST)
        .select("q_id", "vec_id", "sim8")
    )
    ev = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    exact = (
        short.join(ev, "vec_id")
        .join(
            F.broadcast(
                ev.select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv_f"))
            ),
            "q_id",
        )
        .select(
            "q_id",
            "vec_id",
            "sim8",
            F.round(
                _dot(F.col("v"), F.col("qv_f"))
                / (
                    F.sqrt(_dot(F.col("v"), F.col("v")))
                    * F.sqrt(_dot(F.col("qv_f"), F.col("qv_f")))
                ),
                6,
            ).alias("sim"),
        )
    )
    wr = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), "vec_id")
    return (
        exact.withColumn("rnk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rnk") <= 5)
        .select("q_id", "vec_id", "sim8", "sim", "rnk")
    )


@query(
    "binary_hamming_rescore_topk",
    f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    qry AS (SELECT vec_id AS q_id, v AS qv FROM e
            WHERE vec_id IN {_RESCORE_QIDS!r}),
    coarse AS (
      SELECT qry.q_id, e.vec_id,
             CAST(len(list_filter(generate_series(1, len(e.v)),
                  i -> (e.v[i] > 0) <> (qry.qv[i] > 0))) AS INTEGER) AS hamming
      FROM e, qry WHERE e.vec_id <> qry.q_id
    ),
    short AS (
      SELECT q_id, vec_id, hamming FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                  ORDER BY hamming, vec_id) AS rnh
        FROM coarse
      ) WHERE rnh <= {_SHORTLIST}
    ),
    exact AS (
      SELECT sh.q_id, sh.vec_id, sh.hamming,
             round(list_dot_product(ce.v, qe.v)
                   / (sqrt(list_dot_product(ce.v, ce.v))
                      * sqrt(list_dot_product(qe.v, qe.v))), 6) AS sim
      FROM short sh
      JOIN e ce ON ce.vec_id = sh.vec_id
      JOIN e qe ON qe.vec_id = sh.q_id
    )
    SELECT q_id, vec_id, hamming, sim, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                ORDER BY sim DESC, vec_id) AS rnk
      FROM exact
    ) WHERE rnk <= 5
    """,
)
def q_binary_hamming_rescore(spark, sf_dir):
    """The 32x-compressed tier of the quantized ANN serving family
    (int8_shortlist_rescore_topk is the 4x tier): sign bits packed into
    64-bit words, coarse shortlist by Hamming distance — ONE
    bit_count(xor) integer op per 64 dims against the bit index that
    fits in RAM at 10^10 vectors — then exact float rescore of only the
    top-{_SHORTLIST} candidates per query, final top-5 by true cosine.
    Packing is pure bitwise so the whole path is exact arithmetic: the
    oracle states the identical Hamming counts as sign-mismatch counts
    over the unpacked floats, and shortlist membership, distances, and
    rescored order all value-check.

    Scale: the bit index is built once (narrow map) and pinned; the
    coarse stage broadcasts the 3 query bit-vectors against it; the
    rescore touches {_SHORTLIST} float rows per query by id — the float
    corpus is never scanned at serving time."""
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        _dot,
        hamming_distance,
        quantize_binary,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    ).filter(_dot(F.col("v"), F.col("v")) > 0)
    packed = pin(quantize_binary(ev, vec_col="v"))
    qry = packed.filter(F.col("vec_id").isin(*_RESCORE_QIDS)).select(
        F.col("vec_id").alias("q_id"), F.col("bits").alias("qbits")
    )
    coarse = (
        packed.crossJoin(F.broadcast(qry))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            hamming_distance(F.col("bits"), F.col("qbits")).alias("hamming"),
        )
    )
    wh = Window.partitionBy("q_id").orderBy("hamming", "vec_id")
    short = (
        coarse.withColumn("rnh", F.row_number().over(wh))
        .filter(F.col("rnh") <= _SHORTLIST)
        .select("q_id", "vec_id", "hamming")
    )
    exact = (
        short.join(ev, "vec_id")
        .join(
            F.broadcast(
                ev.select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv_f"))
            ),
            "q_id",
        )
        .select(
            "q_id",
            "vec_id",
            "hamming",
            F.round(
                _dot(F.col("v"), F.col("qv_f"))
                / (
                    F.sqrt(_dot(F.col("v"), F.col("v")))
                    * F.sqrt(_dot(F.col("qv_f"), F.col("qv_f")))
                ),
                6,
            ).alias("sim"),
        )
    )
    wr = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), "vec_id")
    return (
        exact.withColumn("rnk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rnk") <= 5)
        .select("q_id", "vec_id", "hamming", "sim", "rnk")
    )


def _pca_cte(n_iter: int = 3) -> str:
    """Unrolled power-iteration CTEs mirroring
    operators.vector.pca_top_component's rounded trajectory."""
    w0 = round(1.0 / DIM**0.5, 6)
    parts = [
        f"""ex AS (SELECT vec_id AS vid, i.i AS idx, v[i.i] AS x
           FROM e, (SELECT unnest(generate_series(1, {DIM})) AS i) i),
    mu AS (SELECT idx, round(avg(x), 6) AS mu FROM ex GROUP BY idx),
    xc AS (SELECT vid, ex.idx, x - mu AS xc
           FROM ex JOIN mu ON ex.idx = mu.idx),
    w0 AS (SELECT unnest(generate_series(1, {DIM})) AS idx, {w0!r} AS w)"""
    ]
    prev = "w0"
    for t in range(1, n_iter + 1):
        parts.append(
            f"""s{t} AS (SELECT vid, round(sum(xc * w), 6) AS s
           FROM xc JOIN {prev} USING (idx) GROUP BY vid),
    z{t} AS (SELECT idx, round(sum(xc * s), 6) AS z
           FROM xc JOIN s{t} USING (vid) GROUP BY idx),
    n{t} AS (SELECT sqrt(sum(z * z)) AS nz FROM z{t}),
    w{t} AS (SELECT idx, round(z / nz, 6) AS w FROM z{t} CROSS JOIN n{t})"""
        )
        prev = f"w{t}"
    parts.append(
        f"""sf AS (SELECT vid, round(sum(xc * w), 6) AS s
           FROM xc JOIN {prev} USING (idx) GROUP BY vid),
    ev AS (SELECT round(sum(s * s) / count(*), 4) AS eigenvalue FROM sf)"""
    )
    return ",\n    ".join(parts) + f"""
    SELECT idx, w AS loading, eigenvalue FROM {prev} CROSS JOIN ev"""


@query(
    "pca_top_component",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {_pca_cte(3)}
    """,
)
def q_pca_top_component(spark, sf_dir):
    """First principal component of the embedding corpus via
    covariance-free power iteration (3 rounds, deterministic start,
    6-dp rounded trajectory — the Lloyd convention). The oracle unrolls
    the identical rounds as CTEs, so loadings AND the Rayleigh
    eigenvalue are value-checked."""
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        pca_top_component,
    )

    e = _vectors(spark, sf_dir)
    return pca_top_component(e, dim=DIM, n_iter=3)


def _pq_sqdist_sql(a: str, b: str, sub: int = 16) -> str:
    """Inline exact-decimal squared-L2: per-component single-multiply
    terms rounded to 9 dp, summed as DECIMAL left-to-right — the same
    arithmetic operators.vector._sq_l2 performs, so distances (and
    therefore every argmin/top-k built on them) agree bit-for-bit."""
    terms = [
        f"CAST(round(({a}[{i}]-{b}[{i}])*({a}[{i}]-{b}[{i}]), 9) AS DECIMAL(20,9))"
        for i in range(1, sub + 1)
    ]
    return "(" + " + ".join(terms) + ")"


def _pq_cte(m_sub: int = 4, k_codes: int = 8, sub: int = 16) -> str:
    """PQ codebook training (1 Lloyd round), encoding, and the ADC
    lookup table as CTEs mirroring operators.vector.pq_* exactly:
    md5-hash-sample init per subspace, exact-decimal assignment with
    (d, code_id) tiebreak, 6-dp means, emptied codes keeping init."""
    d_sc = _pq_sqdist_sql("s.sv", "c.code_vec", sub)
    d_qc = _pq_sqdist_sql("q.qsv", "c.code_vec", sub)
    return f"""ms AS (SELECT unnest(generate_series(0, {m_sub - 1})) AS m),
    sv AS (SELECT vec_id, m, v[(m*{sub}+1):(m*{sub}+{sub})] AS sv FROM e CROSS JOIN ms),
    pqinit AS (
      SELECT m, CAST(rn - 1 AS INTEGER) AS code_id, sv AS code_vec FROM (
        SELECT m, vec_id, sv,
               row_number() OVER (PARTITION BY m
                 ORDER BY md5('pq' || CAST(m AS VARCHAR) || ':' || CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM sv
      ) WHERE rn <= {k_codes}
    ),
    pq_assign1 AS (
      SELECT m, code_id, sv FROM (
        SELECT s.vec_id, s.m, s.sv, c.code_id, {d_sc} AS d,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                 ORDER BY {d_sc}, c.code_id) AS rn
        FROM sv s JOIN pqinit c USING (m)
      ) WHERE rn = 1
    ),
    pq_means1 AS (
      SELECT m, code_id, i.i AS ci, round(avg(sv[i.i]), 6) AS mu
      FROM pq_assign1, (SELECT unnest(generate_series(1, {sub})) AS i) i
      GROUP BY m, code_id, i.i
    ),
    pq_agg1 AS (SELECT m, code_id, array_agg(mu ORDER BY ci) AS code_vec
             FROM pq_means1 GROUP BY m, code_id),
    books AS (
      SELECT i.m, i.code_id, coalesce(a.code_vec, i.code_vec) AS code_vec
      FROM pqinit i LEFT JOIN pq_agg1 a USING (m, code_id)
    ),
    codes AS (
      SELECT vec_id, m, code_id AS code FROM (
        SELECT s.vec_id, s.m, c.code_id, {d_sc} AS d,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                 ORDER BY {d_sc}, c.code_id) AS rn
        FROM sv s JOIN books c USING (m)
      ) WHERE rn = 1
    ),
    qsv AS (SELECT vec_id AS q_id, m, sv AS qsv FROM sv WHERE vec_id IN (0, 1, 2)),
    lut AS (
      SELECT q.q_id, q.m, c.code_id AS code, {d_qc} AS d
      FROM qsv q JOIN books c USING (m)
    )"""


@query(
    "pq_adc_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {_pq_cte()},
    scored AS (
      SELECT l.q_id, c.vec_id, sum(l.d) AS adist_dec
      FROM codes c JOIN lut l ON l.m = c.m AND l.code = c.code
      GROUP BY l.q_id, c.vec_id
    )
    SELECT q_id, vec_id, CAST(adist_dec AS DOUBLE) AS adist,
           CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY adist_dec, vec_id) AS rnk FROM scored)
    WHERE rnk <= 5
    """,
)
def q_pq_adc(spark, sf_dir):
    """FAISS-style product quantization with asymmetric-distance
    search: 64-dim corpus vectors compress to 4 one-byte codes (a 32x
    memory shrink for the serving tier), queries stay full precision,
    and top-k ranks by the sum of per-subspace query->code-centroid
    lookups. Codebooks are 1 deterministic Lloyd round per subspace
    under exact-decimal squared-L2, so training, encoding, the lookup
    table, and the final ranking all value-hash against the oracle.
    Codebooks + codes serve from the durable `ensure_pq_models`
    artifact (round 10); the oracle states the full training."""
    from commercial_rfp_data_pipeline_spark.operators.vector import pq_adc_topk
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_pq_models,
    )

    v = _vectors(spark, sf_dir).select("vec_id", "embedding")
    books, codes = ensure_pq_models(spark, sf_dir)
    return pq_adc_topk(v, [0, 1, 2], dim=DIM, books=books, codes=codes)


_IDCG5 = (
    "(CAST(round(1.0/(ln(2)/ln(2)), 9) AS DECIMAL(20,9))"
    " + CAST(round(1.0/(ln(3)/ln(2)), 9) AS DECIMAL(20,9))"
    " + CAST(round(1.0/(ln(4)/ln(2)), 9) AS DECIMAL(20,9))"
    " + CAST(round(1.0/(ln(5)/ln(2)), 9) AS DECIMAL(20,9))"
    " + CAST(round(1.0/(ln(6)/ln(2)), 9) AS DECIMAL(20,9)))"
)


@query(
    "retrieval_eval_metrics",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {_multi_buckets_cte(4, 6).strip()},
    eb AS (SELECT e.vec_id, e.v, b.tbl, b.bucket FROM e JOIN buckets b USING (vec_id)),
    qb AS (SELECT vec_id AS q_id, tbl, bucket FROM eb WHERE vec_id < {N_QUERIES}),
    qv AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < {N_QUERIES}),
    cand AS (
      SELECT DISTINCT qb.q_id, eb.vec_id
      FROM eb JOIN qb ON eb.tbl = qb.tbl AND eb.bucket = qb.bucket
       AND eb.vec_id <> qb.q_id
    ),
    asims AS (
      SELECT c.q_id, c.vec_id, round(list_cosine_similarity(e.v, qv.q_vec), 6) AS sim
      FROM cand c JOIN e ON e.vec_id = c.vec_id JOIN qv ON qv.q_id = c.q_id
    ),
    ann AS (
      SELECT q_id, vec_id, rnk FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
        FROM asims
      ) WHERE rnk <= 5
    ),
    esims AS (
      SELECT q.q_id, e.vec_id, round(list_cosine_similarity(e.v, q.q_vec), 6) AS sim
      FROM e JOIN qv q ON e.vec_id <> q.q_id
    ),
    ex AS (
      SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
        FROM esims
      ) WHERE rnk <= 5
    ),
    hits AS (
      SELECT a.q_id, a.rnk FROM ann a
      JOIN ex x ON x.q_id = a.q_id AND x.vec_id = a.vec_id
    ),
    agg AS (
      SELECT q_id, count(*) AS n_hits, min(rnk) AS first_hit,
             sum(CAST(round(1.0/(ln(rnk + 1)/ln(2)), 9) AS DECIMAL(20,9))) AS dcg
      FROM hits GROUP BY q_id
    )
    SELECT qv.q_id,
           round(coalesce(a.n_hits, 0) / 5.0, 6) AS recall_at_5,
           round(coalesce(1.0 / a.first_hit, 0.0), 6) AS mrr,
           round(CAST(coalesce(a.dcg, CAST(0 AS DECIMAL(20,9))) AS DOUBLE)
                 / CAST({_IDCG5} AS DOUBLE), 6) AS ndcg_at_5
    FROM qv LEFT JOIN agg a USING (q_id)
    """,
)
def q_retrieval_eval(spark, sf_dir):
    """The evaluation half every ANN deployment needs: recall@5, MRR,
    and binary-relevance nDCG@5 of the LSH path against the exact
    top-5 ground truth, per query. Discount terms round to 9 dp and
    sum as DECIMAL (order-independent), so the metric table — not
    just the rankings — value-hash-checks. At 100 TB ground truth
    comes from a held-out query sample; the metric join itself is
    queries x k rows."""
    v = _vectors(spark, sf_dir)
    q = _queries_df(spark, sf_dir)
    exact = knn_exact(v, q, k=5).select("q_id", "vec_id")
    ann = knn_lsh(v, q, dim=DIM, k=5, n_bits=4, n_tables=6).select(
        "q_id", "vec_id", "rnk"
    )
    hits = ann.join(exact, ["q_id", "vec_id"])
    dcg_term = F.round(
        1.0 / (F.log(F.col("rnk") + 1) / F.log(F.lit(2.0))), 9
    ).cast("decimal(20,9)")
    agg = hits.groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("rnk").alias("first_hit"),
        F.sum(dcg_term).alias("dcg"),
    )
    import math
    from decimal import Decimal

    # exact-decimal sum of the 9-dp-rounded discounts, then one
    # float conversion — the same arithmetic as the oracle's
    # CAST(sum(DECIMAL) AS DOUBLE), so the constant is bit-identical
    idcg = float(
        sum(Decimal(str(round(1.0 / math.log2(i + 1), 9))) for i in range(1, 6))
    )
    return (
        q.select("q_id")
        .join(agg, "q_id", "left")
        .select(
            "q_id",
            F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / 5.0, 6).alias(
                "recall_at_5"
            ),
            F.round(
                F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0).cast("decimal(20,9)")).cast(
                    "double"
                )
                / F.lit(idcg),
                6,
            ).alias("ndcg_at_5"),
        )
    )


@query(
    "embedding_standardize",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    comp AS (
      SELECT vec_id, i.i AS idx, v[i.i] AS x
      FROM e, (SELECT unnest(generate_series(1, {DIM})) AS i) i
    ),
    stats AS (
      SELECT idx, round(avg(x), 6) AS mu,
             round(stddev_pop(x), 6) AS sd
      FROM comp GROUP BY idx
    ),
    z AS (
      SELECT c.vec_id, c.idx,
             round((c.x - s.mu) / CASE WHEN s.sd = 0 THEN 1 ELSE s.sd END, 6) AS z
      FROM comp c JOIN stats s USING (idx)
    )
    SELECT vec_id, array_agg(z ORDER BY idx) AS z_vec FROM z GROUP BY vec_id
    """,
)
def q_embedding_standardize(spark, sf_dir):
    """Per-dimension z-score standardization of the embedding corpus —
    the feature-scaling pass before distance-based ops when dimensions
    have uneven variance. One posexplode aggregation computes all 64
    (mu, sigma) pairs (map-side combine), the tiny stats table
    broadcasts back, zero-variance dims pass through unscaled.
    stddev_pop over doubles agrees across engines at 6 dp on this
    data; means/z-scores round identically."""
    v = _vectors(spark, sf_dir).select("vec_id", "embedding")
    comp = v.select("vec_id", F.posexplode("embedding").alias("idx0", "x"))
    comp = comp.select("vec_id", (F.col("idx0") + 1).alias("idx"), "x")
    stats = comp.groupBy("idx").agg(
        F.round(F.avg("x"), 6).alias("mu"),
        F.round(F.stddev_pop("x"), 6).alias("sd"),
    )
    z = comp.join(F.broadcast(stats), "idx").select(
        "vec_id",
        "idx",
        F.round(
            (F.col("x") - F.col("mu"))
            / F.when(F.col("sd") == 0, F.lit(1.0)).otherwise(F.col("sd")),
            6,
        ).alias("z"),
    )
    return z.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "z"))), lambda s: s["z"]
        ).alias("z_vec")
    )


def _kcenter_cte(k: int = 6) -> tuple[str, str]:
    """Unrolled greedy k-center rounds mirroring
    operators.vector.kcenter_coreset: md5-min seed, per round min
    exact-decimal squared-L2 to the selected set, argmax with
    (dist DESC, vec_id) tiebreak."""
    d = _pq_sqdist_sql("e.v", "s.v", DIM)
    parts = [
        """sel0 AS (
      SELECT 0 AS rnd, vec_id, v, CAST(NULL AS DOUBLE) AS md FROM (
        SELECT vec_id, v FROM e
        ORDER BY md5('core:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 1
      )
    )"""
    ]
    union = "SELECT rnd, vec_id, v, md FROM sel0"
    for i in range(1, k):
        parts.append(
            f"""mind{i} AS (
      SELECT e.vec_id, first(e.v) AS v, min({d}) AS mind
      FROM e CROSS JOIN ({union}) s GROUP BY e.vec_id
    ),
    sel{i} AS (
      SELECT {i} AS rnd, vec_id, v, CAST(mind AS DOUBLE) AS md
      FROM mind{i} ORDER BY mind DESC, vec_id LIMIT 1
    )"""
        )
        union += f" UNION ALL SELECT rnd, vec_id, v, md FROM sel{i}"
    return ",\n    ".join(parts), union


_KC_SQL, _KC_UNION = _kcenter_cte(6)


@query(
    "kcenter_coreset_selection",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {_KC_SQL}
    SELECT rnd AS sel_round, vec_id, md AS dist FROM ({_KC_UNION})
    """,
)
def q_kcenter(spark, sf_dir):
    """Greedy k-center coreset (Gonzalez farthest-point): 6 maximally
    spread vectors — the diverse-subset selection a training pipeline
    uses for representative sampling / hard-example mining. Each round
    is one corpus scan (min exact-decimal distance to the <= k
    broadcast-literal selected set) + TakeOrdered(1); the coverage
    radius sequence comes back with the ids and is non-increasing by
    construction."""
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        kcenter_coreset,
    )

    v = _vectors(spark, sf_dir).select("vec_id", "embedding")
    sel = kcenter_coreset(v, k=6)
    return spark.createDataFrame(
        [(r, i, d) for r, i, d in sel], "sel_round int, vec_id long, dist double"
    )


@query(
    "ivfpq_search_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {_KMEANS_SQL},
    assigned AS (
      SELECT vec_id, cent_id FROM (
        SELECT e.vec_id, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(e.v, c.cent_vec), 6) DESC, c.cent_id) AS rn
        FROM e CROSS JOIN {_KM_FINAL} c
      ) WHERE rn = 1
    ),
    qids AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id IN (0, 1, 2)),
    probes AS (
      SELECT q_id, cent_id FROM (
        SELECT q.q_id, c.cent_id,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY round(list_cosine_similarity(q.q_vec, c.cent_vec), 6) DESC, c.cent_id) AS rn
        FROM qids q CROSS JOIN {_KM_FINAL} c
      ) WHERE rn <= 2
    ),
    {_pq_cte()},
    cand AS (
      SELECT p.q_id, a.vec_id
      FROM assigned a JOIN probes p ON a.cent_id = p.cent_id
      WHERE a.vec_id <> p.q_id
    ),
    scored AS (
      SELECT c.q_id, c.vec_id, sum(l.d) AS adist_dec
      FROM cand c
      JOIN codes cd ON cd.vec_id = c.vec_id
      JOIN lut l ON l.q_id = c.q_id AND l.m = cd.m AND l.code = cd.code
      GROUP BY c.q_id, c.vec_id
    )
    SELECT q_id, vec_id, CAST(adist_dec AS DOUBLE) AS adist,
           CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY adist_dec, vec_id) AS rnk FROM scored)
    WHERE rnk <= 5
    """,
)
def q_ivfpq(spark, sf_dir):
    """The full FAISS IVF-PQ serving path, composed from the two
    trained halves: the Lloyd coarse quantizer prunes each query to
    its 2 nearest cells' members, and asymmetric PQ distance ranks
    ONLY those candidates via the broadcast lookup table — the scan
    touches nprobe/n_centroids of the corpus and reads 4 bytes per
    candidate instead of 256. Every stage (both trainings, both
    assignments, the probe, the ADC ranking) is deterministic, so the
    composed index is oracle-checked end to end. Both trained halves
    (coarse quantizer + cell layout, PQ codebooks + codes) serve from
    the durable `ensure_ivf_models` / `ensure_pq_models` artifacts
    (round 10); the oracle states both full trainings."""
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        _sq_l2,
        pq_subvectors,
    )
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_ivf_models,
        ensure_pq_models,
    )

    v = _vectors(spark, sf_dir).select("vec_id", "embedding")
    cents, asg_full = ensure_ivf_models(spark, sf_dir)
    cents = pin(cents, key="ivfpq_cents")
    asg = asg_full.select("vec_id", "cent_id")
    books, codes = ensure_pq_models(spark, sf_dir)
    books = pin(books, key="ivfpq_books")
    qv = v.filter(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    from pyspark.sql.functions import broadcast

    qn = qv.crossJoin(broadcast(cents))
    sim = F.round(
        F.aggregate(
            F.zip_with("q_vec", "cent_vec", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        / (
            F.sqrt(F.aggregate(F.transform("q_vec", lambda x: x * x), F.lit(0.0), lambda a, t: a + t))
            * F.sqrt(F.aggregate(F.transform("cent_vec", lambda x: x * x), F.lit(0.0), lambda a, t: a + t))
        ),
        6,
    )
    wprobe = Window.partitionBy("q_id").orderBy(
        F.col("_sim").desc(), F.col("cent_id")
    )
    probes = (
        qn.select("q_id", "cent_id", sim.alias("_sim"))
        .withColumn("rn", F.row_number().over(wprobe))
        .filter(F.col("rn") <= 2)
        .select("q_id", "cent_id")
    )
    qsv = pq_subvectors(
        v.filter(F.col("vec_id").isin([0, 1, 2])), DIM
    ).select(F.col("vec_id").alias("q_id"), "m", F.col("sv").alias("qsv"))
    lut = qsv.join(broadcast(books), "m").select(
        "q_id", "m", F.col("code_id").alias("code"),
        _sq_l2(F.col("qsv"), F.col("code_vec")).alias("d"),
    )
    cand = (
        asg.join(broadcast(probes), "cent_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
    )
    scored = (
        cand.join(codes, "vec_id")
        .join(broadcast(lut), ["q_id", "m", "code"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d").alias("adist_dec"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adist_dec"), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "q_id",
            "vec_id",
            F.col("adist_dec").cast("double").alias("adist"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


_CE_HEX = "0123456789abcdef"


def _ce_score_sql(q: str, d: str) -> str:
    """DuckDB restatement of the deterministic fake cross-encoder:
    int(md5('ce:q:d')[:6], 16) / 16^6, hex-decoded char by char."""
    h = f"md5('ce:' || CAST({q} AS VARCHAR) || ':' || CAST({d} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('{_CE_HEX}', substr({h}, {i + 1}, 1)) - 1) * {16 ** (5 - i)}"
        for i in range(6)
    )
    return f"(({terms}) / 16777216.0)"


@query(
    "crossencoder_rerank_topk",
    f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    qv AS (SELECT vec_id AS q_id, v AS q_vec FROM e
           WHERE vec_id IN {_RESCORE_QIDS!r}),
    sims AS (
      SELECT qv.q_id, e.vec_id,
             round(list_cosine_similarity(e.v, qv.q_vec), 6) AS sim
      FROM e JOIN qv ON e.vec_id <> qv.q_id
    ),
    short AS (
      SELECT q_id, vec_id, sim FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                  ORDER BY sim DESC, vec_id) AS rns
        FROM sims
      ) WHERE rns <= 20
    ),
    rescored AS (
      SELECT q_id, vec_id, sim,
             round({_ce_score_sql('q_id', 'vec_id')}, 6) AS ce_score,
             round(0.5 * sim + 0.5 * {_ce_score_sql('q_id', 'vec_id')}, 6)
               AS final_score
      FROM short
    )
    SELECT q_id, vec_id, sim, ce_score, final_score,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                ORDER BY final_score DESC, vec_id) AS rnk
      FROM rescored
    ) WHERE rnk <= 5
    """,
)
def q_crossencoder_rerank(spark, sf_dir):
    """Two-stage retrieval SERVING: bi-encoder shortlist (exact cosine
    top-20 per query — in production the ANN index) followed by a
    cross-encoder rerank of ONLY the shortlist through the mapInPandas
    model seam (operators/embedder.py:crossencoder_rerank), final
    ordering by the blended score. The standard retrieve-then-rerank
    architecture every production semantic-search stack runs; the
    deterministic fake scorer keeps the whole two-stage path
    value-checked (shortlist membership, both scores, final order).

    Scale: stage 1 is the ANN problem solved elsewhere (ivf/lsh/
    hamming tiers); stage 2 touches k·n_queries rows — the expensive
    model runs on 60 pairs here, never the corpus."""
    from commercial_rfp_data_pipeline_spark.operators.embedder import (
        crossencoder_rerank,
    )
    from commercial_rfp_data_pipeline_spark.operators.vector import _dot

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).filter(_dot(F.col("v"), F.col("v")) > 0)
    qv = ev.filter(F.col("vec_id").isin(*_RESCORE_QIDS)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    short = knn_exact(
        ev, qv, k=20, vec_col="v", q_vec_col="q_vec"
    ).select("q_id", "vec_id", "sim")
    ce = crossencoder_rerank(short)
    rescored = ce.select(
        "q_id",
        "vec_id",
        "sim",
        F.round("ce_score", 6).alias("ce_score"),
        F.round(0.5 * F.col("sim") + 0.5 * F.col("ce_score"), 6).alias(
            "final_score"
        ),
    )
    wr = Window.partitionBy("q_id").orderBy(
        F.col("final_score").desc(), "vec_id"
    )
    return (
        rescored.withColumn("rnk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rnk") <= 5)
        .select("q_id", "vec_id", "sim", "ce_score", "final_score", "rnk")
    )


@query(
    "matryoshka_truncation_eval",
    f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    pre AS (
      SELECT vec_id, v, v[1:16] AS v16 FROM e
      WHERE list_dot_product(v[1:16], v[1:16]) > 0
    ),
    qv AS (SELECT vec_id AS q_id, v AS qf, v16 AS q16 FROM pre
           WHERE vec_id IN {_RESCORE_QIDS!r}),
    full_rank AS (
      SELECT q_id, vec_id FROM (
        SELECT qv.q_id, p.vec_id,
               row_number() OVER (PARTITION BY qv.q_id
                 ORDER BY round(list_cosine_similarity(p.v, qv.qf), 6) DESC,
                          p.vec_id) AS rnk
        FROM pre p JOIN qv ON p.vec_id <> qv.q_id
      ) WHERE rnk <= 5
    ),
    trunc_rank AS (
      SELECT q_id, vec_id FROM (
        SELECT qv.q_id, p.vec_id,
               row_number() OVER (PARTITION BY qv.q_id
                 ORDER BY round(list_cosine_similarity(p.v16, qv.q16), 6) DESC,
                          p.vec_id) AS rnk
        FROM pre p JOIN qv ON p.vec_id <> qv.q_id
      ) WHERE rnk <= 5
    )
    SELECT f.q_id,
           CAST(count(t.vec_id) AS BIGINT) AS n_overlap,
           round(count(t.vec_id) / 5.0, 6) AS recall_at_5
    FROM full_rank f
    LEFT JOIN trunc_rank t ON t.q_id = f.q_id AND t.vec_id = f.vec_id
    GROUP BY f.q_id
    """,
)
def q_matryoshka_eval(spark, sf_dir):
    """Matryoshka-style truncation evaluation: rank with only the
    FIRST 16 of 64 dimensions and measure top-5 recall against the
    full-dimension ground truth per query — the measurement behind the
    serve-short/rescore-long memory trade (MRL-trained embedders pack
    meaning into prefixes; this quantifies what truncation costs on
    THIS corpus, which is the go/no-go number before shrinking the
    index 4x). Same evaluation harness family as minhash_band_eval and
    retrieval_eval_metrics: exact arithmetic, exact-integer overlap
    counts.

    Scale: both rankings broadcast 3 queries against the corpus; the
    truncated column is a narrow slice projection — at serving scale
    it IS the smaller index."""
    from commercial_rfp_data_pipeline_spark.operators.vector import _dot

    emb = load_table(spark, sf_dir, "embeddings")
    pre = (
        emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .withColumn("v16", F.slice("v", 1, 16))
        .filter(
            (_dot(F.col("v"), F.col("v")) > 0)
            & (_dot(F.col("v16"), F.col("v16")) > 0)
        )
    )
    qv = pre.filter(F.col("vec_id").isin(*_RESCORE_QIDS)).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qf"),
        F.col("v16").alias("q16"),
    )

    def topk(vec_col: str, q_col: str) -> "F.DataFrame":
        sim = F.round(
            _dot(F.col(vec_col), F.col(q_col))
            / (
                F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
                * F.sqrt(_dot(F.col(q_col), F.col(q_col)))
            ),
            6,
        )
        w = Window.partitionBy("q_id").orderBy(sim.desc(), "vec_id")
        return (
            pre.crossJoin(F.broadcast(qv))
            .filter(F.col("vec_id") != F.col("q_id"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5)
            .select("q_id", "vec_id")
        )

    full_rank = topk("v", "qf")
    trunc_rank = topk("v16", "q16").select(
        F.col("q_id").alias("t_q"), F.col("vec_id").alias("t_vec")
    )
    return (
        full_rank.join(
            trunc_rank,
            (F.col("q_id") == F.col("t_q"))
            & (F.col("vec_id") == F.col("t_vec")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.count(F.col("t_vec")).alias("n_overlap"),
            F.round(F.count(F.col("t_vec")) / 5.0, 6).alias("recall_at_5"),
        )
    )


# the reference declares HNSW M=4 (indexer:95-137); HNSW's ground
# layer keeps 2M links per node, so the flat single-layer graph uses
# m=8 edges. (ef=16, rounds=4) measures 0.88 recall@5 vs the exact
# oracle at sf0.01 — the (ef, rounds) trade tests pin.
_GRAPH_M = 8
_GRAPH_EF = 16
_GRAPH_ROUNDS = 4

_KNN_GRAPH_SQL = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ranked AS (
      SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
             round(list_cosine_similarity(a.v, b.v), 6) AS sim,
             row_number() OVER (PARTITION BY a.vec_id
               ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                        b.vec_id) AS rnk
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    )
    SELECT src_id, nbr_id, sim, CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= {_GRAPH_M}
"""


@query("knn_graph_edges", _KNN_GRAPH_SQL)
def q_knn_graph(spark, sf_dir):
    """Exact m-NN graph build (m=8 = 2M of the reference HNSW M=4,
    indexer:95-137): block-grid local top-m per cell, one global window
    for the final top-m per source. The oracle is the naive all-pairs
    rank; the engine never shuffles the n^2 similarity matrix. Serves
    from the durable `ensure_knn_graph8` artifact (round 10) — the
    persisted half of a navigable-graph index; green verify proves
    artifact == inline against the all-pairs oracle."""
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_knn_graph8,
    )

    return ensure_knn_graph8(spark, sf_dir)


def _beam_rounds_sql() -> str:
    """Unrolled beam-search CTE chain — one (expand, rescore, top-ef)
    block per round, mirroring graph_beam_search's driver loop."""
    blocks = []
    prev = "b0"
    for r in range(1, _GRAPH_ROUNDS + 1):
        blocks.append(f"""
    c{r} AS (
      SELECT q_id, vec_id FROM {prev}
      UNION
      SELECT b.q_id, g.nbr_id AS vec_id
      FROM {prev} b JOIN g ON g.src_id = b.vec_id
    ),
    b{r} AS (
      SELECT q_id, vec_id, sim FROM (
        SELECT c.q_id, c.vec_id,
               round(list_cosine_similarity(e.v, q.q_vec), 6) AS sim,
               row_number() OVER (PARTITION BY c.q_id
                 ORDER BY round(list_cosine_similarity(e.v, q.q_vec), 6) DESC,
                          c.vec_id) AS rn
        FROM c{r} c JOIN e ON e.vec_id = c.vec_id JOIN q ON q.q_id = c.q_id
      ) WHERE rn <= {_GRAPH_EF}
    )""")
        prev = f"b{r}"
    return ",".join(blocks)


_BEAM_SQL = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < {N_QUERIES}),
    g AS (
      SELECT src_id, nbr_id FROM (
        SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                          b.vec_id) AS rnk
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
      ) WHERE rnk <= {_GRAPH_M}
    ),
    b0 AS (SELECT q_id, (SELECT min(vec_id) FROM e) AS vec_id FROM q),
    {_beam_rounds_sql()}
    SELECT q_id, vec_id, sim, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT q_id, vec_id, sim,
             row_number() OVER (PARTITION BY q_id
               ORDER BY sim DESC, vec_id) AS rnk
      FROM b{_GRAPH_ROUNDS} WHERE vec_id <> q_id
    ) WHERE rnk <= 5
"""


@query("graph_ann_beam_topk", _BEAM_SQL)
def q_graph_ann_beam(spark, sf_dir):
    """HNSW-style serving: greedy beam search (ef=16, 4 rounds,
    min-id entry) over the exact m=8 NN graph, top-5 per query. Query
    cost is O(rounds x ef x m x dim) — independent of corpus size.
    Recall vs knn_exact_cosine_topk is a measured (ef, rounds)
    property, pinned by tests like the IVF nprobe trade; the oracle
    value-checks the deterministic algorithm itself."""
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        graph_beam_search,
    )
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_knn_graph8,
    )

    v = _vectors(spark, sf_dir).select("vec_id", "embedding")
    graph = pin(ensure_knn_graph8(spark, sf_dir), "knn_graph_for_beam")
    return graph_beam_search(
        v,
        graph,
        _queries_df(spark, sf_dir),
        k=5,
        ef=_GRAPH_EF,
        rounds=_GRAPH_ROUNDS,
    )


# hierarchical HNSW constants: level-1 promotion with p = 1/16 (the
# hash-coin analogue of HNSW's geometric level draw), 2 upper + 3 base
# expansion rounds, 4 entry points handed down per query. Measured
# recall@5 vs the exact oracle: 1.00 (sf0.01) / 0.72 (sf0.1) versus
# the flat 4-round beam's 0.88 / 0.36 — better recall with FEWER
# base-layer hops (3 vs 4) because the upper layer hands each query
# entry points already near the target instead of a fixed global node
_HNSW_MOD = 16
_HNSW_UPPER_ROUNDS = 2
_HNSW_BASE_ROUNDS = 3
_HNSW_ENTRY = 4

_HNSW_LAYER_SQL = (
    "('0x' || substring(md5('hnsw1:' || CAST(vec_id AS VARCHAR)), 1, 15))"
    f"::BIGINT % {_HNSW_MOD} = 0"
)


def _beam_rounds_sql_over(
    graph_cte: str, vec_cte: str, beam_prefix: str, rounds: int, ef: int
) -> str:
    """Parameterized unrolled beam-search CTE chain: one (expand,
    rescore, top-ef) block per round over ``graph_cte``, beams named
    ``{beam_prefix}{r}`` seeded from ``{beam_prefix}0``. MATERIALIZED:
    each beam is referenced twice (union + expansion join), and DuckDB
    inlines plain CTEs — the scan chain would double per round."""
    blocks = []
    prev = f"{beam_prefix}0"
    for r in range(1, rounds + 1):
        blocks.append(f"""
    {beam_prefix}c{r} AS MATERIALIZED (
      SELECT q_id, vec_id FROM {prev}
      UNION
      SELECT b.q_id, g.nbr_id AS vec_id
      FROM {prev} b JOIN {graph_cte} g ON g.src_id = b.vec_id
    ),
    {beam_prefix}{r} AS MATERIALIZED (
      SELECT q_id, vec_id, sim FROM (
        SELECT c.q_id, c.vec_id,
               round(list_cosine_similarity(e.v, q.q_vec), 6) AS sim,
               row_number() OVER (PARTITION BY c.q_id
                 ORDER BY round(list_cosine_similarity(e.v, q.q_vec), 6) DESC,
                          c.vec_id) AS rn
        FROM {beam_prefix}c{r} c
        JOIN {vec_cte} e ON e.vec_id = c.vec_id
        JOIN q ON q.q_id = c.q_id
      ) WHERE rn <= {ef}
    )""")
        prev = f"{beam_prefix}{r}"
    return ",".join(blocks)


_HNSW_SQL = f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    q AS MATERIALIZED (
      SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < {N_QUERIES}
    ),
    u AS MATERIALIZED (SELECT vec_id, v FROM e WHERE {_HNSW_LAYER_SQL}),
    gu AS MATERIALIZED (
      SELECT src_id, nbr_id FROM (
        SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                          b.vec_id) AS rnk
        FROM u a JOIN u b ON a.vec_id <> b.vec_id
      ) WHERE rnk <= {_GRAPH_M}
    ),
    g AS MATERIALIZED (
      SELECT src_id, nbr_id FROM (
        SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                          b.vec_id) AS rnk
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
      ) WHERE rnk <= {_GRAPH_M}
    ),
    ub0 AS (SELECT q_id, (SELECT min(vec_id) FROM u) AS vec_id FROM q),
    {_beam_rounds_sql_over("gu", "u", "ub", _HNSW_UPPER_ROUNDS, _GRAPH_EF)},
    ent AS MATERIALIZED (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY sim DESC, vec_id) AS rnk
        FROM ub{_HNSW_UPPER_ROUNDS} WHERE vec_id <> q_id
      ) WHERE rnk <= {_HNSW_ENTRY}
    ),
    bb0 AS (SELECT q_id, vec_id FROM ent),
    {_beam_rounds_sql_over("g", "e", "bb", _HNSW_BASE_ROUNDS, _GRAPH_EF)}
    SELECT q_id, vec_id, sim, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT q_id, vec_id, sim,
             row_number() OVER (PARTITION BY q_id
               ORDER BY sim DESC, vec_id) AS rnk
      FROM bb{_HNSW_BASE_ROUNDS} WHERE vec_id <> q_id
    ) WHERE rnk <= 5
"""


@query("graph_ann_hnsw_topk", _HNSW_SQL)
def q_graph_ann_hnsw(spark, sf_dir):
    """HIERARCHICAL HNSW serving (reference commercial_rfp_indexer.py:96-112
    declares HNSW m=4, ef_construction=400, ef_search=500): an md5-
    promoted upper layer (p = 1/16 level draw) with its own m-NN graph
    is beam-searched first (2 rounds over a graph 16x smaller in
    diameter-relevant size), and each query's top-4 upper nodes become
    per-query entry points for a 3-round base-layer beam — fewer
    base-layer hops than the flat graph_ann_beam_topk search (4 rounds
    from a fixed global entry node) at the same ef, and HIGHER measured
    recall@5 (1.00 vs 0.88 at sf0.01; 0.72 vs 0.36 at sf0.1). Fully
    deterministic (md5 layer coin, min-id upper entry, (sim DESC,
    vec_id) ties), so the whole hierarchy value-checks against the
    unrolled two-layer oracle."""
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        hnsw_layer_pred,
        hnsw_search,
        knn_graph,
    )
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_knn_graph8,
    )

    v = _vectors(spark, sf_dir).select("vec_id", "embedding")
    upper = v.filter(hnsw_layer_pred(upper_mod=_HNSW_MOD))
    base_graph = pin(ensure_knn_graph8(spark, sf_dir), "hnsw_base_graph")
    # the upper layer is ~n/16 nodes; its exact graph build is tiny
    upper_graph = pin(knn_graph(upper, m=_GRAPH_M, n_blocks=2), "hnsw_upper_graph")
    return hnsw_search(
        v,
        base_graph,
        upper,
        upper_graph,
        _queries_df(spark, sf_dir),
        k=5,
        ef=_GRAPH_EF,
        upper_rounds=_HNSW_UPPER_ROUNDS,
        base_rounds=_HNSW_BASE_ROUNDS,
        n_entry=_HNSW_ENTRY,
    )


# ---- 3-layer HNSW (geometric level draw) ---------------------------
# p = 1/8 per extra level: layer1 ~ n/8 nodes, layer2 ~ n/64 (29 at
# sf0.1, 11 at sf0.01 — never empty down to sf0.001). One expansion
# round on each upper layer, the FULL 16-beam handed down as entry
# points (real HNSW hands its whole candidate list to the next layer),
# 3 base rounds. Measured recall@5 vs exact at equal ef=16 and equal
# total expansion rounds (5) against the 2-layer query: 1.00 vs 1.00
# (sf0.01), 0.84 vs 0.72 (sf0.1) — the extra level buys recall at the
# same serving cost because the descent starts every base search from
# entries already contracted twice.
_HNSW_DEEP_MOD = 8
_HNSW_DEEP_LAYER_ROUNDS = [1, 1]  # top (layer2) first, then layer1
_HNSW_DEEP_BASE_ROUNDS = 3
_HNSW_DEEP_ENTRY = 16


def _hnsw_coin_sql(j: int, mod: int) -> str:
    return (
        f"('0x' || substring(md5('hnsw{j}:' || CAST(vec_id AS VARCHAR)), 1, 15))"
        f"::BIGINT % {mod} = 0"
    )


_HNSW_DEEP_SQL = f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    q AS MATERIALIZED (
      SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < {N_QUERIES}
    ),
    u1 AS MATERIALIZED (
      SELECT vec_id, v FROM e WHERE {_hnsw_coin_sql(1, _HNSW_DEEP_MOD)}
    ),
    u2 AS MATERIALIZED (
      SELECT vec_id, v FROM u1 WHERE {_hnsw_coin_sql(2, _HNSW_DEEP_MOD)}
    ),
    gu1 AS MATERIALIZED (
      SELECT src_id, nbr_id FROM (
        SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                          b.vec_id) AS rnk
        FROM u1 a JOIN u1 b ON a.vec_id <> b.vec_id
      ) WHERE rnk <= {_GRAPH_M}
    ),
    gu2 AS MATERIALIZED (
      SELECT src_id, nbr_id FROM (
        SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                          b.vec_id) AS rnk
        FROM u2 a JOIN u2 b ON a.vec_id <> b.vec_id
      ) WHERE rnk <= {_GRAPH_M}
    ),
    g AS MATERIALIZED (
      SELECT src_id, nbr_id FROM (
        SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                          b.vec_id) AS rnk
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
      ) WHERE rnk <= {_GRAPH_M}
    ),
    tb0 AS (SELECT q_id, (SELECT min(vec_id) FROM u2) AS vec_id FROM q),
    {_beam_rounds_sql_over("gu2", "u2", "tb", _HNSW_DEEP_LAYER_ROUNDS[0], _GRAPH_EF)},
    ent2 AS MATERIALIZED (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY sim DESC, vec_id) AS rnk
        FROM tb{_HNSW_DEEP_LAYER_ROUNDS[0]} WHERE vec_id <> q_id
      ) WHERE rnk <= {_HNSW_DEEP_ENTRY}
    ),
    mb0 AS (SELECT q_id, vec_id FROM ent2),
    {_beam_rounds_sql_over("gu1", "u1", "mb", _HNSW_DEEP_LAYER_ROUNDS[1], _GRAPH_EF)},
    ent1 AS MATERIALIZED (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY sim DESC, vec_id) AS rnk
        FROM mb{_HNSW_DEEP_LAYER_ROUNDS[1]} WHERE vec_id <> q_id
      ) WHERE rnk <= {_HNSW_DEEP_ENTRY}
    ),
    db0 AS (SELECT q_id, vec_id FROM ent1),
    {_beam_rounds_sql_over("g", "e", "db", _HNSW_DEEP_BASE_ROUNDS, _GRAPH_EF)}
    SELECT q_id, vec_id, sim, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT q_id, vec_id, sim,
             row_number() OVER (PARTITION BY q_id
               ORDER BY sim DESC, vec_id) AS rnk
      FROM db{_HNSW_DEEP_BASE_ROUNDS} WHERE vec_id <> q_id
    ) WHERE rnk <= 5
"""


@query("graph_ann_hnsw_deep_topk", _HNSW_DEEP_SQL)
def q_graph_ann_hnsw_deep(spark, sf_dir):
    """THREE-layer HNSW serving under the geometric level draw
    (hnsw_level_pred: independent md5 coins per layer, p = 8^-level —
    the hash restatement of HNSW's level = floor(-ln(U)/ln(M));
    reference declares full hierarchical HNSW,
    commercial_rfp_indexer.py:96-112). The search descends top-down:
    one expansion round on the ~n/64 top layer from its min-id entry,
    one on the ~n/8 middle layer, then 3 base rounds — each layer hands
    its FULL 16-beam down as entry points, the real-HNSW handoff. At
    equal ef and equal total expansion rounds (5) the extra level
    lifts measured recall@5 over the 2-layer graph_ann_hnsw_topk:
    1.00 vs 1.00 at sf0.01, 0.84 vs 0.72 at sf0.1 (flat 4-round beam:
    0.36). Deterministic end to end — the whole 3-layer descent
    value-checks against this unrolled oracle."""
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        hnsw_level_pred,
        hnsw_search_deep,
        knn_graph,
    )
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_knn_graph8,
    )

    v = _vectors(spark, sf_dir).select("vec_id", "embedding")
    l1 = v.filter(hnsw_level_pred(1, upper_mod=_HNSW_DEEP_MOD))
    l2 = v.filter(hnsw_level_pred(2, upper_mod=_HNSW_DEEP_MOD))
    base_graph = pin(ensure_knn_graph8(spark, sf_dir), "hnsw_base_graph")
    g1 = pin(knn_graph(l1, m=_GRAPH_M, n_blocks=2), "hnsw_deep_l1_graph")
    g2 = pin(knn_graph(l2, m=_GRAPH_M, n_blocks=1), "hnsw_deep_l2_graph")
    return hnsw_search_deep(
        v,
        base_graph,
        [(l2, g2), (l1, g1)],
        _queries_df(spark, sf_dir),
        k=5,
        ef=_GRAPH_EF,
        layer_rounds=_HNSW_DEEP_LAYER_ROUNDS,
        base_rounds=_HNSW_DEEP_BASE_ROUNDS,
        n_entry=_HNSW_DEEP_ENTRY,
    )


_ND_ROUNDS = 2


def _nn_descent_sql(m: int, rounds: int) -> str:
    """Unrolled NN-descent oracle: LSH-bucket init, then per round a
    2-hop expansion + exact rescore + top-m, MATERIALIZED like every
    iterative oracle (each round reads its predecessor twice)."""

    def top_m(name: str, pairs: str) -> str:
        return f"""
    {name} AS MATERIALIZED (
      SELECT src_id, nbr_id, sim FROM (
        SELECT p.src_id, p.nbr_id,
               round(list_cosine_similarity(ea.v, eb2.v), 6) AS sim,
               row_number() OVER (PARTITION BY p.src_id
                 ORDER BY round(list_cosine_similarity(ea.v, eb2.v), 6) DESC,
                          p.nbr_id) AS rn
        FROM {pairs} p
        JOIN e ea ON ea.vec_id = p.src_id
        JOIN e eb2 ON eb2.vec_id = p.nbr_id
      ) WHERE rn <= {m}
    )"""

    blocks = [
        f"""
    p0 AS MATERIALIZED (
      SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS nbr_id
      FROM buckets a JOIN buckets b USING (tbl, bucket)
      WHERE a.vec_id <> b.vec_id
    ),{top_m("g0", "p0")}"""
    ]
    prev = "g0"
    for r in range(1, rounds + 1):
        blocks.append(
            f""",
    p{r} AS MATERIALIZED (
      SELECT src_id, nbr_id FROM {prev}
      UNION
      SELECT a.src_id, b.nbr_id
      FROM {prev} a JOIN {prev} b ON a.nbr_id = b.src_id
      WHERE b.nbr_id <> a.src_id
    ),{top_m(f"g{r}", f"p{r}")}"""
        )
        prev = f"g{r}"
    final = f"""
    SELECT src_id, nbr_id, sim, CAST(row_number() OVER (PARTITION BY src_id
             ORDER BY sim DESC, nbr_id) AS INTEGER) AS rnk
    FROM {prev}"""
    return "".join(blocks) + final


@query(
    "nn_descent_graph",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {_multi_buckets_cte(4, 6).strip()},
    {_nn_descent_sql(_GRAPH_M, _ND_ROUNDS)}
    """,
)
def q_nn_descent(spark, sf_dir):
    """APPROXIMATE m-NN graph build via NN-descent (LSH init + 2
    rounds of neighbor-of-neighbor refinement, 6 init tables) — the
    O(n·m²)-per-round scale path next to the exact block-grid build;
    edge recall vs knn_graph_edges measures 0.72 at sf0.01 (tests pin
    it; on clustered real-world embeddings the 2-hop signal is far
    stronger — this synthetic corpus is near-orthogonal, the
    hardest case). Deterministic
    LSH planes + (sim DESC, id) ranks keep even the approximate build
    value-hash-checked. Serves from the durable
    `ensure_nn_descent_graph` artifact (round 10); the oracle states
    the full LSH-init + 2-round refinement chain."""
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_nn_descent_graph,
    )

    return ensure_nn_descent_graph(spark, sf_dir)


@query(
    "knn_label_classification",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    g AS (
      SELECT src_id, nbr_id FROM (
        SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                          b.vec_id) AS rnk
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
      ) WHERE rnk <= {_GRAPH_M}
    ),
    votes AS (
      SELECT g.src_id, e.label AS nbr_label, count(*) AS c
      FROM g JOIN e ON e.vec_id = g.nbr_id
      GROUP BY g.src_id, e.label
    ),
    pred AS (
      SELECT src_id, nbr_label AS predicted FROM (
        SELECT *, row_number() OVER (PARTITION BY src_id
                  ORDER BY c DESC, nbr_label) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT e.label, count(*) AS n,
           CAST(sum(CASE WHEN p.predicted = e.label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           round(sum(CASE WHEN p.predicted = e.label THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS accuracy
    FROM pred p JOIN e ON e.vec_id = p.src_id
    GROUP BY e.label
    """,
)
def q_knn_label_classification(spark, sf_dir):
    """k-NN label classification OVER the m-NN graph — the downstream
    consumer that justifies building the graph once: each vector's
    label is predicted by majority vote of its 8 graph neighbors
    ((count DESC, label) tiebreak), reported as per-label leave-one-out
    accuracy. At scale the graph is the durable index
    (ensure_graph_index); classification is then one edge join + two
    small aggregates — no similarity computation at serve time. Round
    10 makes that literal: the graph serves from the durable
    `ensure_knn_graph8` artifact."""
    from pyspark.sql import Window as W

    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_knn_graph8,
    )

    v = _vectors(spark, sf_dir)
    g = ensure_knn_graph8(spark, sf_dir)
    labels = v.select("vec_id", "label")
    votes = (
        g.join(labels.withColumnRenamed("vec_id", "nbr_id"), "nbr_id")
        .groupBy("src_id", F.col("label").alias("nbr_label"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = W.partitionBy("src_id").orderBy(F.col("c").desc(), F.col("nbr_label"))
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("src_id").alias("vec_id"), F.col("nbr_label").alias("predicted"))
    )
    return (
        pred.join(labels, "vec_id")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("predicted") == F.col("label"), 1).otherwise(0)).alias(
                "n_correct"
            ),
        )
        .select(
            "label",
            "n",
            "n_correct",
            F.round(F.col("n_correct") / F.col("n").cast("double"), 6).alias(
                "accuracy"
            ),
        )
    )


_FILTERED_K = 3
_POSTFILTER_POOL = 10

_FILTERED_SEARCH_SQL = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS q_vec, label AS q_label
          FROM e WHERE vec_id < {N_QUERIES}),
    pre AS (
      SELECT 'prefilter' AS strategy, q_id, vec_id, sim,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY sim DESC, vec_id) AS INTEGER) AS rnk
      FROM (
        SELECT q.q_id, e.vec_id,
               round(list_cosine_similarity(e.v, q.q_vec), 6) AS sim
        FROM e JOIN q ON e.label = q.q_label AND e.vec_id <> q.q_id
      )
    ),
    pool AS (
      SELECT q_id, vec_id, sim, label FROM (
        SELECT q.q_id, e.vec_id, e.label,
               round(list_cosine_similarity(e.v, q.q_vec), 6) AS sim,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY round(list_cosine_similarity(e.v, q.q_vec), 6) DESC,
                          e.vec_id) AS grnk
        FROM e JOIN q ON e.vec_id <> q.q_id
      ) WHERE grnk <= {_POSTFILTER_POOL}
    ),
    post AS (
      SELECT 'postfilter' AS strategy, p.q_id, p.vec_id, p.sim,
             CAST(row_number() OVER (PARTITION BY p.q_id
               ORDER BY p.sim DESC, p.vec_id) AS INTEGER) AS rnk
      FROM pool p JOIN q ON q.q_id = p.q_id
      WHERE p.label = q.q_label
    )
    SELECT * FROM (
      SELECT * FROM pre WHERE rnk <= {_FILTERED_K}
      UNION ALL
      SELECT * FROM post WHERE rnk <= {_FILTERED_K}
    )
"""


@query("filtered_vector_search", _FILTERED_SEARCH_SQL)
def q_filtered_vector_search(spark, sf_dir):
    """FILTERED vector search — the filterable-field + vector-query
    combination the reference's index declares (commercial_rfp_indexer
    .py index schema: filterable metadata fields alongside the vector
    field), with BOTH strategies side by side so the trade is data:

    - PREFILTER: restrict the corpus to the query's label first, then
      exact top-3 within survivors — always returns k (if k matches
      exist), the semantics a metadata-scoped search API promises.
    - POSTFILTER: global top-10 pool first, then filter — cheaper per
      probe on an unfiltered index, but can return FEWER than k when
      the pool is dominated by other labels (the recall loss the
      output makes visible: rows simply go missing).

    Scale: prefilter is a label-equi-join before any similarity math —
    on a label-partitioned (or IVF-per-label) index it prunes to the
    matching partitions; postfilter reuses any unfiltered ANN tier and
    filters its pool. Queries broadcast in both."""
    v = _vectors(spark, sf_dir)
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    from commercial_rfp_data_pipeline_spark.operators.vector import cosine

    sims = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "label",
            "q_label",
            F.round(cosine(F.col("embedding"), F.col("q_vec")), 6).alias("sim"),
        )
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), "vec_id")
    pre = (
        sims.filter(F.col("label") == F.col("q_label"))
        .withColumn("rnk", F.row_number().over(wq).cast("int"))
        .filter(F.col("rnk") <= _FILTERED_K)
        .select(F.lit("prefilter").alias("strategy"), "q_id", "vec_id", "sim", "rnk")
    )
    post = (
        sims.withColumn("grnk", F.row_number().over(wq))
        .filter(F.col("grnk") <= _POSTFILTER_POOL)
        .filter(F.col("label") == F.col("q_label"))
        .withColumn("rnk", F.row_number().over(wq).cast("int"))
        .filter(F.col("rnk") <= _FILTERED_K)
        .select(F.lit("postfilter").alias("strategy"), "q_id", "vec_id", "sim", "rnk")
    )
    return pre.unionByName(post)


_PAGE_SIZE = 5

_KEYSET_PAGE_SQL = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < {N_QUERIES}),
    ranked AS (
      SELECT q.q_id, e.vec_id,
             round(list_cosine_similarity(e.v, q.q_vec), 6) AS sim,
             row_number() OVER (PARTITION BY q.q_id
               ORDER BY round(list_cosine_similarity(e.v, q.q_vec), 6) DESC,
                        e.vec_id) AS rnk
      FROM e JOIN q ON e.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, sim,
           CAST(rnk - {_PAGE_SIZE} AS INTEGER) AS page_pos
    FROM ranked
    WHERE rnk > {_PAGE_SIZE} AND rnk <= {2 * _PAGE_SIZE}
"""


@query("search_keyset_pagination_page2", _KEYSET_PAGE_SQL)
def q_keyset_pagination(spark, sf_dir):
    """KEYSET (continuation-token) pagination of search results — how
    a serving API returns page 2 WITHOUT re-ranking past pages or an
    OFFSET scan: the client holds the last row's (sim, vec_id) as the
    token, and page 2 is the top-5 rows strictly AFTER that key under
    the total order (sim DESC, vec_id ASC). The engine computes page 2
    through the composite keyset predicate
    ``sim < t_sim OR (sim = t_sim AND vec_id > t_vec)``; the oracle
    restates it as the rank range 6..10 — hash equality proves the
    keyset predicate selects exactly the rank window (the reason
    continuation tokens are sound).

    Scale: the token join is one row per query (broadcast); the
    predicate prunes before any sort, and the page is a per-query
    top-5 heap over survivors — OFFSET pagination would instead rank
    and discard every earlier page on every call."""
    from commercial_rfp_data_pipeline_spark.operators.vector import cosine

    v = _vectors(spark, sf_dir).select("vec_id", "embedding")
    q = _queries_df(spark, sf_dir)
    sims = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q_vec")), 6).alias("sim"),
        )
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), "vec_id")
    # page 1 runs once; its LAST row is the continuation token
    token = (
        sims.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") == _PAGE_SIZE)
        .select("q_id", F.col("sim").alias("t_sim"), F.col("vec_id").alias("t_vec"))
    )
    after = (
        sims.join(F.broadcast(token), "q_id")
        .filter(
            (F.col("sim") < F.col("t_sim"))
            | ((F.col("sim") == F.col("t_sim")) & (F.col("vec_id") > F.col("t_vec")))
        )
        .withColumn("page_pos", F.row_number().over(wq).cast("int"))
        .filter(F.col("page_pos") <= _PAGE_SIZE)
    )
    return after.select("q_id", "vec_id", "sim", "page_pos")


@query(
    "ivf_filtered_topk",
    f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    {_KMEANS_SQL},
    assigned AS (
      SELECT vec_id, label, v, cent_id FROM (
        SELECT e.vec_id, e.label, e.v, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(e.v, c.cent_vec), 6) DESC, c.cent_id) AS rn
        FROM e CROSS JOIN {_KM_FINAL} c
      ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS q_id, label AS q_label, v AS q_vec
          FROM e WHERE vec_id < {N_QUERIES}),
    probes AS (
      SELECT q_id, q_label, q_vec, cent_id FROM (
        SELECT q.q_id, q.q_label, q.q_vec, c.cent_id,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY round(list_cosine_similarity(q.q_vec, c.cent_vec), 6) DESC, c.cent_id) AS rn
        FROM q CROSS JOIN {_KM_FINAL} c
      ) WHERE rn <= 2
    ),
    sims AS (
      SELECT p.q_id, a.vec_id, round(list_cosine_similarity(a.v, p.q_vec), 6) AS sim
      FROM assigned a
      JOIN probes p ON a.cent_id = p.cent_id AND a.vec_id <> p.q_id
                   AND a.label = p.q_label
    )
    SELECT q_id, vec_id, sim, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
      FROM sims
    ) WHERE rnk <= 5
    """,
)
def q_ivf_filtered(spark, sf_dir):
    """FILTERED IVF ANN — the metadata-scoped vector search a real
    index serves (Azure AI Search filterable field + vector query,
    FAISS IDSelector): the label equality applies INSIDE the probed
    cells, before any similarity math, so the search pays only for
    matching rows in nprobe cells — unlike the post-rank filter whose
    recall loss filtered_vector_search makes visible. Same trained
    Lloyd centroids, probe order, and ranking as ivf_topk_search; the
    oracle restates the full path including the filter placement.
    Centroids + cell layout (label stored in the cells, as a
    filterable index field is) serve from the durable
    `ensure_ivf_models` artifact (round 10)."""
    from commercial_rfp_data_pipeline_spark.operators.vector import ivf_search
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_ivf_models,
    )

    v = _vectors(spark, sf_dir)
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    cents, asg = ensure_ivf_models(spark, sf_dir)
    out = ivf_search(
        None,
        q,
        nprobe=2,
        k=5,
        cents=cents,
        assigned=asg.select(
            "vec_id", "embedding", "cent_id", "_n", "label"
        ),
        match_cols=("label", "q_label"),
    )
    return out.select(
        "q_id", "vec_id", "sim", F.col("rnk").cast("int").alias("rnk")
    )


# ---- matryoshka tiered-retrieval eval ------------------------------
# Serving an embedding index at a TRUNCATED dimension is the standard
# memory/latency tier (Matryoshka representation learning: the prefix
# dims carry most of the signal — for random synthetic vectors they
# don't, which the eval makes visible). Per tier d in {64,32,16,8}:
# rank the corpus by cosine over the FIRST d dims, grade against the
# full-dim exact top-5 (rel 3/2/2/1/1), and emit per-query recall@5,
# nDCG@5, MRR. Discounts are 6dp LITERALS (1/log2(i+1)) embedded in
# both engines — transcendental functions differ in the last ulp
# across engines; literals make the arithmetic bit-identical.
_MAT_TIERS = (64, 32, 16, 8)
_MAT_DISC = (1.0, 0.63093, 0.5, 0.430677, 0.386853)
_MAT_IDCG = 11.21032  # 7*d1 + 3*d2 + 3*d3 + 1*d4 + 1*d5
_MAT_REL_SQL = "CASE WHEN rnk = 1 THEN 3 WHEN rnk <= 3 THEN 2 ELSE 1 END"
_MAT_DISC_SQL = (
    "CASE rnk "
    + " ".join(f"WHEN {i + 1} THEN {d}" for i, d in enumerate(_MAT_DISC))
    + " END"
)

_MAT_SQL = f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    q AS MATERIALIZED (
      SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < {N_QUERIES}
    ),
    gt AS MATERIALIZED (
      SELECT q_id, vec_id, {_MAT_REL_SQL} AS rel FROM (
        SELECT q.q_id, e.vec_id,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY round(list_cosine_similarity(e.v, q.q_vec), 6)
                   DESC, e.vec_id) AS rnk
        FROM e JOIN q ON e.vec_id <> q.q_id
      ) WHERE rnk <= 5
    ),
    tiers AS (SELECT unnest([{", ".join(str(t) for t in _MAT_TIERS)}]) AS tier),
    sys AS MATERIALIZED (
      SELECT tier, q_id, vec_id, rnk FROM (
        SELECT t.tier, q.q_id, e.vec_id,
               row_number() OVER (PARTITION BY t.tier, q.q_id
                 ORDER BY round(list_cosine_similarity(
                   e.v[1:t.tier], q.q_vec[1:t.tier]), 6) DESC, e.vec_id)
                 AS rnk
        FROM tiers t CROSS JOIN q JOIN e ON e.vec_id <> q.q_id
      ) WHERE rnk <= 5
    ),
    graded AS (
      SELECT s.tier, s.q_id, s.rnk, coalesce(g.rel, 0) AS rel
      FROM sys s LEFT JOIN gt g ON g.q_id = s.q_id AND g.vec_id = s.vec_id
    )
    SELECT tier, q_id,
           round(CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / 5, 6) AS recall5,
           round(sum((power(2, rel) - 1) * ({_MAT_DISC_SQL}))
                 / {_MAT_IDCG}, 6) AS ndcg5,
           round(coalesce(1.0 / min(CASE WHEN rel > 0 THEN rnk END), 0.0), 6)
             AS mrr
    FROM graded GROUP BY tier, q_id
"""


@query("matryoshka_tier_retrieval_eval", _MAT_SQL)
def q_matryoshka_tier_eval(spark, sf_dir):
    """Dimension-truncation serving tiers, measured: per (tier, query)
    the recall@5, nDCG@5 (graded 3/2/2/1/1 against the full-dim exact
    top-5, literal log2 discounts) and MRR of ranking by the embedding
    PREFIX only — the eval a serving stack runs before turning on a
    matryoshka/PCA memory tier. Generalizes the single-point
    ``matryoshka_truncation_eval`` (one 16-dim tier, recall only) into
    the 4-tier graded-metric sweep that actually picks the tier. One corpus pass per tier with the tier
    table broadcast-expanded; every metric is per-query (no cross-row
    float averaging, so both engines agree bit-for-bit)."""
    e = _vectors(spark, sf_dir).select("vec_id", F.col("embedding").alias("v"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    from commercial_rfp_data_pipeline_spark.operators.vector import _dot, _norm

    def ranked(vec_expr, qvec_expr, extra_keys):
        sim = F.round(
            _dot(vec_expr, qvec_expr)
            / (_norm(vec_expr) * _norm(qvec_expr)),
            6,
        )
        w = Window.partitionBy(*extra_keys, "q_id").orderBy(
            F.col("_s").desc(), F.col("vec_id")
        )
        return sim, w

    # ground truth: full-dim exact top-5 with graded relevance
    j = e.join(F.broadcast(q), e.vec_id != q.q_id)
    sim, w = ranked(F.col("v"), F.col("q_vec"), [])
    gt = (
        j.select("q_id", "vec_id", sim.alias("_s"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "q_id",
            "vec_id",
            F.when(F.col("rnk") == 1, 3)
            .when(F.col("rnk") <= 3, 2)
            .otherwise(1)
            .alias("rel"),
        )
    )
    tiers = spark.createDataFrame(
        [(t,) for t in _MAT_TIERS], "tier int"
    )
    jt = e.join(F.broadcast(q), e.vec_id != q.q_id).join(F.broadcast(tiers))
    tsim, tw = ranked(
        F.slice(F.col("v"), 1, F.col("tier")),
        F.slice(F.col("q_vec"), 1, F.col("tier")),
        ["tier"],
    )
    sys_rank = (
        jt.select("tier", "q_id", "vec_id", tsim.alias("_s"))
        .withColumn("rnk", F.row_number().over(tw))
        .filter(F.col("rnk") <= 5)
    )
    graded = sys_rank.join(gt, ["q_id", "vec_id"], "left").select(
        "tier", "q_id", "rnk", F.coalesce("rel", F.lit(0)).alias("rel")
    )
    disc = F.col("rnk").cast("int")
    disc_expr = None
    for i, d in enumerate(_MAT_DISC):
        cond = disc == (i + 1)
        disc_expr = (
            F.when(cond, F.lit(d))
            if disc_expr is None
            else disc_expr.when(cond, F.lit(d))
        )
    return graded.groupBy("tier", "q_id").agg(
        F.round(
            F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).cast("double")
            / 5,
            6,
        ).alias("recall5"),
        F.round(
            F.sum((F.pow(F.lit(2.0), F.col("rel")) - 1) * disc_expr)
            / F.lit(_MAT_IDCG),
            6,
        ).alias("ndcg5"),
        F.round(
            F.coalesce(
                F.lit(1.0)
                / F.min(F.when(F.col("rel") > 0, F.col("rnk"))),
                F.lit(0.0),
            ),
            6,
        ).alias("mrr"),
    )


# ---- two-stage retrieval: cheap recall + exact rerank ---------------
# The canonical serving funnel: stage 1 ranks the corpus by the CHEAP
# signal (here the 16-dim embedding prefix — the matryoshka memory
# tier) and keeps 20 candidates; stage 2 re-scores ONLY those 20 with
# the expensive exact full-dim cosine and emits the top 3. rank_delta
# shows the rerank doing its job (stage-1 positions reshuffled by the
# better signal); the whole funnel never scores corpus x full-dim.
_RERANK_COARSE_DIM = 16
_RERANK_STAGE1_K = 20
_RERANK_K = 3

_RERANK_SQL = f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    q AS MATERIALIZED (
      SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < {N_QUERIES}
    ),
    stage1 AS MATERIALIZED (
      SELECT q_id, vec_id, sim_coarse, rnk_stage1 FROM (
        SELECT q.q_id, e.vec_id,
               round(list_cosine_similarity(
                 e.v[1:{_RERANK_COARSE_DIM}],
                 q.q_vec[1:{_RERANK_COARSE_DIM}]), 6) AS sim_coarse,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY round(list_cosine_similarity(
                   e.v[1:{_RERANK_COARSE_DIM}],
                   q.q_vec[1:{_RERANK_COARSE_DIM}]), 6) DESC, e.vec_id)
                 AS rnk_stage1
        FROM e JOIN q ON e.vec_id <> q.q_id
      ) WHERE rnk_stage1 <= {_RERANK_STAGE1_K}
    )
    SELECT q_id, vec_id, sim_coarse, CAST(rnk_stage1 AS INTEGER) AS rnk_stage1,
           sim_full, CAST(rnk_final AS INTEGER) AS rnk_final,
           CAST(rnk_stage1 - rnk_final AS INTEGER) AS rank_delta
    FROM (
      SELECT s.*, round(list_cosine_similarity(e.v, q.q_vec), 6) AS sim_full,
             row_number() OVER (PARTITION BY s.q_id
               ORDER BY round(list_cosine_similarity(e.v, q.q_vec), 6) DESC,
                        s.vec_id) AS rnk_final
      FROM stage1 s
      JOIN e ON e.vec_id = s.vec_id
      JOIN q ON q.q_id = s.q_id
    ) WHERE rnk_final <= {_RERANK_K}
"""


@query("two_stage_rerank_topk", _RERANK_SQL)
def q_two_stage_rerank(spark, sf_dir):
    """Two-stage serving funnel: a 16-dim-prefix cosine recalls 20
    candidates per query (the cheap tier the matryoshka eval grades),
    then ONLY those 20 are re-scored by the exact full-dim cosine —
    top-3 out, with both stages' similarities and ranks and the
    rank_delta the rerank produced. Stage-2 cost is queries x 20
    full-dim dot products regardless of corpus size — the funnel shape
    every production retrieval stack runs (recall cheap, rank exact).
    The inverse funnel of ``crossencoder_rerank_topk`` (exact-cosine
    shortlist refined by a cross-encoder blend): there stage 2 ADDS a
    signal; here stage 1 REMOVES cost."""
    from commercial_rfp_data_pipeline_spark.operators.vector import _dot, _norm

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    cv = F.slice(F.col("v"), 1, _RERANK_COARSE_DIM)
    cq = F.slice(F.col("q_vec"), 1, _RERANK_COARSE_DIM)
    sim_c = F.round(_dot(cv, cq) / (_norm(cv) * _norm(cq)), 6)
    w1 = Window.partitionBy("q_id").orderBy(
        F.col("sim_coarse").desc(), F.col("vec_id")
    )
    stage1 = (
        e.join(F.broadcast(q), e.vec_id != q.q_id)
        .select("q_id", "vec_id", sim_c.alias("sim_coarse"))
        .withColumn("rnk_stage1", F.row_number().over(w1))
        .filter(F.col("rnk_stage1") <= _RERANK_STAGE1_K)
    )
    # stage 2 touches ONLY the candidate rows: equi-joins back to the
    # vectors, never a second corpus-wide similarity pass
    sim_f = F.round(
        _dot(F.col("v"), F.col("q_vec")) / (_norm(F.col("v")) * _norm(F.col("q_vec"))),
        6,
    )
    w2 = Window.partitionBy("q_id").orderBy(
        F.col("sim_full").desc(), F.col("vec_id")
    )
    return (
        stage1.join(e, "vec_id")
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id",
            "vec_id",
            "sim_coarse",
            F.col("rnk_stage1").cast("int").alias("rnk_stage1"),
            sim_f.alias("sim_full"),
        )
        .withColumn("rnk_final", F.row_number().over(w2).cast("int"))
        .filter(F.col("rnk_final") <= _RERANK_K)
        .withColumn(
            "rank_delta",
            (F.col("rnk_stage1") - F.col("rnk_final")).cast("int"),
        )
    )


# ---- MMR diversified retrieval --------------------------------------
# Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98): re-rank
# a bounded candidate shortlist so each pick trades query relevance
# against redundancy with what's already picked. The greedy loop is
# sequential BY DEFINITION, so the scale discipline is the funnel: the
# corpus is touched once (stage-1 shortlist); the K selection rounds
# run over queries x C candidate rows (bounded, pinned), never the
# corpus.
_MMR_C = 12  # shortlist size per query
_MMR_K = 5  # diversified picks per query
_MMR_LAMBDA = 0.7


def _mmr_score_sql(rel: str, ms: str) -> str:
    """MMR score in EXACT decimal arithmetic: the 6-dp similarities are
    exact DECIMAL(9,6) values, 0.7/0.3 are exact DECIMAL(2,1), so
    0.7*rel - 0.3*maxsim is exact at 7 dp and casts to the identical
    double on both engines. (A double-side round(0.7*rel, 6) failed
    here for real: 0.7 * 0.371485 = 0.2600395-epsilon, which Spark's
    HALF_UP decimal-string round sends UP and DuckDB's binary round
    sends DOWN.)"""
    return (
        f"CAST(CAST({_MMR_LAMBDA} AS DECIMAL(2,1))"
        f" * CAST({rel} AS DECIMAL(9,6))"
        f" - CAST({round(1.0 - _MMR_LAMBDA, 6)} AS DECIMAL(2,1))"
        f" * CAST({ms} AS DECIMAL(9,6)) AS DOUBLE)"
    )


def _mmr_oracle_sql() -> str:
    """Unrolled greedy-selection CTE chain (K fixed steps). Every
    similarity is rounded to 6 dp BEFORE entering the score arithmetic,
    and the MMR score is exact decimal arithmetic on both engines, so
    ordering and hashes match exactly."""
    parts = [
        f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < {N_QUERIES}),
    cand AS (
      SELECT q_id, vec_id, rel FROM (
        SELECT q.q_id, e.vec_id,
               round(list_cosine_similarity(e.v, q.q_vec), 6) AS rel,
               row_number() OVER (
                 PARTITION BY q.q_id
                 ORDER BY round(list_cosine_similarity(e.v, q.q_vec), 6) DESC,
                          e.vec_id) AS rn
        FROM e JOIN q ON e.vec_id <> q.q_id
      ) WHERE rn <= {_MMR_C}
    ),
    cv AS (SELECT c.q_id, c.vec_id, c.rel, e.v
           FROM cand c JOIN e ON e.vec_id = c.vec_id),
    pairs AS (
      SELECT a.q_id, a.vec_id AS d_id, b.vec_id AS s_id,
             round(list_cosine_similarity(a.v, b.v), 6) AS psim
      FROM cv a JOIN cv b
        ON a.q_id = b.q_id AND a.vec_id <> b.vec_id
    ),
    sel1 AS (
      SELECT q_id, vec_id, 1 AS step, rel,
             0.0 AS max_sim_selected,
             {_mmr_score_sql("rel", "0.0")} AS mmr
      FROM (SELECT *, row_number() OVER (
              PARTITION BY q_id ORDER BY rel DESC, vec_id) AS rn
            FROM cand) WHERE rn = 1
    )"""
    ]
    prev = "sel1"
    for step in range(2, _MMR_K + 1):
        parts.append(
            f""",
    rem{step} AS (
      SELECT c.* FROM cand c
      WHERE NOT EXISTS (SELECT 1 FROM {prev} s
                        WHERE s.q_id = c.q_id AND s.vec_id = c.vec_id)
    ),
    ms{step} AS (
      SELECT p.q_id, p.d_id AS vec_id, max(p.psim) AS max_sim_selected
      FROM pairs p JOIN {prev} s
        ON s.q_id = p.q_id AND s.vec_id = p.s_id
      GROUP BY p.q_id, p.d_id
    ),
    pick{step} AS (
      SELECT q_id, vec_id, {step} AS step, rel, max_sim_selected,
             {_mmr_score_sql("rel", "max_sim_selected")} AS mmr
      FROM (
        SELECT r.q_id, r.vec_id, r.rel, m.max_sim_selected,
               row_number() OVER (
                 PARTITION BY r.q_id
                 ORDER BY {_mmr_score_sql("r.rel", "m.max_sim_selected")}
                          DESC,
                          r.vec_id) AS rn
        FROM rem{step} r
        JOIN ms{step} m ON m.q_id = r.q_id AND m.vec_id = r.vec_id
      ) WHERE rn = 1
    ),
    sel{step} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM pick{step})"""
        )
        prev = f"sel{step}"
    parts.append(
        f"""
    SELECT q_id, vec_id, CAST(step AS INTEGER) AS step, rel,
           max_sim_selected, mmr
    FROM {prev}"""
    )
    return "".join(parts)


@query("mmr_diversified_topk", _mmr_oracle_sql())
def q_mmr_diversified(spark, sf_dir):
    """MMR re-ranking: per query, a 12-candidate cosine shortlist is
    greedily reduced to 5 picks maximizing 0.7*relevance - 0.3*max
    similarity to already-picked docs — the standard redundancy
    control in retrieval serving (and in training-data selection,
    where it picks diverse exemplars instead of five paraphrases of
    the same document).

    Scale: the corpus is scanned ONCE for the shortlist (same funnel
    as two_stage_rerank_topk); the candidate and pair frames are
    queries x C and queries x C^2 rows (bounded by config), and the
    ENTIRE K-step greedy runs as ONE applyInPandas over the per-q_id
    groups of that bounded frame — one shuffle + one Arrow stage,
    instead of K-1 rounds of anti-join/join/window/union whose ~10 s
    of pure job-scheduling overhead dominated the round-6 bench.
    Selection cost stays independent of corpus size; the per-group
    state is C candidates + C^2 pair sims (144 floats).

    Cross-engine exactness: pair/query similarities are rounded to
    6 dp IN SPARK (the sequential-fold _dot, identical to the
    oracle's), and the greedy recomputes the MMR score with Python
    Decimal — Decimal(repr(x)).quantize(1e-6, HALF_UP) is
    bit-equivalent to Spark's double->DECIMAL(9,6) cast (both go
    through shortest-string repr then HALF_UP), and 0.7/0.3 are exact
    DECIMAL(2,1) on all three engines — so scores, ordering, and
    hashes match _mmr_oracle_sql exactly."""
    from commercial_rfp_data_pipeline_spark.operators.vector import _dot, _norm

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    rel = F.round(
        _dot(F.col("v"), F.col("q_vec"))
        / (_norm(F.col("v")) * _norm(F.col("q_vec"))),
        6,
    )
    w = Window.partitionBy("q_id").orderBy(F.col("rel").desc(), F.col("vec_id"))
    cand = pin(
        e.join(F.broadcast(q), e.vec_id != q.q_id)
        .select("q_id", "vec_id", rel.alias("rel"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MMR_C)
        .drop("rn")
    )
    cv = cand.join(e, "vec_id").select("q_id", "vec_id", "rel", "v")
    a, b = cv.alias("a"), cv.alias("b")
    psim = F.round(
        _dot(F.col("a.v"), F.col("b.v"))
        / (_norm(F.col("a.v")) * _norm(F.col("b.v"))),
        6,
    )
    pairs = a.join(
        b,
        (F.col("a.q_id") == F.col("b.q_id"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.q_id").alias("q_id"),
        F.col("a.vec_id").alias("d_id"),
        F.col("b.vec_id").alias("s_id"),
        psim.alias("psim"),
    )
    # one frame per q_id group: candidate rows (kind 'c') + pair rows
    # (kind 'p'); the whole greedy runs group-locally in one Arrow pass
    grouped = cand.select(
        "q_id",
        F.lit("c").alias("kind"),
        "vec_id",
        "rel",
        F.lit(None).cast("long").alias("s_id"),
        F.lit(None).cast("double").alias("psim"),
    ).unionByName(
        pairs.select(
            "q_id",
            F.lit("p").alias("kind"),
            F.col("d_id").alias("vec_id"),
            F.lit(None).cast("double").alias("rel"),
            "s_id",
            "psim",
        )
    )
    n_steps = _MMR_K
    lam_s, mu_s = str(_MMR_LAMBDA), str(round(1.0 - _MMR_LAMBDA, 6))

    def greedy(pdf):
        import pandas as pd
        from decimal import ROUND_HALF_UP, Decimal

        six = Decimal("0.000001")
        lam, mu = Decimal(lam_s), Decimal(mu_s)

        def d6(x):
            # bit-equivalent to Spark's double -> DECIMAL(9,6) cast:
            # shortest-string repr, then setScale(6, HALF_UP)
            return Decimal(repr(float(x))).quantize(
                six, rounding=ROUND_HALF_UP
            )

        qid = int(pdf["q_id"].iloc[0])
        cs = pdf[pdf["kind"] == "c"]
        rels = {
            int(v): float(r) for v, r in zip(cs["vec_id"], cs["rel"])
        }
        ps = pdf[pdf["kind"] == "p"]
        sims = {
            (int(d), int(s)): float(x)
            for d, s, x in zip(ps["vec_id"], ps["s_id"], ps["psim"])
        }
        if not rels:  # degenerate group: pair rows without candidates
            return pd.DataFrame(
                columns=[
                    "q_id",
                    "vec_id",
                    "step",
                    "rel",
                    "max_sim_selected",
                    "mmr",
                ]
            )
        first = min(rels, key=lambda v: (-rels[v], v))
        out = [
            (qid, first, 1, rels[first], 0.0, float(lam * d6(rels[first])))
        ]
        selected = [first]
        for step in range(2, n_steps + 1):
            best = None
            for v, r in rels.items():
                if v in selected:
                    continue
                # sims.get: a pair row can be absent when the join
                # produced a partial shortlist — degrade like the
                # pre-fusion DataFrame form instead of KeyError
                ms = max(sims.get((v, s), 0.0) for s in selected)
                mmr = float(lam * d6(r) - mu * d6(ms))
                k = (-mmr, v)
                if best is None or k < best[0]:
                    best = (k, v, r, ms, mmr)
            if best is None:  # shortlist exhausted before k steps
                break
            _, v, r, ms, mmr = best
            out.append((qid, v, step, r, ms, mmr))
            selected.append(v)
        return pd.DataFrame(
            out,
            columns=[
                "q_id",
                "vec_id",
                "step",
                "rel",
                "max_sim_selected",
                "mmr",
            ],
        )

    return grouped.groupBy("q_id").applyInPandas(
        greedy,
        schema=(
            "q_id long, vec_id long, step int, rel double, "
            "max_sim_selected double, mmr double"
        ),
    )


# ---- context budget packing (RAG prompt assembly) --------------------
# The serving step between retrieval and the LLM call: the ranked
# shortlist must fit a fixed context-token budget. The deterministic
# distributed form is prefix packing — admit candidates in rank order
# while the running token total stays within budget (the greedy-skip
# variant is sequential state; prefix packing is what production RAG
# stacks run because it never reorders by size, preserving rank).
_CTX_C = 20  # shortlist per query
_CTX_BUDGET = 1200  # token budget per prompt

_CTX_SQL = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < {N_QUERIES}),
    toks AS (
      SELECT doc_id,
             CAST(CASE WHEN length(lower(trim(regexp_replace(
                    CAST(text AS VARCHAR), '\\s+', ' ', 'g')))) = 0 THEN 0
                  ELSE len(string_split(lower(trim(regexp_replace(
                    CAST(text AS VARCHAR), '\\s+', ' ', 'g'))), ' '))
             END AS BIGINT) AS n_tokens
      FROM documents
    ),
    cand AS (
      SELECT q_id, vec_id, sim, rnk FROM (
        SELECT q.q_id, e.vec_id,
               round(list_cosine_similarity(e.v, q.q_vec), 6) AS sim,
               row_number() OVER (
                 PARTITION BY q.q_id
                 ORDER BY round(list_cosine_similarity(e.v, q.q_vec), 6)
                          DESC, e.vec_id) AS rnk
        FROM e JOIN q ON e.vec_id <> q.q_id
      ) WHERE rnk <= {_CTX_C}
    ),
    costed AS (
      SELECT c.q_id, c.vec_id, c.sim, c.rnk, t.n_tokens,
             CAST(sum(t.n_tokens) OVER (
               PARTITION BY c.q_id ORDER BY c.rnk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_tokens
      FROM cand c JOIN toks t ON t.doc_id = c.vec_id
    )
    SELECT q_id, vec_id, CAST(rnk AS INTEGER) AS rnk, sim,
           n_tokens, cum_tokens
    FROM costed WHERE cum_tokens <= {_CTX_BUDGET}
"""


@query("context_budget_packing", _CTX_SQL)
def q_context_budget_packing(spark, sf_dir):
    """Prompt-context packing: the cosine top-20 shortlist per query is
    admitted in rank order while the running whitespace-token total
    stays within the 1200-token budget (token counts equi-join from
    the aligned documents table). Output rows are exactly the packed
    context with per-doc and cumulative token costs.

    Scale: the corpus is scanned once for the shortlist; token costs
    attach by equi-join on the candidate rows only (never a corpus
    token pass per query); the prefix sum runs inside a per-query
    window over <= 20 rows."""
    from commercial_rfp_data_pipeline_spark.operators.textops import token_count
    from commercial_rfp_data_pipeline_spark.operators.vector import _dot, _norm

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    sim = F.round(
        _dot(F.col("v"), F.col("q_vec"))
        / (_norm(F.col("v")) * _norm(F.col("q_vec"))),
        6,
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    cand = (
        e.join(F.broadcast(q), e.vec_id != q.q_id)
        .select("q_id", "vec_id", sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _CTX_C)
    )
    toks = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"),
        token_count("text").cast("bigint").alias("n_tokens"),
    )
    wc = (
        Window.partitionBy("q_id")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cand.join(toks, "vec_id")
        .withColumn("cum_tokens", F.sum("n_tokens").over(wc).cast("bigint"))
        .filter(F.col("cum_tokens") <= _CTX_BUDGET)
        .select(
            "q_id",
            "vec_id",
            F.col("rnk").cast("int").alias("rnk"),
            "sim",
            "n_tokens",
            "cum_tokens",
        )
    )
