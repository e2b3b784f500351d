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
    """NOTE for hot pair streams (cross joins): the two norms here are
    per-VECTOR quantities — inlined, they re-evaluate on every PAIR.
    Project `_norm` to a column on each side below the join and divide
    by the attribute product instead (measured 3x on the crossmodal
    mining cross join; an element_at-expanded "codegen friendly" dot
    was tried and measured SLOWER than the HOF form)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def li_maxsim_scores(
    toks: DataFrame,
    qt: DataFrame,
    tokemb: DataFrame,
    cand: DataFrame,
) -> DataFrame | None:
    """Grouped-Arrow MaxSim rescore for the late-interaction query
    (round 11, VERDICT r10 #3 — guide §4.2: hand whole batches to
    vectorized native code instead of streaming |cand| x |q_toks| x
    |doc_toks| cosine rows through interpreted HOF expressions and two
    aggregate exchanges; measured 3.74M interaction rows at sf0.1 from
    only 1,132 candidate pairs).

    Inputs: ``toks`` (doc_id, tok) distinct postings, ``qt``
    (q_id, tok) pruned query tokens, ``tokemb`` (tok, emb) per-token
    vectors, ``cand`` (q_id, doc_id) candidate pairs. Returns
    (q_id, doc_id, li_score, n_qtoks) — bit-identical to the
    two-aggregate SQL form:

    - cosines replicate `_dot`/`_norm` exactly: the dot is the
      sequential left-fold over zip products (acc + a_j*b_j, element
      order) vectorized across rows; norms the same fold of squares;
      one divide by the pre-multiplied norm product;
    - max-then-round == round-then-max (round is monotone
      nondecreasing), so each query token's MaxSim is the 6-dp
      HALF_UP round of the raw max;
    - the DECIMAL(18,6) sum is replicated in exact integer micro-units
      (the rounded double's shortest repr IS its 6-dp decimal), and
      the final decimal->double cast is Python float(Decimal) — both
      correctly rounded.

    The q-side vectors and the candidate map are QUERY-BATCH-bounded
    (the serving contract), so they ride driver collects under the
    documented bounded-probe discipline (cap via
    SPARK_GRAFT_LI_ARROW_CAP, default 500k rows; over cap, or under
    SPARK_GRAFT_LI_ARROW=0, returns None and the caller keeps the
    distributed SQL form). The corpus-scale side — candidate doc
    tokens — stays distributed: grouped by a synthetic
    pmod(xxhash64(doc_id)) key (guide §2.5) into one
    FlatMapGroupsInPandas pass whose per-doc work is one (t_q x 8) @
    (8 x t_d) accumulation."""
    import os as _os

    if _os.environ.get("SPARK_GRAFT_LI_ARROW", "1") in ("0", "false"):
        return None
    import numpy as np
    import pandas as pd

    spark = toks.sparkSession
    cap = int(_os.environ.get("SPARK_GRAFT_LI_ARROW_CAP", "500000"))
    qp = (
        qt.select("q_id", "tok")
        .join(tokemb, "tok")
        .select("q_id", "emb")
        .limit(cap + 1)
        .toPandas()
    )
    if len(qp) > cap:
        return None
    cp = cand.select("q_id", "doc_id").limit(cap + 1).toPandas()
    if len(cp) > cap:
        return None

    def _fold_norms(M: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(len(M))
        for j in range(M.shape[1]):
            acc = acc + M[:, j] * M[:, j]
        return np.sqrt(acc)

    qstate: dict = {}
    for qi, g in qp.groupby("q_id"):
        Q = np.array(g["emb"].tolist(), dtype=np.float64)
        qstate[int(qi)] = (Q, _fold_norms(Q))
    cand_map: dict = {}
    for qi, di in zip(
        cp["q_id"].to_numpy().tolist(), cp["doc_id"].to_numpy().tolist()
    ):
        cand_map.setdefault(di, []).append(qi)

    b_q = spark.sparkContext.broadcast(qstate)
    b_c = spark.sparkContext.broadcast(cand_map)

    def _score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        from decimal import Decimal

        qs, cm = b_q.value, b_c.value
        rows: list = []
        for doc_id, g in pdf.groupby("doc_id"):
            qids = cm.get(doc_id)
            if not qids:
                continue
            D = np.array(g["emb"].tolist(), dtype=np.float64)
            ndv = _fold_norms(D)
            for qi in qids:
                Q, nqv = qs[qi]
                acc = np.zeros((Q.shape[0], D.shape[0]))
                for j in range(Q.shape[1]):
                    acc = acc + Q[:, j][:, None] * D[:, j][None, :]
                cs = acc / (nqv[:, None] * ndv[None, :])
                micro = 0
                for x in cs.max(axis=1).tolist():
                    micro += int(
                        Decimal(repr(_round6_half_up(x))).scaleb(6)
                    )
                rows.append(
                    (
                        qi,
                        doc_id,
                        float(Decimal(micro).scaleb(-6)),
                        Q.shape[0],
                    )
                )
        return pd.DataFrame(
            rows, columns=["q_id", "doc_id", "li_score", "n_qtoks"]
        )

    n_groups = spark.sparkContext.defaultParallelism * 8
    # the candidate DOC list comes from the already-collected pairs —
    # re-deriving it from `cand` would re-run the corpus-scale
    # qt⨝postings join a second time just to build the broadcast
    cand_docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": sorted(cand_map)}),
        f"doc_id {cand.schema['doc_id'].dataType.simpleString()}",
    )
    dstream = (
        toks.join(F.broadcast(cand_docs), "doc_id")
        .join(F.broadcast(tokemb), "tok")
        .select("doc_id", "emb")
    )
    return dstream.groupBy(
        F.pmod(F.xxhash64("doc_id"), F.lit(n_groups)).alias("_g")
    ).applyInPandas(
        _score, "q_id long, doc_id long, li_score double, n_qtoks int"
    )


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
    (sim DESC, vec_id) ranking, sim rounded to 6 dp.

    Norms are precomputed per VECTOR (narrow map on each side) rather
    than per pair — cuts per-pair work from three array reductions to
    one, with bit-identical floats (the same expressions run on the
    same arrays, just once). Measured ~2x on the cosine-bound path."""
    vn = vectors.withColumn("_n", _norm(F.col(vec_col)))
    qn = queries.withColumn("_qn", _norm(F.col(q_vec_col)))
    j = vn.crossJoin(F.broadcast(qn))
    j = j.filter(F.col(id_col) != F.col(q_id_col))
    sim = F.round(
        _dot(F.col(vec_col), F.col(q_vec_col)) / (F.col("_n") * F.col("_qn")), 6
    )
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
    n_blocks: int = 8,
    small_side: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold —
    EXACT all-pairs, fully distributed (no driver collect).

    Default path: **block-grid all-pairs matmul**. Each vector hashes
    into one of ``n_blocks`` blocks; each row is replicated to the
    ``n_blocks`` unordered block-pairs containing its block; one
    ``applyInPandas`` per block-pair runs a BLAS matmul between the two
    blocks (unit-normalized, so the product IS the cosine). Exactness
    is preserved because every unordered id pair lands in exactly one
    block-pair group.

    Scale: shuffle volume = n_blocks x corpus; per-task memory =
    2 x (n / n_blocks) x dim x 8 bytes — size n_blocks so a block
    pair fits an executor (e.g. 100M x 768-dim rows with n_blocks=512
    is ~2.3 GB per task). Compute stays O(n^2) as all-pairs must; for
    approximate mode at extreme scale, prefilter with ``lsh_buckets``
    and feed each bucket through this same kernel.

    ``small_side=True`` keeps the old broadcast kernel (corpus
    collected + broadcast, distributed side streams through
    ``mapInPandas``) for when one side is known tiny."""
    import numpy as np
    import pandas as pd

    if small_side:
        pdf = vectors.select(id_col, vec_col).toPandas()
        ids = pdf[id_col].to_numpy()
        mat = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        spark = vectors.sparkSession
        b = spark.sparkContext.broadcast((ids, mat))

        def run(batches):
            b_ids, b_mat = b.value
            for block in batches:
                rows_ids = block[id_col].to_numpy()
                rows = np.array([list(v) for v in block[vec_col]], dtype=np.float64)
                rows = rows / np.linalg.norm(rows, axis=1, keepdims=True)
                sims = np.round(rows @ b_mat.T, 6)
                ia, ib = np.nonzero(sims >= threshold)
                keep = rows_ids[ia] < b_ids[ib]
                yield pd.DataFrame(
                    {
                        "id_a": rows_ids[ia[keep]],
                        "id_b": b_ids[ib[keep]],
                        "sim": sims[ia[keep], ib[keep]],
                    }
                )

        return vectors.mapInPandas(run, schema="id_a long, id_b long, sim double")

    blocked = vectors.select(
        id_col,
        vec_col,
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
    )
    # row in block b joins every unordered pair {b, j}: key = lo*NB + hi
    pair_keys = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_blocks - 1)),
            lambda j: F.least(F.col("_blk"), j) * n_blocks
            + F.greatest(F.col("_blk"), j),
        )
    )
    exploded = blocked.withColumn("_pk", F.explode(pair_keys))

    def grid_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pa, pb = divmod(int(pdf["_pk"].iloc[0]), n_blocks)
        ids = pdf[id_col].to_numpy()
        mat = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        if pa == pb:
            sims = np.round(mat @ mat.T, 6)
            ia, ib = np.nonzero(sims >= threshold)
            keep = ids[ia] < ids[ib]
            return pd.DataFrame(
                {
                    "id_a": ids[ia[keep]],
                    "id_b": ids[ib[keep]],
                    "sim": sims[ia[keep], ib[keep]],
                }
            )
        blks = pdf["_blk"].to_numpy()
        a_mask, b_mask = blks == pa, blks == pb
        sims = np.round(mat[a_mask] @ mat[b_mask].T, 6)
        ia, ib = np.nonzero(sims >= threshold)
        ida, idb = ids[a_mask][ia], ids[b_mask][ib]
        return pd.DataFrame(
            {
                "id_a": np.minimum(ida, idb),
                "id_b": np.maximum(ida, idb),
                "sim": sims[ia, ib],
            }
        )

    return exploded.groupBy("_pk").applyInPandas(
        grid_cell, schema="id_a long, id_b long, sim double"
    )


def embedding_neardup_pairs_lsh(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_bits: int = 4,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """APPROXIMATE embedding near-dup pairs: candidates are restricted
    to LSH bucket-mates in ANY of ``n_tables`` tables (multi-table
    sign-random-projection, deterministic Gaussian planes), scored
    exactly with a per-bucket BLAS matmul, multi-table duplicates
    collapsed by a pair-keyed aggregate. The extreme-scale path:
    compute drops from O(n^2) to L * sum(bucket^2); pair recall vs
    ``embedding_neardup_pairs`` is 1 - (1 - p^k)^L with
    p = 1 - theta/pi — tuned by (n_bits, n_tables) — and because the
    bucketing is deterministic the WHOLE approximate path stays
    oracle-checkable."""
    import numpy as np
    import pandas as pd

    bucketed = lsh_buckets_multi(vectors, dim, n_bits, n_tables, vec_col)

    def cell(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        mat = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = np.round(mat @ mat.T, 6)
        ia, ib = np.nonzero(sims >= threshold)
        keep = ids[ia] < ids[ib]
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "sim": sims[ia[keep], ib[keep]],
            }
        )

    cells = bucketed.groupBy("tbl", "bucket").applyInPandas(
        cell, schema="id_a long, id_b long, sim double"
    )
    # a pair colliding in several tables appears once per table with an
    # identical exact score — collapse with one (pair)-keyed aggregate
    return cells.groupBy("id_a", "id_b").agg(F.min("sim").alias("sim"))


def _hyperplane(dim: int, bit: int) -> list[float]:
    """Deterministic GAUSSIAN hyperplane: component j of plane b is a
    standard-normal draw via Box-Muller over two md5-derived uniforms
    (u1 from md5('plane:b:j:u1'), u2 likewise) — i.i.d.-quality
    components (sign-random-projection LSH's collision bound
    P[collide] = 1 - theta/pi assumes Gaussian planes), yet fully
    deterministic: the driver computes the constants once and embeds
    them as literals in both the Spark plan and the oracle SQL, so the
    bucketing stays engine-agnostic and oracle-checkable. Replaces an
    earlier sin-sequence stand-in whose components were correlated at
    some dims."""
    import hashlib
    import math

    def unif(tag: str) -> float:
        h = hashlib.md5(tag.encode()).hexdigest()
        # 52 bits of the digest -> uniform in (0, 1]; +1 avoids log(0)
        return (int(h[:13], 16) + 1) / float(16**13)

    out = []
    for j in range(dim):
        u1 = unif(f"plane:{bit}:{j}:u1")
        u2 = unif(f"plane:{bit}:{j}:u2")
        out.append(math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2))
    return out


def _bit_sql(vec_col: str, plane: list[float]) -> str:
    """SQL text for one sign bit: the SAME fold as ``_dot`` (zip_with
    multiply, sequential left-fold add from 0.0D), planes embedded as
    D-suffixed shortest-repr literals — ``repr(x) + 'D'`` parses to the
    bit-identical IEEE double ``F.lit(x)`` would produce. Built as TEXT
    so the JVM parses the whole bucketing projection in one call:
    constructing the same tree through the py4j Column API costs one
    bridge round-trip per node (24 planes x 64 components ≈ 1,536
    literal nodes — measured ~5 s of pure DataFrame-construction time
    per knn_lsh call at DIM=64), while parsing the equivalent SQL
    string is milliseconds. Expression-for-expression the analyzed plan
    is unchanged."""
    arr = "array(" + ",".join(repr(x) + "D" for x in plane) + ")"
    dot = (
        f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> x * y), "
        "0.0D, (acc, x) -> acc + x)"
    )
    return f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END"


def lsh_buckets(
    vectors: DataFrame,
    dim: int,
    n_bits: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection LSH: bucket = concat of sign bits of
    <v, plane_b>. Cosine-similar vectors collide with probability
    1 - theta/pi per bit. Narrow map; bucket id is a short string."""
    bits = [_bit_sql(vec_col, _hyperplane(dim, b)) for b in range(n_bits)]
    return vectors.withColumn("bucket", F.expr(f"concat({', '.join(bits)})"))


def lsh_buckets_multi(
    vectors: DataFrame,
    dim: int,
    n_bits: int = 4,
    n_tables: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table LSH (OR-amplification): ``n_tables`` independent
    sign-random-projection tables of ``n_bits`` each; a pair is a
    candidate if it collides in ANY table. With per-bit agreement
    p = 1 - theta/pi, candidate probability is 1 - (1 - p^k)^L — the
    standard recall knob single-table LSH lacks (honest Gaussian planes
    at 6 bits give only ~5% recall on near-orthogonal corpora; four
    4-bit tables lift that to ~45% at the same per-table cost). Table t
    draws planes t*n_bits..t*n_bits+n_bits-1, so table 0 of a k-bit
    config is exactly ``lsh_buckets(n_bits=k)``.

    Output: input columns + (tbl, bucket), one row per table — an
    L-times narrow expansion of ids and vectors, no shuffle."""
    tbl_structs = []
    for t in range(n_tables):
        bits = [
            _bit_sql(vec_col, _hyperplane(dim, t * n_bits + b))
            for b in range(n_bits)
        ]
        tbl_structs.append(
            f"struct({t} AS tbl, concat({', '.join(bits)}) AS bucket)"
        )
    exploded = vectors.withColumn(
        "_tb", F.explode(F.expr(f"array({', '.join(tbl_structs)})"))
    )
    return exploded.select(
        *vectors.columns,
        F.col("_tb.tbl").alias("tbl"),
        F.col("_tb.bucket").alias("bucket"),
    )


def knn_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 4,
    n_tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """ANN top-k via multi-table LSH: candidates = bucket collisions in
    ANY of the ``n_tables`` tables, exact cosine re-rank inside the
    candidate set, multi-table duplicates collapsed by a (q, id)
    aggregate (sim is identical across tables, so min == the value).
    Recall < 1 by construction; the exact path is the oracle, and
    1-(1-p^k)^L sets the recall/cost trade.

    Scale: per query the probed set is ~L * n/2^k corpus rows; the
    dedup aggregate shuffles only (q_id, id, sim) candidate triples."""
    vn = vectors.withColumn("_n", _norm(F.col(vec_col)))
    vb = lsh_buckets_multi(vn, dim, n_bits, n_tables, vec_col)
    qn = (
        queries.withColumnRenamed(q_vec_col, vec_col)
        .withColumn("_qn", _norm(F.col(vec_col)))
    )
    qb = lsh_buckets_multi(qn, dim, n_bits, n_tables, vec_col).withColumnRenamed(
        vec_col, q_vec_col
    )
    j = vb.join(F.broadcast(qb), ["tbl", "bucket"]).filter(
        F.col(id_col) != F.col(q_id_col)
    )
    sim = F.round(
        _dot(F.col(vec_col), F.col(q_vec_col)) / (F.col("_n") * F.col("_qn")), 6
    )
    cand = (
        j.select(F.col(q_id_col), F.col(id_col), sim.alias("sim"))
        .groupBy(q_id_col, id_col)
        .agg(F.min("sim").alias("sim"))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return cand.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "ivf",
    n_iters: int = 2,
) -> DataFrame:
    """Deterministic k-means coarse centroids for IVF.

    Init: seeded hash-sample — rank corpus vectors by
    ``md5(seed || id)`` and take the first ``n_centroids`` (valid for
    ANY id distribution; md5 hex is identical in Spark and DuckDB so
    the choice is oracle-reproducible; orderBy().limit() compiles to
    TakeOrdered — per-partition partial top-k, no global sort).

    Then ``n_iters`` LLOYD ROUNDS, each fully distributed and fully
    deterministic: broadcast the (tiny) centroid table, assign every
    vector to its nearest centroid by rounded cosine (max_by with an
    explicit (sim, -cent_id) tiebreak — map-side collapse, the shuffle
    moves one row per vector), recompute each centroid as its members'
    per-component mean (posexplode -> groupBy(cent_id, idx) avg —
    partial aggregation map-side), components rounded to 6 dp so both
    engines see bit-identical centroid tables. A cluster that loses
    all members keeps its INIT vector (coalesce against the init
    table), so the centroid count never silently drops. Fixed
    iteration count + md5 init keeps the whole construction
    SQL-expressible — the oracle states the same rounds as CTEs.

    Shape at 100 TB: each round is one broadcast-join corpus scan plus
    one (cent_id, idx) aggregation of k x dim rows — the standard
    distributed k-means cost, linear per round, nothing
    driver-resident. Real recall needs trained centroids, not a
    sample: members then cluster around actual density modes, so the
    per-cell occupancy the probe cost depends on is balanced."""
    h = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    init = (
        vectors.select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("cent_vec"),
            h.alias("_h"),
        )
        .orderBy("_h", "cent_id")
        .limit(n_centroids)
        .select("cent_id", "cent_vec")
    )
    cents = init.select(
        "cent_id", "cent_vec", _norm(F.col("cent_vec")).alias("_cn")
    )
    vn = vectors.withColumn("_n", _norm(F.col(vec_col)))
    for _ in range(n_iters):
        j = vn.crossJoin(F.broadcast(cents))
        sim = F.round(
            _dot(F.col(vec_col), F.col("cent_vec")) / (F.col("_n") * F.col("_cn")), 6
        )
        scored = j.select(id_col, vec_col, "cent_id", sim.alias("cent_sim"))
        best = scored.groupBy(id_col).agg(
            F.max_by(
                F.struct("cent_id", vec_col),
                F.struct(F.col("cent_sim"), (-F.col("cent_id")).alias("_neg")),
            ).alias("_b")
        )
        assigned = best.select(
            F.col("_b.cent_id").alias("cent_id"),
            F.col(f"_b.{vec_col}").alias(vec_col),
        )
        comp = assigned.select("cent_id", F.posexplode(vec_col).alias("idx", "x"))
        means = comp.groupBy("cent_id", "idx").agg(
            F.round(F.avg("x"), 6).alias("m")
        )
        newc = means.groupBy("cent_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "m"))),
                lambda s: s["m"],
            ).alias("cent_vec")
        )
        cents = (
            init.select("cent_id", F.col("cent_vec").alias("_init_vec"))
            .join(newc, "cent_id", "left")
            .select(
                "cent_id",
                F.coalesce("cent_vec", "_init_vec").alias("cent_vec"),
            )
            .withColumn("_cn", _norm(F.col("cent_vec")))
        )
    return cents


def ivf_assign(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantization: each vector joins its nearest centroid
    by cosine. Broadcast centroids; one narrow pass. Pass a prebuilt
    (persisted) ``cents`` to share the index across assign + probe —
    ivf_search does. Output keeps the vector and its norm so callers
    rank within cells without recomputing either.

    The per-vector argmax is ``max_by`` with an explicit
    (cent_sim, -cent_id) tiebreak struct, NOT a row_number window:
    after the broadcast join every vector's centroid rows are already
    co-located, so the partial aggregate collapses to one row per
    vector map-side and the shuffle moves n rows, not n*k."""
    if cents is None:
        cents = ivf_centroids(vectors, n_centroids, id_col, vec_col)
    vn = vectors.withColumn("_n", _norm(F.col(vec_col)))
    j = vn.crossJoin(F.broadcast(cents))
    sim = _dot(F.col(vec_col), F.col("cent_vec")) / (F.col("_n") * F.col("_cn"))
    scored = j.select(
        id_col, vec_col, "_n", "cent_id", F.round(sim, 6).alias("cent_sim")
    )
    best = scored.groupBy(id_col).agg(
        F.max_by(
            F.struct("cent_id", "cent_sim", vec_col, "_n"),
            F.struct(F.col("cent_sim"), (-F.col("cent_id")).alias("_neg")),
        ).alias("_b")
    )
    return best.select(
        id_col,
        F.col(f"_b.{vec_col}").alias(vec_col),
        F.col("_b._n").alias("_n"),
        F.col("_b.cent_id").alias("cent_id"),
        F.col("_b.cent_sim").alias("cent_sim"),
    )


def ivf_search(
    vectors: DataFrame | None,
    queries: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    cents: DataFrame | None = None,
    assigned: DataFrame | None = None,
    match_cols: tuple[str, str] | None = None,
) -> DataFrame:
    """Full IVF top-k: corpus vectors live in their nearest-centroid
    cell (ivf_assign); each query probes its ``nprobe`` nearest cells
    and ranks exactly within them. Deterministic end to end (centroid
    choice, probe order, (sim DESC, id) ranking) so the whole ANN path
    is SQL-expressible and oracle-checked — recall loss vs knn_exact is
    a property of the probe count, not nondeterminism.

    ``match_cols=(corpus_col, query_col)`` adds a metadata equality
    filter INSIDE the probed cells (the FAISS IDSelector / filtered-
    ANN pattern): candidates failing the predicate drop before any
    similarity math, so a label-scoped search pays only for matching
    rows in the probed cells — prefiltering at the inverted-list
    level, not a post-rank filter that silently returns < k.
    ``vectors`` (or ``assigned``) must carry ``corpus_col``;
    ``queries`` must carry ``query_col``.

    Shape at scale: the centroid table is built ONCE and persisted (it
    is n_centroids rows), then broadcast to both the corpus assignment
    and the query probing — the corpus scan behind it runs a single
    time instead of three. The probe join shuffles on cent_id, so
    per-query work is the probed cells' occupancy (~ nprobe * n /
    n_centroids), not the whole corpus. The cell layout is the same
    partitioning a persisted IVF index would use (partitionBy(cent_id)
    parquet — plans.index_lifecycle.ensure_ivf_index materializes
    exactly that and passes the read-back tables in via
    ``cents``/``assigned``)."""
    from commercial_rfp_data_pipeline_spark.io import pin

    if match_cols is not None:
        # validate the contract up front with a descriptive error —
        # an AnalysisException deep in the probe join is not a usable
        # diagnosis for "your assigned table lacks the metadata column"
        corpus_src = assigned if assigned is not None else vectors
        if match_cols[0] not in corpus_src.columns:
            raise ValueError(
                f"ivf_search: match_cols[0]={match_cols[0]!r} not in the "
                f"{'assigned' if assigned is not None else 'vectors'} "
                f"columns {corpus_src.columns} — a filtered search needs "
                "the metadata column stored alongside the cell layout"
            )
        if match_cols[1] not in queries.columns:
            raise ValueError(
                f"ivf_search: match_cols[1]={match_cols[1]!r} not in the "
                f"queries columns {queries.columns}"
            )
    if cents is None:
        cents = pin(ivf_centroids(vectors, n_centroids, id_col, vec_col))
    if assigned is None:
        assigned = ivf_assign(
            vectors, n_centroids, id_col, vec_col, cents=cents
        ).select(id_col, vec_col, "cent_id", "_n")
        if match_cols is not None:
            # re-attach the filterable metadata column (ivf_assign's
            # argmax carries only the vector); one narrow equi-join —
            # a persisted index would store the column in the cell
            # layout to begin with
            assigned = assigned.join(
                vectors.select(id_col, match_cols[0]), id_col
            )
    if match_cols is not None:
        # distinct internal aliases: if the corpus and query metadata
        # columns share a name, the post-join equality would otherwise
        # be an ambiguous reference
        assigned = assigned.withColumn("_mc_c", F.col(match_cols[0]))
    qn = queries.withColumn("_qn", _norm(F.col(q_vec_col)))
    qj = qn.crossJoin(F.broadcast(cents))
    qsim = F.round(
        _dot(F.col(q_vec_col), F.col("cent_vec")) / (F.col("_qn") * F.col("_cn")), 6
    )
    wq = Window.partitionBy(q_id_col).orderBy(F.col("probe_sim").desc(), F.col("cent_id"))
    probe_exprs = [F.col(q_id_col), F.col(q_vec_col), F.col("_qn"), F.col("cent_id")]
    probe_names = [q_id_col, q_vec_col, "_qn", "cent_id"]
    if match_cols is not None:
        probe_exprs.append(F.col(match_cols[1]).alias("_mc_q"))
        probe_names.append("_mc_q")
    probes = (
        qj.select(*probe_exprs, qsim.alias("probe_sim"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select(*probe_names)
    )
    j = assigned.join(F.broadcast(probes), "cent_id").filter(
        F.col(id_col) != F.col(q_id_col)
    )
    if match_cols is not None:
        # inverted-list-level prefilter: non-matching candidates drop
        # BEFORE any similarity math (aliased sides, so same-named
        # corpus/query metadata columns cannot collide)
        j = j.filter(F.col("_mc_c") == F.col("_mc_q"))
    sim = F.round(
        _dot(F.col(vec_col), F.col(q_vec_col)) / (F.col("_n") * F.col("_qn")), 6
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        j.select(F.col(q_id_col), F.col(id_col), sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = round(x_i / scale) in [-127, 127] — the standard 4x memory
    cut an ANN index takes before serving at 100-TB scale (a float32
    corpus of 10^10 x 768-dim vectors is ~30 TB; int8 fits the same
    index in ~7.5 TB and dot products vectorize to VPMADDUBSW-class
    kernels JVM-side or in the serving layer).

    Rounding is floor(x/scale + 0.5) — half-toward-+inf in BOTH engines
    (Spark's round() on doubles is HALF_UP while DuckDB's is
    half-away-from-zero; writing the floor form removes the drift for
    negative .5 boundaries). All-zero vectors get scale 1.0 so q = 0
    without a divide-by-zero. Narrow map, no shuffle; exact arithmetic
    -> fully oracle-checkable.

    Output: (id, scale rounded 9, qvec array<int>, n_dims)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(v, F.abs))
    scale = F.when(max_abs == 0, F.lit(1.0)).otherwise(max_abs / F.lit(127.0))
    # projection barrier: without it the scale expression (array_max
    # over a transform) re-inlines into the per-element lambda — O(d^2)
    # work per row; as a projected attribute it evaluates once per row
    base = df.select(F.col(id_col), v.alias("_v"), scale.alias("_s"))
    return base.select(
        F.col(id_col),
        F.round("_s", 9).alias("scale"),
        F.transform(
            "_v", lambda x: F.floor(x / F.col("_s") + F.lit(0.5)).cast("int")
        ).alias("qvec"),
        F.size("_v").alias("n_dims"),
    )


def quantize_binary(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """1-bit sign quantization packed into 64-bit words: bit i of word
    w is 1 iff component (w*64 + i) > 0 — the 32x memory cut below
    int8 (a 10^10 x 768-dim float32 corpus is ~30 TB; sign bits fit it
    in ~1 TB, RAM-resident on a modest cluster) and the coarse stage of
    the binary-quantization serving pattern: Hamming distance over the
    packed words via ``bit_count(a XOR b)`` — one fused-codegen integer
    op per 64 dims, no float math — shortlists candidates that a float
    rescore then ranks exactly.

    Packing is pure bitwise (shiftleft + OR inside an aggregate HOF),
    so ANSI mode cannot overflow-abort even when bit 63 sets the sign.
    Narrow map, no shuffle, exact arithmetic -> oracle-checkable
    (the oracle states the same bits as sign-mismatch counts over the
    unpacked floats).

    Output: (id, bits array<long> of ceil(d/64) words, n_dims)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col), v.alias("_v"))
    n_words = F.ceil(F.size("_v") / F.lit(64.0)).cast("int")
    packed = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda w: F.aggregate(
            F.sequence(
                w * 64, F.least(w * 64 + 63, F.size("_v") - 1)
            ),
            F.lit(0).cast("long"),
            # the PySpark shiftleft wrapper insists on a literal shift
            # amount; call the SQL function directly — Catalyst's
            # ShiftLeft is (expr, expr) and takes the lambda variable
            lambda acc, i: acc.bitwiseOR(
                F.call_function(
                    "shiftleft",
                    F.when(F.element_at("_v", i + 1) > 0, F.lit(1))
                    .otherwise(F.lit(0))
                    .cast("long"),
                    (i - w * 64).cast("int"),
                )
            ),
        ),
    )
    # empty vector -> zero words (F.sequence(0, -1) would DESCEND and
    # fabricate two bogus words)
    bits = F.when(F.size("_v") == 0, F.array().cast("array<long>")).otherwise(
        packed
    )
    return base.select(
        F.col(id_col), bits.alias("bits"), F.size("_v").alias("n_dims")
    )


def hamming_distance(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length packed-bit word
    arrays: sum of bit_count(xor) per word — stays integer, stays in
    whole-stage codegen."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("int")


def _pca_local(e, vec_col, id_col, dim, n_iter):
    """Driver-side replica of the power-iteration rounds for bounded
    corpora. Every intermediate the distributed loop materializes is
    rounded to 6 dp (the Lloyd convention) BECAUSE partial-sum order
    differs between engines — the oracle already re-sums every
    aggregate in DuckDB's order and value-matches, so the rounding
    absorbs sum-order residue by construction; the kernel sums with
    numpy under the same 6-dp discipline and is equality-tested against
    the distributed path at every SF. Returns None (caller falls back)
    on oversized input."""
    import numpy as np

    st = _collect_vecs(e, id_col, vec_col, beam_local_limit())
    if st is None:
        return None
    _ids, V, _nv, _pos = st
    n, d = V.shape
    if d != dim:
        return None

    def r6(a):
        # shortest-repr decimal HALF_UP per element — the exact
        # BigDecimal chain Spark's round(double, 6) applies (ADVICE
        # r10: np.round is binary HALF_EVEN and diverges from the
        # distributed path at 6-dp decimal ties). + 0.0 AFTER rounding:
        # BigDecimal.setScale never yields -0.0 — normalize so
        # repr-level value hashes agree
        return (
            np.fromiter(
                (_round6_half_up(float(x)) for x in a),
                np.float64,
                len(a),
            )
            + 0.0
        )

    mu = r6(V.sum(axis=0) / n)
    XC = V - mu
    w = np.full(d, round(1.0 / dim**0.5, 6))
    for _ in range(n_iter):
        s = r6(XC @ w)
        z = r6(XC.T @ s)
        nz = np.sqrt((z * z).sum())
        w = r6(z / nz)
    s = r6(XC @ w)
    ev = _round6_half_up((s * s).sum() / n, dp=4)
    import pandas as pd

    return e.sparkSession.createDataFrame(
        pd.DataFrame(
            {
                "idx": np.arange(1, d + 1, dtype=np.int64),
                "loading": w,
                "eigenvalue": np.full(d, ev),
            }
        ),
        "idx int, loading double, eigenvalue double",
    )


def pca_top_component(
    e: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_iter: int = 3,
) -> DataFrame:
    """Top principal component of an embedding corpus by POWER
    ITERATION on the covariance operator, without ever materializing
    the d x d covariance matrix: w <- normalize( sum_i (x_i . w) x_i )
    over mean-centered vectors, fixed iteration count, deterministic
    start w0 = 1/sqrt(d).

    Returns (idx, loading, eigenvalue): the d loadings of the first
    component plus the Rayleigh-quotient eigenvalue estimate
    sum_i (x_i . w)^2 / n.

    Determinism/oracle discipline: per-component means, per-vector
    dots, per-component accumulations, and normalized loadings all
    round to 6 dp each round (the Lloyd-iteration convention from
    ``ivf_centroids``), so both engines walk the identical float
    trajectory.

    Shape at scale (the reason power iteration is THE 100-TB PCA):
    each iteration is one broadcast of the 64-row w table, one
    groupBy(id) for the dots, and one groupBy(idx) with map-side
    partial sums for the accumulation — no d x d covariance shuffle,
    no driver-side linear algebra; cost is O(nnz) per iteration like
    a sparse matvec. Centered components are computed ONCE and pinned
    across iterations. Corpora under the bounded-collect cap run the
    rounds driver-side (n_iter x 3 chained shuffles of pure overhead
    otherwise), under the same 6-dp-per-intermediate discipline that
    already absorbs engine sum-order differences for the oracle —
    local == distributed equality-tested at every SF."""
    local = _pca_local(e, vec_col, id_col, dim, n_iter)
    if local is not None:
        pca_top_component.last_local = True
        return local
    pca_top_component.last_local = False
    from commercial_rfp_data_pipeline_spark.io import pin

    spark = e.sparkSession
    ex = e.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.transform(vec_col, lambda x: x.cast("double"))).alias(
            "idx0", "x"
        ),
    ).select("vid", (F.col("idx0") + 1).alias("idx"), "x")
    mu = ex.groupBy("idx").agg(F.round(F.avg("x"), 6).alias("mu"))
    xc = pin(
        ex.join(F.broadcast(mu), "idx").select(
            "vid", "idx", (F.col("x") - F.col("mu")).alias("xc")
        )
    )
    w0 = round(1.0 / dim**0.5, 6)
    w = spark.range(1, dim + 1).select(
        F.col("id").cast("int").alias("idx"), F.lit(w0).alias("w")
    )
    for _ in range(n_iter):
        s = (
            xc.join(F.broadcast(w), "idx")
            .groupBy("vid")
            .agg(F.round(F.sum(F.col("xc") * F.col("w")), 6).alias("s"))
        )
        z = (
            xc.join(s, "vid")
            .groupBy("idx")
            .agg(F.round(F.sum(F.col("xc") * F.col("s")), 6).alias("z"))
        )
        nz = z.agg(F.sqrt(F.sum(F.col("z") * F.col("z"))).alias("nz"))
        w = z.crossJoin(F.broadcast(nz)).select(
            "idx", F.round(F.col("z") / F.col("nz"), 6).alias("w")
        )
    sf = (
        xc.join(F.broadcast(w), "idx")
        .groupBy("vid")
        .agg(F.round(F.sum(F.col("xc") * F.col("w")), 6).alias("s"))
    )
    ev = sf.agg(
        F.round(F.sum(F.col("s") * F.col("s")) / F.count(F.lit(1)), 4).alias(
            "eigenvalue"
        )
    )
    return w.crossJoin(F.broadcast(ev)).select(
        "idx", F.col("w").alias("loading"), "eigenvalue"
    )


# ---------------------------------------------------------------- PQ --

PQ_DEC = "decimal(20,9)"


def _sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 distance with per-term 9-dp rounding and an exact
    DECIMAL accumulator: (a_i-b_i)*(a_i-b_i) is one IEEE multiply
    (identical in any engine), the per-term round pins the last ulp,
    and the decimal sum is order-independent — so distances compare
    EXACTLY the same under any partitioning and in the DuckDB oracle
    (double sums would tie-break argmins differently in rare ulp
    collisions)."""
    terms = F.zip_with(a, b, lambda x, y: ((x - y) * (x - y)))
    return F.aggregate(
        terms,
        F.lit(0).cast(PQ_DEC),
        lambda acc, t: (acc + F.round(t, 9).cast(PQ_DEC)).cast(PQ_DEC),
    )


def pq_subvectors(
    vectors: DataFrame,
    dim: int,
    m_sub: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, m, sv): each vector split into ``m_sub`` contiguous
    subvectors of dim/m_sub components — a narrow map, no shuffle."""
    sub = dim // m_sub
    slices = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(F.col(vec_col).cast("array<double>"), m * sub + 1, sub).alias(
                    "sv"
                ),
            )
            for m in range(m_sub)
        ]
    )
    return vectors.select(
        F.col(id_col).alias("vec_id"), F.explode(slices).alias("e")
    ).select("vec_id", F.col("e.m").alias("m"), F.col("e.sv").alias("sv"))


def pq_codebooks(
    vectors: DataFrame,
    dim: int,
    m_sub: int = 4,
    k_codes: int = 8,
    seed: str = "pq",
    n_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic PQ codebooks (m, code_id, code_vec): per
    subspace, md5-hash-sample ``k_codes`` seed subvectors, then
    ``n_iters`` Lloyd rounds under exact-decimal squared-L2 (assign =
    min_by(dist, code_id tiebreak); recompute = per-component mean
    rounded to 6 dp; an emptied code keeps its init subvector).

    Scale shape: identical to ivf_centroids — each round is one
    broadcast-codebook corpus scan plus a (m, code, idx) aggregation;
    the codebook is m_sub*k_codes rows, always broadcast-sized. PQ is
    the memory-side half of a FAISS-style IVF-PQ index: 64 floats
    become m_sub single-byte codes, a 32x shrink of what the ANN
    serving tier must hold."""
    sub = dim // m_sub
    sv = pq_subvectors(vectors, dim, m_sub, id_col, vec_col)
    # per-subspace seeded hash-sample init; orderBy().limit() compiles
    # to TakeOrdered (per-partition partial top-k), looped m_sub times
    inits = []
    for m in range(m_sub):
        h = F.md5(F.concat(F.lit(f"{seed}{m}:"), F.col(id_col).cast("string")))
        inits.append(
            vectors.select(
                F.lit(m).alias("m"),
                F.slice(F.col(vec_col).cast("array<double>"), m * sub + 1, sub).alias(
                    "sv"
                ),
                h.alias("_h"),
                F.col(id_col).alias("_id"),
            )
            .orderBy("_h", "_id")
            .limit(k_codes)
        )
    init_rows = inits[0]
    for other in inits[1:]:
        init_rows = init_rows.unionByName(other)
    w = Window.partitionBy("m").orderBy("_h", "_id")
    init = init_rows.select(
        "m",
        (F.row_number().over(w) - 1).alias("code_id"),
        F.col("sv").alias("code_vec"),
    )
    books = init
    for _ in range(n_iters):
        j = sv.join(F.broadcast(books), "m")
        d = _sq_l2(F.col("sv"), F.col("code_vec"))
        assigned = (
            j.select("vec_id", "m", "sv", "code_id", d.alias("d"))
            .groupBy("vec_id", "m")
            .agg(
                F.min_by(
                    F.struct("code_id", "sv"),
                    F.struct(F.col("d"), F.col("code_id")),
                ).alias("_b")
            )
            .select("m", F.col("_b.code_id").alias("code_id"), F.col("_b.sv").alias("sv"))
        )
        comp = assigned.select(
            "m", "code_id", F.posexplode("sv").alias("idx", "x")
        )
        means = comp.groupBy("m", "code_id", "idx").agg(
            F.round(F.avg("x"), 6).alias("mu")
        )
        newb = means.groupBy("m", "code_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "mu"))),
                lambda s: s["mu"],
            ).alias("code_vec")
        )
        books = (
            init.select("m", "code_id", F.col("code_vec").alias("_init_vec"))
            .join(newb, ["m", "code_id"], "left")
            .select(
                "m",
                "code_id",
                F.coalesce("code_vec", "_init_vec").alias("code_vec"),
            )
        )
    return books


def pq_encode(
    vectors: DataFrame,
    books: DataFrame,
    dim: int,
    m_sub: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, m, code): nearest codebook entry per subspace under
    the same exact-decimal distance — one broadcast join + one
    map-side-combining groupBy over m_sub rows per vector."""
    sv = pq_subvectors(vectors, dim, m_sub, id_col, vec_col)
    j = sv.join(F.broadcast(books), "m")
    d = _sq_l2(F.col("sv"), F.col("code_vec"))
    return (
        j.select("vec_id", "m", "code_id", d.alias("d"))
        .groupBy("vec_id", "m")
        .agg(
            F.min_by(
                "code_id", F.struct(F.col("d"), F.col("code_id"))
            ).alias("code")
        )
    )


def pq_adc_topk(
    vectors: DataFrame,
    query_ids: list[int],
    dim: int,
    m_sub: int = 4,
    k_codes: int = 8,
    k: int = 5,
    n_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: queries stay full-precision, the
    corpus is its PQ codes, and the approximate distance is the sum of
    per-subspace (query-subvector -> code centroid) lookups.

    The lookup table is queries x m_sub x k_codes rows — broadcast —
    so per corpus row the scan does m_sub map-joins and one decimal
    sum: the serving cost that makes PQ the standard RAM-bound ANN
    format. Exact-decimal distances keep the whole path
    oracle-checkable. Pass prebuilt ``books``/``codes`` (the durable
    ensure_pq_models tables) to serve without retraining."""
    from commercial_rfp_data_pipeline_spark.io import pin

    if books is None:
        books = pq_codebooks(
            vectors, dim, m_sub=m_sub, k_codes=k_codes, n_iters=n_iters,
            id_col=id_col, vec_col=vec_col,
        )
    books = pin(books, key="pq_books")
    if codes is None:
        codes = pq_encode(vectors, books, dim, m_sub, id_col, vec_col)
    qsv = pq_subvectors(
        vectors.filter(F.col(id_col).isin(query_ids)), dim, m_sub, id_col, vec_col
    ).select(F.col("vec_id").alias("q_id"), "m", F.col("sv").alias("qsv"))
    lut = qsv.join(F.broadcast(books), "m").select(
        "q_id",
        "m",
        F.col("code_id").alias("code"),
        _sq_l2(F.col("qsv"), F.col("code_vec")).alias("d"),
    )
    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d").alias("adist_dec"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adist_dec"), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "q_id",
            "vec_id",
            F.col("adist_dec").cast("double").alias("adist"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def _kcenter_local(vectors, k, id_col, vec_col, seed):
    """Driver-side replica of the Gonzalez rounds (see kcenter_coreset
    docstring). Returns None (caller falls back) on oversized input or
    non-integer ids."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    cap = beam_local_limit()
    st = _collect_vecs(vectors, id_col, vec_col, cap)
    if st is None:
        return None
    ids, V, _nv, _pos = st
    n, d = V.shape
    q9 = Decimal("0.000000001")

    rows_l = [r.tolist() for r in V]  # python floats: repr() is the
    # bare shortest form Decimal parses (np.float64 repr is not)

    def dist(p: int, sv: list) -> Decimal:
        acc = Decimal(0)
        row = rows_l[p]
        for j in range(d):
            t = (row[j] - sv[j]) * (row[j] - sv[j])
            acc += Decimal(repr(t)).quantize(q9, ROUND_HALF_UP)
        return acc

    # seed: md5(f"{seed}:{id}") min, tiebreak id — ids are sorted, so
    # the first index attaining the min hash is the tiebreak winner
    hashes = [
        hashlib.md5(f"{seed}:{int(i)}".encode()).hexdigest() for i in ids
    ]
    s0 = min(range(n), key=lambda p: (hashes[p], int(ids[p])))
    selected = [(0, int(ids[s0]), None)]
    sel_rows = [rows_l[s0]]
    mind: list = [None] * n
    for rnd in range(1, k):
        sv = sel_rows[-1]
        for p in range(n):
            dnew = dist(p, sv)
            if mind[p] is None or dnew < mind[p]:
                mind[p] = dnew
        far = max(range(n), key=lambda p: (mind[p], -int(ids[p])))
        selected.append((rnd, int(ids[far]), float(mind[far])))
        sel_rows.append(rows_l[far])
    return selected


def kcenter_coreset(
    vectors: DataFrame,
    k: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "core",
) -> "list[tuple[int, int, float | None]]":
    """Greedy k-center / farthest-point coreset (Gonzalez): seed with
    the md5-min vector, then k-1 rounds of 'add the point farthest
    from the selected set' under exact-decimal squared-L2 — the
    diverse-subset selection a training pipeline runs to pick
    representative / hard examples. Returns [(round, id, dist)] where
    dist is the selected point's distance to the prior set (the
    coverage-radius sequence, non-increasing).

    Scale shape: the selected set is <= k rows (broadcast as literal
    expressions); each round is ONE corpus scan computing min-distance
    to the set followed by TakeOrdered(1) — k scans total, nothing
    quadratic. The per-round single-row collect is trainer state, the
    same documented exception as the BPE trainer's argmax.

    Corpora under the bounded-collect cap run the k rounds driver-side
    (k+1 Spark jobs of ~0.5 s pure overhead otherwise — the scan work
    at that size is microseconds): the kernel replicates the md5-min
    seed (hashlib md5 of the decimal id string == Spark's md5), the
    per-term (x-y)*(x-y) IEEE multiply, the shortest-repr HALF_UP
    9-dp term round, and the exact DECIMAL(20,9) sum — equality-tested
    against the distributed path and proven by the green oracle at the
    small SFs."""
    local = _kcenter_local(vectors, k, id_col, vec_col, seed)
    if local is not None:
        kcenter_coreset.last_local = True
        return local
    kcenter_coreset.last_local = False
    arr = F.col(vec_col).cast("array<double>")
    seeded = (
        vectors.select(
            id_col,
            arr.alias("v"),
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))).alias(
                "_h"
            ),
        )
        .orderBy("_h", id_col)
        .limit(1)
        .select(id_col, "v")
        .first()
    )
    selected = [(0, seeded[0], None)]
    sel_vecs = [seeded[1]]
    base = vectors.select(F.col(id_col).alias("id"), arr.alias("v"))

    # the selected vectors are embedded as SQL TEXT, not as py4j-built
    # literal trees: repr(x)+'D' parses to the bit-identical IEEE
    # double F.lit(x) would produce, and one JVM parse replaces one
    # py4j round-trip per literal node (64 components x k(k-1)/2
    # selected-vector references ≈ 1,000 bridge calls — measured ~6 s
    # of pure DataFrame-construction time per call at sf0.1). The
    # analyzed expression — zip_with square, per-term round, exact
    # DECIMAL fold (same as _sq_l2) — is unchanged.
    def _sq_l2_sql(sv: list[float]) -> str:
        arr_sql = "array(" + ",".join(repr(float(x)) + "D" for x in sv) + ")"
        return (
            f"aggregate(zip_with(v, {arr_sql}, (x, y) -> (x - y) * (x - y)), "
            f"CAST(0 AS {PQ_DEC}), "
            f"(acc, t) -> CAST(acc + CAST(round(t, 9) AS {PQ_DEC}) AS {PQ_DEC}))"
        )

    for rnd in range(1, k):
        dists = [F.expr(_sq_l2_sql(sv)) for sv in sel_vecs]
        mind = dists[0]
        for d in dists[1:]:
            mind = F.least(mind, d)
        far = (
            base.select("id", "v", mind.alias("md"))
            .orderBy(F.col("md").desc(), F.col("id"))
            .limit(1)
            .first()
        )
        selected.append((rnd, far["id"], float(far["md"])))
        sel_vecs.append(far["v"])
    return selected

def knn_graph(
    vectors: DataFrame,
    m: int = 4,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT m-nearest-neighbor graph — the build step of a
    navigable-graph ANN index (the reference declares HNSW with m=4,
    commercial_rfp_indexer.py:95-137; the flat m-NN graph is its
    deterministic, oracle-checkable base layer).

    Build shape: the same block-grid all-pairs decomposition as
    ``embedding_neardup_pairs`` (every unordered block pair lands in
    exactly one ``applyInPandas`` cell), but each cell emits only the
    LOCAL top-m neighbors per source row in that cell, then one global
    window keeps the top-m per source over the n_blocks local
    candidates. Any global top-m neighbor is by definition within the
    top-m of its own cell, so the two-level selection is exact.

    Scale: shuffle = n_blocks x corpus for the grid plus
    n x n_blocks x m candidate triples for the final window — the n^2
    similarity matrix itself never shuffles, and per-task memory is
    2 x (n/n_blocks) x dim x 8 bytes, sized by n_blocks exactly as the
    near-dup kernel documents. Compute stays O(n^2/2) as an exact build
    must; NN-descent is the approximate-build alternative at extreme
    scale, traded away here to keep the graph oracle-checkable.

    Output: (src_id, nbr_id, sim, rnk) with the engine-wide
    deterministic (sim DESC, nbr_id) rank, sim rounded to 6 dp."""
    import numpy as np
    import pandas as pd

    blocked = vectors.select(
        id_col,
        vec_col,
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
    )
    pair_keys = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_blocks - 1)),
            lambda j: F.least(F.col("_blk"), j) * n_blocks
            + F.greatest(F.col("_blk"), j),
        )
    )
    exploded = blocked.withColumn("_pk", F.explode(pair_keys))

    def _local_topm(src_ids, nbr_ids, sims):
        if len(src_ids) == 0:
            return pd.DataFrame({"src_id": [], "nbr_id": [], "sim": []}).astype(
                {"src_id": "int64", "nbr_id": "int64", "sim": "float64"}
            )
        # per-source top-m under (sim DESC, nbr_id ASC): lexsort keys
        # are applied last-key-primary, so order by (src, -sim, nbr)
        order = np.lexsort((nbr_ids, -sims, src_ids))
        s, nb, sm = src_ids[order], nbr_ids[order], sims[order]
        # rank within each src run
        change = np.empty(len(s), dtype=bool)
        change[0] = True
        change[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(change)
        rnk = np.arange(len(s)) - np.repeat(starts, np.diff(np.append(starts, len(s))))
        keep = rnk < m
        return pd.DataFrame({"src_id": s[keep], "nbr_id": nb[keep], "sim": sm[keep]})

    def grid_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pa, pb = divmod(int(pdf["_pk"].iloc[0]), n_blocks)
        ids = pdf[id_col].to_numpy()
        mat = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        if pa == pb:
            sims = np.round(mat @ mat.T, 6)
            np.fill_diagonal(sims, -np.inf)
            n = len(ids)
            src = np.repeat(ids, n)
            nbr = np.tile(ids, n)
            flat = sims.ravel()
            ok = np.isfinite(flat)
            return _local_topm(src[ok], nbr[ok], flat[ok])
        blks = pdf["_blk"].to_numpy()
        a_mask, b_mask = blks == pa, blks == pb
        ida, idb = ids[a_mask], ids[b_mask]
        sims = np.round(mat[a_mask] @ mat[b_mask].T, 6)
        # both directions: a-rows need b-neighbors AND b-rows a-neighbors
        na, nb_ = len(ida), len(idb)
        src = np.concatenate([np.repeat(ida, nb_), np.repeat(idb, na)])
        nbr = np.concatenate([np.tile(idb, na), np.tile(ida, nb_)])
        sm = np.concatenate([sims.ravel(), sims.T.ravel()])
        return _local_topm(src, nbr, sm)

    cand = exploded.groupBy("_pk").applyInPandas(
        grid_cell, schema="src_id long, nbr_id long, sim double"
    )
    w = Window.partitionBy("src_id").orderBy(F.col("sim").desc(), F.col("nbr_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= m)
        .select("src_id", "nbr_id", "sim", F.col("rnk").cast("int").alias("rnk"))
    )


def beam_local_limit() -> int:
    """Corpus-row cutoff for the driver-side beam-search kernel (same
    scale-adaptive discipline as operators.graph's small-graph kernels:
    a manifest/bounded-probe literal decides, larger corpora keep the
    distributed loop). 100k x 64 doubles ≈ 51 MB via Arrow — the same
    sizing class as the CC/graph local kernels."""
    import os as _os

    return int(_os.environ.get("SPARK_GRAFT_BEAM_LOCAL_VECS", "100000"))


def _round6_half_up(x: float, dp: int = 6):
    """Spark round(double, dp): BigDecimal.valueOf(d) (shortest repr)
    .setScale(dp, HALF_UP).doubleValue() — the same chain the graph
    kernels replicate."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, ROUND_HALF_UP))


def _collect_vecs(df, id_col, vec_col, cap, cache=None):
    """Bounded Arrow collect of an (id, vector) table → (ids, V, norms,
    pos_of) or None when over ``cap`` / non-integer ids / duplicate ids
    / zero or non-finite norms. Norms replicate ``_norm`` exactly: the
    sequential left-fold acc = acc + x*x in element order, then sqrt.
    ``cache`` (keyed on the DataFrame object) lets a layered search
    collect each input once. The cache VALUE pins the DataFrame itself
    (ADVICE r10: a bare id(df) key is a stale-cache footgun — id()
    reuse after GC could serve another DataFrame's state; storing the
    reference makes the id stable for the cache's lifetime)."""
    import numpy as np

    key = id(df)
    if cache is not None and key in cache:
        return cache[key][1]
    vp = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).limit(cap + 1).toPandas()
    out = None
    if 0 < len(vp) <= cap:
        ids = vp["_id"].to_numpy()
        if np.issubdtype(ids.dtype, np.integer):
            ids = ids.astype(np.int64, copy=False)
            V = np.array(vp["_v"].tolist(), dtype=np.float64)
            if V.ndim == 2:
                order = np.argsort(ids)
                ids, V = ids[order], V[order]
                if len(ids) == 1 or not (ids[1:] == ids[:-1]).any():
                    acc = np.zeros(len(ids))
                    for j in range(V.shape[1]):
                        acc = acc + V[:, j] * V[:, j]
                    nv = np.sqrt(acc)
                    if np.isfinite(nv).all() and not (nv == 0.0).any():
                        pos_of = {int(i): p for p, i in enumerate(ids)}
                        out = (ids, V, nv, pos_of)
    if cache is not None:
        cache[key] = (df, out)
    return out


def _collect_graph(df, cap, cache=None):
    """Bounded collect of (src_id, nbr_id) edges → adjacency dict.
    Same cache-pinning discipline as ``_collect_vecs``."""
    key = id(df)
    if cache is not None and key in cache:
        return cache[key][1]
    gp = df.select("src_id", "nbr_id").limit(cap + 1).toPandas()
    out = None
    if len(gp) <= cap:
        adj: dict = {}
        for s, nbr in zip(
            gp["src_id"].to_numpy().tolist(),
            gp["nbr_id"].to_numpy().tolist(),
        ):
            adj.setdefault(s, []).append(nbr)
        out = adj
    if cache is not None:
        cache[key] = (df, out)
    return out


def _beam_rows(vstate, adj, qstate, k, ef, rounds, entries):
    """Pure-python replica of one graph_beam_search invocation over
    collected state. ``entries`` is {q_id: set(vec_id)} or None (global
    min-id entry). Returns {q_id: [(sim, vec_id), ...]} — the final
    top-``k`` per query under (sim DESC, vec_id), self-matches
    excluded, sims from the same fold/divide/HALF_UP-round chain as the
    distributed expressions."""
    ids, V, nv, pos_of = vstate
    q_ids, Q, nq, qpos_of = qstate
    d = V.shape[1]

    def sim_of(qi: int, vid: int):
        p, qpos = pos_of[vid], qpos_of[qi]
        s = 0.0
        for j in range(d):  # _dot: sequential fold of zip products
            s = s + V[p, j] * Q[qpos, j]
        return _round6_half_up(s / (nv[p] * nq[qpos]))

    if entries is not None:
        # drop entry rows whose q_id is absent from the queries table,
        # and entry vec_ids absent from the vectors table — the
        # distributed path silently drops both via its inner joins
        # (ADVICE r10: qpos_of[qi] raised KeyError instead)
        beams = {
            qi: {v for v in vs if v in pos_of}
            for qi, vs in entries.items()
            if qi in qpos_of
        }
    else:
        entry = int(ids.min())
        beams = {int(qi): {entry} for qi in q_ids}
    for _ in range(rounds):
        new_beams = {}
        for qi, beam in beams.items():
            cand = set(beam)
            for vid in beam:
                cand.update(adj.get(vid, ()))
            scored = sorted(
                ((sim_of(qi, vid), vid) for vid in cand if vid in pos_of),
                key=lambda t: (-t[0], t[1]),
            )[:ef]
            new_beams[qi] = {vid for _, vid in scored}
        beams = new_beams
    return {
        qi: sorted(
            ((sim_of(qi, vid), vid) for vid in beams[qi] if vid != qi),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        for qi in beams
    }


def _beam_result_df(spark, result):
    import pandas as pd

    rows = []
    for qi in sorted(result):
        rows.extend(
            (qi, vid, s, r + 1)
            for r, (s, vid) in enumerate(result[qi])
        )
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["q_id", "vec_id", "sim", "rnk"]),
        "q_id long, vec_id long, sim double, rnk int",
    )


def _collect_queries(queries, q_id_col, q_vec_col, cap, cache=None):
    st = _collect_vecs(queries, q_id_col, q_vec_col, cap, cache)
    if st is None:
        return None
    ids, Q, nq, pos_of = st
    return (ids, Q, nq, pos_of)


def _beam_local(
    vectors, graph, queries, k, ef, rounds,
    id_col, vec_col, q_id_col, q_vec_col, entry_beam,
):
    """Driver-side replica of graph_beam_search for bounded corpora.

    Each distributed round costs one full analyze/optimize/physical-
    plan pass (the lazy localCheckpoint still plans to an RDD) plus a
    multi-stage job — measured ~0.8-1.0 s of pure overhead per round on
    this VM for beams of n_queries x ef ≈ 80 rows. The kernel
    replicates the round arithmetic exactly: norms and dots are the
    same sequential left-folds over the vector components (one multiply
    then one add per element, in element order), sim is one divide by
    the pre-multiplied norm product, rounded via the shortest-repr
    HALF_UP chain that IS Spark's round(double, 6); beam selection is
    (sim DESC, vec_id ASC) — no arithmetic left to drift, and the
    local==distributed equality test plus every green oracle verify at
    the small SFs prove it. Returns None (caller falls back) on
    oversized/bad input."""
    cap = beam_local_limit()
    vstate = _collect_vecs(vectors, id_col, vec_col, cap)
    if vstate is None:
        return None
    qstate = _collect_queries(queries, q_id_col, q_vec_col, cap)
    if qstate is None or qstate[1].shape[1] != vstate[1].shape[1]:
        return None
    adj = _collect_graph(graph, 32 * cap)
    if adj is None:
        return None
    entries = None
    if entry_beam is not None:
        ep = entry_beam.select("q_id", "vec_id").limit(cap + 1).toPandas()
        if len(ep) > cap:
            return None
        entries = {}
        for qi, vid in zip(
            ep["q_id"].to_numpy().tolist(), ep["vec_id"].to_numpy().tolist()
        ):
            entries.setdefault(qi, set()).add(vid)
    result = _beam_rows(vstate, adj, qstate, k, ef, rounds, entries)
    return _beam_result_df(vectors.sparkSession, result)


def graph_beam_search(
    vectors: DataFrame,
    graph: DataFrame,
    queries: DataFrame,
    k: int = 5,
    ef: int = 10,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    entry_beam: DataFrame | None = None,
) -> DataFrame:
    """Greedy beam search over an m-NN graph — the HNSW-style SERVING
    path (reference ef_search=500, commercial_rfp_indexer.py:95-137),
    made deterministic and oracle-expressible by fixing the round count
    and the entry point (the min-id node, every engine agrees on it).

    ``entry_beam`` (optional, (q_id, vec_id) rows) seeds the search
    with PER-QUERY entry points instead of the global min-id node —
    the hook the hierarchical HNSW layer uses to hand each query the
    upper layer's nearest nodes, so the base-layer search starts near
    the target and needs fewer expansion rounds.

    Per round: candidates = beam UNION neighbors(beam) via one join on
    the graph's src_id, then exact cosine re-rank against the query and
    keep the top-``ef`` per query under (sim DESC, vec_id). After
    ``rounds`` expansions, emit the top-``k`` of the final beam
    (excluding the query's own id — ef > k keeps the beam deep enough).

    Scale: the beam is n_queries x ef rows — broadcast to the edge
    join, so the graph (n x m edges, partitioned by src_id) never
    reshuffles; each round scores at most n_queries x ef x (m+1)
    candidates against broadcast query vectors. Query cost is
    O(rounds x ef x m x dim) per query — independent of corpus size,
    which is the entire point of a navigable-graph index. Recall is a
    measured property of (ef, rounds) vs the exact oracle (tests pin
    it), exactly like the IVF nprobe trade.

    Corpora under SPARK_GRAFT_BEAM_LOCAL_VECS (bounded limit-probe,
    default 100k vectors) serve from the driver-side kernel — each
    distributed round otherwise pays a full physical-planning pass
    plus a multi-stage job (~1 s of pure overhead per round on this
    VM) for a beam of n_queries x ef ≈ 80 rows; larger corpora keep
    the distributed loop below unchanged."""
    out = _beam_local(
        vectors, graph, queries, k, ef, rounds,
        id_col, vec_col, q_id_col, q_vec_col, entry_beam,
    )
    if out is not None:
        graph_beam_search.last_local = True
        return out
    graph_beam_search.last_local = False
    vecs = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")
    ).withColumn("_n", _norm(F.col("_v")))
    qn = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv")))
    if entry_beam is not None:
        beam = entry_beam.select("q_id", "vec_id")
    else:
        entry = vecs.select(F.min("vec_id").alias("vec_id"))
        beam = qn.select("q_id").crossJoin(F.broadcast(entry))
    edges = graph.select(F.col("src_id"), F.col("nbr_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    for _ in range(rounds):
        expanded = (
            edges.join(
                F.broadcast(beam.withColumnRenamed("vec_id", "src_id")), "src_id"
            )
            .select("q_id", F.col("nbr_id").alias("vec_id"))
        )
        cand = beam.select("q_id", "vec_id").union(expanded).distinct()
        scored = (
            cand.join(vecs, "vec_id")
            .join(F.broadcast(qn), "q_id")
            .select(
                "q_id",
                "vec_id",
                F.round(
                    _dot(F.col("_v"), F.col("_qv")) / (F.col("_n") * F.col("_qn")), 6
                ).alias("sim"),
            )
        )
        # each round reads the previous beam TWICE (expansion + union);
        # without lineage truncation the lazy plan doubles per round —
        # localCheckpoint the tiny (n_queries x ef)-row state instead,
        # the same per-round discipline as the CC fixpoint loop
        beam = (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= ef)
            .select("q_id", "vec_id", "sim")
            .localCheckpoint(eager=False)
        )
    return (
        beam.filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "sim", F.col("rnk").cast("int").alias("rnk"))
    )


def hnsw_layer_pred(
    id_col: str = "vec_id", upper_mod: int = 16, seed: str = "hnsw1"
) -> Column:
    """Deterministic HNSW level-1 membership: a node is promoted to
    the upper layer iff md5-hash(seed:id) mod ``upper_mod`` == 0 — the
    hash-coin analogue of HNSW's geometric level draw (level >= 1 with
    probability p = 1/upper_mod; real HNSW uses p = 1/M, reference
    m=4, commercial_rfp_indexer.py:96-112). md5 instead of rand()
    keeps the layer assignment reproducible under any partitioning,
    across retries, and expressible in ANSI SQL for the oracle
    (('0x' || substring(md5(...), 1, 15))::BIGINT % upper_mod = 0)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return h % upper_mod == F.lit(0)


def hnsw_search(
    vectors: DataFrame,
    base_graph: DataFrame,
    upper_vectors: DataFrame,
    upper_graph: DataFrame,
    queries: DataFrame,
    k: int = 5,
    ef: int = 16,
    upper_rounds: int = 2,
    base_rounds: int = 2,
    n_entry: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Hierarchical (two-layer HNSW) graph-ANN serving: beam-search the
    SMALL upper layer first (md5-promoted n/upper_mod nodes, its own
    m-NN graph), take each query's top-``n_entry`` upper nodes as
    per-query ENTRY POINTS, then beam-search the base graph from those
    entries. The reference declares hierarchical HNSW
    (commercial_rfp_indexer.py:96-112, m=4, ef_construction=400); the
    flat beam search covers the semantics — this adds the layer
    hierarchy so entry-point hops no longer grow with corpus diameter:
    the upper layer contracts graph distance by ~upper_mod, so
    ``upper_rounds + base_rounds`` here replaces what a flat search
    from a fixed entry node needs in base-layer hops alone.

    Scale: the upper layer is a fixed 1/upper_mod fraction of the
    corpus (layers stack geometrically in a deeper hierarchy); its
    beam search touches n_queries x ef x m rows per round like any
    beam. The base search inherits graph_beam_search's corpus-
    independent per-query cost; entry quality, not corpus size, is
    what the hierarchy buys. Deterministic end to end: md5 layer
    draw, min-id upper entry, (sim DESC, vec_id) ties — every step
    oracle-expressible."""
    out = _hnsw_chain_local(
        [(upper_vectors, upper_graph, upper_rounds)],
        vectors, base_graph, queries,
        k, ef, base_rounds, n_entry,
        id_col, vec_col, q_id_col, q_vec_col,
    )
    if out is not None:
        return out
    entries = graph_beam_search(
        upper_vectors,
        upper_graph,
        queries,
        k=n_entry,
        ef=ef,
        rounds=upper_rounds,
        id_col=id_col,
        vec_col=vec_col,
        q_id_col=q_id_col,
        q_vec_col=q_vec_col,
    )
    return graph_beam_search(
        vectors,
        base_graph,
        queries,
        k=k,
        ef=ef,
        rounds=base_rounds,
        id_col=id_col,
        vec_col=vec_col,
        q_id_col=q_id_col,
        q_vec_col=q_vec_col,
        entry_beam=entries.select("q_id", "vec_id"),
    )


def _hnsw_chain_local(
    layer_stages, vectors, base_graph, queries,
    k, ef, base_rounds, n_entry,
    id_col, vec_col, q_id_col, q_vec_col,
):
    """Local kernel for a whole HNSW descent: run every layer's beam
    search in-process over ONE bounded collect per distinct input
    (queries are collected once for all layers; entry handoffs stay
    python dicts instead of round-tripping through createDataFrame +
    re-collect). Stage semantics are exactly graph_beam_search's —
    each layer emits its top-``n_entry`` rows (self-matches excluded)
    as the next stage's entry set, the base stage emits top-``k``.
    Returns None (callers fall back to the distributed chain) when any
    input exceeds the bounded-collect cap."""
    cap = beam_local_limit()
    cache: dict = {}
    qstate = _collect_queries(queries, q_id_col, q_vec_col, cap, cache)
    if qstate is None:
        return None
    entries = None
    for lv, lg, rounds in layer_stages:
        vstate = _collect_vecs(lv, id_col, vec_col, cap, cache)
        if vstate is None or qstate[1].shape[1] != vstate[1].shape[1]:
            return None
        adj = _collect_graph(lg, 32 * cap, cache)
        if adj is None:
            return None
        result = _beam_rows(vstate, adj, qstate, n_entry, ef, rounds, entries)
        entries = {qi: {vid for _, vid in rows} for qi, rows in result.items()}
    vstate = _collect_vecs(vectors, id_col, vec_col, cap, cache)
    if vstate is None or qstate[1].shape[1] != vstate[1].shape[1]:
        return None
    adj = _collect_graph(base_graph, 32 * cap, cache)
    if adj is None:
        return None
    result = _beam_rows(vstate, adj, qstate, k, ef, base_rounds, entries)
    return _beam_result_df(vectors.sparkSession, result)


def hnsw_level_pred(
    level: int,
    id_col: str = "vec_id",
    upper_mod: int = 16,
    seed_prefix: str = "hnsw",
) -> Column:
    """Membership at HNSW layer >= ``level`` under the GEOMETRIC level
    draw: one independent md5 coin per layer, so a node reaches layer
    ℓ with probability upper_mod^-ℓ — the hash-coin restatement of
    HNSW's level = floor(-ln(U)/ln(M)) (reference declares full
    hierarchical HNSW, commercial_rfp_indexer.py:96-112). Layers nest
    by construction (layer ℓ requires every coin 1..ℓ), deterministic
    under any partitioning, and each coin is the same ANSI-SQL
    fragment hnsw_layer_pred uses, so arbitrary-depth hierarchies stay
    oracle-expressible."""
    pred = F.lit(True)
    for j in range(1, level + 1):
        pred = pred & hnsw_layer_pred(
            id_col=id_col, upper_mod=upper_mod, seed=f"{seed_prefix}{j}"
        )
    return pred


def hnsw_search_deep(
    vectors: DataFrame,
    base_graph: DataFrame,
    layers: list[tuple[DataFrame, DataFrame]],
    queries: DataFrame,
    k: int = 5,
    ef: int = 16,
    layer_rounds: list[int] | None = None,
    base_rounds: int = 2,
    n_entry: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Multi-layer HNSW descent: ``layers`` is TOP-layer-first
    [(layer_vectors, layer_graph), ...]; the search beams the top
    (smallest) layer from its global min-id entry, hands each query's
    top-``n_entry`` nodes down as entry points for the next layer, and
    repeats until the base graph serves the final top-k. Because the
    levels nest (hnsw_level_pred), every entry node exists in the layer
    below — the defining HNSW invariant that makes the handoff valid.

    Scale: layer ℓ is an upper_mod^-ℓ fraction of the corpus, so the
    whole descent above the base costs a vanishing share of the base
    rounds' work while contracting graph distance geometrically —
    entry quality replaces base-layer hops (measured: equal recall
    with fewer total expansion rounds than the 2-layer form)."""
    rounds = layer_rounds or [1] * len(layers)
    out = _hnsw_chain_local(
        [(lv, lg, r) for (lv, lg), r in zip(layers, rounds)],
        vectors, base_graph, queries,
        k, ef, base_rounds, n_entry,
        id_col, vec_col, q_id_col, q_vec_col,
    )
    if out is not None:
        return out
    entries = None
    for (lv, lg), r in zip(layers, rounds):
        res = graph_beam_search(
            lv,
            lg,
            queries,
            k=n_entry,
            ef=ef,
            rounds=r,
            id_col=id_col,
            vec_col=vec_col,
            q_id_col=q_id_col,
            q_vec_col=q_vec_col,
            entry_beam=entries,
        )
        entries = res.select("q_id", "vec_id")
    return graph_beam_search(
        vectors,
        base_graph,
        queries,
        k=k,
        ef=ef,
        rounds=base_rounds,
        id_col=id_col,
        vec_col=vec_col,
        q_id_col=q_id_col,
        q_vec_col=q_vec_col,
        entry_beam=entries,
    )


def nn_descent_graph(
    vectors: DataFrame,
    dim: int,
    m: int = 8,
    rounds: int = 2,
    n_bits: int = 4,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """APPROXIMATE m-NN graph via NN-descent (Dong et al., WWW'11) —
    the scale path the exact ``knn_graph`` docstring promises: instead
    of the O(n^2) block-grid build, start from multi-table LSH
    bucket-mates and iterate "my neighbor's neighbors are probably my
    neighbors": each round unions the current graph with its 2-hop
    expansion, rescores exactly, and keeps the top-m per source.
    Deterministic end to end (Gaussian-literal LSH planes, (sim DESC,
    id) ranks), so even the approximate build is oracle-checkable;
    recall vs the exact graph is a measured property tests pin.

    Scale: per round each source contributes at most m + m^2 candidate
    pairs — the candidate volume is O(n·m^2) regardless of corpus
    size, which is why NN-descent builds billion-vector graphs. The
    scoring join shuffles candidate (src, nbr) pairs against the
    pinned corpus; graph state is localCheckpoint'd per round (read
    twice by the 2-hop self-join)."""
    v = vectors.select(id_col, vec_col)
    vn = v.withColumn("_n", _norm(F.col(vec_col)))
    src_side = vn.select(
        F.col(id_col).alias("src_id"),
        F.col(vec_col).alias("_sv"),
        F.col("_n").alias("_sn"),
    )
    nbr_side = vn.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("_nv"),
        F.col("_n").alias("_nn"),
    )
    w = Window.partitionBy("src_id").orderBy(F.col("sim").desc(), F.col("nbr_id"))

    def top_m(pairs: DataFrame) -> DataFrame:
        scored = (
            pairs.join(src_side, "src_id")
            .join(nbr_side, "nbr_id")
            .select(
                "src_id",
                "nbr_id",
                F.round(
                    _dot(F.col("_sv"), F.col("_nv")) / (F.col("_sn") * F.col("_nn")),
                    6,
                ).alias("sim"),
            )
        )
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= m)
            .select("src_id", "nbr_id", "sim")
        )

    b = lsh_buckets_multi(v, dim, n_bits, n_tables, vec_col)
    ba = b.select(F.col(id_col).alias("src_id"), "tbl", "bucket")
    bb = b.select(F.col(id_col).alias("nbr_id"), "tbl", "bucket")
    init = (
        ba.join(bb, ["tbl", "bucket"])
        .filter(F.col("src_id") != F.col("nbr_id"))
        .select("src_id", "nbr_id")
        .distinct()
    )
    g = top_m(init).localCheckpoint(eager=False)
    for _ in range(rounds):
        hop2 = (
            g.select(F.col("src_id"), F.col("nbr_id").alias("_mid"))
            .join(
                g.select(
                    F.col("src_id").alias("_mid"), F.col("nbr_id").alias("cand")
                ),
                "_mid",
            )
            .filter(F.col("cand") != F.col("src_id"))
            .select("src_id", F.col("cand").alias("nbr_id"))
        )
        cand = g.select("src_id", "nbr_id").union(hop2).distinct()
        g = top_m(cand).localCheckpoint(eager=False)
    return g.withColumn("rnk", F.row_number().over(w).cast("int")).select(
        "src_id", "nbr_id", "sim", "rnk"
    )
