"""Graph-analytics queries: fixed-iteration PageRank over a
co-purchase graph (parts linked when they appear in the same order).

The same operator composes with the text near-dup surface — e.g.
``pagerank(docs, simhash_pairs(...))`` ranks documents by centrality in
the duplicate graph before survivor selection — but the co-purchase
graph keeps the oracle self-contained and exercises dangling vertices
(parts never ordered) for real.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.operators.graph import (
    kcore_oracle_cte,
    pagerank,
    pagerank_oracle_cte,
    ppr_oracle_cte,
)
from commercial_rfp_data_pipeline_spark.registry import query


def _copurchase(spark, sf_dir):
    """The durable co-purchase graph (wedges, degrees) — round 9: the
    whole family previously rebuilt the identical lineitem self-join
    per query (VERDICT r8 #1); now it's ONE content-keyed artifact
    build shared by all eleven queries, and per-query edge derivation
    is a parquet read. The oracle SQL still states the build from
    lineitem, so every consumer's correctness check also proves the
    artifact equals the inline derivation."""
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_copurchase_graph,
    )

    return ensure_copurchase_graph(spark, sf_dir)


_NODES_SQL = "SELECT p_partkey AS id FROM part"
_EDGES_SQL = """
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
"""


@query(
    "pagerank_copurchase",
    pagerank_oracle_cte(_NODES_SQL, _EDGES_SQL, id_col="p_partkey"),
)
def q_pagerank_copurchase(spark, sf_dir):
    """PageRank (d=0.85, 5 supersteps) over the undirected co-purchase
    graph: edge (a, b) iff parts a and b share an order.

    Scale: the edge list is served from the durable co-purchase
    artifact (plans/artifacts.py — built once per corpus, already
    distinct); each PageRank superstep is one state⨝edges shuffle on
    src plus one groupBy(dst) with map-side partial sums; dangling
    mass rides a broadcast one-row aggregate, never a driver collect.
    State is per-round localCheckpoint'd so superstep k+1 doesn't
    recompute 1..k."""
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        copurchase_n_edges,
    )

    wedges, _ = _copurchase(spark, sf_dir)
    edges = wedges.select("src", "dst")
    nodes = load_table(spark, sf_dir, "part").select("p_partkey")
    pr = pagerank(
        nodes, edges, id_col="p_partkey",
        n_edges=copurchase_n_edges(spark, sf_dir),
    )
    return pr.select(
        "p_partkey",
        "outdeg",
        F.round("rank", 9).alias("rank"),
        F.round("rank_rel", 6).alias("rank_rel"),
    )


_PPR_SEEDS = (1, 2, 3)
_PPR_W = repr(1.0 / len(_PPR_SEEDS))


@query(
    "personalized_pagerank_parts",
    ppr_oracle_cte(
        _NODES_SQL,
        _EDGES_SQL,
        teleport_sql=(
            f"CASE WHEN v.id IN {_PPR_SEEDS!r} THEN {_PPR_W} ELSE 0.0 END"
        ),
        id_col="p_partkey",
    ),
)
def q_personalized_pagerank(spark, sf_dir):
    """PERSONALIZED PageRank over the co-purchase graph: random walks
    restart only at the three seed parts, so rank measures proximity
    to the seeds — the "parts related to these parts" recommendation
    primitive (same operator as `pagerank_copurchase`; the teleport
    vector is the only change, which is the point: one Pregel loop,
    both semantics).

    Scale: identical superstep shape to the uniform form; the dangling
    mass rides the in-plan one-row aggregate (the closed-form fast
    path is uniform-only); edges from the shared durable artifact."""
    wedges, _ = _copurchase(spark, sf_dir)
    edges = wedges.select("src", "dst")
    nodes = load_table(spark, sf_dir, "part").select("p_partkey").withColumn(
        "tp",
        F.when(
            F.col("p_partkey").isin(*_PPR_SEEDS), F.lit(1.0 / len(_PPR_SEEDS))
        ).otherwise(F.lit(0.0)),
    )
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        copurchase_n_edges,
    )

    pr = pagerank(
        nodes,
        edges,
        id_col="p_partkey",
        symmetric=False,
        teleport_col="tp",
        n_edges=copurchase_n_edges(spark, sf_dir),
        # wedges is symmetric by construction: isolated parts have no
        # in-edges, so the dangling-zero check needs only the teleport
        # probe (operators/graph.py)
        edges_symmetric=True,
    )
    return pr.select(
        "p_partkey",
        "outdeg",
        F.round("rank", 9).alias("rank"),
        F.round("rank_rel", 6).alias("rank_rel"),
    )


@query(
    "triangle_count_copurchase",
    """
    WITH e AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                      greatest(a.l_partkey, b.l_partkey) AS v
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    deg AS (
      SELECT id, count(*) AS d
      FROM (SELECT u AS id FROM e UNION ALL SELECT v AS id FROM e)
      GROUP BY id
    ),
    tri AS (
      SELECT count(*) AS t
      FROM e e1
      JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
      JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
    ),
    wed AS (SELECT sum((d * (d - 1)) // 2) AS w FROM deg)
    SELECT t AS n_triangles,
           CAST(w AS BIGINT) AS n_wedges,
           round(3.0 * t / w, 6) AS global_clustering
    FROM tri CROSS JOIN wed
    """,
)
def q_triangle_count(spark, sf_dir):
    """Triangle count + global clustering coefficient of the undirected
    co-purchase graph — the standard graph-health metric next to
    PageRank.

    Scale (this is the textbook distributed-triangle discipline): the
    naive wedge join explodes on hubs (a degree-10^6 node contributes
    10^12 wedges), so edges are ORIENTED from the lower to the higher
    endpoint in the total order (degree, id) — every node's
    out-degree is then O(sqrt(E)) regardless of skew (Schank 2007;
    the GraphX/Cohen MapReduce formulation). Wedges pair out-neighbors
    of a common source and close against the oriented edge set;
    each triangle is counted EXACTLY once, at its minimum-order
    vertex. The oracle restates the count with the simpler
    id-orientation — a different per-node attribution but provably
    the same triangle set, so the totals agree. The wedge denominator
    sum(C(d,2)) stays in exact integer arithmetic.

    Round 9 (the second scale decade caught alpha 1.31 here —
    sf1 237 s): two restructures, measured back to ~linear (116 s):
    (1) wedges are generated from per-source sorted out-neighbor
    ARRAYS (groupBy + combination transform — the ppjoin postings
    pattern) instead of a self-join: the Σd² pair stream is emitted
    by an expression, never shuffled into existence. Per-row array
    memory is C(outdeg, 2) with outdeg ≤ O(sqrt E) by orientation —
    the same bound Schank's sequential algorithm carries (max 97 on
    this graph at both decades).
    (2) the closure probe picks its physical strategy from the
    artifact's edge-count literal: below SPARK_GRAFT_TRI_BC_EDGES
    (default 4M) the oriented edge set broadcasts and the wedge
    stream is NEVER shuffled (the sf1 cliff was 410M wedge rows
    sort-merging through 32 partitions); above it, the partitioned
    semi-join — the only shape that scales to 100 TB — takes over,
    with parallelism sized upstream (production_conf's 2.5x-cores
    shuffle partitions)."""
    wedges, deg = _copurchase(spark, sf_dir)
    und = wedges.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    from commercial_rfp_data_pipeline_spark.io import pin
    from commercial_rfp_data_pipeline_spark.operators.graph import (
        _local_eligible_heavy,
        triangle_stats_local,
    )
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        copurchase_n_edges,
    )

    if _local_eligible_heavy(copurchase_n_edges(spark, sf_dir)):
        out = triangle_stats_local(und, deg)
        if out is not None:
            return out

    # total-order key (degree, id) packed into one BIGINT so the
    # orientation comparison is a single column op; ids are bounded by
    # the part keyspace, degrees by n-1 — both far under 2^31 here (at
    # larger keyspaces widen the pack or compare structs)
    key = (F.col("d") * F.lit(2_000_000_000) + F.col("id")).alias("k")
    degk = deg.select("id", key)
    oriented = (
        und.join(F.broadcast(degk.select(F.col("id").alias("u"), F.col("k").alias("ku"))), "u")
        .join(F.broadcast(degk.select(F.col("id").alias("v"), F.col("k").alias("kv"))), "v")
        .select(
            F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(F.col("ku") < F.col("kv"), F.col("kv")).otherwise(F.col("ku")).alias("kdst"),
            F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    oriented = pin(oriented)
    # round 10 (guide §3.3 — "explode before a join multiplies the
    # shuffle; join first on the un-exploded key and explode after"):
    # the r9 form materialized the Σ C(outdeg,2) wedge stream (41M rows
    # at sf0.1, 410M at sf1) and semi-joined it against the oriented
    # edge set. The closure count per oriented edge (u,v) is
    # |N+(u) ∩ N+(v)| — each triangle counted exactly once, at its
    # minimum-(degree,id) vertex, SAME attribution as the wedge form —
    # so the probe can run on the 1-row-per-EDGE stream carrying two
    # bounded adjacency arrays (outdeg ≤ O(sqrt E) by orientation)
    # instead of a row per WEDGE: the explode, the 41M-row codegen
    # span, and the wedge-side shuffle disappear. Measured at sf0.1:
    # 7.5 s → 2.2 s warm, identical n_triangles.
    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("nb"))
    nu = adj.select(F.col("src").alias("_u"), F.col("nb").alias("nu"))
    nv = adj.select(F.col("src").alias("_v"), F.col("nb").alias("nv"))
    # default 4M oriented (long,long) rows ≈ 64 MB raw / ~150 MB as a
    # BroadcastHashJoin hash relation — safe on default executor memory
    # (ADVICE r9: the old 20M default could build a multi-hundred-MB
    # relation and OOM the driver well before the cutoff was reached).
    # The adjacency form carries the same total payload (one array cell
    # per oriented edge), so the same cutoff governs it; above the
    # cutoff both probes fall back to partitioned joins on src/dst —
    # still one row per edge, never one per wedge.
    bc_limit = int(os.environ.get("SPARK_GRAFT_TRI_BC_EDGES", "4000000"))
    if copurchase_n_edges(spark, sf_dir) // 2 <= bc_limit:
        nu, nv = F.broadcast(nu), F.broadcast(nv)
    tri = (
        oriented.join(nu, F.col("src") == F.col("_u"))
        .join(nv, F.col("dst") == F.col("_v"))
        .select(F.size(F.array_intersect("nu", "nv")).alias("c"))
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("t"))
    )
    wed = deg.agg(
        F.sum(F.expr("(d * (d - 1)) DIV 2")).alias("w")
    )
    return (
        tri.crossJoin(F.broadcast(wed))
        .select(
            F.col("t").alias("n_triangles"),
            F.col("w").cast("long").alias("n_wedges"),
            F.round(F.lit(3.0) * F.col("t") / F.col("w"), 6).alias(
                "global_clustering"
            ),
        )
    )


@query(
    "bfs_hops_copurchase",
    f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    srcs AS (SELECT p_partkey AS id FROM part WHERE p_size = 50),
    walk(id, d) AS (
      SELECT id, 0 FROM srcs
      UNION
      SELECT g.dst, w.d + 1 FROM walk w JOIN edges g ON g.src = w.id
      WHERE w.d < 3
    )
    SELECT id AS p_partkey, CAST(min(d) AS INTEGER) AS hops
    FROM walk GROUP BY id
    """,
)
def q_bfs_copurchase(spark, sf_dir):
    """Multi-source BFS over the co-purchase graph: minimum hop count
    from the p_size=50 part set, bounded at 3 hops. Frontier-only
    joins + anti-join against visited keep every round proportional
    to the NEW nodes discovered, not the graph — the scalable BFS
    shape (the oracle states the same bounded recursion naively)."""
    from commercial_rfp_data_pipeline_spark.operators.graph import bfs_hops
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        copurchase_n_edges,
    )

    wedges, _ = _copurchase(spark, sf_dir)
    edges = wedges.select("src", "dst")
    sources = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 50)
        .select("p_partkey")
    )
    out = bfs_hops(
        edges, sources, max_hops=3,
        n_edges=copurchase_n_edges(spark, sf_dir),
    )
    return out.select(
        F.col("id").alias("p_partkey"), F.col("hops").cast("int").alias("hops")
    )


def _hits_cte(n_iters: int = 3) -> tuple[str, str, str]:
    """Unrolled HITS iterations mirroring operators.graph.hits: decimal
    scores, 6-dp round after each sum-normalization."""
    parts = [
        "h0 AS (SELECT DISTINCT src AS id, CAST(1 AS DECIMAL(18,6)) AS hub FROM e)"
    ]
    prev_h = "h0"
    a = "a0"
    for i in range(1, n_iters + 1):
        parts.append(
            f"""araw{i} AS (
      SELECT e.dst, sum(h.hub) AS raw
      FROM e JOIN {prev_h} h ON h.id = e.src GROUP BY e.dst
    ),
    a{i} AS (
      SELECT dst AS id,
             CAST(round(CAST(raw AS DOUBLE)
               / CAST((SELECT sum(raw) FROM araw{i}) AS DOUBLE), 6)
               AS DECIMAL(18,6)) AS auth
      FROM araw{i}
    ),
    hraw{i} AS (
      SELECT e.src, sum(a.auth) AS raw
      FROM e JOIN a{i} a ON a.id = e.dst GROUP BY e.src
    ),
    h{i} AS (
      SELECT src AS id,
             CAST(round(CAST(raw AS DOUBLE)
               / CAST((SELECT sum(raw) FROM hraw{i}) AS DOUBLE), 6)
               AS DECIMAL(18,6)) AS hub
      FROM hraw{i}
    )"""
        )
        prev_h = f"h{i}"
        a = f"a{i}"
    return ",\n    ".join(parts), prev_h, a


_HITS_SQL, _HITS_H, _HITS_A = _hits_cte(3)


@query(
    "hits_hubs_authorities",
    f"""
    WITH e AS (
      SELECT DISTINCT o_custkey AS src, l_partkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    {_HITS_SQL}
    SELECT 'hub' AS role, id, CAST(hub AS DOUBLE) AS score FROM {_HITS_H}
    UNION ALL
    SELECT 'auth' AS role, id, CAST(auth AS DOUBLE) AS score FROM {_HITS_A}
    """,
)
def q_hits(spark, sf_dir):
    """HITS on the bipartite customer->part purchase graph: customer
    hub scores and part authority scores after 3 sum-normalized
    rounds. Each half-step is one edges-state join + one groupBy (a
    PageRank-superstep cost); decimal scores make the unrolled
    iteration value-hash-checkable."""
    from commercial_rfp_data_pipeline_spark.operators.graph import hits
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        bipartite_n_edges,
        ensure_purchase_bipartite,
    )

    edges = ensure_purchase_bipartite(spark, sf_dir)
    return hits(
        edges, n_iters=3, assume_distinct=True,
        n_edges=bipartite_n_edges(spark, sf_dir),
    )


@query(
    "label_propagation_communities",
    f"""
    WITH edges AS ({_EDGES_SQL}),
    l0 AS (SELECT p_partkey AS id, p_partkey AS lbl FROM part),
    n1 AS (
      SELECT e.dst AS id, l.lbl, count(*) AS c
      FROM edges e JOIN l0 l ON l.id = e.src GROUP BY e.dst, l.lbl
    ),
    b1 AS (
      SELECT id, lbl FROM (
        SELECT *, row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
        FROM n1
      ) WHERE rn = 1
    ),
    l1 AS (SELECT l0.id, coalesce(b1.lbl, l0.lbl) AS lbl
           FROM l0 LEFT JOIN b1 USING (id)),
    n2 AS (
      SELECT e.dst AS id, l.lbl, count(*) AS c
      FROM edges e JOIN l1 l ON l.id = e.src GROUP BY e.dst, l.lbl
    ),
    b2 AS (
      SELECT id, lbl FROM (
        SELECT *, row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
        FROM n2
      ) WHERE rn = 1
    ),
    l2 AS (SELECT l1.id, coalesce(b2.lbl, l1.lbl) AS lbl
           FROM l1 LEFT JOIN b2 USING (id)),
    sizes AS (SELECT lbl, count(*) AS n FROM l2 GROUP BY lbl)
    SELECT l2.id AS p_partkey, l2.lbl AS community, s.n AS community_size
    FROM l2 JOIN sizes s ON s.lbl = l2.lbl
    """,
)
def q_label_propagation(spark, sf_dir):
    """Label-propagation communities over the co-purchase graph (2
    synchronous rounds, deterministic frequency-vote tiebreak) — the
    community structure CC cannot see: reachability merges everything
    connected, LPA's majority vote keeps dense purchase clusters
    apart. Same per-round cost envelope as a PageRank superstep."""
    # round 10: the 2-round label table is the durable
    # `ensure_lpa_labels` artifact (content-keyed on lineitem + part;
    # community_modularity derives from the same table) — the oracle
    # still states the full unrolled LPA chain, so green verify proves
    # artifact == inline
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_lpa_labels,
    )

    lp = ensure_lpa_labels(spark, sf_dir, n_iters=2)
    sizes = lp.groupBy("community").agg(F.count(F.lit(1)).alias("community_size"))
    return lp.join(sizes, "community").select(
        F.col("id").alias("p_partkey"), "community", "community_size"
    )


_BOM_SQL = """
    WITH RECURSIVE edges AS (
      SELECT p_partkey AS child,
             CAST(floor(p_partkey / 10.0) AS BIGINT) AS parent
      FROM part
      WHERE p_partkey >= 10
    ),
    bom(root, id, lvl) AS (
      SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey < 10
      UNION ALL
      SELECT b.root, e.child, b.lvl + 1
      FROM bom b JOIN edges e ON e.parent = b.id
    )
    SELECT b.root, count(*) AS n_parts,
           CAST(sum(CAST(p.p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
             AS subtree_value,
           CAST(max(b.lvl) AS INTEGER) AS depth
    FROM bom b JOIN part p ON p.p_partkey = b.id
    GROUP BY b.root
"""


@query("bom_rollup_recursive_cte", _BOM_SQL)
def q_bom_rollup_recursive(spark, sf_dir):
    """Bill-of-materials subtree rollup via Spark 4's NATIVE recursive
    CTE (``WITH RECURSIVE``) — the iterative-closure surface the
    engine's manual loops (dup_clusters, bfs_hops, pagerank) hand-roll,
    here declared once and executed inside Catalyst's UnionLoop
    operator, with the IDENTICAL SQL text running on the oracle. The
    part hierarchy is derived (parent = partkey/10 — a forest rooted at
    the single-digit keys), and the rollup aggregates each root's whole
    subtree: descendant count, summed retail value, max depth.

    Scale: each recursion level is ONE equi-join of the frontier to the
    edge table (shuffle on parent) — the same per-superstep cost
    envelope as the hand-rolled loops, but the planner owns the loop:
    depth is bounded by the hierarchy (log10 keys ≈ 5-6 levels, far
    under the 100-level guard), the anchor and step are planned as one
    statement, and no driver round-trips happen between levels. The
    hand-rolled loops remain the right tool when a step needs
    aggregation or distinct (UNION ALL is the only step shape recursive
    CTEs support today); this query pins the native path for the
    tree-walk class that fits it."""
    for t in ("part",):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_BOM_SQL)


def _sssp_oracle(rounds: int = 3) -> str:
    ctes = [
        """swe AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst,
                 1 + (a.l_partkey + b.l_partkey) % 5 AS w
          FROM lineitem a
          JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        )""",
        "d0 AS (SELECT id, CAST(0 AS BIGINT) AS dist FROM (VALUES (1), (2), (3)) s(id))",
    ]
    for r in range(1, rounds + 1):
        p = f"d{r - 1}"
        ctes.append(
            f"""d{r} AS (
              SELECT id, min(dist) AS dist FROM (
                SELECT id, dist FROM {p}
                UNION ALL
                SELECT e.dst AS id, {p}.dist + e.w AS dist
                FROM {p} JOIN swe e ON e.src = {p}.id
              ) GROUP BY id
            )"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id AS p_partkey, dist FROM d{rounds}"
    )


@query("sssp_weighted_bounded", _sssp_oracle(3))
def q_sssp_weighted(spark, sf_dir):
    """Bounded Bellman-Ford over the co-purchase graph with
    deterministic integer edge weights (1 + (src+dst) % 5): exact
    shortest-path distance within 3 relaxation rounds from seed parts
    {{1,2,3}} — the weighted sibling of bfs_hops_copurchase. Min-plus
    supersteps, unrolled-CTE oracle, integer arithmetic throughout."""
    from commercial_rfp_data_pipeline_spark.operators.graph import (
        _local_eligible,
        sssp_bounded,
    )
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        copurchase_n_edges,
    )

    wedges, _ = _copurchase(spark, sf_dir)
    edges = wedges.select("src", "dst").withColumn(
        "w", (1 + (F.col("src") + F.col("dst")) % 5).cast("long")
    )
    ne = copurchase_n_edges(spark, sf_dir)
    if not _local_eligible(ne):
        # every relaxation round re-reads the edges: keep them in
        # memory (the build itself is a read of the durable artifact);
        # the local fast path collects them once instead
        edges = edges.localCheckpoint()
    seeds = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    out = sssp_bounded(edges, seeds, rounds=3, n_edges=ne)
    return out.select(F.col("id").alias("p_partkey"), "dist")


_WEDGES_SQL = """
    SELECT src, dst, count(*) AS w FROM (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ) GROUP BY src, dst
"""


@query(
    "weighted_pagerank_copurchase",
    pagerank_oracle_cte(
        _NODES_SQL, _WEDGES_SQL, id_col="p_partkey", weighted=True
    ),
)
def q_weighted_pagerank(spark, sf_dir):
    """WEIGHTED PageRank over the co-purchase graph: edge weight =
    co-occurrence multiplicity (how many orders pair the two parts),
    so a vertex splits its rank proportionally to tie strength instead
    of uniformly — the form recommendation-style importance actually
    uses (a part co-bought 50 times should carry more rank than a
    one-off pairing, which uniform PageRank treats identically).

    Scale: identical supersteps to pagerank_copurchase; the only
    change is the edge weight (the artifact's co-occurrence
    multiplicity column) and outdeg becoming the out-weight sum."""
    wedges, _ = _copurchase(spark, sf_dir)
    edges = wedges.select("src", "dst", "w")
    nodes = load_table(spark, sf_dir, "part").select("p_partkey")
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        copurchase_n_edges,
    )

    pr = pagerank(
        nodes, edges, id_col="p_partkey", weight_col="w",
        n_edges=copurchase_n_edges(spark, sf_dir),
    )
    return pr.select(
        "p_partkey",
        "outdeg",
        F.round("rank", 9).alias("rank"),
        F.round("rank_rel", 6).alias("rank_rel"),
    )


_TIE2_EDGES_SQL = """
    SELECT src, dst FROM (
      SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS w
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ) WHERE w >= 2
"""


@query(
    "kcore_copurchase",
    kcore_oracle_cte(_TIE2_EDGES_SQL, k=3, rounds=12),
)
def q_kcore_copurchase(spark, sf_dir):
    """3-core of the strong co-purchase graph (parts sharing >= 2
    orders): iteratively peel vertices with degree < 3 until only the
    maximal min-degree-3 subgraph remains — the standard dense-cluster
    extraction for recommendation seeds / fraud rings / community
    cores. Peeling takes 10 rounds to converge on this graph at
    sf0.01; rounds=12 gives margin while staying oracle-unrollable.

    Scale: the tie-strength edge build is one self-join bounded by
    items-per-order squared plus one (src,dst) groupBy; each peel round
    is a degree count + two semi-joins on a strictly shrinking edge
    list, localCheckpoint'd so rounds never replan their prefix."""
    from commercial_rfp_data_pipeline_spark.operators.graph import kcore_peel
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        copurchase_n_edges,
    )

    wedges, _ = _copurchase(spark, sf_dir)
    # tie strength = DISTINCT shared orders (the artifact's w_dist)
    edges = wedges.filter(F.col("w_dist") >= 2).select("src", "dst")
    # the manifest literal upper-bounds the filtered edge count, which
    # is all the small-graph dispatch needs
    return kcore_peel(
        edges, k=3, rounds=12, n_edges=copurchase_n_edges(spark, sf_dir)
    )


_LPA_LABELS_CTE = f"""
    edges AS ({_EDGES_SQL}),
    l0 AS (SELECT p_partkey AS id, p_partkey AS lbl FROM part),
    n1 AS (
      SELECT e.dst AS id, l.lbl, count(*) AS c
      FROM edges e JOIN l0 l ON l.id = e.src GROUP BY e.dst, l.lbl
    ),
    b1 AS (
      SELECT id, lbl FROM (
        SELECT *, row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
        FROM n1
      ) WHERE rn = 1
    ),
    l1 AS (SELECT l0.id, coalesce(b1.lbl, l0.lbl) AS lbl
           FROM l0 LEFT JOIN b1 USING (id)),
    n2 AS (
      SELECT e.dst AS id, l.lbl, count(*) AS c
      FROM edges e JOIN l1 l ON l.id = e.src GROUP BY e.dst, l.lbl
    ),
    b2 AS (
      SELECT id, lbl FROM (
        SELECT *, row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
        FROM n2
      ) WHERE rn = 1
    ),
    l2 AS (SELECT l1.id, coalesce(b2.lbl, l1.lbl) AS lbl
           FROM l1 LEFT JOIN b2 USING (id))
"""


def _mod_local_ok(spark, sf_dir) -> bool:
    from commercial_rfp_data_pipeline_spark.operators.graph import (
        _local_eligible_heavy,
    )
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        copurchase_n_edges,
    )

    return _local_eligible_heavy(copurchase_n_edges(spark, sf_dir))


def _modularity_local(spark, labels, deg, edges):
    """Driver-side replica of the modularity aggregation (round 10):
    per-community numerators are exact integer counts, and the one
    double expression per community (intra/2m - (ds/2m)^2, round 6,
    negative-zero canonicalized) replicates the distributed column
    expression op for op — elementwise, no sums, so it is bit-exact,
    with the same shortest-repr HALF_UP rounding as Spark's
    round(double, 6). Falls back (None) on non-integer ids or an
    empty edge list."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    from commercial_rfp_data_pipeline_spark.operators.graph import _int_cols

    lc = _int_cols(labels, "id", "community")
    dc = _int_cols(deg, "id", "k")
    ec = _int_cols(edges, "src", "dst")
    if lc is None or dc is None or ec is None or len(ec[0]) == 0:
        return None
    lid, lcom = lc
    order = np.argsort(lid)
    lid, lcom = lid[order], lcom[order]
    if len(lid) > 1 and (lid[1:] == lid[:-1]).any():
        return None
    did, dk = dc
    s, d = ec
    m2 = len(s)
    coms, cpos = np.unique(lcom, return_inverse=True)
    n_nodes = np.bincount(cpos, minlength=len(coms))
    # degree_sum: labels LEFT JOIN deg — nodes without a degree row sum 0
    dorder = np.argsort(did)
    did, dk = did[dorder], dk[dorder]
    p = np.searchsorted(did, lid)
    ok = p < len(did)
    p = np.where(ok, p, 0)
    ok &= did[p] == lid
    kvals = np.where(ok, dk[p], 0)
    degree_sum = np.bincount(cpos, weights=kvals, minlength=len(coms)).astype(
        np.int64
    )
    # intra: directed edges whose two endpoints carry the same label
    sp = np.searchsorted(lid, s)
    sok = sp < len(lid)
    sp = np.where(sok, sp, 0)
    sok &= lid[sp] == s
    dp = np.searchsorted(lid, d)
    dok = dp < len(lid)
    dp = np.where(dok, dp, 0)
    dok &= lid[dp] == d
    m = sok & dok & (lcom[sp] == lcom[dp])
    intra = np.bincount(cpos[sp[m]], minlength=len(coms))
    m2f = float(m2)
    six = Decimal("0.000001")
    contrib = []
    for i in range(len(coms)):
        # pure Python floats so repr() is the shortest round-trip form
        ds = int(degree_sum[i]) / m2f
        x = int(intra[i]) / m2f - ds * ds
        contrib.append(
            float(Decimal(repr(x)).quantize(six, ROUND_HALF_UP)) + 0.0
        )
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "community": coms,
                "n_nodes": n_nodes,
                "degree_sum": degree_sum,
                "intra_directed": intra,
                "modularity_contrib": contrib,
            }
        ),
        "community long, n_nodes long, degree_sum long, "
        "intra_directed long, modularity_contrib double",
    )


@query(
    "community_modularity",
    f"""
    WITH {{_LPA_LABELS_CTE}},
    deg AS (SELECT src AS id, count(*) AS k FROM edges GROUP BY src),
    m2 AS (SELECT count(*) AS m2 FROM edges),
    intra AS (
      SELECT la.lbl AS community, count(*) AS intra_directed
      FROM edges e
      JOIN l2 la ON la.id = e.src
      JOIN l2 lb ON lb.id = e.dst
      WHERE la.lbl = lb.lbl
      GROUP BY la.lbl
    ),
    comm AS (
      SELECT l2.lbl AS community, count(*) AS n_nodes,
             sum(coalesce(d.k, 0)) AS degree_sum
      FROM l2 LEFT JOIN deg d ON d.id = l2.id
      GROUP BY l2.lbl
    )
    SELECT c.community, CAST(c.n_nodes AS BIGINT) AS n_nodes,
           CAST(c.degree_sum AS BIGINT) AS degree_sum,
           CAST(coalesce(i.intra_directed, 0) AS BIGINT) AS intra_directed,
           round(coalesce(i.intra_directed, 0) / CAST(m2.m2 AS DOUBLE)
                 - (c.degree_sum / CAST(m2.m2 AS DOUBLE))
                   * (c.degree_sum / CAST(m2.m2 AS DOUBLE)), 6) + 0.0
             AS modularity_contrib
    FROM comm c LEFT JOIN intra i USING (community) CROSS JOIN m2
    """.replace("{_LPA_LABELS_CTE}", _LPA_LABELS_CTE),
)
def q_community_modularity(spark, sf_dir):
    """Newman modularity per LPA community — the quality score that
    tells you whether a partition is better than random: contribution
    = intra_edges/2m - (degree_sum/2m)^2, summing to Q over
    communities. All-integer numerators (directed edge counts, degree
    sums) with one final division keep both engines bit-aligned.

    Scale: degrees and intra counts are each ONE groupBy over the edge
    list after two label joins partitioned on the edge endpoints — no
    new shape beyond the LPA supersteps that produced the labels."""
    # round 10: labels come from the durable `ensure_lpa_labels`
    # artifact shared with label_propagation_communities — one LPA
    # derivation per (lineitem, part) content signature, not one per
    # consuming query; the oracle still states the full LPA chain
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        ensure_lpa_labels,
    )

    wedges, degrees = _copurchase(spark, sf_dir)
    edges = wedges.select("src", "dst")
    from commercial_rfp_data_pipeline_spark.io import pin

    edges = pin(edges, "modularity_edges")
    labels = ensure_lpa_labels(spark, sf_dir, n_iters=2).select(
        "id", "community"
    )
    deg = degrees.select("id", F.col("d").alias("k"))
    if _mod_local_ok(spark, sf_dir):
        out = _modularity_local(spark, labels, deg, edges)
        if out is not None:
            return out
    m2 = edges.count()  # 2m — a scalar the driver holds, like the CC fixpoint probe
    la = labels.select(F.col("id").alias("src"), F.col("community").alias("ca"))
    lb = labels.select(F.col("id").alias("dst"), F.col("community").alias("cb"))
    intra = (
        edges.join(la, "src")
        .join(lb, "dst")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count("*").alias("intra_directed"))
    )
    comm = (
        labels.join(deg, "id", "left")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.coalesce(F.sum("k"), F.lit(0)).alias("degree_sum"),
        )
    )
    out = comm.join(intra, "community", "left")
    return out.select(
        "community",
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("degree_sum").cast("long").alias("degree_sum"),
        F.coalesce(F.col("intra_directed"), F.lit(0))
        .cast("long")
        .alias("intra_directed"),
        (
            F.round(
                F.coalesce(F.col("intra_directed"), F.lit(0)) / F.lit(float(m2))
                - (F.col("degree_sum") / F.lit(float(m2)))
                * (F.col("degree_sum") / F.lit(float(m2))),
                6,
            )
            # + 0.0 canonicalizes IEEE negative zero: a contribution that
            # rounds to -0.0 must compare equal to +0.0 at the value level
            # (DuckDB's round preserves the sign of zero, Spark's doesn't)
            + F.lit(0.0)
        ).alias("modularity_contrib"),
    )


# ---- link prediction (resource-allocation index) ---------------------
# Serving shape: predictions FOR a fixed seed set, the way a
# recommender asks "what should co-occur with these parts?". The
# all-pairs form is sum(deg^2) wedges — quadratic in neighborhood size
# across the whole graph — so the registered query bounds the wedge
# fanout to seeds x deg^2, the same constant-query-side discipline as
# N_QUERIES in the vector family. (First cut ran the all-pairs wedge
# join: 104 s at sf0.01 and growing superlinearly — re-scoped.)
_LP_SEEDS = (3, 7, 11, 15, 19)
_LP_TOPK = 5

_LP_SQL = f"""
    WITH e0 AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                      greatest(a.l_partkey, b.l_partkey) AS v
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    adj AS (
      SELECT u AS x, v AS z FROM e0
      UNION ALL
      SELECT v AS x, u AS z FROM e0
    ),
    deg AS (SELECT x AS z, CAST(count(*) AS BIGINT) AS deg
            FROM adj GROUP BY x),
    seeds AS (
      SELECT x AS u, z FROM adj WHERE x IN {{seeds}}
    ),
    wedges AS (
      SELECT s.u, a2.x AS v, s.z
      FROM seeds s JOIN adj a2 ON a2.z = s.z AND a2.x <> s.u
    ),
    nonadj AS (
      SELECT w.u, w.v, w.z FROM wedges w
      WHERE NOT EXISTS (
        SELECT 1 FROM e0
        WHERE e0.u = least(w.u, w.v) AND e0.v = greatest(w.u, w.v))
    ),
    scored AS (
      SELECT n.u, n.v,
             CAST(count(*) AS BIGINT) AS n_common,
             CAST(sum(CAST(round(1.0 / d.deg, 6) AS DECIMAL(18,6)))
               AS DOUBLE) AS ra_score
      FROM nonadj n JOIN deg d ON d.z = n.z
      GROUP BY n.u, n.v
    )
    SELECT u, v, n_common, ra_score, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY u ORDER BY ra_score DESC, v) AS rnk
      FROM scored
    ) WHERE rnk <= {{topk}}
""".format(seeds=repr(_LP_SEEDS), topk=_LP_TOPK)


@query("link_prediction_resource_alloc", _LP_SQL)
def q_link_prediction_ra(spark, sf_dir):
    """Link prediction for a seed set over the co-purchase graph via
    the resource-allocation index (Zhou/Lu/Zhang 2009): for each seed
    u and each NON-adjacent v sharing at least one neighbor, RA(u,v) =
    sum over common neighbors z of 1/deg(z) — common neighbors
    discount hubs. Top-5 predicted links per seed, with the
    common-neighbor count. RA rather than Adamic-Adar (1/log deg) by
    design: 1/deg rounds to an exact 6-dp decimal so the score sum is
    order-independent on both engines, where ln() is libm-dependent.

    Scale: the seed adjacency is seeds x deg rows (broadcastable); the
    wedge join fans out to seeds x deg^2, NOT sum over all nodes of
    deg^2 — query cost is constant in corpus size once degree is
    bounded, and the candidate dedup + top-k partition by seed."""
    wedges, degrees = _copurchase(spark, sf_dir)
    e0 = wedges.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    from commercial_rfp_data_pipeline_spark.io import pin

    e0 = pin(e0)
    adj = wedges.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    deg = degrees.select(
        F.col("id").alias("z"), F.col("d").cast("bigint").alias("deg")
    )
    seeds = adj.filter(F.col("x").isin(*_LP_SEEDS)).select(
        F.col("x").alias("u"), "z"
    )
    wedges = (
        F.broadcast(seeds)
        .join(adj.withColumnRenamed("x", "v"), "z")
        .filter(F.col("v") != F.col("u"))
        .select("u", "v", "z")
    )
    nonadj = wedges.join(
        e0.select(
            F.col("u").alias("_eu"), F.col("v").alias("_ev")
        ),
        (F.least("u", "v") == F.col("_eu"))
        & (F.greatest("u", "v") == F.col("_ev")),
        "left_anti",
    )
    scored = (
        nonadj.join(deg, "z")
        .groupBy("u", "v")
        .agg(
            F.count("*").cast("bigint").alias("n_common"),
            F.sum(
                F.round(F.lit(1.0) / F.col("deg"), 6).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("ra_score"),
        )
    )
    w = Window.partitionBy("u").orderBy(
        F.col("ra_score").desc(), F.col("v")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _LP_TOPK)
    )
