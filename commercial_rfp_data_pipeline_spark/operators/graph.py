"""Graph analytics operators: fixed-iteration PageRank.

Complements the connected-components operator (`operators/dedup.py:
dup_clusters`) with the other workhorse iterative graph primitive a
training-data pipeline uses: importance weighting over a similarity /
co-occurrence graph (e.g. rank documents by centrality in the near-dup
graph before choosing cluster survivors, or rank products by
co-purchase centrality).

Design for scale (the GraphX/Pregel discipline, expressed as DataFrame
ops):
- per iteration: ONE join of the rank state to the edge list (shuffle
  on src) + ONE groupBy(dst) sum with map-side partial aggregation —
  exactly the message/aggregate pattern;
- the edge list and the static (id, outdeg) vertex table are pinned —
  built once, read every superstep;
- a FIXED iteration count (deterministic, oracle-expressible as an
  unrolled CTE chain) rather than convergence polling — at 100 TB you
  run the budgeted number of supersteps;
- dangling-node mass: on a SYMMETRIZED graph a vertex with in-edges
  always has out-edges, so dangling == isolated, every isolated vertex
  carries the same rank, and the dangling mass D_k follows a scalar
  recurrence computable up front (``symmetric=True`` — zero extra
  distributed work per superstep). For general directed graphs
  (``symmetric=False``) D_k is a one-row aggregate cross-joined back
  in (stays in-plan; no per-iteration driver collect);
- each round's state is lazily localCheckpoint'd so round k+1 reads a
  materialized rank table instead of recomputing rounds 1..k (the same
  per-round truncation `dup_clusters` uses; on a real cluster use a
  reliable checkpoint dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import pin

DAMPING = 0.85
ITERATIONS = 5


def _teleport_constants(
    n: int, m_isolated: int, damping: float, iterations: int
) -> list[float]:
    """Per-superstep additive constant c_k = (1-d)/n + d·D_k/n for a
    symmetrized graph, where the dangling mass D_k = m·r_iso_k and the
    isolated-vertex rank follows r_iso_{k+1} = c_k (isolated vertices
    receive no contributions). Plain float arithmetic — the oracle
    generator runs the SAME function, so both engines embed identical
    literals."""
    consts = []
    r_iso = 1.0 / n
    for _ in range(iterations):
        d_mass = m_isolated * r_iso
        c = (1.0 - damping) / n + damping * d_mass / n
        consts.append(c)
        r_iso = c
    return consts


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
    symmetric: bool = True,
    checkpoint: bool = True,
    dedup_edges: bool = False,
    teleport_col: str | None = None,
    weight_col: str | None = None,
    n_edges: int | None = None,
    edges_symmetric: bool = False,
) -> DataFrame:
    """PageRank with uniform — or PERSONALIZED — teleport and
    dangling-mass redistribution.

    ``nodes``: one row per vertex (``id_col``); ``edges``: directed
    (``src_col``, ``dst_col``) — symmetrize in the caller for an
    undirected graph (and only then is ``symmetric=True`` valid: it
    assumes every vertex with in-edges has out-edges). Returns
    (id, outdeg, rank, rank_rel) where ``rank`` sums to 1 over all
    vertices and ``rank_rel`` = rank × n (mean 1.0 — scale-free, the
    number you threshold on).

    rank_{k+1}(v) = (1-d)·t_v + d * (Σ_{u→v} rank_k(u)/outdeg(u) + D_k·t_v)
    with D_k = Σ_{dangling u} rank_k(u) and t_v the teleport weight.

    ``teleport_col``: optional column on ``nodes`` with per-vertex
    teleport weights SUMMING TO 1 (zeros allowed) — Personalized
    PageRank: random walks restart only at the weighted seed set, so
    rank measures proximity to the seeds (the "related items for X"
    primitive). Requires ``symmetric=False`` (the closed-form dangling
    recurrence assumes uniform teleport); initial rank is t_v. Uniform
    (None) preserves classic PageRank exactly.

    ``weight_col``: optional POSITIVE edge weights on ``edges`` —
    weighted PageRank: a vertex splits its rank over out-edges
    proportionally to weight (contribution = rank * w / sum_w(src))
    instead of uniformly. ``outdeg`` in the output becomes the
    out-weight sum. The dangling recurrences are unchanged: dangling
    means zero out-WEIGHT, which on a symmetrized weighted graph is
    still exactly the isolated vertices. Incompatible with
    ``dedup_edges`` (a distinct would drop weights).
    """
    if weight_col is not None and dedup_edges:
        raise ValueError("pagerank: dedup_edges would drop edge weights")
    if teleport_col is not None and symmetric:
        raise ValueError(
            "pagerank: personalized teleport needs symmetric=False "
            "(the closed-form dangling recurrence assumes uniform teleport)"
        )
    if _local_eligible(n_edges):
        out = _pagerank_local(
            nodes, edges, id_col, src_col, dst_col, damping,
            iterations, symmetric, dedup_edges, teleport_col, weight_col,
        )
        if out is not None:
            pagerank.last_local = True
            return out
    pagerank.last_local = False
    # the edge list feeds every superstep — build it once and pin it
    # (at cluster scale: persist to MEMORY_AND_DISK or a parquet
    # checkpoint; recomputing an edge-generation join per superstep is
    # the classic iterative-job mistake)
    # pre-partition on _src so every superstep's state⨝edges join reuses
    # the cached partitioning (InMemoryRelation preserves its child's
    # outputPartitioning — only the small state side shuffles per round).
    # With dedup_edges the distinct runs AFTER the repartition: hash(_src)
    # satisfies the distinct's clustering requirement (subset rule), so
    # Catalyst plans a local HashAggregate with NO second Exchange — the
    # edge set crosses the network once, not twice
    w_cols = (
        [F.col(weight_col).alias("_w")] if weight_col is not None else []
    )
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"), *w_cols
    )
    e = e.repartition(F.col("_src"))
    if dedup_edges:
        e = e.distinct()
    e = pin(e)
    if weight_col is not None:
        deg = e.groupBy("_src").agg(F.sum("_w").alias("outdeg"))
    else:
        deg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("outdeg"))
    tp_cols = (
        [F.col(teleport_col).alias("_tp")] if teleport_col is not None else []
    )
    base = pin(
        nodes.select(F.col(id_col).alias("_id"), *tp_cols)
        .distinct()
        .join(deg, F.col("_id") == F.col("_src"), "left")
        .select(
            "_id",
            F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
            *( [F.col("_tp")] if teleport_col is not None else [] ),
        )
    )
    n = base.count()
    init = F.col("_tp") if teleport_col is not None else F.lit(1.0 / n)
    state = base.select("_id", "outdeg", init.alias("rank"))

    consts: list[float] | None = None
    if symmetric:
        # round 11: count the dangling nodes on the PINNED base (one
        # cached-scan job) instead of a full distinct pass over the
        # edge list — same value whenever edge srcs come from the node
        # universe (symmetric=True's contract), and the more faithful
        # reading of "isolated" when they don't (it is exactly the set
        # whose rank the closed-form constants model)
        m_isolated = base.filter(F.col("outdeg") == 0).count()
        consts = _teleport_constants(n, m_isolated, damping, iterations)

    # round 11 (VERDICT r10 #4): the non-closed-form loop paid a full
    # state pass (dangling-mass aggregate) plus a broadcast exchange
    # PER SUPERSTEP. That mass is PROVABLY 0.0 for every round when
    # each dangling (outdeg == 0) vertex both carries zero teleport
    # weight and receives no contributions (no in-edges): by induction
    # rank_k(v) = (1-d)*0 + d*(0 + D_{k-1}*0) = 0, so D_k = 0. Check
    # the precondition ONCE (two early-out probes) and drop the
    # per-round aggregate — the emitted ranks are bit-identical
    # (s + 0.0*t_v == s for the non-negative contributions here).
    # The personalized co-purchase query hits this: its isolated parts
    # have t_v = 0 and, on a symmetrized edge list, no in-edges.
    import os as _os

    dangling_zero = False
    if consts is None and _os.environ.get(
        "SPARK_GRAFT_PR_DANGLING_FAST", "1"
    ) not in ("0", "false"):
        tpc = F.col("_tp") if teleport_col is not None else F.lit(1.0 / n)
        d_nodes = base.filter(F.col("outdeg") == 0)
        dangling_zero = d_nodes.filter(tpc != 0.0).limit(1).count() == 0
        # ``edges_symmetric`` (caller hint, e.g. the symmetrized
        # co-purchase wedges): outdeg-0 nodes have no in-edges by
        # construction, so the in-edge probe is vacuous — skip its job
        if dangling_zero and not edges_symmetric:
            dangling_zero = (
                e.join(
                    F.broadcast(
                        d_nodes.select(F.col("_id").alias("_dst"))
                    ),
                    "_dst",
                    "left_semi",
                )
                .limit(1)
                .count()
                == 0
            )

    # round 11: when the dangling mass is closed-form (consts) or
    # provably zero, ``state`` has exactly ONE consumer per round
    # (contribs) — the whole 5-round recurrence is a straight chain
    # over the two PINNED relations (e, base), so nothing can
    # recompute and the per-round localCheckpoint is pure overhead
    # (measured ~0.8-2 s of analyze/optimize/RDD-planning per round on
    # this VM, the dominant cost of the distributed loop at sf0.1).
    # Only the in-plan dangling-aggregate path still double-consumes
    # state and keeps the per-round truncation.
    single_consumer = consts is not None or dangling_zero
    for k in range(iterations):
        if checkpoint and not single_consumer:
            # truncate lineage so each superstep is one job over a
            # materialized state table, not a recompute of all priors
            state = state.localCheckpoint(eager=False)
        share = (
            F.col("rank") * F.col("_w") / F.col("outdeg")
            if weight_col is not None
            else F.col("rank") / F.col("outdeg")
        )
        contribs = (
            state.filter(F.col("outdeg") > 0)
            .join(e, F.col("_id") == F.col("_src"))
            .select("_dst", share.alias("_c"))
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_s"))
        )
        nxt = base.join(contribs, F.col("_id") == F.col("_dst"), "left")
        if consts is not None:
            rank = F.lit(consts[k]) + damping * F.coalesce("_s", F.lit(0.0))
        elif dangling_zero:
            tp = F.col("_tp") if teleport_col is not None else F.lit(1.0 / n)
            rank = (1.0 - damping) * tp + damping * F.coalesce(
                "_s", F.lit(0.0)
            )
        else:
            dangling = state.agg(
                F.coalesce(
                    F.sum(F.when(F.col("outdeg") == 0, F.col("rank"))),
                    F.lit(0.0),
                ).alias("_dmass")
            )
            nxt = nxt.crossJoin(F.broadcast(dangling))
            tp = F.col("_tp") if teleport_col is not None else F.lit(1.0 / n)
            rank = (
                (1.0 - damping) * tp
                + damping
                * (F.coalesce("_s", F.lit(0.0)) + F.col("_dmass") * tp)
            )
        state = nxt.select("_id", "outdeg", rank.alias("rank"))
    return state.select(
        F.col("_id").alias(id_col),
        "outdeg",
        F.col("rank"),
        (F.col("rank") * n).alias("rank_rel"),
    )


def _pagerank_local(
    nodes,
    edges,
    id_col,
    src_col,
    dst_col,
    damping,
    iterations,
    symmetric,
    dedup_edges,
    teleport_col,
    weight_col,
):
    """Driver-side numpy replica of the PageRank supersteps — all
    three registered semantics (uniform closed-form, personalized
    teleport, weighted split). Per-superstep arithmetic replicates the
    distributed expressions op for op (same IEEE multiply/divide/add
    order per element); only the per-destination SUM order differs,
    which both the oracle comparison and the distributed path already
    tolerate by construction: every consumer publishes rank rounded to
    9 dp (rank_rel 6 dp), and the order-dependent double-sum residue
    is ~1e-18 against a 5e-10 rounding boundary. Returns None (caller
    falls back) on non-integer ids/weights or duplicate node rows."""
    import numpy as np
    import pandas as pd

    ecols = [src_col, dst_col] + ([weight_col] if weight_col else [])
    ecs = _int_cols(edges.select(*ecols), *ecols)
    if ecs is None:
        return None
    s, d = ecs[0], ecs[1]
    w = ecs[2] if weight_col else None
    if dedup_edges and len(s):
        pair = np.unique(np.stack([s, d], axis=1), axis=0)
        s, d = pair[:, 0], pair[:, 1]
    ncols = [id_col] + ([teleport_col] if teleport_col else [])
    npdf = nodes.select(*ncols).distinct().toPandas()
    raw_ids = npdf[id_col].to_numpy()
    if len(raw_ids) == 0 or not np.issubdtype(raw_ids.dtype, np.integer):
        return None
    raw_ids = raw_ids.astype(np.int64, copy=False)
    order = np.argsort(raw_ids)
    ids = raw_ids[order]
    if len(ids) > 1 and (ids[1:] == ids[:-1]).any():
        return None  # duplicate ids (e.g. conflicting teleport rows)
    tp = None
    if teleport_col:
        tp = npdf[teleport_col].to_numpy().astype(np.float64)[order]
    n = len(ids)
    spos, sok = _np_lookup(ids, s)
    dpos, dok = _np_lookup(ids, d)
    # out-degree (or out-weight sum) per NODE over ALL edge rows —
    # exactly the deg groupBy the base left-join consumes
    outdeg = np.zeros(n, np.int64)
    np.add.at(outdeg, spos[sok], w[sok] if w is not None else 1)
    rank = tp.copy() if tp is not None else np.full(n, 1.0 / n)
    consts = None
    if symmetric:
        m_isolated = n - len(np.unique(s))
        consts = _teleport_constants(n, m_isolated, damping, iterations)
    m = sok & dok  # state⨝edges⨝base: both endpoints must be nodes
    ces, ced = spos[m], dpos[m]
    cew = w[m] if w is not None else None
    for k in range(iterations):
        if cew is not None:
            share = rank[ces] * cew / outdeg[ces]
        else:
            share = rank[ces] / outdeg[ces]
        contribs = np.bincount(ced, weights=share, minlength=n)
        if consts is not None:
            rank = consts[k] + damping * contribs
        else:
            dmass = float(rank[outdeg == 0].sum())
            t_v = tp if tp is not None else 1.0 / n
            rank = (1.0 - damping) * t_v + damping * (
                contribs + dmass * t_v
            )
    return nodes.sparkSession.createDataFrame(
        pd.DataFrame(
            {
                id_col: ids,
                "outdeg": outdeg,
                "rank": rank,
                "rank_rel": rank * n,
            }
        ),
        f"{id_col} long, outdeg long, rank double, rank_rel double",
    )


def pagerank_oracle_cte(
    nodes_sql: str,
    edges_sql: str,
    id_col: str = "id",
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
    n: int | None = None,
    m_isolated: int | None = None,
    weighted: bool = False,
) -> str:
    """DuckDB oracle for :func:`pagerank`, generated from the SAME
    constants — the iteration unrolls into a chained-CTE sequence so
    the two engines cannot drift. ``nodes_sql``/``edges_sql`` are
    SELECTs producing (id) and (src, dst).

    When ``n``/``m_isolated`` are given (the symmetric fast path), the
    per-superstep teleport constants come from
    :func:`_teleport_constants` — the same floats the engine embeds;
    otherwise the dangling mass is restated as a scalar subquery per
    round. CTEs are MATERIALIZED: every state CTE is referenced twice
    (contribution join + dangling mass) and without the keyword DuckDB
    inlines each reference, recomputing the chain 2^iterations times."""
    d = damping
    ctes = [
        f"_nodes AS MATERIALIZED ({nodes_sql})",
        f"_edges AS MATERIALIZED ({edges_sql})",
        "_n AS MATERIALIZED (SELECT count(*) AS n FROM (SELECT DISTINCT id FROM _nodes))",
        (
            "_deg AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS outdeg"
            " FROM _edges GROUP BY src)"
            if weighted
            else "_deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM _edges GROUP BY src)"
        ),
        """state0 AS MATERIALIZED (
          SELECT v.id, coalesce(g.outdeg, 0) AS outdeg,
                 1.0 / (SELECT n FROM _n) AS rank
          FROM (SELECT DISTINCT id FROM _nodes) v
          LEFT JOIN _deg g ON v.id = g.src
        )""",
    ]
    consts = (
        _teleport_constants(n, m_isolated, damping, iterations)
        if n is not None and m_isolated is not None
        else None
    )
    share = "q.rank * e.w / q.outdeg" if weighted else "q.rank / q.outdeg"
    for k in range(iterations):
        p, c = f"state{k}", f"state{k + 1}"
        if consts is not None:
            base_term = repr(consts[k])
        else:
            base_term = f"""(1.0 - {d}) / (SELECT n FROM _n)
                 + {d} * (SELECT coalesce(sum(CASE WHEN outdeg = 0 THEN rank END), 0.0)
                          FROM {p}) / (SELECT n FROM _n)"""
        ctes.append(
            f"""{c} AS MATERIALIZED (
          SELECT p.id, p.outdeg,
                 {base_term}
                 + {d} * coalesce(s._s, 0.0) AS rank
          FROM {p} p
          LEFT JOIN (
            SELECT e.dst, sum({share}) AS _s
            FROM {p} q JOIN _edges e ON q.id = e.src
            WHERE q.outdeg > 0
            GROUP BY e.dst
          ) s ON p.id = s.dst
        )"""
        )
    final = f"state{iterations}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT id AS {id_col}, outdeg,
               round(rank, 9) AS rank,
               round(rank * (SELECT n FROM _n), 6) AS rank_rel
        FROM {final}
        """
    )


def ppr_oracle_cte(
    nodes_sql: str,
    edges_sql: str,
    teleport_sql: str,
    id_col: str = "id",
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
) -> str:
    """DuckDB oracle for PERSONALIZED :func:`pagerank`
    (``teleport_col`` path): the per-vertex teleport weight
    ``teleport_sql`` (an expression over ``id``; must sum to 1) rides
    every state CTE, and each round's dangling mass redistributes
    proportionally to it. Same unrolled-MATERIALIZED-CTE discipline as
    :func:`pagerank_oracle_cte`."""
    d = damping
    ctes = [
        f"_nodes AS MATERIALIZED ({nodes_sql})",
        f"_edges AS MATERIALIZED ({edges_sql})",
        "_n AS MATERIALIZED (SELECT count(*) AS n FROM (SELECT DISTINCT id FROM _nodes))",
        "_deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM _edges GROUP BY src)",
        f"""state0 AS MATERIALIZED (
          SELECT v.id, coalesce(g.outdeg, 0) AS outdeg,
                 {teleport_sql} AS tp,
                 {teleport_sql} AS rank
          FROM (SELECT DISTINCT id FROM _nodes) v
          LEFT JOIN _deg g ON v.id = g.src
        )""",
    ]
    share = "q.rank / q.outdeg"
    for k in range(iterations):
        p, c = f"state{k}", f"state{k + 1}"
        dmass = f"""(SELECT coalesce(sum(CASE WHEN outdeg = 0 THEN rank END), 0.0)
                     FROM {p})"""
        ctes.append(
            f"""{c} AS MATERIALIZED (
          SELECT p.id, p.outdeg, p.tp,
                 (1.0 - {d}) * p.tp
                 + {d} * ({dmass}) * p.tp
                 + {d} * coalesce(s._s, 0.0) AS rank
          FROM {p} p
          LEFT JOIN (
            SELECT e.dst, sum({share}) AS _s
            FROM {p} q JOIN _edges e ON q.id = e.src
            WHERE q.outdeg > 0
            GROUP BY e.dst
          ) s ON p.id = s.dst
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT id AS {id_col}, outdeg,
               round(rank, 9) AS rank,
               round(rank * (SELECT n FROM _n), 6) AS rank_rel
        FROM state{iterations}
        """
    )




# ---- driver-side small-graph fast path (round 10) --------------------
#
# Every distributed superstep of the fixed-round loops below costs one
# join + one groupBy of pure job overhead (~0.3-1.6 s on this VM)
# regardless of data size; graphs that fit comfortably on the driver
# pay seconds for microseconds of work. The same scale-adaptive
# discipline as `dup_clusters`' union-find fast path: when the CALLER
# knows the edge count (a manifest literal for the durable graph
# artifacts — no extra job) and it is under
# SPARK_GRAFT_GRAPH_LOCAL_EDGES (default 4M directed rows, the same
# sizing class as the triangle broadcast cutoff: 2-3 int64 columns
# x 4M = 64-96 MB via Arrow), the loop runs as exact numpy/int
# kernels driver-side and the result is parallelized back. Larger
# graphs — and any caller that does not pass ``n_edges`` — keep the
# distributed O(rounds) join/groupBy loops unchanged. Every local
# kernel replicates the distributed arithmetic EXACTLY (integer hops/
# distances/labels; HITS' decimal(18,6) as scaled-int micro units with
# the identical shortest-repr HALF_UP rounding), equality-tested
# against the distributed path and proven again by every green oracle
# verify at the small SFs (where the local path is the one serving).


def graph_local_limit() -> int:
    import os as _os

    return int(_os.environ.get("SPARK_GRAFT_GRAPH_LOCAL_EDGES", "4000000"))


def graph_local_limit_heavy() -> int:
    """Lower cutoff for the SUPER-LINEAR local kernels (label
    propagation's per-round lexsort over the edge stream, modularity's
    second edge collect, triangle counting's Σ C(outdeg,2) wedge
    stream): measured on this class of VM, their driver-side cost
    crosses the distributed loop's near 1-2M edges (e.g. at the 2.39M-
    edge sf0.1 co-purchase graph: LPA local 8.5 s vs distributed 5.1 s
    warm; triangle local 14+ s vs 5.9 s — the wedge stream is 41M rows
    there), while the cheap linear-per-edge kernels (BFS/SSSP/
    PageRank/HITS/k-core) still win at 4M. Both knobs are env
    parameters; production values belong in cluster conf."""
    import os as _os

    return int(
        _os.environ.get("SPARK_GRAFT_GRAPH_LOCAL_EDGES_HEAVY", "1000000")
    )


def _local_eligible(n_edges: int | None) -> bool:
    return n_edges is not None and 0 <= n_edges <= graph_local_limit()


def _local_eligible_heavy(n_edges: int | None) -> bool:
    return n_edges is not None and 0 <= n_edges <= min(
        graph_local_limit(), graph_local_limit_heavy()
    )


def _np_lookup(sorted_ids, vals):
    """(positions, found_mask) of ``vals`` in the sorted id array."""
    import numpy as np

    pos = np.searchsorted(sorted_ids, vals)
    ok = pos < len(sorted_ids)
    pos = np.where(ok, pos, 0)
    ok &= sorted_ids[pos] == vals
    return pos, ok


def _int_cols(df: DataFrame, *cols):
    """Collect ``cols`` via Arrow as int64 numpy arrays, or None if any
    column is not integer-typed (caller falls back to distributed)."""
    import numpy as np

    pdf = df.select(*cols).toPandas()
    out = []
    for c in cols:
        a = pdf[c].to_numpy()
        if not np.issubdtype(a.dtype, np.integer):
            return None
        out.append(a.astype(np.int64, copy=False))
    return out


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
    n_edges: int | None = None,
) -> DataFrame:
    """Multi-source BFS: (id, hops) — the minimum hop count from any
    source, for every node reachable within ``max_hops``. Sources
    report hops=0.

    The frontier discipline is what makes this scale: round h joins
    ONLY the hop-(h-1) frontier against the edge table (never the
    whole visited set), anti-joins the already-visited set to keep the
    frontier minimal, and localCheckpoints both tables so round h+1's
    lineage does not replay rounds 1..h (the same iterative hygiene as
    dup_clusters / pagerank). A fixed ``max_hops`` keeps the whole
    construction SQL-expressible — the oracle states the identical
    bounded recursion. Pass ``n_edges`` (a manifest literal) to enable
    the driver-side small-graph fast path."""
    if _local_eligible(n_edges):
        out = _bfs_local(edges, sources, src, dst, max_hops)
        if out is not None:
            bfs_hops.last_local = True
            return out
    bfs_hops.last_local = False
    # edges stay LAZY: the per-round rebuild of a cheap scan-shaped
    # edge derivation beats materializing the full pair stream
    # (measured both ways at sf0.1); callers with an expensive edge
    # build should localCheckpoint it before calling
    dist = (
        sources.select(F.col(sources.columns[0]).alias("id"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint()
    )
    frontier = dist.select("id")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["id"] == edges[src])
            .select(F.col(dst).alias("id"))
            .distinct()
            .join(dist, "id", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint()
        )
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("id")
    return dist


def _bfs_local(edges, sources, src, dst, max_hops):
    """Exact numpy replica of the bounded frontier BFS: integer hop
    counts, so there is no arithmetic to drift. Returns None (caller
    falls back) on non-integer id columns."""
    import numpy as np
    import pandas as pd

    ed = _int_cols(edges, src, dst)
    sc = _int_cols(sources, sources.columns[0])
    if ed is None or sc is None:
        return None
    s, d = ed
    seeds = np.unique(sc[0])
    ids = np.unique(np.concatenate([s, d, seeds]))
    spos, sok = _np_lookup(ids, s)
    hops = np.full(len(ids), -1, np.int64)
    hops[np.searchsorted(ids, seeds)] = 0
    frontier = np.zeros(len(ids), bool)
    frontier[np.searchsorted(ids, seeds)] = True
    for h in range(1, max_hops + 1):
        m = frontier[spos] & sok
        if not m.any():
            break
        new = np.zeros(len(ids), bool)
        new[np.searchsorted(ids, d[m])] = True
        new &= hops < 0
        if not new.any():
            break
        hops[new] = h
        frontier = new
    reached = hops >= 0
    spark = edges.sparkSession
    return spark.createDataFrame(
        pd.DataFrame(
            {"id": ids[reached], "hops": hops[reached].astype("int32")}
        ),
        "id long, hops int",
    )


_HITS_DEC = "decimal(18,6)"


def hits(
    edges: DataFrame,
    n_iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    assume_distinct: bool = False,
    n_edges: int | None = None,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg) with sum-normalization,
    fixed ``n_iters`` rounds: auth(d) = sum of hub(s) over in-edges,
    hub(s) = sum of auth(d) over out-edges, each renormalized to sum
    1. Scores live as DECIMAL(18,6) (6-dp round after each normalize),
    so every per-node sum is order-independent and the whole unrolled
    iteration reproduces as oracle CTEs.

    Scale shape: each half-step is one edges-state equi-join plus one
    map-side-combining groupBy — identical cost to a PageRank
    superstep; normalization totals ride a broadcast one-row
    aggregate. Returns (role, id, score) with role in {hub, auth}.

    ``assume_distinct=True`` skips the dedup shuffle + materialization
    when the caller guarantees a distinct edge list (the durable
    bipartite artifact writes DISTINCT pairs). Pass ``n_edges`` (a
    manifest literal) to enable the driver-side small-graph fast path
    — exact to the bit, because the decimal(18,6) scores are scaled
    int64 micro-units locally and the per-half-step normalize
    replicates Spark's shortest-repr HALF_UP rounding."""
    if _local_eligible(n_edges) and n_iters >= 1:
        out = _hits_local(edges, src, dst, n_iters, assume_distinct)
        if out is not None:
            hits.last_local = True
            return out
    hits.last_local = False
    e = edges.select(src, dst)
    if not assume_distinct:
        e = e.distinct().localCheckpoint()
    hubs = (
        e.select(F.col(src).alias("id"))
        .distinct()
        .withColumn("hub", F.lit(1).cast(_HITS_DEC))
    )
    auths = None
    for _ in range(n_iters):
        araw = (
            e.join(hubs.withColumnRenamed("id", src), src)
            .groupBy(dst)
            .agg(F.sum("hub").alias("raw"))
            # cache the half-step result: it feeds BOTH the one-row
            # normalization total (broadcast) and the scores — without
            # this the edges-join-groupBy runs twice per half-step
            .localCheckpoint(eager=False)
        )
        atot = araw.agg(F.sum("raw").alias("tot"))
        auths = araw.crossJoin(F.broadcast(atot)).select(
            F.col(dst).alias("id"),
            F.round(
                F.col("raw").cast("double") / F.col("tot").cast("double"), 6
            )
            .cast(_HITS_DEC)
            .alias("auth"),
        )
        hraw = (
            e.join(auths.withColumnRenamed("id", dst), dst)
            .groupBy(src)
            .agg(F.sum("auth").alias("raw"))
            .localCheckpoint(eager=False)
        )
        htot = hraw.agg(F.sum("raw").alias("tot"))
        hubs = hraw.crossJoin(F.broadcast(htot)).select(
            F.col(src).alias("id"),
            F.round(
                F.col("raw").cast("double") / F.col("tot").cast("double"), 6
            )
            .cast(_HITS_DEC)
            .alias("hub"),
        )
        hubs = hubs.localCheckpoint(eager=False)
        auths = auths.localCheckpoint(eager=False)
    h = hubs.select(F.lit("hub").alias("role"), "id", F.col("hub").alias("score"))
    a = auths.select(
        F.lit("auth").alias("role"), "id", F.col("auth").alias("score")
    )
    return h.unionByName(a).select(
        "role", "id", F.col("score").cast("double").alias("score")
    )


def _hits_local(edges, src, dst, n_iters, assume_distinct):
    """Exact scaled-int replica of the decimal(18,6) HITS loop.

    Sums are exact (int64 micro-units, order-independent like the
    decimal sums they mirror). The per-half-step normalize replicates
    Spark's `round(raw_dec.cast(double) / tot_dec.cast(double), 6)
    .cast(decimal(18,6))` chain bit-for-bit: decimal->double casts are
    correctly rounded (CPython float(Decimal) likewise), the division
    is one IEEE op, and Spark's Round(double) goes through
    BigDecimal.valueOf = Double.toString = shortest round-trip repr —
    the same string CPython's repr() produces — then HALF_UP."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    ed = _int_cols(edges, src, dst)
    if ed is None:
        return None
    s, d = ed
    if not assume_distinct and len(s):
        pair = np.stack([s, d], axis=1)
        pair = np.unique(pair, axis=0)
        s, d = pair[:, 0], pair[:, 1]
    if not len(s):
        return None  # degenerate: let the distributed path define it
    src_ids = np.unique(s)
    dst_ids = np.unique(d)
    spos = np.searchsorted(src_ids, s)
    dpos = np.searchsorted(dst_ids, d)
    six = Decimal("0.000001")

    def _norm6(raw: np.ndarray) -> np.ndarray:
        tot = float(Decimal(int(raw.sum())).scaleb(-6))
        memo: dict[int, int] = {}
        out = np.empty(len(raw), np.int64)
        for i, r in enumerate(raw.tolist()):
            v = memo.get(r)
            if v is None:
                x = float(Decimal(r).scaleb(-6)) / tot
                v = int(
                    Decimal(repr(x)).quantize(six, ROUND_HALF_UP).scaleb(6)
                )
                memo[r] = v
            out[i] = v
        return out

    hub = np.full(len(src_ids), 10**6, np.int64)
    auth = None
    for _ in range(n_iters):
        araw = np.zeros(len(dst_ids), np.int64)
        np.add.at(araw, dpos, hub[spos])
        auth = _norm6(araw)
        hraw = np.zeros(len(src_ids), np.int64)
        np.add.at(hraw, spos, auth[dpos])
        hub = _norm6(hraw)

    def _dbl(m: np.ndarray) -> list[float]:
        return [float(Decimal(int(v)).scaleb(-6)) for v in m]

    pdf = pd.DataFrame(
        {
            "role": ["hub"] * len(src_ids) + ["auth"] * len(dst_ids),
            "id": np.concatenate([src_ids, dst_ids]),
            "score": _dbl(hub) + _dbl(auth),
        }
    )
    return edges.sparkSession.createDataFrame(
        pdf, "role string, id long, score double"
    )


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    n_iters: int = 2,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    n_edges: int | None = None,
) -> DataFrame:
    """Synchronous label-propagation community detection: every round
    each node adopts the most frequent label among its in-neighbors
    (count DESC, label ASC tiebreak — deterministic, unlike classic
    async LPA); nodes with no in-edges keep their label. Unlike
    connected components (min-label fixpoint = reachability), LPA's
    frequency vote splits dense regions from bridges, so a fixed small
    ``n_iters`` is the standard stopping rule (sync LPA need not
    converge — labels can oscillate).

    Per round: one edges-labels join + two map-side-combining groupBys
    ((node, lbl) counts, then per-node argmax) — the PageRank-superstep
    cost envelope. Returns (id, community). Pass ``n_edges`` (a
    manifest literal) to enable the driver-side small-graph fast
    path (heavy tier: the per-round vote lexsort is super-linear in
    the edge stream, so the cutoff is graph_local_limit_heavy)."""
    if _local_eligible_heavy(n_edges):
        out = _lpa_local(nodes, edges, n_iters, id_col, src, dst)
        if out is not None:
            label_propagation.last_local = True
            return out
    label_propagation.last_local = False
    # the edge list feeds every round — materialize it once (the same
    # iterative hygiene as hits/pagerank/sssp; callers often pass an
    # expensive lazy self-join). Measured ~2x at sf0.1 on the
    # co-purchase graph.
    edges = edges.select(src, dst).localCheckpoint()
    labels = nodes.select(F.col(id_col).alias("id")).withColumn(
        "lbl", F.col("id")
    )
    for _ in range(n_iters):
        neigh = (
            edges.join(labels.withColumnRenamed("id", src), src)
            .groupBy(F.col(dst).alias("id"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = neigh.groupBy("id").agg(
            F.max_by(
                "lbl", F.struct(F.col("c"), (-F.col("lbl")).alias("_neg"))
            ).alias("new_lbl")
        )
        labels = (
            labels.join(best, "id", "left")
            .select("id", F.coalesce("new_lbl", "lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    return labels.select("id", F.col("lbl").alias("community"))


def _lpa_local(nodes, edges, n_iters, id_col, src, dst):
    """Exact numpy replica of the synchronous frequency-vote rounds:
    integer labels, (count DESC, label ASC) tiebreak — nothing to
    drift. Returns None (caller falls back) on non-integer ids or a
    non-unique node list (the distributed join semantics then weight
    votes by node-row multiplicity, which the kernel does not model)."""
    import numpy as np
    import pandas as pd

    nd = _int_cols(nodes.select(id_col), id_col)
    ed = _int_cols(edges, src, dst)
    if nd is None or ed is None:
        return None
    raw_ids = nd[0]
    nid = np.unique(raw_ids)
    if len(nid) != len(raw_ids):
        return None
    s, d = ed
    spos, sok = _np_lookup(nid, s)
    dpos, dok = _np_lookup(nid, d)
    m = sok & dok
    vd_all, vs_all = dpos[m], spos[m]
    lbl = nid.copy()
    for _ in range(n_iters):
        if not len(vd_all):
            break
        vl = lbl[vs_all]
        order = np.lexsort((vl, vd_all))
        vd_s, vl_s = vd_all[order], vl[order]
        new_grp = np.empty(len(vd_s), bool)
        new_grp[0] = True
        new_grp[1:] = (vd_s[1:] != vd_s[:-1]) | (vl_s[1:] != vl_s[:-1])
        counts = np.bincount(np.cumsum(new_grp) - 1)
        g_vd, g_vl = vd_s[new_grp], vl_s[new_grp]
        # per node: max count, then smallest label
        o2 = np.lexsort((g_vl, -counts, g_vd))
        gvd2, gvl2 = g_vd[o2], g_vl[o2]
        first = np.empty(len(gvd2), bool)
        first[0] = True
        first[1:] = gvd2[1:] != gvd2[:-1]
        nxt = lbl.copy()
        nxt[gvd2[first]] = gvl2[first]
        lbl = nxt
    return nodes.sparkSession.createDataFrame(
        pd.DataFrame({"id": nid, "community": lbl}),
        "id long, community long",
    )


def sssp_bounded(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
    n_edges: int | None = None,
) -> DataFrame:
    """Bounded Bellman-Ford single/multi-source shortest paths: after
    ``rounds`` relaxation supersteps, (id, dist) holds the exact
    minimum-weight path distance over paths of <= rounds edges — the
    WEIGHTED sibling of bfs_hops (which counts hops). Unreachable-in-k
    nodes are absent, matching the BFS contract.

    Each superstep is the min-plus product of the distance vector with
    the edge matrix: ONE state⨝edges join (shuffle on src) + ONE
    groupBy(id) min with map-side combine — identical cost envelope to
    a PageRank superstep, and the same fixed-round discipline keeps it
    oracle-expressible as unrolled CTEs (integer weights -> exact
    arithmetic, no float drift). State is lazily checkpointed per round
    so round k+1 reads a materialized table. Pass ``n_edges`` (a
    manifest literal) to enable the driver-side small-graph fast path
    (integer weights only — a float weight column falls back)."""
    if _local_eligible(n_edges):
        out = _sssp_local(edges, sources, rounds, src, dst, w)
        if out is not None:
            sssp_bounded.last_local = True
            return out
    sssp_bounded.last_local = False
    dist = (
        sources.select(F.col(sources.columns[0]).alias("id"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    for _ in range(rounds):
        relax = (
            dist.join(edges, dist["id"] == edges[src])
            .select(
                F.col(dst).alias("id"),
                (F.col("dist") + F.col(w)).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relax)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist


def _sssp_local(edges, sources, rounds, src, dst, w):
    """Exact numpy replica of the bounded min-plus supersteps: int64
    distances and weights, min is exact selection — nothing to drift.
    Relaxation round k reads only the round-(k-1) distance vector,
    exactly like the distributed union+min."""
    import numpy as np
    import pandas as pd

    ed = _int_cols(edges, src, dst, w)
    sc = _int_cols(sources, sources.columns[0])
    if ed is None or sc is None:
        return None
    s, d, wt = ed
    seeds = np.unique(sc[0])
    ids = np.unique(np.concatenate([s, d, seeds]))
    spos, sok = _np_lookup(ids, s)
    dpos = np.searchsorted(ids, d)
    INF = np.int64(2**62)
    dist = np.full(len(ids), INF, np.int64)
    dist[np.searchsorted(ids, seeds)] = 0
    for _ in range(rounds):
        m = sok & (dist[spos] < INF)
        if not m.any():
            break
        nxt = dist.copy()
        np.minimum.at(nxt, dpos[m], dist[spos[m]] + wt[m])
        dist = nxt
    reached = dist < INF
    return edges.sparkSession.createDataFrame(
        pd.DataFrame({"id": ids[reached], "dist": dist[reached]}),
        "id long, dist long",
    )


def triangle_stats_local(
    und: DataFrame,
    deg: DataFrame,
    key_mult: int = 2_000_000_000,
) -> DataFrame | None:
    """Driver-side exact (n_triangles, n_wedges, global_clustering)
    for small graphs — the same (degree, id)-oriented wedge-closure
    construction as the distributed query, as integer numpy kernels:
    wedge generation and the closure membership count are exact
    integer work, and the only float op (3.0*t/w) replicates Spark's
    round(double, 6) via the identical shortest-repr HALF_UP chain.
    ``und`` is the u<v undirected edge list (u, v); ``deg`` the full
    (id, d) degree table. Returns None (caller falls back) on
    non-integer ids, ids/degrees that would overflow the packed
    orientation key, or a zero wedge denominator."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    ed = _int_cols(und, und.columns[0], und.columns[1])
    dg = _int_cols(deg.select("id", "d"), "id", "d")
    if ed is None or dg is None:
        return None
    u, v = ed
    ids, dvals = dg
    order = np.argsort(ids)
    ids, dvals = ids[order], dvals[order]
    if len(ids) == 0 or (len(ids) > 1 and (ids[1:] == ids[:-1]).any()):
        return None
    if int(ids.max()) >= key_mult or int(dvals.max()) >= 2**31:
        return None
    # inner joins to the degree table: edges with an unknown endpoint drop
    upos, uok = _np_lookup(ids, u)
    vpos, vok = _np_lookup(ids, v)
    m = uok & vok
    u, v, upos, vpos = u[m], v[m], upos[m], vpos[m]
    ku = dvals[upos] * key_mult + u
    kv = dvals[vpos] * key_mult + v
    take_u = ku < kv
    osrc = np.where(take_u, u, v)
    odst = np.where(take_u, v, u)
    okdst = np.where(take_u, kv, ku)
    t = 0
    if len(osrc):
        # per-source adjacency sorted by (kdst, dst); all in-segment
        # ordered pairs via the repeat/offset construction (no Python
        # loop); closure = membership of the packed pair key in the
        # sorted oriented edge-key array
        six = np.lexsort((odst, okdst, osrc))
        gs, gd = osrc[six], odst[six]
        n_e = len(gs)
        seg_start = np.empty(n_e, bool)
        seg_start[0] = True
        seg_start[1:] = gs[1:] != gs[:-1]
        seg_id = np.cumsum(seg_start) - 1
        seg_end = np.cumsum(np.bincount(seg_id))
        succ = seg_end[seg_id] - 1 - np.arange(n_e)
        total = int(succ.sum())
        if total:
            d1 = np.repeat(gd, succ)
            pair_off = np.cumsum(succ) - succ
            idx2 = np.repeat(np.arange(n_e) + 1 - pair_off, succ) + np.arange(
                total
            )
            d2 = gd[idx2]
            mx = int(max(ids.max(), 0)) + 1
            ekeys = np.sort(osrc * mx + odst)
            wkeys = d1 * mx + d2
            pos = np.searchsorted(ekeys, wkeys)
            ok = pos < len(ekeys)
            pos = np.where(ok, pos, 0)
            t = int((ok & (ekeys[pos] == wkeys)).sum())
    w_total = int(((dvals * (dvals - 1)) // 2).sum())
    if w_total == 0:
        return None
    x = (3.0 * t) / w_total
    gcc = float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )
    return und.sparkSession.createDataFrame(
        pd.DataFrame(
            {
                "n_triangles": [t],
                "n_wedges": [w_total],
                "global_clustering": [gcc],
            }
        ),
        "n_triangles long, n_wedges long, global_clustering double",
    )


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 12,
    src_col: str = "src",
    dst_col: str = "dst",
    n_edges: int | None = None,
) -> DataFrame:
    """Fixed-round k-core peeling: each round drops every vertex whose
    degree in the REMAINING subgraph is below ``k``, then restricts the
    edge set to survivors on both endpoints. After enough rounds the
    result is exactly the k-core (the maximal subgraph with min degree
    >= k); ``rounds`` is fixed rather than run-to-fixpoint so the whole
    peel stays oracle-expressible (the registered query sets rounds
    above the measured convergence point, the same discipline as the
    SSSP/HITS/PageRank fixed-superstep oracles — a production caller
    loops on a survivor-count fixpoint instead, like ``dup_clusters``).

    ``edges`` must be symmetric (both directions present) for an
    undirected graph — degree is then one count per src.

    Scale: each round is one groupBy(src) degree count (map-side
    partial) plus two semi-joins restricting the edge list; the edge
    state is lazily localCheckpoint'd per round (it feeds the next
    round twice: the degree count and the restriction), so round r+1
    never replans rounds 1..r. Nothing ever leaves the executors; the
    edge list only shrinks.

    Returns surviving (id, core_deg) — degree within the peeled core.
    Pass ``n_edges`` (a manifest literal, or any upper bound on the
    edge count) to enable the driver-side small-graph fast path."""
    if _local_eligible(n_edges):
        out = _kcore_local(edges, k, rounds, src_col, dst_col)
        if out is not None:
            kcore_peel.last_local = True
            return out
    kcore_peel.last_local = False
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    for _ in range(rounds):
        keep = (
            e.groupBy("src")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("src")
        )
        e = (
            e.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=False)
        )
    return (
        e.groupBy("src")
        .agg(F.count("*").alias("core_deg"))
        .select(F.col("src").alias("id"), "core_deg")
    )


def _kcore_local(edges, k, rounds, src_col, dst_col):
    """Exact numpy replica of the fixed-round peel: integer degree
    counts and set restrictions — nothing to drift. Each round drops
    src rows whose remaining-subgraph degree is below k, then
    restricts edges to survivors on both endpoints, exactly like the
    distributed groupBy + two semi-joins."""
    import numpy as np
    import pandas as pd

    ed = _int_cols(edges, src_col, dst_col)
    if ed is None:
        return None
    s, d = ed
    ids = np.unique(np.concatenate([s, d])) if len(s) else np.empty(0, np.int64)
    spos = np.searchsorted(ids, s)
    dpos = np.searchsorted(ids, d)
    alive = np.ones(len(s), bool)
    for _ in range(rounds):
        if not alive.any():
            break
        deg = np.bincount(spos[alive], minlength=len(ids))
        keep = deg >= k
        nxt = alive & keep[spos] & keep[dpos]
        if nxt.sum() == alive.sum():
            break  # fixpoint: further rounds are identity
        alive = nxt
    core = np.bincount(spos[alive], minlength=len(ids))
    m = core > 0
    return edges.sparkSession.createDataFrame(
        pd.DataFrame({"id": ids[m], "core_deg": core[m]}),
        "id long, core_deg long",
    )


def kcore_oracle_cte(edges_sql: str, k: int, rounds: int) -> str:
    """Unrolled SQL mirror of ``kcore_peel`` — one (degree-filter,
    edge-restrict) CTE pair per round, exactly the generated-CTE
    pattern of the PageRank/SSSP/beam-search oracles. CTEs are
    MATERIALIZED: each round reads its predecessor twice, and inlining
    would re-expand the chain exponentially."""
    blocks = [f"WITH e0 AS MATERIALIZED ({edges_sql})"]
    prev = "e0"
    for r in range(1, rounds + 1):
        blocks.append(
            f""",
    k{r} AS MATERIALIZED (
      SELECT src AS id FROM (
        SELECT src, count(*) AS deg FROM {prev} GROUP BY src
      ) WHERE deg >= {k}
    ),
    e{r} AS MATERIALIZED (
      SELECT e.src, e.dst FROM {prev} e
      JOIN k{r} a ON e.src = a.id
      JOIN k{r} b ON e.dst = b.id
    )"""
        )
        prev = f"e{r}"
    blocks.append(
        f"""
    SELECT src AS id, count(*) AS core_deg FROM {prev} GROUP BY src"""
    )
    return "".join(blocks)
