"""Graph-analytics queries: fixed-iteration PageRank over a
co-purchase graph (parts linked when they appear in the same order).

The same operator composes with the text near-dup surface — e.g.
``pagerank(docs, simhash_pairs(...))`` ranks documents by centrality in
the duplicate graph before survivor selection — but the co-purchase
graph keeps the oracle self-contained and exercises dangling vertices
(parts never ordered) for real.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.operators.graph import (
    pagerank,
    pagerank_oracle_cte,
    ppr_oracle_cte,
)
from commercial_rfp_data_pipeline_spark.registry import query

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

    Scale: edge generation is a self-join on l_orderkey whose fanout is
    bounded by items-per-order squared (TPC-H ≤ 7 lines/order — a
    constant), then ONE shuffle on src with the pair-distinct collapsed
    to a local aggregate on top of it; each PageRank
    superstep is one state⨝edges shuffle on src plus one groupBy(dst)
    with map-side partial sums; dangling mass rides a broadcast one-row
    aggregate, never a driver collect. State is per-round
    localCheckpoint'd so superstep k+1 doesn't recompute 1..k."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
    )
    nodes = load_table(spark, sf_dir, "part").select("p_partkey")
    # dedup_edges=True: the distinct runs inside pagerank AFTER its
    # repartition(src), collapsing to a local aggregate (one edge shuffle
    # total instead of two — measured ~20% off the edge build at sf0.1)
    pr = pagerank(nodes, edges, id_col="p_partkey", dedup_edges=True)
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
    path is uniform-only)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
    )
    nodes = load_table(spark, sf_dir, "part").select("p_partkey").withColumn(
        "tp",
        F.when(
            F.col("p_partkey").isin(*_PPR_SEEDS), F.lit(1.0 / len(_PPR_SEEDS))
        ).otherwise(F.lit(0.0)),
    )
    pr = pagerank(
        nodes,
        edges,
        id_col="p_partkey",
        symmetric=False,
        dedup_edges=True,
        teleport_col="tp",
    )
    return pr.select(
        "p_partkey",
        "outdeg",
        F.round("rank", 9).alias("rank"),
        F.round("rank_rel", 6).alias("rank_rel"),
    )
