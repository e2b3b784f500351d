"""Round-6 operator tests: recipe rebalancing, incremental IVF
maintenance, semantic cache, deep HNSW."""

from __future__ import annotations

from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table


def test_recipe_rebalance_partition_invariant_and_exact(spark, sf_dir):
    """The rebalanced mix is a pure function of the data: identical
    under 1 vs 16 partitions (md5 ranks + distributed prefix sums, no
    rand/partition-ids in the semantics), and the integer allocation
    invariants hold — n_copies is epochs or epochs+1, per-source
    realized tokens land within one doc of the target, and the total
    realized volume tracks the (6/5 * total) budget."""
    from commercial_rfp_data_pipeline_spark.operators.sampling import (
        recipe_rebalance,
    )
    from commercial_rfp_data_pipeline_spark.operators.textops import token_count

    docs = load_table(spark, sf_dir, "documents")
    w = 1 + (F.substring("source", 4, 8).cast("long") % 4)

    outs = []
    for df in (docs.repartition(1), docs.repartition(16, "doc_id")):
        outs.append(
            {
                (r.doc_id, r.source, r.n_tok, r.n_copies, r.target_tokens)
                for r in recipe_rebalance(df, weight_raw=w).collect()
            }
        )
    assert outs[0] == outs[1] and outs[0]

    rows = outs[0]
    avail = {
        r.source: (r.t, r.mx)
        for r in docs.select("source", token_count("text").alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("t"), F.max("n").alias("mx"))
        .collect()
    }
    per_src: dict[str, list] = {}
    for doc_id, src, n_tok, n_copies, target in rows:
        per_src.setdefault(src, []).append((n_tok, n_copies, target))
    for src, docs_s in per_src.items():  # noqa: B007 (src used in asserts)
        t_avail, max_tok = avail[src]
        target = docs_s[0][2]
        epochs = target // t_avail
        assert all(c in (epochs, epochs + 1) for _, c, _ in docs_s), src
        realized = sum(n * c for n, c, _ in docs_s)
        # partial prefix stops at the first doc crossing the remainder:
        # overshoot < one doc's tokens; undershoot impossible
        assert target <= realized < target + max_tok, (
            src,
            target,
            realized,
            max_tok,
        )


def test_hnsw_deep_levels_nest_and_recall_dominates(spark, sf_dir):
    """The geometric level draw nests (layer 2 ⊂ layer 1) with a
    plausibly geometric size decay, and the 3-layer descent's recall@5
    vs exact is >= the registered 2-layer query's on the same data at
    equal ef and equal total expansion rounds — the property that makes
    the extra level worth its build."""
    from commercial_rfp_data_pipeline_spark.operators.vector import (
        hnsw_level_pred,
        knn_exact,
    )
    from commercial_rfp_data_pipeline_spark.queries.vector_q import (
        q_graph_ann_hnsw,
        q_graph_ann_hnsw_deep,
        _vectors,
        _queries_df,
    )

    v = _vectors(spark, sf_dir).select("vec_id", "embedding")
    l1 = {r.vec_id for r in v.filter(hnsw_level_pred(1, upper_mod=8)).collect()}
    l2 = {r.vec_id for r in v.filter(hnsw_level_pred(2, upper_mod=8)).collect()}
    n = v.count()
    assert l2 < l1  # strict nesting
    assert 0 < len(l2) < len(l1) < n
    # coin with p=1/8: expect ~n/8 and ~n/64; allow generous slack
    assert n / 16 <= len(l1) <= n / 4, len(l1)

    exact = {
        (r.q_id, r.vec_id)
        for r in knn_exact(v, _queries_df(spark, sf_dir), k=5).collect()
    }
    deep = {
        (r.q_id, r.vec_id) for r in q_graph_ann_hnsw_deep(spark, sf_dir).collect()
    }
    two = {(r.q_id, r.vec_id) for r in q_graph_ann_hnsw(spark, sf_dir).collect()}
    r_deep = len(exact & deep) / len(exact)
    r_two = len(exact & two) / len(exact)
    assert r_deep >= r_two, (r_deep, r_two)
    assert r_deep >= 0.9  # measured 1.00 at sf0.001/sf0.01
