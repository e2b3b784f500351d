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


def test_semantic_cache_durable_replay_hit_rate(spark, sf_dir, tmp_path):
    """The durable semantic cache on a replayed query log: pass 1 over
    an empty cache misses everything; after putting the (query, result)
    pairs, the replay hits every exact query at sim 1.0, deterministic
    paraphrases hit above the 0.98 threshold, and novel queries still
    miss (hit rate 8/12 exactly on this log). Re-putting the same batch
    is a committed-state no-op (content-keyed manifest, as BM25)."""
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
        semantic_cache_entries,
        semantic_cache_lookup,
        semantic_cache_put,
    )
    from commercial_rfp_data_pipeline_spark.queries.pipeline_q import (
        q_semantic_cache_hit_audit,
    )

    wh = str(tmp_path / "wh")
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # the audit query's stateless restatement is the ground truth for
    # what the durable path must reproduce
    audit = {r.q_id: r for r in q_semantic_cache_hit_audit(spark, sf_dir).collect()}

    perturb = F.transform(
        "v", lambda x, i: x * F.when(i % 2 == 0, F.lit(1.08)).otherwise(F.lit(0.92))
    )
    incoming = (
        e.filter(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec"))
        .unionByName(
            e.filter((F.col("vec_id") >= 4) & (F.col("vec_id") < 8)).select(
                (F.col("vec_id") + 1000).alias("q_id"), perturb.alias("q_vec")
            )
        )
        .unionByName(
            e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 12)).select(
                F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
            )
        )
    )

    # pass 1: empty cache — every query misses but still gets a row
    miss = semantic_cache_lookup(spark, wh, incoming).collect()
    assert len(miss) == 12 and not any(r.hit for r in miss)

    # warm the cache with queries 0..7 and their audit-derived results
    cached_results = {
        r.cache_id: r.served_id for r in audit.values() if r.kind == "replay"
    }
    # replay rows cover cache ids 0..3; take 4..7's stored results from
    # the paraphrase rows (their cache_id is the underlying query)
    for r in audit.values():
        if r.kind == "paraphrase":
            cached_results[r.cache_id] = r.served_id
    entries = (
        e.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("cache_id"), F.col("v").alias("q_vec"))
        .join(
            spark.createDataFrame(
                [(int(k), int(v)) for k, v in cached_results.items()],
                "cache_id long, result_id long",
            ),
            "cache_id",
        )
        .withColumn("result_sim", F.lit(1.0))
    )
    semantic_cache_put(spark, wh, entries)
    got = {r.q_id: r for r in semantic_cache_lookup(spark, wh, incoming).collect()}
    assert len(got) == 12
    hits = {q for q, r in got.items() if r.hit}
    assert hits == {0, 1, 2, 3, 1004, 1005, 1006, 1007}, hits  # 8/12
    for q in (0, 1, 2, 3):
        assert got[q].cache_sim == 1.0 and got[q].cache_id == q
    # served results agree with the stateless audit query's decision
    for q, r in got.items():
        assert bool(r.hit) == bool(audit[q].hit), q
        if r.hit:
            assert r.served_id == audit[q].served_id, q

    # replayed put: committed state unchanged
    n_before = semantic_cache_entries(spark, wh).count()
    semantic_cache_put(spark, wh, entries)
    assert semantic_cache_entries(spark, wh).count() == n_before == 8


def test_ivf_maintain_drift_bounded_recluster(spark, sf_dir, tmp_path):
    """Append-heavy IVF fixture: build on half the corpus, append the
    other half REVERSED (a new density the frozen centroids never saw),
    and check the bounded maintenance path: (a) the drift report flags
    cells; (b) ivf_maintain re-Lloyds only the drifted family and
    rewrites only those partitions — healthy cells' files and rows are
    byte-identical, no member lost or duplicated; (c) recall@5 for
    queries in the appended mass is >= the pre-maintenance index AND
    >= a from-scratch retrain over the union (the bounded fix is at
    least as good as the expensive one on this fixture)."""
    import os

    from commercial_rfp_data_pipeline_spark.operators.vector import (
        ivf_assign,
        ivf_centroids,
        ivf_search,
        knn_exact,
    )
    from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
        ivf_cell_drift,
        ivf_maintain,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("chunk_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    a = e.filter(F.col("chunk_id") < 300)
    b = e.filter(F.col("chunk_id") >= 300).select(
        (F.col("chunk_id") + 10000).alias("chunk_id"),
        F.reverse("embedding").alias("embedding"),
    )
    full = a.unionByName(b).localCheckpoint()

    wh = str(tmp_path / "wh")
    cents = ivf_centroids(a, 16, id_col="chunk_id", vec_col="embedding")
    cents.write.mode("overwrite").parquet(os.path.join(wh, "ivf_centroids"))
    cr = spark.read.parquet(os.path.join(wh, "ivf_centroids"))
    cells_path = os.path.join(wh, "ivf_cells")
    ivf_assign(a, id_col="chunk_id", vec_col="embedding", cents=cr).select(
        "chunk_id", "embedding", "cent_id", "_n"
    ).write.mode("overwrite").partitionBy("cent_id").parquet(cells_path)
    ivf_assign(b, id_col="chunk_id", vec_col="embedding", cents=cr).select(
        "chunk_id", "embedding", "cent_id", "_n"
    ).write.mode("append").partitionBy("cent_id").parquet(cells_path)

    q = b.filter(F.col("chunk_id") < 10305).select(
        F.col("chunk_id").alias("q_id"),
        F.transform(
            "embedding",
            lambda x, i: x * F.when(i % 2 == 0, F.lit(1.02)).otherwise(F.lit(0.98)),
        ).alias("q_vec"),
    )
    exact = {
        (r.q_id, r.chunk_id)
        for r in knn_exact(
            full, q, k=5, id_col="chunk_id", vec_col="embedding"
        ).collect()
    }

    def recall():
        c = spark.read.parquet(os.path.join(wh, "ivf_centroids"))
        cells = spark.read.parquet(cells_path).select(
            "chunk_id", "embedding", "cent_id", "_n"
        )
        got = {
            (r.q_id, r.chunk_id)
            for r in ivf_search(
                None, q, nprobe=2, k=5, id_col="chunk_id",
                vec_col="embedding", cents=c, assigned=cells,
            ).collect()
        }
        return len(exact & got) / len(exact)

    drift = {r.cent_id: r.drift for r in ivf_cell_drift(spark, wh).collect()}
    before_members = {
        (r.chunk_id, r.cent_id)
        for r in spark.read.parquet(cells_path)
        .select("chunk_id", "cent_id")
        .collect()
    }
    r_before = recall()
    rep = ivf_maintain(spark, wh, drift_threshold=0.05)
    assert rep["n_drifted"] > 0
    assert set(rep["drifted_ids"]) == {
        c for c, d in drift.items() if d > 0.05
    }

    after_members = {
        (r.chunk_id, r.cent_id)
        for r in spark.read.parquet(cells_path)
        .select("chunk_id", "cent_id")
        .collect()
    }
    # no member lost or duplicated; healthy cells byte-stable
    assert {c for c, _ in before_members} == {c for c, _ in after_members} or \
        {m for m, _ in before_members} == {m for m, _ in after_members}
    healthy = {
        (m, c) for m, c in before_members if c not in set(rep["drifted_ids"])
    }
    assert healthy <= after_members
    # reassigned members stay within the drifted family
    moved = after_members - before_members
    assert all(c in set(rep["drifted_ids"]) for _, c in moved)

    r_after = recall()
    # full-retrain control over the union
    c2 = ivf_centroids(full, 16, id_col="chunk_id", vec_col="embedding")
    a2 = ivf_assign(
        full, id_col="chunk_id", vec_col="embedding", cents=c2
    ).select("chunk_id", "embedding", "cent_id", "_n")
    got = {
        (r.q_id, r.chunk_id)
        for r in ivf_search(
            None, q, nprobe=2, k=5, id_col="chunk_id",
            vec_col="embedding", cents=c2, assigned=a2,
        ).collect()
    }
    r_rebuild = len(exact & got) / len(exact)
    assert r_after >= r_before, (r_after, r_before)
    assert r_after >= r_rebuild, (r_after, r_rebuild)


def test_consistent_hash_minimal_movement(spark, sf_dir):
    """The consistent-hashing contract on the rebalance audit: no
    surviving shard gains a single key (movement is exclusively toward
    the added shard), total occupancy is conserved, and the new shard
    captures a plausibly fair slice (between a third and three times
    the fair 1/9 share with 16 vnodes)."""
    from commercial_rfp_data_pipeline_spark.queries.layout_q import (
        q_consistent_hash_rebalance,
    )

    rows = {r.shard: r for r in q_consistent_hash_rebalance(spark, sf_dir).collect()}
    n = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_before for r in rows.values()) == n
    assert sum(r.n_after for r in rows.values()) == n
    for s, r in rows.items():
        if s < 8:
            assert r.gained == 0, (s, r)
        else:
            assert r.n_before == 0 and r.gained == r.n_after > 0
    moved = rows[8].n_after
    assert n / 27 <= moved <= n / 3, moved


def test_round6_queries_plan_shapes(spark, sf_dir):
    """Plan discipline for the round-6 queries in one sweep: no
    row-at-a-time Python UDF anywhere, broadcasts where the docstrings
    claim them (query/cache/anchor/ring/tier sides), and the global
    top-k in small_to_big is TakeOrdered, not a single-task window."""
    from commercial_rfp_data_pipeline_spark.io import release_pinned
    from commercial_rfp_data_pipeline_spark.registry import all_queries

    def plan(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "extended"
        )

    q = all_queries()
    names = [
        "data_recipe_rebalance",
        "data_recipe_share_audit",
        "semantic_cache_hit_audit",
        "matryoshka_tier_retrieval_eval",
        "two_stage_rerank_topk",
        "lsh_banding_parameter_sweep",
        "consistent_hash_rebalance_audit",
        "small_to_big_window_retrieval",
        "crossmodal_hard_negatives",
    ]
    broadcast_expected = {
        "semantic_cache_hit_audit",
        "matryoshka_tier_retrieval_eval",
        "two_stage_rerank_topk",
        "consistent_hash_rebalance_audit",
        "crossmodal_hard_negatives",
    }
    for name in names:
        p = plan(q[name](spark, sf_dir))
        release_pinned()
        assert "BatchEvalPython" not in p and "pythonUDF" not in p, name
        if name in broadcast_expected:
            assert "Broadcast" in p, f"{name} lost its broadcast"
    p = plan(q["small_to_big_window_retrieval"](spark, sf_dir))
    release_pinned()
    assert "TakeOrdered" in p, "global top-k regressed to a window"
