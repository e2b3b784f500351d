"""Round-6 operator tests.

First wave: recipe rebalancing, incremental IVF maintenance, semantic
cache, deep HNSW. Second wave: MMR diversification, context budget
packing, PRF expansion, compaction bin-packing, link prediction,
leakage-safe splits, soft sqrt retention, l-diversity, tokenizer
fertility, curriculum phases, code-switch detection."""

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


# ---- round-6 second wave: retrieval/layout/graph/split additions -----


def test_mmr_picks_are_shortlist_consistent(spark, sf_dir):
    """MMR invariants recomputed from first principles: 5 distinct
    picks per query, the step-1 pick IS the relevance argmax, every
    pick comes from the top-12 shortlist, and each step's
    max_sim_selected equals the true max pairwise similarity to the
    earlier picks (recomputed from the raw vectors)."""
    import math

    from commercial_rfp_data_pipeline_spark.registry import all_queries

    out = all_queries()["mmr_diversified_topk"](spark, sf_dir).collect()
    emb = {
        r.vec_id: r.embedding
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    assert len(by_q) == 5
    for q_id, rows in by_q.items():
        rows.sort(key=lambda r: r.step)
        assert [r.step for r in rows] == [1, 2, 3, 4, 5]
        picks = [r.vec_id for r in rows]
        assert len(set(picks)) == 5
        # shortlist membership + relevance argmax for step 1
        qv = [float(x) for x in emb[q_id]]
        sims = sorted(
            (
                (cos([float(x) for x in emb[v]], qv), -v)
                for v in emb
                if v != q_id
            ),
            reverse=True,
        )
        shortlist = {-nv for _, nv in sims[:12]}
        assert set(picks) <= shortlist
        assert rows[0].vec_id == -sims[0][1]
        # max_sim_selected recomputed from raw vectors
        for i, r in enumerate(rows[1:], start=1):
            prev = picks[:i]
            expect = max(
                cos(
                    [float(x) for x in emb[r.vec_id]],
                    [float(x) for x in emb[p]],
                )
                for p in prev
            )
            assert abs(r.max_sim_selected - expect) < 1e-9, (q_id, r.step)


def test_mmr_partial_shortlist_degrades_gracefully(spark, sf_dir, tmp_path):
    """ADVICE r7 (low): a q_id group with fewer than K candidates used
    to unpack `best = None` and fail the whole Arrow stage. With only
    4 embeddings (1 query-eligible group of 3 candidates each), the
    greedy must emit the partial pick sequence — min(K, shortlist)
    steps per query — exactly like the pre-fusion DataFrame form."""
    from commercial_rfp_data_pipeline_spark.io import load_table
    from commercial_rfp_data_pipeline_spark.registry import all_queries

    tiny = str(tmp_path / "tiny_sf")
    load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 4
    ).write.parquet(tiny + "/embeddings.parquet")

    out = all_queries()["mmr_diversified_topk"](spark, tiny).collect()
    assert out, "partial shortlist produced no rows"
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    # 4 vectors, all query-eligible (vec_id < 5): each query has 3
    # candidates < K=5 picks -> exactly 3 steps, all distinct
    assert set(by_q) == {0, 1, 2, 3}
    for q_id, rows in by_q.items():
        steps = sorted(r.step for r in rows)
        assert steps == [1, 2, 3], (q_id, steps)
        assert len({r.vec_id for r in rows}) == 3


def test_compaction_bins_bounded_and_contiguous(spark, sf_dir):
    """Every output bin stays below target + max_file_bytes (the
    cumsum-assignment bound), bins cover all files exactly once, and
    day ranges are non-overlapping in bin order — the property that
    keeps date pruning effective after the rewrite."""
    from commercial_rfp_data_pipeline_spark.queries.layout_q import (
        _COMPACT_TARGET,
    )
    from commercial_rfp_data_pipeline_spark.registry import all_queries

    orders = load_table(spark, sf_dir, "orders")
    files = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg((F.sum(F.length("o_orderpriority") + F.lit(96))).alias("b"))
        .agg(
            F.count("*").alias("n"),
            F.max("b").alias("mx"),
            F.sum("b").alias("tot"),
        )
        .collect()[0]
    )
    bins = all_queries()["compaction_bin_packing"](spark, sf_dir).collect()
    assert sum(r.n_files for r in bins) == files.n
    assert sum(r.bin_bytes for r in bins) == files.tot
    for r in bins:
        assert r.bin_bytes < _COMPACT_TARGET + files.mx, r
    bins.sort(key=lambda r: r.bin)
    for a, b in zip(bins, bins[1:]):
        assert a.last_day < b.first_day


def test_link_prediction_predicts_only_new_edges(spark, sf_dir):
    """Every predicted pair is genuinely non-adjacent (recomputed from
    the edge set), anchored at a seed, and carries a positive
    exact-decimal RA score consistent with its common-neighbor count
    (score <= n_common since every 1/deg <= 1, deg >= 1)."""
    from commercial_rfp_data_pipeline_spark.queries.graph_q import _LP_SEEDS
    from commercial_rfp_data_pipeline_spark.registry import all_queries

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = {
        (r.u, r.v)
        for r in a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
        .collect()
    }
    out = all_queries()["link_prediction_resource_alloc"](
        spark, sf_dir
    ).collect()
    assert out
    for r in out:
        assert r.u in _LP_SEEDS
        assert (min(r.u, r.v), max(r.u, r.v)) not in edges, r
        assert 0 < r.ra_score <= r.n_common + 1e-9
        assert 1 <= r.rnk <= 5


def test_group_aware_split_blocks_leakage(spark, sf_dir):
    """The group-aware split never straddles a duplicate group (the
    audit column, recomputed here too), covers every doc exactly once,
    and — the reason it exists — the doc-ID split DOES straddle
    duplicate groups on the same corpus whenever multi-doc groups
    exist."""
    from commercial_rfp_data_pipeline_spark.operators.textops import (
        dataset_split,
        norm_text,
    )
    from commercial_rfp_data_pipeline_spark.registry import all_queries

    rows = all_queries()["group_aware_split_audit"](spark, sf_dir).collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert all(r.straddling_groups == 0 for r in rows)
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert abs(sum(r.doc_share for r in rows) - 1.0) < 1e-5

    # contrast: the id-keyed split leaks when multi-doc groups exist
    fp = F.md5(F.substring(norm_text("text"), 1, 40)).alias("fp")
    id_split = dataset_split(docs.select("doc_id", fp))
    straddle = (
        id_split.groupBy("fp")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    multi = (
        docs.select(fp).groupBy("fp").count().filter(F.col("count") > 4)
    ).count()
    if multi > 0:
        assert straddle > 0, "expected the naive split to leak"


def test_context_packing_prefix_and_budget(spark, sf_dir):
    """Packed context per query is a rank PREFIX (never skips a
    better-ranked doc), stays within the token budget, and cum_tokens
    is the exact running sum of per-doc token counts."""
    from commercial_rfp_data_pipeline_spark.queries.vector_q import (
        _CTX_BUDGET,
    )
    from commercial_rfp_data_pipeline_spark.registry import all_queries

    out = all_queries()["context_budget_packing"](spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    assert by_q
    for q_id, rows in by_q.items():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == list(range(1, len(rows) + 1)), q_id
        run = 0
        for r in rows:
            run += r.n_tokens
            assert r.cum_tokens == run
        assert run <= _CTX_BUDGET


def test_prf_expansion_widens_the_match_set(spark, sf_dir):
    """PRF sanity: all three query docs produce results, hits never
    include the query doc itself, the per-hit matched-term counts stay
    within the configured budgets, and at least one top hit matched an
    EXPANSION term (the feedback loop did something)."""
    from commercial_rfp_data_pipeline_spark.queries.text_q import (
        _PRF_EXP_K,
        _PRF_ORIG_K,
        _PRF_QIDS,
    )
    from commercial_rfp_data_pipeline_spark.registry import all_queries

    out = all_queries()["prf_query_expansion_topk"](spark, sf_dir).collect()
    assert {r.q_id for r in out} == set(_PRF_QIDS)
    for r in out:
        assert r.doc_id != r.q_id
        assert 0 <= r.n_orig_matched <= _PRF_ORIG_K
        assert 0 <= r.n_exp_matched <= _PRF_EXP_K
        assert r.n_orig_matched + r.n_exp_matched >= 1
        assert r.score > 0
    assert any(r.n_exp_matched > 0 for r in out)


def test_round6b_queries_plan_shapes(spark, sf_dir):
    """Plan discipline for the second-wave round-6 queries: no
    row-at-a-time Python UDFs, and the bounded sides the docstrings
    promise to broadcast are actually broadcast."""
    from commercial_rfp_data_pipeline_spark.io import release_pinned
    from commercial_rfp_data_pipeline_spark.registry import all_queries

    def plan(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "extended"
        )

    q = all_queries()
    names = [
        "mmr_diversified_topk",
        "compaction_bin_packing",
        "link_prediction_resource_alloc",
        "group_aware_split_audit",
        "context_budget_packing",
        "prf_query_expansion_topk",
    ]
    broadcast_expected = {
        "mmr_diversified_topk",  # query vectors + tiny greedy frames
        "context_budget_packing",  # query vectors
        "group_aware_split_audit",  # leaked/total singletons
    }
    for name in names:
        p = plan(q[name](spark, sf_dir))
        release_pinned()
        assert "BatchEvalPython" not in p and "pythonUDF" not in p, name
        if name in broadcast_expected:
            assert "Broadcast" in p, f"{name} lost its broadcast"


def test_soft_retention_quota_and_determinism(spark, sf_dir):
    """sqrt soft retention: per-cluster kept count equals
    ceil(sqrt(n)), singletons always survive, kept docs are a strict
    superset of one-survivor dedup in count, and the output is
    repartition-invariant (md5 lottery, no partition state)."""
    import math

    from commercial_rfp_data_pipeline_spark.registry import all_queries

    q = all_queries()["dedup_soft_retention_sqrt"]
    rows = q(spark, sf_dir).collect()
    by_fp: dict[str, list] = {}
    for r in rows:
        by_fp.setdefault(r.fp, []).append(r)
    for fp, members in by_fp.items():
        n = len(members)
        assert all(r.n_members == n for r in members)
        kept = [r for r in members if r.kept]
        assert len(kept) == math.ceil(math.sqrt(n)), fp
        assert {r.rank_in_cluster for r in members} == set(range(1, n + 1))
        if n == 1:
            assert members[0].kept
    # repartition invariance: the md5 lottery is a pure row function
    again = {
        (r.doc_id, r.kept, r.rank_in_cluster) for r in q(spark, sf_dir).collect()
    }
    assert again == {(r.doc_id, r.kept, r.rank_in_cluster) for r in rows}


def test_l_diversity_stricter_than_k(spark, sf_dir):
    """l-diversity recomputed: distinct_sensitive is the true distinct
    segment count per (nation, band) class, never exceeds group_size,
    and the violates flag matches l=3."""
    from commercial_rfp_data_pipeline_spark.registry import all_queries

    rows = all_queries()["l_diversity_audit"](spark, sf_dir).collect()
    assert rows
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal").cast("decimal(12,2)") / 1000)
        .cast("int")
        .alias("band"),
        "c_mktsegment",
    ).collect()
    truth: dict[tuple, set] = {}
    for r in c:
        truth.setdefault((r.c_nationkey, r.band), set()).add(r.c_mktsegment)
    for r in rows:
        t = truth[(r.c_nationkey, r.balance_band)]
        assert r.distinct_sensitive == len(t)
        assert r.distinct_sensitive <= r.group_size
        assert r.violates_l3 == (len(t) < 3)


def test_tokenizer_fertility_ratios_consistent(spark, sf_dir):
    """Fertility rows recomputed from per-doc counts: ratios equal the
    corpus-level integer-sum division, fertility >= 1 (BPE never emits
    fewer tokens than words on normalized text), every lang covered."""
    from commercial_rfp_data_pipeline_spark.operators.textops import (
        bpe_token_count,
        token_count,
    )
    from commercial_rfp_data_pipeline_spark.registry import all_queries

    rows = all_queries()["tokenizer_fertility_by_lang"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        r.lang: (r.w, r.b)
        for r in docs.select(
            "lang",
            token_count("text").alias("nw"),
            bpe_token_count("text").alias("nb"),
        )
        .groupBy("lang")
        .agg(F.sum("nw").alias("w"), F.sum("nb").alias("b"))
        .collect()
    }
    assert {r.lang for r in rows} == set(truth)
    for r in rows:
        w, b = truth[r.lang]
        assert (r.total_words, r.total_bpe_tokens) == (w, b)
        assert abs(r.fertility - round(b / w, 6)) < 1e-9
        assert r.fertility >= 1.0


def test_curriculum_phases_are_equal_mass_and_ordered(spark, sf_dir):
    """Curriculum schedule: ordinals are a permutation of 0..n-1 in
    (difficulty, doc_id) order, phases are the 3 integer-arithmetic
    buckets (sizes differ by <= 1), and difficulty never decreases
    across phase boundaries."""
    from commercial_rfp_data_pipeline_spark.registry import all_queries

    rows = all_queries()["curriculum_schedule_phases"](spark, sf_dir).collect()
    n = len(rows)
    rows.sort(key=lambda r: r.ordinal)
    assert [r.ordinal for r in rows] == list(range(n))
    assert rows == sorted(rows, key=lambda r: (r.difficulty, r.doc_id))
    sizes = {}
    for r in rows:
        assert r.phase == (r.ordinal * 3) // n
        sizes[r.phase] = sizes.get(r.phase, 0) + 1
    assert set(sizes) == {0, 1, 2}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert max(r.difficulty for r in rows if r.phase == 0) <= min(
        r.difficulty for r in rows if r.phase == 2
    )


def test_code_switch_flags_match_recomputation(spark, sf_dir):
    """Code-switch audit recomputed: n_chunks matches the 120/30
    chunker's count formula, disagree_frac = n_disagree/n_chunks, the
    flag is exactly the 0.3 threshold, and every document appears
    exactly once."""
    from commercial_rfp_data_pipeline_spark.registry import all_queries

    rows = all_queries()["code_switch_detection"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert len(rows) == n_docs
    lens = {r.doc_id: r.n for r in docs.select("doc_id", F.length("text").alias("n")).collect()}
    for r in rows:
        expect_chunks = 1 + (max(lens[r.doc_id] - 120, 0) + 89) // 90
        assert r.n_chunks == expect_chunks, r.doc_id
        assert 0 <= r.n_disagree <= r.n_chunks
        frac = round(r.n_disagree / r.n_chunks, 6)
        assert abs(r.disagree_frac - frac) < 1e-9
        assert r.is_code_switched == (r.n_disagree / r.n_chunks >= 0.3)
