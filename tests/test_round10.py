"""Round-10 additions: the durable fuzzy-linkage pair artifact
(VERDICT r9 next-round #3) — artifact == inline, reuse, invalidation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table


def test_cc_local_fast_path_equals_distributed(spark, monkeypatch):
    """Round 10: dup_clusters takes a driver-side union-find fast path
    when the verified edge set is under SPARK_GRAFT_CC_LOCAL_EDGES —
    both paths must produce identical (id, cluster_id) labels (label =
    component min) on chains, triangles, random graphs, empty edge
    sets, and string ids."""
    import random

    from commercial_rfp_data_pipeline_spark.operators.dedup import (
        dup_clusters,
    )

    random.seed(7)
    nodes = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    edges = (
        [(i, i + 1) for i in range(0, 50)]
        + [(60, 61), (61, 62), (62, 60)]
        + [
            (random.randint(70, 199), random.randint(70, 199))
            for _ in range(100)
        ]
    )
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "doc_a long, doc_b long"
    )
    monkeypatch.setenv("SPARK_GRAFT_CC_LOCAL_EDGES", "100000")
    fast = {(r.doc_id, r.cluster_id) for r in dup_clusters(nodes, pairs).collect()}
    assert dup_clusters.last_rounds == 0  # fast path taken
    monkeypatch.setenv("SPARK_GRAFT_CC_LOCAL_EDGES", "0")
    slow = {(r.doc_id, r.cluster_id) for r in dup_clusters(nodes, pairs).collect()}
    assert dup_clusters.last_rounds > 0  # distributed path taken
    assert fast == slow

    monkeypatch.setenv("SPARK_GRAFT_CC_LOCAL_EDGES", "100000")
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    out = {(r.doc_id, r.cluster_id) for r in dup_clusters(nodes, empty).collect()}
    assert out == {(i, i) for i in range(200)}

    snodes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "doc_id string")
    spairs = spark.createDataFrame([("b", "c"), ("c", "d")], "doc_a string, doc_b string")
    sout = {(r.doc_id, r.cluster_id) for r in dup_clusters(snodes, spairs).collect()}
    assert sout == {("a", "a"), ("b", "b"), ("c", "b"), ("d", "b")}


def test_protoshim_wire_format_hand_checked():
    """The vendored mini-protobuf runtime (vendor/protoshim) must be
    WIRE-EXACT: the JVM state server parses these bytes with the real
    protobuf runtime. Golden bytes below are hand-derived from the
    public encoding spec (tag = field<<3|wire, varints LEB128,
    length-delimited strings/bytes/messages)."""
    from commercial_rfp_data_pipeline_spark.streaming.protoshim_install import (
        ensure_protobuf,
    )

    ensure_protobuf()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    # nested oneof chain: StateRequest.statefulProcessorCall(2) ->
    # StatefulProcessorCall.setHandleState(1) -> SetHandleState.state(1)=CREATED(1)
    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    assert m.SerializeToString() == bytes.fromhex("12040a020801")

    # attribute-chain write marks ancestors present (client pattern:
    # state_call_command.ttl.durationMs = ...)
    scc = sm.StateCallCommand()
    scc.stateName = "s1"
    scc.schema = "sch"
    scc.ttl.durationMs = 1000
    assert scc.SerializeToString() == bytes.fromhex(
        "0a0273311203736368220308e807"
    )

    # reading an unset sub-message must NOT mark it present
    scc2 = sm.StateCallCommand(stateName="x")
    _ = scc2.ttl
    assert scc2.SerializeToString() == bytes.fromhex("0a0178")

    # round-trip: negative int32, bool, repeated message, proto3
    # optional bytes explicitly set to the default value
    src = sm.StateResponseWithMapIterator(
        statusCode=-3,
        errorMessage="e",
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(src.SerializeToString())
    assert back.statusCode == -3 and back.requireNextFetch is True
    assert [(p.key, p.value) for p in back.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]
    ti = sm.TimerInfo(key=b"", timestampMs=5)
    t2 = sm.TimerInfo()
    # unknown trailing field (number 15, varint) must be skipped
    t2.ParseFromString(ti.SerializeToString() + bytes.fromhex("7805"))
    assert t2.HasField("key") and t2.key == b"" and t2.timestampMs == 5


def test_fuzzy_pairs_artifact_matches_inline(
    spark, sf_dir, tmp_path, monkeypatch
):
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "art"))
    from commercial_rfp_data_pipeline_spark.operators.linkage import (
        fuzzy_pairs,
    )
    from commercial_rfp_data_pipeline_spark.plans import artifacts as A

    served = A.ensure_fuzzy_customer_pairs(spark, sf_dir)
    inline = fuzzy_pairs(
        load_table(spark, sf_dir, "customer"),
        id_col="c_custkey",
        name_col="c_name",
        block_cols=["c_nationkey"],
    )
    key = lambda df: {
        (r.id_a, r.id_b, r.name_a, r.name_b, r.dist) for r in df.collect()
    }
    assert key(served) == key(inline)


def test_entity_cluster_artifact_matches_inline(
    spark, sf_dir, tmp_path, monkeypatch
):
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "art"))
    from commercial_rfp_data_pipeline_spark.operators.dedup import (
        dup_clusters,
    )
    from commercial_rfp_data_pipeline_spark.plans import artifacts as A

    served = A.ensure_customer_entity_clusters(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    inline = dup_clusters(
        c,
        A.ensure_fuzzy_customer_pairs(spark, sf_dir),
        id_col="c_custkey",
        a_col="id_a",
        b_col="id_b",
    )
    key = lambda df: {(r.c_custkey, r.cluster_id) for r in df.collect()}
    assert key(served) == key(inline)


def test_fuzzy_pairs_artifact_reuse_and_invalidation(
    spark, sf_dir, tmp_path, monkeypatch
):
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "art"))
    from commercial_rfp_data_pipeline_spark.plans import artifacts as A

    A.ensure_fuzzy_customer_pairs(spark, sf_dir)
    root = os.path.join(
        str(tmp_path / "art"),
        f"linkage-{A.customer_linkage_key(spark, sf_dir)}",
    )
    mpath = os.path.join(root, "MANIFEST.json")
    mt0 = os.path.getmtime(mpath)
    A.ensure_fuzzy_customer_pairs(spark, sf_dir)
    assert os.path.getmtime(mpath) == mt0  # served, not rebuilt

    # a NAME-ONLY customer change re-keys: stale pairs unreachable
    alt = str(tmp_path / "altsf_cust")
    os.makedirs(alt)
    c = load_table(spark, sf_dir, "customer")
    c.withColumn("c_name", F.concat(F.col("c_name"), F.lit("x"))).write.parquet(
        os.path.join(alt, "customer.parquet")
    )
    assert A.customer_linkage_key(spark, alt) != A.customer_linkage_key(
        spark, sf_dir
    )


def test_image_phash_artifact_matches_inline(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Round 10: the image perceptual chain serves from the durable
    corpus-keyed artifact (pairs + clusters) — artifact == the inline
    derivation, and a second ensure() serves without rebuilding."""
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "art"))
    from commercial_rfp_data_pipeline_spark.operators.dedup import (
        dup_clusters,
    )
    from commercial_rfp_data_pipeline_spark.operators.multimodal import (
        AHASH_HAM_T,
        attach_binary,
        perceptual_ahash,
        perceptual_dhash,
        phash_agreement_pairs,
    )
    from commercial_rfp_data_pipeline_spark.plans import artifacts as A

    ah_s, dh_s, pairs_s, clusters_s = A.ensure_image_phash(spark, sf_dir)

    docs = load_table(spark, sf_dir, "documents")
    b = attach_binary(docs)
    ah_i = perceptual_ahash(b).localCheckpoint()
    dh_i = perceptual_dhash(b).localCheckpoint()
    pairs_i = phash_agreement_pairs(ah_i, dh_i, max_hamming=AHASH_HAM_T)

    pkey = lambda df: {
        (r.doc_a, r.doc_b, r.ham_ahash, r.ham_dhash) for r in df.collect()
    }
    assert pkey(pairs_s) == pkey(pairs_i)

    clusters_i = dup_clusters(
        docs.select("doc_id"),
        pairs_i.filter(F.col("ham_ahash") <= AHASH_HAM_T),
    )
    ckey = lambda df: {(r.doc_id, r.cluster_id) for r in df.collect()}
    assert ckey(clusters_s) == ckey(clusters_i)

    # hash tables round-trip bits/bands through parquet losslessly
    hkey = lambda df, hx: {
        (r.doc_id, r[hx], tuple(r.bits), tuple(r.bands))
        for r in df.collect()
    }
    assert hkey(ah_s, "ahash") == hkey(ah_i, "ahash")
    assert hkey(dh_s, "dhash") == hkey(dh_i, "dhash")

    # second ensure serves from the manifest — no rebuild
    root = os.path.join(
        A.corpus_warehouse(spark, sf_dir), "image_phash_v1"
    )
    mpath = os.path.join(root, "MANIFEST.json")
    mt0 = os.path.getmtime(mpath)
    A.ensure_image_phash(spark, sf_dir)
    assert os.path.getmtime(mpath) == mt0


def test_jaccard_pairs_artifact_matches_inline(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Round 10: the verified Jaccard pair table serves from the
    corpus warehouse — stored == the inline PPJoin derivation at the
    shared operating point, and a second ensure() serves without
    rebuilding."""
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "art"))
    from commercial_rfp_data_pipeline_spark.operators.textops import (
        jaccard_prefix_filter_pairs,
    )
    from commercial_rfp_data_pipeline_spark.plans import artifacts as A

    served = A.ensure_jaccard_pairs(spark, sf_dir)
    toks, dft, _ = A.ensure_token_index(spark, sf_dir, k=3)
    inline = jaccard_prefix_filter_pairs(
        None,
        t_num=1,
        t_den=2,
        max_doc_freq=100,
        distinct_sh=toks.select("doc_id", F.col("tok").alias("sh")),
        dft=dft.select(F.col("tok").alias("sh"), "df"),
    )
    key = lambda df: {
        (r.doc_a, r.doc_b, r.common, r.jaccard) for r in df.collect()
    }
    assert key(served) == key(inline)

    root = os.path.join(
        A.corpus_warehouse(spark, sf_dir), "jaccard_pairs_k3_t12_df100"
    )
    mpath = os.path.join(root, "MANIFEST.json")
    mt0 = os.path.getmtime(mpath)
    A.ensure_jaccard_pairs(spark, sf_dir)
    assert os.path.getmtime(mpath) == mt0


def test_copurchase_append_equals_rebuild(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Round 10: incremental co-purchase maintenance — appending a
    whole-order delta to the previous snapshot's artifact produces
    exactly the edge/degree tables a full rebuild of the combined
    corpus produces, registered under the combined corpus's content
    key (so ensure_copurchase_graph serves it without rebuilding)."""
    from commercial_rfp_data_pipeline_spark.plans import artifacts as A

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    base_dir = str(tmp_path / "base_sf")
    os.makedirs(base_dir)
    li.filter(F.col("l_orderkey") % 2 == 0).write.parquet(
        os.path.join(base_dir, "lineitem.parquet")
    )
    delta = li.filter(F.col("l_orderkey") % 2 == 1)

    # warehouse A: append path
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "whA"))
    aw, ad = A.append_to_copurchase_graph(spark, base_dir, delta, sf_dir)
    ekey = lambda df: {
        (r.src, r.dst, r.w, r.w_dist) for r in df.collect()
    }
    dkey = lambda df: {(r.id, r.d) for r in df.collect()}
    a_edges, a_degs = ekey(aw), dkey(ad)

    # the appended artifact lives under the COMBINED corpus key:
    # ensure() must serve it, not rebuild it
    root = os.path.join(
        A.graph_warehouse(spark, sf_dir), "copurchase"
    )
    mpath = os.path.join(root, "MANIFEST.json")
    mt0 = os.path.getmtime(mpath)
    sw, sd = A.ensure_copurchase_graph(spark, sf_dir)
    assert os.path.getmtime(mpath) == mt0
    assert ekey(sw) == a_edges

    # warehouse B: fresh full rebuild of the combined corpus
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "whB"))
    rw, rd = A.ensure_copurchase_graph(spark, sf_dir)
    assert ekey(rw) == a_edges
    assert dkey(rd) == a_degs

    # manifest n_edges literal (broadcast-dispatch input) matches too
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "whA"))
    nA = A.copurchase_n_edges(spark, sf_dir)
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "whB"))
    nB = A.copurchase_n_edges(spark, sf_dir)
    assert nA == nB == len(a_edges)


def test_bipartite_append_equals_rebuild(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Round 10: incremental bipartite maintenance — whole-order delta
    append == full rebuild, published under the combined corpus's
    lineitem+orders double key."""
    from commercial_rfp_data_pipeline_spark.plans import artifacts as A

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    base_dir = str(tmp_path / "base_sf")
    os.makedirs(base_dir)
    o.filter(F.col("o_orderkey") % 2 == 0).write.parquet(
        os.path.join(base_dir, "orders.parquet")
    )
    li.filter(F.col("l_orderkey") % 2 == 0).write.parquet(
        os.path.join(base_dir, "lineitem.parquet")
    )
    d_orders = o.filter(F.col("o_orderkey") % 2 == 1)
    d_li = li.filter(F.col("l_orderkey") % 2 == 1)

    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "whA"))
    appended = A.append_to_purchase_bipartite(
        spark, base_dir, d_orders, d_li, sf_dir
    )
    ekey = lambda df: {(r.src, r.dst) for r in df.collect()}
    a_edges = ekey(appended)

    root = os.path.join(
        A.graph_warehouse(spark, sf_dir),
        f"bipartite-{A.orders_key(spark, sf_dir)}",
    )
    mpath = os.path.join(root, "MANIFEST.json")
    mt0 = os.path.getmtime(mpath)
    assert ekey(A.ensure_purchase_bipartite(spark, sf_dir)) == a_edges
    assert os.path.getmtime(mpath) == mt0  # served, not rebuilt

    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "whB"))
    assert ekey(A.ensure_purchase_bipartite(spark, sf_dir)) == a_edges
