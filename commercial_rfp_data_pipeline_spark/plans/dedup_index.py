"""Durable dedup-cluster index (round 8, VERDICT r7 #2).

The near-dup cluster table (SimHash fingerprints -> banded pairs ->
connected components -> quality survivors) was recomputed from scratch
by every consumer (`dedup_survivors`, `training_data_pipeline`,
`preference_pairs_from_clusters`, `split_leakage_neardup` — ~6-9 s
each at sf0.1). This module makes it the FOURTH durable index next to
BM25 / IVF / graph (plans/index_lifecycle.py), with the same
manifest-committed lifecycle:

- **ensure**: full build — fingerprints + quality per doc, cluster
  labels bucketed by ``pmod(cluster_id, N_BUCKETS)`` — committed under
  one atomic manifest.
- **append**: replay-idempotent incremental admission. New docs band-
  join against the STORED fingerprints (the same cross-frame LSH check
  `streaming/ingest.neardup_ingest_sink` runs), then a BOUNDED
  connected-components pass over {new doc ids} + {touched old cluster
  ids} merges new docs into existing clusters — and merges existing
  clusters that a new doc bridges. Only the affected cluster buckets
  are rewritten, copy-on-write under the new batch key; the manifest
  re-points per-bucket (a bucket emptied by relabel moves is re-pointed
  to a key with no dir for it — readers see it empty, no stale rows).
  Because old cluster ids are the min doc_id of their members, the
  merged label min(new ids, old cluster ids) equals the from-scratch
  min over the full component: append == rebuild
  (test_dedup_index_append_equals_rebuild).
- **serve**: `dedup_clusters_table` / `dedup_survivors_from_index`
  read exactly the committed dirs.

Crash discipline is identical to BM25: every staged dir is invisible
until the single ``os.replace`` manifest commit; a replayed append maps
to the same content-derived key and no-ops.

Scale: the fingerprint table is one narrow row per doc; the append's
CC runs over the batch + touched clusters only (never the corpus); the
bucket rewrite reads/writes only buckets containing touched clusters —
O(batch + touched), corpus-independent.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.operators.dedup import (
    cluster_survivors,
    dup_clusters,
)
from commercial_rfp_data_pipeline_spark.operators.textops import (
    quality_features,
    simhash,
    simhash_pairs,
)
from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
    _bm25_commit as _commit,
)
from commercial_rfp_data_pipeline_spark.plans.index_lifecycle import (
    _bm25_manifest as _manifest,
)

N_BUCKETS = 16  # cluster-table copy-on-write buckets
MAX_HAMMING = 3  # near-dup threshold (matches simhash_pairs default)

# off-mode (SPARK_GRAFT_ARTIFACTS=off, VERDICT r10 #1) inline tables:
# ensure_dedup_index registers FRESH lazy (fp, clusters) DataFrames
# here per call, and dedup_tables serves them instead of parquet.
# Every consumer ensures before it reads, so each query invocation
# rebuilds from scratch — this is a handle registry, not a result
# cache (the stored plans are lazy; nothing computed survives a call).
_OFF_TABLES: dict[str, tuple[DataFrame, DataFrame]] = {}


def _fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash, quality_score) — everything cluster formation
    and survivor selection need, computed in ONE pass over the text."""
    sh = simhash(docs)
    q = quality_features(docs).select("doc_id", "quality_score")
    return sh.join(q, "doc_id")


def _batch_key(fp: DataFrame) -> tuple[str, int]:
    """Content-derived, order-insensitive batch key (same discipline as
    append_to_bm25_index): a replayed batch maps to the same key."""
    # decimal(38,0) accumulation: a long sum of xxhash64 values
    # overflows (a hard error under ANSI mode, silent wrap otherwise)
    sig = fp.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("doc_id").cast("decimal(38,0)")).alias("h"),
        F.sum(F.xxhash64("simhash").cast("decimal(38,0)")).alias("hs"),
    ).collect()[0]
    key = hashlib.md5(
        f"{sig['n']}:{sig['h']}:{sig['hs']}".encode()
    ).hexdigest()[:16]
    return key, sig["n"]


def _write_cluster_buckets(
    clusters: DataFrame, root: str, key: str
) -> None:
    (
        clusters.withColumn(
            "bkt", F.pmod(F.col("cluster_id"), F.lit(N_BUCKETS))
        )
        .select("doc_id", "cluster_id", "bkt")
        .write.mode("overwrite")
        .partitionBy("bkt")
        .parquet(os.path.join(root, "clusters", key))
    )


def ensure_dedup_index(
    spark: SparkSession, docs: DataFrame, warehouse: str
) -> str:
    """Build the durable dedup index from scratch (idempotent: returns
    the existing index untouched if present)."""
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        artifacts_mode,
    )

    root = os.path.join(warehouse, "dedup")
    if artifacts_mode() == "off":
        fp_off = _fingerprints(docs).localCheckpoint(eager=False)
        pairs_off = simhash_pairs(fp_off.select("doc_id", "simhash"))
        clusters_off = dup_clusters(docs.select("doc_id"), pairs_off)
        _OFF_TABLES[root] = (
            fp_off,
            clusters_off.localCheckpoint(eager=False),
        )
        return root
    if _manifest(root) is not None:
        return root
    fp = _fingerprints(docs).localCheckpoint()
    pairs = simhash_pairs(fp.select("doc_id", "simhash"))
    clusters = dup_clusters(docs.select("doc_id"), pairs)
    key = "base"
    fp.write.mode("overwrite").parquet(os.path.join(root, "fp", key))
    _write_cluster_buckets(clusters, root, key)
    _commit(
        root,
        {
            "batches": [key],
            "buckets": {str(b): key for b in range(N_BUCKETS)},
        },
    )
    return root


def dedup_tables(
    spark: SparkSession, warehouse: str
) -> tuple[DataFrame, DataFrame]:
    """Manifest-resolved (fingerprints, clusters) over exactly the
    committed dirs. A bucket whose current key holds no dir for it is
    EMPTY (its rows were relabeled into other buckets) — skipped, not
    an error."""
    from commercial_rfp_data_pipeline_spark.plans.artifacts import (
        artifacts_mode,
    )

    root = os.path.join(warehouse, "dedup")
    if artifacts_mode() == "off" and root in _OFF_TABLES:
        return _OFF_TABLES[root]
    m = _manifest(root)
    if m is None:
        raise ValueError(f"dedup_tables: no index at {root}")
    fp = spark.read.parquet(
        *[os.path.join(root, "fp", k) for k in m["batches"]]
    )
    paths = [
        os.path.join(root, "clusters", key, f"bkt={b}")
        for b, key in m["buckets"].items()
    ]
    paths = [p for p in paths if os.path.isdir(p)]
    clusters = spark.read.parquet(*paths)
    return fp, clusters


def dedup_clusters_table(spark: SparkSession, warehouse: str) -> DataFrame:
    return dedup_tables(spark, warehouse)[1]


def dedup_survivors_from_index(
    spark: SparkSession, warehouse: str
) -> DataFrame:
    """Serve the deduplicated corpus from the durable index: quality
    argmax per cluster + cluster size — identical columns/semantics to
    the from-scratch `dedup_survivors` query."""
    fp, clusters = dedup_tables(spark, warehouse)
    return cluster_survivors(
        clusters, fp.select("doc_id", "quality_score")
    )


def _cross_pairs(fp_new: DataFrame, fp_old: DataFrame) -> DataFrame:
    """(new_id, old_id) pairs at Hamming <= MAX_HAMMING between the
    batch and the stored fingerprints — band-LSH candidates (complete
    by pigeonhole for <= SIMHASH_BANDS - 1), exact bit_count verify.
    Same shape as streaming/ingest's admission check."""
    from commercial_rfp_data_pipeline_spark.streaming.ingest import (
        _simhash_band_table,
    )

    a = _simhash_band_table(fp_new.select("doc_id", "simhash")).select(
        F.col("doc_id").alias("new_id"),
        F.col("sh_hi").alias("hi_a"),
        F.col("sh_lo").alias("lo_a"),
        "band",
        "val",
    )
    b = _simhash_band_table(fp_old.select("doc_id", "simhash")).select(
        F.col("doc_id").alias("old_id"),
        F.col("sh_hi").alias("hi_b"),
        F.col("sh_lo").alias("lo_b"),
        "band",
        "val",
    )
    ham = F.bit_count(
        F.col("hi_a").bitwiseXOR(F.col("hi_b"))
    ) + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    return (
        a.join(b, ["band", "val"])
        .filter(ham <= MAX_HAMMING)
        .select("new_id", "old_id")
        .distinct()
    )


def purge_from_dedup_index(
    spark: SparkSession, warehouse: str, doc_ids: list
) -> dict:
    """Right-to-be-forgotten for the FOURTH durable index (round 8):
    a purged document must leave the fingerprint batches (its simhash
    and quality are derived content) AND the cluster table — and
    removing it can SPLIT its cluster if it was the bridge between two
    otherwise-unconnected duplicate families, so the affected clusters
    are re-derived, not just filtered.

    Shape: members of the touched clusters (bounded — never the
    corpus) are re-paired from the STORED fingerprints (the same
    band-LSH + exact-Hamming check as append) and re-labeled with a
    bounded CC pass; fp batches holding purged docs are re-staged as
    filtered copies; only affected cluster buckets rewrite under the
    purge key; ONE atomic manifest commit publishes all of it.
    Removing nodes removes exactly their edges, so the result EQUALS a
    from-scratch build over the remaining docs
    (test_dedup_index_purge_equals_rebuild — including a bridge-doc
    split). A replayed purge finds no purged rows and no-ops."""
    root = os.path.join(warehouse, "dedup")
    m = _manifest(root)
    if m is None:
        raise ValueError(f"purge_from_dedup_index: no index at {root}")
    ids = sorted({int(d) for d in doc_ids})
    purge_sig = hashlib.md5(
        ",".join(str(i) for i in ids).encode()
    ).hexdigest()[:8]
    is_purged = F.col("doc_id").isin(ids)

    fp_all, clusters = dedup_tables(spark, warehouse)
    hit_clusters = [
        r.cluster_id
        for r in clusters.filter(is_purged)
        .select("cluster_id")
        .distinct()
        .collect()
    ]
    # ---- fingerprints: filtered batch copies + manifest re-point ----
    new_batches: list[str] = []
    fp_removed = 0
    for key in m["batches"]:
        b = spark.read.parquet(os.path.join(root, "fp", key))
        hits = b.filter(is_purged)
        if hits.limit(1).count() == 0:
            new_batches.append(key)
            continue
        fp_removed += hits.count()
        new_key = f"{key}-purge{purge_sig}"
        b.filter(~is_purged).write.mode("overwrite").parquet(
            os.path.join(root, "fp", new_key)
        )
        new_batches.append(new_key)
    if fp_removed == 0 and not hit_clusters:
        return {
            "fp_removed": 0,
            "clusters_touched": 0,
            "buckets_rewritten": 0,
        }

    # ---- clusters: re-derive the touched families without the purged
    # nodes (a purged bridge doc splits its cluster) ----
    members = (
        clusters.filter(
            F.col("cluster_id").isin(hit_clusters) & ~is_purged
        )
        .select("doc_id")
        .localCheckpoint()
    )
    mem_fp = fp_all.join(members, "doc_id").localCheckpoint()
    pairs = simhash_pairs(
        mem_fp.select("doc_id", "simhash"), max_hamming=MAX_HAMMING
    )
    relabeled = dup_clusters(members, pairs).localCheckpoint()

    new_label_bkts = {
        r.b
        for r in relabeled.select(
            F.pmod("cluster_id", F.lit(N_BUCKETS)).alias("b")
        )
        .distinct()
        .collect()
    }
    affected = {c % N_BUCKETS for c in hit_clusters} | new_label_bkts
    key = f"purge{purge_sig}"
    if affected:
        cur_paths = [
            os.path.join(root, "clusters", m["buckets"][str(b)], f"bkt={b}")
            for b in sorted(affected)
        ]
        cur_paths = [p for p in cur_paths if os.path.isdir(p)]
        untouched = (
            spark.read.parquet(*cur_paths).filter(
                ~F.col("cluster_id").isin(hit_clusters)
            )
            if cur_paths
            else relabeled.limit(0)
        )
        updated = untouched.select("doc_id", "cluster_id").unionByName(
            relabeled.select("doc_id", "cluster_id")
        )
        _write_cluster_buckets(updated, root, key)
    buckets = dict(m["buckets"])
    for b in affected:
        buckets[str(b)] = key
    _commit(root, {"batches": new_batches, "buckets": buckets})
    # loud post-condition: no purged doc remains anywhere
    fp2, cl2 = dedup_tables(spark, warehouse)
    leftover = (
        fp2.filter(is_purged).limit(1).count()
        + cl2.filter(is_purged).limit(1).count()
    )
    if leftover:
        raise RuntimeError(
            "purge_from_dedup_index: purged doc_ids remain after rewrite"
        )
    return {
        "fp_removed": fp_removed,
        "clusters_touched": len(hit_clusters),
        "buckets_rewritten": len(affected),
    }


def append_to_dedup_index(
    spark: SparkSession, warehouse: str, new_docs: DataFrame
) -> dict:
    """Incremental admission: fingerprint the batch, find its near-dup
    links into the stored corpus (band-LSH + exact Hamming), run a
    BOUNDED connected-components pass over {new doc ids} + {touched
    old cluster ids}, relabel only the affected clusters, and commit
    everything under one atomic manifest replace.

    Replay-idempotent (content-derived key); crash-safe (staged dirs
    invisible until commit); equal to a from-scratch rebuild over the
    union because min-labels compose: an old cluster id IS the min of
    its members, so min(new ids, old cluster ids) over the merged
    component equals the global min."""
    root = os.path.join(warehouse, "dedup")
    m = _manifest(root)
    if m is None:
        raise ValueError(
            f"append_to_dedup_index: no index at {root} — run "
            "ensure_dedup_index first"
        )
    fp_new = _fingerprints(new_docs).localCheckpoint()
    key, n_new = _batch_key(fp_new)
    if key in m["batches"]:
        return {"appended": 0, "replayed": True, "buckets_rewritten": 0}

    fp_old, clusters_old = dedup_tables(spark, warehouse)
    in_batch = simhash_pairs(
        fp_new.select("doc_id", "simhash"), max_hamming=MAX_HAMMING
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    cross = _cross_pairs(fp_new, fp_old)
    # old endpoints -> their CLUSTER ids (the graph nodes): bridging
    # docs merge whole clusters, not just themselves
    cross_cl = (
        cross.join(
            clusters_old.withColumnRenamed("doc_id", "old_id"), "old_id"
        )
        .select(
            F.col("new_id").alias("src"),
            F.col("cluster_id").alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    touched = cross_cl.select(F.col("dst").alias("id")).distinct()
    nodes = fp_new.select(F.col("doc_id").alias("id")).unionByName(touched)
    comp = dup_clusters(
        nodes.distinct(),
        in_batch.unionByName(cross_cl),
        id_col="id",
        a_col="src",
        b_col="dst",
    ).localCheckpoint()  # (id, cluster_id) over the bounded subgraph

    new_rows = comp.join(
        fp_new.select(F.col("doc_id").alias("id")), "id"
    ).select(F.col("id").alias("doc_id"), "cluster_id")
    # old clusters whose label moved: C -> L (L < C strictly, since
    # labels only decrease under hash-min)
    relabel = (
        comp.join(touched, "id")
        .filter(F.col("cluster_id") != F.col("id"))
        .select(
            F.col("id").alias("old_cid"),
            F.col("cluster_id").alias("new_cid"),
        )
        .localCheckpoint()
    )
    relabel_rows = relabel.collect()  # bounded: <= touched clusters
    remap = {r.old_cid: r.new_cid for r in relabel_rows}

    # affected buckets: sources of relabeled clusters, destinations of
    # their new labels, and buckets receiving new rows
    new_label_bkts = {
        r.b
        for r in new_rows.select(
            F.pmod("cluster_id", F.lit(N_BUCKETS)).alias("b")
        )
        .distinct()
        .collect()
    }
    affected = (
        {c % N_BUCKETS for c in remap}
        | {c % N_BUCKETS for c in remap.values()}
        | new_label_bkts
    )
    if affected:
        cur_paths = [
            os.path.join(
                root, "clusters", m["buckets"][str(b)], f"bkt={b}"
            )
            for b in sorted(affected)
        ]
        cur_paths = [p for p in cur_paths if os.path.isdir(p)]
        if cur_paths:
            cur = spark.read.parquet(*cur_paths)
            if remap:
                rm = spark.createDataFrame(
                    relabel_rows, "old_cid long, new_cid long"
                )
                cur = cur.join(
                    rm, cur.cluster_id == rm.old_cid, "left"
                ).select(
                    "doc_id",
                    F.coalesce("new_cid", "cluster_id").alias("cluster_id"),
                )
        else:
            cur = new_rows.limit(0)
        updated = cur.unionByName(new_rows.select("doc_id", "cluster_id"))
        # rows whose RELABELED cluster lands outside the affected set
        # cannot exist: new_cid buckets are in `affected` by
        # construction, so `updated` covers exactly the affected
        # buckets' full new content
        _write_cluster_buckets(updated, root, key)
    fp_new.write.mode("overwrite").parquet(os.path.join(root, "fp", key))
    buckets = dict(m["buckets"])
    for b in affected:
        buckets[str(b)] = key
    _commit(root, {"batches": m["batches"] + [key], "buckets": buckets})
    return {
        "appended": n_new,
        "replayed": False,
        "buckets_rewritten": len(affected),
        "clusters_merged": len(remap),
    }
