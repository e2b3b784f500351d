"""Round-10 additions: the durable fuzzy-linkage pair artifact
(VERDICT r9 next-round #3) — artifact == inline, reuse, invalidation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table


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
