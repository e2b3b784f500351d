"""Dedup / argmax / keep-latest queries (SURVEY.md §2.6, §2.12) plus the
exact-dedup path of the LLM-pipeline dedup family. Fuzzy dedup
(MinHash/SimHash/Jaccard/embedding) lives in text_q.py / vector_q.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.operators.dedup import (
    argmax_per_key,
    dedup_keep_first,
    dedup_keep_last,
    duplicate_audit,
    group_count_having,
    keep_latest_global_date_semantics,
    keep_latest_per_key,
)
from commercial_rfp_data_pipeline_spark.registry import query


@query(
    "dedup_exact_deterministic",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM (
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                ORDER BY l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def q_dedup_exact(spark, sf_dir):
    """A6 deterministic form: one survivor per (partkey, suppkey), chosen
    by the explicit (orderkey, linenumber) ordinal — same survivors under
    any partitioning (pandas keep='first' semantics, raw:251)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    li = li.withColumn(
        "__ord", F.col("l_orderkey") * 100 + F.col("l_linenumber")
    )
    out = dedup_keep_first(li, ["l_partkey", "l_suppkey"], ordinal="__ord")
    return out.drop("__ord")


@query(
    "dedup_keep_last",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM (
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                ORDER BY l_orderkey DESC, l_linenumber DESC) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def q_dedup_keep_last(spark, sf_dir):
    """A7: keep='last' by ordinal (citation:207)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    li = li.withColumn("__ord", F.col("l_orderkey") * 100 + F.col("l_linenumber"))
    out = dedup_keep_last(li, ["l_partkey", "l_suppkey"], ordinal="__ord")
    return out.drop("__ord")


@query(
    "group_count_having",
    """
    SELECT l_partkey, l_suppkey, count(*) AS cnt
    FROM lineitem GROUP BY l_partkey, l_suppkey HAVING count(*) > 1
    """,
)
def q_group_count_having(spark, sf_dir):
    """A1+A2 (raw:245-247)."""
    li = load_table(spark, sf_dir, "lineitem")
    return group_count_having(li, ["l_partkey", "l_suppkey"], min_count=2).withColumnRenamed(
        "count", "cnt"
    )


@query(
    "duplicate_audit",
    """
    SELECT o_custkey, o_orderdate_d AS o_orderdate, n FROM (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate_d, count(*) AS n
      FROM orders GROUP BY o_custkey, CAST(o_orderdate AS DATE)
    ) WHERE n > 1
    """,
)
def q_duplicate_audit(spark, sf_dir):
    """A8: offending (custkey, orderdate) groups with multiplicities
    (citation:196-204)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("o_orderdate")
    )
    return duplicate_audit(o, ["o_custkey", "o_orderdate"])


@query(
    "argmax_per_group",
    """
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS max_price FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q_argmax(spark, sf_dir):
    """A5: full-row argmax with first-max tiebreak (raw:270-276) —
    priciest order per customer, orderkey as the positional ordinal."""
    o = load_table(spark, sf_dir, "orders")
    out = argmax_per_key(o, ["o_custkey"], "o_totalprice", tiebreak="o_orderkey")
    return out.select(
        "o_custkey", "o_orderkey", F.col("o_totalprice").cast("double").alias("max_price")
    )


@query(
    "keep_latest_per_key",
    """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS latest_date FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q_keep_latest(spark, sf_dir):
    """J1 *intent* semantics as a reusable primitive (§2.12.1): latest
    order per customer, deterministic tiebreak."""
    o = load_table(spark, sf_dir, "orders")
    out = keep_latest_per_key(o, ["o_custkey"], date_col="o_orderdate", tiebreak="o_orderkey")
    return out.select(
        "o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("latest_date")
    )


@query(
    "keep_latest_global_date_literal",
    """
    WITH t AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS odate FROM orders)
    SELECT o_custkey, o_orderkey, odate FROM t
    WHERE o_custkey IN (SELECT o_custkey FROM t GROUP BY o_custkey HAVING count(*) = 1)
       OR odate IN (SELECT max(odate) FROM t GROUP BY o_custkey HAVING count(*) > 1)
    """,
)
def q_j1_literal(spark, sf_dir):
    """J1 *literal* semantics (raw:257-268), preserved bug-for-bug: keep
    a row iff its date is in the GLOBAL set of per-duplicated-key max
    dates OR its key is not duplicated (SURVEY.md §2.12.1)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("odate")
    )
    return keep_latest_global_date_semantics(o, key="o_custkey", date_col="odate")


_DRAFT_NORM = "lower(trim(regexp_replace(CAST(text AS VARCHAR), '\\s+', ' ', 'g')))"


@query(
    "draft_dedup_longest_survivor",
    f"""
    WITH keyed AS (
      SELECT doc_id, {_DRAFT_NORM} AS norm,
             md5(substr({_DRAFT_NORM}, 1, 40)) AS qkey
      FROM documents
    )
    SELECT doc_id, qkey, CAST(length(norm) AS BIGINT) AS n_chars FROM (
      SELECT doc_id, qkey, norm,
             row_number() OVER (PARTITION BY qkey
                                ORDER BY length(norm) DESC, doc_id) AS rn
      FROM keyed
    ) WHERE rn = 1
    """,
)
def q_draft_dedup_longest(spark, sf_dir):
    """A10 (1/raw:191-205): the draft's longest-survivor dedup — group
    by a NORMALIZED key (lowercase/ws-collapsed 40-char prefix), keep
    the longest text, positional tiebreak. Distinct from A5: the dedup
    key is a derived normalization, not a raw column."""
    from commercial_rfp_data_pipeline_spark.operators.textops import norm_text

    docs = load_table(spark, sf_dir, "documents")
    norm = norm_text("text")
    keyed = docs.select(
        "doc_id",
        norm.alias("norm"),
        F.md5(F.substring(norm, 1, 40)).alias("qkey"),
    ).withColumn("n_chars", F.length("norm").cast("bigint"))
    out = argmax_per_key(keyed, ["qkey"], "n_chars", tiebreak="doc_id")
    return out.select("doc_id", "qkey", "n_chars")


@query(
    "duplicate_examples_top10",
    """
    SELECT o_custkey, odate, n FROM (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS odate, count(*) AS n
      FROM orders GROUP BY o_custkey, CAST(o_orderdate AS DATE)
      HAVING count(*) > 1
    ) ORDER BY n DESC, o_custkey, odate LIMIT 10
    """,
)
def q_duplicate_examples(spark, sf_dir):
    """O4 (citation:203): the duplicate-audit 'examples' truncation —
    top-10 offending groups under a TOTAL deterministic order (count
    DESC, then keys), so LIMIT is reproducible in both engines. Compiles
    to TakeOrderedAndProject: per-partition heads, driver merge — no
    global sort at scale."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("odate")
    )
    offenders = duplicate_audit(o, ["o_custkey", "odate"])
    return offenders.orderBy(F.col("n").desc(), "o_custkey", "odate").limit(10)


@query(
    "incremental_corpus_dedup",
    f"""
    WITH corpus AS (
      SELECT DISTINCT md5({_DRAFT_NORM}) AS fp
      FROM documents WHERE doc_id % 5 <> 0
    ),
    inc AS (
      SELECT doc_id, md5({_DRAFT_NORM}) AS fp
      FROM documents WHERE doc_id % 3 = 0
    ),
    flagged AS (
      SELECT i.doc_id, i.fp,
             c.fp IS NOT NULL AS in_corpus,
             row_number() OVER (PARTITION BY i.fp ORDER BY i.doc_id) AS rn
      FROM inc i LEFT JOIN corpus c ON c.fp = i.fp
    )
    SELECT doc_id, fp,
           CASE WHEN in_corpus THEN 'dup_of_corpus'
                WHEN rn > 1 THEN 'dup_in_batch'
                ELSE 'new' END AS status
    FROM flagged
    """,
)
def q_incremental_corpus_dedup(spark, sf_dir):
    """INCREMENTAL ingest dedup — the operation a continuously-crawled
    corpus runs on every arriving batch: flag each incoming document as
    'dup_of_corpus' (content fingerprint already in the standing
    corpus), 'dup_in_batch' (an earlier document in the same batch has
    the same content), or 'new' (safe to append). Corpus membership is
    one fingerprint semi/left join; within-batch dedup is keep-first by
    deterministic ordinal — together the full admission decision,
    without ever re-deduplicating the standing corpus.

    Scale: the corpus side reduces to a DISTINCT fp column (at 10^10
    docs that's the fingerprint index you maintain anyway, bucketed by
    fp so this join is Exchange-free against it); the batch side
    shuffles once on fp for both the join and the keep-first window.
    Appending `status='new'` rows and their fps to the standing tables
    keeps the next batch's check identical — the loop is O(batch), not
    O(corpus)."""
    from commercial_rfp_data_pipeline_spark.operators.textops import fingerprint
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    corpus_fps = (
        fingerprint(docs.filter(F.col("doc_id") % 5 != 0))
        .select("fp")
        .distinct()
        .withColumn("_in_corpus", F.lit(True))
    )
    inc = fingerprint(docs.filter(F.col("doc_id") % 3 == 0)).select(
        "doc_id", "fp"
    )
    w = W.partitionBy("fp").orderBy("doc_id")
    return (
        inc.join(corpus_fps, "fp", "left")
        .withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "fp",
            F.when(F.col("_in_corpus").isNotNull(), F.lit("dup_of_corpus"))
            .when(F.col("rn") > 1, F.lit("dup_in_batch"))
            .otherwise(F.lit("new"))
            .alias("status"),
        )
    )


# ---- soft dedup retention (sqrt schedule) ----------------------------


@query(
    "dedup_soft_retention_sqrt",
    """
    WITH fp AS (
      SELECT doc_id,
             md5(substr(lower(trim(regexp_replace(CAST(text AS VARCHAR),
                 '\\s+', ' ', 'g'))), 1, 40)) AS fp
      FROM documents
    ),
    sized AS (
      SELECT doc_id, fp,
             CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS n_members,
             row_number() OVER (
               PARTITION BY fp
               ORDER BY md5('soft:' || CAST(doc_id AS VARCHAR)), doc_id)
               AS rank_in_cluster
      FROM fp
    )
    SELECT doc_id, fp, n_members,
           CAST(rank_in_cluster AS INTEGER) AS rank_in_cluster,
           CAST(ceil(sqrt(CAST(n_members AS DOUBLE))) AS BIGINT)
             AS keep_quota,
           rank_in_cluster
             <= CAST(ceil(sqrt(CAST(n_members AS DOUBLE))) AS BIGINT)
             AS kept
    FROM sized
    """,
)
def q_dedup_soft_retention(spark, sf_dir):
    """Soft deduplication with a sqrt retention schedule: instead of
    keeping exactly one survivor per duplicate cluster (dedup_survivors)
    or all members, keep ceil(sqrt(n)) of each n-member cluster — the
    production compromise (RefinedWeb/Gopher-style) that damps the
    over-represented template mass without erasing natural frequency
    signal. Selection within a cluster is an md5 lottery (deterministic,
    id-stable); every doc row comes back with its cluster size, lottery
    rank, quota and kept flag, so the downstream filter is `WHERE kept`.

    Scale: one shuffle on the content fingerprint; the quota is a
    per-row expression over the windowed cluster size — no second pass,
    no driver state. sqrt/ceil on exact integer inputs is
    cross-engine-stable (n <= 2^52)."""
    from commercial_rfp_data_pipeline_spark.operators.textops import norm_text

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", F.md5(F.substring(norm_text("text"), 1, 40)).alias("fp")
    )
    w_sz = Window.partitionBy("fp")
    w_rk = Window.partitionBy("fp").orderBy(
        F.md5(F.concat(F.lit("soft:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    sized = fp.select(
        "doc_id",
        "fp",
        F.count(F.lit(1)).over(w_sz).cast("bigint").alias("n_members"),
        F.row_number().over(w_rk).cast("int").alias("rank_in_cluster"),
    )
    quota = F.ceil(F.sqrt(F.col("n_members").cast("double"))).cast("bigint")
    return sized.select(
        "doc_id",
        "fp",
        "n_members",
        "rank_in_cluster",
        quota.alias("keep_quota"),
        (F.col("rank_in_cluster") <= quota).alias("kept"),
    )
