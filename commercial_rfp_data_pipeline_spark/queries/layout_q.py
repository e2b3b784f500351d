"""Layout queries: the normalized Z-order interleave key,
value-checked against a DuckDB restatement generated from the same
scale/interleave loops."""

from __future__ import annotations

from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.operators.layout import (
    zorder_key,
    zorder_oracle_cte,
)
from commercial_rfp_data_pipeline_spark.registry import query

_ZCOLS = ["l_partkey", "l_suppkey"]


@query(
    "zorder_key_interleave",
    f"""
    WITH {zorder_oracle_cte("lineitem", _ZCOLS).strip()}
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, zkey
    FROM zkeyed
    """,
)
def q_zorder_key(spark, sf_dir):
    """The range-normalized Morton (Z-order) clustering key over
    (l_partkey, l_suppkey) for every lineitem row — the sort key
    `save_zordered` lays files out by. Each column scales onto a
    16-bit domain by its min/max (integer floor arithmetic; the
    min/max pass is the same metadata-sized aggregate Delta's
    OPTIMIZE runs), then bits interleave. The value-hash pins the
    whole construction; the layout test (tests/test_round4_ops.py)
    separately proves the written files' min/max footers shrink on
    BOTH dimensions.

    Scale: one tiny min/max aggregate + a narrow codegen map."""
    li = load_table(spark, sf_dir, "lineitem")
    return zorder_key(li, _ZCOLS).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "zkey"
    )


# ---- consistent-hash shard rebalance audit --------------------------
# The data-layout move behind every resharding: keys live on an
# md5-hex ring owned by virtual nodes (16 per shard); adding a shard
# must move ONLY the keys the new shard's vnodes capture — no key ever
# migrates between surviving shards (the defining consistent-hashing
# property, and the reason reshards are O(moved keys), not O(corpus)).
_CH_SHARDS_BEFORE = 8
_CH_VNODES = 16

_CH_SQL = f"""
    WITH vn AS MATERIALIZED (
      SELECT s.s, v.v,
             md5('vn:' || CAST(s.s AS VARCHAR) || ':'
                 || CAST(v.v AS VARCHAR)) AS pos
      FROM (SELECT unnest(generate_series(0, {_CH_SHARDS_BEFORE})) AS s) s,
           (SELECT unnest(generate_series(0, {_CH_VNODES - 1})) AS v) v
    ),
    keys AS (
      SELECT doc_id, md5('key:' || CAST(doc_id AS VARCHAR)) AS kpos
      FROM documents
    ),
    bsucc AS (
      SELECT k.doc_id, min(v.pos) AS spos
      FROM keys k LEFT JOIN vn v
        ON v.s < {_CH_SHARDS_BEFORE} AND v.pos >= k.kpos
      GROUP BY k.doc_id
    ),
    bmin AS (SELECT min(pos) AS mpos FROM vn WHERE s < {_CH_SHARDS_BEFORE}),
    before AS (
      SELECT b.doc_id, v.s AS shard_before
      FROM bsucc b CROSS JOIN bmin m
      JOIN vn v ON v.s < {_CH_SHARDS_BEFORE}
        AND v.pos = coalesce(b.spos, m.mpos)
    ),
    asucc AS (
      SELECT k.doc_id, min(v.pos) AS spos
      FROM keys k LEFT JOIN vn v ON v.pos >= k.kpos
      GROUP BY k.doc_id
    ),
    amin AS (SELECT min(pos) AS mpos FROM vn),
    aftr AS (
      SELECT a.doc_id, v.s AS shard_after
      FROM asucc a CROSS JOIN amin m
      JOIN vn v ON v.pos = coalesce(a.spos, m.mpos)
    ),
    moves AS (
      SELECT b.doc_id, b.shard_before, a.shard_after
      FROM before b JOIN aftr a USING (doc_id)
    )
    SELECT s.shard,
           CAST(sum(CASE WHEN shard_before = s.shard THEN 1 ELSE 0 END)
             AS BIGINT) AS n_before,
           CAST(sum(CASE WHEN shard_after = s.shard THEN 1 ELSE 0 END)
             AS BIGINT) AS n_after,
           CAST(sum(CASE WHEN shard_after = s.shard
                          AND shard_before <> s.shard THEN 1 ELSE 0 END)
             AS BIGINT) AS gained,
           CAST(sum(CASE WHEN shard_before = s.shard
                          AND shard_after <> s.shard THEN 1 ELSE 0 END)
             AS BIGINT) AS lost
    FROM (SELECT unnest(generate_series(0, {_CH_SHARDS_BEFORE})) AS shard) s
    CROSS JOIN moves
    GROUP BY s.shard
"""


@query("consistent_hash_rebalance_audit", _CH_SQL)
def q_consistent_hash_rebalance(spark, sf_dir):
    """Per-shard movement audit for adding shard 8 to an 8-shard
    consistent-hash ring (16 md5 vnodes per shard, successor-with-wrap
    ownership — the same ring arithmetic as contrastive_negatives'
    bucketed successor): n_before/n_after plus gained/lost per shard.
    The consistent-hashing contract is visible in the result — every
    surviving shard has gained = 0 (keys only ever move TO the new
    shard), and the new shard's gain is its entire occupancy, ~1/9 of
    the corpus at 16 vnodes.

    Scale: the vnode ring is config-sized (144 rows, broadcast); the
    successor is a broadcast theta-join + per-key min — one corpus
    pass per ring, no shuffle beyond the per-key aggregate."""
    from pyspark.sql import functions as F

    spark_vn = spark.createDataFrame(
        [
            (s, v)
            for s in range(_CH_SHARDS_BEFORE + 1)
            for v in range(_CH_VNODES)
        ],
        "s int, v int",
    ).select(
        "s",
        "v",
        F.md5(
            F.concat(
                F.lit("vn:"),
                F.col("s").cast("string"),
                F.lit(":"),
                F.col("v").cast("string"),
            )
        ).alias("pos"),
    )
    keys = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit("key:"), F.col("doc_id").cast("string"))).alias(
            "kpos"
        ),
    )

    def owner(ring):
        ring = ring.select("s", "pos")
        succ = (
            keys.join(
                F.broadcast(ring), F.col("pos") >= F.col("kpos"), "left"
            )
            .groupBy("doc_id")
            .agg(F.min("pos").alias("spos"))
        )
        mn = ring.agg(F.min("pos").alias("mpos"))
        return (
            succ.crossJoin(F.broadcast(mn))
            .select(
                "doc_id", F.coalesce("spos", "mpos").alias("opos")
            )
            .join(F.broadcast(ring), F.col("pos") == F.col("opos"))
            .select("doc_id", F.col("s").alias("shard_owner"))
        )

    before = owner(
        spark_vn.filter(F.col("s") < _CH_SHARDS_BEFORE)
    ).withColumnRenamed("shard_owner", "shard_before")
    after = owner(spark_vn).withColumnRenamed("shard_owner", "shard_after")
    moves = before.join(after, "doc_id")
    # per-shard tallies as TWO shard-keyed aggregates over moves —
    # not a shards x corpus cross join (that planned an un-broadcast
    # CartesianProduct fanning every key 9x; the round-7 registry-wide
    # plan lint now forbids the node outright)
    moved = F.col("shard_before") != F.col("shard_after")
    b = moves.groupBy(F.col("shard_before").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_before"),
        F.sum(F.when(moved, 1).otherwise(0)).cast("bigint").alias("lost"),
    )
    a = moves.groupBy(F.col("shard_after").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_after"),
        F.sum(F.when(moved, 1).otherwise(0)).cast("bigint").alias("gained"),
    )
    shards = spark.createDataFrame(
        [(s,) for s in range(_CH_SHARDS_BEFORE + 1)], "shard int"
    )
    return (
        shards.join(F.broadcast(b), "shard", "left")
        .join(F.broadcast(a), "shard", "left")
        .select(
            "shard",
            F.coalesce("n_before", F.lit(0)).cast("bigint").alias("n_before"),
            F.coalesce("n_after", F.lit(0)).cast("bigint").alias("n_after"),
            F.coalesce("gained", F.lit(0)).cast("bigint").alias("gained"),
            F.coalesce("lost", F.lit(0)).cast("bigint").alias("lost"),
        )
    )


# ---- compaction bin-packing (the small-files problem) ----------------
# At 100 TB the dominant table-maintenance op is compaction: thousands
# of small ingest files must be coalesced into ~target-size files
# WITHOUT destroying the date clustering readers prune on. The
# distributed-friendly plan is the cumulative-sum assignment: order the
# file manifest by its cluster key, prefix-sum the bytes, and assign
# bin = bytes_before DIV target. Unlike first-fit-decreasing this needs
# no sequential state, keeps date ranges contiguous per output file,
# and bounds every bin below target + max_file_bytes.
_COMPACT_TARGET = 64_000  # bytes per output file


_COMPACT_SQL = f"""
    WITH files AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(length(o_orderpriority) + 96) AS BIGINT) AS file_bytes
      FROM orders
      GROUP BY 1
    ),
    packed AS (
      SELECT day, file_bytes,
             CAST(coalesce(sum(file_bytes) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS bytes_before
      FROM files
    )
    SELECT CAST(bytes_before // {_COMPACT_TARGET} AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(file_bytes) AS BIGINT) AS bin_bytes,
           CAST(sum(CASE WHEN file_bytes < {_COMPACT_TARGET}
                         THEN 1 ELSE 0 END) AS BIGINT) AS small_files_in,
           min(day) AS first_day,
           max(day) AS last_day
    FROM packed
    GROUP BY 1
"""


@query("compaction_bin_packing", _COMPACT_SQL)
def q_compaction_bin_packing(spark, sf_dir):
    """Compaction plan for a per-day ingest layout: one simulated file
    per o_orderdate (bytes = sum of priority-string lengths + row overhead),
    packed into ~64 KB output files by cumulative-bytes DIV target in
    day order. Per output bin: file count, total bytes, how many small
    files it absorbed, and its contiguous [first_day, last_day] range
    — the property that keeps date-predicate pruning effective after
    the rewrite (what Delta/Iceberg OPTIMIZE preserves via sort-order
    compaction).

    Scale: the file manifest is metadata-sized (one row per file, ~10^5
    rows for a 100 TB table), built by one map-side-combined groupBy;
    the prefix sum is the distributed two-pass form (per-range local
    sums + broadcast offsets), never a single-partition window over
    the data plane."""
    from commercial_rfp_data_pipeline_spark.operators.ordered import (
        distributed_prefix_sum,
    )

    orders = load_table(spark, sf_dir, "orders")
    files = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.length("o_orderpriority") + F.lit(96))
        .cast("bigint")
        .alias("file_bytes")
    )
    packed = distributed_prefix_sum(
        files,
        values={"bytes": F.col("file_bytes")},
        order_by=[F.col("day")],
    )
    return (
        packed.select(
            "day",
            "file_bytes",
            F.col("bytes_before").cast("bigint").alias("bytes_before"),
        )
        .groupBy(
            # exact integer floor division (`div`), matching the
            # oracle's `//` — double division + cast would drift once
            # cumulative bytes approach 2^53
            F.expr(f"bytes_before div {_COMPACT_TARGET}").alias("bin")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum("file_bytes").cast("bigint").alias("bin_bytes"),
            F.sum(
                F.when(F.col("file_bytes") < _COMPACT_TARGET, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("small_files_in"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
        )
    )
