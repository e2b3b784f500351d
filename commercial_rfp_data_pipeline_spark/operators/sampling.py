"""Deterministic contrastive negative sampling over a hash ring.

Embedding-model training needs k pseudo-random "negative" partner
documents per anchor. rand() is retry/partitioning-unstable, and a
cross-join sample is quadratic. The consistent-hashing construction
fixes both: every document takes a RING POSITION pos = md5(id)
(fixed-length hex, so STRING order == numeric order — the same
md5-uniform trick as `textops.importance_downsample`); each (anchor,
j) probe hashes to q = md5(id#j), and the negative is the document at
the first ring position >= q, wrapping at the end. Fully deterministic
under any partitioning, retries, and cluster size, and uniform because
md5 scatters both sides.

Scale shape (the point of the exercise — the naive form is a global
"find min pos >= q" against an UNKEYED total order):
- ring and probes both bucket by their hex PREFIX (256 buckets): the
  true successor is either inside the probe's own bucket — found by a
  bucket-equi join with a pos >= q residual, fanout bounded by bucket
  occupancy — or it is the first entry of a LATER bucket;
- the "first entry of each later bucket" cascade computes on the
  256-row bucket-min table (a partitionless window over an aggregated
  tiny table — legitimate, it is metadata-sized) and broadcasts;
- the global wrap value is the same table's first row.
So: one narrow map per side, one bounded bucket join, one broadcast
fix-up — nothing global, nothing quadratic. The DuckDB oracle states
the naive inequality-join min; the bucketing's exhaustiveness is
exactly what the value-hash verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

POS_HEX = 15  # 60-bit positions: fixed-length hex, string-ordered
BUCKET_HEX = 2  # 256 buckets


def _pos(col: F.Column) -> F.Column:
    return F.substring(F.md5(col.cast("string")), 1, POS_HEX)


def contrastive_negatives(
    docs: DataFrame, id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """k deterministic negatives per document: (id, j, neg_id,
    is_self). A probe can land on its own anchor (probability ~1/n);
    it is flagged, not silently dropped, so both engines agree row for
    row."""
    ring = docs.select(
        F.col(id_col).alias("_rid"), _pos(F.col(id_col)).alias("_pos")
    ).withColumn("_rb", F.substring("_pos", 1, BUCKET_HEX))
    probes = docs.select(
        F.col(id_col).alias("_aid"),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"),
    ).withColumn(
        "_q",
        _pos(F.concat(F.col("_aid").cast("string"), F.lit("#"), F.col("j"))),
    ).withColumn("_qb", F.substring("_q", 1, BUCKET_HEX))

    # successor inside the probe's own bucket (bounded-fanout join)
    in_bucket = (
        probes.join(ring, (F.col("_qb") == F.col("_rb")) & (F.col("_pos") >= F.col("_q")))
        .groupBy("_aid", "j")
        .agg(F.min(F.struct("_pos", "_rid")).alias("_hit"))
        .select("_aid", "j", F.col("_hit._rid").alias("_neg1"))
    )

    # first ring entry of each bucket, cascaded to "first entry in any
    # LATER bucket" — over ALL 256 bucket values (a probe can hash into
    # a bucket with no ring entries at all; it must still find the next
    # NON-EMPTY bucket's first entry, not fall through to the wrap) —
    # a 256-row table, then broadcast
    spark = docs.sparkSession
    bmin = (
        spark.range(16 ** BUCKET_HEX)
        .select(F.format_string(f"%0{BUCKET_HEX}x", F.col("id")).alias("_rb"))
        .join(
            ring.groupBy("_rb").agg(
                F.min(F.struct("_pos", "_rid")).alias("_m")
            ),
            "_rb",
            "left",
        )
    )
    w_after = Window.orderBy("_rb").rowsBetween(1, Window.unboundedFollowing)
    nxt = bmin.select(
        "_rb", F.min("_m").over(w_after).alias("_nm")
    ).select(
        F.col("_rb").alias("_qb"), F.col("_nm._rid").alias("_neg2")
    )
    wrap = bmin.agg(F.min("_m").alias("_g")).select(
        F.col("_g._rid").alias("_neg3")
    )

    return (
        probes.join(in_bucket, ["_aid", "j"], "left")
        .join(F.broadcast(nxt), "_qb", "left")
        .crossJoin(F.broadcast(wrap))
        .select(
            F.col("_aid").alias(id_col),
            "j",
            F.coalesce("_neg1", "_neg2", "_neg3").alias("neg_id"),
        )
        .withColumn("is_self", F.col("neg_id") == F.col(id_col))
    )


def negatives_oracle_sql(k: int = 3) -> str:
    """DuckDB oracle: the NAIVE global successor (inequality-join min +
    wrap) the bucketed implementation must reproduce exactly."""
    return f"""
    WITH ring AS (
      SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, {POS_HEX}) AS pos
      FROM documents
    ),
    probes AS (
      SELECT d.doc_id, js.j,
             substr(md5(CAST(d.doc_id AS VARCHAR) || '#' || CAST(js.j AS VARCHAR)),
                    1, {POS_HEX}) AS q
      FROM documents d,
           (SELECT unnest(generate_series(1, {k})) AS j) js
    ),
    succ AS (
      SELECT p.doc_id, p.j, p.q, min(r.pos) AS ppos
      FROM probes p LEFT JOIN ring r ON r.pos >= p.q
      GROUP BY p.doc_id, p.j, p.q
    ),
    wrapped AS (
      SELECT s.doc_id, s.j,
             coalesce(s.ppos, (SELECT min(pos) FROM ring)) AS ppos
      FROM succ s
    )
    SELECT w.doc_id, w.j, r.doc_id AS neg_id,
           (r.doc_id = w.doc_id) AS is_self
    FROM wrapped w JOIN ring r ON r.pos = w.ppos
    """


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epoch: int = 1,
    seed: str = "shuffle",
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global training-order shuffle for one epoch:
    every row gets ``shuffle_pos`` — its 0-based position in the order
    of ``md5(seed:epoch:id)`` — a new pseudo-random permutation per
    epoch, identical under any partitioning, retries, and cluster
    size (no rand(), no monotonically_increasing_id, both of which
    are partitioning-dependent).

    The naive form is ``row_number() OVER (ORDER BY key)`` — an
    empty-partition window that funnels 100 TB through ONE task. Here
    the global ordinal comes from ``distributed_prefix_sum``
    (range-partition by key -> per-partition local window ->
    per-partition totals cascade broadcast back), so every stage is
    distributed and the widest shuffle is the range exchange. The
    DuckDB oracle states the naive global row_number; the prefix-sum
    decomposition is exactly what the value-hash verifies."""
    from commercial_rfp_data_pipeline_spark.operators.ordered import (
        distributed_prefix_sum,
    )

    key = F.md5(
        F.concat(
            F.lit(f"{seed}:{epoch}:"), F.col(id_col).cast("string")
        )
    )
    keyed = df.withColumn("shuffle_key", key)
    out = distributed_prefix_sum(
        keyed,
        values={"one": F.lit(1).cast("long")},
        order_by=[F.col("shuffle_key"), F.col(id_col)],
        n_partitions=n_partitions,
    )
    return out.withColumn("shuffle_pos", F.col("one_before")).drop(
        "one_incl", "one_before"
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    budget: int,
    temperature: float = 2.0,
    id_col: str = "doc_id",
    seed: str = "tmix",
) -> DataFrame:
    """Temperature-based mixture resampling — the standard LLM
    data-mixing move: per group g with n_g rows, the sampling share is
    n_g^(1/T) / sum(n^(1/T)), so T>1 upweights low-resource groups
    relative to proportional sampling (T=1) without ever exceeding
    uniform (T=inf). Takes floor(budget * share) rows per group,
    chosen by md5 rank — deterministic under any partitioning and
    retries, hence oracle-checkable.

    Scale shape: group sizes are one map-side-combining groupBy whose
    result is groups-sized (broadcast); shares round to 6 dp and sum
    as DECIMAL so every engine computes identical targets; the
    per-group take is one hash-ranked window partitioned by group
    (AQE's window-group-limit pushes the rank filter map-side)."""
    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_g"))
    share = F.round(
        F.pow(F.col("n_g").cast("double"), 1.0 / temperature), 6
    ).cast("decimal(20,6)")
    sized = sizes.select(group_col, "n_g", share.alias("w"))
    tot = sized.agg(F.sum("w").alias("w_tot"))
    targets = sized.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_g",
        F.least(
            F.floor(
                F.lit(float(budget))
                * F.col("w").cast("double")
                / F.col("w_tot").cast("double")
            ).cast("long"),
            F.col("n_g"),
        ).alias("n_take"),
    )
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    w_rank = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (
        df.join(F.broadcast(targets), group_col)
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= F.col("n_take"))
        .drop("rn", "n_g")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: str = "wsamp",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES): each row draws key = u^(1/w) from a deterministic
    md5-uniform u in (0, 1], and the sample is the top-k keys —
    inclusion probability proportional to weight, exactly one pass,
    no rejection loop. Deterministic u (no rand()) makes the sample
    reproducible under any partitioning, retries, and speculative
    execution — and therefore oracle-checkable.

    Scale shape: the top-k compiles to TakeOrderedAndProject
    (per-partition partial top-k, driver merges k rows) — the whole
    corpus is scanned once and only k rows ever leave the executors.
    Ranks attach with a window over the ALREADY-LIMITED k rows."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h + 1) / F.lit(float(1 << 60))
    key = F.pow(u, 1.0 / F.col(weight_col))
    top = (
        df.select(id_col, F.col(weight_col).alias("w"), key.alias("_key"))
        .orderBy(F.col("_key").desc(), F.col(id_col))
        .limit(k)
    )
    w_rnk = Window.orderBy(F.col("_key").desc(), F.col(id_col))
    return top.select(
        id_col,
        "w",
        # emit the key ROUNDED (value parity across engines; ordering
        # stays on the full-precision double)
        F.round("_key", 6).alias("sample_key"),
        F.row_number().over(w_rnk).cast("int").alias("rnk"),
    )


def recipe_rebalance(
    df: DataFrame,
    weight_raw,
    group_col: str = "source",
    budget_num: int = 6,
    budget_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "recipe",
) -> DataFrame:
    """Per-source data-recipe rebalancing — DoReMi-style static
    re-weighting: given integer per-source weights (``weight_raw``, a
    Column over ``df``, constant within each group) and a token budget
    ``B = (budget_num * total_tokens) div budget_den``, assign each
    source its integer token allocation ``B_s = (B * w_s) div sum(w)``
    and realize it as ``epochs + partial``: every doc repeats
    ``B_s div T_s`` times (sources whose allocation exceeds their
    supply loop over their data — the LLaMA-style epochs-per-source
    move), plus one extra copy for the md5-rank prefix of docs whose
    cumulative token count fills the remainder ``B_s mod T_s``. All
    arithmetic is INTEGER (div/mod), so the realized mix is exact and
    engine-independent — no float sampling-rate boundary fuzz.

    Output: (id, group, n_tok, n_copies) for docs with n_copies >= 1.
    Realized per-source token share then tracks the target share to
    within one document's tokens (the partial-prefix granularity).

    Shape at scale: group totals are one map-side-combining groupBy
    (groups-sized, broadcast back); the only corpus-wide pass is the
    ranked remainder take, which uses ``distributed_prefix_sum`` over
    (group, md5, id) order — NOT a per-group cumulative window, which
    would funnel a billion-doc source through one task. Weights and
    budget stay int64: safe while budget_num * total_tokens * max(w)
    < 2^63 (~10^18 — a 100-TB corpus is ~10^13 tokens)."""
    from commercial_rfp_data_pipeline_spark.operators.ordered import (
        distributed_prefix_sum,
    )
    from commercial_rfp_data_pipeline_spark.operators.textops import token_count

    d = df.select(
        F.col(id_col),
        F.col(group_col),
        token_count(text_col).alias("n_tok"),
        weight_raw.cast("long").alias("_w"),
    )
    tot = d.groupBy(group_col).agg(
        F.sum("n_tok").alias("_T"), F.max("_w").alias("_w")
    )
    grand = tot.agg(F.sum("_T").alias("_TT"), F.sum("_w").alias("_WT"))
    plan = (
        tot.crossJoin(F.broadcast(grand))
        .select(
            group_col,
            "_T",
            F.expr(
                f"((({budget_num} * _TT) div {budget_den}) * _w) div _WT"
            ).alias("_B"),
        )
        .select(
            group_col,
            F.col("_B").alias("target_tokens"),
            F.expr("_B div _T").alias("_e"),
            F.expr("_B % _T").alias("_r"),
        )
    )
    hk = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    ranked = distributed_prefix_sum(
        d.withColumn("_hk", hk),
        {"tok": F.col("n_tok")},
        [F.col(group_col), F.col("_hk"), F.col(id_col)],
    )
    start = ranked.groupBy(group_col).agg(F.min("tok_before").alias("_s0"))
    out = (
        ranked.join(F.broadcast(start), group_col)
        .join(F.broadcast(plan), group_col)
        .withColumn(
            "n_copies",
            (
                F.col("_e")
                + F.when(
                    F.col("tok_before") - F.col("_s0") < F.col("_r"), 1
                ).otherwise(0)
            ).cast("int"),
        )
    )
    return out.filter(F.col("n_copies") >= 1).select(
        id_col, group_col, "n_tok", "n_copies", "target_tokens"
    )
