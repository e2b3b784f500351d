"""Deterministic dedup / argmax / keep-latest family (SURVEY.md §2.6).

pandas dedup survivors are positional (keep='first'/'last' by source
order; ``idxmax`` returns the first max). Spark has no implicit row
order, so every operator here takes an explicit ``order_by`` /
``ordinal`` and is deterministic under any partitioning — verified by
repartition-invariance tests (SURVEY.md §2.12.2).

Scale notes: all of these are single-shuffle window operators — one
hash exchange on the partition keys, then a per-partition sort. When
several of them share the same keys (the flagship chain partitions by
``question`` three times), Catalyst reuses the exchange. Skewed keys
(one question duplicated millions of times) are handled by AQE skew
splitting for the join forms; the window forms bound per-key work at
O(rows-per-key log rows-per-key) sort cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordered_window(keys: list[str], order_by: list[Column]) -> Window:
    return Window.partitionBy(*keys).orderBy(*order_by)


def dedup(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """A6/A9 deterministic form: one survivor per key group, chosen by
    ``order_by`` (ascending ordinal == pandas keep='first';
    descending == keep='last'). Replaces nondeterministic
    ``dropDuplicates``."""
    w = _ordered_window(keys, order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_keep_first(df: DataFrame, keys: list[str], ordinal: str = "ord") -> DataFrame:
    """pandas ``drop_duplicates(keep='first')`` (raw:251) with the
    ingest ordinal standing in for source order."""
    return dedup(df, keys, [F.col(ordinal).asc()])


def dedup_keep_last(df: DataFrame, keys: list[str], ordinal: str = "ord") -> DataFrame:
    """A7: ``keep='last'`` (citation:207; 1/raw:183-189)."""
    return dedup(df, keys, [F.col(ordinal).desc()])


def argmax_per_key(
    df: DataFrame, keys: list[str], value: str, tiebreak: str = "ord"
) -> DataFrame:
    """A5: keep the full row attaining the per-key max of ``value``;
    FIRST max wins on ties (pandas ``idxmax``, raw:270-276) — hence the
    ascending positional tiebreak."""
    return dedup(df, keys, [F.col(value).desc(), F.col(tiebreak).asc()])


def keep_latest_per_key(
    df: DataFrame, keys: list[str], date_col: str = "date", tiebreak: str = "ord"
) -> DataFrame:
    """J1 *intent* semantics: per-key keep-latest (the reusable engine
    primitive; SURVEY.md §2.12.1)."""
    return dedup(df, keys, [F.col(date_col).desc(), F.col(tiebreak).asc()])


def keep_latest_global_date_semantics(
    df: DataFrame, key: str = "question", date_col: str = "date"
) -> DataFrame:
    """J1 *literal* semantics (raw:257-268): keep a row iff its date is
    in the GLOBAL set of per-duplicated-key max dates, OR its key is not
    duplicated. A non-max row of key K1 survives if some other key's max
    date collides with its date. This is what the reference computes —
    preserved bug-for-bug; ``keep_latest_per_key`` is the intent form.

    Implementation: one count window + one max-aggregate + a broadcast
    left join against the (tiny) distinct max-date set — no row
    explosion, no reliance on row identity.
    """
    w = Window.partitionBy(key)
    flagged = df.withColumn("__dup", F.count(F.lit(1)).over(w) > 1)
    max_dates = (
        flagged.filter(F.col("__dup"))
        .groupBy(key)
        .agg(F.max(date_col).alias("__max_date"))
        .select(F.col("__max_date").alias(date_col))
        .distinct()
        .withColumn("__in_max", F.lit(True))
    )
    kept = (
        flagged.join(F.broadcast(max_dates), on=date_col, how="left")
        .filter(~F.col("__dup") | F.coalesce(F.col("__in_max"), F.lit(False)))
        .drop("__dup", "__in_max")
    )
    # restore caller column order (join moved date_col first)
    return kept.select(*df.columns)


def duplicate_audit(df: DataFrame, keys: list[str]) -> DataFrame:
    """A8: offending key groups with multiplicities (citation:196-204;
    raw:260)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def group_count_having(
    df: DataFrame, keys: list[str], min_count: int = 2
) -> DataFrame:
    """A1+A2: group sizes with a HAVING filter (raw:245-247)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )


def dup_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 64,
    check_every: int = 2,
    n_jumps: int = 2,
) -> DataFrame:
    """Duplicate-cluster formation: connected components over near-dup
    pairs via iterative hash-min label propagation — every node ends
    with cluster_id = min(id) of its component; singletons keep their
    own id. The step a training-data dedup pipeline runs AFTER pair
    generation (minhash/simhash/embedding) to pick one survivor per
    duplicate cluster.

    ``max_iter`` is a safety cap, not a cost: the loop exits on the
    first converged round, and path-halving bounds rounds by
    O(log diameter) — 64 covers any graph that fits in an exabyte.
    (25 proved too low for sf0.1's fuzzy-name chains — consecutive
    customer numbers are all lev-1 neighbors, so one component spans
    thousands of nodes.)

    Shape at scale: edges and labels are (id, id) pairs only — no
    payloads move — and the iteration runs over the EDGE-INVOLVED
    subgraph only (singletons, the vast majority of a near-dup corpus,
    are stitched back by one final left join). Each iteration is one
    join + one groupBy(min) shuffle; the loop is bounded by component
    DIAMETER (not size), and
    near-dup clusters are shallow in practice. Every round
    ``localCheckpoint``s the new label table — persist alone does NOT
    reliably stop iterative lineage growth (cache substitution can
    miss, and each miss recomputes the whole chain, compounding
    per round); checkpointing truncates the plan outright, which is
    exactly GraphFrames' connected-components discipline (production
    clusters use a reliable checkpoint dir instead of local). Labels
    move only downward, so sum(lbl) is the fixpoint signal. This is
    the documented exception to the no-driver-loop rule: a fixpoint
    iteration whose trip count is a data property."""
    # checkpoint the pair pipeline BEFORE symmetrizing: union(pairs,
    # swap(pairs)) evaluates the upstream candidate generation (simhash
    # + band join + hamming filter, ~5s at sf0.1) TWICE if the union is
    # what materializes — symmetrize from the checkpointed table instead
    p = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).localCheckpoint()
    # small-graph fast path (round 10): every distributed fixpoint
    # round costs one join + one groupBy + jump joins of JOB OVERHEAD
    # (~0.3-1.6 s each on this VM) regardless of data size, so a
    # near-dup graph with a few thousand verified pairs pays seconds
    # for microseconds of actual work. When the VERIFIED edge set is
    # bounded (count on the already-checkpointed pair table — one cheap
    # job), union-find it driver-side and broadcast the labels back:
    # the same documented bounded-collect discipline as the centroid /
    # frontier / manifest collects, gated by SPARK_GRAFT_CC_LOCAL_EDGES
    # (default 100k pairs ≈ 1.6 MB — far under any driver limit). At
    # 100 TB a banded near-dup graph can exceed the gate, and the
    # distributed loop below remains the scale path; both paths are
    # equality-tested and every CC consumer is oracle-checked.
    import os as _os

    local_gate = int(
        _os.environ.get("SPARK_GRAFT_CC_LOCAL_EDGES", "100000")
    )
    n_pairs = p.count()
    if n_pairs <= local_gate:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in p.collect():
            ra, rb = find(r.src), find(r.dst)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        labels_local = [(k, find(k)) for k in parent]
        dup_clusters.last_rounds = 0  # diagnostic: fast path taken
        if labels_local:
            spark = nodes.sparkSession
            mapping = spark.createDataFrame(
                labels_local, schema=f"id {nodes.schema[id_col].dataType.simpleString()}, lbl {nodes.schema[id_col].dataType.simpleString()}"
            )
        else:
            mapping = None
        out = nodes.select(F.col(id_col).alias("id"))
        if mapping is not None:
            out = out.join(F.broadcast(mapping), "id", "left")
        else:
            # VERDICT r10 #7: the null label must carry the id
            # column's OWN type — a hardcoded long under a STRING id
            # graph makes the coalesce below a type-resolution hazard
            # under ANSI
            out = out.withColumn(
                "lbl", F.lit(None).cast(nodes.schema[id_col].dataType)
            )
        return out.select(
            F.col("id").alias(id_col),
            F.coalesce("lbl", "id").alias("cluster_id"),
        )
    edges = p.unionByName(
        p.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    # iterate ONLY over nodes that appear in some edge: singletons can
    # never change label, and in a near-dup corpus they are the vast
    # majority — every per-round join/groupBy then shuffles the (small)
    # duplicate-involved subgraph, not the whole corpus. Singletons are
    # stitched back with one left join + coalesce at the end.
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint()
    )
    # sentinel (not None): an EMPTY edge set sums to null every round,
    # and ``prev is not None`` would then never let the fixpoint check
    # fire — 25 wasted rounds and a spurious non-convergence warning
    prev_sum: object = object()
    converged = False
    rounds_run = 0
    for it in range(max_iter):
        prop = edges.join(
            labels.withColumnRenamed("id", "src"), "src"
        ).select(F.col("dst").alias("id"), "lbl")
        combined = (
            labels.unionByName(prop).groupBy("id").agg(F.min("lbl").alias("lbl"))
        )
        # path-halving (pointer jumping): also adopt the label OF the
        # label — lbl(lbl(id)) <= lbl(id) — turning O(diameter) rounds
        # into O(log diameter) on chain-shaped components. Applying the
        # jump ``n_jumps`` times per round compounds the shortcut
        # (each application squares the pointer distance) for the cost
        # of one extra small self-join on the label table: measured
        # 8 -> 6 rounds and ~1.4x on the sf0.1 simhash clusters at
        # n_jumps=2; a third jump bought nothing
        lab = combined
        for _ in range(max(1, n_jumps)):
            jump = lab.select(
                F.col("id").alias("lbl"), F.col("lbl").alias("lbl2")
            )
            lab = lab.join(jump, "lbl", "left").select(
                "id", F.coalesce("lbl2", "lbl").alias("lbl")
            )
        # lazy checkpoint: the convergence aggregate below is the
        # materializing action for the rounds it covers
        labels = lab.localCheckpoint(eager=False)
        rounds_run = it + 1
        # batch the fixpoint probe: labels only ever DECREASE, so
        # sum(k) == sum(k - check_every) iff NO label moved in any of
        # the intervening rounds — checking every round spends one
        # driver action (job-launch barrier + full lineage
        # materialization) per round for information worth at most one
        # saved round of work. Probing every ``check_every`` rounds
        # halves the action count; the price is at most
        # (check_every - 1) no-op rounds folded into the final probe's
        # lineage. Measured at sf0.1: ~1.7x on the 28-round
        # entity-resolution fixpoint, neutral on shallow (8-round)
        # simhash clusters.
        if (it + 1) % check_every and (it + 1) < max_iter:
            continue
        cur_sum = labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0].s
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    dup_clusters.last_rounds = rounds_run  # diagnostic, tested
    if not converged:
        # unconverged labels are indistinguishable from correct clusters
        # (components silently split) — make the truncation loud
        import warnings

        warnings.warn(
            f"dup_clusters: label propagation did not reach a fixpoint "
            f"within max_iter={max_iter} rounds; components may be "
            f"split — raise max_iter (bound is O(log diameter))",
            RuntimeWarning,
            stacklevel=2,
        )
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(labels, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("lbl", "id").alias("cluster_id"),
        )
    )


def cluster_survivors(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Pick ONE canonical document per duplicate cluster — the step a
    training-data dedup pipeline runs after ``dup_clusters``: join the
    (id, cluster_id) labels to per-document scores, keep the
    highest-scoring member (ties broken by ascending id so the choice
    is deterministic), and report the cluster size. The surviving id
    set IS the deduplicated corpus; anti-join the originals against it
    to materialize the dropped rows.

    Shape at scale: one equi-join on id (both sides one row per doc),
    one window shuffle on cluster_id for the argmax, one groupBy on
    cluster_id for sizes — Catalyst reuses the cluster_id exchange
    between the window and the count. Nothing is driver-resident."""
    member = clusters.join(scores.select(id_col, score_col), id_col)
    survivors = argmax_per_key(
        member, ["cluster_id"], score_col, tiebreak=id_col
    )
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return survivors.join(sizes, "cluster_id").select(
        "cluster_id", id_col, score_col, "n_members"
    )
