"""Incremental materialized-view maintenance over retractable
aggregates.

A 100-TB rollup is never recomputed from scratch on every ingest tick:
the view keeps per-group PARTIAL STATE (count, sum — the aggregates
closed under merge AND retraction), and each CDC batch of inserts
(op=+1) / deletes (op=-1) folds in as one delta aggregation + one
merge — cost proportional to the DELTA, while the base is touched
exactly once when the state is first built.

Correctness law the oracle value-checks: for retractable aggregates,
``agg(base - deletes + inserts) == merge(state(base), state(deltas))``
with groups whose live count drops to 0 removed. min/max are NOT
retractable (a deleted max needs a rescan) — this module deliberately
excludes them; avg derives from (sum, count) at read time, which is
why the state carries those two and not the quotient.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def view_state(
    df: DataFrame, keys: list[str], val: Column, op: Column | None = None
) -> DataFrame:
    """Per-group retractable state (cnt, total) of ``val``; ``op`` is
    the CDC multiplicity (+1 insert / -1 delete, default +1). One
    map-side-combining groupBy — the only scan the base ever pays."""
    o = op if op is not None else F.lit(1)
    return df.groupBy(*keys).agg(
        F.sum(o).alias("cnt"),
        F.sum(val * o).alias("total"),
    )


def merge_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold partial states: union + re-aggregate (the combiner law —
    sums of sums). Groups retracted to cnt=0 disappear from the view."""
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return (
        u.groupBy(*keys)
        .agg(F.sum("cnt").alias("cnt"), F.sum("total").alias("total"))
        .filter(F.col("cnt") > 0)
    )


def merkle_diff(
    v1: DataFrame,
    v2: DataFrame,
    key_col: str,
    cols: list[str],
    n_buckets: int = 256,
) -> DataFrame:
    """Reconcile two table versions WITHOUT a full row-level compare:
    hash rows into buckets, compare per-bucket digests (xor + sum +
    count of row hashes — order-independent and retraction-sensitive),
    and run the expensive row-level full-outer diff ONLY inside
    buckets whose digests disagree. Identical buckets — the vast
    majority between consecutive replica syncs — are skipped entirely.

    At 100 TB this is the anti-entropy pattern (Dynamo/Cassandra
    Merkle trees, flattened to one level): the digest table is
    n_buckets rows per side, and the data-sized join touches only
    changed buckets. Digest internals never cross engines (the oracle
    states the direct full diff), so the cheap JVM xxhash64 is the
    right hash; a digest collision on a changed bucket is ~2^-64 and
    would surface as an oracle mismatch.

    Returns (key, change) with change in {updated, deleted,
    inserted} — deleted/inserted are relative to v1 -> v2."""
    def digested(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(key_col).alias("k"),
            F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).alias("b"),
            F.xxhash64(F.col(key_col), *[F.col(c) for c in cols]).alias("h"),
        )

    d1, d2 = digested(v1), digested(v2)

    def bucket_digests(d: DataFrame, tag: str) -> DataFrame:
        # the sum digest accumulates 64-bit hashes: DECIMAL(38,0)
        # keeps it exact AND overflow-free under the driver's ANSI
        # session (a long sum raises ARITHMETIC_OVERFLOW there)
        return d.groupBy("b").agg(
            F.bit_xor("h").alias(f"x_{tag}"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias(f"s_{tag}"),
            F.count(F.lit(1)).alias(f"n_{tag}"),
        )

    changed = (
        bucket_digests(d1, "1")
        .join(bucket_digests(d2, "2"), "b", "full_outer")
        .filter(
            ~(
                F.col("x_1").eqNullSafe(F.col("x_2"))
                & F.col("s_1").eqNullSafe(F.col("s_2"))
                & F.col("n_1").eqNullSafe(F.col("n_2"))
            )
        )
        .select("b")
    )
    r1 = d1.join(F.broadcast(changed), "b", "left_semi")
    r2 = d2.join(F.broadcast(changed), "b", "left_semi")
    j = r1.withColumnRenamed("h", "h1").join(
        r2.withColumnRenamed("h", "h2").drop("b"), "k", "full_outer"
    )
    return (
        j.select(
            F.col("k").alias(key_col),
            F.when(F.col("h2").isNull(), F.lit("deleted"))
            .when(F.col("h1").isNull(), F.lit("inserted"))
            .when(F.col("h1") != F.col("h2"), F.lit("updated"))
            .alias("change"),
        )
        .filter(F.col("change").isNotNull())
    )


def merge_apply(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    upsert_op: str = "U",
    delete_op: str = "D",
    validate: bool = False,
) -> DataFrame:
    """MERGE INTO semantics on plain DataFrames: apply a keyed
    changeset of upserts (insert-or-update, full-row payload) and
    deletes to a snapshot, producing the next snapshot — the lakehouse
    write primitive (Delta/Iceberg MERGE) expressed as its relational
    core. WHEN MATCHED AND op = delete THEN DELETE / WHEN MATCHED THEN
    UPDATE / WHEN NOT MATCHED AND op = upsert THEN INSERT, with
    upsert-wins-over-base on key collision.

    A duplicate key WITHIN the changeset is caller error (real MERGE
    raises on multiple matches); this keeps last-write-wins out of the
    operator and the semantics deterministic. ``validate=True`` enforces
    it eagerly — one extra count-distinct aggregation over the (small)
    changeset, raising before anything is written, exactly the
    [DELTA_MULTIPLE_SOURCE_ROW_MATCHING...] contract. Off by default
    because the changeset is often produced by a keyed groupBy and
    provably unique already.

    Scale: ONE left-anti join of the base against the changeset keys
    (shuffle on key; bucket both sides by key — io.save_bucketed — and
    it runs Exchange-free) plus a union with the upsert payloads; cost
    is O(base + changes) with no wide aggregation. This is exactly the
    shape a transaction log compacts to on read, minus the log."""
    if validate:
        dup = (
            changes.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"merge_apply: changeset has multiple rows for key "
                f"{tuple(dup[0][k] for k in keys)!r}; MERGE semantics "
                f"require at most one change per key"
            )
    tombstones = changes.select(*keys).distinct()
    upserts = changes.filter(F.col(op_col) == upsert_op).drop(op_col)
    kept = base.join(tombstones, keys, "left_anti")
    return kept.unionByName(upserts)
