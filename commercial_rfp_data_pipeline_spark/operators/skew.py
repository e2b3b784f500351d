"""Skew mitigation primitives (SURVEY.md §7 phase 5 scale hygiene).

The reference's hot key is `question` (boilerplate questions recur
across thousands of RFPs); at 100 TB a single hot key turns one
reducer into the job's critical path. Two standing mitigations:

- AQE skew-join splitting is ON session-wide (session.py) — runtime
  re-planning for joins.
- For aggregations, `salted_two_phase_agg` below: decomposable
  aggregates (count/sum/min/max) compute per (key, salt) first — the
  hot key's rows spread over ``n_salts`` reducers — then combine
  per key. Result is EXACTLY the plain groupBy (oracle-checkable);
  only the shuffle layout changes.

Salt must be deterministic (no rand(): retries/speculative tasks would
double-count): hash of a high-cardinality sibling column mod n_salts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_two_phase_agg(
    df: DataFrame,
    keys: list[str],
    salt_src: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {count, sum, min, max} (decomposable: combine fn of partials is
    sum for count/sum, min for min, max for max).

    Phase 1 groups by (keys + salt) — the hot key fans out over
    ``n_salts`` reducers; phase 2 groups by keys alone over the tiny
    partial table. Same two-shuffle cost Catalyst's partial/final
    aggregation already gives for simple aggregates, but effective
    even when the planner's partial aggregation is defeated (e.g.
    distinct-heavy plans) — and the pattern generalizes to any
    algebraic aggregate."""
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).alias("__salt")
    phase1 = [
        (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(F.col(src))).alias(out)
        for out, (src, fn) in aggs.items()
    ]
    combine = {
        "count": F.sum,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }
    phase2 = [
        combine[fn](F.col(out)).alias(out) for out, (_, fn) in aggs.items()
    ]
    partial = df.groupBy(*keys, salt).agg(*phase1)
    return partial.groupBy(*keys).agg(*phase2)


def salted_distinct_count(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Skew-safe COUNT(DISTINCT x) per key: salt by a hash OF THE
    DISTINCT COLUMN ITSELF, so the salt classes partition the value
    space — equal values always land in the same (key, salt) group,
    making the per-salt distinct counts disjoint and their SUM the
    exact global distinct count. The hot key's distinct-set
    construction spreads over ``n_salts`` reducers instead of one;
    phase 2 sums ``n_salts`` small integers per key.

    This is the aggregate where salting matters most: unlike
    count/sum/min/max, a naive distinct (collect_set or a set-building
    reducer) cannot partially combine away the hot key's payload — the
    single reducer must materialize the whole value set."""
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts)).alias("__salt")
    partial = df.groupBy(*keys, salt).agg(
        F.count_distinct(F.col(distinct_col)).alias("__part")
    )
    return partial.groupBy(*keys).agg(F.sum("__part").alias(out_col))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the fact side gets a deterministic salt
    (hash of a high-cardinality sibling column mod ``n_salts``) and the
    dim side is replicated ``n_salts`` times via a posexplode'd salt
    array, so the join key becomes (key, salt) and a hot key's rows
    spread over ``n_salts`` reducers instead of one. Results are
    EXACTLY the plain join (oracle-checkable) — only the shuffle layout
    changes.

    Use when the skewed side is too large to broadcast AND AQE's
    runtime skew splitting isn't available (e.g. the join feeds a
    co-partitioned downstream op that pins the exchange). Replication
    multiplies the dim shuffle by n_salts — size n_salts to the hot
    key's fanout, not higher.

    Only fact-preserving join types are allowed: the dim side is
    replicated ``n_salts`` times, so right/full outer joins would emit
    each unmatched dim row once PER SALT REPLICA — not the plain-join
    result. Rather than silently return wrong rows, reject those."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not equivalence-preserving under "
            f"dim replication (unmatched dim rows would appear n_salts "
            f"times); use one of {sorted(allowed)}"
        )
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
    f = fact.withColumn("__salt", salt.cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = f.join(d, [key, "__salt"], how)
    return out.drop("__salt")
