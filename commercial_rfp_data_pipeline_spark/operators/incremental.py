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
