"""Global-order primitives: the distributed prefix sum.

A cumulative aggregate over a GLOBAL ordering is the canonical
"accidentally single-node" Spark trap: a window with no partitionBy
funnels the whole table through one partition. The scalable form
(`textops.assign_token_shards` introduced it for shard packing; this
is the generalized operator):

1. range-exchange on the order columns (sampled bounds — parallel,
   deterministic output regardless of where the bounds fall);
2. per-partition cumulative window (partitionBy spark_partition_id);
3. per-partition totals — n_partitions rows — cumulated by the ONLY
   single-partition window, over that metadata-sized table;
4. offsets broadcast back and added.

Supports multiple simultaneous values (e.g. a measure and a literal 1
for ranks) in one pass — each extra value is one more column through
the same exchange, not a second scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_prefix_sum(
    df: DataFrame,
    values: dict[str, Column],
    order_by: list[Column],
    n_partitions: int | None = None,
) -> DataFrame:
    """``df`` plus, for every ``values`` entry ``name``: ``{name}_incl``
    (inclusive prefix sum in ``order_by`` order) and ``{name}_before``
    (exclusive). ``order_by`` must be a TOTAL order (thread a unique
    tie-break column) or results are partition-dependent."""
    sc = df.sparkSession.sparkContext
    nparts = n_partitions or max(2, sc.defaultParallelism)
    val_names = list(values)
    with_vals = df
    for name, col in values.items():
        with_vals = with_vals.withColumn(f"_v_{name}", col)
    parts = with_vals.repartitionByRange(nparts, *order_by).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*order_by)
    local = parts
    for name in val_names:
        local = local.withColumn(
            f"_cl_{name}", F.sum(f"_v_{name}").over(w)
        )
    totals = local.groupBy("_pid").agg(
        *[F.max(f"_cl_{name}").alias(f"_t_{name}") for name in val_names]
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid",
        *[
            F.coalesce(F.sum(f"_t_{name}").over(w_off), F.lit(0)).alias(
                f"_o_{name}"
            )
            for name in val_names
        ],
    )
    out = local.join(F.broadcast(offsets), "_pid")
    for name in val_names:
        out = out.withColumn(
            f"{name}_incl", F.col(f"_cl_{name}") + F.col(f"_o_{name}")
        ).withColumn(
            f"{name}_before", F.col(f"{name}_incl") - F.col(f"_v_{name}")
        )
    drop = (
        ["_pid"]
        + [f"_v_{n}" for n in val_names]
        + [f"_cl_{n}" for n in val_names]
        + [f"_o_{n}" for n in val_names]
    )
    return out.drop(*drop)
