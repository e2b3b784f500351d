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


_AGG_FN = {"sum": F.sum, "min": F.min, "max": F.max}
_COMBINE = {
    "sum": lambda a, b: F.coalesce(a, F.lit(0)) + b,
    "min": lambda a, b: F.least(F.coalesce(a, b), b),
    "max": lambda a, b: F.greatest(F.coalesce(a, b), b),
}


def distributed_prefix_agg(
    df: DataFrame,
    values: dict[str, tuple[Column, str]],
    order_by: list[Column],
    n_partitions: int | None = None,
) -> DataFrame:
    """``df`` plus, for every ``values`` entry ``name: (col, agg)``
    with agg in {sum, min, max}: ``{name}_incl`` (inclusive running
    aggregate in ``order_by`` order) and ``{name}_before`` (exclusive;
    0 for sums, NULL for min/max when no prior row exists — matching
    what a ROWS UNBOUNDED PRECEDING..-1 window yields). ``order_by``
    must be a TOTAL order (thread a unique tie-break column) or
    results are partition-dependent.

    Shape: range-exchange on the order columns, per-partition running
    windows (partitionBy spark_partition_id), per-partition totals —
    n_partitions rows — combined by the ONLY single-partition window
    over that metadata-sized table, offsets broadcast back. min/max
    are associative, so they ride the identical cascade as sum."""
    sc = df.sparkSession.sparkContext
    nparts = n_partitions or max(2, sc.defaultParallelism)
    val_names = list(values)
    with_vals = df
    for name, (col, _) in values.items():
        with_vals = with_vals.withColumn(f"_v_{name}", col)
    parts = with_vals.repartitionByRange(nparts, *order_by).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_incl = Window.partitionBy("_pid").orderBy(*order_by)
    w_excl = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = parts
    for name, (_, agg) in values.items():
        fn = _AGG_FN[agg]
        local = local.withColumn(
            f"_ci_{name}", fn(f"_v_{name}").over(w_incl)
        ).withColumn(f"_ce_{name}", fn(f"_v_{name}").over(w_excl))
    totals = local.groupBy("_pid").agg(
        *[
            _AGG_FN[agg](f"_v_{name}").alias(f"_t_{name}")
            for name, (_, agg) in values.items()
        ]
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid",
        *[
            _AGG_FN[agg](f"_t_{name}").over(w_off).alias(f"_o_{name}")
            for name, (_, agg) in values.items()
        ],
    )
    out = local.join(F.broadcast(offsets), "_pid")
    for name, (_, agg) in values.items():
        if agg == "sum":
            incl = F.coalesce(F.col(f"_o_{name}"), F.lit(0)) + F.col(
                f"_ci_{name}"
            )
            excl = incl - F.col(f"_v_{name}")
        else:
            comb = _COMBINE[agg]
            incl = comb(F.col(f"_o_{name}"), F.col(f"_ci_{name}"))
            # exclusive: prior-partition offset combined with the
            # local exclusive aggregate; NULL when neither exists
            excl = F.when(
                F.col(f"_ce_{name}").isNull(), F.col(f"_o_{name}")
            ).otherwise(comb(F.col(f"_o_{name}"), F.col(f"_ce_{name}")))
        out = out.withColumn(f"{name}_incl", incl).withColumn(
            f"{name}_before", excl
        )
    drop = (
        ["_pid"]
        + [f"_v_{n}" for n in val_names]
        + [f"_ci_{n}" for n in val_names]
        + [f"_ce_{n}" for n in val_names]
        + [f"_o_{n}" for n in val_names]
    )
    return out.drop(*drop)


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
    return distributed_prefix_agg(
        df,
        {name: (col, "sum") for name, col in values.items()},
        order_by,
        n_partitions,
    )


def holt_linear(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Per-series Holt linear (level + trend) exponential smoothing —
    the inherently SEQUENTIAL per-group recursion class:

        l_t = r6(alpha*y_t + (1-alpha)*(l_{t-1} + b_{t-1}))
        b_t = r6(beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1})

    where r6 = floor(x*1e6 + 0.5)/1e6 (half-up, stated identically in
    the oracle — Python round() is banker's, DuckDB round() is
    half-away-from-zero, so neither builtin is shared; the floor form
    is). Each step rounds BEFORE feeding the next, pinning the whole
    trajectory to exact doubles both engines reproduce.

    This is the one operator class where ``applyInPandas`` is the
    honest answer rather than a fallback: the recursion's dependency
    chain IS the series order, so no window/aggregate decomposition
    exists (contrast EWMA, whose closed form is a decay-weighted sum).
    Shape at scale: one shuffle on the series key; each task walks its
    own series sequentially in Arrow batches — thousands of series
    fit one stage, and a 100-TB metric store is wide (many series),
    not deep.

    Output: key_cols + (i, y, level, trend) per step, i 1-based in
    series order."""
    import math

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    def fit(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        out = []
        level = trend = None
        for i, y in enumerate(pdf[value_col].astype(float), start=1):
            if level is None:
                level, trend = r6(y), 0.0
            else:
                prev = level
                level = r6(alpha * y + (1 - alpha) * (level + trend))
                trend = r6(beta * (level - prev) + (1 - beta) * trend)
            out.append((i, float(y), level, trend))
        keys = {k: pdf[k].iloc[0] for k in key_cols}
        return pd.DataFrame(
            [{**keys, "i": i, "y": y, "level": l, "trend": b} for i, y, l, b in out]
        )

    key_schema = ", ".join(
        f"{k} {dict(df.dtypes)[k]}" for k in key_cols
    )
    return df.groupBy(*key_cols).applyInPandas(
        fit, schema=f"{key_schema}, i long, y double, level double, trend double"
    )


def isotonic_fit(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Per-series isotonic (non-decreasing L2) regression via
    pool-adjacent-violators — the calibration-curve fitter. Same
    inherently-sequential class as ``holt_linear``: the pooling
    dependency chain IS the series order, so ``applyInPandas`` per
    series is the honest shape (one shuffle on the key; a 100-TB
    metric store is wide, not deep).

    Cross-engine contract: block means are computed as prefix-sum
    differences ``(S_k - S_{j-1}) / (k-j+1)`` with a SEQUENTIAL float
    prefix sum — the identical operation order the oracle's cumulative
    window uses — and the oracle restates the fit through the minimax
    identity ŷ_i = max_{j<=i} min_{k>=i} mean(y_j..y_k), which equals
    the PAVA solution exactly; both engines round the fit to 6 dp.

    Output: key_cols + (i, y, y_iso), i 1-based in series order."""

    def fit(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        ys = [float(v) for v in pdf[value_col]]
        ps = [0.0]
        for v in ys:
            ps.append(ps[-1] + v)

        def mean(j, k):  # 0-based inclusive
            return (ps[k + 1] - ps[j]) / (k - j + 1)

        # blocks as (start, end) index ranges; merge while decreasing
        blocks: list[tuple[int, int]] = []
        for i in range(len(ys)):
            blocks.append((i, i))
            while len(blocks) > 1:
                (j1, k1), (j2, k2) = blocks[-2], blocks[-1]
                if mean(j1, k1) > mean(j2, k2):
                    blocks[-2:] = [(j1, k2)]
                else:
                    break
        fit_vals = [0.0] * len(ys)
        for j, k in blocks:
            m = mean(j, k)
            for i in range(j, k + 1):
                fit_vals[i] = m
        keys = {c: pdf[c].iloc[0] for c in key_cols}
        import math

        return pd.DataFrame(
            [
                {
                    **keys,
                    "i": i + 1,
                    "y": ys[i],
                    "y_iso": math.floor(fit_vals[i] * 1e6 + 0.5) / 1e6,
                }
                for i in range(len(ys))
            ]
        )

    key_schema = ", ".join(f"{k} {dict(df.dtypes)[k]}" for k in key_cols)
    return df.groupBy(*key_cols).applyInPandas(
        fit, schema=f"{key_schema}, i long, y double, y_iso double"
    )
