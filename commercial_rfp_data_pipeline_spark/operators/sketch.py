"""Deterministic, oracle-checkable sketches: HyperLogLog distinct
estimation and count-min-sketch frequency estimation.

Spark's built-in sketches (``approx_count_distinct`` HLL++,
``count_min_sketch``) are correct for production but their register
values are engine-internal, so the driver can only rows-check them.
These hand-rolled variants use md5-derived hashes expressed as PURE
STRING operations (hex prefixes as bucket ids, leading-zero-bit counts
read off hex digits) so the IDENTICAL register states and estimates
reproduce in any SQL engine — upgrading sketch queries from rows-only
to full value-hash checks, while keeping the exact shuffle shape a
production sketch has (one map-side-combining groupBy per sketch; the
register table is O(groups x m), never O(rows)).

Reference parity: the reference has no sketch surface; this extends
§2.6's aggregate family the way a 100-TB corpus requires (exact
distinct on a hot column is a full shuffle of every value; the HLL
register table is 256 rows per group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# HLL with p=8 -> m=256 registers addressed by the first two hex chars
# of md5(value); the next 6 hex chars (24 bits) feed the rank (leading
# zeros + 1), so ranks lie in 1..25.
_M = 256
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)

# leading zero BITS contributed by the first non-zero hex digit
_EXTRA = {
    "1": 3, "2": 2, "3": 2,
    "4": 1, "5": 1, "6": 1, "7": 1,
}


def _rho_from_hex(h6: Column) -> Column:
    """Rank (leading-zero bits + 1) of a 6-hex-char (24-bit) string,
    computed without any hex->integer conversion: 4 bits per leading
    '0' char, plus a per-digit lookup for the first non-zero char."""
    stripped = F.regexp_replace(h6, "^0+", "")
    lead_chars = F.length(h6) - F.length(stripped)
    first = F.substring(stripped, 1, 1)
    extra = first
    expr = F.lit(0)
    for d, bits in _EXTRA.items():
        expr = F.when(first == d, bits).otherwise(expr)
    return (
        F.when(F.length(stripped) == 0, F.lit(25))
        .otherwise(lead_chars * 4 + expr + 1)
        .alias("rho")
    )


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group HLL register table: (group..., bucket, r) where bucket
    is the 2-hex-char register address and r = max rank observed.

    ONE groupBy with map-side combine (max) — duplicate values collapse
    locally, so the shuffle carries at most groups x 256 rows."""
    h = F.md5(F.col(value_col).cast("string"))
    rows = df.select(
        *group_cols,
        F.substring(h, 1, 2).alias("bucket"),
        _rho_from_hex(F.substring(h, 3, 6)),
    )
    return rows.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("r"))


def hll_estimate_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Estimate from an existing register table (bucket, r) — the
    MERGE-side half of HLL: register tables from different partitions,
    days, or machines combine by per-bucket max and this turns the
    merged registers into the estimate. Exposed separately so rolling /
    incremental distinct counts can reuse persisted registers instead
    of rescanning raw data."""
    return (
        regs.groupBy(*group_cols)
        .agg(
            F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("_inv"),
            F.count(F.lit(1)).alias("_nb"),
        )
        .select(
            *group_cols,
            F.round(
                F.lit(_ALPHA * _M * _M)
                / (F.col("_inv") + (F.lit(_M) - F.col("_nb"))),
                3,
            ).alias("hll_estimate"),
        )
    )


def hll_estimate(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group raw HLL estimate alpha*m^2 / (sum 2^-r + zero
    registers), rounded to 3 decimals. The 2^-r terms and the register
    count are exactly representable doubles, so the sum is exact and
    order-independent — bit-identical across engines. (The small-range
    linear-counting correction is deliberately omitted: it needs ln(),
    whose last-ulp behavior is libm-specific; the raw estimate is the
    oracle-stable choice and the bias at n >> m is negligible.)"""
    return hll_estimate_registers(
        hll_registers(df, value_col, group_cols), group_cols
    )


def hll_oracle_sql(
    source_sql: str, value_sql: str, group_sql: list[str]
) -> str:
    """DuckDB restatement of hll_estimate over ``source_sql`` (a
    FROM-able relation), hashing ``value_sql``."""
    groups = ", ".join(group_sql)
    gsel = f"{groups}, " if groups else ""
    gby = f"GROUP BY {groups}" if groups else ""
    gby_b = f"{groups}, bucket" if groups else "bucket"
    extra_cases = " ".join(
        f"WHEN '{d}' THEN {b}" for d, b in _EXTRA.items()
    )
    return f"""
    WITH hashed AS (
      SELECT {gsel} substr(h, 1, 2) AS bucket,
             CASE WHEN length(regexp_replace(substr(h, 3, 6), '^0+', '', 'g')) = 0
                  THEN 25
                  ELSE (6 - length(regexp_replace(substr(h, 3, 6), '^0+', '', 'g'))) * 4
                       + CASE substr(regexp_replace(substr(h, 3, 6), '^0+', '', 'g'), 1, 1)
                           {extra_cases} ELSE 0 END
                       + 1
             END AS rho
      FROM (SELECT {gsel} md5(CAST({value_sql} AS VARCHAR)) AS h
            FROM {source_sql})
    ),
    regs AS (
      SELECT {gsel} bucket, max(rho) AS r
      FROM hashed GROUP BY {gby_b}
    )
    SELECT {gsel}
           round({_ALPHA * _M * _M!r} / (sum(power(2.0, -r)) + ({_M} - count(*))), 3)
             AS hll_estimate
    FROM regs {gby}
    """


# count-min sketch: d=4 rows, w=256 columns addressed by 2 hex chars of
# md5(row_seed || ':' || value). Estimate = min over rows of the
# addressed counter. Deterministic given the value set.
_CMS_D = 4
_CMS_SEEDS = tuple(f"cms{j}" for j in range(_CMS_D))


def cms_counters(
    df: DataFrame, value_col: str, weight: Column | None = None
) -> DataFrame:
    """Build the d x w counter table: (j, col, n). One explode(d) narrow
    map + ONE map-side-combining groupBy of at most d*w=1024 groups —
    the sketch a stream aggregator would keep, materialized as a
    DataFrame."""
    w = weight if weight is not None else F.lit(1)
    rows = df.select(
        F.col(value_col).cast("string").alias("v"), w.alias("_w")
    ).select(
        F.explode(
            F.array(*[F.lit(s) for s in _CMS_SEEDS])
        ).alias("j"),
        F.col("v"),
        F.col("_w"),
    )
    return (
        rows.select(
            "j",
            F.substring(
                F.md5(F.concat(F.col("j"), F.lit(":"), F.col("v"))), 1, 2
            ).alias("col"),
            "_w",
        )
        .groupBy("j", "col")
        .agg(F.sum("_w").alias("n"))
    )


def cms_lookup(counters: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point-query the sketch for each key: addresses each of the d
    counters and takes the min. The counter table is tiny (<= d*w rows)
    and broadcasts; the lookup is d narrow joins collapsed into one
    explode + equi-join + groupBy(min)."""
    probes = keys.select(F.col(key_col)).select(
        key_col,
        F.explode(F.array(*[F.lit(s) for s in _CMS_SEEDS])).alias("j"),
    ).select(
        key_col,
        "j",
        F.substring(
            F.md5(F.concat(F.col("j"), F.lit(":"), F.col(key_col).cast("string"))),
            1,
            2,
        ).alias("col"),
    )
    return (
        probes.join(F.broadcast(counters), ["j", "col"])
        .groupBy(key_col)
        .agg(F.min("n").alias("cms_estimate"))
    )


# ----------------------------------------------------------- KMV --

TWO60 = float(1 << 60)  # normalization for 15-hex (60-bit) hashes


def kmv_hash(col: Column) -> Column:
    """60-bit md5-derived hash as BIGINT — identical in any engine
    (DuckDB: ('0x' || substring(md5(v),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def kmv_sketch(
    df: DataFrame, value_col: str, group_cols: list[str], k: int = 10
) -> DataFrame:
    """Per-group KMV (k-minimum-values) sketch: the k smallest hash
    values of the group's distinct ``value_col``s, as a sorted array.

    Two-phase k-min so no task ever materializes a group's full
    distinct set: a salted local phase keeps <= k hashes per (group,
    salt) — collect_set dedups map-side — then the merge phase k-mins
    over <= 64*k survivors per group. This is also exactly how KMV
    sketches MERGE across days/machines: union the arrays, keep the k
    smallest — which the union/intersection estimators below rely on."""
    h = kmv_hash(F.col(value_col))
    salt = F.pmod(F.xxhash64(F.col(value_col).cast("string")), F.lit(64))
    local = (
        df.select(*group_cols, salt.alias("_salt"), h.alias("h"))
        .groupBy(*group_cols, "_salt")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hs"))
    )
    return (
        local.select(*group_cols, F.explode("hs").alias("h"))
        .groupBy(*group_cols)
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hs"))
    )


def kmv_estimate(hs: Column, k: int = 10) -> Column:
    """Distinct estimate from a KMV array: if the sketch holds fewer
    than k values it IS the distinct set (exact count); otherwise
    (k-1) / normalized k-th minimum."""
    return F.when(F.size(hs) < k, F.size(hs).cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(TWO60) / F.element_at(hs, k).cast("double")
    )


def cms_inner_product(a: DataFrame, b: DataFrame) -> DataFrame:
    """Join-size estimation from two CMS counter tables (the AMS/CM
    inner-product estimator): |A join B on k| = sum_v fA(v)*fB(v) is
    upper-bounded by min over hash rows j of sum_col nA*nB. This is
    the statistic a cost-based optimizer needs BEFORE running a join —
    computable from two d*w-row sketches that each cost one
    map-side-combining groupBy to build and merge by addition across
    partitions/days. Returns one row (cms_estimate)."""
    j = a.select("j", "col", F.col("n").alias("na")).join(
        b.select("j", "col", F.col("n").alias("nb")), ["j", "col"]
    )
    per_row = j.groupBy("j").agg(
        F.sum(F.col("na") * F.col("nb")).alias("ip")
    )
    return per_row.agg(F.min("ip").alias("cms_estimate"))


def spacesaving_heavy_hitters(
    keyed: DataFrame,
    key_col: str,
    k: int,
    capacity: int = 64,
) -> DataFrame:
    """EXACT heavy hitters (items with frequency strictly above n/k)
    in two bounded-memory passes — the SpaceSaving candidate pattern:

    1. CANDIDATES: each partition maintains a SpaceSaving summary of
       ``capacity`` counters (replace-the-min on overflow). An item
       absent from a partition's summary has partition frequency at
       most part_n/capacity, so an item absent from EVERY summary has
       global frequency at most n/capacity < n/k whenever
       capacity > k — every true heavy hitter is guaranteed to be a
       candidate (the completeness pigeonhole; the oracle's direct
       GROUP BY HAVING proves it held).
    2. VERIFY: exact recount of the candidate set only (broadcast
       semi-join + one groupBy), then the strict n/k threshold.

    Why not one exact groupBy? At 100 TB the first pass's state is
    ``capacity`` counters per task regardless of key cardinality,
    and the second pass shuffles only candidate rows — the classic
    two-pass trade when the key space is too large to aggregate
    exactly but only the head matters. Python stays on the slow path
    exactly once (Arrow-batched, value_counts per batch folded into
    the summary; never per-row over the corpus)."""
    import pandas as pd

    def partition_summary(batches):
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[key_col].value_counts().items():
                c = int(c)
                if v in counters or len(counters) < capacity:
                    counters[v] = counters.get(v, 0) + c
                else:
                    # SpaceSaving replace-min: new item inherits the
                    # minimum counter (its maximum possible undercount)
                    mv = min(counters, key=counters.get)
                    mc = counters.pop(mv)
                    counters[v] = mc + c
        yield pd.DataFrame(
            {key_col: list(counters), "est": list(counters.values())}
        )

    schema_key = dict(keyed.dtypes)[key_col]
    cand = (
        keyed.select(key_col)
        .mapInPandas(partition_summary, f"{key_col} {schema_key}, est long")
        .select(key_col)
        .distinct()
    )
    n = keyed.count()
    exact = (
        keyed.join(F.broadcast(cand), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * k > F.lit(n))
    )
    return exact.select(
        key_col,
        "freq",
        F.round(F.col("freq") / F.lit(float(n)), 6).alias("share"),
    )
