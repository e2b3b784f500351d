"""Relational breadth: joins, aggregations, windows, set ops, sorts
(SURVEY.md §2.5-§2.9) over the TPC-H-ish tables.

Float discipline: monetary math runs in DECIMAL(12,2)/(18,4) so sums
are exact and partitioning-order-independent, then final columns cast
to DOUBLE — both engines produce bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.registry import query

DEC = "decimal(12,2)"


@query(
    "pricing_summary_q1",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan -> fused filter -> partial agg -> final agg.
    One shuffle on the (tiny-cardinality) group keys; map-side combine
    does nearly all the work, so this scales linearly to 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(DEC)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    tax = F.col("l_tax").cast(DEC)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (1 - disc) * (1 + tax)).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "join_equi_broadcast",
    """
    SELECT n.n_name AS nation,
           count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name <> 'EUROPE'
    GROUP BY n.n_name
    """,
)
def q_join_equi_broadcast(spark, sf_dir):
    """Equi-join chain with explicitly broadcast dims — at 100 TB the
    fact side never shuffles for dimension joins."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") != "EUROPE")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_acctbal"),
        )
    )


@query(
    "semi_join_customers_with_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
    """,
)
def q_semi_join(spark, sf_dir):
    """J2-shape: left-semi (EXISTS). No row duplication, no payload from
    the probe side — cheapest existence check at scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "anti_join_customers_without_orders",
    """
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def q_anti_join(spark, sf_dir):
    """J3-shape: left-anti (NOT EXISTS) — the reference's blob/SharePoint
    reconciliation set-difference (citation:47-113,133-156). Filtered
    probe side keeps the result non-empty at every SF."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "set_ops_union_intersect_except",
    """
    WITH hi AS (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000),
         pri AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT 'union' AS op, custkey FROM (SELECT DISTINCT custkey FROM (SELECT * FROM hi UNION SELECT * FROM pri))
    UNION ALL
    SELECT 'intersect' AS op, custkey FROM (SELECT custkey FROM hi INTERSECT SELECT custkey FROM pri)
    UNION ALL
    SELECT 'except' AS op, custkey FROM (SELECT custkey FROM hi EXCEPT SELECT custkey FROM pri)
    """,
)
def q_set_ops(spark, sf_dir):
    """§2.9: union / intersect / except in one labeled result."""
    o = load_table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("custkey")
    )
    pri = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    u = hi.union(pri).distinct().select(F.lit("union").alias("op"), "custkey")
    i = hi.intersect(pri).select(F.lit("intersect").alias("op"), "custkey")
    # subtract == EXCEPT DISTINCT (exceptAll would keep multiplicity)
    e = hi.subtract(pri).select(F.lit("except").alias("op"), "custkey")
    return u.unionByName(i).unionByName(e)


@query(
    "window_rank_lag_running",
    """
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rk,
           lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def q_window_rank_lag(spark, sf_dir):
    """§2.7 breadth: rank / lag / running frame in one pass — one
    shuffle on o_custkey, all three windows share the exchange+sort."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.rank().over(w).alias("rk"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.sum(F.col("o_totalprice").cast(DEC))
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS price FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk_per_group(spark, sf_dir):
    """Top-K per group — window row_number with deterministic tiebreak;
    AQE turns this into partial per-partition top-k at scale."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey", "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
        )
    )


@query(
    "rollup_lineitem_status",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark, sf_dir):
    """Grouping-set breadth (free Spark builtin; §2.6 note)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "pivot_status_by_returnflag",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_O,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark, sf_dir):
    """Pivot on a known value set (conditional-agg form — identical plan
    either way, SQL-expressible for the oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(DEC)
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_linestatus") == "O", qty)).cast("double").alias("qty_O"),
        F.sum(F.when(F.col("l_linestatus") == "F", qty)).cast("double").alias("qty_F"),
    )


@query(
    "revenue_topn_with_order",
    """
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM lineitem GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q_topn_orders(spark, sf_dir):
    """O2-shape global top-N: Spark's orderBy+limit compiles to
    TakeOrderedAndProject — per-partition top-N then a tiny driver
    merge, never a full sort at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    return (
        li.groupBy("l_orderkey")
        .agg(F.sum(price * (1 - disc)).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "multi_join_order_lineitem_part",
    """
    SELECT p.p_brand,
           count(*) AS n_items,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS gross
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY p.p_brand
    """,
)
def q_multi_join(spark, sf_dir):
    """Fact-fact-dim join: lineitem⋈orders shuffles on orderkey (AQE
    may convert to broadcast at small SF); part broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("gross"),
        )
    )


@query(
    "data_quality_audit",
    """
    SELECT rule, n_violations FROM (
      SELECT 'orders_custkey_fk' AS rule, count(*) AS n_violations
      FROM orders o WHERE NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      UNION ALL
      SELECT 'lineitem_orderkey_fk', count(*)
      FROM lineitem l WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      UNION ALL
      SELECT 'customer_custkey_unique', CAST(coalesce(sum(n - 1), 0) AS BIGINT)
      FROM (SELECT count(*) AS n FROM customer GROUP BY c_custkey) WHERE n > 1
      UNION ALL
      SELECT 'orders_orderdate_nonnull', count(*)
      FROM orders WHERE o_orderdate IS NULL
      UNION ALL
      SELECT 'lineitem_quantity_positive', count(*)
      FROM lineitem WHERE l_quantity <= 0
    )
    """,
)
def q_data_quality_audit(spark, sf_dir):
    """Declarative data-quality audit — the expect-style constraint
    report every warehouse load runs: referential integrity via
    anti-joins, key uniqueness via a groupBy surplus, null and domain
    checks via filtered counts, one (rule, n_violations) row each.
    Every rule is a single-shuffle shape (anti-join or groupBy); the
    union of scalar counts is driver-trivial."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def one(rule, df):
        return df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(rule).alias("rule"), "n_violations"
        )

    fk_orders = o.join(
        c.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_anti"
    )
    fk_lineitem = li.join(
        o.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_anti"
    )
    dupes = (
        c.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("n_violations"))
        .select(F.lit("customer_custkey_unique").alias("rule"), "n_violations")
    )
    return (
        one("orders_custkey_fk", fk_orders)
        .unionByName(one("lineitem_orderkey_fk", fk_lineitem))
        .unionByName(dupes)
        .unionByName(one("orders_orderdate_nonnull", o.filter(F.col("o_orderdate").isNull())))
        .unionByName(one("lineitem_quantity_positive", li.filter(F.col("l_quantity") <= 0)))
    )


@query(
    "rfm_customer_segments",
    """
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    anchor AS (SELECT max(o_orderdate) AS maxd FROM orders)
    SELECT custkey,
           CAST(date_diff('day', CAST(last_order AS DATE), CAST(maxd AS DATE)) AS INTEGER) AS recency_days,
           frequency, monetary,
           CASE WHEN date_diff('day', CAST(last_order AS DATE), CAST(maxd AS DATE)) <= 90 THEN 2
                WHEN date_diff('day', CAST(last_order AS DATE), CAST(maxd AS DATE)) <= 365 THEN 1
                ELSE 0 END AS r_band,
           CASE WHEN frequency >= 20 THEN 2 WHEN frequency >= 10 THEN 1 ELSE 0 END AS f_band,
           CASE WHEN monetary >= 2000000 THEN 2 WHEN monetary >= 1000000 THEN 1 ELSE 0 END AS m_band
    FROM rfm CROSS JOIN anchor
    """,
)
def q_rfm_segments(spark, sf_dir):
    """RFM customer segmentation: recency vs the dataset's anchor date,
    order frequency, monetary total (exact decimal sum), each banded by
    FIXED thresholds — value bands, not ntile, for the same reason as
    quality_band_mix: a global quantile window is a single-reducer sort
    at scale while the band is a narrow map. One groupBy on the
    customer key plus a 1-row broadcast anchor."""
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("monetary"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("maxd"))
    rec = F.datediff(F.col("maxd"), F.col("last_order"))
    return rfm.crossJoin(F.broadcast(anchor)).select(
        "custkey",
        rec.cast("int").alias("recency_days"),
        "frequency",
        "monetary",
        F.when(rec <= 90, 2).when(rec <= 365, 1).otherwise(0).alias("r_band"),
        F.when(F.col("frequency") >= 20, 2).when(F.col("frequency") >= 10, 1).otherwise(0).alias("f_band"),
        F.when(F.col("monetary") >= 2000000, 2).when(F.col("monetary") >= 1000000, 1).otherwise(0).alias("m_band"),
    )


@query(
    "cdc_diff_snapshots",
    """
    WITH v1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
                WHERE o_orderdate < DATE '1998-01-01'),
    v2 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
           WHERE o_orderdate >= DATE '1996-01-01')
    SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                WHEN b.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           CAST(b.o_totalprice AS DOUBLE) AS new_totalprice,
           CAST(a.o_totalprice AS DOUBLE) AS old_totalprice
    FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.o_orderstatus <> b.o_orderstatus
       OR a.o_totalprice <> b.o_totalprice
    """,
)
def q_cdc_diff(spark, sf_dir):
    """Change-data-capture by SNAPSHOT DIFF: given two keyed versions
    of a table (here: two date-window views of orders standing in for
    consecutive snapshots), emit the insert/update/delete change feed —
    what a plain-parquet warehouse computes to feed incremental
    consumers when there is no transaction log to read.

    Scale: ONE full-outer key join (both sides shuffle on the key
    once); the change predicate evaluates post-join per row. For
    repeated diffs, bucket both snapshots on the key
    (`io.save_bucketed`) and the join runs with zero Exchange."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    v1 = o.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("date")).select(cols)
    v2 = o.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("date")).select(cols)
    a, b = v1.alias("a"), v2.alias("b")
    j = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    changed = j.filter(
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
        | (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
    )
    return changed.select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias(
            "o_orderkey"
        ),
        F.when(F.col("a.o_orderkey").isNull(), "insert")
        .when(F.col("b.o_orderkey").isNull(), "delete")
        .otherwise("update")
        .alias("op"),
        F.col("b.o_totalprice").cast("double").alias("new_totalprice"),
        F.col("a.o_totalprice").cast("double").alias("old_totalprice"),
    )


@query(
    "table_profile_orders",
    """
    SELECT 'o_orderkey' AS col, count(*) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_str,
           CAST(max(o_orderkey) AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*),
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*),
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderstatus),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*),
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderpriority),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*),
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_totalprice),
           CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR),
           CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*),
           CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderdate),
           strftime(min(o_orderdate), '%Y-%m-%d'),
           strftime(max(o_orderdate), '%Y-%m-%d')
    FROM orders
    """,
)
def q_table_profile(spark, sf_dir):
    """Data-profiling summary of a table (per-column rows / nulls /
    distincts / canonicalized min-max) — the first query every data
    platform runs against a new 100-TB drop.

    Scale: the oracle re-scans the table once PER COLUMN (six passes);
    the engine computes every profile statistic in ONE aggregate over
    one scan (the multi-distinct compiles to a single Expand —
    one pass, expand factor = #distinct columns) and pivots the single
    result row to long form with a stack() generate, which is free.
    Min/max canonicalize per type (decimal 18,2 for money, ISO for
    dates) so both engines print identical strings."""
    o = load_table(spark, sf_dir, "orders")

    def _null(c):
        return F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))

    row = o.agg(
        F.count(F.lit(1)).alias("n"),
        *[x for c in ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice", "o_orderdate"]
          for x in (
              _null(c).alias(f"null_{c}"),
              F.countDistinct(c).alias(f"nd_{c}"),
          )],
        F.min("o_orderkey").cast("string").alias("min_o_orderkey"),
        F.max("o_orderkey").cast("string").alias("max_o_orderkey"),
        F.min("o_custkey").cast("string").alias("min_o_custkey"),
        F.max("o_custkey").cast("string").alias("max_o_custkey"),
        F.min("o_orderstatus").alias("min_o_orderstatus"),
        F.max("o_orderstatus").alias("max_o_orderstatus"),
        F.min("o_orderpriority").alias("min_o_orderpriority"),
        F.max("o_orderpriority").alias("max_o_orderpriority"),
        F.min(F.col("o_totalprice").cast("decimal(18,2)")).cast("string").alias("min_o_totalprice"),
        F.max(F.col("o_totalprice").cast("decimal(18,2)")).cast("string").alias("max_o_totalprice"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("min_o_orderdate"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("max_o_orderdate"),
    )
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice", "o_orderdate"]
    stack_args = ", ".join(
        f"'{c}', null_{c}, nd_{c}, min_{c}, max_{c}" for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (col, n_null, n_distinct, min_str, max_str)",
        "n AS n_rows",
    ).select("col", "n_rows", "n_null", "n_distinct", "min_str", "max_str")


@query(
    "bloom_semi_join_lineitem",
    """
    SELECT l_orderkey, count(*) AS n_lines,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 350000)
    GROUP BY l_orderkey
    """,
)
def q_bloom_semi_join(spark, sf_dir):
    """Broadcast bloom-filter semi-join: the selective order-key set
    becomes an 8 KB bitset broadcast to every lineitem scan task, so
    the big side is prefiltered BEFORE any exchange; the exact
    left-semi join then only sees bloom survivors. False positives die
    in the exact join, so the result is EXACTLY the plain semi-join —
    which is what the oracle states. At 100 TB this is the difference
    between shuffling the full fact table and shuffling the ~1% that
    can possibly match (the same trick AQE row-level runtime filters
    play, here as an explicit operator with a tunable bit budget)."""
    from commercial_rfp_data_pipeline_spark.operators.bloom import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 350000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return bloom_semi_join(li, keys, "l_orderkey").groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast(DEC))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "incremental_view_maintenance",
    """
    WITH effective AS (
      SELECT o_orderdate, CAST(o_totalprice AS DECIMAL(12,2)) AS p
      FROM orders WHERE o_orderkey % 97 != 0
      UNION ALL
      SELECT o_orderdate, CAST(o_totalprice AS DECIMAL(12,2)) AS p
      FROM orders WHERE o_orderkey % 89 = 0
    )
    SELECT o_orderdate, count(*) AS n_orders,
           CAST(sum(p) AS DOUBLE) AS revenue,
           CAST(sum(p) AS DOUBLE) / count(*) AS avg_price
    FROM effective GROUP BY o_orderdate
    """,
)
def q_incremental_view(spark, sf_dir):
    """Incremental view maintenance under CDC retractions: the daily
    revenue rollup's partial state (cnt, sum) is built from the base
    ONCE, then a delta batch — deletes (o_orderkey%97=0, op=-1) and
    re-inserts (o_orderkey%89=0, op=+1) — folds in as one
    delta-proportional aggregation + merge. The oracle recomputes the
    view from scratch over the effective row set, value-checking the
    retraction law merge(state(base), state(delta)) ==
    agg(base - deletes + inserts). avg derives from the state at read
    time (quotients are not mergeable; sums and counts are)."""
    from commercial_rfp_data_pipeline_spark.operators.incremental import (
        merge_states,
        view_state,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", F.col("o_totalprice").cast(DEC).alias("p")
    )
    base_state = view_state(orders, ["o_orderdate"], F.col("p"))
    deletes = orders.filter(F.col("o_orderkey") % 97 == 0).withColumn(
        "op", F.lit(-1)
    )
    inserts = orders.filter(F.col("o_orderkey") % 89 == 0).withColumn(
        "op", F.lit(1)
    )
    delta = deletes.unionByName(inserts)
    delta_state = view_state(delta, ["o_orderdate"], F.col("p"), op=F.col("op"))
    merged = merge_states([base_state, delta_state], ["o_orderdate"])
    return merged.select(
        "o_orderdate",
        F.col("cnt").alias("n_orders"),
        F.col("total").cast("double").alias("revenue"),
        (F.col("total").cast("double") / F.col("cnt")).alias("avg_price"),
    )


@query(
    "merkle_bucket_diff",
    """
    WITH v1 AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS p, o_orderdate
      FROM orders
    ),
    v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 101 = 0
                  THEN CAST(o_totalprice AS DECIMAL(12,2)) + 1
                  ELSE CAST(o_totalprice AS DECIMAL(12,2)) END AS p,
             o_orderdate
      FROM orders WHERE o_orderkey % 103 != 0
      UNION ALL
      SELECT o_orderkey + 20000000,
             CAST(o_totalprice AS DECIMAL(12,2)), o_orderdate
      FROM orders WHERE o_orderkey % 107 = 0
    )
    SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
           CASE WHEN v2.o_orderkey IS NULL THEN 'deleted'
                WHEN v1.o_orderkey IS NULL THEN 'inserted'
                WHEN v1.p != v2.p OR v1.o_orderdate != v2.o_orderdate
                  THEN 'updated' END AS change
    FROM v1 FULL OUTER JOIN v2 USING (o_orderkey)
    WHERE CASE WHEN v2.o_orderkey IS NULL THEN 'deleted'
               WHEN v1.o_orderkey IS NULL THEN 'inserted'
               WHEN v1.p != v2.p OR v1.o_orderdate != v2.o_orderdate
                 THEN 'updated' END IS NOT NULL
    """,
)
def q_merkle_diff(spark, sf_dir):
    """Anti-entropy replica reconciliation: two snapshot versions
    (deterministic update/delete/insert deltas on orders) compare via
    per-bucket xor/sum/count digests, and the row-level full-outer
    diff runs ONLY inside disagreeing buckets — unchanged buckets (the
    vast majority) never join. The oracle recomputes the diff the
    direct way, value-checking that the pruning lost nothing."""
    from commercial_rfp_data_pipeline_spark.operators.incremental import (
        merkle_diff,
    )

    o = load_table(spark, sf_dir, "orders")
    v1 = o.select(
        "o_orderkey",
        F.col("o_totalprice").cast(DEC).alias("p"),
        "o_orderdate",
    )
    base2 = o.filter(F.col("o_orderkey") % 103 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 101 == 0,
            F.col("o_totalprice").cast(DEC) + 1,
        )
        .otherwise(F.col("o_totalprice").cast(DEC))
        .alias("p"),
        "o_orderdate",
    )
    ins = o.filter(F.col("o_orderkey") % 107 == 0).select(
        (F.col("o_orderkey") + 20000000).alias("o_orderkey"),
        F.col("o_totalprice").cast(DEC).alias("p"),
        "o_orderdate",
    )
    v2 = base2.unionByName(ins)
    return merkle_diff(v1, v2, "o_orderkey", ["p", "o_orderdate"])


@query(
    "skyline_parts_price_size",
    """
    WITH p AS (
      SELECT p_partkey, CAST(p_retailprice AS DECIMAL(12,2)) AS price, p_size
      FROM part
    )
    SELECT a.p_partkey, CAST(a.price AS DOUBLE) AS price, a.p_size
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.price <= a.price AND b.p_size <= a.p_size
        AND (b.price < a.price OR b.p_size < a.p_size)
    )
    """,
)
def q_skyline(spark, sf_dir):
    """2-D skyline (Pareto front): parts not dominated on (price,
    size) — no other part is <= on both and < on one. The naive form
    is the quadratic NOT-EXISTS self-join the oracle states; the
    engine computes it in ONE pass over the per-price group table:
    min size per distinct price (map-side-combining groupBy), strict-
    prefix running min across price groups, then a row survives iff
    no strictly-cheaper group reaches its size and no same-price row
    is strictly smaller. The strict-prefix min rides
    distributed_prefix_agg's range-partition + offsets cascade
    (operators/ordered.py) — per-partition running mins with a
    single-partition combine over the n_partitions-row totals table
    only — so no task ever sees the whole distinct-price frame."""
    from commercial_rfp_data_pipeline_spark.operators.ordered import (
        distributed_prefix_agg,
    )

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").cast(DEC).alias("price"),
        "p_size",
    )
    pg = p.groupBy("price").agg(F.min("p_size").alias("msize"))
    pg2 = distributed_prefix_agg(
        pg, {"msize": (F.col("msize"), "min")}, order_by=[F.col("price")]
    ).select(
        "price", "msize", F.col("msize_before").alias("pmin_strict")
    )
    joined = p.join(F.broadcast(pg2), "price")
    dominated = (
        F.col("pmin_strict").isNotNull()
        & (F.col("pmin_strict") <= F.col("p_size"))
    ) | (F.col("msize") < F.col("p_size"))
    return joined.filter(~dominated).select(
        "p_partkey", F.col("price").cast("double").alias("price"), "p_size"
    )


_LATERAL_SQL = """
    SELECT n.n_name, t.c_custkey,
           CAST(CAST(t.c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 3
    ) t
"""


@query("lateral_topn_per_nation", _LATERAL_SQL)
def q_lateral_topn(spark, sf_dir):
    """Top-3 customers by account balance per nation, stated as a
    correlated LATERAL subquery — the SQL-standard form of
    top-n-per-group — submitted through the SQL front door with the
    IDENTICAL text running on the oracle. Catalyst decorrelates the
    LATERAL into the same window/rank shape the DataFrame form of this
    query family plans (topk_orders_per_customer), so accepting the
    standard syntax costs nothing: a per-group ORDER BY...LIMIT never
    executes as n_nations separate scans.

    Scale: decorrelation means ONE shuffle of customers on nationkey
    with the rank evaluated group-locally (AQE's window-group-limit
    pushes the top-3 truncation map-side), then a broadcast join to the
    25-row nation dim."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_SQL)


@query(
    "merge_apply_changeset",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate < DATE '1997-01-01'
    ),
    changes AS (
      SELECT o_orderkey, 'D' AS op,
             CAST(NULL AS VARCHAR) AS o_orderstatus,
             CAST(NULL AS DOUBLE) AS o_totalprice
      FROM base WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, 'U' AS op, o_orderstatus,
             CAST(o_totalprice AS DOUBLE) AS o_totalprice
      FROM orders WHERE o_orderdate >= DATE '1997-01-01'
    ),
    kept AS (
      SELECT b.* FROM base b
      WHERE NOT EXISTS (SELECT 1 FROM changes c
                        WHERE c.o_orderkey = b.o_orderkey)
    )
    SELECT o_orderkey, o_orderstatus,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice
    FROM kept
    UNION ALL
    SELECT o_orderkey, o_orderstatus,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice
    FROM changes WHERE op = 'U'
    """,
)
def q_merge_apply(spark, sf_dir):
    """MERGE INTO applied as a batch operator
    (operators/incremental.py:merge_apply): a derived changeset —
    deletes for every 7th base key, upserts for every post-1997 order —
    lands on the pre-1997 snapshot and produces the next snapshot in
    one anti-join + union. Completes the lakehouse write family next to
    cdc_diff_snapshots (its inverse: diff re-derives this changeset),
    snapshot time travel, and the exactly-once streaming upsert sink."""
    from commercial_rfp_data_pipeline_spark.operators.incremental import (
        merge_apply,
    )

    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = o.filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("date")
    ).select(cols)
    deletes = base.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    upserts = o.filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("date")
    ).select(
        "o_orderkey",
        F.lit("U").alias("op"),
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    merged = merge_apply(
        base, deletes.unionByName(upserts), keys=["o_orderkey"]
    )
    return merged.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast(DEC).cast("double").alias("o_totalprice"),
    )


@query(
    "percent_of_total_report",
    """
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation,
           CAST(revenue AS DOUBLE) AS revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY region), 6)
             AS share_of_region,
           round(revenue / sum(revenue) OVER (), 6) AS share_of_total
    FROM rev
    """,
)
def q_percent_of_total(spark, sf_dir):
    """Percent-of-parent at two grains — each nation's revenue share
    of its region and of the world — the BI report shape behind every
    treemap/contribution chart. DECIMAL revenue sums keep the shares'
    numerators and denominators exact; the region denominator is a
    region-partitioned window over the 25-row rollup, and the grand
    total is a broadcast one-row aggregate (map-side partials), NOT a
    partition-less `sum over ()` window — the same report at a finer
    grain would otherwise funnel the whole rollup through one task."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"))
    )
    w_region = W.partitionBy("region")
    total = rev.agg(F.sum("revenue").alias("_grand_total"))
    return rev.crossJoin(F.broadcast(total)).select(
        "region",
        "nation",
        F.col("revenue").cast("double").alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(w_region), 6)
        .cast("double")
        .alias("share_of_region"),
        F.round(F.col("revenue") / F.col("_grand_total"), 6)
        .cast("double")
        .alias("share_of_total"),
    )


@query(
    "order_to_ship_latency_percentiles",
    """
    WITH lat AS (
      SELECT o.o_orderpriority,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    )
    SELECT o_orderpriority,
           count(*) AS n_lines,
           round(quantile_cont(days, 0.5), 4) AS p50_days,
           round(quantile_cont(days, 0.95), 4) AS p95_days,
           CAST(max(days) AS BIGINT) AS max_days
    FROM lat GROUP BY o_orderpriority
    """,
)
def q_ship_latency(spark, sf_dir):
    """Order-to-ship latency percentiles by priority — the operational
    SLA report: p50/p95/max days from order date to each line's ship
    date. One orderkey join (AQE-planned) feeding exact interpolated
    percentiles per the 5-value priority key."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    lat = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "o_orderpriority",
            F.datediff("l_shipdate", "o_orderdate").alias("days"),
        )
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.percentile("days", F.lit(0.5)), 4).alias("p50_days"),
        F.round(F.percentile("days", F.lit(0.95)), 4).alias("p95_days"),
        F.max("days").cast("bigint").alias("max_days"),
    )


@query(
    "customer_cohort_ltv",
    """
    WITH cohorts AS (
      SELECT o_custkey,
             CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    facts AS (
      SELECT c.cohort,
             CAST((EXTRACT(year FROM o.o_orderdate)
                   - EXTRACT(year FROM c.cohort)) * 12
                  + (EXTRACT(month FROM o.o_orderdate)
                     - EXTRACT(month FROM c.cohort)) AS INTEGER) AS age_months,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev
      FROM orders o JOIN cohorts c ON c.o_custkey = o.o_custkey
    ),
    cells AS (
      SELECT cohort, age_months, sum(rev) AS rev, count(*) AS n_orders
      FROM facts GROUP BY cohort, age_months
    ),
    sizes AS (SELECT cohort, count(*) AS cohort_size FROM cohorts GROUP BY cohort)
    SELECT c.cohort, c.age_months, c.n_orders, s.cohort_size,
           CAST(c.rev AS DOUBLE) AS revenue,
           CAST(sum(c.rev) OVER (PARTITION BY c.cohort ORDER BY c.age_months
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS cumulative_revenue,
           round(sum(c.rev) OVER (PARTITION BY c.cohort ORDER BY c.age_months
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / s.cohort_size, 6) AS ltv_per_customer
    FROM cells c JOIN sizes s ON s.cohort = c.cohort
    """,
)
def q_cohort_ltv(spark, sf_dir):
    """Cohort lifetime value: customers grouped by first-order month,
    revenue accumulated by cohort age, LTV = cumulative revenue /
    cohort size — the triangle behind every retention-economics
    deck (the events-side sibling is events_retention_cohorts, which
    counts activity; this one follows the money). DECIMAL revenue;
    the running sum windows over the tiny (cohort, age) cell table."""
    o = load_table(spark, sf_dir, "orders")
    cohorts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("cohort")
    )
    facts = o.join(cohorts, "o_custkey").select(
        "cohort",
        (
            (F.year("o_orderdate") - F.year("cohort")) * 12
            + (F.month("o_orderdate") - F.month("cohort"))
        )
        .cast("int")
        .alias("age_months"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
    )
    cells = facts.groupBy("cohort", "age_months").agg(
        F.sum("rev").alias("rev"), F.count(F.lit(1)).alias("n_orders")
    )
    sizes = cohorts.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    w = (
        W.partitionBy("cohort")
        .orderBy("age_months")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    joined = cells.join(F.broadcast(sizes), "cohort")
    return joined.select(
        "cohort",
        "age_months",
        "n_orders",
        "cohort_size",
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(w).cast("double").alias("cumulative_revenue"),
        F.round(F.sum("rev").over(w) / F.col("cohort_size"), 6)
        .cast("double")
        .alias("ltv_per_customer"),
    )


@query(
    "revenue_mom_growth",
    """
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue,
             count(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT month, n_orders,
           CAST(revenue AS DOUBLE) AS revenue,
           round(CAST(revenue - lag(revenue) OVER (ORDER BY month) AS DOUBLE)
                 / CAST(lag(revenue) OVER (ORDER BY month) AS DOUBLE), 6)
             AS mom_growth,
           round(CAST(revenue - lag(revenue, 12) OVER (ORDER BY month) AS DOUBLE)
                 / CAST(lag(revenue, 12) OVER (ORDER BY month) AS DOUBLE), 6)
             AS yoy_growth
    FROM monthly
    """,
)
def q_revenue_mom_growth(spark, sf_dir):
    """Month-over-month and year-over-year revenue growth — the
    period-comparison report every finance review opens with. The lag
    is CALENDAR lag (month - 1, month - 12), so the engine states it
    as two equi-joins of the monthly rollup against itself shifted by
    add_months — partitioned hash joins at any scale — instead of a
    partition-less ordered window. (The oracle's lag(k) OVER (ORDER BY
    month) agrees because TPC-H order dates cover every month with no
    gaps; the join form is also the one that stays correct if a month
    were missing.) First months yield NULL growth (no prior period),
    exactly as both engines state it."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    m1 = monthly.select(
        F.add_months("month", 1).alias("month"),
        F.col("revenue").alias("_prev1"),
    )
    m12 = monthly.select(
        F.add_months("month", 12).alias("month"),
        F.col("revenue").alias("_prev12"),
    )
    prev = F.col("_prev1")
    prev12 = F.col("_prev12")
    return (
        monthly.join(m1, "month", "left")
        .join(m12, "month", "left")
        .select(
            "month",
            "n_orders",
            F.col("revenue").cast("double").alias("revenue"),
            F.round(
                (F.col("revenue") - prev).cast("double") / prev.cast("double"),
                6,
            ).alias("mom_growth"),
            F.round(
                (F.col("revenue") - prev12).cast("double")
                / prev12.cast("double"),
                6,
            ).alias("yoy_growth"),
        )
    )


@query(
    "orders_backlog_aging",
    """
    WITH open_orders AS (
      SELECT o_orderkey, o_orderstatus, o_orderdate,
             CAST(o_totalprice AS DECIMAL(18,2)) AS v,
             date_diff('day', o_orderdate, DATE '1998-08-02') AS age_days
      FROM orders WHERE o_orderstatus <> 'F'
    )
    SELECT o_orderstatus,
           CASE WHEN age_days < 90 THEN '0-89'
                WHEN age_days < 365 THEN '90-364'
                WHEN age_days < 730 THEN '365-729'
                ELSE '730+' END AS age_bucket,
           count(*) AS n_orders,
           CAST(sum(v) AS DOUBLE) AS open_value,
           CAST(min(o_orderdate) AS DATE) AS oldest_order
    FROM open_orders
    GROUP BY 1, 2
    """,
)
def q_backlog_aging(spark, sf_dir):
    """Open-order backlog aging: non-finalized orders bucketed by age
    as of the dataset's as-of date, with count, open value, and the
    oldest order per (status, bucket) — the operations report that
    pairs with the ship-latency SLA view. Narrow map + one small-key
    groupBy."""
    o = load_table(spark, sf_dir, "orders")
    open_orders = o.filter(F.col("o_orderstatus") != "F").select(
        "o_orderstatus",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        F.datediff(F.lit("1998-08-02").cast("date"), "o_orderdate").alias(
            "age_days"
        ),
    )
    bucket = (
        F.when(F.col("age_days") < 90, "0-89")
        .when(F.col("age_days") < 365, "90-364")
        .when(F.col("age_days") < 730, "365-729")
        .otherwise("730+")
    )
    return (
        open_orders.withColumn("age_bucket", bucket)
        .groupBy("o_orderstatus", "age_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("v").cast("double").alias("open_value"),
            F.min("o_orderdate").cast("date").alias("oldest_order"),
        )
    )


_PIPE_SQL = """
    FROM lineitem
    |> WHERE l_shipdate >= DATE '1997-01-01'
    |> AGGREGATE count(*) AS n_items,
                 CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue
       GROUP BY l_returnflag, l_linestatus
    |> WHERE n_items > 100
    |> ORDER BY l_returnflag, l_linestatus
"""

_PIPE_ORACLE = """
    SELECT l_returnflag, l_linestatus, count(*) AS n_items,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01'
    GROUP BY l_returnflag, l_linestatus
    HAVING count(*) > 100
"""


@query("pipe_syntax_report", _PIPE_ORACLE)
def q_pipe_syntax(spark, sf_dir):
    """SQL pipe syntax (Spark 4.0's |> operator chain): the same
    filter -> aggregate -> having -> order report as the ANSI oracle,
    stated as a linear pipeline. Pipe stages are pure parser sugar —
    Catalyst plans the IDENTICAL partial-agg/final-agg shape as the
    GROUP BY form, so accepting the new front door costs nothing."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_PIPE_SQL)


_UNPIVOT_SQL = """
    SELECT l_returnflag, metric, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT l_returnflag,
             CAST(round(sum(l_quantity), 2) AS DOUBLE) AS total_qty,
             CAST(round(sum(l_extendedprice), 2) AS DOUBLE) AS total_price,
             CAST(round(avg(l_discount), 6) AS DOUBLE) AS avg_discount
      FROM lineitem GROUP BY l_returnflag
    ) UNPIVOT (val FOR metric IN (total_qty, total_price, avg_discount))
"""


@query("unpivot_wide_to_long", _UNPIVOT_SQL)
def q_unpivot(spark, sf_dir):
    """Wide-to-long reshaping via SQL-standard UNPIVOT — the inverse of
    pivot_status_by_returnflag. The IDENTICAL query text runs on both
    engines. UNPIVOT is a narrow map (each row expands to n_metrics
    rows, no shuffle); the only exchange is the upstream aggregate's."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_UNPIVOT_SQL)


_GROUP_BY_ALL_SQL = """
    SELECT l_returnflag, l_linestatus, year(l_shipdate) AS ship_year,
           count(*) AS n,
           CAST(round(sum(l_extendedprice), 2) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY ALL
"""


@query("group_by_all_report", _GROUP_BY_ALL_SQL)
def q_group_by_all(spark, sf_dir):
    """GROUP BY ALL — the analyst shorthand both engines resolve to
    the non-aggregate select items. IDENTICAL query text runs on both;
    the resolved plan is the ordinary partial/final hash aggregate."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUP_BY_ALL_SQL)


_NULLSAFE_SQL = """
    WITH a AS (
      SELECT CASE WHEN o_orderkey % 10 = 0 THEN NULL
                  ELSE o_orderkey % 50 END AS k,
             count(*) AS n_a
      FROM orders GROUP BY 1
    ),
    b AS (
      SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderkey % 50 END AS k,
             count(*) AS n_b
      FROM orders GROUP BY 1
    )
    SELECT a.k, a.n_a, b.n_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
"""


@query("null_safe_join_groups", _NULLSAFE_SQL)
def q_null_safe_join(spark, sf_dir):
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): the NULL
    bucket on each side joins to the NULL bucket on the other — the
    semantic a plain equi-join silently drops. Spark plans <=> as an
    ordinary hash join key (NULL hashes like any value under the
    null-safe comparator), so there is no performance cliff for
    keeping the rows."""
    o = load_table(spark, sf_dir, "orders")
    key = F.when(F.col("o_orderkey") % 10 == 0, F.lit(None)).otherwise(
        F.col("o_orderkey") % 50
    )
    key_b = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("o_orderkey") % 50
    )
    a = o.groupBy(key.alias("k")).agg(F.count(F.lit(1)).alias("n_a"))
    b = o.groupBy(key_b.alias("k")).agg(F.count(F.lit(1)).alias("n_b"))
    return (
        a.alias("a")
        .join(b.alias("b"), F.col("a.k").eqNullSafe(F.col("b.k")))
        .select(F.col("a.k").alias("k"), "n_a", "n_b")
    )


_FILTERED_AGG_SQL = """
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_quantity > 25) AS n_big,
           CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_disc,
           bool_and(l_quantity > 0) AS all_pos,
           bool_or(l_tax > 0.07) AS any_high_tax,
           CAST(round(avg(l_extendedprice) FILTER (WHERE l_returnflag = 'R'), 2)
                AS DOUBLE) AS avg_price_returned
    FROM lineitem
    GROUP BY l_returnflag
"""


@query("filtered_aggregate_breadth", _FILTERED_AGG_SQL)
def q_filtered_aggregates(spark, sf_dir):
    """SQL-standard FILTER-clause aggregates plus the boolean
    aggregate family (count_if, bool_and, bool_or) — IDENTICAL query
    text on both engines. Every filtered aggregate stays inside the
    single partial/final hash aggregate (a conditional accumulate, not
    a second scan or join)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_FILTERED_AGG_SQL)


_GDPR_PRED = (
    "('0x' || substring(md5('forget:' || CAST(c_custkey AS VARCHAR)), 1, 15))"
    "::BIGINT % 100 = 0"
)


@query(
    "gdpr_cascade_delete_audit",
    f"""
    WITH forget AS MATERIALIZED (
      SELECT c_custkey FROM customer WHERE {_GDPR_PRED}
    ),
    del_orders AS MATERIALIZED (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM forget)
    )
    SELECT 'customer' AS tbl,
           (SELECT count(*) FROM forget) AS n_deleted,
           (SELECT count(*) FROM customer) - (SELECT count(*) FROM forget)
             AS n_remaining
    UNION ALL
    SELECT 'orders',
           (SELECT count(*) FROM del_orders),
           (SELECT count(*) FROM orders) - (SELECT count(*) FROM del_orders)
    UNION ALL
    SELECT 'lineitem',
           (SELECT count(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)),
           (SELECT count(*) FROM lineitem)
             - (SELECT count(*) FROM lineitem
                WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders))
    """,
)
def q_gdpr_cascade(spark, sf_dir):
    """Right-to-be-forgotten CASCADE: an md5-sampled ~1% of customers
    (the deterministic stand-in for a deletion-request batch) propagates
    down the FK graph — their orders, those orders' lineitems — and the
    audit reports deleted/remaining per table, the compliance evidence
    a deletion job must produce. The delete itself is the complementary
    anti-join (semantics identical to the reconciliation family);
    auditing the counts keeps the whole cascade oracle-checkable in one
    result.

    Scale: the forget list is request-batch-sized — it BROADCASTS into
    a semi-join on customers and orders (fact side never shuffles);
    the order-key set from level 2 feeds level 3 as an ordinary
    semi-join (shuffles only if it outgrows the broadcast threshold,
    which AQE decides from its real size)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    forget_pred = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("forget:"), F.col("c_custkey").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
        == F.lit(0)
    )
    forget = c.filter(forget_pred).select("c_custkey")
    del_orders = o.join(
        F.broadcast(forget), o.o_custkey == forget.c_custkey, "left_semi"
    ).select("o_orderkey")
    del_li = li.join(del_orders, li.l_orderkey == del_orders.o_orderkey, "left_semi")

    def audit(tbl, deleted_df, total_df):
        d = deleted_df.agg(F.count(F.lit(1)).alias("n_deleted"))
        t = total_df.agg(F.count(F.lit(1)).alias("n_total"))
        return d.crossJoin(t).select(
            F.lit(tbl).alias("tbl"),
            "n_deleted",
            (F.col("n_total") - F.col("n_deleted")).alias("n_remaining"),
        )

    return (
        audit("customer", forget, c)
        .unionByName(audit("orders", del_orders, o))
        .unionByName(audit("lineitem", del_li, li))
    )
