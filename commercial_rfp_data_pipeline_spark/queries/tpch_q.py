"""TPC-H-shaped analytical queries (Q3/Q5/Q10 analogues) over the
synthetic tables — the classic fact-to-many-dims join shapes a user of
the reference's relational surface (SURVEY.md §2.5-§2.8) would run as
reports, adapted to this data's 1995-2001 date range and columns.

Scale discipline per query is in the docstrings; the shared rules:
dimension tables (region/nation/customer/supplier) broadcast so the
fact side (lineitem) never shuffles for a dim join; monetary math runs
in DECIMAL so sums are exact and order-independent (bit-identical to
the DuckDB oracle); every top-n carries a total deterministic order and
becomes TakeOrderedAndProject (no global sort of the full result).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.registry import query

DEC = "decimal(12,2)"

# revenue term shared by all three queries (exact decimal arithmetic)
_REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"


def _revenue() -> F.Column:
    return F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))


@query(
    "shipping_priority_q3",
    f"""
    SELECT l_orderkey,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1997-03-15'
      AND l_shipdate > DATE '1997-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY sum({_REV_SQL}) DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): segment-filtered customers ->
    their open orders -> unshipped lineitems, top-10 orders by revenue.

    Scale: the c_mktsegment filter keeps ~1/5 of customers; that
    filtered (custkey) set is broadcast so ORDERS never shuffles for
    the semi-like join, and the orders->lineitem join shuffles on
    orderkey once (both sides filtered first — predicate pushdown to
    the scans, verified in the plan test). The final top-10 with a
    total order is TakeOrderedAndProject: only 10 rows per partition
    reach the driver-side merge, never a global sort."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("date")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).alias("_rev"))
        .orderBy(F.col("_rev").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


@query(
    "local_supplier_volume_q5",
    f"""
    SELECT n_name AS nation,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    """,
)
def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape (local supplier volume): revenue where customer
    and supplier share an ASIA nation, grouped by nation.

    Scale: supplier/customer/nation/region are all dimension-sized next
    to lineitem and all broadcast — lineitem shuffles exactly once (on
    l_orderkey, to meet the date-filtered orders). The extra
    c_nationkey = s_nationkey equality rides the broadcast joins as a
    post-join filter; region's r_name filter prunes nation/supplier
    BEFORE the broadcast, shrinking the hash tables."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    sn = s.join(F.broadcast(nr), s.s_nationkey == nr.n_nationkey).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@query(
    "returned_items_q10",
    f"""
    SELECT c_custkey, c_name,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           n_name AS nation
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= DATE '1996-10-01'
      AND o_orderdate < DATE '1997-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY sum({_REV_SQL}) DESC, c_custkey
    LIMIT 20
    """,
)
def q_returned_items(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    revenue lost to returns in one quarter.

    Scale: returnflag + date filters push to the scans; lineitem joins
    date-filtered orders on the orderkey shuffle, then customer/nation
    broadcast onto the aggregated (custkey) side. Aggregation runs
    BEFORE the customer join — group on o_custkey first so the shuffle
    carries (custkey, revenue) partial sums, not customer payload
    columns; top-20 via TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    per_cust = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_revenue()).alias("_rev"))
    )
    return (
        per_cust.join(F.broadcast(c), per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .orderBy(F.col("_rev").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("_rev").cast("double").alias("revenue"),
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            F.col("n_name").alias("nation"),
        )
    )


@query(
    "min_cost_supplier_per_part",
    """
    WITH pick AS (
      SELECT l_partkey, l_extendedprice AS min_price,
             min(l_suppkey) AS s_suppkey
      FROM lineitem l
      WHERE l_extendedprice = (SELECT min(l2.l_extendedprice)
                               FROM lineitem l2
                               WHERE l2.l_partkey = l.l_partkey)
      GROUP BY l_partkey, l_extendedprice
    )
    SELECT p.p_partkey, p.p_name,
           CAST(k.min_price AS DOUBLE) AS min_price,
           s.s_name AS supplier
    FROM pick k
    JOIN part p ON k.l_partkey = p.p_partkey
    JOIN supplier s USING (s_suppkey)
    """,
)
def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier): the correlated-subquery
    argmin, which the engine plans as ONE groupBy(min(struct)) — price
    then supplier key order lexicographically, so a single map-side-
    combining aggregate replaces the subquery's join-back; part and
    supplier broadcast onto the (partkey)-sized result."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    pick = (
        li.groupBy("l_partkey")
        .agg(F.min(F.struct("l_extendedprice", "l_suppkey")).alias("b"))
        .select(
            "l_partkey",
            F.col("b.l_extendedprice").alias("min_price"),
            F.col("b.l_suppkey").alias("s_suppkey"),
        )
    )
    return (
        pick.join(F.broadcast(p), pick.l_partkey == p.p_partkey)
        .join(F.broadcast(s), "s_suppkey")
        .select(
            "p_partkey",
            "p_name",
            F.col("min_price").cast("double").alias("min_price"),
            F.col("s_name").alias("supplier"),
        )
    )


@query(
    "grouping_sets_returnflag_status",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q_grouping_sets(spark, sf_dir):
    """GROUPING SETS breadth (beyond the cube/rollup siblings): an
    explicit lattice of (flag, status) / (flag) / () with grouping_id
    disambiguation — one Expand + one aggregate, no per-set rescans."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
    )


@query(
    "shipmode_priority_q12",
    """
    SELECT l_linestatus AS linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def q_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape (shipping modes / order priority): one year of
    shipped lineitems, counted into high/low priority per linestatus
    (this data's stand-in for l_shipmode).

    Scale: the shipdate range filter pushes to the lineitem scan
    (PushedFilters); the orders side projects ONLY (o_orderkey,
    o_orderpriority) before the orderkey shuffle join; the conditional
    counts are map-side-combining sums over a 2-value group key, so the
    final exchange carries a handful of rows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    ).select("l_orderkey", "l_linestatus")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "promo_revenue_q14",
    f"""
    SELECT CAST(round(
             100.0 * sum(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} END)
             / sum({_REV_SQL}), 6) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1997-03-01'
      AND l_shipdate < DATE '1997-04-01'
    """,
)
def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect): the share of one month's
    revenue from PROMO-type parts.

    Scale: part broadcasts (dimension), so the month-filtered lineitem
    never shuffles — the whole query is scan -> broadcast join -> one
    all-to-one aggregate of two DECIMAL partial sums (exact arithmetic;
    the single division happens once at the end, so the oracle matches
    bit-for-bit after round 6)."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date"))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", _revenue()))
                / F.sum(_revenue()),
                6,
            )
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


# Q19's OR-of-conjuncts between fact and dim columns — each branch a
# (brand, size-range, quantity-range) conjunction
_Q19_SQL = """
    (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 10 AND 30)
    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 45
       AND l_quantity BETWEEN 20 AND 40)
"""


@query(
    "disjunctive_pushdown_q19",
    f"""
    SELECT CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE {_Q19_SQL}
    """,
)
def q_disjunctive_pushdown(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    revenue over an OR of three (brand AND size-range AND
    quantity-range) conjunctions that each span BOTH join sides.

    Scale: Catalyst factors the single-side implications out of the
    disjunction — `p_brand IN (12,23,34) AND p_size BETWEEN 1 AND 45`
    prunes the part build side and `l_quantity BETWEEN 1 AND 40` pushes
    to the lineitem scan (constraint propagation; the plan test pins
    PushedFilters on both scans) — then the full OR evaluates as the
    join's residual condition. Part broadcasts; no shuffle at all
    before the final one-row aggregate."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    cond = (
        branch("Brand#12", 15, 1, 21)
        | branch("Brand#23", 30, 10, 30)
        | branch("Brand#34", 45, 20, 40)
    )
    return joined.filter(cond).agg(
        F.sum(_revenue()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q6_SQL = """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@query("forecast_revenue_q6_sql", _Q6_SQL)
def q_forecast_revenue_sql(spark, sf_dir):
    """TPC-H Q6 shape (forecasting revenue change) submitted through
    the SQL FRONT DOOR: the table registers as a temp view and the
    IDENTICAL SQL text runs on both engines — demonstrating that the
    engine's `spark.sql` surface accepts the ANSI dialect the oracle
    speaks (Catalyst plans the same scan-filter-aggregate as the
    DataFrame API; every filter pushes to the scan).

    Scale: no joins, no shuffle — pushed scan plus a one-row
    map-side-combined DECIMAL aggregate."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q6_SQL)


@query(
    "order_priority_checking_q4",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= DATE '1997-01-01'
      AND o_orderdate < DATE '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q_order_priority_checking(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking): orders in one quarter
    having at least one lineitem shipped after the order date, counted
    by priority — the EXISTS/semi-join report.

    Scale: the correlated EXISTS is a LEFT SEMI join on orderkey (one
    shuffle of the date-filtered orders against the ship-filtered
    lineitems — each order matches at most once no matter how many
    qualifying lines); counts aggregate map-side over the 5-value
    priority key. The non-equi part (l_shipdate > o_orderdate) rides
    the semi join as its residual condition."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    qualified = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return qualified.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "parts_supplier_counts_q16",
    """
    SELECT p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#2'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_type, p_size
    """,
)
def q_parts_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): distinct
    suppliers per (type, size) for selected part shapes, excluding a
    complaint-list of suppliers — the NOT-IN + count-distinct report.

    Scale: the brand/size filters push to the part scan; part
    broadcasts; the NOT IN compiles to a LEFT ANTI join against the
    (tiny, filtered) supplier exclusion list — broadcast too, so the
    fact side's only shuffle is the final two-phase distinct
    aggregation on the grouped keys. (The exclusion list is guaranteed
    non-null-keyed, so anti-join and NOT IN agree — the classic NOT IN
    null trap does not arise.)"""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_type", "p_size")
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad_supp), "l_suppkey", "left_anti")
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "important_stock_q11",
    """
    WITH pv AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2))) AS value
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT sum(value) AS t, count(*) AS np FROM pv)
    SELECT l_partkey, CAST(value AS DOUBLE) AS value
    FROM pv CROSS JOIN tot
    WHERE value * np * 2 > 3 * t
    """,
)
def q_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (important stock identification): parts whose
    inventory value exceeds 1.5x THE MEAN part value — the
    global-threshold HAVING pattern (Q11 proper uses a fixed fraction
    scaled by SF; the mean-relative cut keeps the result non-empty and
    meaningful at every test SF).

    Scale: one map-side-combining groupBy builds the per-part values;
    the total and count are a ONE-ROW aggregate broadcast back (never
    a recomputation of the group sums, never a driver collect); the
    threshold comparison `value * np * 2 > 3 * t` (1.5x as an integer
    ratio) stays in exact DECIMAL/
    BIGINT — no float fraction at the cut boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast(DEC) * F.col("l_quantity").cast(DEC)
        ).alias("value")
    )
    tot = pv.agg(F.sum("value").alias("t"), F.count(F.lit(1)).alias("np"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("value") * F.col("np") * 2 > 3 * F.col("t"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


@query(
    "large_volume_customers_q18",
    """
    WITH big AS (
      SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(b.total_qty AS DOUBLE) AS total_qty
    FROM big b
    JOIN orders ON o_orderkey = b.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
)
def q_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): the top-20 orders by
    total quantity above a threshold, with their customers.

    Scale: the HAVING aggregation runs FIRST on the fact table (one
    orderkey shuffle with map-side partial sums), shrinking to the few
    qualifying orders before any dimension joins — orders and customer
    then broadcast onto that small set; top-20 with total order is
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


@query(
    "volume_shipping_q7",
    f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def q_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): bilateral trade volume between
    two nations by ship year — the two-role nation join (supplier's
    nation vs customer's nation from the same dim table).

    Scale: both nation roles and supplier/customer broadcast (the
    nation-pair predicate prunes suppliers and customers BEFORE the
    broadcast, so the hash tables carry only the two nations' rows);
    lineitem therefore shuffles exactly once, on l_orderkey, to meet
    orders. The date range pushes to the lineitem scan."""
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@query(
    "market_share_q8",
    f"""
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(sum(rev) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             {_REV_SQL} AS rev,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND p_type = 'PROMO'
        AND o_orderdate >= DATE '1996-01-01'
        AND o_orderdate < DATE '1998-01-01'
    ) t
    GROUP BY o_year
    """,
)
def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): NATION_7's share of ASIA
    PROMO-part revenue per order year — conditional share-of-total over
    a star join.

    Scale: part/customer/supplier/nation/region all broadcast (p_type
    and region filters shrink them before the build side), lineitem
    shuffles once on l_orderkey. The share divides two exact DECIMAL
    sums after a single aggregation — numerator via CASE, never a
    second pass — and the double division is performed identically by
    both engines on exact operands."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    cn = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("cnk")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .select("c_custkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    zero = F.lit("0").cast(DEC)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", _revenue())
                    .otherwise(zero)
                ).cast("double")
                / F.sum(_revenue()).cast("double")
            ).alias("mkt_share")
        )
    )


@query(
    "product_profit_q9",
    """
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))
                    - CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(0.5 AS DECIMAL(2,1))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit): profit on red parts by
    supplier nation and order year. The testdata has no partsupp, so
    supply cost is modeled as half the part's retail price — the shape
    (fact joined to part + supplier + nation + orders, profit as a
    price-minus-cost expression, two-level groupBy) is Q9's.

    Scale: part (name-filtered), supplier, nation broadcast; lineitem
    shuffles once on l_orderkey for the orders join (orders is the
    only non-dim side). Profit arithmetic is exact DECIMAL throughout
    (0.5 is an exact decimal literal), so group sums are
    order-independent."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    amount = (
        F.col("l_extendedprice").cast(DEC)
        * (1 - F.col("l_discount").cast(DEC))
        - F.col("p_retailprice").cast(DEC)
        * F.col("l_quantity").cast(DEC)
        * F.lit("0.5").cast("decimal(2,1)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


@query(
    "customer_distribution_q13",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) co
    GROUP BY c_count
    """,
)
def q_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape (customer distribution): histogram of per-
    customer order counts, excluding one priority class — the classic
    left-outer-join + double aggregation. (Q13 proper excludes by an
    o_comment pattern; the testdata has no comment column, so the
    exclusion predicate is the priority class.)

    Scale: instead of the literal customer LEFT JOIN orders (which
    shuffles the full customer table against raw orders and carries
    customer payload through the join), orders pre-aggregates to
    (custkey, n) FIRST — one map-side-combining shuffle of keys only —
    and customers left-join that small per-customer count table;
    missing customers coalesce to 0. Same result, strictly less data
    moved: the histogram then aggregates ~1 row per customer."""
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "top_supplier_q15",
    f"""
    WITH rev AS (
      SELECT l_suppkey, sum({_REV_SQL}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01'
        AND l_shipdate < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): supplier(s) whose quarterly
    revenue equals the global maximum — the view + scalar-max-subquery
    pattern, with ties preserved exactly as Q15 requires.

    Scale: one map-side-combining groupBy builds per-supplier revenue;
    the global max is a ONE-ROW aggregate of that small table,
    broadcast back for the equality filter (never a global sort, never
    a driver collect); the equality is exact because revenue is an
    exact DECIMAL sum. Supplier names broadcast onto the winners."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_revenue()).alias("total_revenue"))
        # rev feeds BOTH the one-row max (broadcast) and the equality
        # filter — cache it so the lineitem scan+agg runs once
        .localCheckpoint(eager=False)
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .orderBy("s_suppkey")
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@query(
    "small_quantity_revenue_q17",
    """
    WITH pa AS (
      SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS s,
             count(*) AS c
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7
           AS avg_yearly
    FROM lineitem l
    JOIN part ON p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p_brand = 'Brand#3'
      AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * c < s
    """,
)
def q_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): revenue lost if
    orders below 20% of a part's average quantity were not taken — the
    correlated-average-subquery report, decorrelated into a per-part
    aggregate join.

    Scale: the per-part (sum, count) table is ONE map-side-combining
    shuffle of (partkey, qty) pairs; the brand-filtered fact side joins
    it on partkey (AQE picks broadcast when the filtered side is
    small). The 20%-of-average cut is exact integer/DECIMAL arithmetic
    (qty*5*count < sum — no float average at the boundary), and the
    final scalar is a one-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    ).select("p_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == pa.pk)
        .filter(F.col("l_quantity").cast(DEC) * 5 * F.col("c") < F.col("s"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7
            ).alias("avg_yearly")
        )
    )


@query(
    "potential_promotion_q20",
    """
    WITH spq AS (
      SELECT l_suppkey, l_partkey,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
      GROUP BY l_suppkey, l_partkey
    ),
    pt AS (SELECT l_partkey, sum(sq) AS tq FROM spq GROUP BY l_partkey)
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM spq JOIN pt USING (l_partkey) WHERE sq * 5 > tq
    )
    ORDER BY s_suppkey
    """,
)
def q_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion): suppliers holding a
    dominant share (>20%) of any 'small%' part's shipped volume — the
    nested-IN-subqueries pattern. (Q20 proper compares partsupp
    availability to half the shipped quantity; without partsupp the
    dominance test compares each supplier's shipped volume to the
    part's total, preserving the two-level aggregate + IN shape.)

    Scale: one (suppkey, partkey) groupBy over the name-filtered fact
    rows, then a partkey re-aggregation of THAT small table for the
    totals — never a second pass over lineitem; the qualifying-supplier
    id set is distinct-ed and broadcast into a LEFT SEMI join against
    supplier. Share test in exact DECIMAL."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    spq = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("sq"))
    )
    pt = spq.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("sq").alias("tq")
    )
    winners = (
        spq.join(pt, spq.l_partkey == pt.pk)
        .filter(F.col("sq") * 5 > F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(
            F.broadcast(winners),
            s.s_suppkey == winners.l_suppkey,
            "left_semi",
        )
        .orderBy("s_suppkey")
        .select("s_suppkey", "s_name")
    )


@query(
    "waiting_orders_q21",
    """
    SELECT s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_waiting_orders(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): on finished
    multi-supplier orders, the supplier who was the ONLY late one —
    EXISTS plus NOT-EXISTS both correlated to the same fact table.
    (Late = shipped >60 days after the order date; the testdata has no
    commit/receipt dates.)

    Scale: the late-line table (lineitem joined to status-F orders on
    orderkey — the fact shuffle, date residual rides the join) is
    computed ONCE and reused for both the outer rows and the
    NOT-EXISTS side; the EXISTS compiles to a LEFT SEMI and the
    NOT-EXISTS to a LEFT ANTI join, both on l_orderkey with the
    suppkey-inequality residual — each a key-only shuffle of slim
    (orderkey, suppkey) projections, never a count-all-pairs. Supplier
    names broadcast; top-20 is TakeOrderedAndProject."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).select("l_orderkey", "l_suppkey")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3")
    )
    only_late = (
        late.join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        only_late.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "dormant_customers_q22",
    """
    WITH in_scope AS (
      SELECT c_custkey, c_nationkey,
             CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ),
    pos AS (
      SELECT sum(bal) AS t, count(*) AS c FROM in_scope WHERE bal > 0
    )
    SELECT c_nationkey AS cntrycode,
           count(*) AS numcust,
           CAST(sum(bal) AS DOUBLE) AS totacctbal
    FROM in_scope CROSS JOIN pos
    WHERE bal * c > t
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = in_scope.c_custkey
          AND o.o_orderdate >= DATE '2000-01-01'
      )
    GROUP BY c_nationkey
    """,
)
def q_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): well-funded
    customers in selected countries with no recent orders — scalar
    average subquery + NOT EXISTS anti-join, grouped by country code.
    (The testdata has no phone column, so the country code is the
    nation key, and "never ordered" — empty at test SFs — becomes "no
    order since 2000".)

    Scale: the positive-balance average is a ONE-ROW aggregate of the
    nation-filtered customer slice, broadcast back; the above-average
    test multiplies through by the count so it stays in exact DECIMAL
    (no float average at the boundary). The NOT EXISTS is a LEFT ANTI
    join against the date-filtered orders keys — the only shuffle, on
    custkey, of slim key columns."""
    in_scope = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .select(
            "c_custkey",
            "c_nationkey",
            F.col("c_acctbal").cast(DEC).alias("bal"),
        )
    )
    pos = in_scope.filter(F.col("bal") > 0).agg(
        F.sum("bal").alias("t"), F.count(F.lit(1)).alias("c")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("date"))
        .select("o_custkey")
    )
    return (
        in_scope.crossJoin(F.broadcast(pos))
        .filter(F.col("bal") * F.col("c") > F.col("t"))
        .join(recent, in_scope.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
    )


_Q6_PARAM_SQL = """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= :ship_lo
      AND l_shipdate < :ship_hi
      AND l_discount BETWEEN :disc_lo AND :disc_hi
      AND l_quantity < :qty_cap
"""


@query(
    "parameterized_sql_q6",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_parameterized_sql(spark, sf_dir):
    """Q6 submitted through PARAMETERIZED SQL (`spark.sql(query,
    args=...)`, named-marker form): the engine's answer to prepared
    statements — parameters bind as typed literals at analysis time
    (never string interpolation, so no injection surface and full
    constant-folding/pushdown), which is how a serving layer should
    template the date/discount knobs of a canned report. Same plan,
    same pushed filters as the literal form; the oracle states the
    bound values inline."""
    import datetime

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        _Q6_PARAM_SQL,
        args={
            "ship_lo": datetime.date(1997, 1, 1),
            "ship_hi": datetime.date(1998, 1, 1),
            "disc_lo": 0.05,
            "disc_hi": 0.07,
            "qty_cap": 24,
        },
    )
