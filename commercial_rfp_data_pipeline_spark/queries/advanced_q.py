"""Advanced relational breadth: as-of join, bucketized range join,
extended window functions, exact/approx distinct, percentiles —
operators Spark lacks as single builtins, re-expressed with the
idiomatic scalable compositions (pyspark guide: common OLAP patterns).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.registry import query

DEC = "decimal(12,2)"


@query(
    "asof_join_last_signup_before_purchase",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'signup' THEN ts END AS signup_ts
      FROM events WHERE event_type IN ('signup', 'purchase')
    ),
    filled AS (
      SELECT user_id, ts, event_id, event_type,
             max(signup_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
      FROM tagged
    )
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, last_signup_ts
    FROM filled WHERE event_type = 'purchase'
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join (Spark has no native one): for each purchase, the
    most recent signup of the same user at or before it — via the
    union-sort-carry-forward pattern: tag both streams, one window per
    user carrying the running max signup ts. ONE shuffle on user_id,
    no range explosion — the scalable as-of form (vs per-group
    merge_asof or a theta join)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
    )
    tagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("signup_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = tagged.withColumn("last_signup_ts", F.max("signup_ts").over(w))
    return filled.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "last_signup_ts",
    )


@query(
    "range_join_events_within_1h",
    """
    WITH e AS (
      SELECT user_id, event_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events WHERE event_type = 'click'
    )
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
           b.sec - a.sec AS gap_s
    FROM e a JOIN e b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND b.sec - a.sec BETWEEN 0 AND 3600
    """,
)
def q_range_join(spark, sf_dir):
    """Range join via time-bucketing: pairs of clicks by the same user
    within 1 hour. Spark side joins on (user_id, bucket) with each
    left row exploded into its bucket and the next (candidate windows),
    then filters the exact range — turning an unbounded theta join into
    an equi-join with 2x fanout. The oracle states the naive theta
    form; results are identical."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.unix_timestamp("ts").alias("sec"),
        )
        .withColumn("bucket", (F.col("sec") / 3600).cast("bigint"))
    )
    # right side: event b listed under its own bucket and the previous
    # one, so any a with sec within 3600s of b shares a bucket with it
    b = e.select(
        F.col("user_id").alias("user_id_b"),
        F.col("event_id").alias("id_b"),
        F.col("sec").alias("sec_b"),
        F.explode(F.array(F.col("bucket"), F.col("bucket") - 1)).alias("bucket"),
    )
    joined = e.join(
        b,
        (e.user_id == b.user_id_b) & (e.bucket == b.bucket),
    ).filter(
        (F.col("event_id") < F.col("id_b"))
        & ((F.col("sec_b") - F.col("sec")).between(0, 3600))
    )
    return joined.select(
        "user_id",
        F.col("event_id").alias("id_a"),
        "id_b",
        (F.col("sec_b") - F.col("sec")).alias("gap_s"),
    ).distinct()


@query(
    "window_function_breadth",
    """
    SELECT o_orderkey, o_custkey,
           dense_rank() OVER w AS drk,
           ntile(4) OVER w AS quartile,
           lead(o_orderkey) OVER w AS next_orderkey,
           round(percent_rank() OVER w, 6) AS prk,
           round(cume_dist() OVER w, 6) AS cd,
           first_value(o_orderkey) OVER w AS first_ok,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_breadth(spark, sf_dir):
    """§2.7 breadth: dense_rank / ntile / lead / percent_rank /
    cume_dist / first+last value — all sharing one exchange+sort."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.round(F.percent_rank().over(w), 6).alias("prk"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(wfull).alias("last_ok"),
    )


@query(
    "distinct_counts_exact",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_distinct_exact(spark, sf_dir):
    """A3-shape exact distinct counts (two-phase shuffle at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query("distinct_counts_approx", None)
def q_distinct_approx(spark, sf_dir):
    """HyperLogLog++ approximate distinct — the single-pass scale
    alternative (rows-only: sketch estimates are engine-specific;
    tests bound the error vs the exact query)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("n_parts_approx"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "percentiles_exact",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    quantile_cont). percentile_approx is the sketch path at scale."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


@query(
    "salted_skew_aggregation",
    """
    SELECT l_returnflag,
           n,
           CAST(sum_qty AS DOUBLE) AS sum_qty,
           CAST(max_price AS DOUBLE) AS max_price
    FROM (
      SELECT l_returnflag, count(*) AS n,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
             max(l_extendedprice) AS max_price
      FROM lineitem GROUP BY l_returnflag
    )
    """,
)
def q_salted_agg(spark, sf_dir):
    """Skew-safe two-phase aggregation on a genuinely hot key
    (l_returnflag: 3 values over 600k rows — a 3-reducer bottleneck in
    a naive plan). The salted result is EXACTLY the plain groupBy
    (which is the oracle); only the shuffle layout differs — the hot
    key's rows spread over 16 salt buckets before combining."""
    from commercial_rfp_data_pipeline_spark.operators.skew import (
        salted_two_phase_agg,
    )

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "l_qty_dec", F.col("l_quantity").cast(DEC)
    )
    out = salted_two_phase_agg(
        li,
        keys=["l_returnflag"],
        salt_src="l_orderkey",
        aggs={
            "n": ("l_quantity", "count"),
            "sum_qty": ("l_qty_dec", "sum"),
            "max_price": ("l_extendedprice", "max"),
        },
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        "n",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("max_price").cast("double").alias("max_price"),
    )


# Zipf-hot-key fixture: 90% of lineitem rows collapse onto key 0, the
# rest spread over ~100 tail keys — the adversarial distribution the
# skew toolkit exists for (manufactured deterministically from
# l_orderkey so the oracle states the same mapping).
_ZIPF_KEY_SQL = "CASE WHEN l_orderkey % 10 < 9 THEN 0 ELSE l_orderkey % 1000 END"
# distinct payload: a row-unique 256-char value (md5 widened 8x,
# standing in for the URLs/doc-keys real dedup counts) — the hot key
# then owns ~90% of ALL distinct values, so the naive single-reducer
# set merge carries the real payload, not a 20k-int toy set
_ZIPF_UID_SQL = (
    "repeat(md5(CAST(l_orderkey AS VARCHAR) || '|' "
    "|| CAST(l_linenumber AS VARCHAR)), 8)"
)
_ZIPF_DISTINCT_ORACLE = f"""
    SELECT CAST({_ZIPF_KEY_SQL} AS BIGINT) AS hot_key,
           count(DISTINCT {_ZIPF_UID_SQL}) AS n_vals
    FROM lineitem GROUP BY 1
    """


def _zipf_keyed(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    hot = (
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(0))
        .otherwise(F.col("l_orderkey") % 1000)
        .cast("long")
    )
    uid = F.repeat(
        F.md5(
            F.concat_ws(
                "|",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ),
        8,
    )
    return li.select(hot.alias("hot_key"), uid.alias("uid"))


@query("skew_zipf_distinct_plain", _ZIPF_DISTINCT_ORACLE)
def q_skew_zipf_plain(spark, sf_dir):
    """The NAIVE skewed shape, kept as the bench contrast for the
    salted form below: per-key distinct via a set-building aggregate.
    collect_set partials for the hot key still carry ~the whole value
    set to ONE reducer, which merges 90% of the data single-threaded —
    the reducer-bottleneck this fixture manufactures on purpose.
    BENCH_r* records this row next to skew_zipf_distinct_salted; at
    local[32]/sf0.1 the in-memory shuffle keeps the absolute gap small
    (~140 MB hot merge), so the load-bearing evidence is the oracle
    equivalence plus scripts/scale_smoke.py's growth curve — the hot
    reducer's work grows with corpus size while the salted form's
    per-reducer work stays 1/n_salts of it."""
    keyed = _zipf_keyed(spark, sf_dir)
    return keyed.groupBy("hot_key").agg(
        F.size(F.collect_set("uid")).cast("long").alias("n_vals")
    )


@query("skew_zipf_distinct_salted", _ZIPF_DISTINCT_ORACLE)
def q_skew_zipf_salted(spark, sf_dir):
    """Skew-safe distinct count over the same Zipf fixture: salt by
    hash(l_partkey) so equal values share a salt, per-(key, salt)
    distinct counts are disjoint, and their sum is exact. The hot key's
    set construction spreads over 16 reducers; results are EXACTLY the
    plain form's (both check against the same count(DISTINCT)
    oracle)."""
    from commercial_rfp_data_pipeline_spark.operators.skew import (
        salted_distinct_count,
    )

    keyed = _zipf_keyed(spark, sf_dir)
    return salted_distinct_count(
        keyed, keys=["hot_key"], distinct_col="uid", n_salts=16, out_col="n_vals"
    )


@query(
    "cube_aggregation",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
    )


@query(
    "salted_skew_join",
    """
    SELECT p_brand,
           count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_salted_join(spark, sf_dir):
    """Skew-safe equi-join: the fact side salts its key with a hash of
    a sibling column, the dim side replicates n_salts times, and the
    join runs on (key, salt) so a hot key's rows spread over n_salts
    reducers. Results are EXACTLY the plain join+aggregate (the
    oracle); only the shuffle layout changes. Broadcast is disabled for
    the joined dim via a no-broadcast hint-free shuffle requirement at
    real scale — here the plan shape is asserted in tests."""
    from commercial_rfp_data_pipeline_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", F.col("l_quantity").cast(DEC).alias("l_qty_dec")
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = salted_join(li, part, key="l_partkey", salt_src="l_orderkey", n_salts=8)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("l_qty_dec").cast("double").alias("sum_qty"),
    )


@query(
    "scd2_customer_order_intervals",
    """
    SELECT o_custkey AS custkey, o_orderkey,
           CAST(o_orderdate AS VARCHAR) AS valid_from,
           CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS VARCHAR) AS valid_to,
           CAST(o_totalprice AS DOUBLE) AS attr_value,
           lead(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
    FROM orders
    """,
)
def q_scd2_intervals(spark, sf_dir):
    """SCD-type-2 interval construction — turn a change stream into
    effective-dated dimension rows: each record's validity runs until
    the key's next change (lead over (key, change-date, tiebreak));
    the open interval is the current row. One window shuffle on the
    key, the warehouse-standard upsert primitive the reference's
    truncate-and-rebuild sinks would evolve into at scale."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.col("o_orderdate").cast("string").alias("valid_from"),
        nxt.cast("string").alias("valid_to"),
        F.col("o_totalprice").cast("double").alias("attr_value"),
        nxt.isNull().alias("is_current"),
    )


@query("percentiles_approx", None)
def q_percentiles_approx(spark, sf_dir):
    """Greenwald-Khanna approximate percentiles — the single-pass
    mergeable-sketch path for 100-TB quantiles (exact interpolated
    percentiles shuffle every value per group; the sketch is fixed
    size per accuracy). Rows-only: sketch outputs are engine-specific;
    pytest bounds the error against percentiles_exact."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("p50_approx"),
        F.percentile_approx("o_totalprice", F.lit(0.9), F.lit(10000)).alias("p90_approx"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "hll_manual_distinct",
    """
    WITH est AS (WITH hashed AS (
      SELECT l_returnflag,  substr(h, 1, 2) AS bucket,
             CASE WHEN length(regexp_replace(substr(h, 3, 6), '^0+', '', 'g')) = 0
                  THEN 25
                  ELSE (6 - length(regexp_replace(substr(h, 3, 6), '^0+', '', 'g'))) * 4
                       + CASE substr(regexp_replace(substr(h, 3, 6), '^0+', '', 'g'), 1, 1)
                           WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 ELSE 0 END
                       + 1
             END AS rho
      FROM (SELECT l_returnflag,  md5(CAST(l_orderkey AS VARCHAR)) AS h
            FROM lineitem)
    ),
    regs AS (
      SELECT l_returnflag,  bucket, max(rho) AS r
      FROM hashed GROUP BY l_returnflag, bucket
    )
    SELECT l_returnflag, 
           round(47072.71267120224 / (sum(power(2.0, -r)) + (256 - count(*))), 3)
             AS hll_estimate
    FROM regs GROUP BY l_returnflag),
    ex AS (
      SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_distinct
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT e.l_returnflag, exact_distinct, hll_estimate
    FROM est e JOIN ex ON e.l_returnflag = ex.l_returnflag
    """,
)
def q_hll_manual(spark, sf_dir):
    """Deterministic hand-rolled HyperLogLog (p=8, m=256) whose
    register states and estimate REPRODUCE in the oracle — upgrading
    the approx-distinct family from rows-only to a full value-hash
    check (`distinct_counts_approx` keeps covering the built-in HLL++
    path). Buckets are md5 hex prefixes and ranks come from hex-digit
    string ops, so no engine-specific hashing or hex->int conversion
    is involved; the estimate's 2^-r sum is exact in doubles and
    order-independent.

    Scale: ONE map-side-combining groupBy builds <= groups x 256
    registers from the full column; the estimate aggregates that tiny
    register table. The exact countDistinct rides along for the error
    comparison (at 100 TB you would run ONLY the sketch — that is the
    point)."""
    from commercial_rfp_data_pipeline_spark.operators.sketch import (
        hll_estimate,
    )

    li = load_table(spark, sf_dir, "lineitem")
    est = hll_estimate(li, "l_orderkey", ["l_returnflag"])
    ex = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_distinct")
    )
    return est.join(ex, "l_returnflag").select(
        "l_returnflag", "exact_distinct", "hll_estimate"
    )


@query(
    "kmv_distinct_set_ops",
    """
    WITH uid AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE event_type IN ('click', 'purchase')
    ),
    h AS (
      SELECT event_type,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM uid
    ),
    mink AS (
      SELECT event_type, h FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM h
      ) WHERE rn <= 10
    ),
    arr AS (SELECT event_type, list(h ORDER BY h) AS hs FROM mink GROUP BY event_type),
    ab AS (
      SELECT a.hs AS ha, b.hs AS hb
      FROM (SELECT hs FROM arr WHERE event_type = 'click') a
      CROSS JOIN (SELECT hs FROM arr WHERE event_type = 'purchase') b
    ),
    u AS (
      SELECT ha, hb,
             list_sort(list_distinct(flatten([ha, hb])))[1:10] AS hu
      FROM ab
    ),
    est AS (
      SELECT
        CASE WHEN len(ha) < 10 THEN CAST(len(ha) AS DOUBLE)
             ELSE 9.0 * 1152921504606846976.0 / CAST(ha[10] AS DOUBLE) END AS est_a,
        CASE WHEN len(hb) < 10 THEN CAST(len(hb) AS DOUBLE)
             ELSE 9.0 * 1152921504606846976.0 / CAST(hb[10] AS DOUBLE) END AS est_b,
        CASE WHEN len(hu) < 10 THEN CAST(len(hu) AS DOUBLE)
             ELSE 9.0 * 1152921504606846976.0 / CAST(hu[10] AS DOUBLE) END AS est_union,
        CAST(len(list_intersect(hu, list_intersect(ha, hb))) AS DOUBLE)
          / len(hu) AS jacc
      FROM u
    )
    SELECT 10 AS k, round(est_a, 4) AS est_a, round(est_b, 4) AS est_b,
           round(est_union, 4) AS est_union, round(jacc, 4) AS jaccard,
           round(jacc * est_union, 4) AS est_intersection
    FROM est
    """,
)
def q_kmv_set_ops(spark, sf_dir):
    """KMV sketches support what HLL cannot: INTERSECTION estimates.
    Distinct click-users and purchase-users sketch to their 10 smallest
    60-bit hashes (two-phase salted k-min — no task holds a full
    distinct set); the union sketch is the k smallest of the merged
    arrays, and |A∩B| estimates as jaccard(K) * |A∪B|-estimate. Every
    hash is md5-derived, so sketch contents AND estimates value-hash
    against the oracle."""
    from commercial_rfp_data_pipeline_spark.operators.sketch import (
        kmv_estimate,
        kmv_sketch,
    )

    K = 10
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    arr = kmv_sketch(ev, "user_id", ["event_type"], k=K)
    a = arr.filter(F.col("event_type") == "click").select(
        F.col("hs").alias("ha")
    )
    b = arr.filter(F.col("event_type") == "purchase").select(
        F.col("hs").alias("hb")
    )
    u = a.crossJoin(b).withColumn(
        "hu", F.slice(F.array_sort(F.array_union("ha", "hb")), 1, K)
    )
    est = u.select(
        kmv_estimate(F.col("ha"), K).alias("est_a"),
        kmv_estimate(F.col("hb"), K).alias("est_b"),
        kmv_estimate(F.col("hu"), K).alias("est_union"),
        (
            F.size(F.array_intersect("hu", F.array_intersect("ha", "hb"))).cast(
                "double"
            )
            / F.size("hu")
        ).alias("jacc"),
    )
    return est.select(
        F.lit(K).alias("k"),
        F.round("est_a", 4).alias("est_a"),
        F.round("est_b", 4).alias("est_b"),
        F.round("est_union", 4).alias("est_union"),
        F.round("jacc", 4).alias("jaccard"),
        F.round(F.col("jacc") * F.col("est_union"), 4).alias("est_intersection"),
    )


@query(
    "cms_selfjoin_size_estimate",
    """
    WITH k AS (SELECT CAST(l_partkey AS VARCHAR) AS v FROM lineitem),
    exact AS (
      SELECT CAST(sum(c * c) AS BIGINT) AS exact_size FROM (
        SELECT count(*) AS c FROM k GROUP BY v
      )
    ),
    seeds AS (SELECT unnest(['cms0','cms1','cms2','cms3']) AS j),
    counters AS (
      SELECT j, substr(md5(j || ':' || v), 1, 2) AS col, count(*) AS n
      FROM k CROSS JOIN seeds GROUP BY j, substr(md5(j || ':' || v), 1, 2)
    ),
    est AS (
      SELECT min(ip) AS cms_estimate FROM (
        SELECT j, CAST(sum(n * n) AS BIGINT) AS ip FROM counters GROUP BY j
      )
    )
    SELECT exact_size, cms_estimate,
           round(CAST(cms_estimate - exact_size AS DOUBLE) / exact_size, 6)
             AS rel_overestimate
    FROM exact CROSS JOIN est
    """,
)
def q_cms_join_size(spark, sf_dir):
    """Optimizer-statistics primitive: estimate the lineitem self-join
    size on partkey (sum of squared key frequencies — the quantity
    that predicts pair-generation blowup in every dedup/self-join
    plan) from a 4x256 count-min sketch via the inner-product
    estimator, next to the exact value. The sketch costs one bounded
    groupBy however large the table; the estimate is a provable
    overestimate with additive error <= N^2/w (CM inner-product
    bound — rel_overestimate >= 0; the oracle value-checks both
    numbers and the error, and widening w tightens it linearly)."""
    from commercial_rfp_data_pipeline_spark.operators.sketch import (
        cms_counters,
        cms_inner_product,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("string").alias("v")
    )
    exact = (
        li.groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("exact_size"))
    )
    counters = cms_counters(li, "v")
    est = cms_inner_product(counters, counters)
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_size",
        "cms_estimate",
        F.round(
            (F.col("cms_estimate") - F.col("exact_size")).cast("double")
            / F.col("exact_size"),
            6,
        ).alias("rel_overestimate"),
    )


@query(
    "asof_join_forward_next_error",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'error' THEN ts END AS err_ts,
             CASE WHEN event_type = 'error' THEN event_id END AS err_id
      FROM events WHERE event_type IN ('error', 'click')
    ),
    filled AS (
      SELECT user_id, ts, event_id, event_type,
             min(err_ts) OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS next_err_ts
      FROM tagged
    )
    SELECT user_id, event_id AS click_id, ts AS click_ts, next_err_ts,
           CASE WHEN next_err_ts IS NOT NULL
                THEN CAST(floor(epoch(next_err_ts)) - floor(epoch(ts)) AS BIGINT)
           END AS secs_to_error
    FROM filled WHERE event_type = 'click'
    """,
)
def q_asof_forward(spark, sf_dir):
    """FORWARD as-of join: for each click, the same user's next error
    at or after it (time-to-failure attribution — the mirror of the
    backward as-of). Same union-sort-carry pattern with the window
    ordered DESCENDING carrying a running min of error timestamps:
    still ONE shuffle on user_id, no range explosion in either
    direction."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("error", "click")
    )
    tagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "error", F.col("ts")).alias("err_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = tagged.withColumn("next_err_ts", F.min("err_ts").over(w))
    return filled.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        "next_err_ts",
        F.when(
            F.col("next_err_ts").isNotNull(),
            (
                F.floor(F.unix_timestamp("next_err_ts"))
                - F.floor(F.unix_timestamp("ts"))
            ).cast("long"),
        ).alias("secs_to_error"),
    )


# multi-heavy-hitter distribution: five head keys (~10% each) over a
# ~500-key tail — manufactured deterministically from l_orderkey so
# the oracle states the same mapping (same pattern as the Zipf fixture)
_HH_KEY_SQL = (
    "CASE WHEN l_orderkey % 10 < 5 THEN l_orderkey % 5 "
    "ELSE 100 + l_orderkey % 499 END"
)
_HH_K = 16


@query(
    "heavy_hitters_spacesaving_exact",
    f"""
    WITH keyed AS (SELECT CAST({_HH_KEY_SQL} AS BIGINT) AS hot_key
                   FROM lineitem),
    n AS (SELECT count(*) AS n FROM keyed)
    SELECT hot_key, count(*) AS freq,
           round(count(*) / (SELECT CAST(n AS DOUBLE) FROM n), 6) AS share
    FROM keyed GROUP BY hot_key
    HAVING count(*) * {_HH_K} > (SELECT n FROM n)
    """,
)
def q_heavy_hitters(spark, sf_dir):
    """EXACT heavy hitters (freq > n/16) via the SpaceSaving two-pass:
    bounded-memory per-partition summaries (64 counters per task — the
    state is CONSTANT regardless of key cardinality) generate a
    candidate superset, an exact recount of candidates applies the
    threshold. The oracle is the direct GROUP BY HAVING over all keys,
    so hash equality proves the summary's completeness pigeonhole held
    (capacity > k -> no heavy hitter can be evicted from every
    partition summary). The fixture plants five ~10% head keys over a
    ~500-key tail."""
    from commercial_rfp_data_pipeline_spark.operators.sketch import (
        spacesaving_heavy_hitters,
    )

    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(
        F.when(F.col("l_orderkey") % 10 < 5, F.col("l_orderkey") % 5)
        .otherwise(F.lit(100) + F.col("l_orderkey") % 499)
        .cast("long")
        .alias("hot_key")
    )
    return spacesaving_heavy_hitters(keyed, "hot_key", k=_HH_K, capacity=64)
