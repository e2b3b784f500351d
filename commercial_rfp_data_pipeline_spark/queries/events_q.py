"""Event-time queries over ``events`` (event_id, ts, user_id,
event_type, value, props-JSON): tumbling/sliding windows,
sessionization, JSON extraction — the batch mirrors of the streaming
extension (streaming/windows.py). Window arithmetic is written with
explicit epoch math so the DuckDB oracle states the identical formula.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.registry import query

DEC = "decimal(12,2)"


@query(
    "events_tumbling_hourly",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def q_tumbling(spark, sf_dir):
    """Tumbling 1-hour windows (batch mirror of the streaming op)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    )


@query(
    "events_sliding_10m_5m",
    """
    WITH k AS (SELECT unnest(generate_series(0, 1)) AS k),
    slotted AS (
      SELECT e.event_type,
             CAST(to_timestamp(((CAST(floor(epoch(e.ts)) AS BIGINT) // 300) - k.k) * 300) AS TIMESTAMP) AS window_start,
             e.ts
      FROM events e CROSS JOIN k
    )
    SELECT window_start, event_type, count(*) AS n
    FROM slotted
    WHERE CAST(floor(epoch(ts)) AS BIGINT) < CAST(floor(epoch(window_start)) AS BIGINT) + 600
    GROUP BY window_start, event_type
    """,
)
def q_sliding(spark, sf_dir):
    """Sliding windows (10 min width, 5 min slide) via explicit slot
    arithmetic: each event lands in width/slide windows — explode k,
    shift the 5-min grid. Identical to F.window(ts,'10 minutes',
    '5 minutes') but stated formula-for-formula with the oracle."""
    e = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    out = e.select(
        "event_type",
        "ts",
        F.explode(F.sequence(F.lit(0), F.lit(1))).alias("k"),
    ).select(
        "event_type",
        "ts",
        F.timestamp_seconds(((epoch / 300).cast("bigint") - F.col("k")) * 300)
        .cast("timestamp_ntz")
        .alias("window_start"),
    )
    out = out.filter(
        F.unix_timestamp("ts") < F.unix_timestamp("window_start") + 600
    )
    return out.groupBy("window_start", "event_type").agg(F.count(F.lit(1)).alias("n"))


@query(
    "events_sessionization",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_sessionization(spark, sf_dir):
    """Batch sessionization: lag-gap flag + running sum = session id,
    30-minute gap. One shuffle on user_id; both windows share the
    exchange+sort (batch mirror of session_window streaming)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = e.select(
        "user_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)).alias(
            "new_session"
        ),
    )
    w2 = W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, 0)
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(w2).cast("bigint")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "events_json_extract",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(regexp_extract(props, '"k":\\s*([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def q_json_extract(spark, sf_dir):
    """Semi-structured extraction from the props JSON column (regexp
    form keeps engine and oracle byte-identical; production would use
    get_json_object / variant)."""
    e = load_table(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*([0-9]+)', 1).cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum(k).alias("sum_k")
    )


@query(
    "events_variant_extract",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k
    FROM events GROUP BY event_type
    """,
)
def q_variant_extract(spark, sf_dir):
    """The VARIANT-native semi-structured path events_json_extract's
    docstring promises: ``parse_json`` builds Spark 4's binary VARIANT
    encoding once per row, ``try_variant_get`` does typed extraction
    (malformed rows → NULL, never a job abort), then a plain relational
    aggregate over the extracted column. Against DuckDB's JSON
    extraction as the oracle — two engines, two storage encodings, one
    answer.

    Scale: this is the shape that replaces regexp/get_json_object at
    100 TB — VARIANT parses the document ONCE into a shredded binary
    form; every subsequent path access is an O(log fields) binary
    lookup, not a re-parse, and the whole expression stays inside
    whole-stage codegen. The aggregate itself is one map-side-combined
    groupBy on a low-cardinality key."""
    e = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    projected = e.select("event_type", k.alias("k"))
    return projected.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count_distinct("k").alias("n_distinct_k"),
    )


@query(
    "events_type_value_stats",
    """
    SELECT event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           CAST(min(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS min_value,
           CAST(max(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS max_value,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q_event_stats(spark, sf_dir):
    """Multi-aggregate profile incl. exact distinct — at scale
    count(DISTINCT) is the expensive path (two-phase shuffle);
    approx_count_distinct is the cheap alternative (separate op)."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value").cast(DEC)
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.min(v).cast("double").alias("min_value"),
        F.max(v).cast("double").alias("max_value"),
        F.sum(v).cast("double").alias("sum_value"),
    )


@query(
    "events_funnel_ordered",
    """
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY e.user_id)
    SELECT stage, n_users FROM (
      SELECT '1_view' AS stage, count(*) AS n_users FROM v
      UNION ALL SELECT '2_click', count(*) FROM c
      UNION ALL SELECT '3_purchase', count(*) FROM p
    )
    """,
)
def q_funnel(spark, sf_dir):
    """ORDERED funnel analysis (view -> click after the first view ->
    purchase after that click): per-user first-event anchors chained by
    strict event-time order — the product-analytics staple. Each stage
    is one filtered groupBy(min) plus an equi-join on user_id; at
    100 TB every join is user-keyed (no cross-stage explosion) and
    AQE broadcasts the shrinking stage tables."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    rows = (
        v.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("1_view").alias("stage"), "n_users")
        .unionByName(c.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("2_click").alias("stage"), "n_users"))
        .unionByName(p.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("3_purchase").alias("stage"), "n_users"))
    )
    return rows


@query(
    "events_retention_cohorts",
    """
    WITH firsts AS (SELECT user_id, CAST(min(ts) AS DATE) AS first_day
                    FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id,
             CAST(date_trunc('week', f.first_day) AS DATE) AS cohort_week,
             CAST((CAST(e.ts AS DATE) - f.first_day) // 7 AS INTEGER) AS week_no
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort_week AS VARCHAR) AS cohort_week, week_no,
           count(*) AS n_users
    FROM activity GROUP BY cohort_week, week_no
    """,
)
def q_retention_cohorts(spark, sf_dir):
    """Weekly retention-cohort matrix: users grouped by the week of
    their first event; each cell counts cohort members active N weeks
    later. One groupBy for first-seen, one user-keyed join, one
    distinct + groupBy — the growth-analytics staple, all user-keyed
    shuffles."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min("ts").cast("date").alias("first_day"))
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            F.date_trunc("week", F.col("first_day")).cast("date").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("first_day")) / 7
            ).cast("int").alias("week_no"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.col("cohort_week").cast("string").alias("cohort_week"), "week_no"
    ).agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "events_hourly_anomaly_zscores",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    stats AS (
      SELECT event_type,
             avg(n) AS mu,
             stddev_samp(n) AS sigma
      FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, CAST(h.h AS VARCHAR) AS hour, h.n,
           round((h.n - s.mu) / s.sigma, 6) AS zscore,
           round((h.n - s.mu) / s.sigma, 6) >= 3.0 AS is_anomaly
    FROM hourly h JOIN stats s USING (event_type)
    WHERE s.sigma > 0
    """,
)
def q_hourly_anomalies(spark, sf_dir):
    """Volume-anomaly detection: per-type hourly counts z-scored
    against that type's own mean/stddev — the monitoring staple. Two
    groupBys (hourly, then per-type stats over the tiny hourly table)
    and a broadcast-size join back; flagged rows are z >= 3."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    z = F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 6)
    return (
        hourly.join(stats, "event_type")
        .filter(F.col("sigma") > 0)
        .select(
            "event_type",
            F.col("h").cast("string").alias("hour"),
            "n",
            z.alias("zscore"),
            (z >= 3.0).alias("is_anomaly"),
        )
    )


@query(
    "events_hourly_gap_fill_locf",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             count(*) AS n,
             round(avg(value), 6) AS avg_value
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    spans AS (
      SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY event_type
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM spans
    ),
    joined AS (
      SELECT g.event_type, g.h, coalesce(x.n, 0) AS n, x.avg_value
      FROM grid g LEFT JOIN hourly x USING (event_type, h)
    )
    SELECT event_type, h AS window_start, n,
           (n = 0) AS gap_filled,
           last_value(avg_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS avg_value_locf
    FROM joined
    """,
)
def q_hourly_gap_fill(spark, sf_dir):
    """Time-series regularization: per-type hourly counts on a DENSE
    hour grid — missing hours materialize as n=0 rows and the metric
    carries forward (last observation, LOCF), the resample/fill step
    every monitoring or feature pipeline needs before modeling.

    Scale: the grid generates from each key's (min, max) span — one
    aggregate + sequence/explode, NOT a calendar cross join; the fill
    join is per-key equi-join, and LOCF is one window over (key, hour)
    — a single shuffle on the key, ordered scan within partitions."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )
    spans = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = spans.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    joined = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.coalesce("n", F.lit(0)).alias("n"),
        "avg_value",
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "event_type",
        F.col("h").alias("window_start"),
        "n",
        (F.col("n") == 0).alias("gap_filled"),
        F.last("avg_value", ignorenulls=True).over(w).alias("avg_value_locf"),
    )


@query(
    "events_trailing_24h_features",
    """
    WITH pts AS (
      SELECT event_id, user_id,
             CAST(epoch_us(ts) AS BIGINT) AS us,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events
    )
    SELECT event_id,
           CAST(n_24h AS BIGINT) AS n_24h,
           CAST(coalesce(s_24h, 0) AS DOUBLE) AS sum_24h
    FROM (
      SELECT event_id,
             count(v) OVER w AS n_24h,
             sum(v) OVER w AS s_24h
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING)
    )
    """,
)
def q_events_trailing_features(spark, sf_dir):
    """Trailing-window feature generation — for every event, the
    count and sum of the SAME user's events in the preceding 24 hours
    (exclusive of the current instant): the per-entity rolling
    features an online-ML pipeline backfills in batch.

    Scale: ONE window shuffle on user_id; the 24h range frame runs as
    a sliding aggregate over each user's time-sorted partition (Spark
    keeps a running frame — no per-row rescan). The frame bound is in
    exact integer MICROSECONDS and the sum in DECIMAL, so both
    engines agree bit-for-bit. A range-frame window, not a self-join:
    the equivalent inequality join would shuffle the fact table
    against itself."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "event_id",
        "user_id",
        # parquet NTZ -> TIMESTAMP under the UTC session: same instant
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-86_400_000_000, -1)
    )
    return pts.select(
        "event_id",
        F.count("v").over(w).cast("long").alias("n_24h"),
        F.coalesce(F.sum("v").over(w), F.lit(0))
        .cast("double")
        .alias("sum_24h"),
    )


@query(
    "user_event_type_profiles",
    """
    SELECT user_id,
           list(DISTINCT event_type ORDER BY event_type) AS types,
           CAST(len(list(DISTINCT event_type)) AS INTEGER) AS n_types,
           list_contains(list(DISTINCT event_type), 'purchase') AS has_purchase,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
    FROM events GROUP BY user_id
    """,
)
def q_user_profiles(spark, sf_dir):
    """Per-user behavioral profile with a COMPLEX-TYPE result column:
    the sorted distinct event-type ARRAY (plus its cardinality, a
    membership flag, and the activity span) — the collect_set /
    array_sort / array_contains surface a feature store materializes.

    Scale: one groupBy(user) with map-side partial set-union (distinct
    types per user are bounded by the type vocabulary, so the set
    state is tiny regardless of event counts)."""
    e = load_table(spark, sf_dir, "events")
    types = F.array_sort(F.collect_set("event_type"))
    return e.groupBy("user_id").agg(
        types.alias("types"),
        F.size(types).cast("int").alias("n_types"),
        F.array_contains(types, "purchase").alias("has_purchase"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_seen"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
    )


@query(
    "events_session_window_batch",
    """
    WITH pts AS (
      SELECT user_id, ts,
             -- >= not >: session_window's end is EXCLUSIVE (an event at
             -- exactly last_ts + gap starts a new session)
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM pts
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def q_session_window_batch(spark, sf_dir):
    """Spark's NATIVE `session_window` aggregate (30-minute gap) in
    batch, value-checked against the manual lag-gap construction the
    oracle states — proving the built-in's semantics (session end =
    last event + gap) coincide with the hand-rolled sessionization
    (`events_sessionization`), so the streaming form
    (`streaming.windows.session_counts`) inherits verified semantics.

    Scale: session_window groups in ONE shuffle on (user, assigned
    window) with Spark merging overlapping candidate sessions
    internally — no window-function pass over the raw stream."""
    e = load_table(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts").cast("timestamp"), "30 minutes")
    return (
        e.groupBy("user_id", sw.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


@query(
    "events_attribution_linear",
    """
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT event_id AS touch_id, user_id, event_type, ts
      FROM events WHERE event_type IN ('view', 'click')
    ),
    pairs AS (
      SELECT purchase_id, touch_id, event_type
      FROM p JOIN t ON p.user_id = t.user_id
        AND t.ts <= p.pts AND t.ts > p.pts - INTERVAL 24 HOUR
    ),
    per AS (SELECT purchase_id, count(*) AS n_touch FROM pairs GROUP BY purchase_id)
    SELECT event_type,
           count(*) AS n_touches,
           round(sum(1.0 / n_touch), 6) AS credit
    FROM pairs JOIN per USING (purchase_id)
    GROUP BY event_type
    """,
)
def q_attribution_linear(spark, sf_dir):
    """Linear multi-touch attribution: every purchase splits one unit
    of credit equally across the user's view/click touches in the
    preceding 24 h; credit totals per touch type. (First/last-touch are
    the argmin/argmax specializations of the same pair table.)

    Scale: the touch<->purchase pairing is an equi-join on user_id with
    the time-window residual riding the join — per-user fanout is
    bounded by touches-per-day, never a cross join; the per-purchase
    touch counts and the per-type credit sums are both
    map-side-combining groupBys. Credit terms 1/n round at 6 dp."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        "event_type",
        "ts",
    )
    pairs = p.join(
        t,
        (F.col("pu") == F.col("user_id"))
        & (F.col("ts") <= F.col("pts"))
        & (F.col("ts") > F.col("pts") - F.expr("INTERVAL 24 HOURS")),
    ).select("purchase_id", "touch_id", "event_type")
    per = pairs.groupBy("purchase_id").agg(F.count(F.lit(1)).alias("n_touch"))
    return (
        pairs.join(per, "purchase_id")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.sum(F.lit(1.0) / F.col("n_touch")), 6).alias("credit"),
        )
    )


@query(
    "session_error_overlap",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS session_id,
             ts
      FROM flagged
    ),
    intervals AS (
      SELECT user_id, session_id, min(ts) AS s_start, max(ts) AS s_end
      FROM sess GROUP BY user_id, session_id
    ),
    incidents AS (
      SELECT date_trunc('hour', ts) AS incident_hour,
             min(ts) AS i_start, max(ts) AS i_end
      FROM events WHERE event_type = 'error'
      GROUP BY date_trunc('hour', ts)
      HAVING count(*) >= 6
    )
    SELECT strftime(incident_hour, '%Y-%m-%d %H:%M:%S') AS incident_hour,
           count(*) AS n_sessions,
           count(DISTINCT s.user_id) AS n_users
    FROM incidents i JOIN intervals s
      ON s.s_start <= i.i_end AND i.i_start <= s.s_end
    GROUP BY incident_hour
    """,
)
def q_session_error_overlap(spark, sf_dir):
    """Interval-overlap join: user sessions (30-min-gap intervals) x
    error-incident windows (hours with >= 6 errors) — how many active
    sessions each incident touched.

    Scale: the oracle's non-equi interval join is quadratic if both
    sides are large; the engine BUCKETIZES both interval sets to the
    hour (an interval explodes into the hours it covers — bounded
    fanout for bounded-length intervals), equi-joins on the bucket,
    pair-dedups, and applies the exact overlap predicate as the
    residual — the standard big-big interval-join decomposition. At
    this data's incident cardinality AQE broadcasts the incident side,
    which is exactly right; the bucketized shape is what survives when
    both sides are 100-TB-sized."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800), F.lit(1))
        .otherwise(F.lit(0))
        .alias("new_s"),
    )
    run = (
        W.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sess = flagged.withColumn("session_id", F.sum("new_s").over(run))
    intervals = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    incidents = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("incident_hour"))
        .agg(
            F.min("ts").alias("i_start"),
            F.max("ts").alias("i_end"),
            F.count(F.lit(1)).alias("_n"),
        )
        .filter(F.col("_n") >= 6)
        .drop("_n")
    )
    # bucketize: each interval joins through the hour buckets it spans
    hours = lambda a, b: F.sequence(
        F.date_trunc("hour", a), F.date_trunc("hour", b), F.expr("INTERVAL 1 HOUR")
    )
    s_b = intervals.select(
        "user_id", "session_id", "s_start", "s_end",
        F.explode(hours("s_start", "s_end")).alias("bucket"),
    )
    i_b = incidents.select(
        "incident_hour", "i_start", "i_end",
        F.explode(hours("i_start", "i_end")).alias("bucket"),
    )
    pairs = (
        s_b.join(i_b, "bucket")
        .filter(
            (F.col("s_start") <= F.col("i_end"))
            & (F.col("i_start") <= F.col("s_end"))
        )
        .select("incident_hour", "user_id", "session_id")
        .distinct()
    )
    return pairs.groupBy("incident_hour").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
    ).select(
        F.date_format("incident_hour", "yyyy-MM-dd HH:mm:ss").alias(
            "incident_hour"
        ),
        "n_sessions",
        "n_users",
    )


@query(
    "hll_rolling_7d_users",
    """
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM ev),
    hashed AS (
      SELECT day, substr(h, 1, 2) AS bucket,
             CASE WHEN length(regexp_replace(substr(h, 3, 6), '^0+', '', 'g')) = 0
                  THEN 25
                  ELSE (6 - length(regexp_replace(substr(h, 3, 6), '^0+', '', 'g'))) * 4
                       + CASE substr(regexp_replace(substr(h, 3, 6), '^0+', '', 'g'), 1, 1)
                           WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                           WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                           WHEN '7' THEN 1 ELSE 0 END
                       + 1
             END AS rho
      FROM (SELECT day, md5(CAST(user_id AS VARCHAR)) AS h FROM ev)
    ),
    regs AS (SELECT day, bucket, max(rho) AS r FROM hashed GROUP BY day, bucket),
    scattered AS (
      SELECT day + CAST(i.i AS INT) AS t_day, bucket, r
      FROM regs, (SELECT unnest(generate_series(0, 6)) AS i) i
    ),
    merged AS (
      SELECT t_day, bucket, max(r) AS r
      FROM scattered JOIN days ON t_day = days.day
      GROUP BY t_day, bucket
    ),
    est AS (
      SELECT t_day,
             round(47072.71267120224
                   / (sum(power(2.0, -r)) + (256 - count(*))), 3) AS hll_7d
      FROM merged GROUP BY t_day
    ),
    exact_pairs AS (SELECT DISTINCT day, user_id FROM ev),
    exact_scattered AS (
      SELECT day + CAST(i.i AS INT) AS t_day, user_id
      FROM exact_pairs, (SELECT unnest(generate_series(0, 6)) AS i) i
    ),
    exact AS (
      SELECT t_day, count(DISTINCT user_id) AS exact_7d
      FROM exact_scattered JOIN days ON t_day = days.day
      GROUP BY t_day
    )
    SELECT strftime(e.t_day, '%Y-%m-%d') AS day, exact_7d, hll_7d
    FROM est e JOIN exact ON e.t_day = exact.t_day
    """,
)
def q_hll_rolling_7d(spark, sf_dir):
    """Rolling 7-day distinct users via MERGED HLL registers — the
    property that makes sketches the 100-TB answer: each day's register
    table is built once from that day's data, and any window estimate
    is a per-bucket MAX over the member days' registers, never a rescan
    of raw events. Day registers scatter to the <=7 windows they serve
    (bounded fanout), merge with one groupBy, and the estimate reads
    the merged 256-register table. The exact rolling distinct rides
    along for the error comparison — computed by the same scatter on
    distinct (day, user) pairs.

    At 100 TB: persist `hll_registers` per day/partition (256 rows
    each); every rolling/cumulative/ad-hoc-window distinct after that
    is register arithmetic."""
    from commercial_rfp_data_pipeline_spark.operators.sketch import (
        hll_estimate_registers,
        hll_registers,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    days = ev.select("day").distinct().select(F.col("day").alias("t_day"))
    regs = hll_registers(ev, "user_id", ["day"])
    scatter = F.explode(
        F.transform(F.sequence(F.lit(0), F.lit(6)), lambda i: F.date_add("day", i))
    ).alias("t_day")
    merged = (
        regs.select(scatter, "bucket", "r")
        .join(F.broadcast(days), "t_day")
        .groupBy("t_day", "bucket")
        .agg(F.max("r").alias("r"))
    )
    est = hll_estimate_registers(merged, ["t_day"]).withColumnRenamed(
        "hll_estimate", "hll_7d"
    )
    exact = (
        ev.distinct()
        .select(scatter, "user_id")
        .join(F.broadcast(days), "t_day")
        .groupBy("t_day")
        .agg(F.countDistinct("user_id").alias("exact_7d"))
    )
    return est.join(exact, "t_day").select(
        F.date_format("t_day", "yyyy-MM-dd").alias("day"),
        "exact_7d",
        "hll_7d",
    )


_EWMA_W = [0.3, 0.21, 0.147, 0.1029, 0.07203, 0.050421, 0.0352947, 0.02470629, 0.017294403, 0.0121060821, 0.00847425747, 0.005931980229, 0.00415238616, 0.002906670312, 0.002034669219, 0.001424268453, 0.000996987917, 0.000697891542, 0.000488524079, 0.000341966856, 0.000239376799, 0.000167563759, 0.000117294631, 8.2106242e-05]  # alpha=0.3 decay, exact 12-dp literals shared with the oracle
_EWMA_W_SQL = "[" + ", ".join(
    f"CAST({w!r} AS DECIMAL(18,12))".format(w=w) for w in _EWMA_W
) + "]"


@query(
    "events_hourly_ewma",
    f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS x
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    w AS (SELECT {_EWMA_W_SQL} AS ws),
    pairs AS (
      SELECT a.event_type, a.h, a.x,
             CAST(epoch(a.h) - epoch(b.h) AS BIGINT) // 3600 AS d, b.x AS xb
      FROM hourly a JOIN hourly b
        ON a.event_type = b.event_type
       AND b.h <= a.h AND b.h > a.h - INTERVAL 24 HOURS
    ),
    acc AS (
      SELECT event_type, h, x,
             sum(xb * ws[d + 1]) AS num, sum(ws[d + 1]) AS den
      FROM pairs CROSS JOIN w
      GROUP BY event_type, h, x
    )
    SELECT event_type, h, x,
           round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS ewma
    FROM acc
    """,
)
def q_events_ewma(spark, sf_dir):
    '''Per-type exponentially weighted moving average of hourly event
    counts (alpha=0.3, 24-hour support): decay weights are exact
    decimal LITERALS shared between engine and oracle (the same
    constants-as-literals discipline as the LSH planes), so numerator
    and denominator sum exactly and only the final division is float.
    The trailing window decomposes to a bounded self-join on the
    hourly PRE-AGGREGATE (24x fanout of a table already thousands of
    times smaller than the events), never a window over raw rows.'''
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    a = hourly.alias("a")
    b = hourly.alias("b")
    d = (
        (F.unix_timestamp("a.h") - F.unix_timestamp("b.h")) / 3600
    ).cast("int")
    w_arr = F.array(*[F.lit(str(w)).cast("decimal(18,12)") for w in _EWMA_W])
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.h") <= F.col("a.h"))
            & (F.col("b.h") > F.col("a.h") - F.expr("INTERVAL 24 HOURS")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.h").alias("h"),
            F.col("a.x").alias("x"),
            F.element_at(w_arr, d + 1).alias("w"),
            F.col("b.x").alias("xb"),
        )
    )
    acc = pairs.groupBy("event_type", "h", "x").agg(
        F.sum(F.col("xb") * F.col("w")).alias("num"),
        F.sum("w").alias("den"),
    )
    return acc.select(
        "event_type",
        "h",
        "x",
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double"), 6
        ).alias("ewma"),
    )


@query(
    "session_pattern_match",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS i,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, event_id, i,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    ),
    seqs AS (
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             count(*) AS n_events,
             string_agg(i, '' ORDER BY ts, event_id) AS seq
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id, session_id, n_events, seq,
           regexp_matches(seq, 'v.*c.*p') AS funnel_matched
    FROM seqs
    """,
)
def q_session_pattern(spark, sf_dir):
    """MATCH_RECOGNIZE-style sequence pattern detection: sessionize,
    collapse each session to its ordered event-initial string, and
    regex-match the view->click->purchase funnel pattern against it.
    Row-pattern matching without a dedicated operator: the sequence
    string is a per-session aggregate (bounded by session length), the
    regex is a narrow map, and the whole construction shares the one
    user_id exchange the sessionizer already pays."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("i"),
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sess = flagged.withColumn(
        "session_id", F.sum("new_session").over(w2).cast("bigint")
    )
    seqs = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "i"))),
                lambda s: s["i"],
            ),
            "",
        ).alias("seq"),
    )
    return seqs.select(
        "user_id",
        "session_id",
        "n_events",
        "seq",
        F.col("seq").rlike("v.*c.*p").alias("funnel_matched"),
    )


@query(
    "events_cumulative_distinct_users",
    """
    WITH firsts AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS first_day FROM events
      GROUP BY user_id
    ),
    daily AS (
      SELECT first_day AS day, count(*) AS new_users FROM firsts GROUP BY 1
    )
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_users
    FROM daily
    """,
)
def q_cumulative_distinct_users(spark, sf_dir):
    """Cumulative distinct users by day — the growth curve. A naive
    count(DISTINCT) per growing window is O(days x users) re-scans;
    the first-occurrence decomposition is the scale shape: one
    groupBy(user) min(ts) pass, one daily count, one DISTRIBUTED
    running sum over the per-day table (distributed_prefix_sum:
    range-exchange + per-partition windows + a broadcast offsets
    combine — never a partition-less window, so even a decades-long
    daily frame never funnels through one task). Exactly how a 100-TB
    events store computes 'users to date' without ever holding a
    distinct set."""
    from commercial_rfp_data_pipeline_spark.operators.ordered import (
        distributed_prefix_sum,
    )

    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("first_day")
    )
    daily = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    return distributed_prefix_sum(
        daily, {"cum": F.col("new_users")}, order_by=[F.col("day")]
    ).select(
        "day", "new_users", F.col("cum_incl").alias("cumulative_users")
    )


@query(
    "events_seasonal_baseline_outliers",
    """
    WITH base AS (
      SELECT event_id, user_id, event_type, value,
             CAST(EXTRACT(dow FROM ts) AS INTEGER) AS dow,
             CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hod
      FROM events
    ),
    season AS (
      SELECT dow, hod,
             round(avg(CAST(value AS DECIMAL(18,6))), 6) AS mu,
             round(stddev_samp(CAST(value AS DECIMAL(18,6))), 6) AS sigma,
             count(*) AS n
      FROM base GROUP BY dow, hod
    )
    SELECT b.event_id, b.dow, b.hod,
           CAST(CAST(b.value AS DECIMAL(18,6)) AS DOUBLE) AS value,
           s.mu, s.sigma,
           round(CAST(b.value AS DECIMAL(18,6)) - s.mu, 6) AS residual
    FROM base b JOIN season s ON s.dow = b.dow AND s.hod = b.hod
    WHERE s.sigma > 0
      AND abs(CAST(b.value AS DECIMAL(18,6)) - s.mu) > 3 * s.sigma
    """,
)
def q_seasonal_baseline_outliers(spark, sf_dir):
    """Seasonality-aware anomaly detection: build the (day-of-week x
    hour-of-day) baseline profile — the weekly seasonal fingerprint of
    the metric — and flag events more than 3 sigma from THEIR slot's
    mean. The plain hourly z-score (events_hourly_anomaly_zscores)
    flags every Friday peak as anomalous; deseasonalizing first is
    what production monitoring actually does.

    Scale: the profile is one groupBy over a 168-row key (map-side
    combined); scoring is a broadcast join of that tiny profile back
    to the stream — no second shuffle of the events. DECIMAL
    accumulation keeps mean/stddev order-independent for the oracle."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    base = e.select(
        "event_id",
        "event_type",
        v.alias("v"),
        F.dayofweek("ts").alias("dow_spark"),
        F.hour("ts").alias("hod"),
    ).withColumn(
        # Spark dayofweek: Sunday=1..Saturday=7; DuckDB dow: Sunday=0
        "dow",
        (F.col("dow_spark") - 1).cast("int"),
    )
    season = base.groupBy("dow", "hod").agg(
        F.round(F.avg("v"), 6).alias("mu"),
        F.round(F.stddev_samp("v"), 6).alias("sigma"),
        F.count(F.lit(1)).alias("n"),
    )
    scored = base.join(F.broadcast(season), ["dow", "hod"])
    return scored.filter(
        (F.col("sigma") > 0)
        & (F.abs(F.col("v") - F.col("mu")) > 3 * F.col("sigma"))
    ).select(
        "event_id",
        "dow",
        "hod",
        F.col("v").cast("double").alias("value"),
        F.col("mu").cast("double").alias("mu"),
        F.col("sigma").cast("double").alias("sigma"),
        F.round(F.col("v") - F.col("mu"), 6).cast("double").alias("residual"),
    )


@query(
    "events_interval_coverage",
    """
    WITH iv AS (
      SELECT user_id, ts AS s,
             ts + INTERVAL 30 MINUTE AS e
      FROM events
    ),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN s <= max(e) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 0 ELSE 1 END AS is_start
      FROM iv
    ),
    grouped AS (
      SELECT user_id, s, e,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM marked
    ),
    merged AS (
      SELECT user_id, grp, min(s) AS span_start, max(e) AS span_end
      FROM grouped GROUP BY user_id, grp
    )
    SELECT user_id,
           count(*) AS n_spans,
           CAST(sum(CAST(floor(epoch(span_end)) AS BIGINT)
                    - CAST(floor(epoch(span_start)) AS BIGINT)) AS BIGINT)
             AS covered_seconds
    FROM merged GROUP BY user_id
    """,
)
def q_interval_coverage(spark, sf_dir):
    """Interval-union coverage (gaps-and-islands): each event opens a
    30-minute activity window; overlapping windows per user merge into
    spans, and the answer is each user's span count and total covered
    seconds — 'how long was the user actually active', immune to
    double-counting overlaps. The classic island detection: a window
    max over prior ends marks span starts, a running sum of the marks
    numbers the islands, one groupBy collapses them.

    Scale: ONE shuffle on user_id serves both window passes and the
    final aggregate (same partitioning reused); nothing quadratic in
    events-per-user."""
    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    marked = iv.withColumn(
        "is_start",
        F.when(F.col("s") <= F.max("e").over(w_prev), F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    grouped = marked.withColumn("grp", F.sum("is_start").over(w_run))
    merged = grouped.groupBy("user_id", "grp").agg(
        F.min("s").alias("span_start"), F.max("e").alias("span_end")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(
            F.unix_timestamp("span_end") - F.unix_timestamp("span_start")
        ).alias("covered_seconds"),
    )


@query(
    "events_rollup_cascade",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             count(*) AS n,
             sum(CAST(value AS DECIMAL(12,2))) AS v
      FROM events GROUP BY 1, 2
    ),
    daily AS (
      SELECT CAST(date_trunc('day', h) AS DATE) AS d, event_type,
             sum(n) AS n, sum(v) AS v
      FROM hourly GROUP BY 1, 2
    ),
    weekly AS (
      SELECT CAST(date_trunc('week', d) AS DATE) AS w, event_type,
             sum(n) AS n, sum(v) AS v
      FROM daily GROUP BY 1, 2
    )
    SELECT w AS week_start, event_type, CAST(n AS BIGINT) AS n,
           CAST(v AS DOUBLE) AS total_value
    FROM weekly
    """,
)
def q_rollup_cascade(spark, sf_dir):
    """The continuous-aggregate CASCADE (hypertable rollup discipline):
    weekly totals computed FROM daily totals computed FROM hourly
    totals — never from raw events. Each level re-aggregates the level
    below (sum of sums; counts and DECIMAL sums are mergeable), which
    is what makes a materialized rollup hierarchy maintainable at
    100 TB: the hourly table absorbs the raw stream once (the
    exactly-once streaming sink writes it incrementally), and every
    coarser level reads only the level below — a 24x, then 7x row
    reduction per step. Value-checked against the same three-level
    cascade in the oracle."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).alias("v"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", "h").cast("date").alias("d"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    weekly = daily.groupBy(
        F.date_trunc("week", "d").cast("date").alias("week_start"),
        "event_type",
    ).agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    return weekly.select(
        "week_start",
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("v").cast("double").alias("total_value"),
    )


@query(
    "events_markov_transitions",
    """
    WITH ordered AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS cur_type, next_type, count(*) AS n
      FROM ordered WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    totals AS (SELECT cur_type, sum(n) AS total FROM trans GROUP BY cur_type)
    SELECT t.cur_type, t.next_type, t.n,
           round(t.n / CAST(tt.total AS DOUBLE), 6) AS p
    FROM trans t JOIN totals tt ON tt.cur_type = t.cur_type
    """,
)
def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    streams: P(next event type | current) — the user-journey model
    behind next-action prediction and funnel-drop analysis, and the
    transition-level counterpart of session pattern matching. Exact
    arithmetic: integer transition counts, one division at the end.

    Scale: one user_id shuffle for the lead() window; the transition
    matrix itself is |types|^2 rows — map-side combined and tiny
    forever."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = ordered.groupBy(
        F.col("event_type").alias("cur_type"), "next_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    totals = trans.groupBy("cur_type").agg(F.sum("n").alias("total"))
    return trans.join(totals, "cur_type").select(
        "cur_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.col("total"), 6).alias("p"),
    )


@query(
    "events_concurrent_sessions_peak",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    ),
    spans AS (
      SELECT user_id, sid, min(ts) AS s,
             max(ts) + INTERVAL 30 MINUTE AS e
      FROM sessions GROUP BY user_id, sid
    ),
    deltas AS (
      SELECT s AS t, 1 AS d FROM spans
      UNION ALL
      SELECT e AS t, -1 AS d FROM spans
    ),
    walk AS (
      SELECT t, sum(d) AS net,
             sum(sum(d)) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
      FROM deltas GROUP BY t
    )
    SELECT CAST(t AS DATE) AS day,
           CAST(max(live) AS BIGINT) AS peak_concurrent,
           CAST(count(*) AS BIGINT) AS n_transitions
    FROM walk GROUP BY CAST(t AS DATE)
    """,
)
def q_concurrent_sessions_peak(spark, sf_dir):
    """Peak concurrent sessions per day — capacity planning's core
    question, answered with the sweep-line decomposition: each session
    span (30-min-gap sessionization, end padded by the gap) emits
    +1/-1 boundary deltas; a global running sum over boundary times is
    the live-session count, and the per-day max is the peak. The
    standard trick that replaces interval-overlap counting (quadratic)
    with one sort.

    Scale: sessionization shuffles on user_id; the sweep is one
    DISTRIBUTED running sum over the BOUNDARY table (2 rows per
    session, not per event) via distributed_prefix_sum — boundaries
    range-partition on time, each partition sweeps locally, and
    opening balances arrive as broadcast offsets, so no task ever
    sees the whole timeline."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = e.select(
        "user_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800), F.lit(1))
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sessions = flagged.withColumn("sid", F.sum("new_session").over(w2))
    spans = sessions.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s"),
        (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    deltas = spans.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionByName(
        spans.select(F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    per_t = deltas.groupBy("t").agg(F.sum("d").alias("net"))
    from commercial_rfp_data_pipeline_spark.operators.ordered import (
        distributed_prefix_sum,
    )

    walk = distributed_prefix_sum(
        per_t, {"live": F.col("net")}, order_by=[F.col("t")]
    ).withColumnRenamed("live_incl", "live")
    return walk.groupBy(F.col("t").cast("date").alias("day")).agg(
        F.max("live").cast("bigint").alias("peak_concurrent"),
        F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
    )


@query(
    "events_funnel_conversion_windowed",
    """
    WITH v AS (SELECT user_id, min(ts) AS t_v FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT v.user_id, v.t_v, min(e.ts) AS t_c
      FROM v JOIN events e
        ON e.user_id = v.user_id AND e.event_type = 'click'
       AND e.ts > v.t_v
       AND epoch(e.ts) - epoch(v.t_v) <= 86400
      GROUP BY v.user_id, v.t_v
    ),
    p AS (
      SELECT c.user_id, c.t_c, min(e.ts) AS t_p
      FROM c JOIN events e
        ON e.user_id = c.user_id AND e.event_type = 'purchase'
       AND e.ts > c.t_c
       AND epoch(e.ts) - epoch(c.t_c) <= 86400
      GROUP BY c.user_id, c.t_c
    )
    SELECT (SELECT count(*) FROM v) AS n_viewed,
           (SELECT count(*) FROM c) AS n_clicked,
           (SELECT count(*) FROM p) AS n_purchased,
           round((SELECT count(*) FROM c) /
                 CAST((SELECT count(*) FROM v) AS DOUBLE), 6) AS view_to_click,
           round((SELECT count(*) FROM p) /
                 CAST(nullif((SELECT count(*) FROM c), 0) AS DOUBLE), 6)
             AS click_to_purchase
    """,
)
def q_funnel_conversion_windowed(spark, sf_dir):
    """TIME-BOUND funnel conversion: first view → first subsequent
    click within 24h → first subsequent purchase within 24h of the
    click, reported as stage counts and conversion rates. The ordered
    regex funnel (session_pattern_match) asks 'did the sequence ever
    happen'; this asks the product question — 'how many users
    progressed within the window' — which needs the step timestamps,
    not just order.

    Scale: three user-keyed aggregates/joins sharing one user_id
    shuffle lineage; each stage's table shrinks (viewed ⊇ clicked ⊇
    purchased); the final report is scalar aggregates."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_v"))
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    c = (
        v.join(clicks, "user_id")
        .filter(
            (F.col("ts") > F.col("t_v"))
            & (
                F.unix_timestamp("ts") - F.unix_timestamp("t_v")
                <= 86400
            )
        )
        .groupBy("user_id", "t_v")
        .agg(F.min("ts").alias("t_c"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    p = (
        c.join(purchases, "user_id")
        .filter(
            (F.col("ts") > F.col("t_c"))
            & (
                F.unix_timestamp("ts") - F.unix_timestamp("t_c")
                <= 86400
            )
        )
        .groupBy("user_id", "t_c")
        .agg(F.min("ts").alias("t_p"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_viewed"))
    ncl = c.agg(F.count(F.lit(1)).alias("n_clicked"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchased"))
    return (
        nv.crossJoin(ncl)
        .crossJoin(np_)
        .select(
            "n_viewed",
            "n_clicked",
            "n_purchased",
            F.round(F.col("n_clicked") / F.col("n_viewed"), 6).alias(
                "view_to_click"
            ),
            F.round(
                F.col("n_purchased")
                / F.nullif(F.col("n_clicked"), F.lit(0)).cast("double"),
                6,
            ).alias("click_to_purchase"),
        )
    )


_HOLT_R6 = "floor({x} * 1000000 + 0.5) / 1000000"


@query(
    "events_holt_linear_trend",
    f"""
    WITH RECURSIVE hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, h, y,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS i
      FROM hourly
    ),
    walk(event_type, i, y, level, trend) AS (
      SELECT event_type, CAST(1 AS BIGINT), y,
             {_HOLT_R6.format(x="y")}, CAST(0.0 AS DOUBLE)
      FROM ranked WHERE i = 1
      UNION ALL
      SELECT r.event_type, r.i, r.y,
             {_HOLT_R6.format(x="(0.5 * r.y + 0.5 * (w.level + w.trend))")},
             {_HOLT_R6.format(x="(0.3 * (" + _HOLT_R6.format(x="(0.5 * r.y + 0.5 * (w.level + w.trend))") + " - w.level) + 0.7 * w.trend)")}
      FROM walk w JOIN ranked r
        ON r.event_type = w.event_type AND r.i = w.i + 1
    )
    SELECT event_type, i, y, level, trend FROM walk
    """,
)
def q_holt_linear(spark, sf_dir):
    """Holt linear (level+trend) smoothing of the hourly value series
    per event type — the sequential per-group recursion EWMA's closed
    form cannot express, run through the applyInPandas series-walk
    seam (operators/ordered.py:holt_linear) and value-checked step by
    step against DuckDB's ordered recursive CTE walking the same
    recurrence with the same half-up rounding."""
    from commercial_rfp_data_pipeline_spark.operators.ordered import (
        holt_linear,
    )

    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.round(F.sum(F.col("value").cast(DEC)), 2)
            .cast("double")
            .alias("y")
        )
    )
    return holt_linear(
        hourly, ["event_type"], order_col="h", value_col="y"
    )


@query(
    "frequent_event_triples",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS i
      FROM events
    ),
    triples AS (
      SELECT a.event_type AS t1, b.event_type AS t2, c.event_type AS t3,
             count(*) AS support
      FROM seq a
      JOIN seq b ON b.user_id = a.user_id AND b.i > a.i
                AND b.i - a.i <= 5
      JOIN seq c ON c.user_id = a.user_id AND c.i > b.i
                AND c.i - b.i <= 5
      GROUP BY 1, 2, 3
    )
    SELECT t1, t2, t3, support FROM triples
    ORDER BY support DESC, t1, t2, t3 LIMIT 20
    """,
)
def q_frequent_triples(spark, sf_dir):
    """Gapped sequential-pattern mining (the PrefixSpan question at
    fixed length): top ordered event-type TRIPLES occurring within a
    5-position gap window per step, by support across all user
    streams — the behavioral motifs adjacent-only transition counts
    (events_markov_transitions) cannot see.

    Scale: the position self-joins are bounded by the gap budget
    (each event pairs with <= 5 successors per step, so the triple
    stream is <= 25x events — linear, never |session|^3); one
    user-keyed shuffle serves the ordinal window and both joins, and
    the support aggregate collapses to the tiny type^3 key space
    map-side. Top-20 compiles to TakeOrdered."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("i")
    )
    a, b, c = seq.alias("a"), seq.alias("b"), seq.alias("c")
    triples = (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.i") > F.col("a.i"))
            & (F.col("b.i") - F.col("a.i") <= 5),
        )
        .join(
            c,
            (F.col("c.user_id") == F.col("a.user_id"))
            & (F.col("c.i") > F.col("b.i"))
            & (F.col("c.i") - F.col("b.i") <= 5),
        )
        .groupBy(
            F.col("a.event_type").alias("t1"),
            F.col("b.event_type").alias("t2"),
            F.col("c.event_type").alias("t3"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return triples.orderBy(
        F.col("support").desc(), "t1", "t2", "t3"
    ).limit(20)


@query(
    "user_resurrection_analysis",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CAST(floor(epoch(ts)) AS BIGINT)
               - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id))) AS BIGINT) AS gap_s
      FROM events
    )
    SELECT user_id,
           count(*) AS n_events,
           CAST(count(CASE WHEN gap_s > 2 * 86400 THEN 1 END) AS BIGINT)
             AS n_resurrections,
           CAST(max(gap_s) AS BIGINT) AS max_gap_seconds
    FROM gaps GROUP BY user_id
    HAVING count(CASE WHEN gap_s > 2 * 86400 THEN 1 END) > 0
    """,
)
def q_user_resurrection(spark, sf_dir):
    """Resurrection analysis: users who went dormant for over 2 days
    and came back, with how often and their longest gap — the
    churn-recovery cohort retention dashboards track next to the
    new/active split (events_cumulative_distinct_users,
    events_retention_cohorts). One lag window + one aggregate on the
    same user_id shuffle."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    )
    res = F.count(F.when(F.col("gap_s") > 2 * 86400, 1))
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            res.alias("n_resurrections"),
            F.max("gap_s").alias("max_gap_seconds"),
        )
        .filter(F.col("n_resurrections") > 0)
    )


@query(
    "events_dau_wau_mau",
    """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day,
           (SELECT count(DISTINCT u.user_id) FROM du u
             WHERE u.day = d.day) AS dau,
           (SELECT count(DISTINCT u.user_id) FROM du u
             WHERE u.day > d.day - 7 AND u.day <= d.day) AS wau,
           (SELECT count(DISTINCT u.user_id) FROM du u
             WHERE u.day > d.day - 30 AND u.day <= d.day) AS mau,
           round((SELECT count(DISTINCT u.user_id) FROM du u
                   WHERE u.day = d.day)
                 / CAST((SELECT count(DISTINCT u.user_id) FROM du u
                          WHERE u.day > d.day - 30 AND u.day <= d.day)
                        AS DOUBLE), 6) AS stickiness
    FROM days d
    """,
)
def q_dau_wau_mau(spark, sf_dir):
    """DAU / WAU / MAU / stickiness (DAU/MAU) per day — THE product
    health dashboard. Exact rolling distincts via the (day, user)
    dedup table range-joined to the day grid: the corpus collapses to
    one row per active (day, user) FIRST (one shuffle), and each
    window's distinct count is a count over that tiny table — never a
    rescan of raw events per window. The oracle states the same
    windows as correlated subqueries.

    At true scale the exact form stays viable because |day x user| is
    bounded by DAU x days (the HLL register path —
    hll_rolling_7d_users — is the sketch alternative when even that
    is too wide)."""
    e = load_table(spark, sf_dir, "events")
    du = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    j = days.alias("d").join(
        du.alias("u"),
        (F.col("u.day") > F.date_sub(F.col("d.day"), 30))
        & (F.col("u.day") <= F.col("d.day")),
    )
    agg = j.groupBy(F.col("d.day").alias("day")).agg(
        F.count_distinct(
            F.when(F.col("u.day") == F.col("d.day"), F.col("u.user_id"))
        ).alias("dau"),
        F.count_distinct(
            F.when(
                F.col("u.day") > F.date_sub(F.col("d.day"), 7),
                F.col("u.user_id"),
            )
        ).alias("wau"),
        F.count_distinct(F.col("u.user_id")).alias("mau"),
    )
    return agg.select(
        "day",
        "dau",
        "wau",
        "mau",
        F.round(F.col("dau") / F.col("mau").cast("double"), 6).alias(
            "stickiness"
        ),
    )


@query(
    "events_ohlc_hourly",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           struct_extract(min(row(ts, event_id, value)), 3) AS open,
           max(value) AS high,
           min(value) AS low,
           struct_extract(max(row(ts, event_id, value)), 3) AS close,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def q_ohlc_hourly(spark, sf_dir):
    """Hourly OHLC bars (open/high/low/close) over the event values —
    the time-series downsampling every metrics store runs. Open and
    close are argmin/argmax by event time with an event_id tiebreak,
    expressed as ONE min/max over a (ts, id, value) struct (structs
    order lexicographically in both engines), so the whole bar is a
    single partial-aggregable groupBy: no window, no second shuffle,
    and at 100 TB each hour's bar folds map-side like any sum."""
    e = load_table(spark, sf_dir, "events")
    s = F.struct(F.col("ts"), F.col("event_id"), F.col("value").alias("v"))
    return e.groupBy(F.date_trunc("hour", "ts").alias("window_start")).agg(
        F.min(s)["v"].alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(s)["v"].alias("close"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    )


@query(
    "isotonic_calibration_fit",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, round(avg(value), 6) AS y
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT h, y,
             row_number() OVER (ORDER BY h) AS i,
             sum(round(avg_y, 6)) OVER (ORDER BY h) AS ps
      FROM (SELECT h, y, y AS avg_y FROM hourly)
    ),
    a AS (
      SELECT j.i AS j, k.i AS k,
             (k.ps - coalesce(jp.ps, 0)) / (k.i - j.i + 1) AS m
      FROM s j
      JOIN s k ON k.i >= j.i
      LEFT JOIN s jp ON jp.i = j.i - 1
    ),
    b AS (
      SELECT j, k AS i,
             min(m) OVER (PARTITION BY j ORDER BY k DESC) AS bmin
      FROM a
    ),
    fit AS (SELECT i, max(bmin) AS f FROM b GROUP BY i)
    SELECT s.h AS window_start, s.y, round(fit.f, 6) AS y_iso
    FROM s JOIN fit USING (i)
    """,
)
def q_isotonic_fit(spark, sf_dir):
    """Isotonic regression of the hourly mean event value — the
    monotone calibration fit (PAVA). The engine runs linear-time
    pool-adjacent-violators through the sequential-series seam
    (operators/ordered.py); the oracle restates the SAME solution via
    the minimax identity max_j min_k mean(y_j..y_k) — an O(n²)
    formulation only the oracle pays for. Block means are prefix-sum
    differences with identical operation order in both engines, so
    the fit value-hash-checks at 6 dp."""
    from commercial_rfp_data_pipeline_spark.operators.ordered import isotonic_fit

    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.round(F.avg("value"), 6).alias("y"))
        .withColumn("_series", F.lit(0))
    )
    out = isotonic_fit(hourly, ["_series"], order_col="h", value_col="y")
    # series ordinal via the distributed rank (prefix-count of 1s in
    # h order), not a partition-less row_number window
    from commercial_rfp_data_pipeline_spark.operators.ordered import (
        distributed_prefix_sum,
    )

    idx = distributed_prefix_sum(
        hourly, {"one": F.lit(1)}, order_by=[F.col("h")]
    ).select("h", F.col("one_incl").cast("int").alias("i"))
    return (
        out.join(idx, "i")
        .select(F.col("h").alias("window_start"), "y", "y_iso")
    )


@query(
    "revenue_touch_attribution",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type IN ('view', 'click') THEN event_type END
               AS touch_type,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    carried AS (
      SELECT *,
             last_value(touch_type IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_conv, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS last_touch,
             first_value(touch_type IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_conv, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS first_touch
      FROM tagged
    ),
    conv AS (SELECT * FROM carried WHERE is_conv = 1),
    both_models AS (
      SELECT 'last_touch' AS model, last_touch AS touch_type, value
      FROM conv WHERE last_touch IS NOT NULL
      UNION ALL
      SELECT 'first_touch', first_touch, value
      FROM conv WHERE first_touch IS NOT NULL
    )
    SELECT model, touch_type,
           count(*) AS n_conversions,
           CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE)
             AS attributed_revenue
    FROM both_models
    GROUP BY model, touch_type
    """,
)
def q_revenue_attribution(spark, sf_dir):
    """Marketing TOUCH ATTRIBUTION over the event stream: each
    purchase's revenue is credited to the user's most recent preceding
    view/click (last-touch) and to their earliest one (first-touch),
    both models side by side — the funnel-economics report every
    growth team runs. A touch at the purchase's exact timestamp counts
    (touches order before conversions on ties, then event_id —
    deterministic).

    Scale: ONE window pass per user carries both attributions
    (last_value/first_value IGNORE NULLS over the running frame — a
    single user_id shuffle shared by both models, no self-join of
    purchases against touches); the final rollup is a tiny decimal-
    summed groupBy."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    tagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            F.col("event_type").isin("view", "click"), F.col("event_type")
        ).alias("touch_type"),
        (F.col("event_type") == "purchase").cast("int").alias("is_conv"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_conv", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = tagged.select(
        "value",
        "is_conv",
        F.last("touch_type", ignorenulls=True).over(w).alias("last_touch"),
        F.first("touch_type", ignorenulls=True).over(w).alias("first_touch"),
    )
    conv = carried.filter(F.col("is_conv") == 1)
    last_m = conv.filter(F.col("last_touch").isNotNull()).select(
        F.lit("last_touch").alias("model"),
        F.col("last_touch").alias("touch_type"),
        "value",
    )
    first_m = conv.filter(F.col("first_touch").isNotNull()).select(
        F.lit("first_touch").alias("model"),
        F.col("first_touch").alias("touch_type"),
        "value",
    )
    return (
        last_m.unionByName(first_m)
        .groupBy("model", "touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum(F.col("value").cast("decimal(14,2)"))
            .cast("double")
            .alias("attributed_revenue"),
        )
    )


# ---- purged temporal split (round 7) ----------------------------------
# The time-series cousin of the group-aware leakage-safe split: models
# trained on temporal data must not see events adjacent to the test
# window (features built from trailing aggregates leak across a naive
# cut). The purged split drops an EMBARGO band between train and test.
_SPLIT_CUT = "2024-01-20 00:00:00"
_SPLIT_EMBARGO_H = 48


@query(
    "purged_time_series_split",
    f"""
    WITH tagged AS (
      SELECT event_id, user_id, ts,
             CASE WHEN ts < TIMESTAMP '{_SPLIT_CUT}' THEN 'train'
                  WHEN ts >= TIMESTAMP '{_SPLIT_CUT}'
                       + INTERVAL {_SPLIT_EMBARGO_H} HOUR THEN 'test'
                  ELSE 'purged' END AS split
      FROM events
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(min(ts) AS VARCHAR) AS first_ts,
           CAST(max(ts) AS VARCHAR) AS last_ts
    FROM tagged GROUP BY split
    """,
)
def q_purged_time_series_split(spark, sf_dir):
    """Purged temporal train/test split with an embargo band
    (financial-ML style, de Prado's purged k-fold reduced to one
    cut): train < cut, test >= cut + 48h, the band between is DROPPED
    so trailing-window features computed on train rows can never
    overlap the test period. The per-split audit (counts, user
    coverage, actual time bounds) is the evidence a reviewer checks:
    test.first_ts - train.last_ts >= embargo by construction.

    Scale: one narrow map + a 3-key groupBy; the distinct-user count
    is the standard two-phase expand."""
    e = load_table(spark, sf_dir, "events")
    cut = F.lit(_SPLIT_CUT).cast("timestamp")
    test_start = cut + F.expr(f"INTERVAL {_SPLIT_EMBARGO_H} HOURS")
    split = (
        F.when(F.col("ts") < cut, "train")
        .when(F.col("ts") >= test_start, "test")
        .otherwise("purged")
    )
    return (
        e.select(split.alias("split"), "event_id", "user_id", "ts")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.min("ts").cast("string").alias("first_ts"),
            F.max("ts").cast("string").alias("last_ts"),
        )
    )
