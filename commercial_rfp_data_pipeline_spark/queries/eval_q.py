"""Experimentation & evaluation analytics queries (round 8, second
wave): the measurement layer a production LLM-data platform runs on
top of the pipeline the reference automates.

- ``winrate_wilson_leaderboard`` / ``bradley_terry_strengths``:
  arena-style pairwise-preference ranking (raw win rate is the wrong
  sort key; Wilson lower bound and Bradley-Terry strengths are the
  two standard fixes).
- ``poisson_bootstrap_ci``: resampled confidence intervals on a
  corpus metric — the Poisson(1)-weight bootstrap is THE way to
  bootstrap 100 TB (row-local weights, no global n per replicate).
- ``cuped_adjusted_ab_test`` / ``ab_design_audit``: variance-reduced
  A/B readout (CUPED, Deng et al. WSDM'13) + the pre-flight
  sample-ratio-mismatch and minimum-detectable-effect checks.
- ``jackknife_ratio_metric_se``: delete-one-block jackknife SE for a
  ratio metric whose randomization unit (customer) differs from the
  analysis unit (order) — the classic cluster-correlation trap.
- ``kaplan_meier_repurchase``: right-censored survival curve of
  customer repurchase latency.
- ``rouge_ngram_eval``: clipped n-gram precision/recall/F1 between
  paired documents — the reference-based generation eval.
- ``annotator_label_model``: majority vote -> accuracy-weighted
  revote (one-step Dawid-Skene) over synthetic md5-noise annotators —
  RLHF label aggregation.

Determinism: every coin is an md5 draw (operators/experiment.py),
every cross-row float sum is an exact DECIMAL sum of fixed-scale
rounded values, every division runs on bit-identical doubles — so
each DuckDB oracle reproduces the Spark result hash exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.operators.experiment import (
    AB_SEED,
    ARM_A_MAX,
    OBF_C,
    SEQ_HORIZON,
    SEQ_START,
    bradley_terry,
    bradley_terry_oracle_ctes,
    daily_arm_moments,
    frac_to_hex,
    monitor_readout_from_daily,
    poisson1_weight,
    poisson1_weight_sql,
    u60_hex,
    u60_hex_sql,
    wilson_lower_bound,
    wilson_lower_bound_sql,
)
from commercial_rfp_data_pipeline_spark.queries.text_q import (
    _NORM,
    _QUALITY_CTE,
)
from commercial_rfp_data_pipeline_spark.registry import query

# ---------------------------------------------------------------------------
# shared battle log: adjacent documents from different sources fight;
# the higher quality score wins (tie -> the lower doc_id, i.e. side a)
# ---------------------------------------------------------------------------

_BATTLES_CTE = f"""
{_QUALITY_CTE.strip()},
battles AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.source AS model_a, b.source AS model_b,
         CASE WHEN qb.quality_score > qa.quality_score THEN b.source
              ELSE a.source END AS winner
  FROM documents a
  JOIN documents b ON b.doc_id = a.doc_id + 1 AND b.source <> a.source
  JOIN qual qa ON qa.doc_id = a.doc_id
  JOIN qual qb ON qb.doc_id = b.doc_id
)
"""


def _battles(spark, sf_dir):
    """(doc_a, doc_b, model_a, model_b, winner) — one equi-join on the
    successor doc_id (shuffle-light: both sides hash on the same key),
    quality scored by the shared narrow-map feature pass."""
    from commercial_rfp_data_pipeline_spark.operators.textops import (
        quality_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "source").join(
        quality_features(docs).select("doc_id", "quality_score"), "doc_id"
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        F.col("source").alias("model_a"),
        F.col("quality_score").alias("qa"),
        (F.col("doc_id") + F.lit(1)).alias("_nxt"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("source").alias("model_b"),
        F.col("quality_score").alias("qb"),
    )
    return (
        a.join(b, a["_nxt"] == b["doc_b"])
        .filter(F.col("model_a") != F.col("model_b"))
        .select(
            "doc_a",
            "doc_b",
            "model_a",
            "model_b",
            F.when(F.col("qb") > F.col("qa"), F.col("model_b"))
            .otherwise(F.col("model_a"))
            .alias("winner"),
        )
    )


@query(
    "winrate_wilson_leaderboard",
    f"""
    WITH {_BATTLES_CTE.strip()},
    appear AS (
      SELECT model_a AS model FROM battles
      UNION ALL SELECT model_b AS model FROM battles
    ),
    nb AS (SELECT model, count(*) AS n_battles FROM appear GROUP BY model),
    wct AS (SELECT winner AS model, count(*) AS wins FROM battles
            GROUP BY winner),
    lb AS (
      SELECT nb.model,
             CAST(nb.n_battles AS BIGINT) AS n_battles,
             CAST(COALESCE(wct.wins, 0) AS BIGINT) AS wins,
             round(CAST(COALESCE(wct.wins, 0) AS DOUBLE)
                   / CAST(nb.n_battles AS DOUBLE), 6) AS win_rate,
             round({wilson_lower_bound_sql('COALESCE(wct.wins, 0)',
                                           'nb.n_battles')}, 6) AS wilson_lb
      FROM nb LEFT JOIN wct ON wct.model = nb.model
    )
    SELECT x.model, x.n_battles, x.wins, x.win_rate, x.wilson_lb,
           CAST(1 + (SELECT count(*) FROM lb y
                     WHERE y.wilson_lb > x.wilson_lb) AS BIGINT) AS rank
    FROM lb x
    """,
)
def q_winrate_wilson_leaderboard(spark, sf_dir):
    """Arena-style model leaderboard over the pairwise battle log,
    ranked by the Wilson 95% lower bound instead of the raw win rate
    (a 2-0 model must not outrank a 95-100 one). Scale: the battle log
    aggregates with two map-side-combining groupBys; the leaderboard
    itself is models-count rows, ranked by a broadcast theta
    self-join — no window, no sort of the big side."""
    b = _battles(spark, sf_dir).localCheckpoint(eager=False)
    nb = (
        b.select(F.col("model_a").alias("model"))
        .unionAll(b.select(F.col("model_b").alias("model")))
        .groupBy("model")
        .agg(F.count(F.lit(1)).alias("n_battles"))
    )
    wct = b.groupBy(F.col("winner").alias("model")).agg(
        F.count(F.lit(1)).alias("wins")
    )
    lb = (
        nb.join(wct, "model", "left")
        .select(
            "model",
            F.col("n_battles").cast("bigint").alias("n_battles"),
            F.coalesce("wins", F.lit(0)).cast("bigint").alias("wins"),
        )
        .withColumn(
            "win_rate",
            F.round(
                F.col("wins").cast("double")
                / F.col("n_battles").cast("double"),
                6,
            ),
        )
        .withColumn(
            "wilson_lb",
            F.round(
                wilson_lower_bound(F.col("wins"), F.col("n_battles")), 6
            ),
        )
    )
    other = lb.select(
        F.col("model").alias("_om"), F.col("wilson_lb").alias("_ow")
    )
    return (
        lb.join(F.broadcast(other), F.col("_ow") > F.col("wilson_lb"), "left")
        .groupBy("model", "n_battles", "wins", "win_rate", "wilson_lb")
        .agg((F.count("_om") + F.lit(1)).cast("bigint").alias("rank"))
    )


@query(
    "bradley_terry_strengths",
    f"""
    WITH {_BATTLES_CTE.strip()},
    {bradley_terry_oracle_ctes()}
    SELECT m AS model,
           CAST(n_battles AS BIGINT) AS n_battles,
           CAST(wins AS BIGINT) AS wins,
           round(strength, 9) AS strength
    FROM bt_final
    """,
)
def q_bradley_terry_strengths(spark, sf_dir):
    """Bradley-Terry strengths from the battle log via 10 MM updates
    (Hunter 2004) — the model behind Chatbot-Arena-style ratings,
    order-independent where sequential Elo is not. The distributed
    part is ONE aggregation of the battle log into models^2 pair
    counts; the iteration then runs on that tiny table with
    DECIMAL(28,9) state (the operators/graph.py HITS discipline), so
    the unrolled DuckDB CTE chain reproduces the hash exactly."""
    bt = bradley_terry(_battles(spark, sf_dir))
    return bt.select(
        "model",
        F.col("n_battles").cast("bigint").alias("n_battles"),
        F.col("wins").cast("bigint").alias("wins"),
        F.round("strength", 9).alias("strength"),
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap
# ---------------------------------------------------------------------------

_BOOT_R = 100  # replicates
_BOOT_SEED = "pb1:"


@query(
    "poisson_bootstrap_ci",
    f"""
    WITH base AS (
      SELECT c.c_mktsegment AS segment, o.o_orderkey,
             CAST(o.o_totalprice AS DECIMAL(12,2)) AS price
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    point AS (
      SELECT segment, CAST(count(*) AS BIGINT) AS n_orders,
             round(CAST(sum(price) AS DOUBLE) / count(*), 6) AS point_mean
      FROM base GROUP BY segment
    ),
    reps AS (SELECT CAST(r AS INT) AS rep
             FROM unnest(generate_series(0, {_BOOT_R - 1})) t(r)),
    weighted AS (
      SELECT b.segment, r.rep,
             {poisson1_weight_sql(u60_hex_sql(
                 "'" + _BOOT_SEED + "' || CAST(b.o_orderkey AS VARCHAR)"
                 " || '#' || CAST(r.rep AS VARCHAR)"))} AS w,
             b.price
      FROM base b CROSS JOIN reps r
    ),
    repmeans AS (
      SELECT segment, rep,
             CAST(round(CAST(sum(w * price) AS DOUBLE)
                        / CAST(sum(w) AS DOUBLE), 6)
                  AS DECIMAL(18,6)) AS m
      FROM weighted GROUP BY segment, rep
    ),
    boot AS (
      SELECT segment,
             round(CAST(sum(m) AS DOUBLE) / {_BOOT_R}.0, 6) AS boot_mean,
             round(quantile_cont(CAST(m AS DOUBLE), 0.025), 6) AS ci_lo,
             round(quantile_cont(CAST(m AS DOUBLE), 0.975), 6) AS ci_hi
      FROM repmeans GROUP BY segment
    )
    SELECT p.segment, p.n_orders, p.point_mean,
           b.boot_mean, b.ci_lo, b.ci_hi
    FROM point p JOIN boot b ON b.segment = p.segment
    """,
)
def q_poisson_bootstrap_ci(spark, sf_dir):
    """95% bootstrap CI on mean order value per market segment with
    {R} Poisson(1)-weighted replicates (Chamandy et al. 2012): each
    (row, replicate) draws a row-local md5 weight, so no replicate
    ever needs the global row count — the only bootstrap that works
    when one resample can't fit anywhere. Scale: the explode is a
    narrow {R}x map; replicate means reduce with map-side combine on
    (segment, rep); the final percentile runs over {R} values per
    segment. Exact DECIMAL sums make every replicate mean
    order-independent."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.join(
        F.broadcast(c), F.col("c_custkey") == F.col("o_custkey")
    ).select(
        F.col("c_mktsegment").alias("segment"),
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    point = base.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(
            F.sum("price").cast("double") / F.count(F.lit(1)), 6
        ).alias("point_mean"),
    )
    reps = spark.range(_BOOT_R).select(F.col("id").cast("int").alias("rep"))
    u = u60_hex(
        F.concat(
            F.lit(_BOOT_SEED),
            F.col("o_orderkey").cast("string"),
            F.lit("#"),
            F.col("rep").cast("string"),
        )
    )
    repmeans = (
        base.crossJoin(F.broadcast(reps))
        .select("segment", "rep", poisson1_weight(u).alias("w"), "price")
        .groupBy("segment", "rep")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("price")).cast("double")
                / F.sum("w").cast("double"),
                6,
            )
            .cast("decimal(18,6)")
            .alias("m"),
        )
    )
    boot = repmeans.groupBy("segment").agg(
        F.round(F.sum("m").cast("double") / F.lit(float(_BOOT_R)), 6).alias(
            "boot_mean"
        ),
        F.round(
            F.percentile(F.col("m").cast("double"), F.lit(0.025)), 6
        ).alias("ci_lo"),
        F.round(
            F.percentile(F.col("m").cast("double"), F.lit(0.975)), 6
        ).alias("ci_hi"),
    )
    return point.join(boot, "segment").select(
        "segment", "n_orders", "point_mean", "boot_mean", "ci_lo", "ci_hi"
    )


q_poisson_bootstrap_ci.__doc__ = q_poisson_bootstrap_ci.__doc__.replace(
    "{R}", str(_BOOT_R)
)


# ---------------------------------------------------------------------------
# CUPED A/B test + design audit
# ---------------------------------------------------------------------------

_AB_SPLIT = "2024-01-16"  # pre-period / experiment-period boundary
# assignment constants live in operators/experiment.py (shared with
# the streaming monitor); u60 values are 60-bit ints in a 16-hex
# field (top nibble always 0), so the 50/50 split point is
# floor(0.5 * 2^60), not '8000...'
_AB_SEED = AB_SEED
_ARM_A_MAX = ARM_A_MAX

_XY_CTE = f"""
peruser AS (
  SELECT user_id,
         sum(CASE WHEN ts < TIMESTAMP '{_AB_SPLIT}'
                  THEN CAST(value AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS xs,
         sum(CASE WHEN ts >= TIMESTAMP '{_AB_SPLIT}'
                  THEN CAST(value AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS ys
  FROM events GROUP BY user_id
),
assigned AS (
  SELECT user_id,
         CAST(xs AS DECIMAL(18,2)) AS x,
         CAST(ys AS DECIMAL(18,2)) AS y,
         CASE WHEN {u60_hex_sql(
             "'" + _AB_SEED + "' || CAST(user_id AS VARCHAR)")}
              < '{_ARM_A_MAX}' THEN 'A' ELSE 'B' END AS arm
  FROM peruser
)
"""


def _assigned_users(spark, sf_dir):
    """Per-user (x = pre-period value, y = experiment-period value,
    arm) with a deterministic md5 coin assignment — one
    map-side-combining groupBy over the event stream."""
    e = load_table(spark, sf_dir, "events")
    zero = F.lit(0).cast("decimal(18,2)")
    v = F.col("value").cast("decimal(18,2)")
    pre = F.col("ts") < F.lit(_AB_SPLIT).cast("timestamp")
    per = e.groupBy("user_id").agg(
        F.sum(F.when(pre, v).otherwise(zero)).alias("xs"),
        F.sum(F.when(~pre, v).otherwise(zero)).alias("ys"),
    )
    arm = F.when(
        u60_hex(F.concat(F.lit(_AB_SEED), F.col("user_id").cast("string")))
        < F.lit(_ARM_A_MAX),
        F.lit("A"),
    ).otherwise(F.lit("B"))
    return per.select(
        "user_id",
        # (18,2) end-to-end (ADVICE r8): the old (14,2) narrowing was a
        # truncation point where non-ANSI Spark NULLs while DuckDB CAST
        # raises — an asymmetric oracle break instead of a shared error
        F.col("xs").cast("decimal(18,2)").alias("x"),
        F.col("ys").cast("decimal(18,2)").alias("y"),
        arm.alias("arm"),
    )


@query(
    "cuped_adjusted_ab_test",
    f"""
    WITH {_XY_CTE.strip()},
    pool AS (
      -- upcasts force DuckDB's int128 multiply (the int64 fast path
      -- overflows); Spark's (18,2)x(18,2)->(37,4) is already exact
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x AS DECIMAL(19,2)) * CAST(x AS DECIMAL(19,2)))
               AS sxx,
             sum(CAST(x AS DECIMAL(19,2)) * CAST(y AS DECIMAL(19,2)))
               AS sxy
      FROM assigned
    ),
    th AS (
      SELECT round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                    * CAST(sy AS DOUBLE) / n)
                   / nullif(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                            * CAST(sx AS DOUBLE) / n, 0), 9) AS theta,
             round(CAST(sx AS DOUBLE) / n, 9) AS mx
      FROM pool
    ),
    adj AS (
      SELECT a.arm, a.y,
             CAST(round(CAST(a.y AS DOUBLE)
                        - t.theta * (CAST(a.x AS DOUBLE) - t.mx), 6)
                  AS DECIMAL(18,6)) AS yadj,
             t.theta
      FROM assigned a, th t
    ),
    arms AS (
      SELECT arm, theta, count(*) AS n, sum(y) AS sy, sum(yadj) AS sya,
             sum(CAST(y AS DECIMAL(19,2)) * CAST(y AS DECIMAL(19,2)))
               AS syy,
             sum(CAST(yadj AS DECIMAL(19,6))
                 * CAST(yadj AS DECIMAL(19,6))) AS syaa
      FROM adj GROUP BY arm, theta
    )
    SELECT arm, CAST(n AS BIGINT) AS n_users,
           round(CAST(sy AS DOUBLE) / n, 6) AS mean_y,
           round(CAST(sya AS DOUBLE) / n, 6) AS mean_y_adj,
           round(CAST(syy AS DOUBLE) / n
                 - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n),
                 6) AS var_y,
           round(CAST(syaa AS DOUBLE) / n
                 - (CAST(sya AS DOUBLE) / n) * (CAST(sya AS DOUBLE) / n),
                 6) AS var_y_adj,
           round(1.0 - (CAST(syaa AS DOUBLE) / n
                        - (CAST(sya AS DOUBLE) / n)
                          * (CAST(sya AS DOUBLE) / n))
                 / nullif(CAST(syy AS DOUBLE) / n
                          - (CAST(sy AS DOUBLE) / n)
                            * (CAST(sy AS DOUBLE) / n), 0),
                 6) AS var_reduction,
           theta
    FROM arms
    """,
)
def q_cuped_adjusted_ab_test(spark, sf_dir):
    """CUPED variance-reduced A/B readout (Deng et al. WSDM'13) on
    per-user event value: y_adj = y - theta (x - mean(x)) with theta =
    cov(x,y)/var(x) from the pooled pre-period covariate. Reports
    per-arm raw and adjusted means/variances and the realized variance
    reduction — the number that tells an experimenter how much sample
    size CUPED just bought them. Scale: one groupBy(user) over the
    stream, one single-row moment aggregate broadcast back, one final
    two-row aggregate; all moment sums are exact DECIMAL."""
    a = _assigned_users(spark, sf_dir).localCheckpoint(eager=False)
    pool = a.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    th = pool.select(
        F.round(
            (
                F.col("sxy").cast("double")
                - F.col("sx").cast("double")
                * F.col("sy").cast("double")
                / F.col("n")
            )
            / F.nullif(
                F.col("sxx").cast("double")
                - F.col("sx").cast("double")
                * F.col("sx").cast("double")
                / F.col("n"),
                F.lit(0.0),
            ),
            9,
        ).alias("theta"),
        F.round(F.col("sx").cast("double") / F.col("n"), 9).alias("mx"),
    )
    adj = a.crossJoin(F.broadcast(th)).select(
        "arm",
        "y",
        F.round(
            F.col("y").cast("double")
            - F.col("theta") * (F.col("x").cast("double") - F.col("mx")),
            6,
        )
        .cast("decimal(18,6)")
        .alias("yadj"),
        "theta",
    )
    arms = adj.groupBy("arm", "theta").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum("yadj").alias("sya"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("yadj") * F.col("yadj")).alias("syaa"),
    )
    n = F.col("n")
    my = F.col("sy").cast("double") / n
    mya = F.col("sya").cast("double") / n
    vy = F.col("syy").cast("double") / n - my * my
    vya = F.col("syaa").cast("double") / n - mya * mya
    return arms.select(
        "arm",
        n.cast("bigint").alias("n_users"),
        F.round(my, 6).alias("mean_y"),
        F.round(mya, 6).alias("mean_y_adj"),
        F.round(vy, 6).alias("var_y"),
        F.round(vya, 6).alias("var_y_adj"),
        F.round(F.lit(1.0) - vya / F.nullif(vy, F.lit(0.0)), 6).alias(
            "var_reduction"
        ),
        "theta",
    )


@query(
    "ab_design_audit",
    f"""
    WITH {_XY_CTE.strip()},
    stats AS (
      SELECT count(*) AS n,
             sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS nb,
             sum(y) AS sy,
             sum(CAST(y AS DECIMAL(19,2)) * CAST(y AS DECIMAL(19,2)))
               AS syy
      FROM assigned
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round((pow(CAST(na AS DOUBLE) - n / 2.0, 2)
                  + pow(CAST(nb AS DOUBLE) - n / 2.0, 2))
                 / (n / 2.0), 6) AS srm_chi2,
           CASE WHEN (pow(CAST(na AS DOUBLE) - n / 2.0, 2)
                      + pow(CAST(nb AS DOUBLE) - n / 2.0, 2))
                     / (n / 2.0) > 3.841 THEN 1 ELSE 0 END AS srm_flag,
           round(sqrt(CAST(syy AS DOUBLE) / n
                      - (CAST(sy AS DOUBLE) / n)
                        * (CAST(sy AS DOUBLE) / n)), 6) AS sd_y,
           round(CAST(sy AS DOUBLE) / n, 6) AS mean_y,
           round(2.8016 * sqrt(CAST(syy AS DOUBLE) / n
                               - (CAST(sy AS DOUBLE) / n)
                                 * (CAST(sy AS DOUBLE) / n))
                 * sqrt(1.0 / na + 1.0 / nb), 6) AS mde_abs,
           round(2.8016 * sqrt(CAST(syy AS DOUBLE) / n
                               - (CAST(sy AS DOUBLE) / n)
                                 * (CAST(sy AS DOUBLE) / n))
                 * sqrt(1.0 / na + 1.0 / nb)
                 / nullif(CAST(sy AS DOUBLE) / n, 0), 6) AS mde_rel
    FROM stats
    """,
)
def q_ab_design_audit(spark, sf_dir):
    """Pre-flight experiment checks on the same assignment: the
    sample-ratio-mismatch chi-square against the designed 50/50 split
    (SRM is the most common silent A/B killer) and the minimum
    detectable effect at alpha=.05 / power=.80 (z_a + z_b = 2.8016)
    given the realized per-user outcome variance. One single-row
    aggregate over the per-user table."""
    a = _assigned_users(spark, sf_dir)
    stats = a.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("nb"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    half = n / F.lit(2.0)
    chi2 = (
        F.pow(F.col("na").cast("double") - half, F.lit(2.0))
        + F.pow(F.col("nb").cast("double") - half, F.lit(2.0))
    ) / half
    my = F.col("sy").cast("double") / n
    sd = F.sqrt(F.col("syy").cast("double") / n - my * my)
    mde = (
        F.lit(2.8016)
        * sd
        * F.sqrt(F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb"))
    )
    return stats.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(chi2, 6).alias("srm_chi2"),
        F.when(chi2 > F.lit(3.841), F.lit(1)).otherwise(F.lit(0)).alias(
            "srm_flag"
        ),
        F.round(sd, 6).alias("sd_y"),
        F.round(my, 6).alias("mean_y"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / F.nullif(my, F.lit(0.0)), 6).alias("mde_rel"),
    )


_QTE_QS = [0.1, 0.25, 0.5, 0.75, 0.9]


@query(
    "quantile_treatment_effects",
    f"""
    WITH {_XY_CTE.strip()},
    wide AS (
      SELECT arm,
             {', '.join(
                 f"round(quantile_cont(CAST(y AS DOUBLE), {q}), 6)"
                 f" AS q{int(q * 100)}" for q in _QTE_QS)}
      FROM assigned GROUP BY arm
    ),
    ab AS (
      SELECT {', '.join(
          f"a.q{int(q * 100)} AS a{int(q * 100)},"
          f" b.q{int(q * 100)} AS b{int(q * 100)}" for q in _QTE_QS)}
      FROM wide a, wide b WHERE a.arm = 'A' AND b.arm = 'B'
    )
    {' UNION ALL '.join(
        f"SELECT CAST({q} AS DOUBLE) AS quantile, a{int(q * 100)} AS q_a,"
        f" b{int(q * 100)} AS q_b,"
        f" round(b{int(q * 100)} - a{int(q * 100)}, 6) AS qte FROM ab"
        for q in _QTE_QS)}
    """,
)
def q_quantile_treatment_effects(spark, sf_dir):
    """Quantile treatment effects: the per-arm exact percentiles of
    per-user outcome and their differences at p10..p90 — the
    distributional readout that catches an experiment helping the
    median user while hurting the tail (invisible to a mean diff).
    Scale: one groupBy(user) pass, then two percentile aggregates over
    per-user rows; at 100 TB swap percentile for percentile_approx
    without touching the stack step."""
    a = _assigned_users(spark, sf_dir)
    y = F.col("y").cast("double")
    wide = a.groupBy("arm").agg(
        *[
            F.round(F.percentile(y, F.lit(q)), 6).alias(f"q{int(q * 100)}")
            for q in _QTE_QS
        ]
    )
    wa = wide.filter(F.col("arm") == "A").select(
        *[F.col(f"q{int(q * 100)}").alias(f"a{int(q * 100)}") for q in _QTE_QS]
    )
    wb = wide.filter(F.col("arm") == "B").select(
        *[F.col(f"q{int(q * 100)}").alias(f"b{int(q * 100)}") for q in _QTE_QS]
    )
    ab = wa.crossJoin(F.broadcast(wb))
    parts = [
        ab.select(
            F.lit(q).alias("quantile"),
            F.col(f"a{int(q * 100)}").alias("q_a"),
            F.col(f"b{int(q * 100)}").alias("q_b"),
            F.round(
                F.col(f"b{int(q * 100)}") - F.col(f"a{int(q * 100)}"), 6
            ).alias("qte"),
        )
        for q in _QTE_QS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@query(
    "ab_funnel_conversion_ztest",
    f"""
    WITH {_XY_CTE.strip()},
    arms AS (
      SELECT count(*) AS n,
             sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS nb
      FROM assigned
    ),
    conv AS (
      SELECT DISTINCT e.user_id, e.event_type, a.arm
      FROM events e JOIN assigned a ON a.user_id = e.user_id
      WHERE e.ts >= TIMESTAMP '{_AB_SPLIT}'
    ),
    rates AS (
      SELECT event_type,
             sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS cb
      FROM conv GROUP BY event_type
    )
    SELECT r.event_type,
           CAST(ar.na AS BIGINT) AS n_a, CAST(ar.nb AS BIGINT) AS n_b,
           CAST(r.ca AS BIGINT) AS conv_a, CAST(r.cb AS BIGINT) AS conv_b,
           round(CAST(r.ca AS DOUBLE) / ar.na, 6) AS rate_a,
           round(CAST(r.cb AS DOUBLE) / ar.nb, 6) AS rate_b,
           round((CAST(r.cb AS DOUBLE) / ar.nb
                  - CAST(r.ca AS DOUBLE) / ar.na)
                 / sqrt((CAST(r.ca + r.cb AS DOUBLE) / (ar.na + ar.nb))
                        * (1.0 - CAST(r.ca + r.cb AS DOUBLE)
                                 / (ar.na + ar.nb))
                        * (1.0 / ar.na + 1.0 / ar.nb)), 4) AS z,
           CASE WHEN abs((CAST(r.cb AS DOUBLE) / ar.nb
                  - CAST(r.ca AS DOUBLE) / ar.na)
                 / sqrt((CAST(r.ca + r.cb AS DOUBLE) / (ar.na + ar.nb))
                        * (1.0 - CAST(r.ca + r.cb AS DOUBLE)
                                 / (ar.na + ar.nb))
                        * (1.0 / ar.na + 1.0 / ar.nb))) > 1.96
                THEN 1 ELSE 0 END AS significant
    FROM rates r, arms ar
    """,
)
def q_ab_funnel_conversion_ztest(spark, sf_dir):
    """Per-step conversion readout: for each event type, the share of
    users in each arm who performed it at least once during the
    experiment period, with the pooled two-proportion z test — the
    funnel-health companion to the value-based CUPED readout (a flat
    mean can hide one funnel step cratering). Scale: one distinct over
    (user, type, arm) post-split events + a 5-row aggregate against
    broadcast arm totals."""
    a = _assigned_users(spark, sf_dir).select("user_id", "arm")
    a = a.localCheckpoint(eager=False)  # feeds totals + the conv join
    arms = a.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("nb"),
    )
    e = load_table(spark, sf_dir, "events")
    conv = (
        e.filter(F.col("ts") >= F.lit(_AB_SPLIT).cast("timestamp"))
        .select("user_id", "event_type")
        .join(a, "user_id")
        .distinct()
    )
    rates = conv.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("cb"),
    )
    r = rates.crossJoin(F.broadcast(arms))
    na, nb = F.col("na"), F.col("nb")
    ca, cb = F.col("ca"), F.col("cb")
    pa = ca.cast("double") / na
    pb = cb.cast("double") / nb
    pool = (ca + cb).cast("double") / (na + nb)
    z = (pb - pa) / F.sqrt(
        pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    return r.select(
        "event_type",
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        ca.cast("bigint").alias("conv_a"),
        cb.cast("bigint").alias("conv_b"),
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(z, 4).alias("z"),
        F.when(F.abs(z) > F.lit(1.96), F.lit(1))
        .otherwise(F.lit(0))
        .alias("significant"),
    )


# ---------------------------------------------------------------------------
# jackknife SE for a ratio metric
# ---------------------------------------------------------------------------

_JK_BLOCKS = 32


@query(
    "jackknife_ratio_metric_se",
    f"""
    WITH blk AS (
      SELECT o_custkey % {_JK_BLOCKS} AS b,
             CAST(o_totalprice AS DECIMAL(12,2)) AS price
      FROM orders
    ),
    per AS (
      SELECT b, sum(price) AS sb, count(*) AS nb FROM blk GROUP BY b
    ),
    tot AS (SELECT sum(sb) AS s, sum(nb) AS n, count(*) AS nblocks
            FROM per),
    loo AS (
      SELECT p.b,
             CAST(round((CAST(t.s AS DOUBLE) - CAST(p.sb AS DOUBLE))
                        / (t.n - p.nb), 9) AS DECIMAL(28,9)) AS r
      FROM per p, tot t
    ),
    rb AS (
      SELECT round(CAST(sum(r) AS DOUBLE)
                   / (SELECT nblocks FROM tot), 9) AS rbar
      FROM loo
    ),
    dev AS (
      SELECT CAST(round((CAST(l.r AS DOUBLE) - rb.rbar)
                        * (CAST(l.r AS DOUBLE) - rb.rbar), 6)
                  AS DECIMAL(28,6)) AS d2
      FROM loo l, rb
    )
    SELECT round(CAST(t.s AS DOUBLE) / t.n, 6) AS ratio_point,
           rb.rbar AS jk_mean,
           round(sqrt((CAST(t.nblocks AS DOUBLE) - 1.0)
                      / CAST(t.nblocks AS DOUBLE)
                      * CAST((SELECT sum(d2) FROM dev) AS DOUBLE)),
                 6) AS jk_se,
           CAST(t.nblocks AS BIGINT) AS n_blocks
    FROM tot t, rb
    """,
)
def q_jackknife_ratio_metric_se(spark, sf_dir):
    """Delete-one-block jackknife standard error for mean revenue per
    order when the randomization unit is the CUSTOMER (32 customer
    blocks): the iid-row variance formula understates the SE of a
    ratio metric whose rows cluster within units; the block jackknife
    is the estimator ExP platforms actually ship. Scale: one
    map-side-combining groupBy into 32 block rows; everything after is
    constant-size with broadcast totals — at 100 TB the only full pass
    is the first aggregate."""
    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % _JK_BLOCKS).alias("b"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    per = o.groupBy("b").agg(
        F.sum("price").alias("sb"), F.count(F.lit(1)).alias("nb")
    )
    per = per.localCheckpoint(eager=False)  # feeds three consumers
    tot = per.agg(
        F.sum("sb").alias("s"),
        F.sum("nb").alias("n"),
        F.count(F.lit(1)).alias("nblocks"),
    )
    loo = per.crossJoin(F.broadcast(tot)).select(
        "b",
        "s",
        "n",
        "nblocks",
        F.round(
            (F.col("s").cast("double") - F.col("sb").cast("double"))
            / (F.col("n") - F.col("nb")),
            9,
        )
        .cast("decimal(28,9)")
        .alias("r"),
    )
    rb = loo.agg(
        F.round(
            F.sum("r").cast("double") / F.first("nblocks"), 9
        ).alias("rbar")
    )
    dev = loo.crossJoin(F.broadcast(rb)).select(
        "rbar",
        F.round(
            (F.col("r").cast("double") - F.col("rbar"))
            * (F.col("r").cast("double") - F.col("rbar")),
            6,
        )
        .cast("decimal(28,6)")
        .alias("d2"),
    )
    sumdev = dev.groupBy("rbar").agg(F.sum("d2").alias("sd2"))
    return (
        tot.crossJoin(F.broadcast(sumdev))
        .select(
            F.round(F.col("s").cast("double") / F.col("n"), 6).alias(
                "ratio_point"
            ),
            F.col("rbar").alias("jk_mean"),
            F.round(
                F.sqrt(
                    (F.col("nblocks").cast("double") - F.lit(1.0))
                    / F.col("nblocks").cast("double")
                    * F.col("sd2").cast("double")
                ),
                6,
            ).alias("jk_se"),
            F.col("nblocks").cast("bigint").alias("n_blocks"),
        )
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier repurchase survival
# ---------------------------------------------------------------------------

_KM_BIN_DAYS = 30


@query(
    "kaplan_meier_repurchase",
    f"""
    WITH dd AS (SELECT DISTINCT o_custkey AS c, o_orderdate AS d
                FROM orders),
    fst AS (SELECT c, min(d) AS d1 FROM dd GROUP BY c),
    snd AS (
      SELECT dd.c, min(dd.d) AS d2
      FROM dd JOIN fst ON fst.c = dd.c AND dd.d > fst.d1
      GROUP BY dd.c
    ),
    mx AS (SELECT max(o_orderdate) AS md FROM orders),
    base AS (
      SELECT fst.c,
             CASE WHEN snd.d2 IS NULL
                  THEN CAST(date_diff('day', fst.d1, mx.md) AS INT)
                  ELSE CAST(date_diff('day', fst.d1, snd.d2) AS INT)
             END AS dur,
             CASE WHEN snd.d2 IS NULL THEN 0 ELSE 1 END AS ev
      FROM fst LEFT JOIN snd ON snd.c = fst.c, mx
    ),
    bins AS (
      SELECT CAST(floor(dur / {_KM_BIN_DAYS}.0) AS INT) AS t,
             sum(ev) AS d, sum(1 - ev) AS cns
      FROM base GROUP BY 1
    ),
    risk AS (
      SELECT b1.t, b1.d, b1.cns, sum(b2.d + b2.cns) AS n_risk
      FROM bins b1 JOIN bins b2 ON b2.t >= b1.t
      GROUP BY b1.t, b1.d, b1.cns
    ),
    fct AS (
      SELECT t, d, cns, n_risk,
             round(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE), 9)
               AS factor
      FROM risk
    ),
    surv AS (
      SELECT a.t,
             sum(CASE WHEN b.factor <= 0 THEN NULL
                      ELSE CAST(round(ln(b.factor), 12)
                                AS DECIMAL(28,12)) END) AS lnsum,
             max(CASE WHEN b.factor <= 0 THEN 1 ELSE 0 END) AS hit0
      FROM fct a JOIN fct b ON b.t <= a.t
      GROUP BY a.t
    )
    SELECT f.t * {_KM_BIN_DAYS} AS t_days,
           CAST(f.n_risk AS BIGINT) AS n_risk,
           CAST(f.d AS BIGINT) AS n_events,
           CAST(f.cns AS BIGINT) AS n_censored,
           CASE WHEN s.hit0 = 1 THEN 0.0
                ELSE round(exp(CAST(s.lnsum AS DOUBLE)), 6)
           END AS survival
    FROM fct f JOIN surv s ON s.t = f.t
    """,
)
def q_kaplan_meier_repurchase(spark, sf_dir):
    """Kaplan-Meier survival curve of the first->second-purchase
    latency in 30-day bins, right-censoring one-time customers at the
    corpus horizon — the correct way to answer "how long until
    customers reorder" when many never have (naive averages over
    completed repurchases are survivorship-biased). Scale: two
    groupBys on custkey (co-partitioned), then everything runs on the
    ~90-row bin table via broadcast theta-joins; the product is an
    exact-DECIMAL log-sum so the curve reproduces as SQL."""
    o = load_table(spark, sf_dir, "orders")
    dd = o.select(
        F.col("o_custkey").alias("c"), F.col("o_orderdate").alias("d")
    ).distinct()
    fst = dd.groupBy("c").agg(F.min("d").alias("d1"))
    snd = (
        dd.join(fst, "c")
        .filter(F.col("d") > F.col("d1"))
        .groupBy("c")
        .agg(F.min("d").alias("d2"))
    )
    mx = o.agg(F.max("o_orderdate").alias("md"))
    base = (
        fst.join(snd, "c", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("d2").isNull(),
                F.datediff(F.col("md"), F.col("d1")),
            )
            .otherwise(F.datediff(F.col("d2"), F.col("d1")))
            .cast("int")
            .alias("dur"),
            F.when(F.col("d2").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .alias("ev"),
        )
    )
    bins = base.groupBy(
        F.floor(F.col("dur") / F.lit(float(_KM_BIN_DAYS)))
        .cast("int")
        .alias("t")
    ).agg(
        F.sum("ev").alias("d"),
        F.sum(F.lit(1) - F.col("ev")).alias("cns"),
    )
    bins = bins.localCheckpoint(eager=False)  # tiny; feeds two joins
    b2 = bins.select(
        F.col("t").alias("t2"), F.col("d").alias("d2"), F.col("cns").alias("c2")
    )
    risk = (
        bins.join(F.broadcast(b2), F.col("t2") >= F.col("t"))
        .groupBy("t", "d", "cns")
        .agg(F.sum(F.col("d2") + F.col("c2")).alias("n_risk"))
    )
    fct = risk.select(
        "t",
        "d",
        "cns",
        "n_risk",
        F.round(
            F.lit(1.0)
            - F.col("d").cast("double") / F.col("n_risk").cast("double"),
            9,
        ).alias("factor"),
    ).localCheckpoint(eager=False)
    fb = fct.select(F.col("t").alias("tb"), F.col("factor").alias("fb"))
    surv = (
        fct.join(F.broadcast(fb), F.col("tb") <= F.col("t"))
        .groupBy("t")
        .agg(
            F.sum(
                F.when(F.col("fb") <= 0, F.lit(None)).otherwise(
                    F.round(F.log(F.col("fb")), 12).cast("decimal(28,12)")
                )
            ).alias("lnsum"),
            F.max(
                F.when(F.col("fb") <= 0, F.lit(1)).otherwise(F.lit(0))
            ).alias("hit0"),
        )
    )
    return fct.join(surv, "t").select(
        (F.col("t") * F.lit(_KM_BIN_DAYS)).alias("t_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.col("cns").cast("bigint").alias("n_censored"),
        F.when(F.col("hit0") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("lnsum").cast("double")), 6))
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# sequential monitoring + difference-in-differences
# ---------------------------------------------------------------------------

_SEQ_HORIZON = SEQ_HORIZON
_SEQ_START = SEQ_START
_OBF_C = OBF_C


@query(
    "sequential_ab_monitoring",
    f"""
    WITH daily0 AS (
      SELECT CAST(date_diff('day', DATE '{_SEQ_START}', CAST(ts AS DATE))
                  + 1 AS INT) AS day, user_id, value
      FROM events
    ),
    daily AS (
      SELECT day,
             CASE WHEN {u60_hex_sql(
                 "'" + _AB_SEED + "' || CAST(user_id AS VARCHAR)")}
                  < '{_ARM_A_MAX}' THEN 'A' ELSE 'B' END AS arm,
             count(*) AS n,
             sum(CAST(value AS DECIMAL(18,2))) AS s,
             sum(CAST(value AS DECIMAL(19,2))
                 * CAST(value AS DECIMAL(19,2))) AS ss
      FROM daily0 WHERE day BETWEEN 1 AND {_SEQ_HORIZON}
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT a.day, a.arm, sum(b.n) AS cn, sum(b.s) AS cs,
             sum(b.ss) AS css
      FROM daily a JOIN daily b ON b.arm = a.arm AND b.day <= a.day
      GROUP BY a.day, a.arm
    ),
    wide AS (
      SELECT ca.day,
             ca.cn AS na, CAST(ca.cs AS DOUBLE) AS sa,
             CAST(ca.css AS DOUBLE) AS ssa,
             cb.cn AS nb, CAST(cb.cs AS DOUBLE) AS sb,
             CAST(cb.css AS DOUBLE) AS ssb
      FROM cum ca JOIN cum cb ON cb.day = ca.day
      WHERE ca.arm = 'A' AND cb.arm = 'B'
    )
    SELECT day, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(sa / na, 6) AS mean_a,
           round(sb / nb, 6) AS mean_b,
           round((sa / na - sb / nb)
                 / sqrt(((ssa - sa * sa / na) + (ssb - sb * sb / nb))
                        / (na + nb) * (1.0 / na + 1.0 / nb)), 4) AS z,
           round({_OBF_C} / sqrt(day / {_SEQ_HORIZON}.0), 4) AS z_crit,
           CASE WHEN abs((sa / na - sb / nb)
                 / sqrt(((ssa - sa * sa / na) + (ssb - sb * sb / nb))
                        / (na + nb) * (1.0 / na + 1.0 / nb)))
                > {_OBF_C} / sqrt(day / {_SEQ_HORIZON}.0)
                THEN 1 ELSE 0 END AS crossed
    FROM wide
    """,
)
def q_sequential_ab_monitoring(spark, sf_dir):
    """Group-sequential A/B monitoring: the cumulative-through-day-d
    z statistic for mean event value between md5-assigned arms,
    checked against an O'Brien-Fleming-shaped boundary C/sqrt(t) at
    information fraction t = d/30 — the always-valid peeking
    discipline that stops an experiment early without inflating false
    positives (naive daily z>1.96 peeking has ~20%+ type-I error over
    a month). Scale: one groupBy(day, arm) over the stream, then the
    cumulative runs on the ~60-row daily table via a broadcast
    theta-join — the full pass is the only corpus-sized stage. The
    kernels are shared verbatim with the streaming twin
    (streaming/monitor.py), so batch == streaming by construction."""
    e = load_table(spark, sf_dir, "events")
    return monitor_readout_from_daily(daily_arm_moments(e))


@query(
    "diff_in_differences",
    f"""
    WITH {_XY_CTE.strip()},
    chg AS (
      SELECT arm, x, y, CAST(y - x AS DECIMAL(15,2)) AS d
      FROM assigned
    ),
    cells AS (
      SELECT arm, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(d) AS sd,
             sum(CAST(d AS DECIMAL(19,2)) * CAST(d AS DECIMAL(19,2)))
               AS sdd
      FROM chg GROUP BY arm
    ),
    wide AS (
      SELECT a.n AS na, CAST(a.sx AS DOUBLE) AS sxa,
             CAST(a.sy AS DOUBLE) AS sya, CAST(a.sd AS DOUBLE) AS sda,
             CAST(a.sdd AS DOUBLE) AS sdda,
             b.n AS nb, CAST(b.sx AS DOUBLE) AS sxb,
             CAST(b.sy AS DOUBLE) AS syb, CAST(b.sd AS DOUBLE) AS sdb,
             CAST(b.sdd AS DOUBLE) AS sddb
      FROM cells a, cells b WHERE a.arm = 'A' AND b.arm = 'B'
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(sxa / na, 6) AS pre_mean_a,
           round(sya / na, 6) AS post_mean_a,
           round(sxb / nb, 6) AS pre_mean_b,
           round(syb / nb, 6) AS post_mean_b,
           round(sdb / nb - sda / na, 6) AS did_effect,
           round(sqrt((sdda / na - (sda / na) * (sda / na)) / na
                      + (sddb / nb - (sdb / nb) * (sdb / nb)) / nb),
                 6) AS se,
           round((sdb / nb - sda / na)
                 / nullif(sqrt((sdda / na - (sda / na) * (sda / na)) / na
                      + (sddb / nb - (sdb / nb) * (sdb / nb)) / nb), 0),
                 4) AS t_stat
    FROM wide
    """,
)
def q_diff_in_differences(spark, sf_dir):
    """Difference-in-differences on per-user pre/post value: the
    panel-data form (effect = mean per-user change in B minus mean
    per-user change in A) with its standard error — the measurement a
    staged rollout uses when randomization isn't available and both
    groups share a time trend. Scale: one groupBy(user), one two-row
    cell aggregate; everything downstream is a single-row select."""
    a = _assigned_users(spark, sf_dir)
    chg = a.select(
        "arm",
        "x",
        "y",
        (F.col("y") - F.col("x")).cast("decimal(15,2)").alias("d"),
    )
    cells = chg.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("d").alias("sd"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
    )
    ca = cells.filter(F.col("arm") == "A").select(
        F.col("n").alias("na"),
        F.col("sx").cast("double").alias("sxa"),
        F.col("sy").cast("double").alias("sya"),
        F.col("sd").cast("double").alias("sda"),
        F.col("sdd").cast("double").alias("sdda"),
    )
    cb = cells.filter(F.col("arm") == "B").select(
        F.col("n").alias("nb"),
        F.col("sx").cast("double").alias("sxb"),
        F.col("sy").cast("double").alias("syb"),
        F.col("sd").cast("double").alias("sdb"),
        F.col("sdd").cast("double").alias("sddb"),
    )
    w = ca.crossJoin(F.broadcast(cb))
    na, nb = F.col("na"), F.col("nb")
    sda, sdb = F.col("sda"), F.col("sdb")
    did = sdb / nb - sda / na
    se = F.sqrt(
        (F.col("sdda") / na - (sda / na) * (sda / na)) / na
        + (F.col("sddb") / nb - (sdb / nb) * (sdb / nb)) / nb
    )
    return w.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        F.round(F.col("sxa") / na, 6).alias("pre_mean_a"),
        F.round(F.col("sya") / na, 6).alias("post_mean_a"),
        F.round(F.col("sxb") / nb, 6).alias("pre_mean_b"),
        F.round(F.col("syb") / nb, 6).alias("post_mean_b"),
        F.round(did, 6).alias("did_effect"),
        F.round(se, 6).alias("se"),
        F.round(did / F.nullif(se, F.lit(0.0)), 4).alias("t_stat"),
    )


# ---------------------------------------------------------------------------
# chi-square term selection
# ---------------------------------------------------------------------------

_CHI2_TOPK = 20


@query(
    "chi2_term_selection",
    f"""
    WITH rnorm AS (SELECT doc_id, lang, {_NORM} AS t FROM documents),
    pres AS (
      SELECT DISTINCT doc_id, lang, g FROM (
        SELECT doc_id, lang, unnest(string_split(t, ' ')) AS g
        FROM rnorm WHERE length(t) > 0)
    ),
    ndocs AS (SELECT count(*) AS nd FROM rnorm WHERE length(t) > 0),
    nlang AS (SELECT lang, count(*) AS nl FROM rnorm
              WHERE length(t) > 0 GROUP BY lang),
    tl AS (SELECT lang, g, count(*) AS a FROM pres GROUP BY lang, g),
    tg AS (SELECT g, count(*) AS df FROM pres GROUP BY g),
    chi AS (
      SELECT tl.lang, tl.g AS term,
             CAST(tl.a AS BIGINT) AS a,
             CAST(tg.df - tl.a AS BIGINT) AS b,
             CAST(nlang.nl - tl.a AS BIGINT) AS c,
             CAST(ndocs.nd - nlang.nl - (tg.df - tl.a) AS BIGINT) AS d,
             CAST(ndocs.nd AS BIGINT) AS nd
      FROM tl
      JOIN tg ON tg.g = tl.g
      JOIN nlang ON nlang.lang = tl.lang
      CROSS JOIN ndocs
    ),
    scored AS (
      -- a zero margin (term in every doc, or a single-language corpus)
      -- zeroes the numerator too: the term carries no signal -> chi2 0
      SELECT lang, term, a + b AS doc_freq,
             round(coalesce(CAST(nd AS DOUBLE)
                   * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
                   * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
                   / nullif(CAST(a + b AS DOUBLE) * (c + d)
                            * (a + c) * (b + d), 0), 0.0), 4) AS chi2
      FROM chi
    ),
    ranked AS (
      SELECT lang, term, doc_freq, chi2,
             row_number() OVER (PARTITION BY lang
                                ORDER BY chi2 DESC, term ASC) AS rnk
      FROM scored
    )
    SELECT lang, term, CAST(doc_freq AS BIGINT) AS doc_freq, chi2,
           CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {_CHI2_TOPK}
    """,
)
def q_chi2_term_selection(spark, sf_dir):
    """Chi-square feature selection: the {K} most
    language-discriminative terms per language from doc-level presence
    counts (one-vs-rest 2x2 contingency per (term, lang)) — the
    classic supervised vocabulary pruner for classifier gates and
    routing features. Scale: presence is a narrow explode + distinct
    on (doc, lang, term); counts are two map-side-combining groupBys
    keyed by term; the rank window is PARTITIONED by lang over
    vocab-sized input — never a global sort."""
    from pyspark.sql import Window as W

    from commercial_rfp_data_pipeline_spark.operators.textops import (
        norm_text,
        words,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .filter(F.length(norm_text("text")) > 0)
    )
    docs = docs.localCheckpoint(eager=False)
    pres = docs.select(
        "doc_id", "lang", F.explode(words("text")).alias("g")
    ).distinct()
    ndocs = docs.agg(F.count(F.lit(1)).alias("nd"))
    nlang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("nl"))
    tl = pres.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("a"))
    tg = pres.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    chi = (
        tl.join(tg, "g")
        .join(F.broadcast(nlang), "lang")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "lang",
            F.col("g").alias("term"),
            F.col("a").cast("bigint").alias("a"),
            (F.col("df") - F.col("a")).cast("bigint").alias("b"),
            (F.col("nl") - F.col("a")).cast("bigint").alias("c"),
            (F.col("nd") - F.col("nl") - (F.col("df") - F.col("a")))
            .cast("bigint")
            .alias("d"),
            F.col("nd").cast("bigint").alias("nd"),
        )
    )
    num = F.col("a").cast("double") * F.col("d") - F.col("b").cast(
        "double"
    ) * F.col("c")
    den = (
        (F.col("a") + F.col("b")).cast("double")
        * (F.col("c") + F.col("d"))
        * (F.col("a") + F.col("c"))
        * (F.col("b") + F.col("d"))
    )
    scored = chi.select(
        "lang",
        "term",
        (F.col("a") + F.col("b")).alias("doc_freq"),
        F.round(
            F.coalesce(
                F.col("nd").cast("double") * num * num
                / F.nullif(den, F.lit(0.0)),
                F.lit(0.0),
            ),
            4,
        ).alias("chi2"),
    )
    w = W.partitionBy("lang").orderBy(
        F.col("chi2").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _CHI2_TOPK)
        .select(
            "lang",
            "term",
            F.col("doc_freq").cast("bigint").alias("doc_freq"),
            "chi2",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


q_chi2_term_selection.__doc__ = q_chi2_term_selection.__doc__.replace(
    "{K}", str(_CHI2_TOPK)
)


# ---------------------------------------------------------------------------
# ROUGE n-gram eval
# ---------------------------------------------------------------------------


@query(
    "rouge_ngram_eval",
    f"""
    WITH rnorm AS (SELECT doc_id, lang, {_NORM} AS t FROM documents),
    wl AS (SELECT doc_id, lang, string_split(t, ' ') AS w
           FROM rnorm WHERE length(t) > 0),
    prs AS (
      SELECT a.doc_id AS pid, a.lang,
             a.doc_id AS ref_id, b.doc_id AS cand_id
      FROM wl a JOIN wl b ON b.doc_id = a.doc_id + 1 AND b.lang = a.lang
    ),
    c1 AS (
      SELECT doc_id, g, count(*) AS c FROM (
        SELECT doc_id, w[i] AS g
        FROM (SELECT doc_id, w,
                     unnest(generate_series(1, len(w))) AS i FROM wl))
      GROUP BY doc_id, g
    ),
    c2 AS (
      SELECT doc_id, g, count(*) AS c FROM (
        SELECT doc_id, w[i] || ' ' || w[i+1] AS g
        FROM (SELECT doc_id, w,
                     unnest(generate_series(1, greatest(len(w) - 1, 0)))
                       AS i FROM wl))
      GROUP BY doc_id, g
    ),
    t1 AS (SELECT doc_id, sum(c) AS tot FROM c1 GROUP BY doc_id),
    t2 AS (SELECT doc_id, sum(c) AS tot FROM c2 GROUP BY doc_id),
    ov1 AS (
      SELECT p.pid, sum(least(r.c, k.c)) AS clip
      FROM prs p
      JOIN c1 r ON r.doc_id = p.ref_id
      JOIN c1 k ON k.doc_id = p.cand_id AND k.g = r.g
      GROUP BY p.pid
    ),
    ov2 AS (
      SELECT p.pid, sum(least(r.c, k.c)) AS clip
      FROM prs p
      JOIN c2 r ON r.doc_id = p.ref_id
      JOIN c2 k ON k.doc_id = p.cand_id AND k.g = r.g
      GROUP BY p.pid
    ),
    m AS (
      SELECT p.pid, p.lang,
             CAST(COALESCE(o1.clip, 0) AS BIGINT) AS cl1,
             CAST(tr1.tot AS BIGINT) AS rt1, CAST(tk1.tot AS BIGINT) AS ct1,
             CAST(COALESCE(o2.clip, 0) AS BIGINT) AS cl2,
             CAST(COALESCE(tr2.tot, 0) AS BIGINT) AS rt2,
             CAST(COALESCE(tk2.tot, 0) AS BIGINT) AS ct2
      FROM prs p
      LEFT JOIN ov1 o1 ON o1.pid = p.pid
      JOIN t1 tr1 ON tr1.doc_id = p.ref_id
      JOIN t1 tk1 ON tk1.doc_id = p.cand_id
      LEFT JOIN ov2 o2 ON o2.pid = p.pid
      LEFT JOIN t2 tr2 ON tr2.doc_id = p.ref_id
      LEFT JOIN t2 tk2 ON tk2.doc_id = p.cand_id
    ),
    fm AS (
      SELECT pid, lang,
             CAST(round(CAST(cl1 AS DOUBLE) / ct1, 6) AS DECIMAL(18,6))
               AS p1,
             CAST(round(CAST(cl1 AS DOUBLE) / rt1, 6) AS DECIMAL(18,6))
               AS r1,
             CASE WHEN cl1 = 0 THEN CAST(0 AS DECIMAL(18,6))
                  ELSE CAST(round(
                    2.0 * (CAST(cl1 AS DOUBLE) / ct1)
                        * (CAST(cl1 AS DOUBLE) / rt1)
                    / ((CAST(cl1 AS DOUBLE) / ct1)
                       + (CAST(cl1 AS DOUBLE) / rt1)), 6)
                    AS DECIMAL(18,6)) END AS f1,
             CASE WHEN cl2 = 0 OR ct2 = 0 OR rt2 = 0
                  THEN CAST(0 AS DECIMAL(18,6))
                  ELSE CAST(round(
                    2.0 * (CAST(cl2 AS DOUBLE) / ct2)
                        * (CAST(cl2 AS DOUBLE) / rt2)
                    / ((CAST(cl2 AS DOUBLE) / ct2)
                       + (CAST(cl2 AS DOUBLE) / rt2)), 6)
                    AS DECIMAL(18,6)) END AS f2
      FROM m
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(sum(p1) AS DOUBLE) / count(*), 6) AS rouge1_p,
           round(CAST(sum(r1) AS DOUBLE) / count(*), 6) AS rouge1_r,
           round(CAST(sum(f1) AS DOUBLE) / count(*), 6) AS rouge1_f,
           round(CAST(sum(f2) AS DOUBLE) / count(*), 6) AS rouge2_f
    FROM fm GROUP BY lang
    """,
)
def q_rouge_ngram_eval(spark, sf_dir):
    """ROUGE-1/-2 (clipped n-gram precision/recall/F1, Lin 2004)
    between paired documents (successive doc_ids in the same
    language, a=reference / b=candidate) — the reference-based
    generation-eval metric, aggregated per language. Scale: gram
    counting is a narrow explode + map-side-combining groupBy; the
    clipped overlap joins key on (doc_id, gram), so each pair's work
    is bounded by its own vocabulary — never corpus x corpus."""
    from commercial_rfp_data_pipeline_spark.operators.textops import (
        norm_text,
        shingles,
        words,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .filter(F.length(norm_text("text")) > 0)
    )
    uni = (
        docs.select("doc_id", F.explode(words("text")).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        shingles(docs, k=2)
        .groupBy("doc_id", F.col("sh").alias("g"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t1 = uni.groupBy("doc_id").agg(F.sum("c").alias("tot"))
    t2 = bi.groupBy("doc_id").agg(F.sum("c").alias("tot"))
    prs = (
        docs.select(
            F.col("doc_id").alias("pid"),
            "lang",
            F.col("doc_id").alias("ref_id"),
            (F.col("doc_id") + F.lit(1)).alias("_nxt"),
        )
        .join(
            docs.select(
                F.col("doc_id").alias("cand_id"), F.col("lang").alias("_bl")
            ),
            F.col("_nxt") == F.col("cand_id"),
        )
        .filter(F.col("lang") == F.col("_bl"))
        .select("pid", "lang", "ref_id", "cand_id")
    )

    def _clip(cnt):
        r = cnt.select(
            F.col("doc_id").alias("ref_id"),
            F.col("g"),
            F.col("c").alias("rc"),
        )
        k = cnt.select(
            F.col("doc_id").alias("cand_id"),
            F.col("g"),
            F.col("c").alias("kc"),
        )
        return (
            prs.join(r, "ref_id")
            .join(k, ["cand_id", "g"])
            .groupBy("pid")
            .agg(F.sum(F.least("rc", "kc")).alias("clip"))
        )

    m = (
        prs.join(_clip(uni).withColumnRenamed("clip", "cl1"), "pid", "left")
        .join(
            t1.select(F.col("doc_id").alias("ref_id"), F.col("tot").alias("rt1")),
            "ref_id",
        )
        .join(
            t1.select(
                F.col("doc_id").alias("cand_id"), F.col("tot").alias("ct1")
            ),
            "cand_id",
        )
        .join(_clip(bi).withColumnRenamed("clip", "cl2"), "pid", "left")
        .join(
            t2.select(F.col("doc_id").alias("ref_id"), F.col("tot").alias("rt2")),
            "ref_id",
            "left",
        )
        .join(
            t2.select(
                F.col("doc_id").alias("cand_id"), F.col("tot").alias("ct2")
            ),
            "cand_id",
            "left",
        )
        .select(
            "pid",
            "lang",
            F.coalesce("cl1", F.lit(0)).cast("bigint").alias("cl1"),
            F.col("rt1").cast("bigint").alias("rt1"),
            F.col("ct1").cast("bigint").alias("ct1"),
            F.coalesce("cl2", F.lit(0)).cast("bigint").alias("cl2"),
            F.coalesce("rt2", F.lit(0)).cast("bigint").alias("rt2"),
            F.coalesce("ct2", F.lit(0)).cast("bigint").alias("ct2"),
        )
    )
    zero = F.lit(0).cast("decimal(18,6)")

    def _f(cl, ct, rt, guard):
        p = F.col(cl).cast("double") / F.col(ct)
        r = F.col(cl).cast("double") / F.col(rt)
        return F.when(guard, zero).otherwise(
            F.round(F.lit(2.0) * p * r / (p + r), 6).cast("decimal(18,6)")
        )

    fm = m.select(
        "pid",
        "lang",
        F.round(F.col("cl1").cast("double") / F.col("ct1"), 6)
        .cast("decimal(18,6)")
        .alias("p1"),
        F.round(F.col("cl1").cast("double") / F.col("rt1"), 6)
        .cast("decimal(18,6)")
        .alias("r1"),
        _f("cl1", "ct1", "rt1", F.col("cl1") == 0).alias("f1"),
        _f(
            "cl2",
            "ct2",
            "rt2",
            (F.col("cl2") == 0) | (F.col("ct2") == 0) | (F.col("rt2") == 0),
        ).alias("f2"),
    )
    n = F.count(F.lit(1))
    return fm.groupBy("lang").agg(
        n.cast("bigint").alias("n_pairs"),
        F.round(F.sum("p1").cast("double") / n, 6).alias("rouge1_p"),
        F.round(F.sum("r1").cast("double") / n, 6).alias("rouge1_r"),
        F.round(F.sum("f1").cast("double") / n, 6).alias("rouge1_f"),
        F.round(F.sum("f2").cast("double") / n, 6).alias("rouge2_f"),
    )


# ---------------------------------------------------------------------------
# annotator label model (majority vote -> one-step Dawid-Skene)
# ---------------------------------------------------------------------------

_ANN_N = 5
_ANN_P = [0.05 + 0.08 * a for a in range(_ANN_N)]  # per-annotator noise
_ANN_THR = [frac_to_hex(p) for p in _ANN_P]
_ANN_SEED = "an1:"

_ANN_THR_SQL = "CASE an.a " + " ".join(
    f"WHEN {a} THEN '{h}'" for a, h in enumerate(_ANN_THR[:-1])
) + f" ELSE '{_ANN_THR[-1]}' END"

# shared synthetic-annotation CTE prefix (ends in `votes(doc_id, a,
# vote)`) — used by annotator_label_model AND krippendorff_alpha
_ANN_VOTES_CTE = f"""
toks AS (
  SELECT doc_id,
         CASE WHEN length(t) = 0 THEN 0
              ELSE len(string_split(t, ' ')) END AS n_tokens
  FROM (SELECT doc_id, {_NORM} AS t FROM documents)
),
truth AS (
  SELECT doc_id, CASE WHEN n_tokens < 40 THEN 0
                      WHEN n_tokens < 65 THEN 1 ELSE 2 END AS band
  FROM toks
),
annx AS (SELECT CAST(a AS INT) AS a
         FROM unnest(generate_series(0, {_ANN_N - 1})) t(a)),
keyed AS (
  SELECT tr.doc_id, an.a, tr.band,
         md5('{_ANN_SEED}' || CAST(tr.doc_id AS VARCHAR) || '#'
             || CAST(an.a AS VARCHAR)) AS h,
         {_ANN_THR_SQL} AS thr
  FROM truth tr CROSS JOIN annx an
),
votes AS (
  SELECT doc_id, a,
         CASE WHEN lpad(substring(h, 1, 15), 16, '0') < thr
              THEN (band + CASE WHEN substring(h, 16, 1) < '8'
                                THEN 1 ELSE 2 END) % 3
              ELSE band END AS vote
  FROM keyed
)
"""


def _annotator_votes(spark, sf_dir):
    """(doc_id, a, vote) — 5 synthetic annotators per document, md5
    noise flips at per-annotator rates; a 5x narrow map."""
    from commercial_rfp_data_pipeline_spark.operators.textops import (
        token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    tc = token_count("text")
    truth = docs.select(
        "doc_id",
        F.when(tc < 40, F.lit(0))
        .when(tc < 65, F.lit(1))
        .otherwise(F.lit(2))
        .alias("band"),
    )
    ann = spark.range(_ANN_N).select(F.col("id").cast("int").alias("a"))
    thr = F.when(F.col("a") == 0, F.lit(_ANN_THR[0]))
    for i in range(1, _ANN_N - 1):
        thr = thr.when(F.col("a") == i, F.lit(_ANN_THR[i]))
    thr = thr.otherwise(F.lit(_ANN_THR[-1]))
    h = F.md5(
        F.concat(
            F.lit(_ANN_SEED),
            F.col("doc_id").cast("string"),
            F.lit("#"),
            F.col("a").cast("string"),
        )
    )
    keyed = truth.crossJoin(F.broadcast(ann)).select(
        "doc_id", "a", "band", h.alias("h"), thr.alias("thr")
    )
    shift = F.when(F.substring("h", 16, 1) < "8", F.lit(1)).otherwise(
        F.lit(2)
    )
    return keyed.select(
        "doc_id",
        "a",
        F.when(
            F.lpad(F.substring("h", 1, 15), 16, "0") < F.col("thr"),
            (F.col("band") + shift) % 3,
        )
        .otherwise(F.col("band"))
        .alias("vote"),
    )


@query(
    "annotator_label_model",
    f"""
    WITH {_ANN_VOTES_CTE.strip()},
    vc AS (SELECT doc_id, vote, count(*) AS c FROM votes
           GROUP BY doc_id, vote),
    mxc AS (SELECT doc_id, max(c) AS mc FROM vc GROUP BY doc_id),
    mv AS (
      SELECT v.doc_id, min(v.vote) AS mvl
      FROM vc v JOIN mxc ON mxc.doc_id = v.doc_id AND v.c = mxc.mc
      GROUP BY v.doc_id
    ),
    accs AS (
      SELECT vt.a, count(*) AS n_labels,
             sum(CASE WHEN vt.vote = mv.mvl THEN 1 ELSE 0 END) AS hits
      FROM votes vt JOIN mv ON mv.doc_id = vt.doc_id GROUP BY vt.a
    ),
    wts AS (
      SELECT a, n_labels,
             round(CAST(hits AS DOUBLE) / n_labels, 6) AS acc,
             round(ln(greatest(CAST(hits AS DOUBLE) / n_labels, 0.01)
                      * 2.0
                      / greatest(1.0 - CAST(hits AS DOUBLE) / n_labels,
                                 0.01)), 6) AS weight
      FROM accs
    ),
    dsv AS (
      SELECT vt.doc_id, vt.vote,
             sum(CAST(w.weight AS DECIMAL(18,6))) AS sw
      FROM votes vt JOIN wts w ON w.a = vt.a
      GROUP BY vt.doc_id, vt.vote
    ),
    dsm AS (SELECT doc_id, max(sw) AS ms FROM dsv GROUP BY doc_id),
    ds AS (
      SELECT d.doc_id, min(d.vote) AS dsl
      FROM dsv d JOIN dsm ON dsm.doc_id = d.doc_id AND d.sw = dsm.ms
      GROUP BY d.doc_id
    ),
    chg AS (
      SELECT count(*) AS n_changed
      FROM ds JOIN mv ON mv.doc_id = ds.doc_id WHERE ds.dsl <> mv.mvl
    )
    SELECT w.a AS annotator, CAST(w.n_labels AS BIGINT) AS n_labels,
           w.acc, w.weight, CAST(c.n_changed AS BIGINT) AS ds_changed_docs
    FROM wts w, chg c
    """,
)
def q_annotator_label_model(spark, sf_dir):
    """RLHF-style label aggregation: 5 synthetic annotators (md5-noise
    flips at per-annotator rates 0.05..0.37) label each document's
    quality band; majority vote estimates each annotator's accuracy,
    then a log-odds-weighted revote (one Dawid-Skene EM step) produces
    the final labels. Reports per-annotator accuracy/weight and how
    many documents the weighted vote flipped vs the raw majority —
    exactly the reliability dashboard an annotation pipeline needs.
    Scale: votes are a 5x narrow map over documents; every argmax is a
    (doc)-keyed groupBy with map-side combine; the weight table is
    5 rows broadcast."""
    votes = _annotator_votes(spark, sf_dir).localCheckpoint(eager=False)
    vc = votes.groupBy("doc_id", "vote").agg(F.count(F.lit(1)).alias("c"))
    mxc = vc.groupBy("doc_id").agg(F.max("c").alias("mc"))
    mv = (
        vc.join(mxc, "doc_id")
        .filter(F.col("c") == F.col("mc"))
        .groupBy("doc_id")
        .agg(F.min("vote").alias("mvl"))
    )
    accs = (
        votes.join(mv, "doc_id")
        .groupBy("a")
        .agg(
            F.count(F.lit(1)).alias("n_labels"),
            F.sum(
                F.when(F.col("vote") == F.col("mvl"), 1).otherwise(0)
            ).alias("hits"),
        )
    )
    accd = F.col("hits").cast("double") / F.col("n_labels")
    wts = accs.select(
        "a",
        "n_labels",
        F.round(accd, 6).alias("acc"),
        F.round(
            F.log(
                F.greatest(accd, F.lit(0.01))
                * F.lit(2.0)
                / F.greatest(F.lit(1.0) - accd, F.lit(0.01))
            ),
            6,
        ).alias("weight"),
    ).localCheckpoint(eager=False)
    dsv = (
        votes.join(
            F.broadcast(
                wts.select("a", F.col("weight").cast("decimal(18,6)").alias("w"))
            ),
            "a",
        )
        .groupBy("doc_id", "vote")
        .agg(F.sum("w").alias("sw"))
    )
    dsm = dsv.groupBy("doc_id").agg(F.max("sw").alias("ms"))
    ds = (
        dsv.join(dsm, "doc_id")
        .filter(F.col("sw") == F.col("ms"))
        .groupBy("doc_id")
        .agg(F.min("vote").alias("dsl"))
    )
    chg = (
        ds.join(mv, "doc_id")
        .filter(F.col("dsl") != F.col("mvl"))
        .agg(F.count(F.lit(1)).alias("n_changed"))
    )
    return wts.crossJoin(F.broadcast(chg)).select(
        F.col("a").alias("annotator"),
        F.col("n_labels").cast("bigint").alias("n_labels"),
        "acc",
        "weight",
        F.col("n_changed").cast("bigint").alias("ds_changed_docs"),
    )


@query(
    "krippendorff_alpha_nominal",
    f"""
    WITH {_ANN_VOTES_CTE.strip()},
    vc AS (SELECT doc_id, vote, count(*) AS c FROM votes
           GROUP BY doc_id, vote),
    um AS (SELECT doc_id, sum(c) AS m FROM vc GROUP BY doc_id),
    disag AS (
      SELECT sum(vc.c * (um.m - vc.c)) AS pairs_disagree,
             sum(vc.c * (um.m - 1)) AS pairs_total
      FROM vc JOIN um ON um.doc_id = vc.doc_id
    ),
    gl AS (
      SELECT vote, count(*) AS nc FROM votes GROUP BY vote
    ),
    tot AS (SELECT sum(nc) AS n FROM gl),
    de AS (
      SELECT sum(CAST(g.nc AS DOUBLE) * (t.n - g.nc))
               / (CAST(t.n AS DOUBLE) * (t.n - 1)) AS de_rate,
             CAST(t.n AS BIGINT) AS n_votes
      FROM gl g, tot t GROUP BY t.n
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM um) AS n_docs,
           de.n_votes,
           round(CAST(d.pairs_disagree AS DOUBLE)
                 / CAST(d.pairs_total AS DOUBLE), 6) AS do_rate,
           round(de.de_rate, 6) AS de_rate,
           round(1.0 - (CAST(d.pairs_disagree AS DOUBLE)
                        / CAST(d.pairs_total AS DOUBLE)) / de.de_rate,
                 6) AS alpha
    FROM disag d, de
    """,
)
def q_krippendorff_alpha_nominal(spark, sf_dir):
    """Krippendorff's alpha (nominal) over the synthetic annotation
    table — the chance-corrected inter-rater reliability an annotation
    program reports before trusting its labels (alpha >= 0.8 is the
    conventional bar; Cohen's kappa, already covered, only handles two
    raters). Observed disagreement is the exact pair count
    sum_u sum_c o_uc (m_u - o_uc) over units; expected disagreement
    comes from the pooled label distribution with the small-sample
    n(n-1) correction. All counts are exact integer aggregates — two
    map-side-combining groupBys over the 5x-documents vote table, then
    constant-size arithmetic."""
    votes = _annotator_votes(spark, sf_dir).localCheckpoint(eager=False)
    vc = votes.groupBy("doc_id", "vote").agg(F.count(F.lit(1)).alias("c"))
    um = vc.groupBy("doc_id").agg(F.sum("c").alias("m"))
    disag = (
        vc.join(um, "doc_id")
        .agg(
            F.sum(F.col("c") * (F.col("m") - F.col("c"))).alias(
                "pairs_disagree"
            ),
            F.sum(F.col("c") * (F.col("m") - F.lit(1))).alias(
                "pairs_total"
            ),
        )
    )
    glob = votes.groupBy("vote").agg(F.count(F.lit(1)).alias("nc"))
    tot = glob.agg(F.sum("nc").alias("n"))
    de = (
        glob.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(
            F.sum(
                F.col("nc").cast("double") * (F.col("n") - F.col("nc"))
            ).alias("_num")
        )
        .select(
            (
                F.col("_num")
                / (F.col("n").cast("double") * (F.col("n") - F.lit(1)))
            ).alias("de_rate"),
            F.col("n").cast("bigint").alias("n_votes"),
        )
    )
    ndocs = um.agg(F.count(F.lit(1)).alias("n_docs"))
    do_rate = F.col("pairs_disagree").cast("double") / F.col(
        "pairs_total"
    ).cast("double")
    return (
        disag.crossJoin(F.broadcast(de))
        .crossJoin(F.broadcast(ndocs))
        .select(
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "n_votes",
            F.round(do_rate, 6).alias("do_rate"),
            F.round(F.col("de_rate"), 6).alias("de_rate"),
            F.round(
                F.lit(1.0) - do_rate / F.col("de_rate"), 6
            ).alias("alpha"),
        )
    )
