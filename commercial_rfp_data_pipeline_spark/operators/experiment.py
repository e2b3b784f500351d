"""Experimentation & evaluation analytics kernels.

The reference pipeline feeds RFP answer quality back through manual
review; a production LLM-data platform closes that loop with
*measured* experiments: bootstrap confidence intervals on corpus
metrics, pairwise-preference leaderboards (arena-style), A/B tests
with variance reduction, and jackknife standard errors for ratio
metrics. This module holds the distributed kernels; the oracle-backed
queries live in ``queries/eval_q.py``.

Determinism discipline (the same one ``operators/graph.py`` uses for
PageRank/HITS): every stochastic choice is an md5 coin on a stable
key, every cross-row float SUM is an exact DECIMAL sum of values
rounded to a fixed scale first, and every division/sqrt/exp runs on
doubles that are bit-identical on both engines — so the DuckDB oracle
reproduces the result hash exactly.

Scale notes are per function; none of these kernels holds more than a
models×models or blocks-count table on any single node.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

# ---------------------------------------------------------------------------
# md5 coins (shared idiom with operators/textops.importance_downsample:
# u(key) = first 60 bits of md5 as a zero-padded 16-char lowercase hex
# string, compared against precomputed hex thresholds — no bigint hex
# parsing needed on either engine)
# ---------------------------------------------------------------------------

_U60 = float(1 << 60)


def u60_hex(col: Column) -> Column:
    """First 60 bits of md5(col) as a 16-char zero-padded hex string —
    uniform on [0, 2^60) and lexicographically ordered like the
    integers it encodes."""
    return F.lpad(F.substring(F.md5(col), 1, 15), 16, "0")


def u60_hex_sql(expr: str) -> str:
    """DuckDB twin of :func:`u60_hex`."""
    return f"lpad(substring(md5({expr}), 1, 15), 16, '0')"


def frac_to_hex(p: float) -> str:
    """floor(p * 2^60) as the 16-char hex literal both engines compare
    u60 strings against."""
    k = min(max(int(math.floor(p * _U60)), 0), (1 << 60) - 1)
    return format(k, "016x")


# ---------------------------------------------------------------------------
# Poisson(1) bootstrap weights
# ---------------------------------------------------------------------------

def _poisson1_cdf_hex(max_k: int) -> list[str]:
    """Cumulative Poisson(1) probabilities P(X<=k) for k=0..max_k-1 as
    hex thresholds. A u60 draw below threshold[k] (and not below
    threshold[k-1]) maps to weight k; draws past the last threshold cap
    at ``max_k`` (P(X>5) ~ 6e-4 — the truncation bias is far below the
    bootstrap's own Monte-Carlo noise)."""
    e1 = math.exp(-1.0)
    cdf, fact, out = 0.0, 1.0, []
    for k in range(max_k):
        if k > 0:
            fact *= k
        cdf += e1 / fact
        out.append(frac_to_hex(cdf))
    return out


POISSON1_MAX_K = 6
POISSON1_CDF_HEX = _poisson1_cdf_hex(POISSON1_MAX_K)


def poisson1_weight(u_hex: Column) -> Column:
    """Poisson(1) bootstrap weight from a u60 hex draw via the inverse
    CDF — the standard resampling trick at scale (Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams", Google 2012):
    multinomial bootstrap needs the global n per replicate, Poisson(1)
    weights are row-local, embarrassingly parallel, and unbiased."""
    expr = F.lit(POISSON1_MAX_K)
    for k in range(POISSON1_MAX_K - 1, -1, -1):
        expr = F.when(u_hex < F.lit(POISSON1_CDF_HEX[k]), F.lit(k)).otherwise(
            expr
        )
    return expr


def poisson1_weight_sql(u_expr: str) -> str:
    """DuckDB twin of :func:`poisson1_weight` (same thresholds, same
    first-match-wins CASE order)."""
    arms = "\n".join(
        f"WHEN {u_expr} < '{POISSON1_CDF_HEX[k]}' THEN {k}"
        for k in range(POISSON1_MAX_K)
    )
    return f"CASE {arms} ELSE {POISSON1_MAX_K} END"


# ---------------------------------------------------------------------------
# Wilson score interval
# ---------------------------------------------------------------------------

WILSON_Z = 1.96
WILSON_Z2 = 3.8416  # z^2 written as a literal so both engines parse
# the same decimal string into the same double


def wilson_lower_bound(wins: Column, n: Column) -> Column:
    """Lower bound of the 95% Wilson score interval for a binomial
    proportion — the ranking statistic a leaderboard uses instead of
    the raw win rate, so a 2/2 model doesn't outrank a 95/100 one.
    Pure double arithmetic on (wins, n) integers; the expression tree
    is mirrored verbatim in the SQL twin."""
    p = wins.cast("double") / n.cast("double")
    z2 = F.lit(WILSON_Z2)
    nn = n.cast("double")
    return (
        p
        + z2 / (F.lit(2.0) * nn)
        - F.lit(WILSON_Z)
        * F.sqrt((p * (F.lit(1.0) - p) + z2 / (F.lit(4.0) * nn)) / nn)
    ) / (F.lit(1.0) + z2 / nn)


def wilson_lower_bound_sql(wins: str, n: str) -> str:
    """DuckDB twin of :func:`wilson_lower_bound` — same tree shape."""
    p = f"(CAST({wins} AS DOUBLE) / CAST({n} AS DOUBLE))"
    nn = f"CAST({n} AS DOUBLE)"
    z2 = f"{WILSON_Z2}"
    return (
        f"(({p} + {z2} / (2.0 * {nn}) - {WILSON_Z} * "
        f"sqrt(({p} * (1.0 - {p}) + {z2} / (4.0 * {nn})) / {nn})) "
        f"/ (1.0 + {z2} / {nn}))"
    )


# ---------------------------------------------------------------------------
# A/B assignment + sequential-monitoring kernels (shared by the batch
# query queries/eval_q.py:q_sequential_ab_monitoring and the streaming
# twin streaming/monitor.py — same expressions, so batch == streaming)
# ---------------------------------------------------------------------------

AB_SEED = "ab1:"
ARM_A_MAX = frac_to_hex(0.5)  # u60 50/50 split point
SEQ_START = "2024-01-01"  # experiment start (events corpus: Jan 1-30)
SEQ_HORIZON = 30  # planned days
OBF_C = 2.2414  # O'Brien-Fleming boundary shape constant, two-sided
# alpha=.05: z_crit(t) = C / sqrt(t) at information fraction t


def arm_assignment(user_col: Column) -> Column:
    """Deterministic 50/50 A/B arm from the md5 coin on the user id."""
    return F.when(
        u60_hex(F.concat(F.lit(AB_SEED), user_col.cast("string")))
        < F.lit(ARM_A_MAX),
        F.lit("A"),
    ).otherwise(F.lit("B"))


def daily_arm_moments(events: DataFrame) -> DataFrame:
    """Per (day, arm) exact-DECIMAL moment partials (n, s, ss) of event
    value — the only corpus-sized pass of the monitor; map-side
    combining groupBy, mergeable across micro-batches (sums of sums).

    The experiment day is 1-based from SEQ_START (datediff, ADVICE r8:
    dayofmonth alone silently aliases Jan 5 with Feb 5 if the corpus
    ever spans a month boundary — in BOTH engines, so the oracle could
    not catch it), and events outside the planned [1, SEQ_HORIZON]
    window are excluded explicitly rather than by corpus shape."""
    v = F.col("value").cast("decimal(18,2)")
    day = (
        F.datediff(F.col("ts").cast("date"), F.lit(SEQ_START).cast("date"))
        + 1
    ).cast("int")
    return events.withColumn("day", day).filter(
        (F.col("day") >= 1) & (F.col("day") <= SEQ_HORIZON)
    ).groupBy(
        "day",
        arm_assignment(F.col("user_id")).alias("arm"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("ss"),
    )


def monitor_readout_from_daily(daily: DataFrame) -> DataFrame:
    """Cumulative-through-day z statistics + O'Brien-Fleming boundary
    from the (day, arm, n, s, ss) moment table. Everything here runs
    on the ~2x31-row table via a broadcast theta-join."""
    daily = daily.localCheckpoint(eager=False)  # tiny, 2 consumers
    d2 = daily.select(
        F.col("arm").alias("_arm"),
        F.col("day").alias("_day"),
        F.col("n").alias("_n"),
        F.col("s").alias("_s"),
        F.col("ss").alias("_ss"),
    )
    cum = (
        daily.join(
            F.broadcast(d2),
            (F.col("_arm") == F.col("arm")) & (F.col("_day") <= F.col("day")),
        )
        .groupBy("day", "arm")
        .agg(
            F.sum("_n").alias("cn"),
            F.sum("_s").alias("cs"),
            F.sum("_ss").alias("css"),
        )
    )
    ca = cum.filter(F.col("arm") == "A").select(
        "day",
        F.col("cn").alias("na"),
        F.col("cs").cast("double").alias("sa"),
        F.col("css").cast("double").alias("ssa"),
    )
    cb = cum.filter(F.col("arm") == "B").select(
        F.col("day").alias("dayb"),
        F.col("cn").alias("nb"),
        F.col("cs").cast("double").alias("sb"),
        F.col("css").cast("double").alias("ssb"),
    )
    w = ca.join(F.broadcast(cb), F.col("dayb") == F.col("day"))
    na, nb = F.col("na"), F.col("nb")
    sa, sb, ssa, ssb = F.col("sa"), F.col("sb"), F.col("ssa"), F.col("ssb")
    z = (sa / na - sb / nb) / F.sqrt(
        ((ssa - sa * sa / na) + (ssb - sb * sb / nb))
        / (na + nb)
        * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    zc = F.lit(OBF_C) / F.sqrt(F.col("day") / F.lit(float(SEQ_HORIZON)))
    return w.select(
        "day",
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        F.round(sa / na, 6).alias("mean_a"),
        F.round(sb / nb, 6).alias("mean_b"),
        F.round(z, 4).alias("z"),
        F.round(zc, 4).alias("z_crit"),
        F.when(F.abs(z) > zc, F.lit(1)).otherwise(F.lit(0)).alias("crossed"),
    )


# ---------------------------------------------------------------------------
# Bradley–Terry strengths (MM / Zermelo iteration)
# ---------------------------------------------------------------------------

BT_ITERS = 10
_BT_DEC = "decimal(28,9)"
_BT_FLOOR = "0.000000001"  # strength floor: keeps s_i + s_j > 0 for
# models that lose every battle (their true MLE strength is 0)


def bradley_terry(battles: DataFrame, n_iters: int = BT_ITERS) -> DataFrame:
    """Bradley–Terry model strengths from a pairwise-battle table via
    ``n_iters`` MM updates (Hunter 2004, eq. 1):

        s_i  <-  W_i / sum_j n_ij / (s_i + s_j),   then sum-normalize.

    ``battles`` has (model_a, model_b, winner). The heavy part — the
    battle log — is aggregated ONCE into the (i, j, n_ij) pair-count
    and per-model win tables (two map-side-combining groupBys over the
    distributed log); every MM iteration then runs on the tiny
    models^2-bounded tables, localCheckpoint'd per round so plan depth
    stays O(1). Strengths live as DECIMAL(28,9) with a 9-dp round
    after every division, so each per-model SUM is order-independent
    and the whole unrolled iteration reproduces as oracle CTEs (the
    HITS discipline, operators/graph.py:390).

    Returns (model, n_battles, wins, strength<double>)."""
    b = battles.select("model_a", "model_b", "winner").localCheckpoint(
        eager=False
    )
    sym = b.select(
        F.col("model_a").alias("i"), F.col("model_b").alias("j")
    ).unionAll(b.select(F.col("model_b").alias("i"), F.col("model_a").alias("j")))
    npair = sym.groupBy("i", "j").agg(F.count(F.lit(1)).alias("n"))
    # tiny: <= models^2 rows — one partition so every MM round is a
    # single-task stage instead of 32 empty ones
    npair = npair.coalesce(1).localCheckpoint()
    wins = (
        b.groupBy(F.col("winner").alias("m"))
        .agg(F.count(F.lit(1)).alias("wins"))
    )
    models = (
        npair.select(F.col("i").alias("m"))
        .distinct()
        .join(wins, "m", "left")
        .select("m", F.coalesce("wins", F.lit(0)).alias("wins"))
    )
    nb = npair.groupBy(F.col("i").alias("m")).agg(
        F.sum("n").alias("n_battles")
    )
    models = models.join(nb, "m").coalesce(1).localCheckpoint()

    # round 10: the MM iteration itself is models^2-bounded work — 10
    # rounds of single-task Spark stages whose cost is pure job/plan
    # overhead. After the two distributed groupBys reduce the battle
    # log, finish the loop driver-side with exact DECIMAL(28,9)
    # arithmetic (Python Decimal replicates Spark's round(double, 9)
    # via the shortest-repr HALF_UP chain, and decimal sums are exact,
    # so the result is bit-identical — regression-tested). The collect
    # is bounded by SPARK_GRAFT_BT_LOCAL_PAIRS (models^2 rows, ~40
    # bytes each); above the cap the distributed loop runs unchanged.
    out = _bt_local(models, npair, n_iters)
    if out is not None:
        bradley_terry.last_local = True
        return out
    bradley_terry.last_local = False

    floor = F.lit(_BT_FLOOR).cast(_BT_DEC)
    s = models.select("m", F.lit(1).cast(_BT_DEC).alias("s"))
    # the MM map is scale-invariant, so normalization happens ONCE at
    # the end instead of per round — that removes a broadcast job per
    # iteration; lazy checkpoints truncate the logical plan per round
    # (Catalyst never sees the 2^k double-reference blowup) while the
    # underlying RDD DAG shares each round's state between the si and
    # sj lookups, so one final action computes every round exactly once
    for _ in range(n_iters):
        # broadcast lookups: the only shuffle per round is the
        # models-count groupBy, which AQE collapses to one task
        si = F.broadcast(s.select(F.col("m").alias("i"), F.col("s").alias("si")))
        sj = F.broadcast(s.select(F.col("m").alias("j"), F.col("s").alias("sj")))
        terms = (
            npair.join(si, "i")
            .join(sj, "j")
            .select(
                F.col("i").alias("m"),
                F.round(
                    F.col("n").cast("double")
                    / (F.col("si") + F.col("sj")).cast("double"),
                    9,
                )
                .cast(_BT_DEC)
                .alias("term"),
            )
        )
        denom = terms.groupBy("m").agg(F.sum("term").alias("denom"))
        s = models.join(F.broadcast(denom), "m").select(
            "m",
            F.greatest(
                F.round(
                    F.col("wins").cast("double")
                    / F.col("denom").cast("double"),
                    9,
                ).cast(_BT_DEC),
                floor,
            ).alias("s"),
        )
        s = s.localCheckpoint(eager=False)
    tot = s.agg(F.sum("s").alias("tot"))
    return (
        models.join(s, "m")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("m").alias("model"),
            "n_battles",
            "wins",
            F.round(
                F.col("s").cast("double") / F.col("tot").cast("double"), 9
            ).alias("strength"),
        )
    )


def _bt_local(models, npair, n_iters):
    """Driver-side MM loop on the collected pair-count table — exact
    replica of the distributed rounds: term = HALF_UP-9dp of
    float(n) / float(s_i + s_j) (Spark's round(double, 9) over the
    double-cast decimal sum), denoms sum as exact Decimal, the update
    floors at _BT_FLOOR, and the final normalize divides double-cast
    sums. Every float op mirrors the distributed expression
    elementwise; the only aggregations are Decimal sums, which are
    order-independent. Returns None above the collect cap (the
    distributed loop handles it)."""
    import os
    from decimal import ROUND_HALF_UP, Decimal

    cap = int(os.environ.get("SPARK_GRAFT_BT_LOCAL_PAIRS", "200000"))
    if cap <= 0:
        return None
    prows = npair.limit(cap + 1).collect()
    if len(prows) > cap:
        return None
    mrows = models.collect()  # <= one row per model by construction

    nine = Decimal("0.000000001")

    def r9(x: float) -> Decimal:
        return Decimal(repr(float(x))).quantize(nine, ROUND_HALF_UP)

    floor = Decimal(_BT_FLOOR)
    wins = {r["m"]: int(r["wins"]) for r in mrows}
    nbat = {r["m"]: int(r["n_battles"]) for r in mrows}
    s = {m: Decimal(1).quantize(nine) for m in wins}
    pairs = [(r["i"], r["j"], int(r["n"])) for r in prows]
    for _ in range(n_iters):
        denom = {m: Decimal(0) for m in s}
        for i, j, n in pairs:
            denom[i] += r9(float(n) / float(s[i] + s[j]))
        s = {
            m: max(r9(float(wins[m]) / float(denom[m])), floor)
            for m in s
        }
    tot = sum(s.values(), Decimal(0))
    m_field = models.schema["m"].dataType.simpleString()
    out = [
        (
            m,
            nbat[m],
            wins[m],
            float(r9(float(s[m]) / float(tot))),
        )
        for m in sorted(s)
    ]
    return models.sparkSession.createDataFrame(
        out,
        f"model {m_field}, n_battles long, wins long, strength double",
    )


def bradley_terry_oracle_ctes(n_iters: int = BT_ITERS) -> str:
    """DuckDB CTE chain reproducing :func:`bradley_terry` from a CTE
    named ``battles`` (model_a, model_b, winner) — generated from the
    SAME constants so the engines cannot drift. Emits CTE fragments
    only (caller splices into its WITH); final strengths land in
    ``bt_final(m, n_battles, wins, strength)``. All state CTEs are
    MATERIALIZED: each is referenced twice per round."""
    dec = "DECIMAL(28,9)"
    ctes = [
        """bt_sym AS MATERIALIZED (
  SELECT model_a AS i, model_b AS j FROM battles
  UNION ALL SELECT model_b AS i, model_a AS j FROM battles)""",
        """bt_npair AS MATERIALIZED (
  SELECT i, j, count(*) AS n FROM bt_sym GROUP BY i, j)""",
        """bt_wins AS MATERIALIZED (
  SELECT winner AS m, count(*) AS wins FROM battles GROUP BY winner)""",
        f"""bt_models AS MATERIALIZED (
  SELECT d.m, COALESCE(w.wins, 0) AS wins, d.n_battles
  FROM (SELECT i AS m, sum(n) AS n_battles FROM bt_npair GROUP BY i) d
  LEFT JOIN bt_wins w ON w.m = d.m)""",
        f"""bt_s0 AS MATERIALIZED (
  SELECT m, CAST(1 AS {dec}) AS s FROM bt_models)""",
    ]
    prev = "bt_s0"
    # no per-round normalization: the MM map is scale-invariant, so
    # one final sum-normalize is equivalent (mirrors bradley_terry)
    for r in range(1, n_iters + 1):
        ctes.append(
            f"""bt_t{r} AS MATERIALIZED (
  SELECT p.i AS m,
         CAST(round(CAST(p.n AS DOUBLE)
              / CAST(si.s + sj.s AS DOUBLE), 9) AS {dec}) AS term
  FROM bt_npair p
  JOIN {prev} si ON si.m = p.i
  JOIN {prev} sj ON sj.m = p.j)"""
        )
        ctes.append(
            f"""bt_s{r} AS MATERIALIZED (
  SELECT mo.m,
         greatest(CAST(round(CAST(mo.wins AS DOUBLE)
              / CAST(d.denom AS DOUBLE), 9) AS {dec}),
                  CAST({_BT_FLOOR} AS {dec})) AS s
  FROM bt_models mo
  JOIN (SELECT m, sum(term) AS denom FROM bt_t{r} GROUP BY m) d
    ON d.m = mo.m)"""
        )
        prev = f"bt_s{r}"
    ctes.append(
        f"""bt_final AS (
  SELECT mo.m, mo.n_battles, mo.wins,
         round(CAST(s.s AS DOUBLE)
               / CAST((SELECT sum(s) FROM {prev}) AS DOUBLE), 9)
           AS strength
  FROM bt_models mo JOIN {prev} s ON s.m = mo.m)"""
    )
    return ",\n".join(ctes)
