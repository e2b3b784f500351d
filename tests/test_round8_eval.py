"""Round-8 experimentation/eval family: unit-level checks that go
beyond the DuckDB oracle parity (which verify_local covers) — the
statistics themselves must be right, not just reproducible."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.operators.experiment import (
    POISSON1_CDF_HEX,
    bradley_terry,
    frac_to_hex,
    poisson1_weight,
    u60_hex,
    wilson_lower_bound,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# md5 coin plumbing
# ---------------------------------------------------------------------------


def test_frac_to_hex_is_60_bit_aligned_with_u60():
    # u60 hex strings carry a leading 0 nibble (60 bits in 16 chars);
    # thresholds must live on the same scale or every comparison is
    # vacuously true/false (the arm-split bug this guards against)
    assert frac_to_hex(0.5) == "0800000000000000"
    assert frac_to_hex(0.0) == "0" * 16
    assert frac_to_hex(1.0) == "0fffffffffffffff"
    for h in POISSON1_CDF_HEX:
        assert len(h) == 16 and h[0] == "0"


def test_u60_threshold_split_is_balanced(spark):
    df = spark.range(4000).select(
        u60_hex(F.concat(F.lit("t:"), F.col("id").cast("string"))).alias("u")
    )
    frac = (
        df.filter(F.col("u") < F.lit(frac_to_hex(0.5))).count() / 4000.0
    )
    assert 0.45 < frac < 0.55


def test_poisson1_weights_match_inverse_cdf(spark):
    import hashlib

    rows = (
        spark.range(2000)
        .select(
            F.col("id"),
            poisson1_weight(
                u60_hex(F.concat(F.lit("p:"), F.col("id").cast("string")))
            ).alias("w"),
        )
        .collect()
    )
    # python reference: same md5 -> same inverse CDF
    e1 = math.exp(-1.0)
    cdf, fact, cdfs = 0.0, 1.0, []
    for k in range(6):
        if k:
            fact *= k
        cdf += e1 / fact
        cdfs.append(cdf)
    for r in rows[:200]:
        u = int(hashlib.md5(f"p:{r.id}".encode()).hexdigest()[:15], 16)
        exp = next((k for k, c in enumerate(cdfs) if u < c * 2**60), 6)
        assert r.w == exp
    mean_w = sum(r.w for r in rows) / len(rows)
    assert 0.9 < mean_w < 1.1  # Poisson(1) mean


# ---------------------------------------------------------------------------
# property tests (hypothesis): kernel invariants over arbitrary inputs
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=20, deadline=None)
@given(keys=st.lists(st.text(alphabet="abc:0123456789#", min_size=1,
                             max_size=12), min_size=1, max_size=30))
def test_poisson_weight_matches_python_cdf_any_key(spark, keys):
    """Engine-side Poisson(1) weights equal the python inverse-CDF of
    the same md5 draw for ARBITRARY key strings (the parity the
    bootstrap's determinism rests on)."""
    import hashlib

    rows = spark.createDataFrame(
        [(k,) for k in set(keys)], "k string"
    ).select("k", poisson1_weight(u60_hex(F.col("k"))).alias("w"))
    e1 = math.exp(-1.0)
    cdf, fact, cdfs = 0.0, 1.0, []
    for k in range(6):
        if k:
            fact *= k
        cdf += e1 / fact
        cdfs.append(cdf)
    for r in rows.collect():
        u = int(hashlib.md5(r.k.encode()).hexdigest()[:15], 16)
        exp = next((i for i, c in enumerate(cdfs) if u < c * 2**60), 6)
        assert r.w == exp


@settings(max_examples=30, deadline=None)
@given(
    w1=st.integers(0, 200),
    n_extra=st.integers(1, 200),
    n1=st.integers(1, 200),
)
def test_wilson_monotone_in_wins_and_below_rate(spark, w1, n_extra, n1):
    """Wilson LB is below the raw rate, within [0, 1], and adding a
    win at fixed n never lowers it."""
    n = max(n1, w1 + 1)
    df = spark.createDataFrame(
        [(w1, n), (w1 + 1, n + (0 if w1 + 1 <= n else n_extra))],
        "w long, n long",
    ).select(
        "w", "n", wilson_lower_bound(F.col("w"), F.col("n")).alias("lb")
    )
    rows = {r.w: r for r in df.collect()}
    for r in rows.values():
        assert -1e-12 <= r.lb <= r.w / r.n + 1e-12
    if rows[w1].n == rows[w1 + 1].n:
        assert rows[w1 + 1].lb >= rows[w1].lb - 1e-12


# ---------------------------------------------------------------------------
# Wilson / leaderboard
# ---------------------------------------------------------------------------


def _wilson_py(w, n, z=1.96, z2=3.8416):
    p = w / n
    return (p + z2 / (2 * n) - z * math.sqrt((p * (1 - p) + z2 / (4 * n)) / n)) / (
        1 + z2 / n
    )


def test_wilson_lower_bound_matches_reference(spark):
    df = spark.createDataFrame(
        [Row(w=95, n=100), Row(w=2, n=2), Row(w=0, n=10)]
    ).select("w", "n", wilson_lower_bound(F.col("w"), F.col("n")).alias("lb"))
    got = {(r.w, r.n): r.lb for r in df.collect()}
    for (w, n), lb in got.items():
        assert lb == pytest.approx(_wilson_py(w, n), abs=1e-12)
    # the whole point: a 2/2 record must NOT outrank 95/100
    assert got[(2, 2)] < got[(95, 100)]
    assert got[(0, 10)] >= 0.0 or got[(0, 10)] > -1e-9


# ---------------------------------------------------------------------------
# Bradley-Terry
# ---------------------------------------------------------------------------


def _battle_rows():
    # a beats b 9/10, b beats c 9/10, a beats c 10/10 -> strength
    # order must come out a > b > c
    rows = []
    for i in range(10):
        rows.append(Row(model_a="a", model_b="b", winner="a" if i < 9 else "b"))
        rows.append(Row(model_a="b", model_b="c", winner="b" if i < 9 else "c"))
        rows.append(Row(model_a="a", model_b="c", winner="a"))
    return rows


def test_bradley_terry_orders_by_true_dominance(spark):
    bt = bradley_terry(spark.createDataFrame(_battle_rows()))
    s = {r.model: r.strength for r in bt.collect()}
    assert s["a"] > s["b"] > s["c"] > 0
    assert sum(s.values()) == pytest.approx(1.0, abs=1e-6)


def test_bradley_terry_is_row_order_invariant(spark):
    rows = _battle_rows()
    a = {
        r.model: r.strength
        for r in bradley_terry(spark.createDataFrame(rows)).collect()
    }
    b = {
        r.model: r.strength
        for r in bradley_terry(
            spark.createDataFrame(list(reversed(rows)) ).repartition(7)
        ).collect()
    }
    assert a == b  # DECIMAL state: bit-identical, not just close


# ---------------------------------------------------------------------------
# registry queries against sf0.001
# ---------------------------------------------------------------------------


def test_poisson_bootstrap_ci_brackets_point(spark):
    from commercial_rfp_data_pipeline_spark.queries.eval_q import (
        q_poisson_bootstrap_ci,
    )

    out = q_poisson_bootstrap_ci(spark, SF).collect()
    assert len(out) >= 3
    for r in out:
        assert r.ci_lo <= r.boot_mean <= r.ci_hi
        # CI should bracket the point estimate for a mean of thousands
        # of iid rows (it's the bootstrap of exactly that statistic)
        assert r.ci_lo <= r.point_mean <= r.ci_hi
        assert r.ci_hi - r.ci_lo > 0


def test_cuped_reduces_variance_and_splits_arms(spark):
    from commercial_rfp_data_pipeline_spark.queries.eval_q import (
        q_cuped_adjusted_ab_test,
    )

    rows = q_cuped_adjusted_ab_test(spark, SF).collect()
    arms = {r.arm for r in rows}
    assert arms == {"A", "B"}
    thetas = {r.theta for r in rows}
    assert len(thetas) == 1  # one pooled theta broadcast to both arms
    for r in rows:
        assert r.n_users > 0
        assert r.var_y >= 0 and r.var_y_adj >= 0


def test_cuped_variance_reduction_on_correlated_users(spark, tmp_path):
    # synthetic corpus: 400 users whose experiment-period outcome is
    # pre-period spend + small noise -> CUPED must reduce within-arm
    # variance substantially (the pooled guarantee holds per-arm once
    # n is large enough for the arm covariances to match the pooled fit)
    from commercial_rfp_data_pipeline_spark.queries.eval_q import (
        q_cuped_adjusted_ab_test,
    )

    rows = []
    eid = 0
    for u in range(400):
        base = 100.0 + (u % 50) * 10.0
        noise = ((u * 7919) % 101 - 50) / 10.0
        rows.append(
            Row(
                event_id=eid,
                ts="2024-01-05 00:00:00",
                user_id=u,
                event_type="buy",
                value=round(base, 2),
                props="{}",
            )
        )
        eid += 1
        rows.append(
            Row(
                event_id=eid,
                ts="2024-01-20 00:00:00",
                user_id=u,
                event_type="buy",
                value=round(base + noise, 2),
                props="{}",
            )
        )
        eid += 1
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    sf = str(tmp_path / "synth")
    df.write.parquet(f"{sf}/events.parquet")
    out = q_cuped_adjusted_ab_test(spark, sf).collect()
    assert {r.arm for r in out} == {"A", "B"}
    for r in out:
        assert r.var_y_adj < r.var_y * 0.2  # >80% variance removed
        assert r.var_reduction > 0.8


def test_ab_design_audit_shape(spark):
    from commercial_rfp_data_pipeline_spark.queries.eval_q import (
        q_ab_design_audit,
    )

    r = q_ab_design_audit(spark, SF).collect()[0]
    assert r.n_a + r.n_b > 0
    assert r.srm_chi2 >= 0
    assert r.mde_abs > 0
    assert r.srm_flag in (0, 1)


def test_jackknife_se_zero_for_identical_blocks(spark):
    from commercial_rfp_data_pipeline_spark.operators.experiment import (  # noqa: F401
        bradley_terry,
    )
    from commercial_rfp_data_pipeline_spark.queries import eval_q

    # registry query on real data: SE positive, ratio sane
    r = eval_q.q_jackknife_ratio_metric_se(spark, SF).collect()[0]
    assert r.jk_se > 0
    assert r.n_blocks == 32
    assert abs(r.jk_mean - r.ratio_point) < 0.01 * r.ratio_point


def test_kaplan_meier_monotone_nonincreasing(spark):
    from commercial_rfp_data_pipeline_spark.queries.eval_q import (
        q_kaplan_meier_repurchase,
    )

    rows = sorted(
        q_kaplan_meier_repurchase(spark, SF).collect(),
        key=lambda r: r.t_days,
    )
    assert rows[0].survival <= 1.0
    for a, b in zip(rows, rows[1:]):
        assert b.survival <= a.survival + 1e-9  # survival never rises
        assert a.n_risk >= b.n_risk  # at-risk set shrinks
    # everyone starts at risk
    assert rows[0].n_risk == sum(r.n_events + r.n_censored for r in rows)


def test_rouge_known_pair_exact(spark, tmp_path):
    # ref "a b c d" vs cand "a b c e": unigram clip 3/4 -> f1 = 0.75;
    # bigram clip 2/3 ({ab,bc} of {ab,bc,cd|ce}) -> f2 = 2/3
    from commercial_rfp_data_pipeline_spark.queries.eval_q import (
        q_rouge_ngram_eval,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b c d", lang="en", source="s0", n_chars=7),
            Row(doc_id=1, text="a b c e", lang="en", source="s1", n_chars=7),
        ]
    )
    sf = str(tmp_path / "rouge")
    docs.write.parquet(f"{sf}/documents.parquet")
    out = q_rouge_ngram_eval(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_pairs == 1
    assert r.rouge1_p == pytest.approx(0.75, abs=1e-6)
    assert r.rouge1_r == pytest.approx(0.75, abs=1e-6)
    assert r.rouge1_f == pytest.approx(0.75, abs=1e-6)
    assert r.rouge2_f == pytest.approx(2.0 / 3.0, abs=1e-6)


def test_rouge_bounds_on_corpus(spark):
    from commercial_rfp_data_pipeline_spark.queries.eval_q import (
        q_rouge_ngram_eval,
    )

    for r in q_rouge_ngram_eval(spark, SF).collect():
        for v in (r.rouge1_p, r.rouge1_r, r.rouge1_f, r.rouge2_f):
            assert 0.0 <= float(v) <= 1.0
        assert r.n_pairs > 0


def test_annotator_accuracy_tracks_noise_rate(spark):
    from commercial_rfp_data_pipeline_spark.queries.eval_q import (
        q_annotator_label_model,
    )

    rows = sorted(
        q_annotator_label_model(spark, SF).collect(),
        key=lambda r: r.annotator,
    )
    assert [r.annotator for r in rows] == [0, 1, 2, 3, 4]
    # noise rates rise 0.05 -> 0.37, so accuracy vs consensus must fall
    assert rows[0].acc > rows[-1].acc
    accs = [r.acc for r in rows]
    assert accs == sorted(accs, reverse=True)
    # log-odds weights order the same way, and a .63+-accuracy rater
    # still beats coin-flip weight 0
    wts = [r.weight for r in rows]
    assert wts == sorted(wts, reverse=True)
    assert all(w > 0 for w in wts)
    assert all(r.n_labels == rows[0].n_labels for r in rows)


def test_sequential_monitoring_boundary_shrinks(spark):
    from commercial_rfp_data_pipeline_spark.queries.eval_q import (
        q_sequential_ab_monitoring,
    )

    rows = sorted(
        q_sequential_ab_monitoring(spark, SF).collect(),
        key=lambda r: r.day,
    )
    assert len(rows) >= 10
    for a, b in zip(rows, rows[1:]):
        assert b.z_crit < a.z_crit  # OBF boundary tightens with info
        assert b.n_a >= a.n_a and b.n_b >= a.n_b  # cumulative
    for r in rows:
        assert r.crossed == (1 if abs(r.z) > r.z_crit else 0)


def test_diff_in_differences_recovers_injected_effect(spark, tmp_path):
    import hashlib

    from commercial_rfp_data_pipeline_spark.queries.eval_q import (
        _AB_SEED,
        _ARM_A_MAX,
        q_diff_in_differences,
    )

    # compute each user's arm the same way the query does, then inject
    # a +50 post-period lift ONLY for arm-B users: DiD must recover ~50
    def arm(u):
        h = hashlib.md5(f"{_AB_SEED}{u}".encode()).hexdigest()
        u60 = h[:15].rjust(16, "0")
        return "A" if u60 < _ARM_A_MAX else "B"

    rows, eid = [], 0
    for u in range(300):
        base = 100.0 + (u % 40)
        lift = 50.0 if arm(u) == "B" else 0.0
        for ts, val in [
            ("2024-01-05 00:00:00", base),
            ("2024-01-20 00:00:00", base + lift),
        ]:
            rows.append(
                Row(
                    event_id=eid,
                    ts=ts,
                    user_id=u,
                    event_type="buy",
                    value=round(val, 2),
                    props="{}",
                )
            )
            eid += 1
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    sf = str(tmp_path / "did")
    df.write.parquet(f"{sf}/events.parquet")
    r = q_diff_in_differences(spark, sf).collect()[0]
    assert r.did_effect == pytest.approx(50.0, abs=1e-6)
    assert r.se == pytest.approx(0.0, abs=1e-6)  # zero within-arm noise
    assert r.n_a + r.n_b == 300


def test_chi2_flags_perfectly_discriminative_term(spark, tmp_path):
    from commercial_rfp_data_pipeline_spark.queries.eval_q import (
        q_chi2_term_selection,
    )

    rows = []
    for i in range(40):
        lang = "en" if i % 2 == 0 else "de"
        marker = "zmarker" if lang == "en" else "qmarker"
        rows.append(
            Row(
                doc_id=i,
                text=f"common words here {marker}",
                lang=lang,
                source="s0",
                n_chars=20,
            )
        )
    sf = str(tmp_path / "chi2")
    spark.createDataFrame(rows).write.parquet(f"{sf}/documents.parquet")
    out = q_chi2_term_selection(spark, sf).collect()
    top = {r.lang: r for r in out if r.rnk == 1}
    assert top["en"].term == "zmarker"
    assert top["de"].term == "qmarker"
    # perfect 2x2 (20,0,0,20) -> chi2 = N = 40
    assert top["en"].chi2 == pytest.approx(40.0, abs=1e-6)
    # shared terms are non-discriminative: chi2 0 for 'common'
    shared = [r for r in out if r.term == "common"]
    assert all(r.chi2 == 0 for r in shared)


def test_quantile_treatment_effects_consistent(spark):
    from commercial_rfp_data_pipeline_spark.queries.eval_q import (
        q_quantile_treatment_effects,
    )

    rows = sorted(
        q_quantile_treatment_effects(spark, SF).collect(),
        key=lambda r: r.quantile,
    )
    assert [r.quantile for r in rows] == [0.1, 0.25, 0.5, 0.75, 0.9]
    for r in rows:
        assert r.qte == pytest.approx(r.q_b - r.q_a, abs=1e-6)
    # per-arm quantiles are monotone in the quantile level
    for a, b in zip(rows, rows[1:]):
        assert b.q_a >= a.q_a and b.q_b >= a.q_b


def test_funnel_ztest_counts_close(spark):
    from commercial_rfp_data_pipeline_spark.queries.eval_q import (
        q_ab_funnel_conversion_ztest,
    )

    rows = q_ab_funnel_conversion_ztest(spark, SF).collect()
    assert len(rows) >= 3  # event types present in the corpus
    for r in rows:
        assert r.conv_a <= r.n_a and r.conv_b <= r.n_b
        assert 0 <= r.rate_a <= 1 and 0 <= r.rate_b <= 1
        if r.z is None:
            # degenerate: every user (or none) converted in both arms
            # -> zero pooled variance, no test; must not flag
            assert r.significant == 0
            assert r.rate_a in (0.0, 1.0) and r.rate_b in (0.0, 1.0)
        else:
            assert r.significant == (1 if abs(r.z) > 1.96 else 0)


def test_streaming_monitor_equals_batch_with_crash_replay(spark, tmp_path):
    """The streaming monitor over 3 micro-batches (with an injected
    crash + replay in the middle) must produce EXACTLY the batch
    query's z table over the same events — shared kernels + exact
    DECIMAL partials make the equality bitwise, not approximate."""
    import glob as _glob
    import os as _os

    from pyspark.errors import StreamingQueryException

    from commercial_rfp_data_pipeline_spark.queries.eval_q import (
        q_sequential_ab_monitoring,
    )
    from commercial_rfp_data_pipeline_spark.streaming.monitor import (
        monitor_ingest_sink,
        monitor_readout,
        read_events_stream,
    )

    events = spark.read.parquet(f"{SF}/events.parquet")
    inp = str(tmp_path / "in")
    seen: set[str] = set()
    for i in range(3):
        events.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        for f in _glob.glob(inp + "/*.parquet"):
            if f not in seen:
                _os.utime(f, (1_700_000_000 + i * 60,) * 2)
                seen.add(f)

    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    calls = {"n": 0}

    def boom(batch_id: int) -> None:
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash after write, before commit")

    q = monitor_ingest_sink(
        read_events_stream(spark, inp), spark, store, ckpt,
        on_batch_written=boom,
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()
    q2 = monitor_ingest_sink(
        read_events_stream(spark, inp), spark, store, ckpt
    )
    q2.awaitTermination()

    got = {
        r.day: r.asDict()
        for r in monitor_readout(spark, store).collect()
    }
    want = {
        r.day: r.asDict()
        for r in q_sequential_ab_monitoring(spark, SF).collect()
    }
    assert got == want  # exact, every column, every day


def test_krippendorff_alpha_matches_python_reference(spark):
    from collections import Counter

    from commercial_rfp_data_pipeline_spark.queries.eval_q import (
        _annotator_votes,
        q_krippendorff_alpha_nominal,
    )

    votes = _annotator_votes(spark, SF).collect()
    by_doc: dict[int, list[int]] = {}
    for r in votes:
        by_doc.setdefault(r.doc_id, []).append(r.vote)
    pd_, pt = 0, 0
    for vs in by_doc.values():
        m = len(vs)
        for c in Counter(vs).values():
            pd_ += c * (m - c)
            pt += c * (m - 1)
    n = len(votes)
    glob = Counter(r.vote for r in votes)
    de = sum(c * (n - c) for c in glob.values()) / (n * (n - 1))
    want = 1.0 - (pd_ / pt) / de
    got = q_krippendorff_alpha_nominal(spark, SF).collect()[0]
    assert got.alpha == pytest.approx(want, abs=1e-5)
    assert got.n_votes == n and got.n_docs == len(by_doc)
    # annotators mostly agree (noise <= 0.37) -> alpha must be positive
    assert got.alpha > 0.2


def test_winrate_leaderboard_rank_consistent(spark):
    from commercial_rfp_data_pipeline_spark.queries.eval_q import (
        q_winrate_wilson_leaderboard,
    )

    rows = q_winrate_wilson_leaderboard(spark, SF).collect()
    by_rank = sorted(rows, key=lambda r: (r.rank, r.model))
    for a, b in zip(by_rank, by_rank[1:]):
        assert a.wilson_lb >= b.wilson_lb - 1e-12
    for r in rows:
        assert 0 <= r.win_rate <= 1
        assert r.wilson_lb <= r.win_rate + 1e-12
        assert r.wins <= r.n_battles
