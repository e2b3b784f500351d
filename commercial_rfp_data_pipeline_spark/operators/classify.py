"""Multinomial naive-Bayes text classifier as pure DataFrame algebra.

Counts-based training (token counts per class + Laplace smoothing) and
log-space scoring are exact arithmetic, so the whole train/predict
cycle is oracle-checkable: per-token log-probabilities round to 6 dp
and sum as DECIMAL (order-independent — no raw float aggregation),
the argmax carries a deterministic (score DESC, class ASC) tiebreak.

Scale shape: training is two groupBys over the exploded token stream
((class, token) counts + per-class totals — both with map-side partial
aggregation); the model is a (vocab x classes) table that stays
DISTRIBUTED (the token join is a plain equi-join on token, never a
broadcast of the vocab, which at 100 TB can be tens of millions of
terms); scoring is one join + one groupBy per test token stream. The
only driver-sized objects are the per-class totals and priors
(n_classes rows, broadcast)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.operators.textops import norm_text

_DEC = "decimal(20,6)"


def _tokens(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    """One row per token occurrence; empty/null text yields no rows
    (both engines agree: split('') -> [''] filtered, split(null) ->
    null exploded away)."""
    return (
        df.select(*keep, F.explode(F.split(norm_text(text_col), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )


def naive_bayes_predict(
    train: DataFrame,
    test: DataFrame,
    class_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train multinomial NB on ``train`` and score ``test``; returns
    (id, actual, predicted, score, correct). Laplace alpha=1.

    score(d, c) = ln(P(c)) + sum over token occurrences t in d of
    ln((count(t, c) + 1) / (total_tokens(c) + |V|)); unseen tokens use
    the same smoothed floor ln(1 / (total_tokens(c) + |V|))."""
    ttok = _tokens(train, text_col, [class_col]).withColumnRenamed(
        class_col, "cls"
    )
    cnt = ttok.groupBy("cls", "tok").agg(F.count(F.lit(1)).alias("c"))
    nc = ttok.groupBy("cls").agg(F.count(F.lit(1)).alias("nc"))
    vocab = cnt.select("tok").distinct()
    v = vocab.agg(F.count(F.lit(1)).alias("v"))
    classes = (
        train.groupBy(F.col(class_col).alias("cls"))
        .agg(F.count(F.lit(1)).alias("ndocs"))
    )
    tot = train.agg(F.count(F.lit(1)).alias("nd"))
    prior = classes.crossJoin(F.broadcast(tot)).select(
        "cls",
        F.round(F.log(F.col("ndocs") / F.col("nd")), 6)
        .cast(_DEC)
        .alias("prior"),
    )
    # (vocab x classes) smoothed log-prob grid -- classes are few, so
    # the grid is |V| * n_classes rows and stays distributed on tok
    grid = (
        vocab.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(v))
        .join(cnt, ["tok", "cls"], "left")
        .select(
            "tok",
            "cls",
            F.round(
                F.log((F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (F.col("nc") + F.col("v"))),
                6,
            ).alias("logp"),
        )
    )
    unk = nc.crossJoin(F.broadcast(v)).select(
        "cls", F.round(F.log(1.0 / (F.col("nc") + F.col("v"))), 6).alias("logp_unk")
    )
    stok = _tokens(test, text_col, [id_col])
    contrib = (
        stok.crossJoin(F.broadcast(classes.select("cls")))
        .join(grid, ["tok", "cls"], "left")
        .join(F.broadcast(unk), "cls")
        .select(
            id_col,
            "cls",
            F.coalesce("logp", "logp_unk").cast(_DEC).alias("lp"),
        )
    )
    sums = contrib.groupBy(id_col, "cls").agg(F.sum("lp").alias("s"))
    scored = (
        test.select(id_col, F.col(class_col).alias("actual"))
        .crossJoin(F.broadcast(classes.select("cls")))
        .join(F.broadcast(prior), "cls")
        .join(sums, [id_col, "cls"], "left")
        .select(
            id_col,
            "actual",
            "cls",
            (
                F.col("prior")
                + F.coalesce(F.col("s"), F.lit(0).cast(_DEC))
            ).alias("score_dec"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_dec").desc(), F.col("cls")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            id_col,
            "actual",
            F.col("cls").alias("predicted"),
            F.col("score_dec").cast("double").alias("score"),
            (F.col("cls") == F.col("actual")).alias("correct"),
        )
    )
