"""Fidelity tests for the cleaning/dedup operators over hand-built
fixtures engineered to hit every SURVEY.md §2.12 edge."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.operators.cleaning import (
    clean_chain,
    derive_keys,
    filter_string_nulls,
    normalize_whitespace,
    parse_date_column,
)
from commercial_rfp_data_pipeline_spark.operators.dedup import (
    argmax_per_key,
    dedup_keep_first,
    keep_latest_global_date_semantics,
    keep_latest_per_key,
)
from commercial_rfp_data_pipeline_spark.validation import (
    MissingColumnError,
    require_columns,
)


def _rfp(spark, rows):
    return spark.createDataFrame(
        rows,
        "ord long, `client name` string, `rfp type` string, consultant string, "
        "date string, question string, response string",
    )


def test_string_null_asymmetry(spark):
    """§2.12.3: question keeps 'nan' but drops 'none'; response drops
    both — do not 'fix'."""
    rows = [
        (1, "c", "t", "x", "2024-01-01", "nan", "real answer"),
        (2, "c", "t", "x", "2024-01-01", "none", "real answer"),
        (3, "c", "t", "x", "2024-01-01", "NONE", "real answer"),
        (4, "c", "t", "x", "2024-01-01", "real q", "nan"),
        (5, "c", "t", "x", "2024-01-01", "real q", "NaN"),
        (6, "c", "t", "x", "2024-01-01", "real q", "none"),
        (7, "c", "t", "x", "2024-01-01", "real q", "fine"),
        (8, "c", "t", "x", "2024-01-01", "contact", "fine"),
        (9, "c", "t", "x", "2024-01-01", "real q", "N/A"),
        (10, "c", "t", "x", "2024-01-01", "real q", "Not Applicable."),
        (11, "c", "t", "x", "2024-01-01", "real q", ""),
    ]
    out = filter_string_nulls(_rfp(spark, rows))
    assert sorted(r.ord for r in out.collect()) == [1, 7]


def test_whitespace_collapse_and_trim(spark):
    df = spark.createDataFrame([("  a \t\n b  ",)], "x string")
    out = normalize_whitespace(df).collect()[0].x
    assert out == "a b"


def test_multi_format_dates_and_garbage(spark):
    rows = [
        (1, "c", "t", "x", "03/04/2024", "q1", "r"),
        (2, "c", "t", "x", "2024-03-04", "q2", "r"),
        (3, "c", "t", "x", "04-03-2024", "q3", "r"),
        (4, "c", "t", "x", "garbage", "q4", "r"),
    ]
    out = parse_date_column(_rfp(spark, rows))
    got = {r.ord: r.date.isoformat() for r in out.collect()}
    # slash form is month-first; dash d-m-Y form is day-first (§7 hard part 4)
    assert got == {1: "2024-03-04", 2: "2024-03-04", 3: "2024-03-04"}


def test_key_hash_strip_then_truncate(spark):
    """§2.12.4: md5 input is the first 120 chars of the whitespace-
    STRIPPED key; two keys differing only in whitespace hash equal."""
    import hashlib

    q = "word " * 30  # 150 chars with spaces, 120 stripped
    rows = [(1, "cli", "typ", "con", "2024-01-01", q, "resp")]
    df = _rfp(spark, rows)
    df = df.withColumn("date", F.to_date("date"))
    out = derive_keys(df).collect()[0]
    stripped = out.key.replace(" ", "")
    expect = "RFP_Content_" + hashlib.md5(stripped[:120].encode()).hexdigest()
    assert out.key_hash == expect
    assert out.key.startswith("cli_2024-01-01_typ_con_")


def test_j1_literal_vs_intent(spark):
    """§2.12.1: the cross-question date collision. Q1 duplicated with
    max date D; Q2 duplicated holding a non-max row whose date equals D.
    Literal semantics keep that row; intent semantics drop it."""
    rows = [
        (1, "q1", "2024-05-01"),
        (2, "q1", "2024-01-01"),
        (3, "q2", "2024-06-01"),
        (4, "q2", "2024-05-01"),  # non-max, but date == q1's max
        (5, "q3", "2023-01-01"),  # not duplicated -> always kept
    ]
    df = spark.createDataFrame(rows, "ord long, question string, date string")
    df = df.withColumn("date", F.to_date("date"))
    literal = keep_latest_global_date_semantics(df, key="question", date_col="date")
    assert sorted(r.ord for r in literal.collect()) == [1, 3, 4, 5]
    intent = keep_latest_per_key(df, ["question"], date_col="date", tiebreak="ord")
    assert sorted(r.ord for r in intent.collect()) == [1, 3, 5]


def test_argmax_first_max_tiebreak(spark):
    """A5: pandas idxmax returns the FIRST row attaining the max."""
    rows = [(1, "q", 5), (2, "q", 9), (3, "q", 9), (4, "z", 1)]
    df = spark.createDataFrame(rows, "ord long, question string, char_count int")
    out = argmax_per_key(df, ["question"], "char_count", tiebreak="ord")
    assert sorted(r.ord for r in out.collect()) == [2, 4]


def test_dedup_deterministic_across_partitionings(spark):
    """§5.4 property: same survivors under 1, 2, and 16 partitions."""
    rows = [(i, f"k{i % 10}", f"v{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "ord long, k string, v string")
    expected = None
    for n in (1, 2, 16):
        out = dedup_keep_first(df.repartition(n), ["k"], ordinal="ord")
        got = sorted((r.k, r.ord) for r in out.collect())
        if expected is None:
            expected = got
        assert got == expected
    assert [o for _, o in expected] == list(range(10))


def test_clean_chain_end_to_end(spark):
    rows = [
        (1, "c", "t", "x", "03/04/2024", "  q   one  ", "  an answer  "),
        (2, "c", "t", "x", "03/04/1999", "old", "dropped by window"),
        (3, "c", "t", "x", "junk", "q2", "dropped by parse"),
    ]
    out = clean_chain(_rfp(spark, rows), as_of="2024-06-01")
    got = out.collect()
    assert len(got) == 1
    assert got[0].question == "q one"
    assert got[0].response == "an answer"


def test_hash_algo_dispatch(spark):
    """P5 (raw:40-47): md5/sha1/sha256 hex selectable, error otherwise
    — digests match hashlib exactly."""
    import hashlib

    import pytest

    from commercial_rfp_data_pipeline_spark.functions.scalar import hash_hex

    df = spark.createDataFrame([("payload",)], "x string")
    got = df.select(
        hash_hex("x", "md5").alias("m"),
        hash_hex("x", "sha1").alias("s1"),
        hash_hex("x", "sha256").alias("s2"),
    ).collect()[0]
    assert got.m == hashlib.md5(b"payload").hexdigest()
    assert got.s1 == hashlib.sha1(b"payload").hexdigest()
    assert got.s2 == hashlib.sha256(b"payload").hexdigest()
    with pytest.raises(ValueError, match="unsupported hash"):
        hash_hex("x", "crc32")


def test_value_length_and_canonicalize(spark):
    """P7 string-length + P9 alternation branches (raw:306-310)."""
    from commercial_rfp_data_pipeline_spark.functions.scalar import (
        canonicalize_confirmed,
        value_length,
    )

    rows = [
        (1, "abc", "CONFIRMED"),
        (2, "", "Confirmed via BlueInsights."),
        (3, None, "Yes. Confirmed."),
        (4, "xy", "confirmed via mail"),
        (5, "xy", "something else"),
    ]
    df = spark.createDataFrame(rows, "ord long, v string, resp string")
    got = {
        r.ord: (r.n, r.canon)
        for r in df.select(
            "ord",
            value_length("v").alias("n"),
            canonicalize_confirmed("resp").alias("canon"),
        ).collect()
    }
    assert got[1] == (3, "Confirmed")
    assert got[2] == (0, "Confirmed")
    assert got[3][0] is None and got[3][1] == "Confirmed"
    assert got[4] == (2, "Confirmed")
    assert got[5] == (2, "something else")


def test_require_columns_suggests(spark):
    df = spark.createDataFrame([("a",)], "questoin string")
    try:
        require_columns(df, ["question"])
        raise AssertionError("should have raised")
    except MissingColumnError as e:
        assert "questoin" in str(e)


def test_pandas_api_bridge_matches_operators(spark):
    """MIGRATION BRIDGE: the reference's pandas idioms — lowercase
    columns (P1), stringify + whitespace-collapse (P2), keep-first
    dedup (A6) — run NEAR-VERBATIM on pyspark.pandas and produce the
    same table as the engine's operator chain. This is the incremental
    porting path for a reference user: their .columns/.str.replace/
    .drop_duplicates code executes distributed (compiling to the same
    Catalyst plans) before they adopt the operator API."""
    import pyspark.pandas as ps

    from commercial_rfp_data_pipeline_spark.operators.cleaning import (
        lowercase_columns,
        normalize_whitespace,
    )
    from commercial_rfp_data_pipeline_spark.operators.dedup import (
        dedup_keep_first,
    )

    rows = [
        (0, "Acme  Corp", "  What  is\tuptime? ", "99.9%"),
        (1, "Beta LLC", "What is uptime?", "99.5%"),   # dup question post-normalize
        (2, "Acme Corp", "Pricing?", " tiered "),
        (3, "Gamma&Co", "What   is uptime?", "dup again"),
    ]
    sdf = spark.createDataFrame(
        rows, ["Ord", "Client Name", "Question", "Response"]
    )

    # --- reference-style pandas code, unchanged idioms ---
    psdf = sdf.pandas_api(index_col="Ord")
    psdf.columns = [c.lower() for c in psdf.columns]
    for c in psdf.columns:
        psdf[c] = (
            psdf[c].astype(str).str.replace(r"\s+", " ", regex=True).str.strip()
        )
    got_ps = (
        psdf.sort_index()
        .drop_duplicates(subset=["question"], keep="first")
        .to_pandas()
        .reset_index()
        .rename(columns={"Ord": "ord"})
    )

    # --- the engine's operator chain ---
    eng = normalize_whitespace(
        lowercase_columns(sdf.withColumnRenamed("Ord", "ord"))
    )
    got_ops = dedup_keep_first(eng, ["question"], ordinal="ord")

    # P2 stringifies every cell (the reference's applymap posture), so
    # the operator path's ord is a string — align the ps side
    got_ps["ord"] = got_ps["ord"].astype(str)
    a = sorted(map(tuple, got_ps[["ord", "client name", "question", "response"]].itertuples(index=False)))
    b = sorted(
        (r.ord, r["client name"], r.question, r.response)
        for r in got_ops.collect()
    )
    assert [t[0] for t in b] == ["0", "2"]  # keep-first survivors
    assert a == b
