"""RFP-fidelity queries: the flagship chain and its granular stages,
oracle-checked end-to-end (SURVEY.md §3.2, §2.12)."""

from __future__ import annotations

from pyspark.sql import functions as F

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.plans.flagship import AS_OF, flagship, rfp_raw
from commercial_rfp_data_pipeline_spark.registry import query

# ---------------------------------------------------------------------------
# Shared SQL fragments (mirror plans/flagship.py exactly)

_RAW_CTE = """
rfp_raw AS (
  SELECT d1.doc_id AS ord,
         d1.source AS client_name,
         d1.lang AS rfp_type,
         'consultant_' || CAST(d1.doc_id % 5 AS VARCHAR) AS consultant,
         CASE CAST(d1.doc_id % 4 AS INTEGER)
           WHEN 0 THEN strftime(DATE '1994-01-01' + CAST((d1.doc_id * 7) % 1600 AS INTEGER), '%m/%d/%Y')
           WHEN 1 THEN strftime(DATE '1994-01-01' + CAST((d1.doc_id * 7) % 1600 AS INTEGER), '%Y-%m-%d')
           WHEN 2 THEN strftime(DATE '1994-01-01' + CAST((d1.doc_id * 7) % 1600 AS INTEGER), '%d-%m-%Y')
           ELSE 'not a date ' || CAST(d1.doc_id AS VARCHAR)
         END AS date,
         CASE CAST(d1.doc_id % 23 AS INTEGER)
           WHEN 0 THEN 'none' WHEN 1 THEN 'None' WHEN 2 THEN 'nan' WHEN 3 THEN 'contact'
           WHEN 4 THEN NULL
           ELSE '  ' || replace(substr(d2.qtext, 1, 130), ' ', '  ') || ' '
         END AS question,
         CASE CAST(d1.doc_id % 19 AS INTEGER)
           WHEN 0 THEN 'none' WHEN 1 THEN 'NaN' WHEN 2 THEN 'N/A' WHEN 3 THEN 'Not Applicable.'
           WHEN 4 THEN 'CONFIRMED' WHEN 5 THEN 'Confirmed via BlueInsights.'
           WHEN 6 THEN 'Yes. Confirmed.' WHEN 7 THEN '' WHEN 8 THEN NULL
           ELSE substr(d2.qtext, 11, CAST(100 + (d1.doc_id % 40) AS INTEGER))
         END AS response,
         CASE WHEN d1.doc_id % 6 = 0 THEN 'sme_' || CAST(d1.doc_id % 9 AS VARCHAR) END AS sme
  FROM documents d1
  JOIN (SELECT doc_id, text AS qtext FROM documents) d2
    ON d1.doc_id % 250 = d2.doc_id
)
"""

_TRY_PARSE = (
    "CAST(COALESCE(try_strptime({c}, '%m/%d/%Y'), try_strptime({c}, '%Y-%m-%d'), "
    "try_strptime({c}, '%d-%m-%Y')) AS DATE)"
)


def _norm(c: str) -> str:
    return f"trim(regexp_replace(CAST({c} AS VARCHAR), '\\s+', ' ', 'g'))"


_CONFIRMED_SQL = (
    r"(?i)^(confirmed|confirmed\.|confirmed via blueinsights\.?|"
    r"confirmed via mail\.?|yes\.? confirmed\.?)$"
)

_KEYED_CTE = f"""
keyed AS (
  SELECT *,
    concat_ws('_', trim(client_name), strftime({_TRY_PARSE.format(c='date')}, '%Y-%m-%d'),
              trim(rfp_type), trim(consultant),
              substr(trim(question), 1, 120), substr(trim(response), 1, 120)) AS key
  FROM rfp_raw
),
hashed AS (
  SELECT *, 'RFP_Content_' || md5(substr(regexp_replace(key, '\\s+', '', 'g'), 1, 120)) AS key_hash
  FROM keyed
),
cleaned AS (
  SELECT ord,
         {_norm('client_name')} AS client_name,
         {_norm('rfp_type')} AS rfp_type,
         {_norm('consultant')} AS consultant,
         {_norm('date')} AS date,
         {_norm('question')} AS question,
         {_norm('response')} AS response,
         {_norm('sme')} AS sme,
         {_norm('key')} AS key,
         {_norm('key_hash')} AS key_hash
  FROM hashed
),
parsed AS (
  SELECT *, {_TRY_PARSE.format(c='date')} AS date_parsed FROM cleaned
),
filtered AS (
  SELECT * FROM parsed
  WHERE date_parsed IS NOT NULL
    AND date_parsed >= DATE '1995-06-01'
    AND question IS NOT NULL AND lower(question) <> 'none'
    AND response IS NOT NULL AND lower(response) NOT IN ('none', 'nan')
    AND length(response) <> 0
    AND lower(response) NOT IN ('n/a', 'not applicable.')
    AND lower(question) NOT IN ('contact')
)
"""

FLAGSHIP_ORACLE = f"""
WITH {_RAW_CTE.strip().rstrip()},
{_KEYED_CTE.strip().lstrip()},
a6 AS (
  SELECT * EXCLUDE (rn) FROM (
    SELECT *, row_number() OVER (PARTITION BY question, response ORDER BY ord) AS rn
    FROM filtered
  ) WHERE rn = 1
),
j1 AS (
  SELECT * FROM a6
  WHERE question IN (SELECT question FROM a6 GROUP BY question HAVING count(*) = 1)
     OR date_parsed IN (SELECT max(date_parsed) FROM a6 GROUP BY question HAVING count(*) > 1)
),
a5 AS (
  SELECT * EXCLUDE (rn2) FROM (
    SELECT *, row_number() OVER (PARTITION BY question ORDER BY length(response) DESC, ord) AS rn2
    FROM j1
  ) WHERE rn2 = 1
)
SELECT ord, client_name, rfp_type, consultant,
       strftime(date_parsed, '%Y-%m-%d') AS date,
       question,
       CASE WHEN regexp_matches(response, '{_CONFIRMED_SQL}') THEN 'Confirmed' ELSE response END AS response,
       sme, key, key_hash
FROM a5
"""


@query("rfp_clean_flagship", FLAGSHIP_ORACLE)
def q_flagship(spark, sf_dir):
    return flagship(spark, sf_dir, as_of=AS_OF)


RAW_ORACLE = f"""
WITH {_RAW_CTE.strip()}
SELECT * FROM rfp_raw
"""


@query("rfp_raw_derivation", RAW_ORACLE)
def q_rfp_raw(spark, sf_dir):
    """The derived fixture itself — pins the derivation so flagship
    mismatches can be localized."""
    return rfp_raw(spark, sf_dir)


FILTERED_ORACLE = f"""
WITH {_RAW_CTE.strip()},
{_KEYED_CTE.strip().lstrip()}
SELECT ord, client_name, rfp_type, consultant, question, response, sme, key, key_hash,
       strftime(date_parsed, '%Y-%m-%d') AS date_iso
FROM filtered
"""


@query("rfp_clean_filtered", FILTERED_ORACLE)
def q_rfp_filtered(spark, sf_dir):
    """Keys + P2 + F1..F7, before any dedup — the filter half of the
    chain (raw:179-241)."""
    from commercial_rfp_data_pipeline_spark.operators.cleaning import (
        derive_keys,
        filter_string_nulls,
        normalize_whitespace,
        parse_date_column,
        retention_filter,
    )

    df = rfp_raw(spark, sf_dir)
    df = df.withColumn(
        "date_parsed",
        F.coalesce(
            *[
                F.try_to_date(F.col("date"), f)
                for f in ("MM/dd/yyyy", "yyyy-MM-dd", "dd-MM-yyyy")
            ]
        ),
    )
    df = derive_keys(
        df, client="client_name", date="date_parsed", rfp_type="rfp_type",
        consultant="consultant", question="question", response="response",
    ).drop("date_parsed")
    df = normalize_whitespace(df, [c for c in df.columns if c != "ord"])
    df = parse_date_column(df, col="date", out="date_parsed")
    df = retention_filter(df, as_of=AS_OF, months=36, col="date_parsed")
    df = filter_string_nulls(df)
    return df.select(
        "ord", "client_name", "rfp_type", "consultant", "question", "response",
        "sme", "key", "key_hash",
        F.date_format("date_parsed", "yyyy-MM-dd").alias("date_iso"),
    )


_RENDER_CASES = ", ".join(
    f"CASE WHEN {c} IS NOT NULL AND trim({c}) <> '' THEN '{label}: ' || {c} END"
    for c, label in (
        ("client_name", "Client Name"),
        ("rfp_type", "RFP Type"),
        ("consultant", "Consultant"),
        ("date", "Date"),
        ("question", "Question"),
        ("response", "Response"),
        ("sme", "SME"),
    )
)

RENDER_ORACLE = f"""
WITH flagship AS ({FLAGSHIP_ORACLE})
SELECT CASE WHEN lower(key_hash) LIKE '%.docx' THEN key_hash
            ELSE key_hash || '.docx' END AS file_name,
       'RFP_content_library.xlsx' AS source_file,
       concat_ws(chr(10), 'Source File Name: RFP_content_library.xlsx', {_RENDER_CASES}) AS content
FROM flagship
"""


@query("rfp_doc_render", RENDER_ORACLE)
def q_doc_render(spark, sf_dir):
    """P10+P11 over the flagship output: one rendered document per
    cleaned row, labeled lines with blank fields skipped, 'Source File
    Name' first, file named {key_hash}.docx
    (doc_library:46-69,105-131)."""
    from commercial_rfp_data_pipeline_spark.operators.documents import (
        render_documents,
    )

    return render_documents(
        flagship(spark, sf_dir, as_of=AS_OF), source_file="RFP_content_library.xlsx"
    )


@query(
    "hash_algo_dispatch",
    """
    SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
    FROM documents
    """,
)
def q_hash_dispatch(spark, sf_dir):
    """P5 hash-algo dispatch (raw_data_ingestion:40-47): selectable
    md5/sha1/sha256 hex digest. The md5 and sha256 branches are
    oracle-checked here; sha1 is registered rows-only below because
    DuckDB ships no sha1()."""
    from commercial_rfp_data_pipeline_spark.functions.scalar import hash_hex

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        hash_hex(F.col("text"), "md5").alias("md5_hex"),
        hash_hex(F.col("text"), "sha256").alias("sha256_hex"),
    )


@query("hash_algo_dispatch_sha1")
def q_hash_dispatch_sha1(spark, sf_dir):
    """P5 sha1 branch — rows-only check (DuckDB has no sha1 builtin);
    the digest value itself is pinned by a pytest fixture against
    hashlib."""
    from commercial_rfp_data_pipeline_spark.functions.scalar import hash_hex

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", hash_hex(F.col("text"), "sha1").alias("sha1_hex"))


@query(
    "sql_udf_scalar_surface",
    r"""
    SELECT doc_id,
           trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g'))
             AS text_norm,
           'RFP_Content_' || md5(substring(
               regexp_replace(CAST(text AS VARCHAR), '\s+', '', 'g'), 1, 120))
             AS content_key,
           CASE
             WHEN text IS NULL THEN NULL
             WHEN length(trim(regexp_replace(CAST(text AS VARCHAR),
                                             '\s+', ' ', 'g'))) = 0 THEN 0
             ELSE len(string_split(lower(trim(regexp_replace(
                    CAST(text AS VARCHAR), '\s+', ' ', 'g'))), ' '))
           END AS n_tokens
    FROM documents
    """,
)
def q_sql_udf_scalar_surface(spark, sf_dir):
    """The scalar surface exercised through SQL UDFs (Spark 4
    ``CREATE FUNCTION ... RETURNS``, `functions/sql_udfs.py`): the
    P2 whitespace-normalize, the P4 strip-then-truncate content key,
    and the token counter, each called BY NAME from a plain
    ``spark.sql`` statement — the dialect-native form of the surface
    the reference buried in pandas lambdas. Catalyst inlines each UDF
    body at plan time, so the physical plan is the identical
    whole-stage-codegen projection the DataFrame helpers produce (a
    plan test asserts no BatchEvalPython appears); the oracle states
    the same formulas inline."""
    from commercial_rfp_data_pipeline_spark.functions.sql_udfs import (
        register_sql_udfs,
    )

    register_sql_udfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT doc_id,
               rfp_norm_ws(text) AS text_norm,
               rfp_content_key(text) AS content_key,
               rfp_token_count(text) AS n_tokens
        FROM documents
        """
    )
