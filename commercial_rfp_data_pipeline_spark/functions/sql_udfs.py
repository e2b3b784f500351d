"""The engine's scalar surface as SQL UDFs (Spark 4 ``CREATE FUNCTION
... RETURNS``): the same whitespace-normalize / content-key / token
arithmetic that `functions/scalar.py` exposes to DataFrame callers,
declared so a pure-SQL session can call it by name.

Why this matters for the engine contract: the reference computed its
scalar surface in pandas ``.apply`` lambdas — callable only from its
Python pipeline. Re-expressing each scalar as a SQL UDF makes the
surface dialect-native: BI tools, `spark.sql` notebooks, and JDBC
sessions get the exact fidelity-pinned semantics (strip-then-truncate
key order, 120-char snippets — SURVEY.md §2.12.4) without importing the
package. SQL UDFs are inlined by Catalyst at plan time — calling
``rfp_norm_ws(col)`` compiles to the IDENTICAL whole-stage-codegen
expression tree the DataFrame helper builds; zero interpretive
overhead, unlike a registered Python UDF.

Registration is per-session (`TEMPORARY`); `register_sql_udfs(spark)`
is idempotent (CREATE OR REPLACE).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Each body restates a fidelity-pinned expression from
# functions/scalar.py / operators/cleaning.py — same formula, SQL form.
SQL_UDFS: dict[str, str] = {
    # P2 (scalar.norm_ws): stringify + collapse internal ws + trim
    "rfp_norm_ws": """
        CREATE OR REPLACE TEMPORARY FUNCTION rfp_norm_ws(s STRING)
        RETURNS STRING
        RETURN trim(regexp_replace(CAST(s AS STRING), '\\\\s+', ' '))
    """,
    # P4 (cleaning content-hash key): strip ALL ws -> first 120 -> md5,
    # 'RFP_Content_' prefix; strip-then-truncate order is load-bearing
    "rfp_content_key": """
        CREATE OR REPLACE TEMPORARY FUNCTION rfp_content_key(s STRING)
        RETURNS STRING
        RETURN concat('RFP_Content_',
                      md5(substring(regexp_replace(CAST(s AS STRING),
                                                   '\\\\s+', ''), 1, 120)))
    """,
    # token count over the normalized form (textops.token_count)
    "rfp_token_count": """
        CREATE OR REPLACE TEMPORARY FUNCTION rfp_token_count(s STRING)
        RETURNS INT
        RETURN CASE
          WHEN s IS NULL THEN NULL
          WHEN length(trim(regexp_replace(CAST(s AS STRING), '\\\\s+', ' '))) = 0
            THEN 0
          ELSE size(split(lower(trim(regexp_replace(CAST(s AS STRING),
                                                    '\\\\s+', ' '))), ' '))
        END
    """,
    # F1 (scalar.multi_format_to_date): tolerant multi-format parse,
    # NULL for unparseable — precedence order is load-bearing for
    # ambiguous strings like '03-04-2025'
    "rfp_multi_date": """
        CREATE OR REPLACE TEMPORARY FUNCTION rfp_multi_date(s STRING)
        RETURNS DATE
        RETURN coalesce(try_to_date(s, 'MM/dd/yyyy'),
                        try_to_date(s, 'yyyy-MM-dd'),
                        try_to_date(s, 'dd-MM-yyyy'))
    """,
}


def register_sql_udfs(spark: SparkSession) -> list[str]:
    """Register every scalar SQL UDF on the session (idempotent).
    Returns the registered names."""
    for ddl in SQL_UDFS.values():
        spark.sql(ddl)
    return list(SQL_UDFS)
