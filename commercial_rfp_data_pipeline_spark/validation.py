"""Runtime schema validation with helpful errors.

The reference validates imperatively at runtime with fuzzy suggestions
for near-miss column names
(commercial_rfp_raw_data_ingestion_and_cleaning.py:188-196,211-219) and
fallback chains for alternative column spellings
(commercial_rfp_content_doc_library_creation.py:90-101). Re-expressed as
engine-level helpers over DataFrame schemas (SURVEY.md §1.3).
"""

from __future__ import annotations

import difflib

from pyspark.sql import DataFrame


class MissingColumnError(ValueError):
    pass


def require_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Raise with a did-you-mean suggestion if any required column is
    absent. Pure metadata check — no job is triggered."""
    have = set(df.columns)
    missing = [c for c in cols if c not in have]
    if missing:
        hints = {
            c: difflib.get_close_matches(c, df.columns, n=3, cutoff=0.6)
            for c in missing
        }
        detail = "; ".join(
            f"'{c}' (did you mean {hints[c]})" if hints[c] else f"'{c}'"
            for c in missing
        )
        raise MissingColumnError(f"missing required column(s): {detail}")
    return df


def resolve_column(df: DataFrame, candidates: list[str]) -> str:
    """First present column from a fallback chain (reference: response ->
    'fixed answer' fallback, key_hash -> first column). Raises if none."""
    for c in candidates:
        if c in df.columns:
            return c
    raise MissingColumnError(
        f"none of {candidates} present; have {df.columns}"
    )
