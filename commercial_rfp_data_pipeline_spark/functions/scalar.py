"""Scalar column expressions covering the reference's entire scalar
surface (SURVEY.md §2.10). Everything here is a native Catalyst
expression — whole-stage-codegen'd, zero Python in the executor hot
path. The reference computed these with pandas ``.apply`` lambdas
(row-at-a-time interpreted Python); this module is the 100-TB-safe
re-expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's date fallback chain, in precedence order
# (commercial_rfp_raw_data_ingestion_and_cleaning.py:169-177):
#   %m/%d/%Y -> %Y-%m-%d -> %d-%m-%Y -> pandas coerce (dropped here: the
#   first three cover every fixture; anything else is unparseable).
DATE_FORMATS = ("MM/dd/yyyy", "yyyy-MM-dd", "dd-MM-yyyy")


def multi_format_to_date(col: Column | str, formats: tuple[str, ...] = DATE_FORMATS) -> Column:
    """Multi-format tolerant date parse (F1). ``try_to_date`` per format
    inside ``coalesce`` — NULL for unparseable, never a throw, matching
    pandas ``errors='coerce'``. Precedence matters for ambiguous strings
    like '03-04-2025' (SURVEY.md §7 hard part 4)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_date(c, f) for f in formats])


def norm_ws(col: Column | str) -> Column:
    """Stringify + collapse internal whitespace + trim (P2): the
    reference's ``applymap(lambda x: re.sub(r'\\s+', ' ', str(x)).strip())``
    (raw_data_ingestion:183). NULLs stay NULL (the reference's stringify
    turned them into 'nan' — fixtures model that explicitly)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c.cast("string"), r"\s+", " "))


def hash_hex(col: Column | str, algo: str = "md5") -> Column:
    """Hash-algo dispatch (P5): md5 / sha1 / sha256 hex digest, error on
    anything else (raw_data_ingestion:40-47)."""
    c = F.col(col) if isinstance(col, str) else col
    if algo == "md5":
        return F.md5(c)
    if algo == "sha1":
        return F.sha1(c)
    if algo == "sha256":
        return F.sha2(c, 256)
    raise ValueError(f"unsupported hash algorithm: {algo!r}")


# Response canonicalization alternation (P9, raw_data_ingestion:306-310):
# case-insensitive variants all collapse to the literal 'Confirmed'.
CONFIRMED_PATTERN = (
    r"(?i)^(confirmed|confirmed\.|confirmed via blueinsights\.?|"
    r"confirmed via mail\.?|yes\.? confirmed\.?)$"
)


def canonicalize_confirmed(col: Column | str, pattern: str = CONFIRMED_PATTERN) -> Column:
    """P9: collapse 'CONFIRMED' / 'Confirmed via BlueInsights.' / ... to
    'Confirmed'. Runs on the final deduped table — dedup compares
    pre-canonicalized responses (SURVEY.md §2.12.7)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.rlike(pattern), F.lit("Confirmed")).otherwise(c)


def value_length(col: Column | str) -> Column:
    """Type-dispatched length (P7): strings -> char length; the
    reference's numeric->1 branch applies post-stringify so numerics are
    strings here; arrays -> size handled at call sites with F.size."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)
