"""Record-linkage operators: scalable fuzzy (edit-distance) join via
deletion-neighborhood blocking, plus the entity-resolution composition
(fuzzy pairs -> connected components -> canonical survivor).

The reference's data plane dedupes on exact content keys
(commercial_rfp_data_pipeline.py's md5 content key); real entity
resolution needs the fuzzy counterpart: link records whose identifying
string differs by a typo. The naive form is an all-pairs levenshtein
scan — quadratic, impossible at 100 TB.

Design for scale — the SymSpell / deletion-neighborhood discipline:
- every record emits its identifier plus all length-1 DELETION variants
  (fanout = len(s) + 1, a constant for id-like strings);
- two strings within levenshtein distance 1 MUST share a variant
  (equal -> identity key; substitution at i -> both del-i variants
  equal; insertion/deletion -> the shorter string IS a variant of the
  longer and of itself), so an equi-join on the variant key is an
  EXHAUSTIVE candidate generator — the same pigeonhole discipline as
  the simhash band join (operators/textops.py:simhash_pairs);
- candidates then pass through the EXACT levenshtein predicate
  (native `F.levenshtein`, JVM codegen), so false candidates cost one
  comparison, never a missed match;
- an optional exact blocking column (e.g. nation) rides the join key —
  the classic linkage blocking rule that also bounds bucket occupancy;
- the join shuffles (variant, block) keys only; bucket fanout is
  bounded by variant-key collisions, never n^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_keys(col: str) -> F.Column:
    """Array of the string plus every delete-one-char variant (the
    SymSpell candidate-key set for edit distance <= 1), as a pure
    codegen expression — no UDF."""
    return F.expr(
        f"array_union(array({col}), "
        f"transform(sequence(1, length({col})), "
        f"i -> concat(substring({col}, 1, i - 1), "
        f"substring({col}, i + 1, length({col}) - i))))"
    )


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str] | None = None,
    max_dist: int = 1,
) -> DataFrame:
    """All record pairs (id_a < id_b) whose ``name_col`` values are
    within levenshtein ``max_dist`` (currently <= 1: the deletion-
    neighborhood keys are exhaustive for one edit) and whose
    ``block_cols`` agree exactly. Returns (id_a, id_b, name_a, name_b,
    dist).

    One explode (fanout len+1), one equi-join on (variant, *blocks),
    one distinct on the id pair — nothing quadratic.
    """
    if max_dist != 1:
        raise ValueError(
            "fuzzy_pairs: deletion-neighborhood keys are exhaustive "
            "only for max_dist=1; chain merges for larger distances"
        )
    blocks = list(block_cols or [])
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("_name"),
        *[F.col(c).alias(f"_b_{c}") for c in blocks],
        F.explode(_deletion_keys(name_col)).alias("_key"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    cond = (F.col("a._key") == F.col("b._key")) & (
        F.col("a._id") < F.col("b._id")
    )
    for c in blocks:
        cond = cond & (F.col(f"a._b_{c}") == F.col(f"b._b_{c}"))
    return (
        a.join(b, cond)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._name").alias("name_a"),
            F.col("b._name").alias("name_b"),
        )
        # the same true pair surfaces under several shared variants —
        # one distinct on the (already-small) candidate set
        .distinct()
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
    )
