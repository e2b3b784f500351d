"""Layout queries: the normalized Z-order interleave key,
value-checked against a DuckDB restatement generated from the same
scale/interleave loops."""

from __future__ import annotations

from commercial_rfp_data_pipeline_spark.io import load_table
from commercial_rfp_data_pipeline_spark.operators.layout import (
    zorder_key,
    zorder_oracle_cte,
)
from commercial_rfp_data_pipeline_spark.registry import query

_ZCOLS = ["l_partkey", "l_suppkey"]


@query(
    "zorder_key_interleave",
    f"""
    WITH {zorder_oracle_cte("lineitem", _ZCOLS).strip()}
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, zkey
    FROM zkeyed
    """,
)
def q_zorder_key(spark, sf_dir):
    """The range-normalized Morton (Z-order) clustering key over
    (l_partkey, l_suppkey) for every lineitem row — the sort key
    `save_zordered` lays files out by. Each column scales onto a
    16-bit domain by its min/max (integer floor arithmetic; the
    min/max pass is the same metadata-sized aggregate Delta's
    OPTIMIZE runs), then bits interleave. The value-hash pins the
    whole construction; the layout test (tests/test_round4_ops.py)
    separately proves the written files' min/max footers shrink on
    BOTH dimensions.

    Scale: one tiny min/max aggregate + a narrow codegen map."""
    li = load_table(spark, sf_dir, "lineitem")
    return zorder_key(li, _ZCOLS).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "zkey"
    )
