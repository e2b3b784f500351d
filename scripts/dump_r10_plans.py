#!/usr/bin/env python
"""Dump `explain("formatted")` for the round-10-touched queries into
plans/r10/<query>_<suffix>.txt — the optimization round's before/after
plan evidence. Run once in a worktree at the round-9 HEAD (suffix
`before`) and once at the optimized HEAD (suffix `after`):

    python scripts/dump_r10_plans.py before
    python scripts/dump_r10_plans.py after [outdir]

Queries that did not exist at the round-9 HEAD are skipped there, so
new queries carry an `_after.txt` only.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commercial_rfp_data_pipeline_spark.io import release_pinned
from commercial_rfp_data_pipeline_spark.registry import all_queries
from commercial_rfp_data_pipeline_spark.session import get_spark

# every query whose physical plan the round-10 optimization work touched
TOUCHED = [
    "entity_resolution_customers",
    "fuzzy_name_pairs",
    "audio_phash_neardup",
    "multimodal_phash_neardup",
    "phash_method_agreement",
    "dedup_connected_components",
    "jaccard_prefix_filter_pairs",
    "split_leakage_neardup",
    "triangle_count_copurchase",
    "hits_hubs_authorities",
    "top_supplier_q15",
    "training_data_pipeline_dsir",  # new in r10: after-only
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r10",
        )
    )
    os.makedirs(outdir, exist_ok=True)
    extra = [a for a in sys.argv[3:]]
    spark = get_spark(app_name=f"plans-r10-{suffix}")
    queries = all_queries()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for name in TOUCHED + extra:
        if name not in queries:
            print(f"skip {name}: not registered at this revision")
            continue
        try:
            df = queries[name](spark, sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 — record, keep dumping
            plan = f"ERROR building plan: {e}"
        plan = re.sub(r"\[codegen id : \d+\]", "[codegen]", plan)
        # strip the content-hash component of artifact paths so before/
        # after diffs show structure, not corpus-signature churn
        plan = re.sub(r"(artifact[s]?/[a-z0-9_]+-)[0-9a-f]{8,}", r"\1<key>", plan)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan.strip() + "\n")
        print(f"wrote {path}")
        release_pinned()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
