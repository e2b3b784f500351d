#!/usr/bin/env python
"""Dump `explain("formatted")` for the round-11-touched queries into
plans/r11/<query>_<suffix>.txt — the optimization round's before/after
plan evidence. Run once in a worktree at the round-10 HEAD (suffix
`before`) and once at the optimized HEAD (suffix `after`):

    python scripts/dump_r11_plans.py before
    python scripts/dump_r11_plans.py after [outdir]

Env toggles are honored, so forced-distributed / artifacts-off plan
dumps can be produced with the same script (pass a distinct suffix).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commercial_rfp_data_pipeline_spark.io import release_pinned
from commercial_rfp_data_pipeline_spark.registry import all_queries
from commercial_rfp_data_pipeline_spark.session import get_spark

# every query whose physical plan the round-11 optimization work touched
TOUCHED = [
    "late_interaction_maxsim_topk",
    "personalized_pagerank_parts",
    "pagerank_copurchase",
    "weighted_pagerank_copurchase",
    "item_cf_similar_top3",
    "ivf_coarse_assignment",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r11",
        )
    )
    os.makedirs(outdir, exist_ok=True)
    extra = [a for a in sys.argv[3:]]
    spark = get_spark(app_name=f"plans-r11-{suffix}")
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
