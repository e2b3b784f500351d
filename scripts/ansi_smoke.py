#!/usr/bin/env python
"""Run every registered query under a DRIVER-LIKE session — ANSI mode
ON (strict casts/overflow), default shuffle partitions, neutral cwd
assumptions — at sf0.001. The engine's own sessions run ANSI OFF (the
reference's coerce-don't-crash ingest posture), but the external
driver constructs its own ANSI session, so every query must execute
under both. This catches ANSI-only failures (invalid implicit casts,
decimal overflow raising instead of NULL) before the driver does.

Usage: python scripts/ansi_smoke.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    import __spark_entry__ as m

    from commercial_rfp_data_pipeline_spark.io import release_pinned

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    queries = m.queries()
    names = sys.argv[1:] or sorted(queries)
    fails = []
    for name in names:
        t0 = time.time()
        try:
            n = queries[name](spark, "/root/testdata/sf0.001").count()
            print(f"OK   {name}: {n} [{time.time() - t0:.1f}s]", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"FAIL {name}: {str(e)[:300]}", flush=True)
        release_pinned()
        spark.catalog.clearCache()
    print(f"{len(names) - len(fails)}/{len(names)} passed; FAILS: {fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
