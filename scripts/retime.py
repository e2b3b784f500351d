"""Re-adjudicate suspect bench entries (round 9, VERDICT r8 #6).

The clean-run gate (steal_pct / ext_cores) cannot see co-tenant
memory-bandwidth/LLC pressure that slows every attempt in a window
equally; the r8 driver artifact carried entries inflated 5-13x with
clean counters. Two signals now exist to catch this after the fact:

1. per-query ``calib_ratio`` in the full bench artifact (the fixed-work
   probe's time relative to the run's best probe) — a ratio >= 1.5
   means the box itself was slow while that query was measured;
2. this script: re-run just the suspect queries through the SAME bench
   harness on a quiet box and print old-vs-new side by side.

Usage:
    # re-time explicit queries
    python scripts/retime.py pagerank_copurchase ann_lsh_topk

    # re-time everything a bench artifact flags (dirty OR
    # calib_ratio >= --threshold), comparing against its numbers
    python scripts/retime.py --from-bench BENCH_FULL_latest.json

Environment: honors the same SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as
bench.py (defaults sf0.1 / 32).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--from-bench", default=None)
    ap.add_argument(
        "--threshold",
        type=float,
        default=1.5,
        help="calib_ratio at or above which an entry is re-timed",
    )
    args = ap.parse_args()

    old: dict[str, float] = {}
    names = list(args.queries)
    if args.from_bench:
        with open(args.from_bench) as f:
            prior = json.load(f)
        old = {
            n: t for n, t in prior.get("queries", {}).items() if t >= 0
        }
        env = prior.get("env", {})
        for n, e in env.items():
            if e.get("dirty") or e.get("calib_ratio", 1.0) >= args.threshold:
                if n not in names:
                    names.append(n)
    if not names:
        print("nothing to re-time (no suspects found)", file=sys.stderr)
        return 0

    out_json = "/tmp/retime_bench.json"
    child = os.environ.copy()
    child["SPARK_GRAFT_BENCH_ONLY"] = ",".join(names)
    child["SPARK_GRAFT_BENCH_JSON"] = out_json
    print(f"re-timing {len(names)} queries: {' '.join(names)}", file=sys.stderr)
    # tee bench.py's stderr to ours live (ADVICE r9: DEVNULL swallowed
    # both the failure diagnostics and per-query bench errors) while
    # keeping a copy for the failure message
    err_lines: list[str] = []
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=child,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    assert proc.stderr is not None
    for line in proc.stderr:
        err_lines.append(line)
        sys.stderr.write(line)
    proc.communicate()
    if proc.returncode != 0:
        tail = "".join(err_lines[-30:])
        print(
            f"bench.py failed (exit {proc.returncode}); stderr tail:\n"
            f"{tail}",
            file=sys.stderr,
        )
        return 1
    with open(out_json) as f:
        fresh = json.load(f)
    rows = []
    for n in names:
        t_new = fresh["queries"].get(n, -1.0)
        e = fresh.get("env", {}).get(n, {})
        rows.append(
            {
                "query": n,
                "old": old.get(n),
                "new": t_new,
                "dirty": e.get("dirty", False),
                "calib_ratio": e.get("calib_ratio"),
            }
        )
        o = f"{old[n]:8.2f}" if n in old else "       -"
        print(
            f"{n:42s} old={o}  new={t_new:8.2f}  "
            f"dirty={e.get('dirty', False)}  calib={e.get('calib_ratio')}"
        )
    print(json.dumps({"retimed": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
