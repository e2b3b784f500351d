"""Round-11 bench-artifact contract (VERDICT r10 #6): merged artifacts
are best-of-N composites across windows and must say so; totals are
recomputed from the merged per-query map."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _window(queries, env):
    return {
        "metric": "total_query_seconds",
        "value": 0.0,
        "unit": "sec",
        "sf": 0.1,
        "queries": queries,
        "env": env,
        "composite": False,
    }


def test_merge_bench_sets_composite_flag_and_recomputes(tmp_path):
    base = _window(
        {"q_a": 2.0, "q_b": 5.0},
        {
            "q_a": {"dirty": False},
            "q_b": {"dirty": True},  # dirty in the base window
        },
    )
    retry = _window(
        {"q_a": 3.0, "q_b": 1.5},  # q_a slower (clean), q_b now clean
        {
            "q_a": {"dirty": False},
            "q_b": {"dirty": False},
        },
    )
    base_p = tmp_path / "base.json"
    retry_p = tmp_path / "retry.json"
    out_p = tmp_path / "merged.json"
    base_p.write_text(json.dumps(base))
    retry_p.write_text(json.dumps(retry))
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "merge_bench.py"),
            str(base_p),
            str(retry_p),
            "--out",
            str(out_p),
        ],
        check=True,
        capture_output=True,
    )
    merged = json.loads(out_p.read_text())
    # the merge output is a composite and must be flagged as one
    assert merged["composite"] is True
    # keep-faster-clean: the slower clean re-sample of q_a is ignored,
    # the newly-clean q_b replaces the dirty base entry
    assert merged["queries"] == {"q_a": 2.0, "q_b": 1.5}
    assert merged["n_dirty"] == 0
    assert merged["value"] == 3.5
    assert merged["total_all"] == 3.5
    assert merged["merged_from"] == {"q_b": str(retry_p)}


def test_single_window_payload_contract():
    """bench.py's payload must mark itself non-composite and name
    total_all as the primary cross-round comparator (source-level pin:
    running the bench in a unit test is too heavy)."""
    with open(os.path.join(REPO, "bench.py")) as f:
        src = f.read()
    assert '"composite": False' in src
    assert '"primary_cross_round_metric": "total_all"' in src
