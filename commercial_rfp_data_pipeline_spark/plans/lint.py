"""Plan lints: invariants enforced over every registered query's plan.

The first lint is the global-window funnel: a Window with an EMPTY
partition spec moves its entire input frame through one task
(`WindowExec: No Partition Defined`). That is a 100x-scale defect
unless the frame is bounded by construction. `global_window_violations`
walks the optimized logical plan (logical Window nodes map 1:1 onto
physical WindowExec partition specs) and flags every empty-partition
window whose input subtree is not provably bounded by one of:

1. **rank-after-limit** — a GlobalLimit/LocalLimit below the window
   (the repo's limit-first discipline: `orderBy().limit(k)` compiles
   to TakeOrderedAndProject; the rank window then sees k rows);
2. **per-partition metadata frame** — the window orders by the
   synthetic `_pid` column over an aggregate keyed by `_pid`
   (`distributed_prefix_agg`: one row per shuffle partition);
3. **constant-domain ring** — the window orders by the synthetic
   `_rb` bucket column over a `spark.range(16^h)` frame (the
   hash-ring bucket table in `operators/sampling.py`, 256 rows by
   construction).

Growing frames must restructure (limit-first, `distributed_prefix_agg`
for running aggregates/ranks, calendar self-joins for lags, broadcast
one-row aggregates for grand totals) — round 7 converted nine such
sites; `tests/test_plan_shapes.py::test_no_unbounded_global_windows`
keeps the registry clean.
"""

from __future__ import annotations

import re

_SORT_DIR_RE = re.compile(r" (ASC|DESC) NULLS (FIRST|LAST)")


def _tree_lines(plan: str) -> list[tuple[int, str]]:
    """(depth, node_text) per plan line; depth = offset of the `+-` /
    `:-` marker, 0 for the root."""
    out = []
    for raw in plan.splitlines():
        if not raw.strip():
            continue
        m = re.search(r"[+:]- ", raw)
        if m:
            out.append((m.start() + 3, raw[m.end() :]))
        else:
            out.append((0, raw.strip()))
    return out


def _window_specs(node: str) -> list[tuple[list[str], list[str]]]:
    """(partition_args, order_args) per `windowspecdefinition(...)` in
    a Window node's expression list. Order args carry an ASC/DESC
    NULLS marker; everything else before the frame spec is a
    partition arg."""
    specs = []
    for m in re.finditer(r"windowspecdefinition\(", node):
        depth, i = 1, m.end()
        while depth and i < len(node):
            if node[i] == "(":
                depth += 1
            elif node[i] == ")":
                depth -= 1
            i += 1
        body = node[m.end() : i - 1]
        args, d, start = [], 0, 0
        for j, ch in enumerate(body):
            if ch in "([":
                d += 1
            elif ch in ")]":
                d -= 1
            elif ch == "," and d == 0:
                args.append(body[start:j].strip())
                start = j + 1
        args.append(body[start:].strip())
        args = [
            a
            for a in args
            if not a.startswith("specifiedwindowframe")
            and a != "unspecifiedframe$()"
        ]
        part = [a for a in args if not _SORT_DIR_RE.search(a)]
        order = [a for a in args if _SORT_DIR_RE.search(a)]
        specs.append((part, order))
    return specs


def global_window_violations(df) -> list[str]:
    """Violation descriptions for every unbounded empty-partition-spec
    Window in df's optimized logical plan (empty list = clean)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = _tree_lines(plan)
    bad = []
    for idx, (depth, node) in enumerate(lines):
        if not node.startswith("Window "):
            continue
        specs = _window_specs(node)
        offending = [(p, o) for p, o in specs if not p]
        if not offending:
            continue
        order_spec = ", ".join(", ".join(o) for _, o in offending if o)
        sub = []
        for d2, n2 in lines[idx + 1 :]:
            if d2 <= depth:
                break
            sub.append(n2)
        subtree = "\n".join(sub)
        # rank-after-limit: the limit must sit on the window's UNARY
        # input chain — a GlobalLimit inside a join/union branch below
        # does NOT bound the window's input frame
        spine = []
        for n2 in sub:
            spine.append(n2)
            if re.search(r"\b(Join|Union|CartesianProduct)\b", n2):
                break
        if re.search(r"\b(GlobalLimit|LocalLimit)\b", "\n".join(spine)):
            continue  # rank-after-limit
        if re.search(r"\b_pid#\d+", order_spec) and re.search(
            r"Aggregate \[_pid#\d+\]", subtree
        ):
            continue  # one-row-per-shuffle-partition metadata frame
        if re.search(r"\b_rb#\d+", order_spec) and re.search(
            r"Range \(0, \d{1,4},", subtree
        ):
            continue  # constant hash-ring bucket table (<=10k rows)
        bad.append(f"unbounded global window: {node[:160]}")
    return bad


def plan_antipattern_violations(df) -> list[str]:
    """Physical-plan anti-patterns forbidden registry-wide (round 7):

    - **CartesianProduct** — a non-broadcast cross join materializes
      |A| x |B| across the shuffle; every legitimate cross in this
      repo broadcasts a scalar/config-sized side, which plans as
      BroadcastNestedLoopJoin instead. (Found and fixed one real one:
      consistent_hash_rebalance_audit fanned the corpus 9x through a
      shards x moves cross.)
    - **BatchEvalPython / row-at-a-time Python UDFs** — the slow path
      SURVEY §2.13 bans; the only sanctioned Python seams are
      Arrow-batched (FlatMapGroupsInPandas / MapInPandas /
      ArrowEvalPython).
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = []
    if "CartesianProduct" in plan:
        bad.append("CartesianProduct (non-broadcast cross join)")
    if "BatchEvalPython" in plan:
        bad.append("BatchEvalPython (row-at-a-time Python UDF)")
    return bad
