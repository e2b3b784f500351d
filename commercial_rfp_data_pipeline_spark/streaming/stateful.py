"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.11 extension — the reference has no streaming; this is
the `applyInPandasWithState` seam a 100-TB incremental pipeline needs
for semantics the built-in windowed aggregations can't express).

The operator keeps per-user running stats (event count, value sum,
latest event time) across micro-batches in versioned state. On finite
replay the final emission per user equals the batch groupBy — which is
DuckDB-checked via `events_type_value_stats`' sibling oracle — so the
stateful path is verified against the batch plan (tests).

Scale: state is partitioned by the group key across executors and
checkpointed incrementally (RocksDB-backed state store in production
confs); per-batch work is Arrow-batched pandas on each key group's
new rows only.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total double, last_us long"


def _update_user_stats(
    key: Tuple[int],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, last_us = state.get if state.exists else (0, 0.0, None)
    for pdf in batches:
        n += int(len(pdf))
        total += float(pdf["value"].sum())
        m = pdf["ts"].max()
        us = int(m.value // 1_000)  # pandas ns -> micros
        last_us = us if last_us is None else max(last_us, us)
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us * 1_000)],
        }
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value), max(ts)) maintained in
    explicit state — emitted once per key per micro-batch (update
    mode), the incremental mirror of the batch groupBy."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
