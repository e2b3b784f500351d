"""Custom stateful streaming on Spark 4's ``transformWithStateInPandas``
(the successor to ``applyInPandasWithState``): typed composite state
(ValueState + MapState), per-state TTL support, and timers — the API a
long-running 100-TB incremental pipeline standardizes on because state
evolves independently per name instead of riding one monolithic tuple.

Operator here: per-user running stats PLUS a per-event-type count map —
the (user x type) breakdown the old single-tuple API could only express
by exploding the key. On finite replay the emission equals the batch
``groupBy(user_id, event_type).count`` / ``groupBy(user_id)`` aggregates
(parity-tested; the batch mirrors are the oracle-checked plan family).

Scale: state is RocksDB-backed (transformWithState requires the RocksDB
provider — incremental checkpoints, state larger than heap spills to
local disk), partitioned by user_id across executors; each micro-batch
touches only the keys present in the batch.

Environment note: the transformWithState state-server protocol needs
the ``protobuf`` Python package, which this container does not ship.
Round 10 closes the gap with a vendored minimal pure-Python protobuf
runtime (``vendor/protoshim`` — wire-exact varint/length-delimited
encoding written from the public encoding spec) installed on demand by
``streaming/protoshim_install.ensure_protobuf(spark)``; the e2e parity
test now runs for real against the JVM state server. The processor's
accumulation logic additionally stays unit-tested against fake state.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUT_SCHEMA = (
    "user_id long, event_type string, n_type long, n_events long, "
    "total_value double"
)


class UserTypeStatsProcessor(StatefulProcessor):
    """ValueState totals + MapState per-type counts for one user."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n long, total double")
        self._by_type = handle.getMapState(
            "by_type", "event_type string", "n long"
        )

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = (
            self._totals.get() if self._totals.exists() else (0, 0.0)
        )
        touched: dict[str, int] = {}
        for pdf in rows:
            n += int(len(pdf))
            total += float(pdf["value"].sum())
            for et, c in pdf["event_type"].value_counts().items():
                touched[et] = touched.get(et, 0) + int(c)
        self._totals.update((n, total))
        for et, c in touched.items():
            prev = (
                self._by_type.getValue((et,))[0]
                if self._by_type.containsKey((et,))
                else 0
            )
            self._by_type.updateValue((et,), (prev + c,))
        out = [
            {
                "user_id": key[0],
                "event_type": et,
                "n_type": self._by_type.getValue((et,))[0],
                "n_events": n,
                "total_value": total,
            }
            for et in sorted(touched)
        ]
        yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def user_type_running_stats(events: DataFrame) -> DataFrame:
    """Per-(user, event_type) running counts + per-user running totals
    maintained in typed state; update-mode emission per micro-batch."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTypeStatsProcessor(),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
