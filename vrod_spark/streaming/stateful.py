"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.3: "applyInPandasWithState for custom stateful operators").

The state store holds one row per key; each micro-batch delivers that
key's new rows as Arrow batches and the operator updates its state —
this is the escape hatch for stateful logic the built-in windowed
aggregations can't express (running totals with custom emit policy,
per-entity anomaly flags, cross-batch counters).

Scale notes: state is partitioned by the grouping key across the state
store (RocksDB/HDFS-backed on a cluster); the operator must keep state
O(1) per key — these examples store two numbers per user.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_TOTALS_OUTPUT = "user_id bigint, n_events bigint, total_value double"
USER_TOTALS_STATE = "n bigint, v double"


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user event count + value total, re-emitted every
    micro-batch a user appears in (update mode). The cross-batch state is
    exactly two numbers per user.

    The update function is deliberately a CLOSURE: cloudpickle serializes
    closures by value, so Python workers never need ``vrod_spark`` on
    their import path. A module-level function would pickle by reference
    and break on any deployment where the package isn't installed on the
    workers (caught live by a driver-simulation run from outside the
    repo)."""

    def update_user_totals(key, pdfs, state: GroupState):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].fillna(0.0).sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(v, 4)]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_user_totals,
            outputStructType=USER_TOTALS_OUTPUT,
            stateStructType=USER_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
