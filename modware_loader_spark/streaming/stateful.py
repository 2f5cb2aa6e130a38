"""Custom stateful streaming operator via ``applyInPandasWithState``:
a per-user running profile (event count, value sum, max value) maintained
across micro-batches — the pattern for stateful logic Spark's built-in
windows can't express (reference has no streaming; extension scope).

State design for scale: one state row per user (bounded by key
cardinality, not event volume); a processing-time timeout would evict
idle keys in production (omitted here — the tests use bounded feeds).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = "count LONG, total DOUBLE, max_value DOUBLE"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def user_profiles(events: DataFrame) -> DataFrame:
    """Streaming per-user profile, state carried across micro-batches.

    The update function is nested so cloudpickle serializes it BY VALUE —
    a module-level function pickles by reference and executors whose
    Python path lacks this package die with ModuleNotFoundError (bitten
    once: any caller outside the repo root).
    """

    def update_profile(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            count, total, max_value = state.get
        else:
            count, total, max_value = 0, 0.0, float("-inf")
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                max_value = max(max_value, float(pdf["value"].max()))
        state.update((count, total, max_value))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [count],
                "total_value": [round(total, 6)],
                "max_value": [max_value],
            }
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
