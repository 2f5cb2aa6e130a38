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


ASOF_STATE_SCHEMA = "last_us LONG, last_value DOUBLE, last_event_id LONG"
ASOF_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("asof_ts", T.TimestampType()),
        T.StructField("asof_value", T.DoubleType()),
    ]
)


def asof_enrich(events: DataFrame, right_type: str = "purchase") -> DataFrame:
    """Streaming twin of ``operators.asof.asof_join``: every non-purchase
    event is enriched with the user's most recent preceding purchase.

    State = ONE (ts, value) pair per user — bounded by key cardinality,
    not event volume (contrast a stream-stream join, whose state holds
    every right row inside the watermark horizon). Rows are processed in
    (ts, side) order inside each micro-batch — purchases before other
    events at equal timestamps, matching the batch operator's inclusive
    tie rule; ties between purchases resolve by greatest event_id. The
    batch equivalence holds when arrival order respects event time
    across micro-batches (the usual replay/backfill shape); out-of-order
    late purchases update state for *subsequent* events only — the
    documented streaming relaxation.
    """

    def enrich(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_us, last_value, last_id = (
            state.get if state.exists else (None, None, None)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        is_right = rows["event_type"] == right_type
        # purchases first at equal ts (side 0 < side 1), then event_id so
        # the LAST purchase applied at a given ts is the greatest-id one
        rows = (
            rows.assign(__side=(~is_right).astype("int8"))
            .sort_values(["ts", "__side", "event_id"], kind="mergesort")
        )
        out_event, out_id, out_ts, out_ats, out_val = [], [], [], [], []
        for r in rows.itertuples(index=False):
            if r.event_type == right_type:
                r_us = int(pd.Timestamp(r.ts).value // 1000)
                # Greatest-event_id tie rule must hold ACROSS micro-batches
                # too: a purchase at the same ts as the one already in state
                # only wins if its event_id is greater (within a batch the
                # sort already guarantees this).
                if (
                    last_us is None
                    or r_us > last_us
                    or (
                        r_us == last_us
                        and int(r.event_id) > (-1 if last_id is None else last_id)
                    )
                ):
                    last_us = r_us
                    last_value = float(r.value)
                    last_id = int(r.event_id)
            elif last_us is not None:
                out_id.append(int(r.event_id))
                out_ts.append(r.ts)
                out_ats.append(pd.Timestamp(last_us * 1000))
                out_val.append(last_value)
        if last_us is not None:
            state.update((last_us, last_value, last_id))
        if out_id:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_id),
                    "event_id": out_id,
                    "ts": out_ts,
                    "asof_ts": out_ats,
                    "asof_value": out_val,
                }
            )

    return (
        events.select("user_id", "event_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            enrich,
            outputStructType=ASOF_OUTPUT_SCHEMA,
            stateStructType=ASOF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
