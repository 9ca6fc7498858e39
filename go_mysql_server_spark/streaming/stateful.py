"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no stateful stream processing at all (SURVEY §2.13); this
is the additive surface for operators that need *arbitrary* per-key state
beyond what window aggregates express — the Structured Streaming equivalent
of a hand-written stateful operator.

State is keyed (user_id), Arrow-batched per group, and partitions across
executors; at 100 TB the state store is RocksDB-backed per-executor and the
only shuffle is the initial hash on the key.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, max_value double"
STATE_SCHEMA = "n bigint, total double, mx double"


def _update_user_state(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum, max) of `value` per user across micro-batches;
    emit the running totals once per batch the user appears in."""
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "max_value": [mx],
        }
    )


def running_user_stats(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Per-user running statistics with explicit keyed state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
