"""Custom stateful streaming operator via applyInPandasWithState:
a per-user running aggregate (count + sum + exponential moving average of
`value`) maintained across micro-batches, with processing-time timeout to
evict idle users — the SURVEY section-2 "custom stateful operator" slot.

State is partitioned by user_id across executors; the timeout bounds state
size, which is what makes the operator safe on an unbounded 100 TB/day
stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total double, ema double"
STATE_SCHEMA = "n_events long, total double, ema double"

EMA_ALPHA = 0.2


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        n, total, ema = state.get
    else:
        n, total, ema = 0, 0.0, None
    for pdf in pdfs:
        for v in pdf["value"]:
            n += 1
            total += float(v)
            ema = float(v) if ema is None else EMA_ALPHA * float(v) + (1 - EMA_ALPHA) * ema
    state.update((n, total, ema))
    state.setTimeoutDuration(60_000)  # evict after 60 s idle
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total": [total], "ema": [ema]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """events(user_id, value, ...) stream -> per-user running stats,
    emitted once per micro-batch per active user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# Caveat discovered in testing: with ProcessingTimeTimeout the engine keeps
# scheduling micro-batches to evaluate pending state timeouts, so
# StreamingQuery.processAllAvailable() never observes an idle stream for
# this operator — callers should poll the sink (or use awaitTermination
# with their own completion condition) instead.
