"""Streaming spike monitor: an ONLINE Hampel filter over a keyed value
stream via applyInPandasWithState.

The batch operator (`timeseries_hampel_outliers`, queries/timeseries.py)
uses a CENTERED +-3-point rolling median/MAD — the right retrospective
form, but it needs future points, so a stream cannot compute it at
arrival time. The online form is the causal variant every alerting
pipeline actually runs: test each arriving value against the median/MAD
of the TRAILING window of the previous W values (the tested value is
excluded from its own window, so a spike cannot inflate the threshold
that judges it — the property that makes Hampel beat mean/stddev
monitors). `stream_spike_monitor_twin` (queries/streaming.py) is the
batch-replay twin with the identical trailing contract, oracle-checked
against DuckDB; the streaming operator is proven equal to it on
replayed micro-batches in tests/test_streaming.py.

State per key is W floats (W=7) — O(keys x W) total, the
applyInPandasWithState sweet spot; arrival order within a micro-batch
is pinned by sorting on (ts, event_id) inside the update function, and
cross-batch order holds because the source replays files in order
(maxFilesPerTrigger), the same contract the token-bucket twin relies
on.

Reference parity note: the reference engine (OpenBeta/parquet-exporter)
has no streaming surface (export.py is a one-shot batch export); this
extends the engine per SURVEY.md section 2.2.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SPIKE_WINDOW = 7
SPIKE_K = 3.0
_MAD_SIGMA = 1.4826

SPIKE_OUTPUT_SCHEMA = (
    "event_type string, event_id long, v double, med double, mad double, "
    "is_spike boolean"
)
SPIKE_STATE_SCHEMA = "hist array<double>"


def _two_middle_median(sorted_vals: list[float]) -> float:
    """The cross-engine median contract: (s[(n+1)//2] + s[(n+2)//2]) / 2
    with 1-based indexing — identical arithmetic to the batch twin's SQL
    and Spark expression forms, so streaming == batch bit-for-bit."""
    n = len(sorted_vals)
    lo = sorted_vals[(n + 1) // 2 - 1]
    hi = sorted_vals[(n + 2) // 2 - 1]
    return (lo + hi) / 2


def _update_spikes(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    hist: list[float] = list(state.get[0]) if state.exists else []
    out = []
    rows = pd.concat(list(pdfs))
    # Pin intra-batch order; cross-batch order comes from file replay order.
    rows = rows.sort_values(["ts", "event_id"])
    for r in rows.itertuples(index=False):
        v = float(r.v)
        if len(hist) >= SPIKE_WINDOW:
            win = sorted(hist[-SPIKE_WINDOW:])
            med = _two_middle_median(win)
            mad = _two_middle_median(sorted(abs(x - med) for x in win))
            spike = mad > 0 and abs(v - med) > SPIKE_K * _MAD_SIGMA * mad
            out.append((key[0], int(r.event_id), v, med, mad, bool(spike)))
        else:
            out.append((key[0], int(r.event_id), v, None, None, False))
        hist.append(v)
        if len(hist) > SPIKE_WINDOW:
            hist = hist[-SPIKE_WINDOW:]
    state.update((hist,))
    state.setTimeoutDuration(300_000)
    yield pd.DataFrame(
        out, columns=["event_type", "event_id", "v", "med", "mad", "is_spike"]
    )


def rolling_spike_monitor(points: DataFrame) -> DataFrame:
    """points(event_type, event_id, ts, v) stream -> one verdict row per
    point: trailing-window median/MAD and the Hampel spike flag. Keys
    idle for 5 minutes are evicted (dead series hold no state
    forever)."""
    return points.groupBy("event_type").applyInPandasWithState(
        _update_spikes,
        outputStructType=SPIKE_OUTPUT_SCHEMA,
        stateStructType=SPIKE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
