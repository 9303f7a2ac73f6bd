"""Streaming CUSUM drift monitor: an ONLINE two-sided cumulative-sum
level-shift detector over a keyed value stream via applyInPandasWithState.

The batch operator (`timeseries_cusum_shift`, queries/timeseries.py) is
retrospective; an alerting pipeline needs the sequential form Page's
CUSUM was designed as: after a CAL-value calibration window fixes the
target level, every arriving value updates S+ = max(0, S+ + (x - target
- K)) and S- = max(0, S- + (target - x - K)), and an alarm fires when
either side exceeds H — the detector that accumulates many small
one-sided deviations a threshold-per-point monitor (spike_monitor)
structurally misses, which is exactly the drift-vs-spike split.

Cross-engine/replay exactness: the target is the calibration window's
TWO-MIDDLE MEDIAN (the repo's median contract), not its mean — integer
counts make the median an exact binary half, so every d = x - target -
K is exact, every partial sum is exact below 2^52, and max(0, .) of
exact values is exact. That is what lets the batch twin
(`stream_cusum_monitor_twin`) compute the SAME numbers through the
prefix-sum identity S_t = P_t - min(0, min_{j<=t} P_j) instead of the
recursion: in exact arithmetic the two forms are equal bit-for-bit, so
streaming == batch == DuckDB oracle with no tolerance anywhere. A
mean target would break this (71/7 rounds), which is why the median is
load-bearing, not a style choice.

State per key is 5 floats — O(keys), independent of stream length;
arrival order within a micro-batch is pinned by sorting on (ts,
event_id), cross-batch order by file replay order (maxFilesPerTrigger),
the same contract the spike-monitor and token-bucket twins rely on.

Reference parity note: the reference engine (OpenBeta/parquet-exporter)
has no streaming surface (export.py is a one-shot batch export); this
extends the engine per SURVEY.md section 2.2.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CUSUM_CAL = 7  # calibration values fixing the target level
CUSUM_K = 2.0  # per-step slack (exact binary fraction)
CUSUM_H = 12.0  # alarm threshold (exact binary fraction)

CUSUM_OUTPUT_SCHEMA = (
    "event_type string, event_id long, v double, target double, "
    "s_pos double, s_neg double, is_alarm boolean"
)
CUSUM_STATE_SCHEMA = "cal array<double>, target double, s_pos double, s_neg double"


def _two_middle_median(sorted_vals: list[float]) -> float:
    """(s[(n+1)//2] + s[(n+2)//2]) / 2, 1-based — the shared contract."""
    n = len(sorted_vals)
    return (sorted_vals[(n + 1) // 2 - 1] + sorted_vals[(n + 2) // 2 - 1]) / 2


def _update_cusum(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        cal, target, s_pos, s_neg = state.get
        cal = list(cal)
    else:
        cal, target, s_pos, s_neg = [], None, 0.0, 0.0
    out = []
    rows = pd.concat(list(pdfs))
    rows = rows.sort_values(["ts", "event_id"])
    for r in rows.itertuples(index=False):
        v = float(r.v)
        if target is None:
            cal.append(v)
            if len(cal) == CUSUM_CAL:
                target = _two_middle_median(sorted(cal))
            out.append((key[0], int(r.event_id), v, None, None, None, False))
        else:
            d = v - target
            s_pos = max(0.0, s_pos + d - CUSUM_K)
            s_neg = max(0.0, s_neg - d - CUSUM_K)
            alarm = s_pos > CUSUM_H or s_neg > CUSUM_H
            out.append(
                (key[0], int(r.event_id), v, target, s_pos, s_neg, bool(alarm))
            )
    state.update((cal, target, s_pos, s_neg))
    state.setTimeoutDuration(300_000)
    yield pd.DataFrame(
        out,
        columns=[
            "event_type",
            "event_id",
            "v",
            "target",
            "s_pos",
            "s_neg",
            "is_alarm",
        ],
    )


def rolling_cusum_monitor(points: DataFrame) -> DataFrame:
    """points(event_type, event_id, ts, v) stream -> one verdict row per
    point: the two-sided CUSUM statistics and the alarm flag (NULLs
    during the calibration window). Keys idle for 5 minutes are
    evicted."""
    return points.groupBy("event_type").applyInPandasWithState(
        _update_cusum,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
