"""Streaming drift monitor: per-micro-batch Population Stability Index
against a static reference histogram.

The batch form (`dq_drift_psi`, queries/dq.py) compares two halves of a
static table; in production the same monitor runs ON the ingest stream —
every micro-batch is binned with the SAME pre-agreed edges as the
reference histogram (computed offline, e.g. from the previous corpus
snapshot) and scored. A PSI spike is the early-warning signal that the
incoming data no longer looks like what the model was trained on.

Shape at scale: the per-batch work is one equal-width-bin aggregate with
map-side partial counts — the only rows that ever leave executors are
the n_bins histogram rows, so the monitor's cost is one narrow pass over
each micro-batch regardless of batch size. The PSI arithmetic itself
runs driver-side over n_bins numbers (bounded, not data-sized).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bin_index(value: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Equal-width bin index with edge clamping — identical arithmetic to
    the batch dq_drift_psi operator."""
    raw = F.floor((value - F.lit(lo)) / F.lit((hi - lo) / n_bins)).cast("int")
    return F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw))


def histogram(
    df: DataFrame, value_col: str, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """(bin, n) counts of `value_col` under the fixed edges."""
    return df.groupBy(
        bin_index(F.col(value_col), lo, hi, n_bins).alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))


def histogram_dict(
    df: DataFrame, value_col: str, lo: float, hi: float, n_bins: int
) -> dict[int, int]:
    """Reference-side helper: collect the (bounded, n_bins-row) histogram.

    Contract: call ONCE per reference snapshot and pass the resulting
    dict to ``monitor_drift`` — never call this inside ``foreachBatch``,
    which would rescan the (potentially huge) reference table every
    micro-batch. The monitor deliberately takes the plain dict, not the
    DataFrame, so the reference scan cost cannot silently move into the
    per-batch path."""
    return {r["bin"]: r["n"] for r in histogram(df, value_col, lo, hi, n_bins).collect()}


def psi(ref: dict[int, int], cur: dict[int, int], n_bins: int, eps: float = 0.5) -> float:
    """Laplace-smoothed PSI between two histograms over the same bins."""
    t_ref = sum(ref.values()) + eps * n_bins
    t_cur = sum(cur.values()) + eps * n_bins
    total = 0.0
    for b in range(n_bins):
        p_ref = (ref.get(b, 0) + eps) / t_ref
        p_cur = (cur.get(b, 0) + eps) / t_cur
        total += (p_cur - p_ref) * math.log(p_cur / p_ref)
    return total


def monitor_drift(
    stream_df: DataFrame,
    reference: dict[int, int],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    results: list,
    eps: float = 0.5,
    alert_threshold: float = 0.2,
):
    """Start a foreachBatch monitor scoring every micro-batch against the
    reference histogram. Appends (batch_id, n_rows, psi, alert) tuples to
    `results`. Returns the StreamingQuery.

    Only the n_bins aggregated histogram rows are collected per batch —
    the batch data itself never reaches the driver. `alert_threshold`
    follows the industry convention (PSI > 0.2 = significant shift).
    """

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        cur = {
            r["bin"]: r["n"]
            for r in histogram(batch_df, value_col, lo, hi, n_bins).collect()
        }
        n_rows = sum(cur.values())
        if n_rows == 0:
            return
        score = psi(reference, cur, n_bins, eps)
        results.append((batch_id, n_rows, score, score > alert_threshold))

    return stream_df.writeStream.foreachBatch(on_batch).start()
