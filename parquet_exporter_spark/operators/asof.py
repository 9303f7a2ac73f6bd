"""As-of join: for each left row, the latest right row with
``right.time <= left.time`` on the same key.

Spark has no native as-of join (SURVEY.md section 2.2). The naive
composition — inequality join then ``row_number() = 1`` — materializes every
candidate match before discarding all but one; on 100 TB of events against
years of orders that intermediate is quadratic in the worst case.

This implementation uses the union-window form instead, which is the
scalable shape: tag both sides, union, and carry the right payload forward
with ``last(..., ignorenulls=True)`` over a window partitioned by key and
ordered by (time, side). Cost is one shuffle of |L| + |R| rows and a
per-partition sort — linear, skew-handled by AQE, no join blowup.

Tie semantics: a right row at exactly left.time IS visible (sorted before
the left row via the side column), matching ``ON left.t >= right.t`` in
DuckDB's ASOF JOIN. Duplicate right rows per (key, time) must be
pre-aggregated by the caller to make the result deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 0 = right (visible first at equal times), 1 = left


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join; payload columns are NULL when no prior (backward)
    or following (forward) right row.

    direction="backward": latest right row with right.t <= left.t (the
    default, DuckDB ``ASOF JOIN ... >=`` semantics). direction="forward":
    earliest right row with right.t >= left.t — same single-shuffle
    union-window shape with the window direction reversed (first
    ignorenulls over [current, unbounded following]) and the side order
    flipped so an equal-time right row stays visible.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if direction == "forward":
        return _asof_forward(
            left, right, left_key, right_key, left_time, right_time, payload_cols
        )
    left_cols = left.columns
    l = left.withColumn(_SIDE, F.lit(1)).select(
        F.col(left_key).alias("__key"),
        F.col(left_time).alias("__t"),
        F.col(_SIDE),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
    )
    r = right.withColumn(_SIDE, F.lit(0)).select(
        F.col(right_key).alias("__key"),
        F.col(right_time).alias("__t"),
        F.col(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c) for c in payload_cols],
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t"), F.col(_SIDE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[F.col(c) for c in left_cols],
        F.col(_SIDE),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols],
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """Nearest-direction as-of join: each left row takes the right row whose
    time is closest in either direction; ties go backward (the earlier row).

    ``left_time``/``right_time`` must be NUMERIC (cast timestamps to epoch
    micros first) — nearest needs arithmetic on the axis, and numeric order
    lets both directions run as RANGE frames over one union:

    - backward = ``last(payload, ignorenulls)`` over
      ``RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW``
    - forward = ``first(payload, ignorenulls)`` over
      ``RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING``

    A RANGE frame anchored at the current ORDER BY value sees every row at
    an equal time regardless of row order, so no side-tag tiebreak column is
    needed. Both frames share one partitioning and sort — a single shuffle
    of |L| + |R| rows, no candidate-pair blowup (same scalability argument
    as the directional forms above).
    """
    left_cols = left.columns
    l = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(True).alias("__is_left"),
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
    )
    r = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(False).alias("__is_left"),
        F.col(right_time).alias("__rt"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c) for c in payload_cols],
    )
    unioned = l.unionByName(r)
    wb = (
        Window.partitionBy("__key")
        .orderBy("__t")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("__key")
        .orderBy("__t")
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.select(
        *[F.col(c) for c in left_cols],
        F.col("__is_left"),
        F.col("__t"),
        F.last("__rt", ignorenulls=True).over(wb).alias("__bt"),
        F.first("__rt", ignorenulls=True).over(wf).alias("__ft"),
        *[F.last(c, ignorenulls=True).over(wb).alias(f"__b_{c}") for c in payload_cols],
        *[F.first(c, ignorenulls=True).over(wf).alias(f"__f_{c}") for c in payload_cols],
    )
    use_back = F.col("__ft").isNull() | (
        F.col("__bt").isNotNull()
        & ((F.col("__t") - F.col("__bt")) <= (F.col("__ft") - F.col("__t")))
    )
    return filled.filter(F.col("__is_left")).select(
        *[F.col(c) for c in left_cols],
        *[
            F.when(use_back, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")).alias(c)
            for c in payload_cols
        ],
    )


def _asof_forward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    # left side = 0 so at equal times the left row precedes the right row
    # and the [current, following] window still sees it
    left_cols = left.columns
    l = left.withColumn(_SIDE, F.lit(0)).select(
        F.col(left_key).alias("__key"),
        F.col(left_time).alias("__t"),
        F.col(_SIDE),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
    )
    r = right.withColumn(_SIDE, F.lit(1)).select(
        F.col(right_key).alias("__key"),
        F.col(right_time).alias("__t"),
        F.col(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c) for c in payload_cols],
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t"), F.col(_SIDE))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.select(
        *[F.col(c) for c in left_cols],
        F.col(_SIDE),
        *[F.first(c, ignorenulls=True).over(w).alias(c) for c in payload_cols],
    )
    return filled.filter(F.col(_SIDE) == 0).drop(_SIDE)
