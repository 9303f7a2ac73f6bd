"""Z-order (Morton-curve) data layout for multi-dimensional file skipping.

Partitioning prunes on ONE column hierarchy; sorting clusters on ONE sort
prefix. A 100 TB fact table queried by *several* columns at once (e.g.
``user_id`` AND event time) needs multi-dimensional clustering: map each
row to a point on a space-filling curve, range-partition + sort by the
curve value, and write. Rows close in ALL dimensions land in the same
files, so parquet min/max row-group stats (and file-level stats) let a
conjunctive box predicate skip most of the data at scan time — the same
technique Delta/Iceberg expose as OPTIMIZE ZORDER BY.

Everything here is JVM-side column arithmetic (rank windows + bit
interleave via shiftleft/bitwise-or), so the layout pass is one extra
shuffle over the write — no Python in the hot path.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ZBITS = 16  # bits kept per dimension; 16 bits x up to 4 dims fits a long


def _interleave(ranks: list[Column], bits: int = ZBITS) -> Column:
    """Bit-interleave per-dimension ranks into one Morton key."""
    ndims = len(ranks)
    parts = []
    for d, r in enumerate(ranks):
        for b in range(bits):
            # bit b of dimension d lands at position b*ndims + d
            parts.append(
                F.shiftleft(F.shiftright(r, b).bitwiseAND(F.lit(1)), b * ndims + d)
            )
    return functools.reduce(lambda a, c: a.bitwiseOR(c), parts)


def zorder_key(df: DataFrame, cols: list[str], bits: int = ZBITS) -> DataFrame:
    """Attach a ``_zvalue`` Morton key over ``cols``.

    Raw values are first normalized to dense per-dimension ranks scaled
    into [0, 2^bits), so skewed or unbounded domains (timestamps, ids)
    interleave evenly. percent_rank is a window over the whole frame —
    at cluster scale swap it for approxQuantile-derived bucket bounds to
    avoid the single-partition window; the interleave stays identical.
    """
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder_key supports 1-4 columns")
    hi = (1 << bits) - 1
    ranks = [
        F.least(
            F.floor(
                F.percent_rank().over(Window.orderBy(c)) * (hi + 1)
            ).cast("long"),
            F.lit(hi).cast("long"),
        )
        for c in cols
    ]
    return df.withColumn("_zvalue", _interleave(ranks, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of ``cols``:
    range-partition by the Morton key into ``n_files`` tasks, sort within
    each, drop the key, write. Readers need no special support — pushed
    conjunctive predicates skip non-overlapping row groups via ordinary
    parquet statistics."""
    keyed = zorder_key(df, cols)
    (
        keyed.repartitionByRange(n_files, "_zvalue")
        .sortWithinPartitions("_zvalue")
        .drop("_zvalue")
        .write.mode(mode)
        .parquet(path)
    )
