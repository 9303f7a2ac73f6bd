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
    """Attach a ``_zvalue`` Morton key over ``cols`` using EXACT
    percent_rank normalization.

    Raw values are first normalized to dense per-dimension ranks scaled
    into [0, 2^bits), so skewed or unbounded domains (timestamps, ids)
    interleave evenly. percent_rank is a global window — ONE task sorts
    the whole frame, so this form is the exact baseline (and the
    registered layout_zorder_key oracle twin), NOT the write path:
    ``write_zordered`` defaults to ``zorder_key_approx``, whose
    histogram-CDF ranks need no single-partition exchange and equal this
    form exactly on rank-uniform inputs (tested).
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


def zorder_key_approx(
    df: DataFrame, cols: list[str], bits: int = ZBITS, nbins: int = 1024
) -> DataFrame:
    """Attach a ``_zvalue`` Morton key over numeric ``cols`` WITHOUT any
    data-sized single-partition exchange — the 100 TB write path.

    Per-dimension ranks come from a histogram CDF instead of a global
    percent_rank window: one combined min/max aggregate (1 row,
    broadcast), then per dimension an ``nbins``-bucket equi-width count
    (partial-aggregated shuffle to <= nbins rows), a cumulative sum over
    that BOUNDED table, and a broadcast equi-join on bucket id — O(1)
    per row, every exchange either bounded or key-partitioned. Values in
    the same histogram bucket share a rank (resolution = nbins per
    dimension, so `bits` beyond log2(nbins) add nothing for heavily
    skewed bins); on rank-uniform inputs with nbins == 2^bits the keys
    equal zorder_key's exactly (tested). Requires numeric/castable
    dimensions, unlike the exact form which only needs orderable ones.
    The input is scanned once per dimension for the histograms plus once
    for the write — pruned to the z-columns, cheap next to the write
    shuffle; persist upstream if the frame is expensive to produce."""
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder_key_approx supports 1-4 columns")
    out, ranks, scratch = _approx_ranks(df, cols, bits, nbins)
    return out.withColumn("_zvalue", _interleave(ranks, bits)).drop(*scratch)


def _approx_ranks(
    df: DataFrame, cols: list[str], bits: int, nbins: int
) -> tuple[DataFrame, list[Column], list[str]]:
    """Histogram-CDF per-dimension ranks in [0, 2^bits) with no
    data-sized single-partition exchange — the shared scale path under
    both curve keys (``zorder_key_approx`` interleaves them into a
    Morton key; ``hilbert_key_approx`` folds them through the Hilbert
    transform). Returns (frame-with-rank-columns, rank column refs,
    scratch column names for the caller to drop)."""
    hi = (1 << bits) - 1
    bounds = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
            )
        ]
    )
    out = df.join(F.broadcast(bounds))
    ranks = []
    for c in cols:
        lo_c, hi_c = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        # NULL dims land in bucket 0, below every value — the NULLS FIRST
        # position percent_rank gives them — instead of dropping at the
        # bucket equi-join.
        bin_c = F.coalesce(
            F.when(hi_c > lo_c, F.least(
                F.width_bucket(F.col(c).cast("double"), lo_c, hi_c, F.lit(nbins)),
                F.lit(nbins),
            )).otherwise(F.lit(1)),
            F.lit(0),
        )
        out = out.withColumn(f"__bin_{c}", bin_c)
        cdf = (
            out.groupBy(f"__bin_{c}")
            .agg(F.count(F.lit(1)).alias("__n"))
            .withColumn(
                "__below",
                F.coalesce(
                    F.sum("__n").over(
                        Window.orderBy(f"__bin_{c}").rowsBetween(
                            Window.unboundedPreceding, -1
                        )
                    ),
                    F.lit(0),
                ),
            )
            .withColumn(
                "__total",
                F.sum("__n").over(
                    Window.rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                ),
            )
            .select(
                f"__bin_{c}",
                F.least(
                    F.floor(
                        F.col("__below") / F.col("__total") * (hi + 1)
                    ).cast("long"),
                    F.lit(hi).cast("long"),
                ).alias(f"__rank_{c}"),
            )
        )
        out = out.join(F.broadcast(cdf), f"__bin_{c}")
        ranks.append(F.col(f"__rank_{c}"))
    scratch = [f"__{p}_{c}" for c in cols for p in ("lo", "hi", "bin", "rank")]
    return out, ranks, scratch


def hilbert_key_approx(
    df: DataFrame, cols: list[str], bits: int = ZBITS, nbins: int = 1024
) -> DataFrame:
    """Attach a ``_hvalue`` Hilbert key over exactly two numeric ``cols``
    WITHOUT any data-sized single-partition exchange — the 100 TB write
    path behind ``write_hilberted``, composing the histogram-CDF ranks
    (``_approx_ranks``, shared with ``zorder_key_approx``) with the
    all-integer Hilbert fold (``_hilbert_d``). Same rank resolution
    caveats as the Morton approx form; on rank-uniform inputs with
    nbins == 2^bits the keys equal ``hilbert_key``'s exactly (tested)."""
    if len(cols) != 2:
        raise ValueError("hilbert_key_approx supports exactly 2 columns")
    out, ranks, scratch = _approx_ranks(df, cols, bits, nbins)
    return out.withColumn("_hvalue", _hilbert_d(ranks[0], ranks[1], bits)).drop(
        *scratch
    )


def compaction_groups(
    stats: DataFrame,
    target_rows: int,
    partition_col: str = "partition_dir",
    order_col: str = "file_name",
    rows_col: str = "n_rows",
) -> DataFrame:
    """Greedy contiguous bin-packing of per-file stats into compaction
    groups of ~``target_rows``: within each partition, files are taken in
    ``order_col`` order and a file joins group floor(rows_before /
    target) — the same strategy Spark's scan uses to coalesce small
    files into maxPartitionBytes-sized splits, expressed over the
    LISTING instead of the data. Input is one row per file (bounded by
    file count, never data-sized: the shape dq_file_row_distribution
    emits), so every window here is over a partition's file list.
    Output adds ``compact_group`` and the group's planned total
    ``group_rows``; a group may overshoot the target by at most one
    file (greedy-prefix packing), which is the correct bias for
    compaction — merging too much beats leaving stubs."""
    w_before = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grouped = stats.withColumn(
        "compact_group",
        F.floor(
            F.coalesce(F.sum(rows_col).over(w_before), F.lit(0))
            / F.lit(target_rows)
        ).cast("long"),
    )
    w_group = Window.partitionBy(partition_col, "compact_group")
    return grouped.withColumn(
        "group_rows", F.sum(rows_col).over(w_group).cast("long")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    mode: str = "overwrite",
    exact: bool = False,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of ``cols``:
    range-partition by the Morton key into ``n_files`` tasks, sort within
    each, drop the key, write. Readers need no special support — pushed
    conjunctive predicates skip non-overlapping row groups via ordinary
    parquet statistics. Defaults to the scale-safe approximate key
    (``zorder_key_approx``); ``exact=True`` restores the percent_rank
    form, whose global window single-partitions the frame — only for
    bounded inputs."""
    keyed = zorder_key(df, cols) if exact else zorder_key_approx(df, cols)
    (
        keyed.repartitionByRange(n_files, "_zvalue")
        .sortWithinPartitions("_zvalue")
        .drop("_zvalue")
        .write.mode(mode)
        .parquet(path)
    )


def write_hilberted(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    mode: str = "overwrite",
    exact: bool = False,
    manifest_col: str | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the 2-D HILBERT curve of
    ``cols`` — the documented DEFAULT for two-dimensional layout: the
    round-10 skip-tightness measurement (pinned in
    tests/test_round10_ops.py) found Hilbert files cover 0.66x the
    bounding-box area and box scans touch 0.74x the files vs Morton on
    the same data, because every unit step along the Hilbert curve
    moves one grid cell while Morton jumps across power-of-two seams
    (the reason Delta's OPTIMIZE switched its default curve). Use
    ``write_zordered`` only for 3-4 dimensions, which the 2-D Hilbert
    transform doesn't cover.

    Same contract as ``write_zordered``: range-partition by the curve
    key into ``n_files`` tasks, sort within each, drop the key, write;
    readers need no special support. Defaults to the scale-safe
    ``hilbert_key_approx`` (histogram-CDF ranks, no data-sized
    single-partition exchange); ``exact=True`` restores the
    percent_rank form for bounded inputs. ``manifest_col`` additionally
    commits the ``_manifest.parquet`` stats manifest on that column
    (the write_manifested path) so range predicates on it plan file
    subsets from metadata alone — the curve clusters BOTH dimensions,
    so either makes a selective manifest."""
    keyed = hilbert_key(df, cols) if exact else hilbert_key_approx(df, cols)
    (
        keyed.repartitionByRange(n_files, "_hvalue")
        .sortWithinPartitions("_hvalue")
        .drop("_hvalue")
        .write.mode(mode)
        .parquet(path)
    )
    if manifest_col is not None:
        from parquet_exporter_spark.sinks.manifest_sink import refresh_manifest

        refresh_manifest(path, manifest_col)


def _hilbert_d(x: Column, y: Column, bits: int) -> Column:
    """2-D Hilbert curve index of integer grid point (x, y), both in
    [0, 2^bits): the canonical iterative xy2d transform (quadrant digit
    (3*rx) XOR ry, then flip-within-n + swap on the lower half) as a
    runtime HOF fold over an [x, y, d] state array — NOT a Python-level
    unroll: substituting each level's x/y into the next level's
    expressions doubles the Catalyst tree per level (2^bits copies of
    the rank subexpression; the same blowup the k-core oracle's
    MATERIALIZED CTEs exist to prevent, and it OOMs the driver at
    bits=8), while the fold keeps ONE O(1)-size expression evaluated
    iteratively per row. All-integer arithmetic (s = 2^lev via exact
    double pow below 2^53, division by a power of two exact), identical
    term-for-term to the DuckDB oracle's chained CTEs, so the key is
    hash-exact cross-engine. Property-tested bijective onto [0, 4^bits)
    with ZERO adjacency violations (consecutive indices are always
    4-neighbors) — the locality guarantee Z-order lacks: Morton order
    jumps across the grid at every power-of-two seam, Hilbert never
    does."""
    n = 1 << bits

    def step(acc: Column, lev: Column) -> Column:
        xs = F.element_at(acc, 1)
        ys = F.element_at(acc, 2)
        ds = F.element_at(acc, 3)
        s = F.pow(F.lit(2.0), lev.cast("double")).cast("long")
        rx = (F.floor(xs / s) % 2).cast("long")
        ry = (F.floor(ys / s) % 2).cast("long")
        d2 = ds + s * s * (rx * 3).bitwiseXOR(ry)
        x2 = F.when(ry == 0, F.when(rx == 1, F.lit(n - 1) - ys).otherwise(ys)).otherwise(xs)
        y2 = F.when(ry == 0, F.when(rx == 1, F.lit(n - 1) - xs).otherwise(xs)).otherwise(ys)
        return F.array(x2, y2, d2)

    state = F.aggregate(
        F.sequence(F.lit(bits - 1), F.lit(0), F.lit(-1)),
        F.array(x.cast("long"), y.cast("long"), F.lit(0).cast("long")),
        step,
    )
    return F.element_at(state, 3)


def hilbert_key(df: DataFrame, cols: list[str], bits: int = ZBITS) -> DataFrame:
    """Attach a ``_hvalue`` 2-D Hilbert clustering key over ``cols``
    (exactly two), percent_rank-normalized like ``zorder_key``. Same
    role as the Morton key — range-partition + sort by it before the
    write — but with strictly better locality: every unit step along
    the curve moves ONE grid cell, so a file of W consecutive curve
    positions covers a ~sqrt(W) x sqrt(W) box in BOTH dimensions,
    while Morton runs contain power-of-two seams that stretch a file's
    bounding box across half the grid (that bbox is exactly what
    file/row-group min-max skipping prunes on). Delta's OPTIMIZE
    switched its default curve to Hilbert for the same reason. The
    exact percent_rank form is the oracle twin; the write path
    (``write_hilberted``) composes the same fold with
    ``hilbert_key_approx``'s histogram-CDF ranks exactly as
    write_zordered does."""
    if len(cols) != 2:
        raise ValueError("hilbert_key supports exactly 2 columns")
    hi = (1 << bits) - 1
    ranks = [
        F.least(
            F.floor(F.percent_rank().over(Window.orderBy(c)) * (hi + 1)).cast("long"),
            F.lit(hi).cast("long"),
        )
        for c in cols
    ]
    return df.withColumn("_hvalue", _hilbert_d(ranks[0], ranks[1], bits))
