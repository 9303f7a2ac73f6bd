"""File-stats manifest pruning: skip whole parquet files from footer
statistics before Spark ever lists them into a scan.

This is the file-level analogue of the row-group skipping Spark's parquet
reader already does from pushed filters, and the same design as an
Iceberg/Delta manifest: every file's footer carries per-column min/max,
so a range predicate can discard files whose [min, max] cannot intersect
it — O(files) footer reads, zero data IO. At 100 TB the stats live in a
catalog/manifest table written at commit time (dq_file_row_distribution
and layout.compaction_groups already consume such listings); reading
footers directly, as here, is the bootstrap path for plain directories.

Reference parity note: the reference engine (OpenBeta/parquet-exporter)
writes single parquet exports (export.py) and has no multi-file scan
planning; this extends the scan surface per SURVEY.md section 2's
extended inventory.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any


@dataclass(frozen=True)
class FileStat:
    path: str
    num_rows: int
    min_value: Any  # None when the footer carries no stats for the column
    max_value: Any


def file_stats(paths: list[str], column: str) -> list[FileStat]:
    """Per-file (num_rows, min, max) for ``column``, from parquet FOOTERS
    only — no data pages are read. Min/max are folded across row groups;
    a file whose footer lacks statistics for the column yields None
    bounds (and is therefore never pruned)."""
    import pyarrow.parquet as pq

    out: list[FileStat] = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        names = md.schema.names
        try:
            ci = names.index(column)
        except ValueError:
            raise KeyError(f"column {column!r} not in {p} (has {names})")
        lo = hi = None
        have_all = True
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci).statistics
            if st is None or not st.has_min_max:
                have_all = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if not have_all:
            lo = hi = None
        out.append(FileStat(p, md.num_rows, lo, hi))
    return out


def prune_by_range(stats: list[FileStat], lo: Any = None, hi: Any = None) -> list[str]:
    """Paths whose [min, max] MAY intersect [lo, hi] (either bound open).

    Conservative on missing stats: a file with no footer stats is kept.
    The caller still applies the residual predicate to the surviving
    files — pruning is a superset guarantee, exactly like partition
    pruning."""
    keep: list[str] = []
    for s in stats:
        if s.min_value is None or s.max_value is None:
            keep.append(s.path)
            continue
        if lo is not None and s.max_value < lo:
            continue
        if hi is not None and s.min_value > hi:
            continue
        keep.append(s.path)
    return keep
