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


def file_stats_distributed(spark, paths: list[str], column: str) -> list[FileStat]:
    """``file_stats`` with the footer reads distributed across executors
    instead of a sequential driver loop: paths become a 1-column
    DataFrame, ``mapInPandas`` opens each file's FOOTER inside tasks
    (Arrow-batched, pyarrow ships with the workers), and only the
    metadata rows — one per file, ~4 small values — come back to the
    driver. At a 200k-file table the driver loop pays 200k sequential
    storage round-trips; this path pays ceil(files / parallelism) per
    task, all in flight at once. The bounded collect is the manifest
    itself (metadata-sized by definition — the same rows
    write_manifested commits at write time, which remains the real
    answer for tables you own the writer of).

    Contract-identical to ``file_stats``: same folding across row
    groups, same None bounds when any row group lacks stats, same
    KeyError on a missing column (re-raised on the driver), and the
    returned list preserves the input path order."""
    from pyspark.sql import functions as F  # noqa: F401  (spark session present)

    def _read_footers(batches):
        # Self-contained closure: the driver's executors may not have this
        # repo importable (neutral cwd, no PYTHONPATH), so referencing the
        # module-level _enc would pickle-by-reference and die with
        # ModuleNotFoundError — caught by the round-10 verify_full replica.
        import pandas as pd
        import pyarrow.parquet as pq

        def _enc(v):
            if v is None:
                return None
            if isinstance(v, bool):
                return "b:1" if v else "b:0"
            if isinstance(v, int):
                return "i:%d" % v
            if isinstance(v, float):
                return "f:" + repr(v)
            if isinstance(v, str):
                return "s:" + v
            if isinstance(v, bytes):
                return "y:" + v.hex()
            import datetime as dt

            if isinstance(v, dt.datetime):
                return "t:" + v.isoformat()
            if isinstance(v, dt.date):
                return "d:" + v.isoformat()
            return "s:" + str(v)

        for b in batches:
            rows = []
            for p in b["path"]:
                md = pq.ParquetFile(p).metadata
                names = md.schema.names
                if column not in names:
                    rows.append((p, -1, None, None, f"column {column!r} not in {p} (has {names})"))
                    continue
                ci = names.index(column)
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
                rows.append((p, md.num_rows, _enc(lo), _enc(hi), None))
            yield pd.DataFrame(
                rows, columns=["path", "num_rows", "min_value", "max_value", "err"]
            )

    if not paths:
        return []
    pdf = spark.createDataFrame([(p,) for p in paths], "path string")
    # one task per ~32 files: footer reads are latency-bound, so small
    # batches keep every core busy without per-task overhead dominating
    n_slices = max(1, min(len(paths) // 32 + 1, spark.sparkContext.defaultParallelism))
    out = (
        pdf.repartition(n_slices)
        .mapInPandas(
            _read_footers,
            "path string, num_rows long, min_value string, max_value string, err string",
        )
        .collect()
    )
    by_path = {}
    for r in out:
        if r.err is not None:
            raise KeyError(r.err)
        by_path[r.path] = FileStat(r.path, r.num_rows, _dec(r.min_value), _dec(r.max_value))
    return [by_path[p] for p in paths]


def _dec(v):
    """Invert the worker-side type-tagged encoding on the driver. The
    encoder lives INSIDE file_stats_distributed's mapInPandas closure
    (self-contained so executors never import this module); the tag set
    here must mirror it: b/i/f/s/y/t/d. Tagging exists because ONE
    string schema carries int, float, string, timestamp and date bounds
    without ambiguity (a string column whose min is '123' must not come
    back as an int)."""
    if v is None:
        return None
    tag, payload = v[0], v[2:]
    if tag == "i":
        return int(payload)
    if tag == "f":
        return float(payload)
    if tag == "s":
        return payload
    if tag == "b":
        return payload == "1"
    if tag == "y":
        return bytes.fromhex(payload)
    import datetime as dt

    if tag == "t":
        return dt.datetime.fromisoformat(payload)
    return dt.date.fromisoformat(payload)


def read_kept(spark, keep: list[str], all_paths: list[str]):
    """Read the pruned file list, guarding the empty case:
    ``spark.read.parquet(*[])`` raises instead of yielding an empty
    DataFrame, so when NO file survives pruning (a predicate outside
    every file's range — legitimate, e.g. 'yesterday' on a table whose
    newest file ends last week) the dataset's real schema is taken from
    one footer and the scan is constant-folded away by PruneFilters
    (filter false -> empty LocalRelation, zero data IO)."""
    from pyspark.sql import functions as F

    if keep:
        return spark.read.parquet(*keep)
    if not all_paths:
        raise ValueError("read_kept: no files at all — cannot derive a schema")
    return spark.read.parquet(all_paths[0]).filter(F.lit(False))


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
