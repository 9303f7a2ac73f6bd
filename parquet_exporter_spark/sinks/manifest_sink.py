"""Manifest-emitting clustered writer: the write-side half of
manifest/file-stats pruning (sources/manifest.py is the read side).

``write_manifested`` range-clusters a DataFrame on one column into
tightly-bounded files and commits a ``_manifest.parquet`` next to the
data holding each file's (name, rows, min, max) — gathered from the
just-written parquet FOOTERS, O(files) metadata IO. Readers then plan
file subsets from the manifest without touching any footer or data page
(``prune_with_manifest``). The underscore prefix keeps the manifest
invisible to Spark's data-file discovery, the same convention that hides
``_SUCCESS``.

This is the Iceberg/Delta commit pattern reduced to its analytics core:
stats are produced AT WRITE TIME by the writer that already knows the
files, so scan planning never pays a per-file round trip. At 100 TB the
manifest itself is a table (thousands of rows — one per file), read once
per query plan; the footer-walking path in sources/manifest.file_stats
remains the bootstrap for directories nobody manifested.

Reference parity note: the reference engine (OpenBeta/parquet-exporter,
export.py:238-242) writes single-file exports and has no multi-file scan
planning; this extends the sink surface per SURVEY.md section 2's
extended inventory.
"""

from __future__ import annotations

import glob
import os
from typing import Any

from pyspark.sql import DataFrame

from parquet_exporter_spark.sources.manifest import FileStat, file_stats, prune_by_range

MANIFEST_NAME = "_manifest.parquet"


def write_manifested(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int,
    mode: str = "overwrite",
) -> list[FileStat]:
    """Write ``df`` as ``n_files`` parquet files range-clustered and
    sorted on ``cluster_col``, then commit the stats manifest. Returns
    the manifest entries. Clustering is what makes the manifest
    selective: repartitionByRange gives each file a disjoint value
    range, so a range predicate prunes to O(matching) files."""
    (
        df.repartitionByRange(n_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .parquet(path)
    )
    return refresh_manifest(path, cluster_col)


def refresh_manifest(path: str, cluster_col: str) -> list[FileStat]:
    """(Re)build ``_manifest.parquet`` for the data files under ``path``
    from their footers. Local-FS implementation — in production the
    writer's commit protocol appends these rows to the manifest table
    instead of re-listing the directory."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    data_files = sorted(
        p
        for p in glob.glob(os.path.join(path, "*.parquet"))
        if not os.path.basename(p).startswith("_")
    )
    stats = file_stats(data_files, cluster_col)
    table = pa.table(
        {
            "file_name": [os.path.basename(s.path) for s in stats],
            "num_rows": [s.num_rows for s in stats],
            "min_value": [s.min_value for s in stats],
            "max_value": [s.max_value for s in stats],
        }
    )
    # Atomic commit: write to a temp name in the same directory, then
    # os.replace over MANIFEST_NAME — a concurrent read_manifest sees
    # either the old complete manifest or the new one, never a torn
    # half-written file (same-filesystem rename is atomic on POSIX).
    final = os.path.join(path, MANIFEST_NAME)
    tmp = final + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, final)
    return stats


def read_manifest(path: str) -> list[FileStat]:
    """Manifest rows as FileStats with paths resolved under ``path``.
    One small parquet read — no data-file footers are touched."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(path, MANIFEST_NAME))
    rows = t.to_pylist()
    return [
        FileStat(
            os.path.join(path, r["file_name"]),
            r["num_rows"],
            r["min_value"],
            r["max_value"],
        )
        for r in rows
    ]


def prune_with_manifest(path: str, lo: Any = None, hi: Any = None) -> list[str]:
    """File paths under ``path`` that may satisfy cluster_col in
    [lo, hi], planned purely from the committed manifest. Same superset
    guarantee as footer pruning: the caller applies the residual
    predicate to the surviving files."""
    return prune_by_range(read_manifest(path), lo=lo, hi=hi)


# ---------------------------------------------------------------------------
# Versioned snapshots: time travel over the manifest (Iceberg's snapshot
# log reduced to its analytics core). Each commit freezes the CURRENT
# data-file listing + stats as an immutable `_manifest.v{N}.parquet`;
# `_manifest_current` is a version-hint file flipped atomically AFTER the
# snapshot lands, so a reader resolves "current" or any historical N with
# one metadata read and never observes a torn commit. Time-travel reads
# plan against the file SET of that version — files added later are
# invisible, exactly Iceberg's snapshot isolation — and require the
# referenced files to still exist (no vacuum here; production pairs this
# with a retention policy before deleting data files).

VERSION_HINT = "_manifest_current"


def _snapshot_name(version: int) -> str:
    return f"_manifest.v{version}.parquet"


def manifest_versions(path: str) -> list[int]:
    """Committed snapshot versions under ``path``, ascending."""
    import re

    out = []
    for p in glob.glob(os.path.join(path, "_manifest.v*.parquet")):
        m = re.fullmatch(r"_manifest\.v(\d+)\.parquet", os.path.basename(p))
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def current_manifest_version(path: str) -> int | None:
    """The committed current version, or None before the first commit."""
    hint = os.path.join(path, VERSION_HINT)
    if not os.path.isfile(hint):
        return None
    with open(hint) as f:
        return int(f.read().strip())


def commit_snapshot(path: str, cluster_col: str) -> int:
    """Freeze the current data-file listing + stats as the next manifest
    version and flip the current pointer to it. Returns the new version.
    Commit order is the crash-safe one: snapshot file first (temp +
    rename), THEN the hint (temp + rename) — a crash between the two
    leaves an orphan snapshot and an older current, never a dangling
    pointer. Also refreshes the unversioned `_manifest.parquet` so
    non-time-travel readers (prune_with_manifest) keep working."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    data_files = sorted(
        p
        for p in glob.glob(os.path.join(path, "*.parquet"))
        if not os.path.basename(p).startswith("_")
    )
    stats = file_stats(data_files, cluster_col)
    table = pa.table(
        {
            "file_name": [os.path.basename(s.path) for s in stats],
            "num_rows": [s.num_rows for s in stats],
            "min_value": [s.min_value for s in stats],
            "max_value": [s.max_value for s in stats],
        }
    )
    version = (current_manifest_version(path) or 0) + 1
    snap = os.path.join(path, _snapshot_name(version))
    tmp = snap + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, snap)
    # keep the unversioned manifest in lockstep (same atomic pattern)
    cur = os.path.join(path, MANIFEST_NAME)
    tmp = cur + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, cur)
    hint = os.path.join(path, VERSION_HINT)
    tmp = hint + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, hint)
    return version


def read_manifest_version(path: str, version: int | None = None) -> list[FileStat]:
    """Manifest rows of snapshot ``version`` (current when None) as
    FileStats with paths resolved under ``path``. Raises
    FileNotFoundError for a version that was never committed."""
    import pyarrow.parquet as pq

    if version is None:
        version = current_manifest_version(path)
        if version is None:
            raise FileNotFoundError(f"no manifest snapshot committed under {path}")
    snap = os.path.join(path, _snapshot_name(version))
    if not os.path.isfile(snap):
        raise FileNotFoundError(snap)
    rows = pq.read_table(snap).to_pylist()
    return [
        FileStat(
            os.path.join(path, r["file_name"]),
            r["num_rows"],
            r["min_value"],
            r["max_value"],
        )
        for r in rows
    ]


def prune_with_manifest_version(
    path: str, version: int | None = None, lo: Any = None, hi: Any = None
) -> list[str]:
    """Range-prune against snapshot ``version``'s file set: the as-of
    query plan. Files appended after that commit are invisible by
    construction — snapshot isolation, not just pruning."""
    return prune_by_range(read_manifest_version(path, version), lo=lo, hi=hi)
