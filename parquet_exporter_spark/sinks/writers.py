"""Sinks: Parquet (snappy/gzip/zstd), JSON, CSV, partitioned layouts.

Reference parity: the COPY ... (FORMAT PARQUET, COMPRESSION ...) sink
(/root/reference/export.py:238-242, config.yaml:13) and the JSON dump
(parquet2json.py:40). Beyond parity, partitioned/bucketed writes are the
100 TB layout primitives: partitionBy gives partition pruning on read;
bucketBy co-locates future joins on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PARQUET_COMPRESSIONS = ("snappy", "gzip", "zstd")


def write_parquet(
    df: DataFrame,
    path: str,
    compression: str = "snappy",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    if compression not in PARQUET_COMPRESSIONS:
        raise ValueError(f"unsupported compression {compression!r}; use {PARQUET_COMPRESSIONS}")
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_orc(
    df: DataFrame,
    path: str,
    compression: str = "zlib",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (Spark-native columnar alternative to Parquet; same
    predicate-pushdown and column-pruning behavior on read)."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_compacted(
    df: DataFrame,
    path: str,
    target_files: int,
    sort_cols: list[str] | None = None,
    max_records_per_file: int = 0,
    compression: str = "snappy",
) -> None:
    """Small-file compaction: rewrite a fragmented dataset into
    `target_files` parquet files, optionally sorted within each file so
    parquet row-group min/max stats prune reads on `sort_cols`.

    The small-file problem is THE operational failure mode of streaming /
    incremental ingest at scale: thousands of KB-sized files turn a scan
    into a metadata storm. Compaction is one round-robin repartition
    (no key skew by construction) plus an optional in-partition sort;
    `maxRecordsPerFile` caps the opposite failure (one giant file).
    """
    out = df.repartition(target_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode("overwrite").option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    compression: str = "snappy",
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in `df`, leaving every other partition of the target untouched — the
    incremental-backfill write mode (recompute one day/source and land it
    without rewriting, or worse truncating, the rest of the table).

    Spark's static overwrite mode (the default) would TRUNCATE the whole
    table first; partitionOverwriteMode=dynamic scopes the delete to the
    partitions the job actually emits. The option is set per-write (not
    session-wide) so concurrent full-overwrite jobs keep their semantics.
    At 100 TB this is the difference between an O(changed-partition)
    backfill and an O(table) rewrite.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", compression)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_atomic_parquet(
    df: DataFrame,
    path: str,
    compression: str = "snappy",
    partition_by: list[str] | None = None,
) -> None:
    """Publish a parquet dataset ATOMICALLY via symlink swap: data lands
    in a private versioned sibling directory (`<path>.v-<uuid>`), and
    `path` is a SYMLINK flipped to it with one os.rename — the only
    POSIX primitive that atomically replaces a name. Readers of `path`
    therefore see either the complete old version or the complete new
    one at every instant: there is no window where `path` is missing
    (a rename-the-old-dir-away scheme has exactly that window, and a
    crash inside it strands the only copy under a temp name).

    The previous version's directory is removed after the flip — already
    -open readers keep their file handles (POSIX unlink semantics); new
    readers resolve the new target. A pre-existing REAL directory at
    `path` (e.g. from write_parquet) is migrated: moved aside and
    re-pointed, which pays the non-atomic window once, on migration
    only. Local/HDFS-style semantics; on object stores (no symlinks,
    no atomic rename) this contract comes from a transactional table
    format instead."""
    import os
    import shutil
    import uuid

    vdir = f"{path}.v-{uuid.uuid4().hex}"
    try:
        writer = df.write.mode("overwrite").option("compression", compression)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(vdir)
        old_target = None
        if os.path.islink(path):
            old_target = os.path.realpath(path)
        elif os.path.isdir(path):
            # one-time migration of a plain directory to the symlink scheme
            old_target = f"{path}.v-migrated-{uuid.uuid4().hex}"
            os.rename(path, old_target)
        link_tmp = f"{path}.lnk-{uuid.uuid4().hex}"
        os.symlink(os.path.abspath(vdir), link_tmp)
        os.rename(link_tmp, path)  # atomic name replacement
        if old_target and os.path.isdir(old_target):
            shutil.rmtree(old_target, ignore_errors=True)
    except BaseException:
        shutil.rmtree(vdir, ignore_errors=True)
        raise
