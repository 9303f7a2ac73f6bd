"""Append-only partial-sketch store shared by the streaming sketch
maintainers (t-digest, HLL): one immutable parquet file per committed
micro-batch plus a durable marker.

Exactly-once is simpler than the SCD2 generational protocol because
partials are immutable and append-only: a replay of a committed batch
is a marker-checked no-op, a crash before the marker leaves an orphan
file no reader resolves (readers glob only batches with committed
markers), and the replay overwrites the orphan with identical content —
each partial is a deterministic function of its batch.

A COMPACTION marker (``_compact-<B>.committed``) supersedes all batch
partials with id <= B: readers take the newest compact file plus every
batch partial above its bound. Superseded files are deleted only after
the compact marker is durable — the same publish discipline as the SCD2
fix (crash before cleanup leaves stale-but-ignored files the next
compaction removes).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def committed_batches(store_dir: str) -> list[int]:
    """Batch ids with durable markers, ascending."""
    out = []
    for p in glob.glob(os.path.join(store_dir, "_batch-*.committed")):
        stem = os.path.basename(p)[len("_batch-") : -len(".committed")]
        try:
            out.append(int(stem))
        except ValueError:
            continue
    return sorted(out)


def compacted_upto(store_dir: str) -> int | None:
    """Newest compaction bound B (``_compact-<B>.committed``), or None."""
    best = None
    for p in glob.glob(os.path.join(store_dir, "_compact-*.committed")):
        stem = os.path.basename(p)[len("_compact-") : -len(".committed")]
        try:
            b = int(stem)
        except ValueError:
            continue
        if best is None or b > best:
            best = b
    return best


def commit_partial(df: DataFrame, batch_id: int, store_dir: str) -> bool:
    """Commit one micro-batch's partial rows. False on replay of an
    already-committed batch, True after a commit."""
    os.makedirs(store_dir, exist_ok=True)
    marker = os.path.join(store_dir, f"_batch-{batch_id}.committed")
    if os.path.isfile(marker):
        return False
    staging = os.path.join(store_dir, f"_staging_batch_{batch_id}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    prefix = f"cent-{batch_id:08d}-"
    for p in glob.glob(os.path.join(store_dir, prefix + "*.parquet")):
        os.unlink(p)
    for i, part in enumerate(
        sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    ):
        os.replace(part, os.path.join(store_dir, f"{prefix}{i:04d}.parquet"))
    shutil.rmtree(staging, ignore_errors=True)
    _write_marker(marker, batch_id)
    return True


def commit_partials_batched(
    tagged: DataFrame,
    batch_ids: list[int],
    store_dir: str,
    batch_col: str = "batch",
) -> int:
    """Bootstrap commit: write EVERY still-uncommitted batch's partial
    rows in ONE Spark job (a staging write partitioned by ``batch_col``),
    then publish each batch under the same marker protocol
    ``commit_partial`` uses. ``tagged`` must carry ``batch_col`` plus the
    partial's columns in their committed order.

    Optimization r15 (guide §2.6 / VERDICT r14 item 4): the twins'
    first-build used to replay one ``commit_partial`` per micro-batch —
    k sequential jobs, each re-scanning the source and (for the ranked
    sketches) funnelling the whole batch through a single-partition
    window. Building all k partials in one plan lets the per-batch
    windows/aggregates run as PARTITIONED work in one pass. Exactly-once
    posture unchanged: already-committed batches are left untouched,
    markers are written only after the staged files are moved, and a
    crash mid-publish leaves later batches uncommitted for the next call
    (this function or the per-batch handler) to finish.

    Returns the number of batches committed (0 when all were committed)."""
    os.makedirs(store_dir, exist_ok=True)
    todo = [
        b
        for b in batch_ids
        if not os.path.isfile(os.path.join(store_dir, f"_batch-{b}.committed"))
    ]
    if not todo:
        return 0
    staging = os.path.join(store_dir, "_staging_bootstrap")
    (
        tagged.filter(F.col(batch_col).isin([int(b) for b in todo]))
        # one hash partition per batch -> one staged file per batch
        .repartition(len(todo), F.col(batch_col))
        .write.mode("overwrite")
        .partitionBy(batch_col)
        .parquet(staging)
    )
    for b in todo:
        files = sorted(
            glob.glob(os.path.join(staging, f"{batch_col}={b}", "*.parquet"))
        )
        if not files:
            # empty batch: publish an empty single-file partial so readers
            # (which treat a marker without files as corruption) stay sound
            empty_dir = os.path.join(staging, f"_empty_{b}")
            (
                tagged.filter(F.lit(False))
                .drop(batch_col)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(empty_dir)
            )
            files = sorted(glob.glob(os.path.join(empty_dir, "part-*.parquet")))
        prefix = f"cent-{b:08d}-"
        for p in glob.glob(os.path.join(store_dir, prefix + "*.parquet")):
            os.unlink(p)
        for i, part in enumerate(files):
            os.replace(part, os.path.join(store_dir, f"{prefix}{i:04d}.parquet"))
        _write_marker(os.path.join(store_dir, f"_batch-{b}.committed"), b)
    shutil.rmtree(staging, ignore_errors=True)
    return len(todo)


def read_partials(spark, store_dir: str) -> DataFrame | None:
    """All live partial rows tagged with batch_id: the newest compacted
    fold (tagged with its bound B) plus every committed batch partial
    above it. None before the first commit. Orphans without markers are
    never read."""
    upto = compacted_upto(store_dir)
    parts = []
    if upto is not None:
        files = sorted(
            glob.glob(os.path.join(store_dir, f"compact-{upto:08d}-*.parquet"))
        )
        if not files:
            raise FileNotFoundError(
                f"partial store {store_dir}: compact marker {upto} exists "
                "but its fold file is missing"
            )
        parts.append(
            spark.read.parquet(*files).withColumn(
                "batch_id", F.lit(upto).cast("long")
            )
        )
    for b in committed_batches(store_dir):
        if upto is not None and b <= upto:
            continue
        files = sorted(
            glob.glob(os.path.join(store_dir, f"cent-{b:08d}-*.parquet"))
        )
        if not files:
            raise FileNotFoundError(
                f"partial store {store_dir}: marker for batch {b} exists "
                "but its partial file is missing"
            )
        parts.append(
            spark.read.parquet(*files).withColumn(
                "batch_id", F.lit(b).cast("long")
            )
        )
    if not parts:
        return None
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def commit_compaction(
    folded: DataFrame, upto_batch: int, store_dir: str
) -> bool:
    """Publish ``folded`` (the fold of all live partials with id <=
    upto_batch, WITHOUT the batch_id column) as the new compacted base.
    False if a compaction at or above this bound already exists.
    Superseded batch partials and older compact files are deleted only
    AFTER the marker is durable."""
    prev = compacted_upto(store_dir)
    if prev is not None and prev >= upto_batch:
        return False
    marker = os.path.join(store_dir, f"_compact-{upto_batch}.committed")
    staging = os.path.join(store_dir, f"_staging_compact_{upto_batch}")
    folded.coalesce(1).write.mode("overwrite").parquet(staging)
    prefix = f"compact-{upto_batch:08d}-"
    for p in glob.glob(os.path.join(store_dir, prefix + "*.parquet")):
        os.unlink(p)
    for i, part in enumerate(
        sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    ):
        os.replace(part, os.path.join(store_dir, f"{prefix}{i:04d}.parquet"))
    shutil.rmtree(staging, ignore_errors=True)
    _write_marker(marker, upto_batch)
    # cleanup AFTER the durable marker: superseded batch partials and
    # older compact generations (their markers stay as replay guards)
    for b in committed_batches(store_dir):
        if b <= upto_batch:
            for p in glob.glob(
                os.path.join(store_dir, f"cent-{b:08d}-*.parquet")
            ):
                os.unlink(p)
    for p in glob.glob(os.path.join(store_dir, "compact-*.parquet")):
        if not os.path.basename(p).startswith(prefix):
            os.unlink(p)
    return True


def _write_marker(marker: str, payload: int) -> None:
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(payload))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, marker)
