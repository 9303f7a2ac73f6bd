"""Round-13 closures for the round-12 ADVICE findings: the hint-lock
timeout becomes a distinct NON-retryable failure (no more infinite
orphan-minting retry loops in the streaming committer), commit_snapshot
reports the already-claimed version instead of a bogus conflict when
only the hint flip timed out, the unversioned _manifest.parquet mirror
is written under the hint lock with the monotonic check (no
last-writer-wins regression), and the Bloom index records the build
session's timezone so timestamp probes from any session render the
same canonical string."""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile
import threading

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_exporter_spark.sinks import manifest_sink as ms
from parquet_exporter_spark.sinks.manifest_sink import (
    CommitConflictError,
    HintLockTimeout,
    _flip_hint_monotonic,
    commit_snapshot,
    current_manifest_version,
    manifest_versions,
    read_manifest,
    read_manifest_version,
    streaming_snapshot_commit,
)


def _write_file(spark, d, name, lo, hi):
    t = (
        spark.range(lo, hi)
        .selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        .toPandas()
    )
    pq.write_table(
        pa.Table.from_pandas(t, preserve_index=False), os.path.join(d, name)
    )


@pytest.fixture
def fast_lock_timeout(monkeypatch):
    monkeypatch.setattr(ms, "HINT_LOCK_TIMEOUT_S", 0.2)


# ---------------------------------------------------------------------------
# ADVICE medium: stale hint lock must not be a retryable "conflict"


def test_stale_lock_raises_hint_lock_timeout_not_conflict(
    spark, fast_lock_timeout
):
    """A stale _manifest_hint.lock is operator-attention territory, not
    a version race: commit_snapshot must raise HintLockTimeout (which an
    `except CommitConflictError` retry loop does NOT catch) and must
    carry the version that WAS durably published via the os.link CAS."""
    d = tempfile.mkdtemp(prefix="pes_stale_")
    try:
        _write_file(spark, d, "a.parquet", 0, 50)
        assert commit_snapshot(d, "k") == 1
        # a crashed committer's leftover lock
        open(os.path.join(d, ms.HINT_LOCK), "w").close()
        _write_file(spark, d, "b.parquet", 50, 100)
        with pytest.raises(HintLockTimeout) as ei:
            commit_snapshot(d, "k")
        assert not isinstance(ei.value, CommitConflictError)
        assert ei.value.claimed_version == 2
        # the snapshot file for the claimed version is on disk (durable),
        # only the hint flip failed
        assert manifest_versions(d) == [1, 2]
        assert current_manifest_version(d) == 1
        # operator recovery: remove the stale lock, re-flip the hint
        os.unlink(os.path.join(d, ms.HINT_LOCK))
        _flip_hint_monotonic(d, 2)
        assert current_manifest_version(d) == 2
        assert len(read_manifest_version(d, 2)) == 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_commit_stale_lock_no_infinite_orphans(
    spark, fast_lock_timeout
):
    """The round-12 ADVICE loop: streaming_snapshot_commit retried
    CommitConflictError forever, and the old code raised exactly that
    from the lock-timeout path — every retry claimed a fresh orphan
    version. Now the timeout propagates after ONE claim attempt: exactly
    one new snapshot file, no marker, no infinite loop."""
    d = tempfile.mkdtemp(prefix="pes_stream_stale_")
    try:
        df0 = spark.range(0, 10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        assert streaming_snapshot_commit(df0, 0, d, "k") == 1
        open(os.path.join(d, ms.HINT_LOCK), "w").close()
        df1 = spark.range(10, 20).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        )
        with pytest.raises(HintLockTimeout):
            streaming_snapshot_commit(df1, 1, d, "k")
        # exactly ONE orphan claim (v2), not one per ~lock-timeout
        assert manifest_versions(d) == [1, 2]
        assert not os.path.isfile(os.path.join(d, "_batch-1.committed"))
        # recovery: clear the stale lock; the replayed batch commits
        # cleanly (its deterministic file overwrites itself; the next
        # claim is v3 above the orphan)
        os.unlink(os.path.join(d, ms.HINT_LOCK))
        v = streaming_snapshot_commit(df1, 1, d, "k")
        assert v == 3
        assert current_manifest_version(d) == 3
        names = sorted(
            os.path.basename(s.path) for s in read_manifest_version(d, 3)
        )
        assert names == ["batch-00000000.parquet", "batch-00000001.parquet"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# ADVICE low: unversioned mirror must never regress behind the hint


def test_mirror_is_monotonic_under_hint_lock(spark):
    """The unversioned _manifest.parquet is written inside the hint
    flip's lock + monotonic check: a late v-N writer calling the flip
    after v-N+1 already committed must leave BOTH the hint and the
    mirror at N+1 (the old code's last-writer-wins os.replace let the
    mirror regress while the hint said newer)."""
    d = tempfile.mkdtemp(prefix="pes_mirror_")
    try:
        _write_file(spark, d, "a.parquet", 0, 50)
        commit_snapshot(d, "k")
        _write_file(spark, d, "b.parquet", 50, 100)
        commit_snapshot(d, "k")
        mirror_before = sorted(
            os.path.basename(s.path) for s in read_manifest(d)
        )
        assert mirror_before == ["a.parquet", "b.parquet"]
        # a straggling v1 winner re-running its flip must be a no-op
        _flip_hint_monotonic(d, 1)
        assert current_manifest_version(d) == 2
        assert (
            sorted(os.path.basename(s.path) for s in read_manifest(d))
            == mirror_before
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_mirror_tracks_newest_under_racing_committers(spark):
    """Hammer commit_snapshot from 4 threads; afterwards the mirror's
    row set must equal the hinted (newest) snapshot's row set — the
    exact invariant the last-writer-wins race violated."""
    d = tempfile.mkdtemp(prefix="pes_mirror_race_")
    try:
        _write_file(spark, d, "a.parquet", 0, 50)
        commit_snapshot(d, "k")
        barrier = threading.Barrier(4)

        def racer():
            barrier.wait()
            for _ in range(8):
                try:
                    commit_snapshot(d, "k")
                except CommitConflictError:
                    pass

        ts = [threading.Thread(target=racer) for _ in range(4)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        hinted = current_manifest_version(d)
        assert hinted == max(manifest_versions(d))
        want = sorted(
            (os.path.basename(s.path), s.num_rows)
            for s in read_manifest_version(d, hinted)
        )
        got = sorted(
            (os.path.basename(s.path), s.num_rows) for s in read_manifest(d)
        )
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# ADVICE low: Bloom timestamp probes across session timezones


def test_bloom_timestamp_probe_across_timezones(spark):
    """Build the index under UTC, probe under Asia/Tokyo (+9): the file
    holding the probed instant must survive pruning. CAST(timestamp AS
    STRING) renders session-local wall time, so without the recorded
    build TZ the probe would hash '2024-03-15 21:30:00' against an
    index of '2024-03-15 12:30:00' — a silent false negative."""
    from parquet_exporter_spark.sinks.bloom_index import (
        build_bloom_manifest,
        prune_with_bloom,
    )

    d = tempfile.mkdtemp(prefix="pes_bloom_tz_")
    tz_key = "spark.sql.session.timeZone"
    old_tz = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "UTC")
        base = datetime.datetime(2024, 3, 15, 12, 30, 0)
        for f in range(3):
            rows = [
                (base + datetime.timedelta(hours=24 * f + i), f"r{f}_{i}")
                for i in range(40)
            ]
            spark.createDataFrame(rows, "ts timestamp, tag string").coalesce(
                1
            ).write.mode("overwrite").parquet(os.path.join(d, f"stage{f}"))
            part = [
                p
                for p in os.listdir(os.path.join(d, f"stage{f}"))
                if p.endswith(".parquet")
            ][0]
            os.replace(
                os.path.join(d, f"stage{f}", part),
                os.path.join(d, f"f{f}.parquet"),
            )
            shutil.rmtree(os.path.join(d, f"stage{f}"))
        manifest = build_bloom_manifest(spark, d, "ts")
        assert (
            pq.read_table(manifest).column("tz").to_pylist()[0] == "UTC"
        )
        # probe the instant from a +9 session with a tz-AWARE literal
        spark.conf.set(tz_key, "Asia/Tokyo")
        probe = datetime.datetime(
            2024, 3, 16, 12, 30, 0, tzinfo=datetime.timezone.utc
        )  # hour 0 of file 1
        keep = [os.path.basename(p) for p in prune_with_bloom(d, probe, spark=spark)]
        assert "f1.parquet" in keep  # the no-false-negative guarantee
        # and the session TZ was restored by the probe's render
        assert spark.conf.get(tz_key) == "Asia/Tokyo"
        # selectivity sanity: an index that keeps everything proves
        # nothing — the other files should (probabilistically, FP~0.6%)
        # be pruned
        assert len(keep) < 3
    finally:
        spark.conf.set(tz_key, old_tz)
        shutil.rmtree(d, ignore_errors=True)
