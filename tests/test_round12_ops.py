"""Round-12 closures: the versioned manifest becomes a real
mini-table-format (CAS concurrent-writer safety, lost-hint-proof version
numbering, orphan-read rejection, snapshot expiry + vacuum, streaming
exactly-once commits), and the Bloom file index extends past string
columns by rendering probe literals through Spark's own CAST — verdict
items 1/2/6 and the round-11 ADVICE manifest finding."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import threading

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from parquet_exporter_spark.sinks.bloom_index import (
    BLOOM_NAME,
    _positions,
    build_bloom_manifest,
    prune_with_bloom,
)
from parquet_exporter_spark.sinks.manifest_sink import (
    CommitConflictError,
    commit_snapshot,
    current_manifest_version,
    expire_snapshots,
    manifest_versions,
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


# ---------------------------------------------------------------------------
# Manifest: CAS commits, version derivation, orphans, expiry


def test_manifest_cas_two_racing_committers(spark):
    """Two committers that both computed version 2 must not both win:
    the hard-link publish is the CAS — exactly one succeeds, the loser
    gets a RETRYABLE CommitConflictError and its retry lands as 3.
    History stays strictly append-only throughout."""
    d = tempfile.mkdtemp(prefix="pes_cas_")
    try:
        _write_file(spark, d, "a.parquet", 0, 100)
        assert commit_snapshot(d, "k") == 1

        barrier = threading.Barrier(2)
        results: list = [None, None]

        def racer(i):
            barrier.wait()
            try:
                results[i] = commit_snapshot(d, "k")
            except CommitConflictError as e:
                results[i] = e

        ts = [threading.Thread(target=racer, args=(i,)) for i in range(2)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        wins = [r for r in results if isinstance(r, int)]
        losses = [r for r in results if isinstance(r, CommitConflictError)]
        # the torn window is small: either both serialized cleanly
        # (versions 2 and 3) or one lost and retries
        if losses:
            assert wins == [2] and len(losses) == 1
            assert commit_snapshot(d, "k") == 3  # the retry path
        else:
            assert sorted(wins) == [2, 3]
        assert manifest_versions(d) == [1, 2, 3]
        assert current_manifest_version(d) == 3
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_manifest_numbering_survives_lost_hint(spark):
    """Deleting the hint file must NOT restart numbering at 1 and
    overwrite immutable history (the round-11 advice hole): the next
    commit derives its version from the snapshot files themselves."""
    d = tempfile.mkdtemp(prefix="pes_losthint_")
    try:
        _write_file(spark, d, "a.parquet", 0, 100)
        commit_snapshot(d, "k")
        _write_file(spark, d, "b.parquet", 100, 200)
        commit_snapshot(d, "k")
        v1_before = pq.read_table(
            os.path.join(d, "_manifest.v1.parquet")
        ).to_pylist()
        os.unlink(os.path.join(d, "_manifest_current"))
        _write_file(spark, d, "c.parquet", 200, 300)
        assert commit_snapshot(d, "k") == 3  # not 1
        assert manifest_versions(d) == [1, 2, 3]
        v1_after = pq.read_table(
            os.path.join(d, "_manifest.v1.parquet")
        ).to_pylist()
        assert v1_after == v1_before  # v1 history untouched
        assert len(read_manifest_version(d, 1)) == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_manifest_orphan_above_hint_is_not_readable(spark):
    """A snapshot file whose version is above the committed hint is a
    crash-orphan / in-flight commit — reading it would serve
    never-published state. It must raise, and the next commit must skip
    (never overwrite) the orphan's slot."""
    d = tempfile.mkdtemp(prefix="pes_orphan_")
    try:
        _write_file(spark, d, "a.parquet", 0, 100)
        commit_snapshot(d, "k")
        shutil.copy(
            os.path.join(d, "_manifest.v1.parquet"),
            os.path.join(d, "_manifest.v2.parquet"),
        )  # simulate a crash between snapshot publish and hint flip
        with pytest.raises(FileNotFoundError, match="never committed"):
            read_manifest_version(d, 2)
        _write_file(spark, d, "b.parquet", 100, 200)
        assert commit_snapshot(d, "k") == 3  # orphan slot skipped
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_manifest_compaction_then_expiry_vacuums_replaced_files(spark):
    """The full compaction lifecycle: commit v2 with an explicit file
    set that logically drops a.parquet (which stays on disk for v1
    readers), then expire_snapshots(keep_n=1) deletes the v1 snapshot
    AND physically vacuums a.parquet — but never a file a kept version
    still references, never an unreferenced newcomer, and never with
    keep_n < 1."""
    d = tempfile.mkdtemp(prefix="pes_expire_")
    try:
        _write_file(spark, d, "a.parquet", 0, 100)
        _write_file(spark, d, "b.parquet", 100, 200)
        commit_snapshot(d, "k")
        _write_file(spark, d, "c.parquet", 200, 300)
        commit_snapshot(d, "k", data_files=["b.parquet", "c.parquet"])
        # v1 readers still work: a.parquet is logically dropped, not gone
        assert {os.path.basename(s.path) for s in read_manifest_version(d, 1)} == {
            "a.parquet",
            "b.parquet",
        }
        _write_file(spark, d, "uncommitted.parquet", 300, 400)  # in-flight batch

        with pytest.raises(ValueError, match="keep_n"):
            expire_snapshots(d, 0)
        assert expire_snapshots(d, 5) == {
            "removed_versions": [],
            "removed_files": [],
        }  # nothing old enough

        rep = expire_snapshots(d, 1)
        assert rep == {"removed_versions": [1], "removed_files": ["a.parquet"]}
        assert not os.path.isfile(os.path.join(d, "a.parquet"))
        # kept-version files and the uncommitted newcomer survive
        for f in ("b.parquet", "c.parquet", "uncommitted.parquet"):
            assert os.path.isfile(os.path.join(d, f))
        assert manifest_versions(d) == [2]
        with pytest.raises(FileNotFoundError):
            read_manifest_version(d, 1)
        assert {os.path.basename(s.path) for s in read_manifest_version(d)} == {
            "b.parquet",
            "c.parquet",
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming commits into the versioned manifest


def test_streaming_snapshot_commit_exactly_once_semantics(spark):
    """The foreachBatch handler contract, replay-by-replay: each batch
    commits exactly one snapshot version; a replay with the marker
    intact is a no-op; a replay after a crash BETWEEN commit and marker
    (marker deleted by hand) detects the batch in the committed
    manifest, heals the marker, and does NOT double-commit — so any
    killed-and-restarted run converges on the straight run's chain."""
    d = tempfile.mkdtemp(prefix="pes_streamsnap_")
    try:
        b0 = spark.range(0, 50).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        b1 = spark.range(50, 90).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        b2 = spark.range(90, 100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        assert streaming_snapshot_commit(b0, 0, d, "k") == 1
        assert streaming_snapshot_commit(b1, 1, d, "k") == 2
        # replay with marker intact: no-op
        assert streaming_snapshot_commit(b1, 1, d, "k") is None
        assert manifest_versions(d) == [1, 2]
        # crash between commit and marker: replay heals, never recommits
        os.unlink(os.path.join(d, "_batch-1.committed"))
        assert streaming_snapshot_commit(b1, 1, d, "k") is None
        assert manifest_versions(d) == [1, 2]
        assert os.path.isfile(os.path.join(d, "_batch-1.committed"))
        assert streaming_snapshot_commit(b2, 2, d, "k") == 3
        # the chain is queryable history: each as-of read sees its prefix
        assert sum(s.num_rows for s in read_manifest_version(d, 1)) == 50
        assert sum(s.num_rows for s in read_manifest_version(d, 2)) == 90
        assert sum(s.num_rows for s in read_manifest_version(d, 3)) == 100
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_manifest_commit_restart_yields_same_chain(spark, tmp_path):
    """End to end with a REAL stream: a file-source stream committing
    into the versioned manifest, stopped and restarted from its
    checkpoint with new files waiting, must extend the same snapshot
    chain — committed batches are not replayed, every as-of read stays
    stable across the restart (the verdict's compose-the-two-proofs
    item)."""
    watch = str(tmp_path / "incoming")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    def _arrive(name, lo, hi):
        staging = os.path.join(watch, f"__staging_{name}")
        spark.range(lo, hi).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ).coalesce(1).write.mode("overwrite").parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(watch, name))
        shutil.rmtree(staging)

    def _run():
        stream = spark.readStream.schema("k long, v double").parquet(watch)
        q = (
            stream.writeStream.foreachBatch(
                lambda b, i: streaming_snapshot_commit(b, i, table, "k")
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    _arrive("f1.parquet", 0, 60)
    _run()
    chain_before = manifest_versions(table)
    rows_v_first = sum(s.num_rows for s in read_manifest_version(table, chain_before[0]))
    assert rows_v_first == 60

    # stream is DOWN; two files arrive; restart from the checkpoint
    _arrive("f2.parquet", 60, 80)
    _arrive("f3.parquet", 80, 100)
    _run()

    chain_after = manifest_versions(table)
    assert chain_after[: len(chain_before)] == chain_before  # append-only
    assert len(chain_after) > len(chain_before)
    # pre-restart history is byte-stable and the head sees everything
    assert sum(s.num_rows for s in read_manifest_version(table, chain_before[0])) == 60
    assert sum(s.num_rows for s in read_manifest_version(table)) == 100
    assert current_manifest_version(table) == chain_after[-1]


# ---------------------------------------------------------------------------
# Typed Bloom index: no-false-negative property across non-string types


def test_bloom_typed_no_false_negatives_property(spark):
    """The verdict's cross-type render-parity property: index int /
    double / date / timestamp columns (values chosen to include the
    renderings where Python str() and Spark CAST disagree — 1e-4
    scientific notation, sub-second timestamps), then verify EVERY
    present value keeps its file. The bulk check renders all probe
    literals in one Spark pass through the same CAST chain and tests
    the committed words directly (>1k probes); the end-to-end
    prune_with_bloom API path is exercised on a sample per type."""
    d = tempfile.mkdtemp(prefix="pes_bloom_typed_")
    try:
        n = 400
        df = spark.range(n).selectExpr(
            "id * 7919 % 100003 AS i",
            "CAST(id AS DOUBLE) / 10000 AS f",
            "date_add(DATE'2020-01-01', CAST(id % 4000 AS INT)) AS d",
            "timestamp_millis(1577836800000 + id * 61003) AS t",
        )
        df.repartition(4).write.mode("overwrite").parquet(d)
        homes = {
            c: {
                r["val"]: r["f"]
                for r in spark.read.parquet(d)
                .selectExpr(
                    f"{c} AS val",
                    "regexp_extract(input_file_name(), '([^/]+)$', 1) AS f",
                )
                .collect()
            }
            for c in ("i", "f", "d", "t")
        }
        for col in ("i", "f", "d", "t"):
            scratch = tempfile.mkdtemp(prefix=f"pes_bloomidx_{col}_")
            try:
                build_bloom_manifest(spark, d, col, manifest_dir=scratch)
                rows = pq.read_table(os.path.join(scratch, BLOOM_NAME)).to_pylist()
                filters: dict[str, dict[int, int]] = {}
                for r in rows:
                    filters.setdefault(r["file_name"], {})[r["word_idx"]] = r["word"]
                m, k = rows[0]["m"], rows[0]["k"]
                # bulk: Spark renders every value through the SAME cast
                rendered = spark.read.parquet(d).selectExpr(
                    f"CAST({col} AS STRING) AS r",
                    "regexp_extract(input_file_name(), '([^/]+)$', 1) AS f",
                ).collect()
                assert len(rendered) == n
                for r in rendered:
                    words = filters[r["f"]]
                    assert all(
                        words.get(q // 64, 0) & (1 << (q % 64))
                        for q in _positions(r["r"], m, k)
                    ), f"false negative: {col}={r['r']!r} missing from {r['f']}"
                # end-to-end API path on a sample (real Python values)
                sample = list(homes[col].items())[:: max(1, n // 8)]
                for val, home in sample:
                    keep = prune_with_bloom(d, val, manifest_dir=scratch, spark=spark)
                    assert any(os.path.basename(p) == home for p in keep), (
                        f"prune_with_bloom false negative on {col}={val!r}"
                    )
            finally:
                shutil.rmtree(scratch, ignore_errors=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Sampled-pivot closeness: the Eppstein-Wang claim as a measured assertion


def test_closeness_sampled_pivots_exact_on_support_and_rank_faithful(spark, sf_dir):
    """Pin the sampled-pivot design's accuracy claim (verdict item 3)
    on the small graph where exact all-sources closeness IS feasible:

    1. EXACT ON SUPPORT — for every pivot the sampled run computes, its
       harmonic numerator equals the all-sources run's value exactly
       (the pivot's 3-hop ball is a full BFS, not an estimate).
    2. RANK-FAITHFUL — therefore the pivots' relative order inside the
       sampled output is IDENTICAL to their relative order inside the
       full ranking (Spearman rho == 1.0 on the support, computed
       explicitly, not assumed).
    3. COVERAGE — the 1-in-20 sample's best pivot sits in the top
       quartile of the full population ranking (the 'sharpens by
       adding pivots' direction: more pivots -> better extremes).
    """
    from parquet_exporter_spark.queries.graph import (
        _closeness_from_pivots,
        graph_closeness_bfs,
    )

    full = {
        r.part_key: (6 * r.c1 + 3 * r.c2 + 2 * r.c3)
        for r in _closeness_from_pivots(spark, sf_dir, pivot_mod=1).collect()
    }
    sampled = {
        r.part_key: (6 * r.c1 + 3 * r.c2 + 2 * r.c3)
        for r in graph_closeness_bfs(spark, sf_dir).collect()
    }
    assert len(sampled) >= 5, "fixture graph too small to measure anything"
    # 1. exact on support
    for k, v in sampled.items():
        assert full[k] == v, f"pivot {k}: sampled {v} != exact {full[k]}"
    # 2. Spearman rho on the support (ties broken by id, both sides)
    support = sorted(sampled)
    r_s = {k: i for i, k in enumerate(sorted(support, key=lambda k: (-sampled[k], k)))}
    r_f = {k: i for i, k in enumerate(sorted(support, key=lambda k: (-full[k], k)))}
    n = len(support)
    d2 = sum((r_s[k] - r_f[k]) ** 2 for k in support)
    rho = 1 - 6 * d2 / (n * (n * n - 1)) if n > 1 else 1.0
    assert rho == 1.0
    # 3. coverage of the full ranking's top quartile
    pop_ranked = sorted(full, key=lambda k: (-full[k], k))
    top_quartile = set(pop_ranked[: max(1, len(pop_ranked) // 4)])
    best_pivot = min(sampled, key=lambda k: (-sampled[k], k))
    assert best_pivot in top_quartile, (
        f"sample best {best_pivot} not in population top quartile "
        f"(population {len(pop_ranked)}, sample {n})"
    )


# ---------------------------------------------------------------------------
# t-digest + KMV sketches: structural guarantees as assertions


def test_tdigest_sketch_partitions_rank_space_exactly(spark, sf_dir):
    """The centroid set must partition [0, n) into disjoint, gap-free
    rank spans whose weights are the span sizes, with each bucket's
    rank-width <= max(1, d/4) at its distance-to-tail d — the measured
    form of the 25%-relative-rank-error claim."""
    from parquet_exporter_spark.queries.aggregates import agg_tdigest_sketch

    rows = sorted(
        agg_tdigest_sketch(spark, sf_dir).collect(), key=lambda r: r.min_rank
    )
    n = rows[-1].max_rank + 1
    cursor = 0
    for r in rows:
        assert r.min_rank == cursor, f"gap/overlap at rank {cursor}"
        assert r.weight == r.max_rank - r.min_rank + 1
        assert r.lo_cents <= r.hi_cents
        d = min(r.min_rank + 1, n - r.max_rank)  # distance of nearest edge
        width = r.max_rank - r.min_rank + 1
        # the t-digest tail bound, exactly: width-1 buckets at the very
        # tails, else rank-width <= d/4 at tail distance d
        assert width == 1 or width * 4 <= d, f"bucket wider than d/4: {r}"
        cursor = r.max_rank + 1
    assert cursor == n
    # tail-refinement: the extreme buckets are width 1 (exact extremes)
    assert rows[0].weight == 1 and rows[-1].weight == 1


def test_tdigest_quantiles_bounds_hold_and_sane(spark, sf_dir):
    from parquet_exporter_spark.queries.aggregates import agg_tdigest_quantiles

    rows = {r.p: r for r in agg_tdigest_quantiles(spark, sf_dir).collect()}
    assert set(rows) == {0.001, 0.01, 0.25, 0.5, 0.9, 0.99, 0.999}
    for p, r in rows.items():
        assert r.within_bucket_bounds, f"p={p}: exact outside bucket bounds"
    # estimates are monotone in p (interpolation within a sorted partition)
    ests = [rows[p].est_price for p in sorted(rows)]
    assert ests == sorted(ests)


def test_kmv_under_k_population_is_exact(spark):
    """Fewer distinct keys than k: the sketch holds the entire hash set,
    so the estimate must be the EXACT count and kth_hash NULL."""
    import tempfile as _tf

    from parquet_exporter_spark.queries.aggregates import agg_kmv_distinct

    d = _tf.mkdtemp(prefix="kmv_")
    try:
        spark.range(500).selectExpr(
            "id % 50 AS l_partkey", "1.0 AS l_extendedprice"
        ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
        r = agg_kmv_distinct(spark, d).collect()[0]
        assert r.n_kept == 50 and r.kth_hash is None
        assert r.est_distinct == 50 == r.true_distinct
        assert r.rel_error == 0.0 and r.within_bound
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Round-12 timeseries additions: hand-computed fixtures at birth


def _write_events(spark, rows, prefix):
    """rows: (event_id, ts, user_id, event_type, value)."""
    d = tempfile.mkdtemp(prefix=prefix)
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def test_holt_damped_hand_computed(spark):
    """y=[4,2,6], a=1/2 b=1/4 phi=7/8 by hand:
    seed (4, 0); x=2 -> level 3, trend -1/4;
    x=6 -> level 4.390625, trend 0.18359375.
    forecast_1 = level + phi*trend; forecast_limit = level + 7*trend."""
    import datetime as dt

    from parquet_exporter_spark.queries.llm8 import timeseries_holt_damped

    base = dt.datetime(2024, 3, 1, 9)
    rows = [
        (i, base + dt.timedelta(days=i), 1, "a", v)
        for i, v in enumerate([4.0, 2.0, 6.0])
    ]
    d = _write_events(spark, rows, "holtd_")
    try:
        r = {x.user_id: x for x in timeseries_holt_damped(spark, d).collect()}[1]
        assert r.n_points == 3
        assert r.level == 4.390625
        assert r.trend == 0.183594  # round(0.18359375, 6)
        assert abs(r.forecast_1 - round(4.390625 + 0.875 * 0.18359375, 6)) < 1e-12
        assert abs(r.forecast_3 - round(4.390625 + (0.875 + 0.875**2 + 0.875**3) * 0.18359375, 6)) < 1e-12
        assert r.forecast_limit == round(4.390625 + 7 * 0.18359375, 6)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stl_loess_reproduces_a_pure_linear_ramp(spark):
    """The property that separates loess from a centered moving average:
    on an exactly linear series the local-line fit returns the series
    ITSELF (trend == y at every point, including the edges where a
    centered mean would flatten), so seasonal and remainder are 0."""
    import datetime as dt

    from parquet_exporter_spark.queries.timeseries import timeseries_stl_loess

    base = dt.datetime(2024, 3, 1, 12)
    rows, eid = [], 0
    for t in range(14):
        for _ in range(10 + 2 * t):  # daily count ramps linearly 10,12,...
            rows.append((eid, base + dt.timedelta(days=t), 1, "ramp", 1.0))
            eid += 1
    d = _write_events(spark, rows, "stl_")
    try:
        got = sorted(timeseries_stl_loess(spark, d).collect(), key=lambda r: r.day)
        assert len(got) == 14
        for i, r in enumerate(got):
            assert r.n_events == 10 + 2 * i
            assert r.trend == float(r.n_events), f"edge flattening at {r.day}"
            assert r.seasonal == 0.0 and r.remainder == 0.0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_rsi_extremes_and_integer_threshold_decisions(spark):
    """Monotone-up series -> RSI 100 / overbought; monotone-down -> 0 /
    oversold; flat -> neutral 50 with both flags off. Needs 15 days to
    open the first full 14-diff window."""
    import datetime as dt

    from parquet_exporter_spark.queries.timeseries import timeseries_rsi_cutler

    base = dt.datetime(2024, 3, 1, 12)
    rows, eid = [], 0
    for t in range(16):
        for series, count in (("up", 5 + t), ("down", 40 - t), ("flat", 7)):
            for _ in range(count):
                rows.append((eid, base + dt.timedelta(days=t), 1, series, 1.0))
                eid += 1
    d = _write_events(spark, rows, "rsi_")
    try:
        got = {}
        for r in timeseries_rsi_cutler(spark, d).collect():
            got.setdefault(r.event_type, []).append(r)
        assert all(len(v) == 2 for v in got.values())  # days 15 and 16
        for r in got["up"]:
            assert r.rsi == 100.0 and r.overbought and not r.oversold
        for r in got["down"]:
            assert r.rsi == 0.0 and r.oversold and not r.overbought
        for r in got["flat"]:
            assert r.rsi == 50.0 and not r.overbought and not r.oversold
            assert r.gain == 0 and r.loss == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)
