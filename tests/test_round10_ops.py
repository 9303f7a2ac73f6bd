"""Round-10 hardening: the distributed manifest bootstrap must be
contract-identical to the sequential footer walk, empty pruning must
degrade to an empty scan instead of raising, manifest refresh must be
atomic, the registered RaBitQ fast-path verdict must carry the FWHT
plan (not just the expression twin), and the new Hampel/changepoint
detectors must be proven to FIRE on crafted data (the round-9
zero-row-positive lesson, applied at birth instead of backfilled)."""

from __future__ import annotations

import datetime as dt
import glob as _glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from parquet_exporter_spark.queries.extras import RANGED_EVENTS
from parquet_exporter_spark.sources.manifest import (
    file_stats,
    file_stats_distributed,
    prune_by_range,
    read_kept,
)


def test_distributed_footer_stats_match_sequential(spark):
    """Same paths, same column -> byte-identical FileStat lists, in the
    input path order, including datetime bounds surviving the tagged
    string round-trip through the Arrow batch."""
    paths = sorted(_glob.glob(os.path.join(RANGED_EVENTS, "*.parquet")))
    assert len(paths) == 8
    seq = file_stats(paths, "ts")
    dist = file_stats_distributed(spark, paths, "ts")
    assert dist == seq
    assert [s.path for s in dist] == paths
    assert all(isinstance(s.min_value, dt.datetime) for s in dist)
    # numeric column bounds round-trip too
    seq_n = file_stats(paths, "value")
    dist_n = file_stats_distributed(spark, paths, "value")
    assert dist_n == seq_n
    assert all(isinstance(s.min_value, float) for s in dist_n)


def test_distributed_footer_stats_missing_column_raises(spark):
    paths = sorted(_glob.glob(os.path.join(RANGED_EVENTS, "*.parquet")))[:2]
    try:
        file_stats_distributed(spark, paths, "no_such_col")
    except KeyError as e:
        assert "no_such_col" in str(e)
    else:
        raise AssertionError("expected KeyError for a missing column")


def test_read_kept_empty_prune_returns_empty_with_schema(spark):
    """A predicate outside every file's range prunes ALL files; the
    read must yield 0 rows with the dataset's real schema instead of
    the bare spark.read.parquet(*[]) error."""
    paths = sorted(_glob.glob(os.path.join(RANGED_EVENTS, "*.parquet")))
    stats = file_stats(paths, "ts")
    keep = prune_by_range(stats, lo=dt.datetime(2030, 1, 1))
    assert keep == []
    df = read_kept(spark, keep, paths)
    assert df.count() == 0
    assert set(spark.read.parquet(paths[0]).columns) == set(df.columns)
    # non-empty keep passes straight through
    keep2 = prune_by_range(stats, lo=stats[-1].min_value)
    assert len(keep2) == 1
    assert read_kept(spark, keep2, paths).count() == stats[-1].num_rows


def test_refresh_manifest_is_atomic(spark):
    """refresh_manifest commits via temp + os.replace: after a refresh
    no *.tmp residue exists and the manifest is immediately readable;
    the committed bounds equal the written data's bounds."""
    from parquet_exporter_spark.sinks.manifest_sink import (
        MANIFEST_NAME,
        read_manifest,
        write_manifested,
    )

    d = tempfile.mkdtemp(prefix="manifatomic_")
    try:
        df = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        stats = write_manifested(df, d, "k", n_files=4)
        assert len(stats) == 4
        assert not _glob.glob(os.path.join(d, "*.tmp"))
        got = read_manifest(d)
        assert sorted(s.num_rows for s in got) == sorted(s.num_rows for s in stats)
        assert os.path.exists(os.path.join(d, MANIFEST_NAME))
        assert min(s.min_value for s in got) == 0
        assert max(s.max_value for s in got) == 99
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_rabitq_fast_verdict_true_and_plan_has_arrow(spark, sf_dir):
    """The registered fast-path verdict must hold (every scored pair
    within 1e-9 of the exact rotation, top-k agreeing) AND the plan
    must actually contain the Arrow-batched FWHT stage — the scale
    path is what is being stamped, not two copies of the expression
    form."""
    from parquet_exporter_spark.queries.llm8 import similarity_rabitq_fast_topk

    df = similarity_rabitq_fast_topk(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
    rows = df.collect()
    assert len(rows) == 3
    for r in rows:
        assert r.est_within_tol and r.topk_overlap_ok
        assert r.n_scored > 0


def _events_dir(spark, rows, prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def _volume_days(counts, etype="click", start=dt.date(2024, 3, 1)):
    rows, eid = [], 0
    for off, n in enumerate(counts):
        day = start + dt.timedelta(days=off)
        for k in range(n):
            rows.append(
                (
                    eid,
                    1,
                    dt.datetime.combine(day, dt.time(9, 0)) + dt.timedelta(minutes=k),
                    etype,
                    1.0,
                )
            )
            eid += 1
    return rows


def test_hampel_fires_on_spike_and_ignores_constant(spark):
    """A single 50-event spike in an otherwise 10-per-day series must be
    the ONLY flagged day (the spike must not inflate its own threshold
    — the property mean/stddev windows get wrong), and a constant
    series (MAD=0) must flag nothing."""
    from parquet_exporter_spark.queries.timeseries import timeseries_hampel_outliers

    counts = [10, 11, 10, 9, 50, 10, 11, 10, 9, 10]
    d = _events_dir(spark, _volume_days(counts), "hampel_")
    try:
        got = timeseries_hampel_outliers(spark, d).collect()
        assert [(r.day, r.n_events) for r in got] == [(dt.date(2024, 3, 5), 50)]
        assert got[0].med == 10.0  # rolling median excludes the spike's pull
    finally:
        shutil.rmtree(d, ignore_errors=True)
    flat = _events_dir(spark, _volume_days([7] * 10), "hampelflat_")
    try:
        assert timeseries_hampel_outliers(spark, flat).count() == 0
    finally:
        shutil.rmtree(flat, ignore_errors=True)


def test_changepoint_finds_planted_level_shift(spark):
    """10 days at ~10/day then 10 days at ~30/day: the argmax split must
    land on the boundary day and the segment means must bracket it."""
    from parquet_exporter_spark.queries.timeseries import (
        timeseries_changepoint_meanshift,
    )

    counts = [10, 11, 9, 10, 10, 11, 9, 10, 10, 10, 30, 31, 29, 30, 30, 31, 29, 30, 30, 30]
    d = _events_dir(spark, _volume_days(counts), "chgpt_")
    try:
        got = timeseries_changepoint_meanshift(spark, d).collect()
        assert len(got) == 1
        r = got[0]
        assert r.change_day == dt.date(2024, 3, 10)  # last day of the low regime
        assert abs(r.mean_before - 10.0) < 1.0
        assert abs(r.mean_after - 30.0) < 1.0
        assert r.score > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_mase_seasonal_series_beats_naive(spark):
    """A strongly weekly series (low weekends) must score MASE < 1 —
    the seasonal-naive forecast beats persistence — and a trendless
    noise-free constant series yields seasonal_mae = naive_mae = 0
    with NULL mase (0/0 guarded)."""
    from parquet_exporter_spark.queries.timeseries import timeseries_mase

    weekly = [20, 20, 20, 20, 20, 5, 5] * 4  # Mon..Sun x4 (start date is a Friday;
    # alignment doesn't matter, only the exact period-7 repetition)
    d = _events_dir(spark, _volume_days(weekly), "mase_")
    try:
        got = timeseries_mase(spark, d).collect()
        assert len(got) == 1
        r = got[0]
        assert r.seasonal_mae == 0.0  # exact weekly repetition
        assert r.naive_mae > 0
        assert r.mase == 0.0
    finally:
        shutil.rmtree(d, ignore_errors=True)
    const = _events_dir(spark, _volume_days([8] * 15), "maseconst_")
    try:
        r = timeseries_mase(spark, const).collect()[0]
        assert r.naive_mae == 0.0 and r.seasonal_mae == 0.0
        assert r.mase is None
    finally:
        shutil.rmtree(const, ignore_errors=True)


def test_adamic_adar_prefers_rare_common_neighbor(spark):
    """Crafted co-order graph: parts 1 and 2 share ONLY rare hub 3
    (deg 2 beyond them is impossible in this fixture, so build: 1-3,
    2-3 co-orders and a promiscuous hub 4 co-ordered with everything).
    The (1,2) prediction must exist and score the rare hub higher than
    the promiscuous one contributes."""
    import math

    from parquet_exporter_spark.queries.graph import graph_adamic_adar

    # orders: (o, parts...) — co-order cliques
    orders = [
        (1, [1, 3]),
        (2, [2, 3]),
        (3, [1, 4]),
        (4, [2, 4]),
        (5, [5, 4]),
        (6, [6, 4]),
    ]
    rows = []
    ln = 0
    for o, parts in orders:
        for p in parts:
            rows.append((o, ln, p))
            ln += 1
    d = tempfile.mkdtemp(prefix="aa_")
    try:
        spark.createDataFrame(
            rows, "l_orderkey long, l_linenumber long, l_partkey long"
        ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
        got = {
            (r.part_key, r.predicted_part): r
            for r in graph_adamic_adar(spark, d).collect()
        }
        pair = got[(1, 2)]
        # common neighbors of 1,2: rare hub 3 (deg 2) and busy hub 4 (deg 4)
        assert pair.n_common == 2
        expected = round(1 / math.log(2) + 1 / math.log(4), 6)
        assert abs(pair.aa_score - expected) < 1e-9
        # the exact fixed-point Resource-Allocation decision quantity:
        # 1e12 div 2 + 1e12 div 4 (round-12 ranking contract)
        assert pair.ra_fp == 10**12 // 2 + 10**12 // 4
        # both directions scored: (2,1) mirrors (1,2)
        assert got[(2, 1)].ra_fp == pair.ra_fp
        # rarity in the DECISION path: for part 5, candidate 1 shares only
        # busy hub 4 (1 common), yet ranks by RA weight not raw count —
        # all its candidates {1,2,6} tie at 1e12//4, so id breaks the tie
        assert got[(5, 1)].ra_fp == 10**12 // 4
        # 1 and 3 are already connected -> never predicted
        assert (1, 3) not in got
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_rabitq_persisted_probe_matches_inmemory_topk(spark, sf_dir):
    """Serving from the packed signature parquet must return the SAME
    ranked rows as the unpersisted expression pipeline for the shared
    query ids, the index schema must be the promised 16-byte row
    (bigint signs + double l1), and a second call must REUSE the
    committed index (sentinel present, same files)."""
    import glob as g
    import os

    from parquet_exporter_spark.queries.llm8 import (
        _rbq_scratch_path,
        similarity_rabitq_persisted_probe,
        similarity_rabitq_topk,
    )

    served = similarity_rabitq_persisted_probe(spark, sf_dir).collect()
    inmem = similarity_rabitq_topk(spark, sf_dir).collect()
    # the unpersisted query takes the first 3 ids via ORDER BY/LIMIT,
    # the persisted one via vec_id < 3 — identical on the fixtures
    assert sorted(map(tuple, served)) == sorted(map(tuple, inmem))

    path = _rbq_scratch_path(sf_dir)
    assert os.path.isfile(os.path.join(path, "_COMPLETE"))
    sig = spark.read.parquet(path)
    assert dict(sig.dtypes) == {"vec_id": "bigint", "signs": "bigint", "l1": "double"}
    files_before = sorted(g.glob(os.path.join(path, "*.parquet")))
    similarity_rabitq_persisted_probe(spark, sf_dir).collect()
    assert sorted(g.glob(os.path.join(path, "*.parquet"))) == files_before


def test_hilbert_key_matches_reference_and_has_perfect_adjacency(spark):
    """The Spark HOF-fold xy2d must equal a straight-line Python
    reference on the FULL 32x32 grid, be bijective onto [0, 4^bits),
    and have ZERO adjacency violations (consecutive curve indices are
    4-neighbors) — the locality property that distinguishes Hilbert
    from Morton, where seam jumps are expected and measured here as a
    contrast."""
    from parquet_exporter_spark.sinks.layout import _hilbert_d, _interleave

    bits = 5
    n = 1 << bits

    def ref_xy2d(x, y):
        d, s = 0, n >> 1
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s >>= 1
        return d

    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.d
        for r in grid.select(
            "x", "y", _hilbert_d(F.col("x"), F.col("y"), bits).alias("d")
        ).collect()
    }
    assert len(got) == n * n
    pos = {}
    for (x, y), d in got.items():
        assert d == ref_xy2d(x, y)
        pos[d] = (x, y)
    assert sorted(pos) == list(range(n * n))  # bijective
    hil_jumps = sum(
        1
        for d in range(n * n - 1)
        if abs(pos[d][0] - pos[d + 1][0]) + abs(pos[d][1] - pos[d + 1][1]) != 1
    )
    assert hil_jumps == 0
    # contrast: Morton on the same grid DOES jump at power-of-two seams
    mor = {
        r.z: (r.x, r.y)
        for r in grid.select(
            "x", "y", _interleave([F.col("x"), F.col("y")], bits).alias("z")
        ).collect()
    }
    mor_jumps = sum(
        1
        for z in range(n * n - 1)
        if abs(mor[z][0] - mor[z + 1][0]) + abs(mor[z][1] - mor[z + 1][1]) != 1
    )
    assert mor_jumps > 0


def test_hilbert_key_rejects_wrong_arity(spark, sf_dir):
    import pytest

    from parquet_exporter_spark.sinks.layout import hilbert_key
    from parquet_exporter_spark.tables import read_table

    orders = read_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError):
        hilbert_key(orders, ["o_custkey"])
    with pytest.raises(ValueError):
        hilbert_key(orders, ["o_custkey", "o_totalprice", "o_orderkey"])


def test_bloom_index_never_false_negative_and_prunes(spark):
    """For a spread of known session ids the OWNING file must always
    survive pruning (Bloom = no false negatives), pruning must actually
    bite (≈1 of 8 files at the design FP rate), the Spark-side bit
    positions must equal the Python probe's, and an absent id's pruned
    read must return 0 rows through the read_kept guard."""
    import glob as g
    import hashlib

    from pyspark.sql import functions as F

    from parquet_exporter_spark.queries.extras import (
        HIGHCARD_SESSIONS,
        _bloom_scratch_dir,
    )
    from parquet_exporter_spark.sinks.bloom_index import (
        BLOOM_K,
        BLOOM_M,
        _positions,
        build_bloom_manifest,
        prune_with_bloom,
    )
    from parquet_exporter_spark.sources.manifest import read_kept

    scratch = _bloom_scratch_dir()
    if not os.path.isfile(os.path.join(scratch, "_bloom.parquet")):
        build_bloom_manifest(spark, HIGHCARD_SESSIONS, "session_id", manifest_dir=scratch)
    all_paths = sorted(g.glob(os.path.join(HIGHCARD_SESSIONS, "*.parquet")))
    assert len(all_paths) == 8

    # where each probe id actually lives (ground truth from the data)
    df = spark.read.parquet(HIGHCARD_SESSIONS).select(
        "session_id", F.input_file_name().alias("f")
    )
    probe_ids = [hashlib.md5(f"sess:{i}".encode()).hexdigest() for i in range(0, 12000, 997)]
    owner = {
        r.session_id: os.path.basename(r.f)
        for r in df.filter(F.col("session_id").isin(probe_ids)).collect()
    }
    assert len(owner) == len(probe_ids)
    kept_counts = []
    for sid in probe_ids:
        keep = prune_with_bloom(HIGHCARD_SESSIONS, sid, manifest_dir=scratch)
        kept_counts.append(len(keep))
        assert owner[sid] in {os.path.basename(p) for p in keep}  # no false negative
    assert sum(kept_counts) / len(kept_counts) < 2.5  # pruning actually bites

    # Spark build and Python probe share the exact bit-position contract
    sid = probe_ids[0]
    spark_pos = (
        spark.range(1)
        .select(
            *[
                (
                    F.conv(
                        F.substring(F.md5(F.concat(F.lit(f"bf{i}:"), F.lit(sid))), 1, 8),
                        16,
                        10,
                    ).cast("long")
                    % BLOOM_M
                ).alias(f"p{i}")
                for i in range(BLOOM_K)
            ]
        )
        .collect()[0]
    )
    assert list(spark_pos) == _positions(sid)

    # absent id: usually prunes everything; read stays schema-correct
    absent = hashlib.md5(b"sess:not-a-real-row").hexdigest()
    keep = prune_with_bloom(HIGHCARD_SESSIONS, absent, manifest_dir=scratch)
    got = (
        read_kept(spark, keep, all_paths)
        .filter(F.col("session_id") == absent)
        .count()
    )
    assert got == 0


def test_binseg_depth2_recovers_both_planted_shifts(spark):
    """Three regimes (8 days each at 10, 30, 60/day): level 1 must split
    at the stronger 30->60 boundary, level 2 must find the 10->30
    boundary inside the left half, and the constant right half must
    score 0 (earliest-day tiebreak)."""
    from parquet_exporter_spark.queries.timeseries import timeseries_binseg_depth2

    counts = [10] * 8 + [30] * 8 + [60] * 8
    d = _events_dir(spark, _volume_days(counts), "binseg_")
    try:
        got = {(r.level, r.seg): r for r in timeseries_binseg_depth2(spark, d).collect()}
        assert set(got) == {(1, "all"), (2, "L"), (2, "R")}
        start = dt.date(2024, 3, 1)
        assert got[(1, "all")].change_day == start + dt.timedelta(days=15)
        assert got[(2, "L")].change_day == start + dt.timedelta(days=7)
        assert got[(2, "L")].mean_before == 10.0 and got[(2, "L")].mean_after == 30.0
        assert got[(2, "R")].score == 0.0  # constant segment: no shift
        assert got[(1, "all")].score > got[(2, "L")].score > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_markov_transitions_rows_are_probabilities(spark, sf_dir):
    """Transition rows must form proper conditional distributions: each
    from_type's probabilities sum to ~1 and every n is positive."""
    from parquet_exporter_spark.queries.analytics import analytics_markov_transitions

    rows = analytics_markov_transitions(spark, sf_dir).collect()
    assert rows
    by_from = {}
    for r in rows:
        assert r.n > 0 and 0 < r.p <= 1
        by_from.setdefault(r.from_type, 0.0)
        by_from[r.from_type] += r.p
    for total in by_from.values():
        assert abs(total - 1.0) < 1e-4


def test_hilbert_files_prune_tighter_than_morton(spark):
    """The measured claim behind hilbert_key: range-partitioning sf0.01
    orders into 16 files by Hilbert key yields materially tighter
    per-file bounding boxes than the Morton key on the same grid — and
    box queries therefore touch fewer files (bboxes are exactly what
    min-max file skipping prunes on). Deterministic: ranks, ntile
    tiebreaks, and the box sample are all pinned."""
    import random

    from pyspark.sql import Window

    from parquet_exporter_spark.sinks.layout import hilbert_key, zorder_key
    from parquet_exporter_spark.tables import read_table

    orders = read_table(spark, "/root/testdata/sf0.01", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_files, bits = 16, 8
    hi = (1 << bits) - 1

    def bboxes(keyed, col):
        g = keyed.select(
            F.least(
                F.floor(
                    F.percent_rank().over(Window.orderBy("o_custkey")) * (hi + 1)
                ).cast("long"),
                F.lit(hi),
            ).alias("gx"),
            F.least(
                F.floor(
                    F.percent_rank().over(Window.orderBy("o_totalprice")) * (hi + 1)
                ).cast("long"),
                F.lit(hi),
            ).alias("gy"),
            F.ntile(n_files).over(Window.orderBy(col, "o_orderkey")).alias("f"),
        )
        return g.groupBy("f").agg(
            F.min("gx").alias("x0"),
            F.max("gx").alias("x1"),
            F.min("gy").alias("y0"),
            F.max("gy").alias("y1"),
        ).collect()

    def stats(bbox):
        area = sum((r.x1 - r.x0 + 1) * (r.y1 - r.y0 + 1) for r in bbox) / len(bbox)
        rng = random.Random(7)
        hits = 0
        for _ in range(200):
            qx, qy = rng.randint(0, hi - 32), rng.randint(0, hi - 32)
            for r in bbox:
                if not (r.x1 < qx or r.x0 > qx + 32 or r.y1 < qy or r.y0 > qy + 32):
                    hits += 1
        return area, hits / 200

    h_area, h_hits = stats(
        bboxes(hilbert_key(orders, ["o_custkey", "o_totalprice"], bits=bits), "_hvalue")
    )
    m_area, m_hits = stats(
        bboxes(zorder_key(orders, ["o_custkey", "o_totalprice"], bits=bits), "_zvalue")
    )
    # measured round-10: 4550 vs 6916 grid-cells (0.66x) and 2.21 vs
    # 2.98 files per 32x32 box query (0.74x); the regression bar leaves
    # headroom but the ORDERING must hold
    assert h_area < m_area * 0.85
    assert h_hits < m_hits * 0.9
    assert h_hits < 3.0  # absolute sanity: queries touch ~2 of 16 files


def test_wasserstein_measures_translation_distance(spark):
    """A clean translation must score W1 ~= the shift distance (the
    property PSI and KS cannot express: both saturate identically for a
    1-bin and a whole-range shift), and identical halves must score ~0
    — binned approximation error is bounded by one bin width."""
    from parquet_exporter_spark.queries.dq import dq_drift_wasserstein

    base = dt.datetime(2024, 3, 1)
    rows = []
    # ref half (early ts): value 10; cur half (late ts): value 20
    for i in range(100):
        rows.append((i, 1, base + dt.timedelta(minutes=i), "click", 10.0))
    for i in range(100):
        rows.append((1000 + i, 1, base + dt.timedelta(days=10, minutes=i), "click", 20.0))
    # a second type with NO drift: same values both halves
    for i in range(100):
        rows.append((2000 + i, 1, base + dt.timedelta(minutes=i), "view", 10.0 + (i % 11)))
        rows.append((3000 + i, 1, base + dt.timedelta(days=10, minutes=i), "view", 10.0 + (i % 11)))
    d = _events_dir(spark, rows, "w1drift_")
    try:
        got = {r.event_type: r for r in dq_drift_wasserstein(spark, d).collect()}
        # true W1 of the click translation is 10; grid resolution is
        # (20-10)/256 ~ 0.039, so the binned estimate sits within one width
        assert abs(got["click"].w1 - 10.0) <= 2 * got["click"].bin_width + 1e-9
        assert got["view"].w1 <= 2 * got["view"].bin_width + 1e-9
        assert got["click"].w1 > 100 * got["view"].w1 or got["view"].w1 == 0.0
    finally:
        shutil.rmtree(d, ignore_errors=True)
