"""Round-9 hardening: positive-case fixtures for the two dq detectors
that had only ever been driver-stamped on 0 = 0 rows (a detector that has
never fired is unproven in the direction that matters), and the
result-equality contract for dq_sequence_gaps' scale-safe per-range
decomposition vs the legacy single-window form."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import duckdb

from parquet_exporter_spark.queries.dq import (
    dq_duplicate_full_rows,
    dq_sequence_gaps,
)
from parquet_exporter_spark.registry import REGISTRY
from tests.harness import canonical_rows

_BASE = dt.datetime(2024, 1, 1)
_EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events_dir(spark, rows, prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    spark.createDataFrame(rows, _EVENT_SCHEMA).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def _event(i, user=1, etype="click", value=1.0, props='{"k":1}'):
    return (i, _BASE + dt.timedelta(seconds=i), user, etype, value, props)


def _oracle_rows(data_dir, name, table="events"):
    con = duckdb.connect()
    try:
        con.sql(
            f"CREATE VIEW {table} AS SELECT * FROM "
            f"'{os.path.join(data_dir, table + '.parquet')}/*.parquet'"
        )
        return con.sql(REGISTRY[name].oracle).df()
    finally:
        con.close()


def test_sequence_gaps_detects_known_gap_ranges(spark):
    """The detector must FIRE: ids 1..10, 15..20, 50 have exactly two
    gap ranges — (11..14, 4 missing) and (21..49, 29 missing). Duplicate
    deliveries of an existing id must not fake a gap or a fill."""
    ids = list(range(1, 11)) + list(range(15, 21)) + [50, 50, 7]
    d = _events_dir(spark, [_event(i) for i in ids], "seqgap_")
    got = sorted(
        (r.gap_start, r.gap_end, r.missing)
        for r in dq_sequence_gaps(spark, d).collect()
    )
    assert got == [(11, 14, 4), (21, 49, 29)]
    # cross-engine: the oracle finds the same ranges on the same fixture
    sdf = dq_sequence_gaps(spark, d).toPandas()
    assert canonical_rows(sdf) == canonical_rows(_oracle_rows(d, "dq_sequence_gaps"))


def test_sequence_gaps_scale_safe_equals_legacy(spark):
    """Result equality between the range-decomposed default and the
    legacy global-window form, on an id set that spreads across many
    range partitions so cross-partition boundary gaps actually occur
    (32 shuffle partitions over ~90 ids => most gaps straddle tasks)."""
    ids = [i * 7 for i in range(1, 60)] + list(range(500, 540))
    d = _events_dir(spark, [_event(i) for i in ids], "seqgap_eq_")
    safe = sorted(
        (r.gap_start, r.gap_end, r.missing)
        for r in dq_sequence_gaps(spark, d, scale_safe=True).collect()
    )
    legacy = sorted(
        (r.gap_start, r.gap_end, r.missing)
        for r in dq_sequence_gaps(spark, d, scale_safe=False).collect()
    )
    assert safe == legacy
    # and both match the brute-force expectation
    s = sorted(set(ids))
    expected = sorted(
        (a + 1, b - 1, b - a - 1)
        for a, b in zip(s, s[1:])
        if b - a > 1
    )
    assert safe == expected


def test_sequence_gaps_scale_safe_plan_has_no_unbounded_gather(spark, sf_dir):
    """The registered (default) plan's only SinglePartition exchange is
    the |partitions|-row boundary-bounds window — the distinct-id set
    itself must flow through range/hash exchanges only. The legacy form
    is the known-bad shape: its gather carries every distinct id."""
    plan = (
        dq_sequence_gaps(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange SinglePartition") <= 1
    # the gather feeds the bounds window, not the id stream: it sits
    # above the per-__pid min/max aggregate
    assert "HashAggregate(keys=[__pid" in plan
    # the range partitioning itself lives inside the pinned
    # localCheckpoint (materialized blocks), scanned by both branches
    assert "Scan ExistingRDD" in plan
    legacy = (
        dq_sequence_gaps(spark, sf_dir, scale_safe=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" in legacy


def test_zorder_approx_equals_exact_on_rank_uniform_grid(spark):
    """On rank-uniform inputs (every value its own equi-width histogram
    bucket: 256 grid values, nbins=256, bits=8) the histogram-CDF rank
    degenerates to the exact percent_rank bucket, so the interleaved
    Morton keys must be EQUAL row for row — the equality contract that
    pins the approx path to the oracle-checked exact form."""
    from parquet_exporter_spark.sinks.layout import zorder_key, zorder_key_approx

    n = 256
    rows = [(i, float(i), float((i * 37) % n)) for i in range(n)]
    df = spark.createDataFrame(rows, "rid long, x double, y double")
    exact = {
        r.rid: r._zvalue
        for r in zorder_key(df, ["x", "y"], bits=8).collect()
    }
    approx = {
        r.rid: r._zvalue
        for r in zorder_key_approx(df, ["x", "y"], bits=8, nbins=n).collect()
    }
    assert exact == approx


def test_zorder_approx_plan_has_no_data_sized_gather(spark, sf_dir):
    """The default write path's key must not single-partition the frame:
    its only SinglePartition exchanges feed the <= nbins-row CDF tables.
    The exact form is the known gather (kept for the oracle twin only)."""
    from parquet_exporter_spark.sinks.layout import zorder_key, zorder_key_approx
    from parquet_exporter_spark.tables import read_table

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    plan = (
        zorder_key_approx(orders, ["o_custkey", "o_totalprice"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # presence of SinglePartition exchanges is fine; what matters is the
    # DIRECT child — every gather must carry an aggregate (the 1-row
    # min/max partials or the <= nbins-row CDF counts), never the raw
    # frame itself (the exact form's signature: exchange fed straight by
    # the FileScan so one task can sort every row)
    lines = plan.splitlines()
    assert any("Exchange SinglePartition" in ln for ln in lines)
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            child = lines[i + 1]
            assert "HashAggregate" in child, f"unbounded gather:\n{ln}\n{child}"
    exact_plan = (
        zorder_key(orders, ["o_custkey", "o_totalprice"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    elines = exact_plan.splitlines()
    raw_gather = any(
        "Exchange SinglePartition" in ln
        and "HashAggregate" not in elines[i + 1]
        for i, ln in enumerate(elines)
    )
    assert raw_gather  # the exact form DOES gather the frame — oracle twin only


def test_duplicate_full_rows_detects_known_duplicates(spark):
    """The detector must FIRE: one row delivered three times and another
    twice are reported with exact copy counts; a near-miss differing in
    ONE column (value) must NOT fire."""
    tripled = _event(1, user=7, value=2.5)
    doubled = _event(2, user=8, etype="view")
    near_miss_a = _event(3, user=9, value=1.0)
    near_miss_b = _event(3, user=9, value=1.25)  # same key, different value
    rows = [tripled, tripled, tripled, doubled, doubled, near_miss_a, near_miss_b]
    rows += [_event(i) for i in range(10, 15)]  # clean background
    d = _events_dir(spark, rows, "duprows_")
    out = dq_duplicate_full_rows(spark, d).collect()
    assert sorted(r.n_copies for r in out) == [2, 3]
    # cross-engine: hash construction (epoch_us vs unix_micros, double
    # formatting) agrees on rows that DO fire, not just on empty output
    sdf = dq_duplicate_full_rows(spark, d).toPandas()
    assert canonical_rows(sdf) == canonical_rows(
        _oracle_rows(d, "dq_duplicate_full_rows")
    )


def test_match_recognize_measures_on_crafted_sequence(spark):
    """One row PER MATCH with exact measures, on a hand-built history:
    'v c c s p' matches (noise tolerated mid-pattern), 'v c p' does NOT
    (the c{2,} quantifier demands two clicks), 'v e c c c p' matches
    with three clicks — and match ordinals count per user in order."""
    from parquet_exporter_spark.queries.llm8 import analytics_match_recognize

    symbols = "view click click signup purchase view click purchase view error click click click purchase".split()
    rows = [_event(i, user=1, etype=s) for i, s in enumerate(symbols)]
    # user 2: only the non-matching shape
    rows += [
        _event(100, user=2, etype="view"),
        _event(101, user=2, etype="click"),
        _event(102, user=2, etype="purchase"),
    ]
    d = _events_dir(spark, rows, "mr_")
    got = sorted(
        (r.user_id, r.match_seq, r.match_len, r.n_view, r.n_click)
        for r in analytics_match_recognize(spark, d).collect()
    )
    # match 1: vccsp (len 5, 2 clicks); the middle vcp is SKIPPED by the
    # quantifier; match 2: veccc p -> 'vecccp' (len 6, 3 clicks). Note
    # the regex scan resumes AFTER match 1, so the unmatched 'vcp' run
    # is consumed as it fails — exactly SKIP PAST LAST ROW semantics.
    assert got == [(1, 1, 5, 1, 2), (1, 2, 6, 1, 3)]
    # cross-engine on the same crafted fixture
    sdf = analytics_match_recognize(spark, d).toPandas()
    assert canonical_rows(sdf) == canonical_rows(
        _oracle_rows(d, "analytics_match_recognize")
    )


def _embeddings_dir(spark, vecs, prefix):
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    return d


def test_rabitq_discriminates_where_plain_sign_bits_cannot(spark):
    """The adversarial input plain sign-bit BQ is blind to: every vector
    has ALL-POSITIVE components, so every unrotated sign pattern is
    identical (Hamming distance 0 between all pairs — no ranking signal
    at all). The rotated quantizer must still put the one near-parallel
    vector first for the query."""
    import numpy as np

    from parquet_exporter_spark.queries.llm8 import similarity_rabitq_topk

    dim, n = 64, 20
    vecs = []
    for k in range(n):
        v = np.full(dim, 0.01)
        block = 4 * ((k % 15) + 1)  # blocks 4..60, never the query's 0..3
        v[block : block + 4] = 1.0
        vecs.append(v)
    q = np.full(dim, 0.01)
    q[0:4] = 1.0
    vecs[0] = q  # query vector: block 0
    vecs[5] = 1.1 * q + 0.001  # near-parallel to the query, nothing else is
    assert all((v > 0).all() for v in vecs)  # plain sign bits: all equal
    d = _embeddings_dir(spark, vecs, "rbq_")
    out = similarity_rabitq_topk(spark, d).collect()
    top1 = {r.query_id: r.neighbor_id for r in out if r.rank == 1}
    assert top1[0] == 5
    # cross-engine on the same crafted fixture
    sdf = similarity_rabitq_topk(spark, d).toPandas()
    assert canonical_rows(sdf) == canonical_rows(
        _oracle_rows(d, "similarity_rabitq_topk", table="embeddings")
    )


def test_rabitq_rotation_is_orthogonal(spark):
    """R = (1/sqrt(D)) H diag(d) must preserve norms (orthogonality) —
    the property that makes sign-of-rotated a valid quantizer: checked
    numerically via the same popcount-parity construction the query
    uses."""
    import numpy as np

    from parquet_exporter_spark.queries.llm8 import _RBQ_DIM, _RBQ_SIGNS

    H = np.array(
        [
            [1 - 2 * (bin(j & i).count("1") % 2) for i in range(_RBQ_DIM)]
            for j in range(_RBQ_DIM)
        ],
        dtype=float,
    )
    R = H @ np.diag(_RBQ_SIGNS) / np.sqrt(_RBQ_DIM)
    assert np.allclose(R @ R.T, np.eye(_RBQ_DIM), atol=1e-12)
    rng = np.random.default_rng(7)
    x = rng.normal(size=_RBQ_DIM)
    assert abs(np.linalg.norm(R @ x) - np.linalg.norm(x)) < 1e-12


def test_holt_linear_tracks_a_ramp_and_zeroes_trend_on_constants(spark):
    """Holt's trend state must converge to the true slope on a linear
    ramp (so forecast_1 predicts the next value) and decay to ~0 on a
    constant series; a single-event user reports the init state exactly
    (level = x1, trend = 0) on BOTH engines — the list_reduce seed-arity
    edge this round's token-bucket fix pinned."""
    from parquet_exporter_spark.queries.llm8 import timeseries_holt_linear

    rows = []
    for i in range(40):  # user 1: ramp x_t = t
        rows.append(_event(i, user=1, value=float(i)))
    for i in range(40):  # user 2: constant 7
        rows.append(_event(100 + i, user=2, value=7.0))
    rows.append(_event(500, user=3, value=42.0))  # user 3: single event
    d = _events_dir(spark, rows, "holt_")
    out = {r.user_id: r for r in timeseries_holt_linear(spark, d).collect()}
    assert abs(out[1].trend - 1.0) < 0.01  # slope recovered
    assert abs(out[1].forecast_1 - 40.0) < 0.2  # predicts the next point
    assert abs(out[2].trend) < 1e-6 and abs(out[2].level - 7.0) < 1e-6
    assert out[3].level == 42.0 and out[3].trend == 0.0
    sdf = timeseries_holt_linear(spark, d).toPandas()
    assert canonical_rows(sdf) == canonical_rows(
        _oracle_rows(d, "timeseries_holt_linear")
    )


def test_compaction_groups_packs_prefixes_and_isolates_partitions(spark):
    """Greedy prefix packing on crafted stats: three 30-row files pack
    with the 120-row file into group 0 (overshoot by at most one unit is
    the documented bias), the trailing 10-row file starts group 2, and a
    second partition's numbering is independent."""
    from parquet_exporter_spark.sinks.layout import compaction_groups

    stats = spark.createDataFrame(
        [
            ("A", "f1", 30),
            ("A", "f2", 30),
            ("A", "f3", 30),
            ("A", "f4", 120),
            ("A", "f5", 10),
            ("B", "g1", 250),
            ("B", "g2", 10),
        ],
        "partition_dir string, file_name string, n_rows long",
    )
    out = {
        (r.partition_dir, r.file_name): (r.compact_group, r.group_rows)
        for r in compaction_groups(stats, 100).collect()
    }
    assert out[("A", "f1")] == (0, 210)
    assert out[("A", "f2")] == (0, 210)
    assert out[("A", "f3")] == (0, 210)
    assert out[("A", "f4")] == (0, 210)  # joins at rows_before=90 < 100
    assert out[("A", "f5")] == (2, 10)  # rows_before=210 -> group 2
    assert out[("B", "g1")] == (0, 250)
    assert out[("B", "g2")] == (2, 10)  # B numbers independently


def _round6_half_up(x: float) -> float:
    """Spark's F.round / DuckDB's round use HALF_UP (away from zero) on
    the double's exact decimal expansion; Python's round() is banker's.
    The difference fires exactly on .5-ulp boundaries like 0.0390625
    (caught by hypothesis) — replays must quantize the engines' way."""
    import decimal

    return float(
        decimal.Decimal(x).quantize(decimal.Decimal("1e-6"), decimal.ROUND_HALF_UP)
    )


def test_holt_winters_learns_a_planted_weekly_cycle(spark):
    """Triple smoothing must FIRE on seasonality: 28 days of daily
    counts with one spiked weekday (8 events vs 1) must push that
    weekday's seasonal state positive and the seasonally-adjusted
    forecast above the trend-only one when the next day is the spike
    day. The whole output is also replayed exactly (round 6) by a
    straight-line Python fold of the published recurrence — the
    recurrence IS the contract — and cross-checked against the DuckDB
    oracle on the same fixture."""
    from parquet_exporter_spark.queries.llm8 import (
        _HW_ALPHA,
        _HW_BETA,
        _HW_GAMMA,
        _HW_PERIOD,
        timeseries_holt_winters,
    )

    epoch = dt.date(1970, 1, 1)
    start = dt.date(2024, 1, 1)
    spike_j = ((start - epoch).days + 3) % _HW_PERIOD  # an arbitrary weekday
    rows, eid = [], 0
    counts = []
    for d in range(28):
        day = start + dt.timedelta(days=d)
        j = (day - epoch).days % _HW_PERIOD
        n = 8 if j == spike_j else 1
        counts.append((j, float(n)))
        for k in range(n):
            rows.append(
                (
                    eid,
                    dt.datetime.combine(day, dt.time(1, 0)) + dt.timedelta(minutes=k),
                    1,
                    "click",
                    1.0,
                    '{"k":1}',
                )
            )
            eid += 1
    data_dir = _events_dir(spark, rows, "hw_")
    out = timeseries_holt_winters(spark, data_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == 28

    # straight-line replay of the recurrence
    a, b, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    level, trend = counts[0][1], 0.0
    seas = [0.0] * _HW_PERIOD
    for j, v in counts[1:]:
        level2 = a * (v - seas[j]) + (1 - a) * (level + trend)
        trend2 = b * (level2 - level) + (1 - b) * trend
        seas[j] = g * (v - level2) + (1 - g) * seas[j]
        level, trend = level2, trend2
    last_day = start + dt.timedelta(days=27)
    next_j = ((last_day - epoch).days + 1) % _HW_PERIOD
    assert r.level == _round6_half_up(level)
    assert r.trend == _round6_half_up(trend)
    assert r.season_min == _round6_half_up(min(seas))
    assert r.season_max == _round6_half_up(max(seas))
    assert r.forecast_1 == _round6_half_up(level + trend + seas[next_j])
    # the planted cycle was learned: spike weekday seasonal is strongly
    # positive, every other weekday's is negative (counts sit below the
    # level, which settles between 1 and 8)
    assert seas[spike_j] > 1.0
    assert r.season_max > 1.0 > 0 > r.season_min
    # cross-engine on the SAME crafted fixture
    sdf = timeseries_holt_winters(spark, data_dir).toPandas()
    assert canonical_rows(sdf) == canonical_rows(
        _oracle_rows(data_dir, "timeseries_holt_winters")
    )


def test_holt_winters_constant_series_is_a_fixpoint(spark):
    """A constant daily count is a fixpoint of all three recurrences:
    level == the constant, trend == 0, every seasonal == 0, and the
    forecast equals the constant."""
    from parquet_exporter_spark.queries.llm8 import timeseries_holt_winters

    start = dt.date(2024, 3, 4)
    rows = []
    for d in range(21):
        day = start + dt.timedelta(days=d)
        for k in range(3):
            rows.append(
                (
                    d * 3 + k,
                    dt.datetime.combine(day, dt.time(9, 0)) + dt.timedelta(minutes=k),
                    1,
                    "view",
                    1.0,
                    '{"k":1}',
                )
            )
    data_dir = _events_dir(spark, rows, "hw_const_")
    r = timeseries_holt_winters(spark, data_dir).collect()[0]
    assert (r.level, r.trend, r.season_min, r.season_max, r.forecast_1) == (
        3.0,
        0.0,
        0.0,
        0.0,
        3.0,
    )


def _lineitem_dir(spark, order_parts, prefix):
    """Write a crafted lineitem table: order_parts is {orderkey: [partkey]}."""
    rows = [
        (int(ok), int(pk))
        for ok, parts in order_parts.items()
        for pk in parts
    ]
    d = tempfile.mkdtemp(prefix=prefix)
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "lineitem.parquet"))
    return d


def test_kcore_peels_a_cascade_and_keeps_the_clique(spark):
    """The peel must CASCADE: part 5 (2 strong partners) dies in round
    one, which drops part 6 to 2 partners so it dies in round TWO — a
    plain degree>=3 threshold would have kept 6. The K4 clique {1,2,3,4}
    survives with core degree exactly 3 each. Cross-checked against the
    unrolled-CTE oracle on the same fixture."""
    from parquet_exporter_spark.queries.llm8 import graph_kcore

    order_parts = {
        101: [1, 2, 3, 4],  # K4, each pair co-ordered twice
        102: [1, 2, 3, 4],
        103: [1, 5],  # pendant 5: partners {1, 6}
        104: [1, 5],
        105: [1, 2, 6],  # 6: partners {1, 2, 5} => survives round 1
        106: [1, 2, 6],
        107: [5, 6],
        108: [5, 6],
        # one order listing part 7 on TWO lines next to part 8: the
        # (7,8) pair produces two joined rows from a SINGLE order, which
        # must NOT clear the >= 2 DISTINCT co-orders bar (countDistinct
        # regression) — 7 and 8 stay edgeless and out of the core
        109: [7, 7, 8],
    }
    d = _lineitem_dir(spark, order_parts, "kcore_")
    got = sorted((r.part_key, r.core_degree) for r in graph_kcore(spark, d).collect())
    assert got == [(1, 3), (2, 3), (3, 3), (4, 3)]
    sdf = graph_kcore(spark, d).toPandas()
    assert canonical_rows(sdf) == canonical_rows(
        _oracle_rows(d, "graph_kcore", table="lineitem")
    )


def test_manifest_prune_skips_files_and_loses_no_rows(spark):
    """Footer-stats pruning on the 8-file range-clustered fixture: the
    registered predicate keeps exactly 2 files, straddling file included,
    and the pruned read returns byte-identical rows to the full-glob
    filtered read. A file with no stats must be conservatively kept."""
    import glob as _glob

    from pyspark.sql import functions as F

    from parquet_exporter_spark.queries.extras import RANGED_EVENTS, _MANIFEST_LO
    from parquet_exporter_spark.sources.manifest import (
        FileStat,
        file_stats,
        prune_by_range,
    )

    paths = sorted(_glob.glob(os.path.join(RANGED_EVENTS, "*.parquet")))
    assert len(paths) == 8
    stats = file_stats(paths, "ts")
    # ranges are disjoint and ordered (the fixture is ts-clustered)
    for prev, cur in zip(stats, stats[1:]):
        assert prev.max_value < cur.min_value
    lo = dt.datetime.fromisoformat(_MANIFEST_LO)
    keep = prune_by_range(stats, lo=lo)
    assert len(keep) == 2  # 6 of 8 files skipped from footers alone
    # superset guarantee: pruned+filtered == full glob filtered
    pruned = (
        spark.read.parquet(*keep)
        .filter(F.col("ts").cast("timestamp") >= F.lit(_MANIFEST_LO).cast("timestamp"))
        .select("event_id")
    )
    full = (
        spark.read.parquet(*paths)
        .filter(F.col("ts").cast("timestamp") >= F.lit(_MANIFEST_LO).cast("timestamp"))
        .select("event_id")
    )
    assert sorted(r.event_id for r in pruned.collect()) == sorted(
        r.event_id for r in full.collect()
    )
    assert pruned.count() > 0
    # missing stats => never pruned
    blind = FileStat("x.parquet", 1, None, None)
    assert prune_by_range([blind], lo=lo) == ["x.parquet"]


def test_rabitq_fast_rotation_matches_expression_form(spark, sf_dir):
    """The Arrow-batched FWHT rotation (scale path) must produce the
    same ranked output as the oracle-parity expression form — identical
    top-k rows after the contract's round(6), and the raw rotated
    vectors equal to within float-reassociation tolerance."""
    from pyspark.sql import functions as F

    from parquet_exporter_spark.queries.llm8 import (
        rotate_hadamard,
        rotate_hadamard_fast,
        similarity_rabitq_topk,
    )
    from parquet_exporter_spark.tables import read_table

    slow = similarity_rabitq_topk(spark, sf_dir).collect()
    fast = similarity_rabitq_topk(spark, sf_dir, fast_rotation=True).collect()
    assert sorted(map(tuple, slow)) == sorted(map(tuple, fast))

    emb = read_table(spark, sf_dir, "embeddings").limit(50)
    both = emb.select(
        rotate_hadamard(F.col("embedding")).alias("a"),
        rotate_hadamard_fast(F.col("embedding")).alias("b"),
    ).collect()
    for r in both:
        for x, y in zip(r.a, r.b):
            assert abs(x - y) < 1e-9


def test_rabitq_fast_rotation_tolerates_null_and_ragged_rows(spark):
    """A NULL or wrong-length embedding must yield a NULL rotation, not
    poison the whole Arrow batch (np.asarray on a ragged list raises for
    every row in the batch)."""
    from pyspark.sql import functions as F

    from parquet_exporter_spark.queries.llm8 import _RBQ_DIM, rotate_hadamard_fast

    rows = [
        (0, [1.0] * _RBQ_DIM),
        (1, None),
        (2, [2.0] * (_RBQ_DIM // 2)),  # ragged: half-length vector
        (3, [-1.0] * _RBQ_DIM),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: r.r
        for r in df.select(
            "vec_id", rotate_hadamard_fast(F.col("embedding")).alias("r")
        ).collect()
    }
    assert got[1] is None and got[2] is None
    assert got[0] is not None and len(got[0]) == _RBQ_DIM
    # rotation of -x is -rotation(x): the valid rows really were rotated
    for a, b in zip(got[0], got[3]):
        assert abs(a + b) < 1e-12


def test_schema_evolution_reconciles_generations(spark):
    """mergeSchema must surface the union schema with NULLs exactly where
    a file predates a column: 500 gen0 rows (no props/device) and 500
    gen1 rows, with the merged frame still answering column-pruned
    predicates per file."""
    from pyspark.sql import functions as F

    from parquet_exporter_spark.queries.extras import EVOLVED_EVENTS

    df = spark.read.option("mergeSchema", "true").parquet(EVOLVED_EVENTS)
    assert set(df.columns) == {
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        "props",
        "device",
    }
    assert df.count() == 1000
    assert df.filter(F.col("props").isNull()).count() == 500
    assert df.filter(F.col("device").isNull()).count() == 500
    # the two generations are disjoint halves by event_id
    assert df.filter((F.col("event_id") < 500) & F.col("props").isNotNull()).count() == 0
    assert df.filter((F.col("event_id") >= 500) & F.col("device").isNull()).count() == 0
