"""Behavior tests for the round-8 batch (queries/llm7.py): winnowing's
shared-substring guarantee, containment's asymmetric catch, MERGE branch
coverage, PPSWOR's weight bias, and the irregular-gap EWMA limits.
Value-level cross-engine checks live in test_correctness (oracle
parametrization); these pin the SEMANTIC claims the docstrings make."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_exporter_spark.functions import dedup as D
from parquet_exporter_spark.queries.llm7 import (
    _WIN_K,
    _WIN_W,
    winnowing_fingerprints,
)
from parquet_exporter_spark.registry import REGISTRY


def test_winnowing_shared_substring_guarantee(spark):
    """Any shared substring of length k+w-1 must contribute at least one
    COMMON fingerprint (the winnowing theorem) — even when the rest of
    both documents is completely different."""
    shared = "the quick brown fox jumps over the lazy dog tonight"
    assert len(shared) >= _WIN_K + _WIN_W - 1
    docs = spark.createDataFrame(
        [
            (1, "completely unrelated preamble text here " + shared),
            (2, shared + " followed by a different ending about parquet"),
            (3, "zero overlap with either document whatsoever, purely spark"),
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[1] & by_doc[2], "shared substring produced no common fingerprint"
    # and winnowing compresses: far fewer fingerprints than k-grams
    n_grams_1 = len("completely unrelated preamble text here " + shared) - _WIN_K + 1
    assert len(by_doc[1]) < n_grams_1 / 2


def test_containment_catches_doc_inside_doc(spark):
    """A short doc pasted inside a much longer one: Jaccard is diluted
    below threshold by the big doc's size, but containment of the small
    side stays ~1 — the pair must surface with cont_small_in_big high."""
    small = "the exact benchmark question text appears verbatim here once"
    filler = (
        "surrounding crawl page content about entirely different topics "
        "including cooking recipes and travel advice and sports scores "
    ) * 6
    docs = spark.createDataFrame(
        [(1, small), (2, filler + small + filler)],
        "doc_id long, text string",
    )
    pairs = D.winnow_containment_pairs(
        docs, winnowing_fingerprints, max_fp_df=20, min_shared=2,
        containment_threshold=0.5,
    ).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.id_a, p.id_b) == (1, 2)
    assert p.cont_a_in_b >= 0.95  # small doc almost fully inside big
    # Jaccard for the same pair is low — the measure containment exists for
    jac = D.minhash_lsh_pairs_portable(
        docs, n_hashes=8, band_size=2, jaccard_threshold=0.0
    ).collect()
    assert all(r.jaccard < 0.5 for r in jac)


def test_merge_upsert_exercises_all_branches(spark, sf_dir):
    rows = REGISTRY["sql_merge_upsert"].fn(spark, sf_dir).collect()
    actions = {r.action for r in rows}
    assert actions == {"kept", "updated", "inserted"}
    # inserted rows carry the synthetic key offset; kept rows only exist
    # for targets the source never touched
    assert all(r.c_custkey >= 3000000 for r in rows if r.action == "inserted")
    assert all(r.new_bal is not None for r in rows)
    # source = even keys: kept rows are exactly the odd-keyed targets
    assert all(r.c_custkey % 2 == 1 for r in rows if r.action == "kept")
    # the DELETE branch fired: matched (even) keys divisible by 10 are
    # gone — neither updated nor kept
    assert all(r.c_custkey % 10 != 0 for r in rows if r.action == "updated")
    survivors = {r.c_custkey for r in rows}
    from parquet_exporter_spark.tables import read_table as _rt

    matched_keys = (
        _rt(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") < 3000))
        .join(
            _rt(spark, sf_dir, "orders").select(
                F.col("o_custkey").alias("c_custkey")
            ),
            "c_custkey",
            "semi",
        )
    )
    deleted_expected = {r.c_custkey for r in matched_keys.collect()}
    assert deleted_expected and not (deleted_expected & survivors)


def test_priority_ppswor_prefers_heavy_weights(spark, sf_dir):
    sample = REGISTRY["sample_priority_ppswor"].fn(spark, sf_dir).collect()
    assert len(sample) == 200
    assert len({r.o_orderkey for r in sample}) == 200  # without replacement
    from parquet_exporter_spark.tables import read_table

    pop_mean = (
        read_table(spark, sf_dir, "orders")
        .agg(F.avg("o_totalprice").alias("m"))
        .collect()[0]
        .m
    )
    sample_mean = sum(r.weight for r in sample) / len(sample)
    # probability proportional to size: the sample's mean weight must sit
    # well above the population's
    assert sample_mean > 1.2 * pop_mean, (sample_mean, pop_mean)


def test_ewma_irregular_gap_limits(spark):
    """Decay limits: after a gap >> tau the EWMA tracks the new value;
    within a burst << tau it barely moves off the seed."""
    from parquet_exporter_spark.queries.llm7 import timeseries_ewma_irregular
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: seed 0.0, then value 10.0 after a one-year gap
        (1, 1, base, 0.0),
        (2, 1, base + dt.timedelta(days=365), 10.0),
        # user 2: seed 0.0, then 10.0 one second later (burst)
        (3, 2, base, 0.0),
        (4, 2, base + dt.timedelta(seconds=1), 10.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    import tempfile, os

    d = tempfile.mkdtemp(prefix="ewma_")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r.user_id: r.ewma for r in timeseries_ewma_irregular(spark, d).collect()}
    assert out[1] > 9.9  # long gap: a -> 1, tracks the new value
    assert out[2] < 0.01  # 1s gap vs tau=3600: a ~ 1/3601


def test_token_bucket_burst_then_throttle(spark):
    """Semantics pin: a burst admits exactly `burst` events, then
    admission tracks the refill rate — timestamp windows can't express
    this because the level depends on every prior admit decision."""
    from parquet_exporter_spark.queries.streaming import (
        _TB_BURST,
        _TB_RATE,
        stream_token_bucket_twin,
    )
    import datetime as dt
    import os
    import tempfile

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: 20 events in the same second (pure burst)
    for i in range(20):
        rows.append((i, 1, base + dt.timedelta(milliseconds=i), 1.0))
    # user 2: 20 events spaced 2s apart (refill 0.5/s -> one token per
    # event: every event admits)
    for i in range(20):
        rows.append((100 + i, 2, base + dt.timedelta(seconds=2 * i), 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    d = tempfile.mkdtemp(prefix="tb_")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r.user_id: r for r in stream_token_bucket_twin(spark, d).collect()}
    assert out[1].admitted == int(_TB_BURST)  # burst capped at capacity
    assert out[2].admitted == 20  # spaced traffic never throttles
    assert abs(out[1].tokens_left) < 0.02  # burst drained the bucket
    assert _TB_RATE == 0.5 and _TB_BURST == 5.0  # doc constants pinned


def test_token_bucket_oracle_single_event_user(spark):
    """Cross-engine pin for the 1-event edge: DuckDB's list_reduce on a
    1-element list returns the SEED element without applying the lambda,
    so the oracle's st[2]/st[3] are out-of-bounds NULLs there — the
    oracle must coalesce them to the init state (admitted=1,
    tokens=burst-1) or any dataset with a single-event user hash-fails
    against Spark's F.aggregate init. sf1 never exercises this (>=48
    events/user), hence the crafted fixture."""
    import datetime as dt
    import os
    import tempfile

    import duckdb

    from parquet_exporter_spark.queries.streaming import (
        _TB_BURST,
        stream_token_bucket_twin,
    )
    from tests.harness import canonical_rows

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, base, 1.0),  # user 1: exactly ONE event
        (2, 2, base, 1.0),  # user 2: three events, one mid-fold throttle
        (3, 2, base + dt.timedelta(seconds=1), 1.0),
        (4, 2, base + dt.timedelta(seconds=4), 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    d = tempfile.mkdtemp(prefix="tb1_")
    path = os.path.join(d, "events.parquet")
    df.write.mode("overwrite").parquet(path)

    sdf = stream_token_bucket_twin(spark, d).toPandas()
    single = sdf[sdf.user_id == 1].iloc[0]
    assert single.admitted == 1 and single.tokens_left == _TB_BURST - 1.0

    con = duckdb.connect()
    try:
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{path}/*.parquet'")
        odf = con.sql(REGISTRY["stream_token_bucket_twin"].oracle).df()
    finally:
        con.close()
    assert canonical_rows(sdf) == canonical_rows(odf)


def test_kalman_converges_to_constant_signal(spark):
    """A constant measurement stream must converge tightly onto the
    signal, and the adaptive gain means convergence is fast from a
    wrong-looking first observation."""
    from parquet_exporter_spark.queries.timeseries import timeseries_kalman_1d
    import datetime as dt
    import os
    import tempfile

    base = dt.datetime(2024, 1, 1)
    rows = [(0, 1, base, 100.0)]  # outlier seed
    for i in range(1, 30):
        rows.append((i, 1, base + dt.timedelta(seconds=i), 10.0))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    d = tempfile.mkdtemp(prefix="kal_")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = timeseries_kalman_1d(spark, d).collect()[0]
    assert out.n_points == 30
    # steady-state gain for q=0.01, r=1 is ~0.095, so 29 constant
    # measurements shrink the 90-unit seed error to ~1 percent of it
    assert abs(out.kalman_estimate - 10.0) < 1.0
    # and the estimate moved >98 percent of the way from seed to signal
    assert out.kalman_estimate < 12.0


def test_counter_reset_rate_handles_restarts(spark):
    """increase() contract: a reset books the post-reset value, never a
    negative delta."""
    from parquet_exporter_spark.queries.dq import dq_counter_reset_rate
    import datetime as dt
    import os
    import tempfile

    base = dt.datetime(2024, 1, 1)
    # counter: 5 -> 8 -> 12 (+3,+4), restart -> 2 -> 6 (+2 reset-value, +4)
    vals = [5.0, 8.0, 12.0, 2.0, 6.0]
    rows = [
        (i, 1, base + dt.timedelta(seconds=i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    d = tempfile.mkdtemp(prefix="ctr_")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = dq_counter_reset_rate(spark, d).collect()[0]
    assert out.n_resets == 1
    assert out.total_increase == 3 + 4 + 2 + 4  # 13.0, no negative delta


def test_widen_is_noop_on_wide_input(spark):
    """The 100 TB posture claim (SCALE.md round-8): a scan already at or
    above the session's shuffle width must pass through UNTOUCHED — no
    exchange is ever added to reshuffle a large corpus for 'widening'.
    And a narrow input widens to the session's shuffle width, capped by
    core count (never a bare session's 200-partition default)."""
    from parquet_exporter_spark.functions.dedup import _widen_if_undersplit

    target = min(
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        spark.sparkContext.defaultParallelism,
    )
    wide = spark.range(1000, numPartitions=target + 4)
    assert _widen_if_undersplit(wide) is wide  # identity, not just equal
    narrow = spark.range(1000, numPartitions=1)
    widened = _widen_if_undersplit(narrow)
    assert widened is not narrow
    assert widened.rdd.getNumPartitions() == target
