"""Hypothesis property tests: randomized inputs against brute-force
reference implementations, catching edge cases fixtures miss (empty
groups, ties, all-null payloads, single-element sessions)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from parquet_exporter_spark.operators.asof import asof_join
from parquet_exporter_spark.operators.skew import salted_sum_count

_SETTINGS = dict(
    max_examples=8,  # each example spins Spark jobs; keep the loop tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=0, max_size=25
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(-99, 99)),
        min_size=0,
        max_size=25,
    ),
)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    # dedupe right rows per (key, time): asof_join requires it for
    # determinism (documented contract)
    rmap = {}
    for k, t, v in rights:
        rmap[(k, t)] = v
    rights = [(k, t, v) for (k, t), v in rmap.items()]

    left_df = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)] or [(None, None, None)],
        "lid long, k long, t long",
    ).filter(F.col("lid").isNotNull())
    right_df = spark.createDataFrame(
        rights or [(None, None, None)], "k long, t long, payload long"
    ).filter(F.col("k").isNotNull())

    got = {
        (r.lid, r.payload)
        for r in asof_join(
            left_df.withColumnRenamed("k", "lk"),
            right_df,
            left_key="lk",
            right_key="k",
            left_time="t",
            right_time="t",
            payload_cols=["payload"],
        )
        .select("lid", "payload")
        .collect()
    }

    expect = set()
    for i, (k, t) in enumerate(lefts):
        prior = [(rt, v) for (rk, rt, v) in rights if rk == k and rt <= t]
        expect.add((i, max(prior)[1] if prior else None))
    assert got == expect


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-1000, 1000)),
        min_size=1,
        max_size=40,
    ),
    n_salts=st.integers(1, 8),
)
def test_salted_agg_matches_plain_bruteforce(spark, rows, n_salts):
    df = spark.createDataFrame([(k, float(v)) for k, v in rows], "k long, v double")
    got = {
        r.k: (r.sum_v, r.n_rows)
        for r in salted_sum_count(df, "k", "v", n_salts=n_salts).collect()
    }
    expect = {}
    for k, v in rows:
        s, c = expect.get(k, (0.0, 0))
        expect[k] = (s + v, c + 1)
    assert {k: v[1] for k, v in got.items()} == {k: v[1] for k, v in expect.items()}
    for k in expect:
        assert abs(got[k][0] - expect[k][0]) < 1e-6
