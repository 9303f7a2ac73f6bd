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


@settings(**_SETTINGS)
@given(
    words=st.lists(
        st.text(alphabet="abcdefg 0123456789.@-", min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    ),
    seeds=st.lists(st.integers(0, 10**9), min_size=0, max_size=3),
)
def test_pii_redaction_leaves_no_matches(spark, words, seeds):
    """After the three-pass redaction, no email/IP/phone pattern matches
    remain — including PII injected mid-text and adversarial near-PII
    fragments from the random alphabet."""
    from parquet_exporter_spark.queries.llm2 import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
        redact_pii,
    )

    text = " ".join(words)
    for s in seeds:
        text += f" user{s}@mail{s % 97}.example or {s % 900 + 100:03d}-{s % 10000:04d} at {s % 256}.{s % 251}.{s % 240}.{s % 17}"
    df = spark.createDataFrame([(text,)], "raw string")
    red = df.select(redact_pii(F.col("raw")).alias("r"))
    counts = red.select(
        F.regexp_count("r", F.lit(EMAIL_RE)).alias("e"),
        F.regexp_count("r", F.lit(IPV4_RE)).alias("i"),
        F.regexp_count("r", F.lit(PHONE_RE)).alias("p"),
    ).collect()[0]
    assert (counts.e, counts.i, counts.p) == (0, 0, 0), red.collect()


@settings(**_SETTINGS)
@given(
    vec=st.lists(
        st.floats(-1000, 1000, allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=16,
    ).filter(lambda v: max(abs(x) for x in v) > 1e-6)
)
def test_quantize_int8_bounds_and_error(spark, vec):
    from parquet_exporter_spark.queries.llm2 import quantize_int8

    df = spark.createDataFrame([(vec,)], "e array<double>")
    q = df.select(quantize_int8(F.col("e")).alias("q")).collect()[0].q
    max_abs = max(abs(x) for x in vec)
    assert all(-127 <= qi <= 127 for qi in q), q
    assert 127 in q or -127 in q  # the max-|x| element saturates the scale
    scale = max_abs / 127.0
    for x, qi in zip(vec, q):
        assert abs(x - qi * scale) <= scale / 2 + 1e-9 * max_abs, (x, qi)


@settings(**_SETTINGS)
@given(
    toks=st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=2, max_size=30)
)
def test_repetition_ratios_match_bruteforce(spark, toks):
    from collections import Counter

    from parquet_exporter_spark.queries.llm2 import repetition_ratios

    df = spark.createDataFrame([(0, " ".join(toks))], "doc_id long, text string")
    row = repetition_ratios(df).collect()[0]
    bigrams = Counter(
        f"{a} {b}" for a, b in zip(toks, toks[1:])
    )
    total = sum(bigrams.values())
    # _round6_half_up, not round(): Spark rounds HALF_UP, Python's
    # round() is banker's — small-integer ratios can land exactly on a
    # .5 boundary at the 6th decimal (e.g. 9/32)
    assert row.top_bigram_frac == _round6_half_up(max(bigrams.values()) / total)
    assert row.dup_bigram_frac == _round6_half_up(1.0 - len(bigrams) / total)


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="abcd ", min_size=6, max_size=40), min_size=2, max_size=14
    ),
    dup_of=st.integers(0, 13),
)
def test_prefix_filter_join_complete_vs_bruteforce(spark, texts, dup_of):
    """Prefix filtering must find EVERY pair with shingle Jaccard >= 0.8
    (the algorithm's no-false-negatives guarantee) and nothing below the
    threshold — checked against a Python all-pairs brute force. A planted
    near-duplicate keeps the >= t branch exercised."""
    from parquet_exporter_spark.functions.dedup import prefix_filter_jaccard_pairs

    # plant one exact duplicate so high-similarity pairs exist
    if texts:
        texts = texts + [texts[dup_of % len(texts)]]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def shingles(t: str) -> set[str]:
        norm = " ".join(t.lower().split())
        k = 5
        return {norm[i : i + k] for i in range(max(len(norm) - k + 1, 1))}

    sets = {i: shingles(t) for i, t in enumerate(texts) if shingles(t)}
    expected = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if round(j, 6) >= 0.8:
                expected.add((a, b))

    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_filter_jaccard_pairs(docs).collect()
    }
    assert got == expected


# ---------------------------------------------------------------- codecs
# Pure-Python round-trips: no Spark jobs, so these can afford many more
# examples than the operator properties above.

_CODEC_SETTINGS = dict(max_examples=40, deadline=None)


@settings(**_CODEC_SETTINGS)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, seed):
    import numpy as np

    from parquet_exporter_spark.operators import codecs

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    back = codecs.decode_png(codecs.encode_png(img))
    assert back.shape == (h, w, c)
    assert np.array_equal(back, img)


@settings(**_CODEC_SETTINGS)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),  # odd widths exercise BMP row padding
    gray=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_property(h, w, gray, seed):
    import numpy as np

    from parquet_exporter_spark.operators import codecs

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    back = codecs.decode_bmp(codecs.encode_bmp(img))
    want = np.repeat(img[:, :, None], 3, axis=2) if gray else img
    assert np.array_equal(back, want)


@settings(**_CODEC_SETTINGS)
@given(
    n=st.integers(1, 400),
    ch=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    import numpy as np

    from parquet_exporter_spark.operators import codecs

    rng = np.random.default_rng(seed)
    # exact PCM16 grid so the round-trip must be bit-faithful
    k = rng.integers(-32768, 32768, size=(n, ch)).astype(np.float64)
    samples = k / 32767.0
    r, nch, back = codecs.decode_wav(codecs.encode_wav(samples, rate))
    assert (r, nch) == (rate, ch)
    assert back.shape == (n, ch)
    assert np.array_equal(
        np.round(back * 32768.0), np.clip(k, -32768, 32767)
    )


import contextlib


@contextlib.contextmanager
def _events_dir(spark, rows, tmpdir_prefix):
    """Write synthetic events rows to a temp dir read_table can serve;
    context manager so every hypothesis example cleans up its dir (a
    bare mkdtemp accumulated hundreds of dirs across runs)."""
    import os
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=tmpdir_prefix)
    try:
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        yield d
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(**_SETTINGS)
@given(
    gaps=st.lists(st.integers(0, 30), min_size=1, max_size=40),
)
def test_token_bucket_invariants(spark, gaps):
    """For ANY arrival pattern: admitted is within [1, n] and never
    exceeds what the refill physics allow (burst + elapsed*rate,
    rounded up by the discrete token grain); the final level sits in
    [0, burst]; a brute-force Python replay agrees exactly."""
    import datetime as dt

    from parquet_exporter_spark.queries.streaming import (
        _TB_BURST,
        _TB_RATE,
        stream_token_bucket_twin,
    )

    base = dt.datetime(2024, 1, 1)
    t, rows = 0, []
    for i, g in enumerate(gaps):
        t += g
        rows.append((i, 1, base + dt.timedelta(seconds=t), 1.0))
    with _events_dir(spark, rows, "tbprop_") as d:
        out = stream_token_bucket_twin(spark, d).collect()[0]

    # brute-force replay (same recurrence, plain Python)
    times = sorted(range(len(gaps)), key=lambda i: (rows[i][2], rows[i][0]))
    tokens, admitted, prev = _TB_BURST - 1.0, 1, rows[times[0]][2]
    for i in times[1:]:
        ts = rows[i][2]
        tokens = min(_TB_BURST, tokens + (ts - prev).total_seconds() * _TB_RATE)
        if tokens >= 1.0:
            tokens -= 1.0
            admitted += 1
        prev = ts
    assert out.admitted == admitted
    assert 1 <= out.admitted <= len(rows)
    assert -1e-9 <= out.tokens_left <= _TB_BURST
    elapsed = (rows[times[-1]][2] - rows[times[0]][2]).total_seconds()
    assert out.admitted <= _TB_BURST + elapsed * _TB_RATE + 1


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.floats(-1e3, 1e3, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=30,
    ),
)
def test_kalman_estimate_stays_in_observed_hull(spark, vals):
    """The Kalman estimate is a convex combination of observations, so
    for ANY measurement sequence it must stay inside [min, max] of the
    observed values; a brute-force replay agrees to float precision."""
    import datetime as dt

    from parquet_exporter_spark.queries.timeseries import (
        _KALMAN_Q,
        _KALMAN_R,
        timeseries_kalman_1d,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, base + dt.timedelta(seconds=i), float(v))
        for i, v in enumerate(vals)
    ]
    with _events_dir(spark, rows, "kalprop_") as d:
        out = timeseries_kalman_1d(spark, d).collect()[0]

    x, p = vals[0], 1.0
    for z in vals[1:]:
        p_pred = p + _KALMAN_Q
        k = p_pred / (p_pred + _KALMAN_R)
        x = x + k * (z - x)
        p = (1 - k) * p_pred
    assert abs(out.kalman_estimate - round(x, 6)) < 1e-9
    assert min(vals) - 1e-6 <= out.kalman_estimate <= max(vals) + 1e-6


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.floats(0, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=30,
    ),
)
def test_counter_reset_increase_never_negative(spark, vals):
    """increase() invariants for ANY counter trajectory: the corrected
    total is >= 0, >= the plain end-minus-start when no reset occurred,
    and the reset count matches a brute-force scan."""
    import datetime as dt

    from parquet_exporter_spark.queries.dq import dq_counter_reset_rate

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, base + dt.timedelta(seconds=i), float(v))
        for i, v in enumerate(vals)
    ]
    with _events_dir(spark, rows, "ctrprop_") as d:
        out = dq_counter_reset_rate(spark, d).collect()[0]

    resets = sum(1 for a, b in zip(vals, vals[1:]) if b < a)
    total = sum(b - a if b >= a else b for a, b in zip(vals, vals[1:]))
    assert out.n_resets == resets
    assert abs(out.total_increase - round(total, 6)) < 1e-6
    assert out.total_increase >= -1e-9


@settings(max_examples=200, deadline=None)  # pure python, no Spark jobs
@given(
    files=st.lists(
        st.one_of(
            st.tuples(st.integers(-50, 50), st.integers(0, 40)),  # (min, width)
            st.none(),  # a file with no footer stats
        ),
        min_size=0,
        max_size=20,
    ),
    lo=st.one_of(st.none(), st.integers(-60, 60)),
    hi=st.one_of(st.none(), st.integers(-60, 60)),
)
def test_manifest_prune_never_drops_an_intersecting_file(files, lo, hi):
    """Safety property of stats pruning: a file whose [min, max] range
    intersects the predicate interval is ALWAYS kept (no false
    negatives — false positives are the residual filter's job), and a
    file with no stats is never pruned. Also exactness: a kept file with
    stats really does intersect."""
    from parquet_exporter_spark.sources.manifest import FileStat, prune_by_range

    stats = []
    for i, f in enumerate(files):
        if f is None:
            stats.append(FileStat(f"f{i}", 1, None, None))
        else:
            mn, width = f
            stats.append(FileStat(f"f{i}", 1, mn, mn + width))
    kept = set(prune_by_range(stats, lo=lo, hi=hi))

    def intersects(s):
        if s.min_value is None:
            return True  # unknowable => must keep
        if lo is not None and s.max_value < lo:
            return False
        if hi is not None and s.min_value > hi:
            return False
        return True

    for s in stats:
        assert (s.path in kept) == intersects(s)


def _round6_half_up(x: float) -> float:
    """Spark's F.round / DuckDB's round use HALF_UP (away from zero) on
    the double's exact decimal expansion; Python's round() is banker's.
    The difference fires exactly on .5-ulp boundaries like 0.0390625
    (caught by hypothesis) — replays must quantize the engines' way."""
    import decimal

    return float(
        decimal.Decimal(x).quantize(decimal.Decimal("1e-6"), decimal.ROUND_HALF_UP)
    )


@settings(**_SETTINGS)
@given(
    counts=st.lists(st.integers(0, 5), min_size=1, max_size=45).filter(
        lambda c: any(v > 0 for v in c)
    ),
)
def test_holt_winters_fold_matches_bruteforce_replay(spark, counts):
    """For ANY daily-count series (0 = a gap day contributing no update,
    including gaps that skip whole weeks), the 9-state Spark fold must
    equal a straight-line Python replay of the published recurrence at
    the contract's rounding — seed arity, calendar-weekday seasonal
    indexing, and gap handling all pinned by randomization rather than
    one crafted cycle."""
    import datetime as dt
    import os
    import tempfile

    from parquet_exporter_spark.queries.llm8 import (
        _HW_ALPHA,
        _HW_BETA,
        _HW_GAMMA,
        _HW_PERIOD,
        timeseries_holt_winters,
    )

    epoch = dt.date(1970, 1, 1)
    start = dt.date(2024, 5, 6)
    rows, eid, series = [], 0, []
    for off, n in enumerate(counts):
        if n == 0:
            continue
        day = start + dt.timedelta(days=off)
        series.append(((day - epoch).days % _HW_PERIOD, float(n), day))
        for k in range(n):
            rows.append(
                (
                    eid,
                    1,
                    dt.datetime.combine(day, dt.time(8, 0))
                    + dt.timedelta(minutes=k),
                    "view",
                    1.0,
                )
            )
            eid += 1
    import shutil

    d = tempfile.mkdtemp(prefix="hwprop_")
    try:
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts timestamp, event_type string, value double",
        ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))

        out = timeseries_holt_winters(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert len(out) == 1
    r = out[0]
    assert r.n_days == len(series)

    a, b, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    level, trend = series[0][1], 0.0
    seas = [0.0] * _HW_PERIOD
    for j, v, _ in series[1:]:
        level2 = a * (v - seas[j]) + (1 - a) * (level + trend)
        trend2 = b * (level2 - level) + (1 - b) * trend
        seas[j] = g * (v - level2) + (1 - g) * seas[j]
        level, trend = level2, trend2
    next_j = ((series[-1][2] - epoch).days + 1) % _HW_PERIOD
    assert r.level == _round6_half_up(level)
    assert r.trend == _round6_half_up(trend)
    assert r.season_min == _round6_half_up(min(seas))
    assert r.season_max == _round6_half_up(max(seas))
    assert r.forecast_1 == _round6_half_up(level + trend + seas[next_j])


@settings(**_SETTINGS)
@given(
    counts=st.lists(st.integers(1, 40), min_size=2, max_size=25),
)
def test_changepoint_meanshift_matches_bruteforce_argmax(spark, counts):
    """For ANY daily-count series, the windowed changepoint must equal a
    straight-line Python argmax of the published statistic
    |mean_L - mean_R| * sqrt(k(n-k)/n) with the day tiebreak — prefix
    sums, divisions, and sqrt all replayed exactly."""
    import datetime as dt
    import math

    from parquet_exporter_spark.queries.timeseries import (
        timeseries_changepoint_meanshift,
    )

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for off, n in enumerate(counts):
        for k in range(n):
            rows.append(
                (eid, 1, base + dt.timedelta(days=off, minutes=k), "view", 1.0)
            )
            eid += 1
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    d = _tempfile.mkdtemp(prefix="chgprop_")
    try:
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts timestamp, event_type string, value double",
        ).write.mode("overwrite").parquet(_os.path.join(d, "events.parquet"))
        got = timeseries_changepoint_meanshift(spark, d).collect()
        assert len(got) == 1
        r = got[0]
    finally:
        _shutil.rmtree(d, ignore_errors=True)

    n = len(counts)
    total = float(sum(counts))
    best = None  # strict > keeps the EARLIEST day on ties, the contract's tiebreak
    cum = 0.0
    for k in range(1, n):
        cum += counts[k - 1]
        mb = cum / k
        ma = (total - cum) / (n - k)
        score = abs(mb - ma) * math.sqrt(k * (n - k) / n)
        if best is None or score > best[0]:
            best = (score, k - 1, mb, ma)
    exp_score, exp_idx, exp_mb, exp_ma = best
    assert r.change_day == (base + dt.timedelta(days=exp_idx)).date()
    assert r.score == round(exp_score, 6)
    assert r.mean_before == round(exp_mb, 6)
    assert r.mean_after == round(exp_ma, 6)
