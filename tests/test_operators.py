"""Operator behaviors the order-insensitive oracle compare can't see:
actual sort order, approximate-aggregate error bounds, sample bounds,
as-of join semantics on crafted input."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_exporter_spark.operators.asof import asof_join
from parquet_exporter_spark.registry import REGISTRY, _ensure_loaded
from parquet_exporter_spark.tables import read_table

_ensure_loaded()


def test_sort_multi_key_order(spark, sf_dir):
    rows = REGISTRY["sort_multi_key"].fn(spark, sf_dir).collect()
    keys = [(r.s_nationkey, r.s_acctbal) for r in rows]
    for (n1, b1), (n2, b2) in zip(keys, keys[1:]):
        assert n1 >= n2  # nationkey desc
        if n1 == n2 and b1 is not None and b2 is not None:
            assert b1 <= b2  # acctbal asc within nation


def test_topk_is_truly_top(spark, sf_dir):
    top = REGISTRY["topk_global"].fn(spark, sf_dir).collect()
    orders = read_table(spark, sf_dir, "orders")
    true_max = orders.agg(F.max("o_totalprice")).first()[0]
    assert top[0].o_totalprice == true_max
    prices = [r.o_totalprice for r in top]
    assert prices == sorted(prices, reverse=True)


def test_approx_distinct_error_bound(spark, sf_dir):
    # The query now emits its own bounded-error verdict (exact counts +
    # within-5% booleans); independently recompute the exact side so the
    # verdict is not a tautology.
    row = REGISTRY["agg_approx_distinct"].fn(spark, sf_dir).first()
    li = read_table(spark, sf_dir, "lineitem")
    assert row.exact_orders == li.select("l_orderkey").distinct().count()
    assert row.exact_parts == li.select("l_partkey").distinct().count()
    assert row.orders_within_tol and row.parts_within_tol


def test_sample_fraction_bounds(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    row = REGISTRY["sample_fraction"].fn(spark, sf_dir).first()
    assert row.n_total == li.count()
    assert row.sample_within_4sigma
    # seeded -> deterministic across runs (on the underlying sample)
    a = li.sample(fraction=0.1, seed=42).count()
    assert a == li.sample(fraction=0.1, seed=42).count()


def test_asof_join_crafted_semantics(spark):
    """Pin the as-of contract on a crafted case: latest prior row wins,
    equal timestamps match, missing prior -> NULL payload."""
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (2, 5, "e3"), (3, 10, "e4")],
        "k long, t long, ev string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 6, 60.0)],
        "k long, t long, payload double",
    )
    out = {
        r.ev: r.payload
        for r in asof_join(
            left, right, "k", "k", "t", "t", payload_cols=["payload"]
        ).collect()
    }
    assert out["e1"] == 100.0  # equal time: right row visible
    assert out["e2"] == 150.0  # latest prior of the two
    assert out["e3"] is None  # right row is AFTER the event
    assert out["e4"] is None  # key never seen on the right


def test_orc_roundtrip_preserves_values_and_pushdown(spark, sf_dir, tmp_path):
    """ORC sink/source: values survive the roundtrip bit-for-bit and the
    ORC scan gets the same predicate pushdown as parquet."""
    from parquet_exporter_spark.sinks.writers import write_orc

    src = read_table(spark, sf_dir, "supplier")
    out = str(tmp_path / "supplier_orc")
    write_orc(src, out)
    back = spark.read.orc(out)
    assert back.count() == src.count()
    assert back.schema == src.schema
    assert src.exceptAll(back).count() == 0 and back.exceptAll(src).count() == 0
    filtered = back.filter(F.col("s_suppkey") > 5).select("s_suppkey", "s_name")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(s_suppkey)" in plan


def test_hll_rollup_estimates_close_to_exact(spark, sf_dir):
    """Merged per-nation HLL sketches must estimate region-level distinct
    customers within the sketch's error bound (~2% at lgK=12, generous
    margin here) — proving sketches merge losslessly across groups."""
    got = {
        r.n_regionkey: r
        for r in REGISTRY["agg_hll_rollup"].fn(spark, sf_dir).collect()
    }
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    exact = {
        r.n_regionkey: r.n
        for r in orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_regionkey")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, e in exact.items():
        assert got[k].exact_customers == e
        assert got[k].approx_within_5pct, (k, e)


def test_count_min_sketch_never_undercounts(spark, sf_dir):
    """The CMS estimate for each priority must be >= its exact count and
    within eps*N of it (the count-min guarantee). The query emits that
    verdict per key; recompute the exact side independently."""
    from parquet_exporter_spark.queries.aggregates import agg_count_min_sketch

    rows = {
        r.o_orderpriority: r
        for r in agg_count_min_sketch(spark, sf_dir).collect()
    }
    orders = read_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for key, n in exact.items():
        assert rows[key].exact_count == n
        assert rows[key].never_undercounts and rows[key].within_eps_bound


def test_sample_stratified_bounds(spark, sf_dir):
    from parquet_exporter_spark.queries.sampling import STRATA_FRACTIONS
    from parquet_exporter_spark.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    sampled = docs.sampleBy("source", STRATA_FRACTIONS, seed=42)
    got = {
        r["source"]: r["n"]
        for r in sampled.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    # only recipe strata survive, each within +/-60% relative of its fraction
    assert set(got) <= set(STRATA_FRACTIONS)
    for src, frac in STRATA_FRACTIONS.items():
        if src not in totals:
            continue
        expect = totals[src] * frac
        assert 0.4 * expect <= got.get(src, 0) <= 1.6 * expect, (src, expect, got.get(src))
    # deterministic under the fixed seed
    again = docs.sampleBy("source", STRATA_FRACTIONS, seed=42)
    assert sorted(r["doc_id"] for r in sampled.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # the registry query reduces the sample to the per-stratum verdict shape:
    # every recipe stratum present, every 4-sigma bound met
    verdict = REGISTRY["sample_stratified"].fn(spark, sf_dir).collect()
    assert {r["source"] for r in verdict} == set(STRATA_FRACTIONS) & set(totals)
    assert all(r["sample_within_4sigma"] for r in verdict)


def test_cogrouped_pandas_matches_join_twin(spark, sf_dir):
    got = {
        r["c_custkey"]: (r["c_acctbal"], r["total_spend"])
        for r in REGISTRY["udf_cogrouped_pandas"].fn(spark, sf_dir).collect()
    }
    from pyspark.sql import functions as F

    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    twin = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("spend"))
    )
    want = {r["c_custkey"]: (r["c_acctbal"], r["spend"]) for r in twin.collect()}
    assert set(got) == set(want)
    for k, (bal, spend) in want.items():
        assert got[k][0] == bal
        # pandas sums per group sequentially, Spark partial-aggregates:
        # identical up to float addition order, compare with money tolerance
        assert abs(got[k][1] - spend) <= 0.011, (k, got[k][1], spend)


def test_map_in_arrow_matches_octet_length(spark, sf_dir):
    from pyspark.sql import functions as F

    got = {
        r["doc_id"]: r["n_bytes"]
        for r in REGISTRY["udf_map_in_arrow"].fn(spark, sf_dir).collect()
    }
    want = {
        r["doc_id"]: r["n"]
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", F.octet_length("text").alias("n"))
        .collect()
    }
    assert got == want


def test_gopher_filter_rule_semantics(spark, sf_dir):
    """Each rule in the Gopher-style filter must trip independently on
    crafted rows (the oracle compare only proves corpus-level parity)."""
    from parquet_exporter_spark.queries import llm4

    rows = [
        (1, "the " + "word " * 50),              # healthy: kept
        (2, "a b"),                               # too few words
        (3, "the " + ("x" * 40 + " ") * 30),      # mean word len too high
        (4, "the quick brown fox!!! ### $$$ %%% ^^^ &&& *** ((()))"),  # symbols
        (5, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm"),  # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # the registered fn reads the documents table; rebuild the same
    # expressions inline on the probe frame instead
    from pyspark.sql import functions as F2
    from parquet_exporter_spark.functions import text as T

    toks = T.tokens(F2.col("text"))
    word_count = F2.size(toks)
    mean_word_len = F2.aggregate(
        toks, F2.lit(0).cast("bigint"), lambda a, t: a + F2.length(t)
    ).cast("double") / F2.greatest(word_count, F2.lit(1))
    symbol_ratio = F2.length(
        F2.regexp_replace(F2.col("text"), "[a-zA-Z0-9 ]", "")
    ).cast("double") / F2.greatest(F2.length("text"), F2.lit(1))
    sw = F2.array(*[F2.lit(w) for w in T.STOPWORDS["en"]])
    stopword_hits = F2.size(F2.array_intersect(F2.array_distinct(toks), sw))
    kept = (
        word_count.between(llm4.MIN_WORDS, llm4.MAX_WORDS)
        & mean_word_len.between(llm4.MIN_MEAN_WORD_LEN, llm4.MAX_MEAN_WORD_LEN)
        & (symbol_ratio <= llm4.MAX_SYMBOL_RATIO)
        & (stopword_hits >= llm4.MIN_STOPWORD_HITS)
    )
    verdicts = {r.doc_id: r.kept for r in df.select("doc_id", kept.alias("kept")).collect()}
    assert verdicts == {1: True, 2: False, 3: False, 4: False, 5: False}, verdicts


def test_linear_interpolation_crafted(spark):
    """Gap of 3 days between observations 10.0 and 40.0 must fill 20, 30;
    leading/trailing gaps fall back to nearest-observed."""
    from pyspark.sql import Window

    rows = [
        (1, "2024-01-02", 10.0),
        (1, "2024-01-05", 40.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, d string, dv double").select(
        "user_id", F.to_date("d").alias("d"), "dv"
    )
    spine = spark.createDataFrame(
        [(1, f"2024-01-0{i}") for i in range(1, 7)], "user_id long, d string"
    ).select("user_id", F.to_date("d").alias("d"))
    joined = spine.join(ev, ["user_id", "d"], "left")
    w_prev = Window.partitionBy("user_id").orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.partitionBy("user_id").orderBy("d").rowsBetween(0, Window.unboundedFollowing)
    obs_d = F.when(F.col("dv").isNotNull(), F.col("d"))
    ctx = joined.select(
        "d", "dv",
        F.last("dv", True).over(w_prev).alias("prev_v"),
        F.last(obs_d, True).over(w_prev).alias("prev_d"),
        F.first("dv", True).over(w_next).alias("next_v"),
        F.first(obs_d, True).over(w_next).alias("next_d"),
    )
    interp = (
        F.when(F.col("dv").isNotNull(), F.col("dv"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * F.datediff("d", "prev_d").cast("double")
            / F.datediff("next_d", "prev_d").cast("double"),
        )
        .otherwise(F.coalesce("prev_v", "next_v"))
    )
    got = {str(r.d): r.v for r in ctx.select("d", interp.alias("v")).collect()}
    assert got == {
        "2024-01-01": 10.0,  # leading edge -> nearest observed
        "2024-01-02": 10.0,
        "2024-01-03": 20.0,
        "2024-01-04": 30.0,
        "2024-01-05": 40.0,
        "2024-01-06": 40.0,  # trailing edge -> nearest observed
    }, got


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    """The Efraimidis-Spirakis keys must favor longer documents: the
    selected set's mean weight exceeds the corpus mean weight."""
    sample = REGISTRY["sample_weighted"].fn(spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = sum(r.weight for r in sample) / len(sample)
    assert len(sample) == 25
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_pagerank_mass_conservation(spark, sf_dir):
    """Rank mass stays ~1 over the symmetric graph (no dangling nodes),
    and every rank is positive — the invariants the oracle's value-hash
    can't articulate."""
    ranks = REGISTRY["graph_pagerank"].fn(spark, sf_dir).collect()
    total = sum(r.rank for r in ranks)
    assert abs(total - 1.0) < 1e-3, total
    assert all(r.rank > 0 for r in ranks)


def test_asof_forward_crafted_semantics(spark):
    """Forward as-of: earliest following row wins, equal timestamps match,
    nothing after -> NULL payload."""
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 16, "e2"), (2, 7, "e3"), (3, 10, "e4")],
        "k long, t long, ev string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 6, 60.0)],
        "k long, t long, payload double",
    )
    out = {
        r.ev: r.payload
        for r in asof_join(
            left, right, "k", "k", "t", "t",
            payload_cols=["payload"], direction="forward",
        ).collect()
    }
    assert out["e1"] == 100.0  # equal time: right row visible
    assert out["e2"] is None   # nothing at or after t=16
    assert out["e3"] is None   # right row is BEFORE the event
    assert out["e4"] is None   # key never seen on the right


def test_global_rownum_deterministic_across_runs(spark, sf_dir):
    """Ids must depend only on the sort order (unique key), not on the
    range-partition boundary sampling: two independent runs agree row
    for row."""
    from parquet_exporter_spark.registry import REGISTRY

    fn = REGISTRY["ids_global_rownum"].raw_fn
    a = {r.o_orderkey: r.row_id for r in fn(spark, sf_dir).collect()}
    b = {r.o_orderkey: r.row_id for r in fn(spark, sf_dir).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(1, len(a) + 1))


def test_asof_nearest_ties_go_backward_and_one_sided_matches(spark):
    """Nearest semantics on hand-built rows: equidistant -> earlier row;
    only-before / only-after still match; keys with no right rows -> NULL."""
    from parquet_exporter_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 10, "mid"), (1, 3, "early"), (1, 30, "late"), (2, 5, "lonely")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 8, 80.0), (1, 12, 120.0), (1, 28, 280.0)],
        "k long, t long, payload double",
    )
    out = {
        r.tag: r.payload
        for r in asof_join_nearest(
            left, right, "k", "k", "t", "t", ["payload"]
        ).collect()
    }
    # t=10: dist 2 to both 8 and 12 -> tie goes BACKWARD (80.0)
    assert out["mid"] == 80.0
    # t=3: nothing before, nearest after is 8
    assert out["early"] == 80.0
    # t=30: nearest is 28 (dist 2) vs 12 (dist 18)
    assert out["late"] == 280.0
    # key 2 has no right rows at all
    assert out["lonely"] is None


def test_cached_table_serves_from_memory_and_stays_correct(spark, sf_dir):
    """Engine cache surface: a cached hot table materializes once and
    later scans read the InMemoryRelation (plan-visible), with values
    identical to the uncached read."""
    from parquet_exporter_spark.tables import read_table
    from pyspark.sql import functions as F

    nation = read_table(spark, sf_dir, "nation")
    before = {(r.n_nationkey, r.n_name) for r in nation.collect()}
    cached = nation.cache()
    try:
        cached.count()  # materialize
        agg = cached.groupBy().agg(F.count(F.lit(1)).alias("n"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
        after = {(r.n_nationkey, r.n_name) for r in cached.collect()}
        assert after == before
    finally:
        cached.unpersist()
