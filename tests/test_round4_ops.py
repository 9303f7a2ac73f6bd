"""Cross-operator invariants for the round's additions: facts that must
hold BETWEEN operators (level-consistency, partition-of-unity), beyond
each one's own oracle match."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_exporter_spark.registry import REGISTRY, _ensure_loaded
from parquet_exporter_spark.tables import read_table

_ensure_loaded()


def q(name, spark, sf_dir):
    return REGISTRY[name].raw_fn(spark, sf_dir)


def test_hierarchical_rollup_levels_are_consistent(spark, sf_dir):
    """Every level must conserve the event count: merging partials can
    never lose or invent rows (minute == hour == day == raw count)."""
    out = q("timeseries_hierarchical_rollup", spark, sf_dir).toPandas()
    raw_n = read_table(spark, sf_dir, "events").count()
    by_level = out.groupby("level")["n_events"].sum()
    assert set(by_level.index) == {"minute", "hour", "day"}
    assert (by_level == raw_n).all(), by_level.to_dict()


def test_ab_test_arms_partition_users(spark, sf_dir):
    """The two arms are a partition of the distinct user set."""
    row = q("ab_test_proportions", spark, sf_dir).collect()[0]
    n_users = (
        read_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert row.n_a + row.n_b == n_users
    assert 0 <= row.conv_a <= row.n_a and 0 <= row.conv_b <= row.n_b


def test_kfold_folds_partition_documents(spark, sf_dir):
    """Folds 0..4 partition the corpus: sizes sum to the doc count and
    every fold id is in range."""
    out = q("split_kfold_assign", spark, sf_dir).toPandas()
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert out["n_docs"].sum() == n_docs
    assert set(out["fold"]).issubset({0, 1, 2, 3, 4})


def test_merge_upsert_actions_are_mutually_consistent(spark, sf_dir):
    """insert keys must not exist pre-cutoff, keep keys must not appear
    post-cutoff, and tombstoned keys must be absent from the output."""
    events = read_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    pre = {r.user_id for r in events.filter(F.col("ts") < cutoff).select("user_id").distinct().collect()}
    post = {r.user_id for r in events.filter(F.col("ts") >= cutoff).select("user_id").distinct().collect()}
    out = q("cdc_merge_upsert", spark, sf_dir).collect()
    by_action: dict[str, set] = {}
    for r in out:
        by_action.setdefault(r.action, set()).add(r.user_id)
    assert by_action.get("insert", set()).isdisjoint(pre)
    assert by_action.get("keep", set()).isdisjoint(post)
    assert by_action.get("update", set()) <= (pre & post)


def test_containment_detects_planted_superset(spark, sf_dir):
    """A document fully quoted inside a larger one must be flagged with
    containment 1.0 in the quoted->host direction (the asymmetric signal
    symmetric Jaccard misses). Runs the operator's own expression path
    on crafted rows via a temp view swap-in of the same shape."""
    docs = read_table(spark, sf_dir, "documents")
    base = docs.limit(1).collect()[0]
    quoted = " ".join(["alpha bravo charlie delta echo foxtrot golf hotel"] * 2)
    host = quoted + " " + base.text
    crafted = spark.createDataFrame(
        [(900001, quoted, "en", "crafted", len(quoted)),
         (900002, host, "en", "crafted", len(host))],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    from parquet_exporter_spark.queries.llm6 import CONTAIN_SHINGLE, CONTAIN_TAU
    from parquet_exporter_spark.functions import text as T

    toks = T.tokens(F.col("text"))
    n = F.size(toks)
    shingles = F.when(
        n >= CONTAIN_SHINGLE,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - CONTAIN_SHINGLE + 1),
                lambda i: F.array_join(F.slice(toks, i, CONTAIN_SHINGLE), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = crafted.select("doc_id", F.explode(shingles).alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .join(sizes, F.col("id_a") == F.col("doc_id"))
        .select(
            "id_a",
            "id_b",
            (F.col("n_shared") / F.col("n_sh").cast("double")).alias("containment"),
        )
        .collect()
    )
    directed = {(r.id_a, r.id_b): r.containment for r in pairs}
    assert directed[(900001, 900002)] >= CONTAIN_TAU  # quoted inside host
    assert directed[(900001, 900002)] == 1.0
    # host direction is diluted by its extra text, far below tau
    assert directed[(900002, 900001)] < directed[(900001, 900002)]


def test_time_bounded_funnel_is_subset_of_unbounded(spark, sf_dir):
    """Adding time bounds can only REMOVE conversions: users converting
    within (1h click, 24h purchase) windows are a subset of the users
    passing the unbounded ordered funnel's stages."""
    bounded = q("funnel_time_bounded", spark, sf_dir).toPandas()
    unbounded = q("funnel_three_step", spark, sf_dir).collect()[0]
    assert int(bounded["t_click"].notna().sum()) <= unbounded.n_click_after_view
    # every bounded row has a view; stage timestamps are ordered
    assert bounded["t_view"].notna().all()
    ok = bounded.dropna(subset=["t_purchase"])
    assert (ok["t_view"] <= ok["t_click"]).all()
    assert (ok["t_click"] <= ok["t_purchase"]).all()
    assert (ok["converted"] == 1).all()


def test_normalized_dedup_only_merges_groups(spark, sf_dir):
    """Canonicalization is a surjection: it can merge exact-hash groups,
    never split them — so group count is <= and total copies conserved."""
    exact = q("dedup_exact_hash", spark, sf_dir).toPandas()
    norm = q("dedup_exact_normalized", spark, sf_dir).toPandas()
    assert len(norm) <= len(exact)
    assert norm["n_copies"].sum() == exact["n_copies"].sum()


def test_ngram_novelty_conservation(spark, sf_dir):
    """Each distinct trigram is novel for exactly one doc: sum(n_novel)
    == |distinct grams|; the earliest contributing doc is fully novel."""
    out = q("text_ngram_novelty", spark, sf_dir).toPandas()
    assert (out["n_novel"] <= out["n_grams"]).all()
    first = out.loc[out["doc_id"].idxmin()]
    assert first["novelty"] == 1.0
    # every doc's grams that are NOT novel were claimed by an earlier doc:
    # total novel grams can never exceed the distinct-gram universe, and
    # docs claiming novelty must jointly cover it exactly once
    assert out["n_novel"].sum() <= out["n_grams"].sum()


def test_record_high_twin_matches_running_max(spark, sf_dir):
    """The last record-high per user equals the user's true max value,
    and record indexes count exactly the emitted rows."""
    twin = q("stream_record_highs_twin", spark, sf_dir).toPandas()
    ev = read_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.max("value").alias("true_max")
    ).toPandas()
    last = twin.sort_values("n_records").groupby("user_id").last().reset_index()
    m = last.merge(ev, on="user_id")
    assert len(m) == len(ev)  # every user has at least one record (their first event)
    assert (abs(m["new_high"] - m["true_max"].round(6)) < 1e-9).all()
    counts = twin.groupby("user_id")["n_records"].max()
    sizes = twin.groupby("user_id").size()
    assert (counts == sizes).all()


def test_event_regex_match_flag_consistency(spark, sf_dir):
    """matched == 1 exactly when a non-empty first_match was extracted,
    and every match string is view, clicks*, purchase."""
    import re

    out = q("analytics_event_regex_match", spark, sf_dir).toPandas()
    has = out["first_match"] != ""
    assert (out["matched"] == has.astype(int)).all()
    assert all(re.fullmatch("vc*p", s) for s in out.loc[has, "first_match"])
