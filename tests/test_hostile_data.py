"""Edge-case robustness: a representative slice of the registry must
EXECUTE (rows-only) on data containing empty documents, unicode,
symbol/digit-only text, zero weights/values, and tied timestamps.

A full 371-query sweep over this hostile set runs out-of-band each
round (the regexp group-index crash and sample_weighted's
divide-by-zero were both found that way); this test keeps the classes
of query that broke — per-row text regexps, weighted sampling, token
pipelines, per-user windows — permanently covered."""

import shutil

import pytest

from pyspark.sql import functions as F

from parquet_exporter_spark import tables
from parquet_exporter_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

REPRESENTATIVES = [
    # text per-row expression pipelines (regexp/array hof)
    "fn_regexp_suite",
    "text_code_detection",
    "text_nonascii_ratio",
    "text_sentence_stats",
    "text_readability_score",
    "text_token_stats",
    "text_quality_score",
    "text_char_entropy",
    # weighted/deterministic sampling (zero-weight rows!)
    "sample_weighted",
    "sample_balanced_classes",
    "sample_tokens_budget",
    # token aggregation pipelines
    "fn_explode_wordcount",
    "text_vocab_coverage",
    "text_hapax_ratio",
    # per-user event windows with tied timestamps / single-event users
    "sessionize_gaps_islands",
    "analytics_event_paths",
    "analytics_repeat_purchase_interval",
    "window_ignore_nulls",
    # round-4 additions: empty-doc trigram pipelines, canonicalization of
    # symbol-only text, tied-timestamp funnel stages
    "text_ngram_novelty",
    "dedup_exact_normalized",
    "funnel_time_bounded",
    "analytics_event_regex_match",
]


@pytest.fixture(scope="module")
def hostile_sf_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    out = str(tmp_path_factory.mktemp("sfhostile"))
    for t in tables.TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    hostile_docs = spark.createDataFrame(
        [
            (900001, "", "en", "web", 0),
            (900002, " ", "en", "web", 1),
            (900003, "if (x=1) { return héllo; } // 42\n    indented", "en", "code", 46),
            (900004, "日本語のテキスト цифры 3.14159 №§", "ja", "web", 30),
            (900005, "a", "en", "web", 1),
            (900006, "123 456 789", "en", "web", 11),
            (900007, "!!! ??? ;;; ===", "en", "web", 15),
        ],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    )
    base = spark.read.parquet(f"{src}/documents.parquet")
    base.unionByName(hostile_docs).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    ev = spark.read.parquet(f"{src}/events.parquet")
    extra = spark.createDataFrame(
        [
            (9900001, "2024-01-15 12:00:00", 999001, "view", 0.0, "{}"),
            (9900002, "2024-01-15 12:00:00", 999002, "purchase", 0.0, "{}"),
            (9900003, "2024-01-15 12:00:00", 999002, "purchase", 0.0, "{}"),
        ],
        "event_id: long, ts_s: string, user_id: long, event_type: string, value: double, props: string",
    ).select(
        "event_id",
        F.col("ts_s").cast(ev.schema["ts"].dataType).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    ev.unionByName(extra).write.mode("overwrite").parquet(f"{out}/events.parquet")
    tables._schema_cache.clear()
    yield out
    tables._schema_cache.clear()


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_executes_on_hostile_data(spark, hostile_sf_dir, name):
    # rows-only: the oracle gate covers values; this gate covers "does
    # not throw on data the generator never produces"
    REGISTRY[name].fn(spark, hostile_sf_dir).count()
