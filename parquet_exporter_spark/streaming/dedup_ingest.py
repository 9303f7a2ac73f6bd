"""Streaming corpus ingest with incremental near-dup rejection.

The steady-state shape of a 100 TB training-corpus pipeline: documents
arrive as a stream; each micro-batch is (a) probed against the PERSISTED
LSH band index of everything accepted so far (functions/dedup.py:
probe_minhash_band_index — signs only the batch, equi-joins the index,
exact-verifies candidates), (b) greedily deduplicated within itself, and
(c) appended — accepted docs to the corpus store, their band signatures
to the index — so the NEXT batch dedups against this one without any
corpus re-pairing. Per-batch cost is O(batch + candidates), never
O(corpus).

foreachBatch is the right host: index probe + two appends are a
multi-sink transaction per micro-batch, which no single file sink
expresses. With a checkpoint dir the query restarts after the last
committed batch; a re-run batch re-probes the index and its docs are
already present, so the exact-dup probe rejects them — the appends are
effectively idempotent at the batch level for near-dup purposes (the
corpus store may hold a re-run batch's rows twice; dedup consumers key
on doc_id).

Scale note: the corpus store and index are plain parquet here; at
100 TB both would be a transactional table format (Delta/Iceberg/Hudi)
so concurrent readers never see a half-appended batch — the streaming
wiring is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parquet_exporter_spark.functions.dedup import (
    minhash_lsh_pairs_portable,
    probe_minhash_band_index,
    write_minhash_band_index,
)


def dedup_batch_against_index(
    batch_df: DataFrame,
    index_path: str,
    corpus_path: str,
    n_hashes: int = 8,
    band_size: int = 2,
    jaccard_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """One increment: returns (accepted, rejected) for a batch.

    rejected = batch docs near-duplicating the existing corpus (via the
    index) plus within-batch near-dup losers (the greedy keep-smallest-id
    rule: in every colliding pair the larger id loses, so each near-dup
    family's minimum id survives).
    """
    spark = batch_df.sparkSession
    cross_hits = None
    if os.path.isdir(index_path) and os.path.isdir(corpus_path):
        corpus = spark.read.parquet(corpus_path)
        cross_hits = probe_minhash_band_index(
            spark,
            index_path,
            batch_df,
            corpus,
            n_hashes=n_hashes,
            band_size=band_size,
            jaccard_threshold=jaccard_threshold,
            id_col=id_col,
            text_col=text_col,
        )
        dup_ids = cross_hits.select(F.col("new_id").alias(id_col)).distinct()
        survivors = batch_df.join(dup_ids, id_col, "left_anti")
    else:
        survivors = batch_df
    intra = minhash_lsh_pairs_portable(
        survivors,
        n_hashes=n_hashes,
        band_size=band_size,
        jaccard_threshold=jaccard_threshold,
        id_col=id_col,
        text_col=text_col,
    )
    losers = intra.select(F.col("id_b").alias(id_col)).distinct()
    accepted = survivors.join(losers, id_col, "left_anti")
    rejected_ids = batch_df.select(id_col).exceptAll(accepted.select(id_col))
    rejected = batch_df.join(rejected_ids.distinct(), id_col, "semi")
    return accepted, rejected


def ingest_dedup_stream(
    stream_docs: DataFrame,
    index_path: str,
    corpus_path: str,
    rejects_path: str | None = None,
    checkpoint_dir: str | None = None,
    n_hashes: int = 8,
    band_size: int = 2,
    jaccard_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Start the foreachBatch ingest query; returns the StreamingQuery."""

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            accepted, rejected = dedup_batch_against_index(
                batch_df,
                index_path,
                corpus_path,
                n_hashes=n_hashes,
                band_size=band_size,
                jaccard_threshold=jaccard_threshold,
                id_col=id_col,
                text_col=text_col,
            )
            # Materialize BOTH verdicts before any write, with lineage
            # TRUNCATED (localCheckpoint, not persist): their plans read
            # the corpus/index parquet this batch is about to append to,
            # and appending to a path invalidates+recomputes any cache
            # whose plan scans it (CacheManager recache-by-path) — a
            # recomputed verdict would see the batch's own rows and
            # self-reject them. Checkpointed blocks have no lineage to
            # recompute, so they are immune.
            accepted = accepted.localCheckpoint(eager=True)
            rejected = rejected.localCheckpoint(eager=True)
            accepted.write.mode("append").parquet(corpus_path)
            write_minhash_band_index(
                accepted,
                index_path,
                n_hashes=n_hashes,
                band_size=band_size,
                id_col=id_col,
                text_col=text_col,
                mode="append",
            )
            if rejects_path is not None:
                rejected.write.mode("append").parquet(rejects_path)
        finally:
            batch_df.unpersist()

    writer = stream_docs.writeStream.foreachBatch(_ingest).outputMode("append")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
