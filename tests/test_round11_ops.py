"""Round-11 hardening: the Bloom index must refuse the cast-mismatch
footgun (non-string columns hash differently through Spark CAST vs
Python str, which would turn false positives into FALSE NEGATIVES and
break the superset guarantee), and a zero-row manifest must degrade to
keep-everything instead of raising — both ADVICE_r10 closures."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_exporter_spark.sinks.bloom_index import (
    BLOOM_NAME,
    build_bloom_manifest,
    prune_with_bloom,
)


def test_bloom_build_rejects_non_string_column(spark):
    """Spark renders CAST(0.0001 AS STRING) as '1.0E-4', Python str()
    as '0.0001' — the probe would miss bits the build set. The build
    must refuse the column up front rather than silently mis-prune."""
    d = tempfile.mkdtemp(prefix="pes_bloom_nonstr_")
    try:
        spark.range(100).selectExpr(
            "CAST(id AS DOUBLE) / 10000 AS v", "CAST(id AS STRING) AS s"
        ).coalesce(1).write.mode("overwrite").parquet(d)
        with pytest.raises(TypeError, match="string columns only"):
            build_bloom_manifest(spark, d, "v", manifest_dir=d)
        # the string column still builds fine
        build_bloom_manifest(spark, d, "s", manifest_dir=d)
        assert os.path.isfile(os.path.join(d, BLOOM_NAME))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bloom_probe_rejects_non_string_value():
    with pytest.raises(TypeError, match="must be str"):
        prune_with_bloom("/nonexistent", 0.0001)


def test_bloom_empty_manifest_keeps_all_files(spark):
    """A committed manifest with zero rows (empty table) must keep every
    data file — 'no index' degrades to 'scan everything', never a
    TypeError from m=k=None."""
    d = tempfile.mkdtemp(prefix="pes_bloom_empty_")
    try:
        spark.range(10).selectExpr("CAST(id AS STRING) AS s").repartition(
            2
        ).write.mode("overwrite").parquet(d)
        empty = pa.table(
            {
                "file_name": pa.array([], pa.string()),
                "word_idx": pa.array([], pa.int32()),
                "word": pa.array([], pa.int64()),
                "m": pa.array([], pa.int32()),
                "k": pa.array([], pa.int32()),
            }
        )
        pq.write_table(empty, os.path.join(d, BLOOM_NAME))
        keep = prune_with_bloom(d, "anything", manifest_dir=d)
        data_files = sorted(
            p
            for p in glob.glob(os.path.join(d, "*.parquet"))
            if not os.path.basename(p).startswith("_")
        )
        assert keep == data_files and len(data_files) == 2
    finally:
        shutil.rmtree(d, ignore_errors=True)
