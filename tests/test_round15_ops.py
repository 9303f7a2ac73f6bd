"""Round-15 optimization regression tests.

Pins the equality laws behind the round's internal restructures:

- batched first-build bootstrap (streaming/partial_store.py
  commit_partials_batched + the batch_col forms of every *_partial):
  the one-job bootstrap must publish byte-equal partial ROWS and the
  same markers as the per-batch foreachBatch replica it replaces.
- the PQ expr-string literal trees (operators/pq.py _dists) must
  round-trip doubles exactly.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from parquet_exporter_spark.streaming.partial_store import (
    commit_partial,
    commit_partials_batched,
    committed_batches,
    read_partials,
)


def _rows(spark, store):
    return sorted(map(tuple, read_partials(spark, store).collect()))


@pytest.mark.parametrize("sketch", ["tdigest", "hdr", "cms", "hll", "kmv"])
def test_batched_bootstrap_equals_per_batch_store(spark, tmp_path, sketch):
    """For every sketch maintainer: commit_partials_batched over the
    batch-tagged input publishes the same live rows and markers as the
    per-batch commit loop (the foreachBatch replica)."""
    from parquet_exporter_spark.streaming import (
        cms_ingest,
        hdr_ingest,
        hll_ingest,
        kmv_ingest,
        tdigest_ingest,
    )

    vals = [(7 * i % 113 + 1, i % 3) for i in range(200)]
    df = spark.createDataFrame(vals, "v long, batch long")
    build = {
        "tdigest": lambda d, b: tdigest_ingest.tdigest_partial(d, "v", batch_col=b),
        "hdr": lambda d, b: hdr_ingest.hdr_partial(d, "v", batch_col=b),
        "cms": lambda d, b: cms_ingest.cms_partial(d, "v", batch_col=b),
        "hll": lambda d, b: hll_ingest.hll_partial(d, "v", batch_col=b),
        "kmv": lambda d, b: kmv_ingest.kmv_partial(d, "v", batch_col=b),
    }[sketch]

    loop_store = str(tmp_path / "loop")
    for b in range(3):
        commit_partial(
            build(df.filter(F.col("batch") == b).select("v"), None),
            b,
            loop_store,
        )
    boot_store = str(tmp_path / "boot")
    n = commit_partials_batched(build(df, "batch"), [0, 1, 2], boot_store, "batch")
    assert n == 3
    assert committed_batches(boot_store) == [0, 1, 2]
    assert _rows(spark, boot_store) == _rows(spark, loop_store)


def test_batched_bootstrap_skips_committed_batches(spark, tmp_path):
    """Exactly-once posture: batches with durable markers are left
    untouched (files and marker), only the missing ones are published."""
    from parquet_exporter_spark.streaming.hdr_ingest import hdr_partial

    df = spark.createDataFrame(
        [(i % 50 + 1, i % 3) for i in range(120)], "v long, batch long"
    )
    store = str(tmp_path / "store")
    commit_partial(hdr_partial(df.filter("batch = 1").select("v"), "v"), 1, store)
    before = sorted(glob.glob(os.path.join(store, "cent-00000001-*.parquet")))
    stamps = [os.path.getmtime(p) for p in before]

    n = commit_partials_batched(hdr_partial(df, "v", batch_col="batch"), [0, 1, 2], store, "batch")
    assert n == 2
    assert committed_batches(store) == [0, 1, 2]
    after = sorted(glob.glob(os.path.join(store, "cent-00000001-*.parquet")))
    assert after == before
    assert [os.path.getmtime(p) for p in after] == stamps
    # the merged store equals a full per-batch build
    loop_store = str(tmp_path / "loop")
    for b in range(3):
        commit_partial(
            hdr_partial(df.filter(F.col("batch") == b).select("v"), "v"),
            b,
            loop_store,
        )
    assert _rows(spark, store) == _rows(spark, loop_store)


def test_pq_expr_literals_round_trip_exactly(spark):
    """_dists builds the codebook as a SQL string; the doubles must
    survive the string trip bit-for-bit (repr + correctly-rounded
    parse), including awkward values."""
    from parquet_exporter_spark.operators.pq import _dists

    vals = [
        0.1,
        1.0 / 3.0,
        2.0**-52,
        1e300,
        -1.2345678901234567e-8,
        123456789.123456789,
        -0.0,
        5e-324,
    ]
    books = [vals[:4], vals[4:]]
    df = spark.range(1).select(
        F.expr(
            "array(" + ", ".join(repr(v) + "D" for v in vals[:4]) + ")"
        ).alias("s0")
    )
    # reference: the identical fold built through the Column API (the
    # pre-r15 construction) — the string trip must be bit-equal to it
    books_lit = F.array(*[F.array(*[F.lit(v) for v in c]) for c in books])
    ref = F.transform(
        books_lit,
        lambda c: F.round(
            F.aggregate(
                F.zip_with(F.col("s0"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            9,
        ),
    )
    row = df.select(_dists("s0", books).alias("d"), ref.alias("r")).first()
    assert list(row["d"]) == list(row["r"])
    # distance to the first centroid (identical values) must be exactly 0
    assert row["d"][0] == 0.0
