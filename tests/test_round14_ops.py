"""Round-14 closures for the round-13 ADVICE findings plus the
round-14 verdict tasks. ADVICE closures covered here:

- scd2_ingest exactly-once: the previous generation must stay immutable
  until the new batch's marker is durable — a crash before the marker
  leaves the committed state untouched and a replay recomputes
  identical output; stale generations are cleaned only after commit.
- scd2_ingest tie ordering: a new change at exactly the open version's
  valid_from is rejected (strict ts > valid_from invariant) instead of
  nondeterministically interleaving with the reopened pseudo-change.
- gen_fixtures.py module layout: the __main__ block runs every
  generator (no forward reference to a later def).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

import parquet_exporter_spark.streaming.scd2_ingest as scd2
from parquet_exporter_spark.streaming.scd2_ingest import (
    read_scd2_dim,
    scd2_apply_batch,
)

SCHEMA = "ts_ms long, op string, key_id long, name string, balance double"


def _dim_rows(spark, d):
    df = read_scd2_dim(spark, d)
    return (
        set()
        if df is None
        else {
            (
                r.key_id,
                r.version_seq,
                r.name,
                r.balance,
                r.valid_from_ms,
                r.valid_to_ms,
                r.is_current,
            )
            for r in df.collect()
        }
    )


def test_scd2_crash_before_marker_preserves_previous_generation(
    spark, monkeypatch
):
    """Inject a crash at the marker commit of batch 1: the committed
    state must still be batch 0's (the new generation is invisible
    without its marker), and the replay must heal to exactly the state
    a crash-free run produces."""
    d = tempfile.mkdtemp(prefix="pes_scd2crash_")
    try:
        b0 = spark.createDataFrame([(1000, "c", 1, "a", 1.0)], SCHEMA)
        assert scd2_apply_batch(b0, 0, d)
        state0 = _dim_rows(spark, d)
        assert state0 == {(1, 1, "a", 1.0, 1000, None, True)}

        real_replace = os.replace
        injected = []

        def crash_on_marker(src, dst):
            if dst.endswith(".committed") and not injected:
                injected.append(dst)
                raise OSError("injected crash before marker commit")
            return real_replace(src, dst)

        monkeypatch.setattr(scd2.os, "replace", crash_on_marker)
        b1 = spark.createDataFrame([(2000, "u", 1, "a2", 2.0)], SCHEMA)
        with pytest.raises(OSError, match="injected crash"):
            scd2_apply_batch(b1, 1, d)
        assert injected, "crash injection never fired"
        # the orphan generation landed on disk but is NOT readable
        orphans = [
            f for f in os.listdir(d) if f.startswith("dim-00000001-")
        ]
        assert orphans, "batch-1 files should exist uncommitted"
        assert _dim_rows(spark, d) == state0
        # replay (injection disarmed by the `not injected` guard)
        # recomputes from the immutable batch-0 input and commits
        assert scd2_apply_batch(b1, 1, d) is True
        assert _dim_rows(spark, d) == {
            (1, 1, "a", 1.0, 1000, 2000, False),
            (1, 2, "a2", 2.0, 2000, None, True),
        }
        # superseded generation cleaned up after the durable marker
        assert not [f for f in os.listdir(d) if f.startswith("dim-00000000-")]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_scd2_reader_ignores_stale_generations(spark):
    """Files from a superseded generation that survived a crash between
    marker and cleanup must be invisible to read_scd2_dim, and the next
    successful batch removes them."""
    d = tempfile.mkdtemp(prefix="pes_scd2stale_")
    try:
        b0 = spark.createDataFrame([(1000, "c", 7, "x", 5.0)], SCHEMA)
        b1 = spark.createDataFrame([(2000, "u", 7, "y", 6.0)], SCHEMA)
        assert scd2_apply_batch(b0, 0, d)
        assert scd2_apply_batch(b1, 1, d)
        state1 = _dim_rows(spark, d)
        # plant a stale generation-0 file (crash-between-3-and-4 relic)
        gen1 = sorted(
            f for f in os.listdir(d) if f.startswith("dim-00000001-")
        )[0]
        shutil.copyfile(
            os.path.join(d, gen1), os.path.join(d, "dim-00000000-0000.parquet")
        )
        assert _dim_rows(spark, d) == state1  # marker resolves gen 1 only
        b2 = spark.createDataFrame([(3000, "u", 7, "z", 7.0)], SCHEMA)
        assert scd2_apply_batch(b2, 2, d)
        assert not [
            f
            for f in os.listdir(d)
            if f.startswith("dim-") and not f.startswith("dim-00000002-")
        ]
        assert (7, 3, "z", 7.0, 3000, None, True) in _dim_rows(spark, d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_scd2_rejects_tie_at_open_valid_from(spark):
    """A change at EXACTLY the open version's valid_from ties with the
    reopened pseudo-change in the per-key window — rejected under the
    strict invariant rather than resolved by partition order."""
    d = tempfile.mkdtemp(prefix="pes_scd2tie_")
    try:
        b0 = spark.createDataFrame([(1000, "c", 1, "a", 1.0)], SCHEMA)
        assert scd2_apply_batch(b0, 0, d)
        tie = spark.createDataFrame([(1000, "u", 1, "a2", 2.0)], SCHEMA)
        with pytest.raises(ValueError, match="out-of-order"):
            scd2_apply_batch(tie, 1, d)
        # strictly newer is fine
        ok = spark.createDataFrame([(1001, "u", 1, "a2", 2.0)], SCHEMA)
        assert scd2_apply_batch(ok, 2, d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_gen_fixtures_main_block_is_last():
    """Every generator invoked by the __main__ block is defined before
    it — `python tools/gen_fixtures.py` must not NameError partway
    through the fixture list (round-13 ADVICE: write_langid_docs was
    defined after the block that called it)."""
    import ast

    path = os.path.join(os.path.dirname(__file__), "..", "tools", "gen_fixtures.py")
    tree = ast.parse(open(path).read())
    defs = {}
    main_idx = None
    for i, node in enumerate(tree.body):
        if isinstance(node, ast.FunctionDef):
            defs[node.name] = i
        if (
            isinstance(node, ast.If)
            and isinstance(node.test, ast.Compare)
            and getattr(node.test.left, "id", None) == "__name__"
        ):
            main_idx = i
            called = [
                s.value.func.id
                for s in node.body
                if isinstance(s, ast.Expr)
                and isinstance(s.value, ast.Call)
                and isinstance(s.value.func, ast.Name)
            ]
    assert main_idx is not None and called
    missing = [c for c in called if c in defs and defs[c] > main_idx]
    assert not missing, f"defined after __main__ block: {missing}"


def test_bloom_naive_timestamp_probe_binds_in_build_zone(spark):
    """A NAIVE datetime probe must bind its instant in the recorded
    BUILD zone, not the driver OS timezone (round-13 ADVICE: the
    non-Arrow createDataFrame path converts naive datetimes via
    time.mktime under the OS zone). With the OS zone forced to
    America/Chicago (UTC-5 in March), a naive 12:30 probe against a
    UTC-built index must still render '12:30:00', not '17:30:00'."""
    import datetime
    import time

    from parquet_exporter_spark.sinks.bloom_index import render_probe_literal

    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/Chicago"
    time.tzset()
    try:
        naive = datetime.datetime(2024, 3, 15, 12, 30, 0)
        r = render_probe_literal(spark, naive, "timestamp", tz="UTC")
        assert r == "2024-03-15 12:30:00"
        # timestamp_ntz has no instant: naive stays naive under any zone
        r_ntz = render_probe_literal(spark, naive, "timestamp_ntz", tz="UTC")
        assert r_ntz == "2024-03-15 12:30:00"
        # an aware probe is untouched: same instant, rendered in build zone
        aware = naive.replace(tzinfo=datetime.timezone.utc)
        assert render_probe_literal(spark, aware, "timestamp", tz="UTC") == r
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time.tzset()


def test_zonemap_distributed_equals_driver_walk(spark):
    """write_zonemap_distributed must commit the BYTE-identical row set
    the sequential driver walk commits — same folding, same NULL bounds
    for statless columns, same (file, column) order — on a layout
    mixing numeric, string, and stats-disabled files; and it must
    re-raise the driver walk's KeyError on a missing column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_exporter_spark.sinks.zonemap import (
        ZONEMAP_NAME,
        write_zonemap,
        write_zonemap_distributed,
    )

    d = tempfile.mkdtemp(prefix="pes_zmdist_")
    try:
        pq.write_table(
            pa.table({"k": [5, 1, 9], "v": [2.5, -1.0, 7.5], "s": ["b", "a", "c"]}),
            os.path.join(d, "a.parquet"),
        )
        pq.write_table(
            pa.table({"k": [20, 11], "v": [0.25, 0.5], "s": ["zz", "m"]}),
            os.path.join(d, "b.parquet"),
        )
        # stats disabled: both paths must record NULL bounds
        pq.write_table(
            pa.table({"k": [7], "v": [3.0], "s": ["q"]}),
            os.path.join(d, "c.parquet"),
            write_statistics=False,
        )
        drv = tempfile.mkdtemp(prefix="pes_zmdrv_")
        dst = tempfile.mkdtemp(prefix="pes_zmdst_")
        write_zonemap(d, ["k", "v", "s"], manifest_dir=drv)
        write_zonemap_distributed(spark, d, ["k", "v", "s"], manifest_dir=dst)
        t_drv = pq.read_table(os.path.join(drv, ZONEMAP_NAME))
        t_dst = pq.read_table(os.path.join(dst, ZONEMAP_NAME))
        assert t_drv.schema == t_dst.schema
        assert t_drv.to_pylist() == t_dst.to_pylist()
        null_rows = [r for r in t_dst.to_pylist() if r["file_name"] == "c.parquet"]
        assert null_rows and all(
            r["lo_num"] is None and r["lo_str"] is None for r in null_rows
        )
        with pytest.raises(KeyError, match="no_such"):
            write_zonemap_distributed(spark, d, ["no_such"], manifest_dir=dst)
        shutil.rmtree(drv, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bpe_bytes_nonascii_docs_have_nonzero_budgets(spark, sf_dir):
    """The point of the byte alphabet: every committed non-ASCII
    fixture doc must report a NONZERO byte-token count (they vanish
    entirely under the [a-z] path), with n_bytes strictly greater than
    the character count for every row holding non-ASCII text, and
    exact UTF-8 byte totals."""
    from parquet_exporter_spark.queries.llm5 import (
        _NONASCII_DOCS,
        text_bpe_tokenize_bytes,
    )

    out = {
        r.doc_id: r for r in text_bpe_tokenize_bytes(spark, sf_dir).collect()
    }
    import pyarrow.parquet as pq

    fixture = pq.read_table(_NONASCII_DOCS).to_pylist()
    assert len(fixture) >= 10
    for d in fixture:
        r = out[d["doc_id"]]
        assert r.n_bpe_tokens > 0, d["text"]
        assert r.n_pretokens > 0
        # exact byte accounting: sum of pre-token UTF-8 bytes
        n_chars = len(d["text"])
        n_bytes_true = len(d["text"].encode("utf-8")) - d["text"].count(" ")
        assert r.n_bytes == n_bytes_true, d["text"]
        if any(ord(c) > 127 for c in d["text"]):
            assert r.n_bytes > n_chars - d["text"].count(" ")
        # merges only ever shrink the byte sequence
        assert r.n_bpe_tokens <= r.n_bytes


def test_bpe_bytes_fit_produces_multibyte_merges(spark, sf_dir):
    """The fit must actually compose tokens: merge ranks are dense from
    1, merged symbols are concatenations of their parents, every
    symbol is a valid even-length hex string, and by the last rounds
    multi-byte (4+ hex chars) tokens exist."""
    from parquet_exporter_spark.queries.llm5 import text_bpe_fit_bytes

    rows = sorted(
        text_bpe_fit_bytes(spark, sf_dir).collect(), key=lambda r: r.merge_rank
    )
    assert [r.merge_rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) >= 10
    hexchars = set("0123456789abcdef")
    for r in rows:
        assert r.merged == r.lhs + r.rhs
        for s in (r.lhs, r.rhs, r.merged):
            assert len(s) % 2 == 0 and set(s) <= hexchars, s
        assert r.pair_count > 0
    assert any(len(r.merged) >= 6 for r in rows), "no 3+-byte token formed"


def test_bpe_bytes_packing_budgets_include_nonascii_source(spark, sf_dir):
    """The xlang (fixture) source must appear in the packed output with
    positive token widths — non-ASCII text consumes budget instead of
    packing at phantom zero width — and per-source offsets must tile
    the budget arithmetic exactly."""
    from parquet_exporter_spark.queries.llm5 import (
        SEQ_BPE_BYTES_BUDGET,
        sample_sequence_packing_bpe_bytes,
    )

    rows = sample_sequence_packing_bpe_bytes(spark, sf_dir).collect()
    xl = [r for r in rows if r.source == "xlang"]
    assert xl and all(r.n_tokens > 0 for r in xl)
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            assert r.seq_id == cum // SEQ_BPE_BYTES_BUDGET
            assert r.seq_offset == cum - r.seq_id * SEQ_BPE_BYTES_BUDGET
            cum += r.n_tokens


def test_hdr_merge_law_and_serving(spark, sf_dir):
    """Half-corpus HDR histograms merged by counter add must equal the
    whole-corpus histogram on every bucket (count AND exact bounds);
    serving off the merged sketch must keep the single-sketch
    guarantees (exact inside bucket, 12.5% structural width)."""
    from parquet_exporter_spark.queries.aggregates import agg_hdr_merge

    rows = agg_hdr_merge(spark, sf_dir).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.merge_exact and r.n_mismatch == 0
        assert r.n_buckets > 5
        assert r.within_bucket and r.width_bound_ok
        assert r.bucket_lo <= r.est_price <= r.bucket_hi + 1e-9
        assert abs(r.est_price - r.exact_price) / r.exact_price <= 0.125


def test_optimize_lifecycle_table(spark, sf_dir):
    """The OPTIMIZE scratch table must hold a real compaction: v2 is
    3 files (2 compacted multi-file groups + the greedy tail), v1's 8
    octile files still time-travel to byte-identical totals, compacted
    files keep disjoint cluster ranges, and the registered query's
    verdict columns hold."""
    from parquet_exporter_spark.queries.extras import (
        _build_optimize_table,
        scan_optimize_compact,
    )
    from parquet_exporter_spark.sinks.manifest_sink import (
        read_manifest_version,
    )

    path = _build_optimize_table(spark, sf_dir)
    v1 = sorted(read_manifest_version(path, 1), key=lambda s: s.min_value)
    v2 = sorted(read_manifest_version(path, 2), key=lambda s: s.min_value)
    assert len(v1) == 8 and len(v2) == 3
    assert any("compact-" in s.path for s in v2)
    # disjoint, ordered cluster ranges after the rewrite
    for a, b in zip(v2, v2[1:]):
        assert a.max_value < b.min_value
    # row conservation
    assert sum(s.num_rows for s in v1) == sum(s.num_rows for s in v2)
    # v1 still readable byte-identically after OPTIMIZE (snapshot isolation)
    t1 = (
        spark.read.parquet(*[s.path for s in v1])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c"),
        )
        .collect()[0]
    )
    t2 = (
        spark.read.parquet(*[s.path for s in v2])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c"),
        )
        .collect()[0]
    )
    assert (t1.n, t1.c) == (t2.n, t2.c)
    rows = scan_optimize_compact(spark, sf_dir).collect()
    assert rows and all(r.snapshots_equal for r in rows)
    assert all(
        r.n_files_pre == 8 and r.n_files_post == 3 for r in rows
    )
    assert all(r.kept_files_post < r.kept_files_pre for r in rows)


def test_tdigest_distributed_build_equals_canonical(spark, sf_dir):
    """The range-partition + offset-table build must produce the
    BIT-IDENTICAL centroid sketch the single-partition window build
    produces, and its plan must carry no data-sized single-partition
    window — only global_row_number's O(partitions) offset table."""
    from parquet_exporter_spark.queries.aggregates import (
        agg_tdigest_sketch,
        agg_tdigest_sketch_distributed,
    )

    a = {tuple(r) for r in agg_tdigest_sketch(spark, sf_dir).collect()}
    b = {
        tuple(r)
        for r in agg_tdigest_sketch_distributed(spark, sf_dir).collect()
    }
    assert a == b and len(a) > 10
    plan = (
        agg_tdigest_sketch_distributed(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the canonical build's global window is absent; the only
    # SinglePartition exchange feeds the bounded offset table
    import re

    singles = plan.count("Exchange SinglePartition")
    assert singles <= 1, plan
    # the range exchange ran inside global_row_number's localCheckpoint;
    # the audited plan reads the materialized range-partitioned blocks
    assert "ExistingRDD" in plan


def test_ndcg_eval_invariants_and_discrimination(spark, sf_dir):
    """Structural nDCG invariants at the default SF (DCG <= IDCG, both
    positive, IDCG monotone in k, precision/mrr in (0, 1]), and at
    sf0.01 the tf-graded truth must actually disagree with the BM25
    order — nDCG@20 strictly below 1 — proving the metric measures the
    ranking, not itself."""
    from parquet_exporter_spark.queries.search import search_ndcg_eval

    rows = sorted(search_ndcg_eval(spark, sf_dir).collect())
    assert [r.k for r in rows] == [5, 10, 20]
    prev_idcg = 0
    for r in rows:
        assert 0 < r.dcg_q <= r.idcg_q
        assert 0 < r.ndcg_at_k <= 1.0
        assert 0 < r.precision_at_k <= 1.0
        assert 0 < r.mrr <= 1.0
        assert r.idcg_q > prev_idcg
        prev_idcg = r.idcg_q
    r20 = {
        r.k: r
        for r in search_ndcg_eval(spark, "/root/testdata/sf0.01").collect()
    }[20]
    assert r20.ndcg_at_k < 1.0 and r20.dcg_q < r20.idcg_q
