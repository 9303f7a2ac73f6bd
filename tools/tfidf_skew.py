"""Measure text_tfidf_top_terms hot-term skew under a Zipf-heavy
vocabulary (round-8 item #4).

The registered 2-exchange plan (term1st: repartition the raw token
stream by term so ONE exchange serves both the tf aggregate and the df
window) is optimal on the near-uniform synthetic vocabulary of the test
tables — but it places EVERY occurrence of a term in one partition, and
window partitions cannot be split by AQE (skew handling exists only for
joins and rebalance nodes). Under a natural-language Zipf distribution
the hottest term ("the", ~5-18% of all tokens) becomes a straggler task
that grows linearly with corpus size: at 100 TB that one task is
multi-TB — the plan does not survive the scale-up.

This tool makes that measurable:

1. generates a synthetic Zipf(s) corpus (distributed mapInPandas — no
   driver-side data) whose top term carries a natural-language-like
   share of all occurrences;
2. verifies the two plans agree row-for-row on it;
3. times them under AQE and reports, per variant, the executed-plan
   evidence: whether any exchange was skew-split (the window plan's
   never is) and the max/mean task-row ratio of the term-clustered
   stage.

Variants (same result set, same API — queries/llm.py picks by the
``skew_safe`` flag):
  term1st  — the registered fast plan: 2 exchanges, window df-count.
  aggjoin  — the skew-safe fallback: tf via (doc_id,term) hash agg
             [partial aggregation caps any one term's rows at
             one-per-doc], df via a SECOND partial agg on term [caps at
             one row per term per map task], SMJ back to tf — the one
             potentially skewed step, and exactly the shape AQE's
             OptimizeSkewedJoin CAN split.

Usage: python tools/tfidf_skew.py [n_docs] [tokens_per_doc] [s] [reps] [lowthresh]
Run on an IDLE box only (BASELINE.md measurement protocol).

``lowthresh`` (any 5th arg): scale AQE's skew-join thresholds DOWN
(factor 2, 16 MB) to emulate the 100 TB regime at local test sizes —
at default thresholds a hot tf partition of a few tens of MB is not
"skewed" to AQE, exactly as a few-GB partition wouldn't be at cluster
advisory sizes; lowering them shows WHICH plan AQE can rescue when the
hot partition does cross the line (the SMJ fallback) and which it
structurally cannot (the window plan).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from parquet_exporter_spark.queries.llm import tfidf_top_terms_plan  # noqa: E402

VOCAB = 50_000
ZIPF_DIR = os.path.join(REPO, ".scratch", "zipf_docs")


def generate(spark, n_docs: int, doc_len: int, s: float) -> str:
    """Write a documents.parquet whose terms are bounded-Zipf(s) draws
    over a VOCAB-term vocabulary. Distributed: each partition draws its
    own docs with a partition-seeded RNG; the driver never holds rows."""
    out = os.path.join(ZIPF_DIR, "documents.parquet")
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    probs = ranks ** (-s)
    probs /= probs.sum()
    top_share = float(probs[0])
    bprobs = spark.sparkContext.broadcast(probs)

    def gen(batches):
        import pandas as pd

        for b in batches:
            ids = b["id"].to_numpy()
            rng = np.random.default_rng(int(ids[0]) + 7)
            draws = rng.choice(VOCAB, size=(len(ids), doc_len), p=bprobs.value)
            texts = [" ".join(f"t{k}" for k in row) for row in draws]
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    (
        spark.range(n_docs, numPartitions=32)
        .mapInPandas(gen, "doc_id long, text string")
        .write.mode("overwrite")
        .parquet(out)
    )
    print(
        f"generated {n_docs} docs x {doc_len} tokens, Zipf s={s}: "
        f"top term expects {top_share:.1%} of {n_docs * doc_len:,} occurrences"
    )
    return ZIPF_DIR


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    doc_len = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    s = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    lowthresh = len(sys.argv) > 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
    )
    if lowthresh:
        builder = (
            builder.config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
            .config(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                str(16 * 1024 * 1024),
            )
            .config(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                str(8 * 1024 * 1024),
            )
        )
        print("AQE skew thresholds lowered: factor=2, threshold=16MB, advisory=8MB")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = generate(spark, n_docs, doc_len, s)

    variants = {
        "term1st(window)": lambda: tfidf_top_terms_plan(spark, sf_dir, skew_safe=False),
        "aggjoin(skew_safe)": lambda: tfidf_top_terms_plan(spark, sf_dir, skew_safe=True),
    }
    # row-identical first (value hash would be overkill here: exact rows)
    ref = None
    for name, fn in variants.items():
        rows = sorted((r.doc_id, r.term, r.tfidf) for r in fn().collect())
        if ref is None:
            ref = rows
        else:
            assert rows == ref, f"{name} diverges"
    print(f"variants agree on {len(ref)} rows")

    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def _stages():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            return _json.load(r)

    for name, fn in variants.items():
        fn().count()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn().count()
            ts.append(time.time() - t0)
        ts.sort()
        # The straggler evidence: per-task runtime quantiles of every
        # stage of one more execution, via the UI REST API. The plan is
        # also inspected EXECUTED (a fresh DataFrame's adaptive plan has
        # isFinalPlan=false and no AQE runtime decisions in it yet).
        before = {s["stageId"] for s in _stages()}
        df = fn()
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        had_skew = "skew" in plan.lower()
        joins = sorted(
            {
                line.strip().split("(")[0].lstrip("+-* ")
                for line in plan.splitlines()
                if "Join" in line
            }
        )
        print(
            f"{name:20s} median {ts[len(ts) // 2]:.3f}s  min {ts[0]:.3f}s  "
            f"skew-split: {had_skew}  joins: {joins}"
        )
        worst = (0.0, None)
        for s in sorted(
            (s for s in _stages() if s["stageId"] not in before),
            key=lambda x: x["stageId"],
        ):
            if s["numCompleteTasks"] < 2:
                continue
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/{s['stageId']}"
                f"/{s['attemptId']}/taskSummary?quantiles=0.0,0.5,1.0"
            ) as r:
                q = _json.load(r)
            lo, med, hi = (round(x / 1000, 2) for x in q["executorRunTime"])
            ratio = hi / med if med else 0.0
            print(
                f"    stage {s['stageId']:>4}: {s['numCompleteTasks']:>3} tasks  "
                f"runtime min/med/max {lo}/{med}/{hi}s  max/med {ratio:.2f}x  "
                f"shufRead {s.get('shuffleReadBytes', 0) / 1e6:.0f}MB"
            )
            if ratio > worst[0]:
                worst = (ratio, s["stageId"])
        print(f"    worst straggler ratio: {worst[0]:.2f}x (stage {worst[1]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
