"""Measure text_tfidf_top_terms plan variants (round-7 item #4).

Variants:
  current  — tf agg on (doc_id,term) [shuffle 1] -> df window on term
             [shuffle 2 + sort] -> top-3 window on doc_id [shuffle 3]
  term1st  — repartition token stream by term [shuffle 1]; the
             (doc_id,term) aggregate AND the df window are both
             satisfied by that clustering (ClusteredDistribution
             subset rule), so only the final doc_id window shuffles
             again [shuffle 2]. Trades map-side combine (shuffles raw
             token occurrences, not combined tf pairs) for one fewer
             full shuffle+sort of the tf table.
  aggjoin  — df via partial-agg groupBy(term).count + SMJ back to tf;
             the term exchange is reusable between the agg and join.

Usage: python tools/tfidf_variants.py [sf_dir] [reps]
Run on an IDLE box only (BASELINE.md measurement protocol).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from parquet_exporter_spark import tables  # noqa: E402
from parquet_exporter_spark.functions import text as T  # noqa: E402
from parquet_exporter_spark.tables import read_table  # noqa: E402


def _toks(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term"))


def current(spark, sf_dir) -> DataFrame:
    toks = _toks(spark, sf_dir)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = tables.table_rowcount(sf_dir, "documents")
    df_w = Window.partitionBy("term")
    scored = tf.withColumn("df", F.count(F.lit(1)).over(df_w)).select(
        "doc_id", "term",
        F.round(F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3).select("doc_id", "term", "tfidf")
    )


def term1st(spark, sf_dir) -> DataFrame:
    toks = _toks(spark, sf_dir).repartition("term")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = tables.table_rowcount(sf_dir, "documents")
    df_w = Window.partitionBy("term")
    scored = tf.withColumn("df", F.count(F.lit(1)).over(df_w)).select(
        "doc_id", "term",
        F.round(F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3).select("doc_id", "term", "tfidf")
    )


def aggjoin(spark, sf_dir) -> DataFrame:
    toks = _toks(spark, sf_dir)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = tables.table_rowcount(sf_dir, "documents")
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").select(
        "doc_id", "term",
        F.round(F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3).select("doc_id", "term", "tfidf")
    )


VARIANTS = {"current": current, "term1st": term1st, "aggjoin": aggjoin}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # verify identical results first
    ref = None
    for name, fn in VARIANTS.items():
        rows = sorted(
            (r.doc_id, r.term, r.tfidf) for r in fn(spark, sf_dir).collect()
        )
        if ref is None:
            ref = rows
        else:
            assert rows == ref, f"{name} diverges from current"
    print(f"all {len(VARIANTS)} variants agree on {len(ref)} rows")
    for name, fn in VARIANTS.items():
        fn(spark, sf_dir).count()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).count()
            ts.append(time.time() - t0)
        ts.sort()
        print(f"{name:8s} median {ts[len(ts)//2]:.3f}s  min {ts[0]:.3f}s  ({sf_dir})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
