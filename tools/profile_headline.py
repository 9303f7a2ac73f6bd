"""Round-14 profiling harness: split each headline query's wall time into
plan-construction (Python + py4j + analysis: the ``fn(spark, sf_dir)`` call)
vs execution (the ``count()``), over N reps, and report min/median.

Usage: python tools/profile_headline.py [reps] [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_exporter_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from parquet_exporter_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "agg_pricing_summary",
    "flagship_revenue_by_region",
    "join_inner_equi",
    "join_asof",
    "topk_global",
    "window_frames",
    "fn_explode_wordcount",
    "text_tfidf_top_terms",
    "dedup_minhash_lsh_pairs",
    "similarity_topk_bruteforce",
    "stream_tumbling_window",
    "sql_exists_correlated",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    parts = int(os.environ.get("SPARK_GRAFT_BENCH_PARTS", "8"))
    spark = get_spark(
        app_name="profile_headline",
        shuffle_partitions=parts,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    REGISTRY["count_star"].fn(spark, sf_dir).collect()

    out = {}
    for name in names:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).count()  # warmup (codegen)
        plan_ts, exec_ts = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            plan_ts.append(t1 - t0)
            exec_ts.append(t2 - t1)
        out[name] = {
            "plan_min": round(min(plan_ts), 3),
            "plan_med": round(statistics.median(plan_ts), 3),
            "exec_min": round(min(exec_ts), 3),
            "exec_med": round(statistics.median(exec_ts), 3),
            "exec_max": round(max(exec_ts), 3),
        }
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps({"total_min": round(sum(v["plan_min"] + v["exec_min"] for v in out.values()), 3)}))


if __name__ == "__main__":
    main()
