"""Two-engine (Spark vs DuckDB, same process/session) measurement of the
round-9 operator batch at a given SF dir — the per-operator counterpart
of tools/bench_vs_duckdb.py's headline sweep. Prints a markdown table
for BASELINE.md.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_round9_ops.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from parquet_exporter_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from parquet_exporter_spark.session import get_spark  # noqa: E402
from parquet_exporter_spark.tables import TABLES, table_path  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

OPS = [
    "analytics_match_recognize",
    "similarity_rabitq_topk",
    "timeseries_holt_linear",
    "timeseries_holt_winters",
    "layout_compaction_plan",
    "graph_kcore",
    "scan_manifest_pruned",  # fixed sf0.001 fixture — scale-invariant row
]


def best_of(fn, n=3):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return min(runs)


def main() -> None:
    _ensure_loaded()
    spark = get_spark(app_name="bench_round9_ops")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    print(f"| query | spark sec | duckdb sec (same SQL) | ratio |  <!-- {SF_DIR} -->")
    print("|---|---|---|---|")
    for name in OPS:
        qd = REGISTRY[name]
        qd.raw_fn(spark, SF_DIR).collect()  # warm (scans cached, JIT)
        s = best_of(lambda: qd.raw_fn(spark, SF_DIR).collect())
        con.execute(qd.oracle).fetchall()  # warm
        d = best_of(lambda: con.execute(qd.oracle).fetchall())
        ratio = s / d if d > 0 else float("inf")
        faster = " **(spark faster)**" if ratio < 1 else ""
        print(f"| {name} | {s:.3f} | {d:.3f} | {ratio:.2f}x{faster} |")
    spark.stop()


if __name__ == "__main__":
    main()
