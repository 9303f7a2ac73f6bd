"""Contemporaneous Spark vs DuckDB measurement of the headline set.

Runs each headline query on Spark (per-query warmup, best of 3) and its
oracle SQL on DuckDB in the SAME process/session, so the comparison is
same-box same-load. Prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bench import HEADLINE  # noqa: E402
from parquet_exporter_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from parquet_exporter_spark.session import get_spark  # noqa: E402
from parquet_exporter_spark.tables import TABLES, table_path  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def best_of(fn, n=3):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return min(runs)


def main() -> None:
    _ensure_loaded()
    # same session tuning as bench.py: partitions statically sized to the
    # input only at small SF (then AQE's re-derivation is pure overhead);
    # at larger SF keep the engine default with AQE ON.
    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or "0.1")
    parts = int(os.environ.get("SPARK_GRAFT_BENCH_PARTS", "8" if sf <= 0.5 else "0")) or None
    spark = get_spark(
        app_name="bench_vs_duckdb",
        shuffle_partitions=parts,
        extra_conf={"spark.sql.adaptive.enabled": "false"} if parts else {},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_DIR, t)}'")

    REGISTRY["count_star"].fn(spark, SF_DIR).collect()  # session warmup

    rows = []
    s_total = d_total = 0.0
    for name in HEADLINE:
        qd = REGISTRY[name]
        qd.fn(spark, SF_DIR).count()  # codegen warmup
        s = best_of(lambda: qd.fn(spark, SF_DIR).count())
        d = None
        if qd.oracle:
            con.sql(qd.oracle).fetchall()  # duckdb warmup
            d = best_of(lambda: con.sql(qd.oracle).fetchall())
        rows.append((name, s, d))
        s_total += s
        if d is not None:
            d_total += d
    print(f"\n| query | spark sec | duckdb sec (same SQL) | ratio |")
    print("|---|---|---|---|")
    sql_s_total = 0.0
    for name, s, d in rows:
        if d is None:
            print(f"| {name} | {s:.3f} | n/a (rows-only) | — |")
        else:
            sql_s_total += s
            r = s / d
            note = f"**{r:.2f}x (spark faster)**" if r < 1 else f"{r:.1f}x"
            print(f"| {name} | {s:.3f} | {d:.3f} | {note} |")
    print(
        f"| **headline total** | **{s_total:.2f}** | **{d_total:.2f}** (SQL subset) | "
        f"SQL-comparable subtotal {sql_s_total:.2f} ≈ **{sql_s_total / d_total:.2f}x** |"
    )


if __name__ == "__main__":
    main()
