"""Time ONE query cold in THIS fresh process: raw_fn plan build + count().

Used by the optimization rounds for cold min-of-N measurements (each rep
is a fresh process: `for i in 1 2 3; do python tools/cold_once.py ...`).
Prints `<name> <build_sec> <exec_sec> <total_sec>` per query argument.

Usage: python tools/cold_once.py <sf_dir> name [name ...]
Env:   SPARK_GRAFT_CPUS (session core count, default engine rule).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_exporter_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from parquet_exporter_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    _ensure_loaded()
    spark = get_spark(app_name="cold_once")
    # one trivial action to absorb session/JVM warmup, not query codegen
    spark.range(1).count()
    for name in names:
        t0 = time.perf_counter()
        df = REGISTRY[name].raw_fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.count()
        t2 = time.perf_counter()
        print(
            f"{name} build={t1 - t0:.3f} exec={t2 - t1:.3f} "
            f"total={t2 - t0:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
