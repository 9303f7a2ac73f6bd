"""Time every registered query's Spark-side execution (plan + execute via
count(), no oracle) at a given SF dir. Used in optimization rounds to find
the slow tail that VERIFY timestamps (which include DuckDB oracle time)
cannot isolate.

Usage: python tools/time_registry.py [sf_dir] [out.json] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_exporter_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from parquet_exporter_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/time_registry.json"
    _ensure_loaded()
    names = sys.argv[3:] or sorted(REGISTRY)
    spark = get_spark(app_name="time_registry")
    REGISTRY[names[0]].fn(spark, sf_dir).count()

    out: dict[str, float] = {}
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            REGISTRY[name].fn(spark, sf_dir).count()
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — record and keep sweeping
            out[name] = -1.0
            print(f"ERR {name}: {exc}", flush=True)
        if (i + 1) % 50 == 0:
            print(f"...{i + 1}/{len(names)}", flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
    for name, sec in sorted(out.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{sec:8.3f}  {name}")
    print(f"total {round(sum(v for v in out.values() if v > 0), 1)}s over {len(names)}")


if __name__ == "__main__":
    main()
