"""Driver-style verification of the registry FRONT window — the exact
queries the round driver will stamp into CORRECTNESS_r{N}.json.

Replicates the driver's conditions: bare SparkSession (no engine
configs), hostile process TZ, neutral cwd, sf0.01, oracle compare via
tests/harness.compare. Run after every PRIORITY rotation:

    TZ=America/New_York python tools/verify_priority.py [n]

Exit code 1 on any failure, so it gates CI/pre-commit use.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
os.chdir("/tmp")  # neutral cwd: catches worker-side package imports

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from harness import compare  # noqa: E402


def list_unstamped() -> int:
    """Print registry names with no green CORRECTNESS_r* row, in the
    order the driver would check them (PRIORITY rotation candidates)."""
    from parquet_exporter_spark.queries import DRIVER_VERIFIED
    from parquet_exporter_spark.registry import REGISTRY

    names = [k for k in REGISTRY if k not in DRIVER_VERIFIED]
    for name in names:
        print(name)
    print(f"# {len(names)} unstamped of {len(REGISTRY)}", file=sys.stderr)
    return 0


def main(n: int = 50) -> int:
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    q, o = e.queries(), e.oracle_sql()
    front = list(q)[:n]
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    fails = []
    t0 = time.time()
    for name in front:
        if name not in o:
            try:
                q[name](spark, sf).count()
                print(f"  ok (rows-only) {name}")
            except Exception as ex:
                fails.append(name)
                print(f"FAIL {name}: {ex}")
            continue
        try:
            probs = compare(spark, name, sf, o[name], q[name])
        except Exception as ex:
            probs = [f"EXC {ex}"]
        if probs:
            fails.append(name)
            print(f"FAIL {name}: {probs[0][:200]}")
        else:
            print(f"  ok {name}")
    print(f"front {len(front)} checked in {time.time() - t0:.0f}s; "
          f"FAILED: {fails or 'none'}")
    return 1 if fails else 0


if __name__ == "__main__":
    if "--list-unstamped" in sys.argv:
        sys.exit(list_unstamped())
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 50))
