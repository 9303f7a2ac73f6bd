"""FULL-registry driver-contract verification, producing the committed
round artifact VERIFY_FULL_r{N}.txt: one line per registered query —
status, name, sf, UTC timestamp — plus a FAILED summary.

Replicates the driver exactly (see tools/verify_priority.py): bare
SparkSession, hostile process TZ, neutral cwd, oracle compare via
tests/harness.compare at sf0.01.

    TZ=America/New_York python tools/verify_full.py 6   # writes VERIFY_FULL_r06.txt

Exit code 1 on any failure.
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
os.chdir("/tmp")  # neutral cwd: catches worker-side package imports

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from harness import compare  # noqa: E402


def main(round_no: int) -> int:
    # The per-query oracle compare is identical to the driver's; only the
    # session SIZING differs from the bare default. The driver checks a
    # ~50-query window per round — this tool replays ALL ~400, and the
    # default 1g driver heap eventually OOMs on accumulated broadcasts
    # (observed at ~350 queries: TorrentBroadcast store failures, then the
    # py4j bridge dies and every later query false-fails). 4g + a
    # periodic plan-cache/broadcast release keeps the full sweep honest.
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    q, o = e.queries(), e.oracle_sql()
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    sf_name = os.path.basename(sf.rstrip("/"))
    out_path = os.path.join(REPO, f"VERIFY_FULL_r{round_no:02d}.txt")
    fails: list[str] = []
    lines: list[str] = []
    t0 = time.time()
    for i, name in enumerate(q):
        ts = datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
        if name not in o:
            try:
                q[name](spark, sf).count()
                status = "PASS(rows-only)"
            except Exception as ex:
                status, fails = "FAIL", fails + [name]
                print(f"FAIL {name}: {ex}", flush=True)
        else:
            try:
                probs = compare(spark, name, sf, o[name], q[name])
            except Exception as ex:
                probs = [f"EXC {ex}"]
            if probs:
                status, fails = "FAIL", fails + [name]
                print(f"FAIL {name}: {probs[0][:200]}", flush=True)
            else:
                status = "PASS"
        lines.append(f"{status:16s} {name:44s} {sf_name} {ts}")
        if (i + 1) % 50 == 0:
            print(f"... {i + 1}/{len(q)} checked ({time.time() - t0:.0f}s)", flush=True)
            # release the executed plans' broadcasts/caches so the heap
            # doesn't accumulate across ~400 queries (see sizing note)
            from parquet_exporter_spark.registry import _plan_cache

            _plan_cache.clear()
            spark.catalog.clearCache()
    if round_no == 0:  # roundcheck mode: verify only, no committed artifact
        print(f"checked {len(q)}; FAILED: {fails or 'none'}")
        return 1 if fails else 0
    header = (
        f"# VERIFY_FULL round {round_no}: {len(q)} registered queries "
        f"({len(o)} oracled, {len(q) - len(o)} rows-only) at {sf_name}, "
        f"driver-replica conditions (no engine confs; 4g full-sweep "
        f"heap, TZ={os.environ.get('TZ', 'inherit')}, cwd=/tmp)\n"
        f"# generated {datetime.now(timezone.utc).isoformat(timespec='seconds')} "
        f"in {time.time() - t0:.0f}s\n"
        f"# FAILED: {', '.join(fails) if fails else 'none'}\n"
    )
    with open(out_path, "w") as f:
        f.write(header + "\n".join(lines) + "\n")
    print(f"wrote {out_path}; FAILED: {fails or 'none'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 0))
