#!/bin/bash
# End-of-round verification protocol — runs every gate the round driver
# and judge will apply. Usage:  bash tools/roundcheck.sh   (from anywhere)
#
# ORDER MATTERS FOR THE BENCH: timing measurements taken while the box
# is still cooling from a multi-minute Spark sweep read 10-30% slow
# (BASELINE.md documents this; BENCH_r06 recorded a +22.6% phantom
# regression by running bench minutes after the 463 s full verify).
# So the bench contract runs FIRST, behind an idle-box gate, before any
# long sweep heats the machine:
#
# 1. idle-box gate + bench.py single-JSON-line contract (the ONLY timed
#    step; everything after is pass/fail)
# 2. front-window driver replay (fast; the queries CORRECTNESS_r{N} will
#    actually stamp)
# 3. COVERAGE.md <-> registry zero-diff cross-check (fast)
# 4. full pytest suite
# 5. full driver-contract replica, all queries, neutral cwd + hostile TZ
# 6. full-registry hostile-data sweep
#
# Steps 4-6 each take 5-15 min; do NOT run them concurrently (CPU
# contention roughly doubles each). Total ~35-40 min.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
fail=0

echo "== [1/6] bench contract (idle-box gated) =="
# Idle-box gate: wait (up to 5 min) until no residual Spark JVM from a
# previous sweep is still running — a cooling box inflates timings.
for i in $(seq 1 60); do
  if pgrep -f "org.apache.spark.deploy.SparkSubmit|pyspark-shell" >/dev/null 2>&1; then
    [ "$i" -eq 1 ] && echo "  waiting for residual Spark JVMs to exit..."
    sleep 5
  else
    break
  fi
done
pgrep -f "org.apache.spark.deploy.SparkSubmit|pyspark-shell" >/dev/null 2>&1 && \
  echo "  WARNING: residual JVM still alive after 5 min; bench timing may read slow"
(cd "$REPO" && python bench.py | python -c "
import json, sys
d = json.loads(sys.stdin.readline())
assert {'metric','value','unit','queries','sf'} <= set(d), d.keys()
print('bench OK:', d['value'], d['unit'], 'sf', d['sf'])") || fail=1

echo "== [1b] standalone sf1 pin: dedup_minhash_lsh_pairs (best-of-3, own process) =="
# Round-7 verdict: the heaviest rows-only pipeline read 3.26-5.44 s at
# sf1 depending on what shared the box (same-process DuckDB contention).
# Pin a STANDING standalone number here — own process, right after the
# idle-box gate, before any long sweep heats the machine — so the
# ambiguity can't recur. Budget 3.5 s; exceeding it fails the round
# check and demands a diagnosis (BASELINE.md), not a shrug.
if [ -d "$REPO/.scratch/sf1" ]; then
  (cd "$REPO" && python - <<'PYEOF'
import sys, time
sys.path.insert(0, ".")
from parquet_exporter_spark.registry import REGISTRY, _ensure_loaded
from parquet_exporter_spark.session import get_spark
_ensure_loaded()
spark = get_spark(app_name="minhash_sf1_pin")
fn = REGISTRY["dedup_minhash_lsh_pairs"].fn
fn(spark, ".scratch/sf1").count()  # warm: codegen + parquet footers
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    fn(spark, ".scratch/sf1").count()
    ts.append(time.perf_counter() - t0)
best = min(ts)
print(f"dedup_minhash_lsh_pairs sf1 best-of-3: {best:.3f}s (runs: {[round(t, 3) for t in ts]})")
if best > 3.5:
    print("PIN EXCEEDED 3.5s — diagnose (BASELINE.md) before closing the round")
    sys.exit(1)
print("PIN OK (<= 3.5s)")
PYEOF
) || fail=1
else
  echo "  .scratch/sf1 missing — skipping sf1 pin (generate via tools/gen_sf1.py if present)"
fi

echo "== [1c] standalone sf1 pins: graph_kcore + analytics_match_recognize =="
# Round-10 verdict: these two are the remaining data-dependent sf1
# numbers measured in tools/bench_round9_ops.py but not gated. Promote
# them to pinned budgets like the minhash gate above. raw_fn, NOT fn:
# the prepared-plan cache re-serves the same DataFrame handle and
# kcore's internal checkpoint makes repeat counts on it nearly free
# (0.2 s), which would pin nothing — a fresh plan per run re-executes
# the real iterative work. Measured standalone sf1 raw (r11 open):
# kcore best-of-3 7.761 s, match_recognize 0.590 s; budgets carry
# ~40% box-variance headroom. Exceeding either fails the round check
# and demands a diagnosis, not a shrug.
if [ -d "$REPO/.scratch/sf1" ]; then
  (cd "$REPO" && python - <<'PYEOF'
import sys, time
sys.path.insert(0, ".")
from parquet_exporter_spark.registry import REGISTRY, _ensure_loaded
from parquet_exporter_spark.session import get_spark
_ensure_loaded()
spark = get_spark(app_name="sf1_pins")
BUDGETS = {"graph_kcore": 11.0, "analytics_match_recognize": 1.0}
bad = False
for name, budget in BUDGETS.items():
    fn = REGISTRY[name].raw_fn
    fn(spark, ".scratch/sf1").count()  # warm: codegen + parquet footers
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, ".scratch/sf1").count()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name} sf1 best-of-3: {best:.3f}s (budget {budget}s; runs {[round(t,3) for t in ts]})")
    if best > budget:
        print(f"PIN EXCEEDED for {name} — diagnose (BASELINE.md) before closing the round")
        bad = True
sys.exit(1 if bad else 0)
PYEOF
) || fail=1
else
  echo "  .scratch/sf1 missing — skipping sf1 pins (generate via tools/gen_sf1.py if present)"
fi

echo "== [2/6] driver-window replay (front 50, sf0.01, hostile TZ) =="
TZ=America/New_York python "$REPO/tools/verify_priority.py" || fail=1

echo "== [3/6] COVERAGE.md <-> registry cross-check =="
python "$REPO/tools/check_coverage.py" || fail=1

echo "== [4/6] full pytest suite (INCLUDING slow-marked) =="
# The default run excludes @pytest.mark.slow (pytest.ini addopts) so the
# driver's gate finishes inside its budget; the round-close gate runs
# everything.
(cd "$REPO" && python -m pytest tests/ -q -m "slow or not slow") || fail=1

echo "== [5/6] full driver-contract replica =="
# tools/verify_full.py replays the driver's per-query compare over the
# WHOLE registry with full-sweep session sizing (4g heap + periodic
# broadcast release — the bare 1g default OOMs around query ~350 and
# false-fails everything after). Round arg 0 = check only, no artifact.
TZ=America/New_York python "$REPO/tools/verify_full.py" 0 || fail=1

echo "== [6/6] hostile-data full-registry sweep =="
cd /tmp && python - <<EOF || fail=1
import shutil, sys, tempfile
sys.path.insert(0, "$REPO")
from pyspark.sql import functions as F
from parquet_exporter_spark import tables
from parquet_exporter_spark.registry import REGISTRY, _ensure_loaded
from parquet_exporter_spark.session import get_spark
_ensure_loaded()
spark = get_spark(app_name="hostile_sweep")
src = "/root/testdata/sf0.001"
out = tempfile.mkdtemp(prefix="sfhostile_")
for t in tables.TABLES:
    shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
docs = spark.createDataFrame(
    [(900001, "", "en", "web", 0), (900002, " ", "en", "web", 1),
     (900003, "if (x=1) { return héllo; } // 42\\n    indented", "en", "code", 46),
     (900004, "日本語のテキスト цифры 3.14159 №§", "ja", "web", 30),
     (900005, "a", "en", "web", 1), (900006, "123 456 789", "en", "web", 11),
     (900007, "!!! ??? ;;; ===", "en", "web", 15)],
    "doc_id: long, text: string, lang: string, source: string, n_chars: long")
base = spark.read.parquet(f"{src}/documents.parquet")
base.unionByName(docs).write.mode("overwrite").parquet(f"{out}/documents.parquet")
ev = spark.read.parquet(f"{src}/events.parquet")
extra = spark.createDataFrame(
    [(9900001, "2024-01-15 12:00:00", 999001, "view", 0.0, "{}"),
     (9900002, "2024-01-15 12:00:00", 999002, "purchase", 0.0, "{}"),
     (9900003, "2024-01-15 12:00:00", 999002, "purchase", 0.0, "{}")],
    "event_id: long, ts_s: string, user_id: long, event_type: string, value: double, props: string"
).select("event_id", F.col("ts_s").cast(ev.schema["ts"].dataType).alias("ts"),
         "user_id", "event_type", "value", "props")
ev.unionByName(extra).write.mode("overwrite").parquet(f"{out}/events.parquet")
tables._schema_cache.clear()
fails = []
for name, qd in REGISTRY.items():
    try:
        qd.fn(spark, out).count()
    except Exception as ex:
        fails.append(name); print("FAIL", name, str(ex).splitlines()[0][:160])
print("hostile FAILED:", fails or "none")
shutil.rmtree(out, ignore_errors=True)
sys.exit(1 if fails else 0)
EOF

echo
if [ "$fail" -eq 0 ]; then echo "ROUNDCHECK: ALL GREEN"; else echo "ROUNDCHECK: FAILURES (see above)"; fi
exit $fail
