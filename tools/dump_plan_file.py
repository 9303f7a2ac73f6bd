"""Dump the formatted physical plan of named queries to files.

Usage: python tools/dump_plan_file.py <out_dir> <suffix> <sf_dir> name [name ...]

Writes <out_dir>/<name>_<suffix>.txt containing the explain("formatted")
output plus, for queries that run driver-side jobs during plan
construction (iterative trainers), the number of Spark jobs triggered and
the wall time of construction — the metric the plan text alone cannot
show.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parquet_exporter_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from parquet_exporter_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    _ensure_loaded()
    spark = get_spark(app_name="dump_plan_file")
    if os.environ.get("PES_PLAN_NO_CHECKPOINT"):
        # Plan-evidence mode: queries that eagerly localCheckpoint their
        # result would dump as a bare `Scan ExistingRDD`; bypassing the
        # checkpoint (identity) exposes the full physical plan of the
        # computation the checkpoint would materialize.
        # Spark 4: pyspark.sql.DataFrame is the abstract interface; the
        # concrete class whose method instances resolve is the classic one.
        from pyspark.sql.classic.dataframe import DataFrame

        DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore[assignment]
    tracker = spark.sparkContext._jsc.sc().statusTracker()

    def n_jobs() -> int:
        return len(tracker.getJobIdsForGroup(None))

    for name in names:
        j0, t0 = n_jobs(), time.perf_counter()
        df = REGISTRY[name].raw_fn(spark, sf_dir)
        build_sec, build_jobs = time.perf_counter() - t0, n_jobs() - j0
        plan = spark._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {sf_dir} ==\n")
            f.write(
                f"plan construction: {build_jobs} Spark jobs, "
                f"{build_sec:.2f}s wall (driver-side iterative work, if any)\n\n"
            )
            f.write(plan.rstrip() + "\n")
        print(f"wrote {path} (construction: {build_jobs} jobs, {build_sec:.2f}s)")


if __name__ == "__main__":
    main()
