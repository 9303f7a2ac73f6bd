"""Verify specific queries against their DuckDB oracles (driver replica for
a subset — used in optimization rounds to prove a restructured query still
hash-matches before moving on).

Usage: TZ=America/New_York python tools/verify_names.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from harness import compare  # noqa: E402

from parquet_exporter_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from parquet_exporter_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.sep in args[0] else "/root/testdata/sf0.01"
    _ensure_loaded()
    spark = get_spark(app_name="verify_names")
    failed = []
    for name in args:
        q = REGISTRY[name]
        if q.oracle is None:
            n = q.raw_fn(spark, sf_dir).count()
            status = f"NO_ORACLE rows={n}" if n > 0 else "FAIL rows=0"
            if n == 0:
                failed.append(name)
        else:
            problems = compare(spark, name, sf_dir, q.oracle, q.raw_fn)
            status = "PASS" if not problems else f"FAIL {problems}"
            if problems:
                failed.append(name)
        print(f"{status:10s} {name}", flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
