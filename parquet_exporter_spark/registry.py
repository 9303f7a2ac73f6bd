"""Query registry: the single source of truth for the operator inventory.

Each operator from SURVEY.md section 2 registers here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a
DuckDB-runnable oracle SQL string over the same parquet tables. The driver
contract (`__spark_entry__.py`) is generated from this registry.

Rules enforced by convention (see tests/harness.py):
- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver sorts columns by name before value-hashing);
- float aggregates are rounded on BOTH sides (summation order differs
  between engines; rounding makes the hash stable);
- sums of integer columns are CAST to BIGINT in the oracle (DuckDB widens
  to HUGEINT, Spark stays long).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator registering an operator query."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: qd.fn for name, qd in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}


_loaded = False


def _ensure_loaded() -> None:
    """Import every query module exactly once so decorators run."""
    global _loaded
    if _loaded:
        return
    from parquet_exporter_spark import queries  # noqa: F401  (imports submodules)

    _loaded = True
