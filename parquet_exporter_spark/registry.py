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

import weakref
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn  # prepared-plan-cached wrapper (see `query` below)
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""
    raw_fn: QueryFn | None = None  # uncached builder, for tests that need a fresh plan


REGISTRY: dict[str, QueryDef] = {}

# Prepared-plan cache: building a DataFrame through the Python API costs
# 0.1-0.3 s of Py4J/analysis round-trips per query — a fixed cost that a
# long-lived engine pays ONCE per (session, query, dataset), like a
# prepared statement. DataFrames are immutable plan handles, so re-serving
# the same object is semantically identical to rebuilding it; execution
# still happens per action. Keyed weakly by session so plans die with it.
_plan_cache: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def _prepared(name: str, fn: QueryFn) -> QueryFn:
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        per_session = _plan_cache.setdefault(spark, {})
        key = (name, sf_dir)
        df = per_session.get(key)
        if df is None:
            df = fn(spark, sf_dir)
            per_session[key] = df
        return df

    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    wrapper.__module__ = fn.__module__
    return wrapper


def query(name: str, oracle: str | None = None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator registering an operator query."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(
            name=name,
            fn=_prepared(name, fn),
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            raw_fn=fn,
        )
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
