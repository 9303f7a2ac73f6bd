"""Operator inventory (SURVEY.md section 2) as registered queries.

Importing this package registers every query into
``parquet_exporter_spark.registry.REGISTRY``.
"""

from parquet_exporter_spark.queries import (  # noqa: F401
    aggregates,
    analytics,
    extras,
    functions,
    graph,
    joins,
    llm,
    llm2,
    reference_parity,
    relational,
    sampling,
    setops,
    streaming,
    subqueries,
    timeseries,
    tpch_shapes,
    tpch_shapes2,
    udfs,
    windows,
)
