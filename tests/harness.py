"""Local replica of the driver's correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive canonical form of every value. Floats are compared
exactly after canonical formatting — queries are required to round
non-deterministic aggregates themselves (see queries/_util.py), so any
mismatch here is a real bug, not noise.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import numpy as np

from parquet_exporter_spark.tables import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


def _canon_value(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "<null>"
        # 12 significant digits: enough to expose real differences, stable
        # across float32/float64 round-trips of already-rounded values.
        return f"{f:.12g}"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, datetime):
        try:
            return v.strftime("%Y-%m-%d %H:%M:%S.%f")
        except ValueError:  # pandas NaT (null timestamp)
            return "<null>"
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d 00:00:00.000000")
    return str(v)


def canonical_rows(df_pandas) -> list[tuple[str, ...]]:
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def complex_output_columns(df) -> list[str]:
    """Columns the driver's canonicalizer cannot hash (raw array/map/struct).

    The driver does a pandas ``sort_values`` over the raw frame; list/dict
    cells raise ``TypeError: unhashable type``. Queries must serialize
    complex outputs to scalars (array_join / to_json) on BOTH sides.
    """
    from pyspark.sql import types as T

    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def compare(spark, name: str, sf_dir: str, oracle: str, fn) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sparkdf = fn(spark, sf_dir)
    bad_cols = complex_output_columns(sparkdf)
    if bad_cols:
        problems.append(
            f"{name}: raw complex-typed output columns {bad_cols} would crash "
            "the driver canonicalizer; serialize via array_join/to_json"
        )
        return problems
    sdf = sparkdf.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        odf = con.sql(oracle).df()
    finally:
        con.close()

    bad_oracle_cols = [
        c
        for c in odf.columns
        if len(odf) and isinstance(odf[c].iloc[0], (list, tuple, dict, np.ndarray))
    ]
    if bad_oracle_cols:
        problems.append(
            f"{name}: oracle output columns {bad_oracle_cols} hold raw list/map "
            "cells that would crash the driver canonicalizer; serialize via "
            "array_join/to_json in the oracle SQL too"
        )
        return problems

    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
    srows, orows = canonical_rows(sdf), canonical_rows(odf)
    if srows != orows:
        diff_s = [r for r in srows if r not in set(orows)][:5]
        diff_o = [r for r in orows if r not in set(srows)][:5]
        problems.append(
            f"{name}: value mismatch; spark-only(first5)={diff_s} oracle-only(first5)={diff_o}"
        )
    return problems
