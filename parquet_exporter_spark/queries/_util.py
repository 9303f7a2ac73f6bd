"""Shared helpers for oracle-parity queries.

Float aggregates are rounded on both the Spark and DuckDB sides: the two
engines sum partitions in different orders, so raw double aggregates differ
in the last bits and would break the driver's value-hash compare
(SURVEY.md section 5 trap list). ROUND_MONEY for large magnitudes (sums of
prices), ROUND_RATIO for small ones (averaged discounts, correlations).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ROUND_MONEY = 2
ROUND_RATIO = 6


def rmoney(c: Column) -> Column:
    return F.round(c, ROUND_MONEY)


def rratio(c: Column) -> Column:
    return F.round(c, ROUND_RATIO)
