"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join splitting (on in the session factory) handles most skew at
runtime; these explicit operators are for the cases AQE can't fix — a
single hot GROUP BY key whose partial aggregate still overwhelms one task,
or a hot join key against a non-broadcastable side.

Salted aggregation = two-phase: aggregate (key, salt) first — the hot
key's rows spread over N tasks — then aggregate the partials by key. Only
algebraic aggregates (sum/count/min/max, and avg via sum+count) compose
this way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """sum/count/avg per key via two-phase salted aggregation."""
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(
        F.sum(value).alias("__s"), F.count(F.lit(1)).alias("__c")
    )
    return partial.groupBy(key).agg(
        F.sum("__s").alias(f"sum_{value}"),
        F.sum("__c").alias("n_rows"),
        (F.sum("__s") / F.sum("__c")).alias(f"avg_{value}"),
    )


def salted_join_hot_keys(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    hot_keys: list,
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join where `hot_keys` dominate the fact side: replicate the dim
    rows for hot keys across n_salts, salt the fact side to match, join on
    (key, salt). Non-hot keys use salt 0 on both sides — one join, no
    second pass. Columns of both inputs are preserved (minus the helper
    salt columns)."""
    hot = F.col(fact_key).isin(hot_keys)
    fact_s = fact.withColumn(
        "__salt",
        F.when(hot, (F.rand(seed=7) * n_salts).cast("int")).otherwise(F.lit(0)),
    )
    salts = F.when(
        F.col(dim_key).isin(hot_keys),
        F.sequence(F.lit(0), F.lit(n_salts - 1)),
    ).otherwise(F.array(F.lit(0)))
    dim_s = dim.withColumn("__salt", F.explode(salts))
    cond = (F.col(f"__fact.{fact_key}") == F.col(f"__dim.{dim_key}")) & (
        F.col("__fact.__salt") == F.col("__dim.__salt")
    )
    joined = fact_s.alias("__fact").join(dim_s.alias("__dim"), cond)
    keep = [F.col(f"__fact.{c}") for c in fact.columns] + [
        F.col(f"__dim.{c}") for c in dim.columns if c != dim_key
    ]
    return joined.select(*keep)
