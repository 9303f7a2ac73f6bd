"""Set operations: union all/distinct, intersect, except (all).

Spark's unionByName is used everywhere (positional union is a footgun the
oracle's SQL UNION doesn't have because both sides are written with
identical projections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table


def _subsets(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = read_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 250000).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return big, urgent


_ORACLE_SUBSETS = """
    big AS (SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_totalprice > 250000),
    urgent AS (SELECT o_orderkey, o_orderstatus, o_totalprice
               FROM orders WHERE o_orderpriority = '1-URGENT')
"""


@query(
    "setop_union_all",
    oracle=f"WITH {_ORACLE_SUBSETS} SELECT * FROM big UNION ALL SELECT * FROM urgent",
    doc="UNION ALL (bag union, no dedup shuffle).",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    big, urgent = _subsets(spark, sf_dir)
    return big.unionByName(urgent)


@query(
    "setop_union_distinct",
    oracle=f"WITH {_ORACLE_SUBSETS} SELECT * FROM big UNION SELECT * FROM urgent",
    doc="UNION DISTINCT (dedup across both inputs).",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    big, urgent = _subsets(spark, sf_dir)
    return big.unionByName(urgent).distinct()


@query(
    "setop_intersect",
    oracle=f"WITH {_ORACLE_SUBSETS} SELECT * FROM big INTERSECT SELECT * FROM urgent",
    doc="INTERSECT (distinct rows present in both inputs).",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    big, urgent = _subsets(spark, sf_dir)
    return big.intersect(urgent)


@query(
    "setop_except_all",
    oracle=f"WITH {_ORACLE_SUBSETS} SELECT * FROM big EXCEPT ALL SELECT * FROM urgent",
    doc="EXCEPT ALL (bag difference, preserves multiplicity).",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    big, urgent = _subsets(spark, sf_dir)
    return big.exceptAll(urgent)


@query(
    "setop_union_by_name",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority, NULL AS o_orderstatus
    FROM orders WHERE o_totalprice > 400000
    UNION ALL
    SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority, o_orderstatus
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc=(
        "Schema-evolution union: unionByName(allowMissingColumns=True) "
        "aligns inputs BY COLUMN NAME and null-fills columns one side "
        "lacks — how an engine unions parquet generations whose schemas "
        "drifted. Positional UNION ALL would silently misalign here "
        "because the two projections order columns differently."
    ),
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    old_gen = orders.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    new_gen = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return old_gen.unionByName(new_gen, allowMissingColumns=True).select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "o_orderstatus"
    )


@query(
    "setop_intersect_all",
    oracle=f"WITH {_ORACLE_SUBSETS} SELECT * FROM big INTERSECT ALL SELECT * FROM urgent",
    doc=(
        "INTERSECT ALL (bag intersection, preserves multiplicity): planned "
        "as a single hash-partitioned count-compare on the row key, the "
        "same one-shuffle shape as EXCEPT ALL."
    ),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    big, urgent = _subsets(spark, sf_dir)
    return big.intersectAll(urgent)


@query(
    "setop_except_distinct",
    oracle=f"WITH {_ORACLE_SUBSETS} SELECT * FROM big EXCEPT SELECT * FROM urgent",
    doc=(
        "EXCEPT DISTINCT (set difference: distinct left rows absent from "
        "the right) — DataFrame `subtract`, planned as a dedup + left "
        "anti join on all columns."
    ),
)
def setop_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    big, urgent = _subsets(spark, sf_dir)
    return big.subtract(urgent)
