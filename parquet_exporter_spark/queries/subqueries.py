"""Subqueries and CTEs via the SQL surface.

spark.sql and DuckDB share ANSI syntax here, so the oracle is near-
identical text — what's being verified is Catalyst's decorrelation and
rewrite (scalar subquery → join, EXISTS → semi join, NOT EXISTS → anti
join), which `.explain` confirms and tests/test_plans.py asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import register


@query(
    "sql_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
    """,
    doc="Uncorrelated scalar subquery in a filter.",
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


@query(
    "sql_exists_correlated",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
    """,
    doc="Correlated EXISTS (decorrelated to a left-semi join by Catalyst).",
)
def sql_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderkey, o_orderstatus
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
        """
    )


@query(
    "sql_not_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'F')
    """,
    doc="Correlated NOT EXISTS (decorrelated to a left-anti join).",
)
def sql_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderstatus = 'F')
        """
    )


@query(
    "sql_in_subquery",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
    """,
    doc="IN subquery over a filtered fact table.",
)
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("part", "lineitem"))
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
        """
    )


@query(
    "sql_cte_multi_ref",
    oracle="""
    WITH cust_orders AS (
        SELECT o_custkey, count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY o_custkey
    ),
    stats AS (SELECT avg(n) AS avg_n FROM cust_orders)
    SELECT co.o_custkey, CAST(co.n AS BIGINT) AS n, co.total
    FROM cust_orders co, stats s
    WHERE co.n > s.avg_n
    """,
    doc="CTE referenced twice (tests plan reuse of a common subplan).",
)
def sql_cte_multi_ref(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH cust_orders AS (
            SELECT o_custkey, count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY o_custkey
        ),
        stats AS (SELECT avg(n) AS avg_n FROM cust_orders)
        SELECT co.o_custkey, CAST(co.n AS BIGINT) AS n, co.total
        FROM cust_orders co, stats s
        WHERE co.n > s.avg_n
        """
    )


@query(
    "sql_lateral_topn",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM customer,
    LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 3
    )
    WHERE c_mktsegment = 'MACHINERY'
    ORDER BY c_custkey, o_totalprice DESC, o_orderkey
    """,
    doc=(
        "Correlated LATERAL subquery: top-3 orders per MACHINERY customer. "
        "Catalyst rewrites the per-row subquery into a join + per-key "
        "window rank — no nested-loop re-execution per outer row."
    ),
)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey, o_totalprice
        FROM customer,
        LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 3
        )
        WHERE c_mktsegment = 'MACHINERY'
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey
        """
    )


@query(
    "sql_distribute_by",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity >= 30
    """,
    doc=(
        "DISTRIBUTE BY / SORT BY surface: explicit hash repartitioning on "
        "l_suppkey with a within-partition sort — the SQL form of "
        "repartition + sortWithinPartitions, used to lay data out for a "
        "downstream co-located consumer. Values are distribution-"
        "independent, so the oracle is the plain SELECT."
    ),
)
def sql_distribute_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity
        FROM lineitem WHERE l_quantity >= 30
        DISTRIBUTE BY l_suppkey SORT BY l_suppkey, l_orderkey
        """
    )


@query(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_totalprice >= 250000 AND o_orderpriority LIKE '1-%'
    GROUP BY o_orderpriority
    """,
    doc=(
        "Parameterized SQL (spark.sql named args): values bind as "
        "literals server-side — no string interpolation, no injection "
        "surface, and Catalyst constant-folds them like any literal, so "
        "pushdown still reaches the scan."
    ),
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        WHERE o_totalprice >= :min_total AND o_orderpriority LIKE :prio
        GROUP BY o_orderpriority
        """,
        args={"min_total": 250000, "prio": "1-%"},
    )


@query(
    "sql_identifier_template",
    oracle="""
    SELECT o_orderpriority AS key,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(o_totalprice), 2) AS avg_total
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc=(
        "Templated table/column names via the IDENTIFIER() clause "
        "(Spark 3.5+): the safe way to write generic per-table/per-column "
        "jobs (profilers, exporters) — names bind as parameters, not "
        "string-spliced SQL, so there is no injection surface and the "
        "analyzed plan is identical to the hand-written query."
    ),
)
def sql_identifier_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT IDENTIFIER(:col) AS key,
               count(*) AS n,
               round(avg(IDENTIFIER(:val)), 2) AS avg_total
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:col)
        """,
        args={"col": "o_orderpriority", "val": "o_totalprice", "tbl": "orders"},
    )
