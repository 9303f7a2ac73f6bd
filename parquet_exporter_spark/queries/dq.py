"""Data-quality operators: declarative constraint checks and column
profiling — the validation pass a production pipeline runs before
publishing a dataset (the Deequ/Great-Expectations capability class,
re-expressed as plain aggregates).

Each check compiles to a map-side-partial aggregate over one scan of the
table, and the union of checks is a handful of one-row aggregates — at
100 TB the cost is the scans, which Catalyst prunes to only the checked
columns (verified by the fleet plan audit's ReadSchema assertions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table


@query(
    "dq_constraint_checks",
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations,
           count(*) = count(DISTINCT o_orderkey) AS passed
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_fk', CAST(count(*) AS BIGINT), count(*) = 0
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'lineitem_qty_positive', CAST(count(*) AS BIGINT), count(*) = 0
    FROM lineitem WHERE l_quantity <= 0
    UNION ALL
    SELECT 'customer_name_not_null', CAST(count(*) AS BIGINT), count(*) = 0
    FROM customer WHERE c_name IS NULL
    """,
    doc=(
        "Declarative constraint validation: primary-key uniqueness, "
        "foreign-key referential integrity (anti-join orphan count), "
        "value-domain and not-null checks, unioned into one verdict table "
        "(check_name, violations, passed). The FK check is the only "
        "shuffle; the rest are single-scan aggregates."
    ),
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    lineitem = read_table(spark, sf_dir, "lineitem")

    pk = orders.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias("violations")
    ).select(
        F.lit("orders_pk_unique").alias("check_name"),
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )
    fk = (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left_anti"
        )
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(
            F.lit("orders_custkey_fk").alias("check_name"),
            "violations",
            (F.col("violations") == 0).alias("passed"),
        )
    )
    qty = (
        lineitem.filter(F.col("l_quantity") <= 0)
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(
            F.lit("lineitem_qty_positive").alias("check_name"),
            "violations",
            (F.col("violations") == 0).alias("passed"),
        )
    )
    nn = (
        customer.filter(F.col("c_name").isNull())
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(
            F.lit("customer_name_not_null").alias("check_name"),
            "violations",
            (F.col("violations") == 0).alias("passed"),
        )
    )
    return pk.unionAll(fk).unionAll(qty).unionAll(nn)


@query(
    "profile_table_summary",
    oracle="""
    SELECT 'c_custkey' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(c_custkey) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
           round(min(c_custkey), 6) AS min_val, round(max(c_custkey), 6) AS max_val
    FROM customer
    UNION ALL
    SELECT 'c_acctbal', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(c_acctbal) AS BIGINT),
           CAST(count(DISTINCT c_acctbal) AS BIGINT),
           round(min(c_acctbal), 6), round(max(c_acctbal), 6)
    FROM customer
    UNION ALL
    SELECT 'c_nationkey', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(c_nationkey) AS BIGINT),
           CAST(count(DISTINCT c_nationkey) AS BIGINT),
           round(min(c_nationkey), 6), round(max(c_nationkey), 6)
    FROM customer
    """,
    doc=(
        "Column profiling (long format): row/null/distinct counts and "
        "numeric min/max per profiled column — the dataset-card summary a "
        "corpus release ships with. One scan per column group, each a "
        "partial-aggregate; at scale the exact distinct count is the "
        "expensive term and the HLL variant (agg_approx_distinct / "
        "agg_hll_rollup) is the drop-in for wide columns."
    ),
)
def profile_table_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")

    def prof(col: str) -> DataFrame:
        return customer.agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(F.col(col))).alias("n_nulls"),
            F.count_distinct(F.col(col)).alias("n_distinct"),
            F.round(F.min(F.col(col)).cast("double"), 6).alias("min_val"),
            F.round(F.max(F.col(col)).cast("double"), 6).alias("max_val"),
        ).select(
            F.lit(col).alias("column_name"),
            "n_rows",
            "n_nulls",
            "n_distinct",
            "min_val",
            "max_val",
        )

    return prof("c_custkey").unionAll(prof("c_acctbal")).unionAll(prof("c_nationkey"))


@query(
    "profile_frequent_items",
    oracle="""
    SELECT o_orderpriority AS item, CAST(count(*) AS BIGINT) AS cnt
    FROM orders GROUP BY o_orderpriority
    """,
    doc=(
        "Frequent-items profiling via the approx_top_k space-saving "
        "sketch, exploded to (item, count) rows. The sketch capacity (8) "
        "exceeds the column's cardinality (5), which makes space-saving "
        "counts EXACT — so the oracle is the plain exact group-by, and "
        "the query still exercises the sketch path that stays "
        "fixed-memory when cardinality explodes at 100 TB."
    ),
)
def profile_frequent_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    sk = orders.agg(F.expr("approx_top_k(o_orderpriority, 8)").alias("tk"))
    return sk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("item"), F.col("e.count").alias("cnt")
    )


@query(
    "catalog_row_counts",
    oracle="""
    SELECT 'region' AS table_name, CAST((SELECT count(*) FROM region) AS BIGINT) AS n_rows
    UNION ALL SELECT 'nation', (SELECT count(*) FROM nation)
    UNION ALL SELECT 'customer', (SELECT count(*) FROM customer)
    UNION ALL SELECT 'supplier', (SELECT count(*) FROM supplier)
    UNION ALL SELECT 'part', (SELECT count(*) FROM part)
    UNION ALL SELECT 'orders', (SELECT count(*) FROM orders)
    UNION ALL SELECT 'lineitem', (SELECT count(*) FROM lineitem)
    """,
    doc=(
        "Catalog statistics surface: per-table row counts answered from "
        "parquet FOOTER metadata (tables.table_rowcount), zero data scan "
        "— the engine's equivalent of catalog stats that also feed the "
        "TF-IDF corpus-cardinality literal. The oracle recomputes the "
        "counts the slow way."
    ),
)
def catalog_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_exporter_spark import tables

    names = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
    rows = [(t, tables.table_rowcount(sf_dir, t)) for t in names]
    return spark.createDataFrame(rows, "table_name string, n_rows long")
