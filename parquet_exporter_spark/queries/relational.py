"""Core relational operators: scan, projection, filter, sort, limit, distinct.

Covers the reference's entire single-SELECT surface re-expressed on the
driver star schema — projection+rename (schema.sql:4-38), casts
(schema.sql:9-11), coalesce defaults (examples/schema-extended.sql:10-51),
equality/boolean/IN/NOT NULL/AND filters (examples/schema-usa-sport-only.sql:22-25,
schema.sql:43), LIMIT (test-export.py:85) — plus the sort/top-k/distinct
operators of the extended inventory.

Scale notes: every query here is either a narrow scan+filter+project
pipeline (zero shuffles; filters and pruned columns reach the parquet
reader) or a single-shuffle aggregation/sort. Top-k uses orderBy+limit,
which Spark executes as TakeOrderedAndProject (per-partition heaps, no
global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table


@query(
    "scan_parquet",
    oracle="SELECT r_regionkey, r_name FROM region",
    doc="Parquet scan: full read of a table (reference R4, parquet2json.py:24).",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@query(
    "projection_compute",
    oracle="""
    SELECT p_partkey AS part_id,
           upper(p_brand) AS brand_uc,
           p_retailprice * 0.9 AS discounted,
           CAST(p_size AS VARCHAR) AS size_str
    FROM part
    """,
    doc="Projection with rename, computed column, and cast (reference R8/R11).",
)
def projection_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("part_id"),
        F.upper("p_brand").alias("brand_uc"),
        (F.col("p_retailprice") * 0.9).alias("discounted"),
        F.col("p_size").cast("string").alias("size_str"),
    )


@query(
    "filter_conjunction",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 45
      AND l_discount > 0.02
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate IS NOT NULL
      AND (l_linestatus = 'F' OR l_tax < 0.05)
    """,
    doc=(
        "Filter algebra: comparisons, BETWEEN, IN, IS NOT NULL, AND/OR "
        "(reference R13-R17). All predicates push down to the parquet scan."
    ),
)
def filter_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(5, 45)
        & (F.col("l_discount") > 0.02)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_shipdate").isNotNull()
        & ((F.col("l_linestatus") == "F") | (F.col("l_tax") < 0.05))
    ).select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_discount")


@query(
    "filter_like_rlike",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE '%BRASS%' OR regexp_matches(p_name, '^[a-d].*e$')
    """,
    doc="Pattern filters: LIKE and regexp (extended inventory).",
)
def filter_like_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").like("%BRASS%") | F.col("p_name").rlike("^[a-d].*e$")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "coalesce_defaults",
    oracle="""
    SELECT o_orderkey,
           coalesce(o_orderpriority, 'NONE') AS priority,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           coalesce(o_totalprice, 0.0) AS price_or_zero
    FROM orders
    """,
    doc="COALESCE/NULLIF default-fill (reference R12, examples/schema-extended.sql:10-51).",
)
def coalesce_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.coalesce("o_orderpriority", F.lit("NONE")).alias("priority"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_or_open"),
        F.coalesce("o_totalprice", F.lit(0.0)).alias("price_or_zero"),
    )


@query(
    "case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           CASE o_orderstatus WHEN 'F' THEN 1 ELSE 0 END AS is_finished
    FROM orders
    """,
    doc="Conditional expressions: CASE WHEN / simple CASE (extended inventory).",
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_finished"),
    )


@query(
    "distinct_values",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    doc="DISTINCT (hash-aggregate without aggregates).",
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    return cust.select("c_mktsegment", "c_nationkey").distinct()


@query(
    "sort_multi_key",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier
    ORDER BY s_nationkey DESC, s_acctbal ASC NULLS LAST
    """,
    doc=(
        "Multi-key sort with direction and null placement (extended "
        "inventory). Hash compare is order-insensitive; ordering itself is "
        "asserted in tests/test_operators.py."
    ),
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = read_table(spark, sf_dir, "supplier")
    return sup.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal").orderBy(
        F.col("s_nationkey").desc(), F.col("s_acctbal").asc_nulls_last()
    )


@query(
    "limit_rows",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 20
    """,
    doc="LIMIT with deterministic order (reference R18, test-export.py:85).",
)
def limit_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").limit(20)


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 15
    """,
    doc=(
        "Global top-K by value with key tiebreak (SURVEY section 5 trap: "
        "ties). Executes as TakeOrderedAndProject: per-partition heaps, "
        "only K rows cross the wire — no global sort at 100 TB."
    ),
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(15)
    )


@query(
    "count_star",
    oracle="SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem",
    doc="COUNT(*) — the reference's only aggregate (R19, test-export.py:105).",
)
def count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "limit_offset_page",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 15 OFFSET 30
    """,
    doc=(
        "Keyless pagination: ORDER BY + LIMIT/OFFSET (page 3 of size 15). "
        "Executes as a single global top-(offset+limit) heap then a "
        "driver-side skip — fine for UI pages; deep pagination at scale "
        "should switch to keyset (WHERE key > last_seen ORDER BY key "
        "LIMIT n), which this same plan shape serves."
    ),
)
def limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(30)
        .limit(15)
    )


@query(
    "ids_global_rownum",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           row_number() OVER (ORDER BY o_orderkey) AS row_id
    FROM orders
    """,
    doc=(
        "Contiguous 1-based global row ids in key order WITHOUT the "
        "single-partition global window (the canonical scale-killer): "
        "range-partition + in-partition sort, O(partitions) offset "
        "prefix-sum broadcast back, Arrow mapInPandas cumulative count — "
        "one data shuffle total (operators/ids.py). The oracle is the "
        "naive global row_number()."
    ),
)
def ids_global_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_exporter_spark.operators.ids import global_row_number

    # o_orderkey is unique at every SF — required: with a non-unique sort
    # key, tie order (and therefore id assignment inside a tie) is
    # engine-dependent.
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return global_row_number(o, ["o_orderkey"], id_col="row_id")


PAGE_SIZE = 25
PAGE_OFFSET = 50
# Keyset cursor = last row of the OFFSET page recipe's second page at any
# SF: a mid-1995 date that exists in every generation of the testdata.
KEYSET_DATE = "1995-06-15 00:00:00"


@query(
    "page_limit_offset",
    oracle=f"""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderdate, o_orderkey
    LIMIT {PAGE_SIZE} OFFSET {PAGE_OFFSET}
    """,
    doc=(
        "OFFSET pagination (ORDER BY ... LIMIT k OFFSET n): the API-"
        "compatibility surface. Total order is (date, key) so the page "
        "is deterministic. Scale note: OFFSET must still produce the "
        "first n+k rows of the global order — cost grows with page "
        "depth; page_keyset is the constant-cost form."
    ),
)
def page_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .offset(PAGE_OFFSET)
        .limit(PAGE_SIZE)
    )


@query(
    "page_keyset",
    oracle=f"""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    WHERE (o_orderdate, o_orderkey) > (TIMESTAMP '{KEYSET_DATE}', 0)
    ORDER BY o_orderdate, o_orderkey
    LIMIT {PAGE_SIZE}
    """,
    doc=(
        "Keyset (cursor) pagination: WHERE (date, key) > cursor ORDER BY "
        "(date, key) LIMIT k. The date bound pushes to the parquet scan "
        "(min/max row-group skipping) and the limit runs as "
        "TakeOrderedAndProject — constant cost per page regardless of "
        "depth, the pagination pattern that survives 100 TB."
    ),
)
def page_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    d = F.lit(KEYSET_DATE).cast("timestamp")
    after_cursor = (F.col("o_orderdate") > d) | (
        (F.col("o_orderdate") == d) & (F.col("o_orderkey") > 0)
    )
    return (
        orders.select("o_orderkey", "o_orderdate", "o_totalprice")
        .filter(after_cursor)
        .orderBy("o_orderdate", "o_orderkey")
        .limit(PAGE_SIZE)
    )
