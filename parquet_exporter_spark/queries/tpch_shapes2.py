"""The remaining TPC-H query shapes (Q2/Q4/Q6/Q9/Q11-Q17/Q19/Q20/Q22) on the
driver star schema, completing the 22-query family started in
``tpch_shapes.py``.

The driver schema is TPC-H-ish but simplified — no ``partsupp`` table, no
``l_commitdate``/``l_receiptdate``, no phone/comment columns — so the shapes
that depend on those are ADAPTED while preserving the plan structure that
makes each query interesting:

- Q2's partsupp min-cost correlation -> a part/supplier unit-cost table
  derived from lineitem, same correlated-min + 4-dim join shape.
- Q4/Q12's commit-vs-receipt lateness -> shipped >N days after order date.
- Q9/Q11/Q16/Q20's partsupp usage -> lineitem as the part-supplier link.
- Q22's phone-prefix country code -> customer nation key.

Every aggregate is rounded identically on the Spark and DuckDB sides, and
count/sum-of-integer outputs are CAST to BIGINT in the oracle (DuckDB widens
to HUGEINT). Doubles that feed *comparisons* (Q2/Q15 min-equality) are
rounded before comparing so both engines agree at knife edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_exporter_spark.queries._util import rmoney, rratio
from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               round(avg(l_extendedprice / l_quantity), 2) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eligible AS (
        SELECT l_partkey, l_suppkey, unit_cost
        FROM cost
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'REGION_2'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, unit_cost
    FROM part
    JOIN eligible ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_size <= 15 AND p_type = 'LARGE'
      AND unit_cost = (
          SELECT min(e2.unit_cost) FROM eligible e2
          WHERE e2.l_partkey = p_partkey
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc=(
        "TPC-H Q2 shape (adapted: unit cost = avg sale price per unit from "
        "lineitem, since the schema has no partsupp): for each qualifying "
        "part, the REGION_2 supplier(s) with the minimum unit cost. The "
        "correlated min becomes a window-min over the part key — one "
        "shuffle, no second scan of the cost table."
    ),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "REGION_2")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 2).alias("unit_cost")
    )
    eligible = (
        cost.join(F.broadcast(supp), cost.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "l_suppkey", "unit_cost", "s_acctbal", "s_name", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    return (
        eligible.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc=(
        "TPC-H Q4 shape (adapted: 'late' = shipped >60 days after order "
        "date, no commit/receipt dates in schema): order counts per "
        "priority over a quarter, EXISTS decorrelated to a left-semi join."
    ),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc=(
        "TPC-H Q6: pure scan-filter-aggregate — every predicate pushes to "
        "the parquet scan; the plan is a single WholeStageCodegen span "
        "with a partial+final agg and no shuffle beyond the 1-row exchange."
    ),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(rmoney(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           -- DECIMAL(18,4) summation: per-row doubles are bit-identical
           -- across engines, and decimal addition is exact and
           -- order-independent, so the rounded total cannot straddle a
           -- 0.005 boundary differently per engine (it did at sf0.1 with
           -- raw double sums)
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                     - 0.08 * p_retailprice * l_quantity AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
    doc=(
        "TPC-H Q9 shape (adapted: supply cost = 8% of part retail price, "
        "since the schema has no partsupp): profit per supplier nation per "
        "year over parts matching a LIKE pattern. part/supplier/nation "
        "broadcast; only the lineitem-orders join shuffles."
    ),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.08 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.round(F.sum(F.col("profit").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH nation_value AS (
        SELECT l_partkey, sum(l_extendedprice) AS value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_4'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS ps_partkey, round(value, 2) AS value
    FROM nation_value
    WHERE value > (SELECT sum(value) * 0.002 FROM nation_value)
    ORDER BY value DESC, ps_partkey
    """,
    doc=(
        "TPC-H Q11 shape (adapted: 'stock value' = lineitem revenue per "
        "part for one nation's suppliers): groups whose value exceeds a "
        "fraction of the global total. The scalar subquery re-aggregates "
        "the grouped result (tiny) rather than rescanning lineitem; Spark "
        "side broadcasts the 1-row total as a cross join."
    ),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    per_part = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    total = per_part.agg((F.sum("value") * 0.002).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("ps_partkey"), rmoney(F.col("value")).alias("value"))
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    doc=(
        "TPC-H Q12 shape (adapted: line status stands in for ship mode, "
        "lateness = shipped >30 days after order): per-status counts of "
        "high- vs low-priority orders via conditional aggregation."
    ),
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc=(
        "TPC-H Q13 shape (adapted filter: exclude urgent orders instead of "
        "comment-pattern orders): order-count histogram over customers — a "
        "left outer join with a join-side predicate, then two cascaded "
        "aggregations (per-customer count, then count distribution)."
    ),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    doc=(
        "TPC-H Q14: share of one month's revenue from PROMO parts — "
        "broadcast part join plus a conditional-aggregate ratio."
    ),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    part = read_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            rratio(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev)
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc=(
        "TPC-H Q15: supplier(s) with the max quarterly revenue. Revenue is "
        "rounded BEFORE the max-equality compare so both engines agree at "
        "float knife edges; the max re-aggregates the tiny grouped result "
        "and broadcasts back (no second lineitem scan)."
    ),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = read_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        rmoney(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_revenue"
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        supp.join(F.broadcast(revenue), supp.s_suppkey == F.col("supplier_no"))
        .join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc=(
        "TPC-H Q16 shape (adapted: lineitem as the part-supplier link, "
        "negative-balance suppliers stand in for complaint suppliers): "
        "distinct supplier counts per brand/type/size with a NOT IN "
        "exclusion — a broadcast anti join feeding a distinct aggregate."
    ),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    bad_supp = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND l_quantity < (
          SELECT 0.2 * avg(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p_partkey
      )
    """,
    doc=(
        "TPC-H Q17: revenue from small-quantity orders of one brand — the "
        "correlated per-part average decorrelates to a grouped aggregate "
        "joined back on the part key. Safe unrounded: l_quantity is "
        "integer-valued, so sum/count/avg are bit-identical across engines."
    ),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(rmoney(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "q19_bracketed_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc=(
        "TPC-H Q19: disjunction of brand/size/quantity brackets — Catalyst "
        "extracts the common join key and pushes the residual OR below the "
        "broadcast join as a single filter."
    ),
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    bracket = (
        ((F.col("p_brand") == "Brand#12") & size.between(1, 5) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & size.between(1, 10) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & size.between(1, 15) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(bracket)
        .agg(rmoney(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@query(
    "q20_promotable_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_2'
      AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
          )
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_suppkey
          HAVING sum(l_quantity) > 100
      )
    ORDER BY s_name
    """,
    doc=(
        "TPC-H Q20 shape (adapted: 'has excess stock' = shipped >100 units "
        "of red parts in the year): nested IN subqueries decorrelate to a "
        "broadcast semi-join chain — part filter into lineitem, grouped "
        "HAVING into supplier. sum(l_quantity) is integer-valued, so the "
        "HAVING compare is engine-stable unrounded."
    ),
)
def q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    red_parts = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    heavy = (
        li.join(F.broadcast(red_parts), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi")
        .join(F.broadcast(heavy), supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH pool AS (
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer
        WHERE c_nationkey IN (1, 5, 9, 13, 17)
    )
    SELECT c_nationkey AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM pool
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM pool WHERE c_acctbal > 0)
      AND NOT EXISTS (
          SELECT 1 FROM orders WHERE o_custkey = c_custkey
      )
    GROUP BY c_nationkey
    ORDER BY cntrycode
    """,
    doc=(
        "TPC-H Q22 shape (adapted: nation key stands in for the phone "
        "country code): above-average-balance customers from selected "
        "nations with no orders — scalar-average subquery broadcast as a "
        "1-row cross join, NOT EXISTS as a shuffle anti join on orders."
    ),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    pool = read_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 5, 9, 13, 17)
    )
    orders = read_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = pool.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        pool.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, pool.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            rmoney(F.sum("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "q5_local_supplier",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc=(
        "TPC-H Q5 proper (vs the flagship's Q5 *shape*): revenue from "
        "LOCAL suppliers only — the supplier join carries the extra "
        "s_nationkey = c_nationkey equality, which is what distinguishes "
        "Q5 from a plain star join. supplier/nation/region broadcast; the "
        "lineitem-orders-customer chain shuffles on its keys; region "
        "filter prunes before the fact join."
    ),
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(rmoney(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )
