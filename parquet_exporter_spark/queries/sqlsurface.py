"""SQL-surface extensions: LISTAGG-style string aggregation, deterministic
MODE, discrete percentiles (WITHIN GROUP), GROUP BY ALL, and SQL PIVOT.

These widen the ANSI-SQL surface beyond the reference's R1-R24 list
(the reference delegates all SQL to embedded DuckDB, so its effective
surface is "whatever DuckDB parses"; SURVEY.md section 2.2 therefore
tracks the standard OLAP SQL feature set). Everything here is a single
declarative plan — Catalyst compiles PIVOT and GROUP BY ALL to the same
conditional-aggregation / hash-aggregate shapes the hand-written variants
in aggregates.py use, so the 100 TB posture is identical: map-side
partial aggregation into one shuffle on the grouping keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_exporter_spark.queries._util import rmoney
from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table, register


@query(
    "agg_string_agg",
    oracle="""
    SELECT n.n_name,
           string_agg(s.s_name, ',' ORDER BY s.s_name) AS suppliers,
           CAST(count(*) AS BIGINT) AS n_suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc=(
        "LISTAGG / string_agg: per-nation sorted CSV of supplier names. "
        "Spark lacks an ordered string_agg aggregate, so the plan collects "
        "then sorts per group (sort_array(collect_list)) — deterministic "
        "output, same single-shuffle hash aggregate. Group payloads are "
        "bounded by group cardinality, not corpus size, so the collect is "
        "safe at scale for dimension-sized groups."
    ),
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("s_name")), ",").alias("suppliers"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    WITH counted AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        FROM orders GROUP BY 1, 2
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority,
           CAST(cnt AS BIGINT) AS n_rows
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_orderstatus
            ORDER BY cnt DESC, o_orderpriority ASC) AS rn
        FROM counted
    ) WHERE rn = 1
    """,
    doc=(
        "Deterministic MODE: most frequent order priority per status, "
        "ties broken by smallest value (both engines' native mode() picks "
        "an arbitrary tie winner, so the operator is spelled as "
        "count + row_number on BOTH sides for a stable contract). Two "
        "shuffles: the count aggregate, then a tiny window over one row "
        "per (status, priority) pair — the window input is already "
        "aggregate-sized, not fact-sized."
    ),
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    counted = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority").asc()
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").alias("n_rows"),
        )
    )


@query(
    "agg_percentile_disc",
    oracle="""
    -- ANSI PERCENTILE_DISC spelled out (smallest value whose cume_dist >= p)
    -- rather than DuckDB's quantile_disc, whose index convention
    -- (floor((n-1)*p)) differs from the standard at some (n, p).
    WITH ranked AS (
        SELECT l_returnflag, l_quantity,
               cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cd
        FROM lineitem
    )
    SELECT l_returnflag,
           round(min(CASE WHEN cd >= 0.25 THEN l_quantity END), 2) AS q25,
           round(min(CASE WHEN cd >= 0.50 THEN l_quantity END), 2) AS q50,
           round(min(CASE WHEN cd >= 0.75 THEN l_quantity END), 2) AS q75
    FROM ranked GROUP BY l_returnflag
    """,
    doc=(
        "Discrete percentiles (PERCENTILE_DISC ... WITHIN GROUP): exact "
        "order-statistics that return an actual data value, complementing "
        "the continuous/approximate variants in agg_median_percentile and "
        "agg_approx_percentile. Exact percentiles need the group's values "
        "together (single shuffle on the group key); the scale path for "
        "wide groups is the approx_percentile sketch, kept as its own "
        "registered query."
    ),
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag,
               round(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity), 2) AS q25,
               round(percentile_disc(0.50) WITHIN GROUP (ORDER BY l_quantity), 2) AS q50,
               round(percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity), 2) AS q75
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "sql_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc=(
        "GROUP BY ALL (SQL:2023-ish convenience both Spark >= 3.4 and "
        "DuckDB support): grouping keys inferred as every non-aggregate "
        "select item. Compiles to the identical hash aggregate as the "
        "explicit column list — asserted by the shared oracle."
    ),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY ALL
        """
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(avg(l_quantity), 2) AS avg_qty,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
    GROUP BY l_returnflag
    ORDER BY revenue DESC
    LIMIT 3
    """,
    doc=(
        "SQL pipe syntax (Spark 4.0, the |> operator chain from the "
        "GoogleSQL 'Pipe Syntax In SQL' design): FROM ... |> WHERE |> "
        "AGGREGATE ... GROUP BY |> ORDER BY |> LIMIT, each stage reading "
        "top-to-bottom like a DataFrame chain. Compiles to the identical "
        "logical plan as the nested ANSI form — the pushed scan filter, "
        "partial+final aggregate, and TakeOrdered are unchanged, which "
        "the shared ANSI oracle asserts."
    ),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= DATE '1995-01-01'
        |> AGGREGATE round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                     round(avg(l_quantity), 2) AS avg_qty,
                     count(*) AS n_rows
           GROUP BY l_returnflag
        |> ORDER BY revenue DESC
        |> LIMIT 3
        """
    )


@query(
    "sql_pivot_wide",
    oracle="""
    SELECT o_orderpriority,
           round(avg(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS avg_open,
           round(avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS avg_filled,
           round(avg(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS avg_partial
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc=(
        "SQL PIVOT syntax (Spark's native `PIVOT (agg FOR col IN (...))` "
        "clause, vs the DataFrame .pivot API in agg_conditional_pivot). "
        "Catalyst rewrites PIVOT to conditional aggregation — one "
        "map-side-partial hash aggregate, no extra shuffle vs the "
        "hand-written CASE form the oracle runs."
    ),
)
def sql_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority,
               round(avg_open, 2) AS avg_open,
               round(avg_filled, 2) AS avg_filled,
               round(avg_partial, 2) AS avg_partial
        FROM (
            SELECT * FROM (
                SELECT o_orderpriority, o_orderstatus, o_totalprice FROM orders
            )
            PIVOT (avg(o_totalprice)
                   FOR o_orderstatus IN ('O' AS avg_open, 'F' AS avg_filled,
                                         'P' AS avg_partial))
        )
        """
    )


@query(
    "window_named_frame_exclude",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
           - round(o_totalprice, 2) AS trailing2_excl_self
    FROM orders
    """,
    doc=(
        "Window frame with current-row exclusion (ANSI EXCLUDE CURRENT ROW "
        "semantics): trailing-2 sum minus self. Spark has no EXCLUDE "
        "clause, so the operator is spelled frame-sum-minus-current — the "
        "standard rewrite — and the oracle mirrors it; one shuffle on the "
        "partition key, sorted within partitions."
    ),
)
def window_named_frame_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        (rmoney(F.sum("o_totalprice").over(w)) - rmoney(F.col("o_totalprice"))).alias(
            "trailing2_excl_self"
        ),
    )


@query(
    "window_ratio_to_report",
    oracle="""
    WITH bal AS (
        SELECT c_nationkey,
               CAST(round(100 * round(sum(c_acctbal), 2)) AS BIGINT) AS bal_cents
        FROM customer GROUP BY c_nationkey
    )
    SELECT c_nationkey,
           round(bal_cents / 100.0, 2) AS nation_balance,
           round(CAST(bal_cents AS DOUBLE) / sum(bal_cents) OVER (), 6) AS share
    FROM bal
    """,
    doc=(
        "RATIO_TO_REPORT / percent-of-total: each nation's share of total "
        "customer balance via an unbounded window over the aggregated "
        "rows. The per-group sums are rounded to cents and summed as "
        "BIGINT so the grand total is order-independent across engines "
        "(a raw double grand total would depend on summation order). "
        "Window input is aggregate-sized (25 rows), not fact-sized."
    ),
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    bal = cust.groupBy("c_nationkey").agg(
        F.round(F.round(F.sum("c_acctbal"), 2) * 100).cast("bigint").alias("bal_cents")
    )
    w = Window.partitionBy()
    return bal.select(
        "c_nationkey",
        F.round(F.col("bal_cents") / 100.0, 2).alias("nation_balance"),
        F.round(
            F.col("bal_cents").cast("double") / F.sum("bal_cents").over(w), 6
        ).alias("share"),
    )


@query(
    "sql_udf_scalar",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS disc_revenue
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "SQL scalar UDF (Spark 4 `CREATE FUNCTION ... RETURN expr`): the "
        "discounted-price formula defined once in SQL and reused. Catalyst "
        "INLINES the function body into the plan, so the aggregate is "
        "byte-identical to writing the expression out (which is exactly "
        "what the oracle does) — a SQL UDF is free at any scale, unlike a "
        "Python UDF."
    ),
)
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("lineitem",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               round(sum(disc_price(l_extendedprice, l_discount)), 2) AS disc_revenue
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "sql_session_variable",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_big
    FROM orders WHERE o_totalprice > 150000.0
    GROUP BY o_orderpriority
    """,
    doc=(
        "Session variables (Spark 4 `DECLARE VARIABLE` / SQL:2023): a "
        "parameterized threshold referenced by name inside the query. "
        "Variables resolve to literals at analysis time, so the filter "
        "still pushes to the scan; the oracle inlines the same value."
    ),
)
def sql_session_variable(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("orders",))
    spark.sql("DECLARE OR REPLACE VARIABLE big_order_cutoff DOUBLE DEFAULT 150000.0")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_big
        FROM orders WHERE o_totalprice > big_order_cutoff
        GROUP BY o_orderpriority
        """
    )


@query(
    "fn_collated_compare",
    oracle="""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_matches
    FROM customer
    WHERE lower(c_mktsegment) IN ('automobile', 'building')
    GROUP BY c_mktsegment
    """,
    doc=(
        "String collations (Spark 4): case-insensitive comparison via "
        "UTF8_LCASE collation instead of wrapping every operand in "
        "lower() — the collation travels with the type, so comparisons, "
        "GROUP BY, and joins all honor it. initcap() manufactures mixed "
        "case so the test is non-degenerate on the uppercase source data; "
        "DuckDB expresses the same predicate with lower()."
    ),
)
def fn_collated_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_matches
        FROM customer
        WHERE initcap(c_mktsegment) COLLATE UTF8_LCASE IN ('aUtOmObIlE', 'BUILDING')
        GROUP BY c_mktsegment
        """
    )


@query(
    "join_existence_flag",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           f.o_custkey IS NOT NULL AS has_open_order
    FROM customer c
    LEFT JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O') f
      ON c.c_custkey = f.o_custkey
    """,
    doc=(
        "Mark join / existence flag: annotate every customer with whether "
        "an open order EXISTS, without dropping non-matches (semi join) "
        "or duplicating matches (inner join). Spelled as a left join "
        "against the DISTINCT key set on both sides; the distinct "
        "pre-aggregation bounds the build side by key cardinality."
    ),
)
def join_existence_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    open_keys = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
        .distinct()
    )
    return cust.join(open_keys, cust.c_custkey == open_keys.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.col("o_custkey").isNotNull().alias("has_open_order"),
    )


@query(
    "agg_winsorize",
    oracle="""
    WITH bounds AS (
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.05), 2) AS lo,
               round(quantile_cont(l_extendedprice, 0.95), 2) AS hi
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag, b.lo, b.hi,
           round(avg(l.l_extendedprice), 2) AS avg_raw,
           round(avg(least(greatest(l.l_extendedprice, b.lo), b.hi)), 2)
               AS avg_winsorized,
           CAST(count(*) FILTER (WHERE l.l_extendedprice < b.lo
                                    OR l.l_extendedprice > b.hi) AS BIGINT)
               AS n_clamped
    FROM lineitem l JOIN bounds b USING (l_returnflag)
    GROUP BY l.l_returnflag, b.lo, b.hi
    """,
    doc=(
        "Winsorization: clamp a metric to its per-group [p5, p95] band "
        "(exact interpolated percentiles, rounded on both engines before "
        "clamping so the band edges are bit-identical) and report "
        "raw-vs-winsorized means plus the clamp count — the standard "
        "outlier-robust normalization before training-mix statistics. "
        "Bounds are a group-cardinality aggregate broadcast back onto "
        "the fact; the fact table shuffles once for the final per-group "
        "average."
    ),
)
def agg_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.05)"), 2).alias("lo"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 2).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
    out_of_band = (F.col("l_extendedprice") < F.col("lo")) | (
        F.col("l_extendedprice") > F.col("hi")
    )
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag", "lo", "hi")
        .agg(
            rmoney(F.avg("l_extendedprice")).alias("avg_raw"),
            rmoney(F.avg(clamped)).alias("avg_winsorized"),
            F.count_if(out_of_band).alias("n_clamped"),
        )
    )


FUZZY_MAX_DIST = 3


@query(
    "join_fuzzy_string",
    oracle=f"""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM names a JOIN names b
      ON substring(a.p_name, 1, 1) = substring(b.p_name, 1, 1)
     AND abs(length(a.p_name) - length(b.p_name)) <= {FUZZY_MAX_DIST}
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
    """,
    doc=(
        "Fuzzy string join (record linkage): near-matching product names "
        "within Levenshtein distance 3, candidate-blocked on (first "
        "char, length band) before the quadratic distance runs — edit "
        "distance >= length difference, so the length band is LOSSLESS "
        "pruning while the shared-first-char block is the documented "
        "recall tradeoff standard in entity resolution. Identical "
        "blocking on both engines keeps the oracle exact. At 100 TB the "
        "block key becomes the shuffle key; within-block cost is bounded "
        "by block occupancy, not corpus size."
    ),
)
def join_fuzzy_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = read_table(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return (
        a.join(
            b,
            (F.substring("name_a", 1, 1) == F.substring("name_b", 1, 1))
            & (
                F.abs(F.length("name_a") - F.length("name_b"))
                <= FUZZY_MAX_DIST
            )
            & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
        .select("name_a", "name_b", F.col("dist").cast("bigint").alias("dist"))
    )


@query(
    "linkage_fellegi_sunter",
    oracle="""
    WITH c AS (
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal
        FROM customer
    ),
    scored AS (
        SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
               round(
                 (CASE WHEN levenshtein(a.c_name, b.c_name) <= 2
                       THEN 2.5 ELSE -1.0 END)
               + (CASE WHEN a.c_mktsegment = b.c_mktsegment
                       THEN 1.5 ELSE -0.5 END)
               + (CASE WHEN abs(a.c_acctbal - b.c_acctbal) < 100.0
                       THEN 1.0 ELSE -0.5 END), 1) AS link_score
        FROM c a JOIN c b
          ON a.c_nationkey = b.c_nationkey
         AND a.c_custkey < b.c_custkey
    )
    SELECT cust_a, cust_b, link_score
    FROM scored
    WHERE link_score >= 3.0
    """,
    doc=(
        "Probabilistic record linkage (Fellegi-Sunter shape): candidate "
        "pairs blocked on nation, then a multi-field match score — "
        "per-field agreement/disagreement weights over name edit "
        "distance, segment equality, and balance proximity — with pairs "
        "above the upper threshold declared links. The multi-field score "
        "is what single-field fuzzy joins (join_fuzzy_string) can't "
        "express: one field may disagree and the pair still link on the "
        "others' evidence. Identical literal weights on both engines keep "
        "the oracle exact. At 100 TB the blocking key IS the shuffle key "
        "and within-block occupancy bounds the quadratic term; finer or "
        "unioned blocking passes (sorted-neighborhood, phonetic keys) "
        "are the standard recall/cost knob."
    ),
)
def linkage_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    a = c.select(*[F.col(x).alias(f"{x}_a") for x in c.columns])
    b = c.select(*[F.col(x).alias(f"{x}_b") for x in c.columns])
    pairs = a.join(
        b,
        (F.col("c_nationkey_a") == F.col("c_nationkey_b"))
        & (F.col("c_custkey_a") < F.col("c_custkey_b")),
    )
    w_name = F.when(
        F.levenshtein("c_name_a", "c_name_b") <= 2, F.lit(2.5)
    ).otherwise(F.lit(-1.0))
    w_seg = F.when(
        F.col("c_mktsegment_a") == F.col("c_mktsegment_b"), F.lit(1.5)
    ).otherwise(F.lit(-0.5))
    w_bal = F.when(
        F.abs(F.col("c_acctbal_a") - F.col("c_acctbal_b")) < 100.0, F.lit(1.0)
    ).otherwise(F.lit(-0.5))
    return (
        pairs.select(
            F.col("c_custkey_a").alias("cust_a"),
            F.col("c_custkey_b").alias("cust_b"),
            F.round(w_name + w_seg + w_bal, 1).alias("link_score"),
        )
        .filter(F.col("link_score") >= 3.0)
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH ev AS (
        SELECT event_id, user_id, ts - INTERVAL 27 YEAR AS shifted_ts
        FROM events
    ),
    day_orders AS (
        SELECT o_custkey, o_orderdate,
               CAST(max(o_orderkey) AS BIGINT) AS next_orderkey,
               round(sum(o_totalprice), 2) AS day_total
        FROM orders
        GROUP BY o_custkey, o_orderdate
    ),
    u AS (
        SELECT user_id AS k, shifted_ts AS t, 0 AS side, event_id,
               CAST(NULL AS BIGINT) AS next_orderkey,
               CAST(NULL AS DOUBLE) AS day_total
        FROM ev
        UNION ALL
        SELECT o_custkey, o_orderdate, 1, CAST(NULL AS BIGINT),
               next_orderkey, day_total
        FROM day_orders
    ),
    f AS (
        SELECT event_id, k AS user_id, side,
               first_value(next_orderkey IGNORE NULLS) OVER w AS next_orderkey,
               first_value(day_total IGNORE NULLS) OVER w AS day_total
        FROM u
        WINDOW w AS (PARTITION BY k ORDER BY t, side
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id, next_orderkey, day_total FROM f WHERE side = 0
    """,
    doc=(
        "FORWARD as-of join: each event matched to the EARLIEST same-"
        "customer order-day at or after it — the complement of join_asof's "
        "backward direction (operators/asof.py, direction='forward'); "
        "next-scheduled-delivery / next-price-change lookups. Same single-"
        "shuffle union-window shape with the window reversed; DuckDB's "
        "native ASOF only does backward, so the oracle spells the same "
        "union-window in SQL."
    ),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_exporter_spark.operators.asof import asof_join
    from parquet_exporter_spark.queries._util import rmoney

    events = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 27 YEARS")).alias("shifted_ts"),
    )
    day_orders = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("next_orderkey"),
            rmoney(F.sum("o_totalprice")).alias("day_total"),
        )
    )
    joined = asof_join(
        events,
        day_orders,
        left_key="user_id",
        right_key="o_custkey",
        left_time="shifted_ts",
        right_time="o_orderdate",
        payload_cols=["next_orderkey", "day_total"],
        direction="forward",
    )
    return joined.select("event_id", "user_id", "next_orderkey", "day_total")


@query(
    "sql_unpivot_clause",
    oracle="""
    SELECT o_orderkey, metric, val
    FROM (SELECT o_orderkey, round(o_totalprice, 2) AS price,
                 CAST(o_custkey AS DOUBLE) AS custkey_d
          FROM orders)
    UNPIVOT (val FOR metric IN (price AS 'total_price', custkey_d AS 'cust_key'))
    """,
    doc=(
        "SQL UNPIVOT syntax (the native `UNPIVOT (val FOR name IN (...))` "
        "clause both engines parse, vs the stack() expression form in "
        "unpivot_stack). Catalyst rewrites UNPIVOT to the same Expand "
        "node as stack — a narrow 1->k row expansion inside codegen, no "
        "shuffle; rows with NULL values are dropped per the clause's "
        "default on BOTH engines, which is part of the contract."
    ),
)
def sql_unpivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, metric, val
        FROM (SELECT o_orderkey, round(o_totalprice, 2) AS price,
                     CAST(o_custkey AS DOUBLE) AS custkey_d
              FROM orders)
        UNPIVOT (val FOR metric IN (price AS total_price, custkey_d AS cust_key))
        """
    )


@query(
    "sql_execute_immediate",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(avg(c_acctbal), 2) AS avg_balance
    FROM customer
    WHERE c_nationkey < 10
    GROUP BY c_mktsegment
    """,
    doc=(
        "EXECUTE IMMEDIATE (Spark 4 dynamic SQL): a query assembled as a "
        "string and executed with USING-bound parameters — the migration "
        "surface for warehouse scripts that build SQL at runtime. The "
        "parameter binds as a literal foldable at analysis time, so the "
        "c_nationkey bound reaches the parquet scan as a pushed filter "
        "exactly like the static form the oracle runs; dynamic SQL costs "
        "nothing at execution."
    ),
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        EXECUTE IMMEDIATE
        'SELECT c_mktsegment,
                count(*) AS n_customers,
                round(avg(c_acctbal), 2) AS avg_balance
         FROM customer WHERE c_nationkey < ? GROUP BY c_mktsegment'
        USING 10
        """
    )


@query(
    "sql_select_star_except",
    oracle="""
    SELECT * EXCLUDE (n_comment_missing) FROM (
        SELECT n_nationkey, n_name, n_regionkey,
               NULL AS n_comment_missing
        FROM nation
    ) ORDER BY n_nationkey
    """,
    doc=(
        "SELECT * EXCEPT (...) — Spark 4's column-exclusion projection "
        "(DuckDB spells it EXCLUDE; the oracle uses its dialect, the "
        "result contract is identical). Resolves at analysis time to a "
        "plain column-pruned projection, so the dropped column never "
        "leaves the scan — the ergonomic form of wide-table hygiene "
        "('everything but the blob column') that matters at 100 TB "
        "where accidental full-width scans dominate I/O."
    ),
)
def sql_select_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("nation",))
    return spark.sql(
        """
        SELECT * EXCEPT (n_comment_missing) FROM (
            SELECT n_nationkey, n_name, n_regionkey,
                   NULL AS n_comment_missing
            FROM nation
        ) ORDER BY n_nationkey
        """
    )


@query(
    "sql_values_inline",
    oracle="""
    WITH pri(code, label) AS (
        VALUES ('1-URGENT', 'urgent'), ('2-HIGH', 'high'), ('3-MEDIUM', 'medium'),
               ('4-NOT SPECIFIED', 'unspecified'), ('5-LOW', 'low')
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders JOIN pri ON o_orderpriority = code
    GROUP BY 1
    """,
    doc=(
        "Inline VALUES dimension: a literal lookup table declared in the "
        "query text (the code->label decode every report has) joined to "
        "the fact scan. The VALUES relation is a LocalRelation — no scan, "
        "no file — and the BROADCAST hint pins the replicated join, so "
        "the fact table never shuffles; the aggregate's partial phase "
        "runs map-side behind it."
    ),
)
def sql_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH pri(code, label) AS (
            VALUES ('1-URGENT', 'urgent'), ('2-HIGH', 'high'), ('3-MEDIUM', 'medium'),
                   ('4-NOT SPECIFIED', 'unspecified'), ('5-LOW', 'low')
        )
        SELECT /*+ BROADCAST(pri) */ label, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders JOIN pri ON o_orderpriority = code
        GROUP BY label
        """
    )


@query(
    "sql_qualify_emulation",
    oracle="""
    SELECT custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey AS custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 2
    """,
    doc=(
        "QUALIFY emulation: Spark has no QUALIFY clause, so the window-"
        "filter idiom is the ranked subquery — top-2 orders per customer "
        "here. Catalyst turns the rn <= 2 filter into WindowGroupLimit "
        "BELOW the shuffle (per-partition heaps), so the pattern is not "
        "just equivalent syntax, it gets the optimized top-k-per-group "
        "physical plan."
    ),
)
def sql_qualify_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT custkey, o_orderkey, o_totalprice
        FROM (
            SELECT o_custkey AS custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 2
        """
    )


@query(
    "sql_lateral_column_alias",
    oracle="""
    SELECT o_orderkey,
           CAST(floor(o_totalprice) * 2 AS BIGINT) AS doubled_cents,
           CAST(CAST(floor(o_totalprice) * 2 AS BIGINT) // 10 AS BIGINT) AS tithe,
           CAST(CAST(floor(o_totalprice) * 2 AS BIGINT)
                + CAST(floor(o_totalprice) * 2 AS BIGINT) // 10 AS BIGINT) AS total_due
    FROM orders WHERE o_orderkey < 1000
    """,
    doc=(
        "Lateral column aliases: later SELECT items reference earlier "
        "aliases in the same list (doubled_cents -> tithe -> total_due) "
        "— Spark resolves the chain in one projection, no subquery "
        "nesting; the oracle spells out the expansion DuckDB-side. "
        "Integer-exact arithmetic so the parity check is bit-for-bit."
    ),
)
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(floor(o_totalprice) * 2 AS BIGINT) AS doubled_cents,
               doubled_cents div 10 AS tithe,
               doubled_cents + tithe AS total_due
        FROM orders WHERE o_orderkey < 1000
        """
    )


@query(
    "sql_lateral_view_explode",
    oracle="""
    SELECT doc_id, u.term, CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')
                   AS terms
        FROM documents WHERE doc_id < 50
    ), LATERAL (SELECT unnest(terms) AS term) u
    GROUP BY 1, 2
    """,
    doc=(
        "LATERAL VIEW explode: the Hive-inherited SQL spelling of "
        "generator expansion (the DataFrame twin is fn_explode_wordcount) "
        "— one generate node feeding a partial-agg count, filter pushed "
        "beneath the generator."
    ),
)
def sql_lateral_view_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT doc_id, term, count(*) AS n
        FROM (
            SELECT doc_id,
                   filter(split(lower(text), '[^a-z0-9]+'), x -> x != '') AS terms
            FROM documents WHERE doc_id < 50
        )
        LATERAL VIEW explode(terms) t AS term
        GROUP BY doc_id, term
        """
    ).select("doc_id", "term", F.col("n").cast("long").alias("n"))


@query(
    "sql_transpose_summary",
    oracle="""
    WITH agg AS (
        SELECT l_returnflag AS rf,
               round(sum(l_quantity), 2) AS sum_qty,
               round(avg(l_extendedprice), 2) AS avg_price,
               CAST(count(*) AS DOUBLE) AS n_items
        FROM lineitem GROUP BY 1
    ),
    u AS (
        SELECT rf, 'sum_qty' AS key, sum_qty AS v FROM agg
        UNION ALL SELECT rf, 'avg_price', avg_price FROM agg
        UNION ALL SELECT rf, 'n_items', n_items FROM agg
    )
    SELECT key,
           max(CASE WHEN rf = 'A' THEN v END) AS A,
           max(CASE WHEN rf = 'N' THEN v END) AS N,
           max(CASE WHEN rf = 'R' THEN v END) AS R
    FROM u GROUP BY key
    """,
    doc=(
        "Spark 4's DataFrame.transpose(): metrics-as-rows presentation of "
        "a bounded aggregate (the reporting flip BI tools do client-side, "
        "now a catalyst-planned operator). Index values become columns "
        "('A'/'N'/'R' return flags), metric columns become rows, values "
        "unify to DOUBLE. The transpose necessarily gathers — it is only "
        "legal AFTER aggregation to a bounded table (here 3 rows x 3 "
        "metrics); the oracle reproduces it as unpivot + conditional "
        "pivot, which is exactly how Catalyst lowers it."
    ),
)
def sql_transpose_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.count(F.lit(1)).cast("double").alias("n_items"),
    )
    return agg.transpose()


SNM_WINDOW = 5       # sorted-neighborhood window (positions apart)
SNM_MAX_DIST = 3     # verify threshold on name edit distance


@query(
    "linkage_sorted_neighborhood",
    oracle=f"""
    WITH pos AS (
        SELECT c_custkey, c_name,
               row_number() OVER (ORDER BY c_name, c_custkey) AS p
        FROM customer
    )
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
           CAST(b.p - a.p AS BIGINT) AS pos_gap,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM pos a JOIN pos b
      ON b.p - a.p BETWEEN 1 AND {SNM_WINDOW}
    WHERE levenshtein(a.c_name, b.c_name) <= {SNM_MAX_DIST}
    """,
    doc=(
        "Sorted-neighborhood record linkage (Hernandez & Stolfo 1995), "
        "the complement of hash blocking: sort the table on the linkage "
        "key, then compare only rows within a fixed WINDOW of positions — "
        "near-misses that land in different hash blocks (typo in the "
        "block field) still sort adjacently. Positions come from the "
        "global contiguous row-id operator (operators/ids.py — range "
        "shuffle + per-partition offsets, NO single-partition sort), and "
        "the position-window self-join is a lossless banded equi-join "
        "(band = pos div W; a pair within W positions shares a band or "
        "sits in adjacent bands), so the candidate stage is linear in "
        "table size with W-bounded fan-out. Survivors verify with exact "
        "edit distance."
    ),
)
def linkage_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_exporter_spark.operators.ids import global_row_number

    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    pos = global_row_number(c, ["c_name", "c_custkey"], id_col="p")
    band = F.floor((F.col("p") - 1) / SNM_WINDOW)
    a = pos.select(
        F.col("c_custkey").alias("cust_a"),
        F.col("c_name").alias("name_a"),
        F.col("p").alias("p_a"),
        band.alias("band_a"),
    )
    b = pos.select(
        F.col("c_custkey").alias("cust_b"),
        F.col("c_name").alias("name_b"),
        F.col("p").alias("p_b"),
        band.alias("band_b"),
    )
    # lossless banding: 1 <= p_b - p_a <= W implies band_b in {band_a, band_a+1}
    expanded = a.select(
        "cust_a", "name_a", "p_a",
        F.explode(F.array(F.col("band_a"), F.col("band_a") + 1)).alias("band_b"),
    )
    return (
        expanded.join(b, "band_b")
        .filter(
            (F.col("p_b") - F.col("p_a") >= 1)
            & (F.col("p_b") - F.col("p_a") <= SNM_WINDOW)
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= SNM_MAX_DIST)
        .select(
            "cust_a",
            "cust_b",
            (F.col("p_b") - F.col("p_a")).cast("long").alias("pos_gap"),
            F.col("dist").cast("long").alias("dist"),
        )
    )


@query(
    "sql_range_tvf_spine",
    oracle="""
    WITH spine AS (
        SELECT CAST(DATE '2024-01-01' + INTERVAL (d) DAY AS DATE) AS day
        FROM (SELECT CAST(unnest(range(0, 45)) AS INTEGER) AS d)
    ),
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS total_value
        FROM events GROUP BY 1
    )
    SELECT s.day,
           COALESCE(d.n, 0) AS n,
           COALESCE(d.total_value, 0.0) AS total_value,
           d.n IS NULL AS gap_filled
    FROM spine s LEFT JOIN daily d USING (day)
    """,
    doc=(
        "Table-valued-function SQL surface + the zero-filled calendar "
        "spine every dashboard needs: range() generates the 45-day spine "
        "(a TVF producing rows from nothing — no table scan, no driver "
        "createDataFrame), daily aggregates LEFT JOIN onto it, and days "
        "with no events surface as explicit zero rows flagged gap_filled "
        "instead of silently missing. At 100 TB the spine stays "
        "|days| rows (broadcast side) regardless of event volume; the "
        "events side is one partial-agg shuffle on day."
    ),
)
def sql_range_tvf_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("events",))
    return spark.sql(
        """
        WITH spine AS (
            SELECT CAST(date_add(DATE '2024-01-01', CAST(id AS INT)) AS DATE) AS day
            FROM range(0, 45)
        ),
        daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   count(*) AS n,
                   round(sum(value), 2) AS total_value
            FROM events GROUP BY 1
        )
        SELECT s.day,
               COALESCE(d.n, 0) AS n,
               COALESCE(d.total_value, 0.0) AS total_value,
               d.n IS NULL AS gap_filled
        FROM spine s LEFT JOIN daily d USING (day)
        """
    )
