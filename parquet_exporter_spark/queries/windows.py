"""Window functions: ranking, analytic, and frame-based running aggregates.

Determinism rule (SURVEY.md section 5): every window ORDER BY ends in a
unique key so rank/ntile/lag results are stable across engines and runs.

Scale notes: a window = one shuffle on partitionBy + per-partition sort.
Partition keys here (mktsegment, custkey, suppkey) distribute well; a
window WITHOUT partitionBy would serialize the world through one task and
is banned on fact tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table


@query(
    "window_ranking",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           round(percent_rank() OVER w, 6) AS prank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="Ranking window functions: row_number/rank/dense_rank/ntile/percent_rank.",
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
    )


@query(
    "window_analytic",
    oracle="""
    SELECT o_orderkey, o_custkey,
           lag(o_totalprice, 1) OVER w AS prev_price,
           lead(o_totalprice, 1) OVER w AS next_price,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           round(cume_dist() OVER w, 6) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Analytic window functions: lag/lead/first/last/nth_value/cume_dist.",
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@query(
    "window_frames",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_suppkey,
           round(sum(l_quantity) OVER (
               PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty,
           round(avg(l_extendedprice) OVER (
               PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg_price,
           CAST(count(*) OVER (
               PARTITION BY l_suppkey ORDER BY epoch(l_shipdate)
               RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_last_day
    FROM lineitem
    """,
    doc=(
        "Window frames: running sum (rows unbounded), moving average (rows "
        "N preceding), and a range frame over event-time seconds (1-day "
        "trailing count)."
    ),
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    w_range = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.col("l_shipdate").cast("timestamp").cast("long"))
        .rangeBetween(-86400, 0)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.round(
            F.sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            2,
        ).alias("running_qty"),
        F.round(F.avg("l_extendedprice").over(w.rowsBetween(-3, 0)), 4).alias("moving_avg_price"),
        F.count(F.lit(1)).over(w_range).alias("n_last_day"),
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT n_name, c_custkey, c_name, c_acctbal,
               CAST(row_number() OVER (PARTITION BY n_name
                    ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) WHERE rn <= 3
    """,
    doc=(
        "Top-K per group: the canonical window + filter composition. At "
        "scale this is one shuffle on the group key; no global sort."
    ),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "c_custkey",
            "c_name",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           round(median(value) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
               AS rolling_median
    FROM events
    """,
    doc=(
        "Rolling median of the last 5 events per user (ts order, event_id "
        "tiebreak). Spark rejects median() with a window frame, so the "
        "frame is materialized with collect_list (bounded: <=5 doubles), "
        "sorted, and interpolated exactly like DuckDB's median (mean of "
        "the middle pair for even counts) — identical doubles in, "
        "bit-identical interpolation out."
    ),
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    odd = F.element_at(arr, ((n + 1) / 2).cast("int"))
    even = (
        F.element_at(arr, (n / 2).cast("int"))
        + F.element_at(arr, (n / 2 + 1).cast("int"))
    ) / 2
    med = F.when(n % 2 == 1, odd).otherwise(even)
    return ev.select(
        "event_id",
        "user_id",
        F.round(med, 6).alias("rolling_median"),
    )


@query(
    "outlier_zscore",
    # mu/sd are rounded to 6 BEFORE the z computation on both sides: the
    # two engines sum partitions in different orders, so the raw moments
    # differ in the last bits; after rounding, z is computed from
    # identical doubles and the |z| >= 2.5 cut is deterministic.
    oracle="""
    WITH stats AS (
        SELECT event_type,
               round(avg(value), 6) AS mu,
               round(stddev_samp(value), 6) AS sd
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / s.sd, 4) AS z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs(round((e.value - s.mu) / s.sd, 4)) >= 2.5
    """,
    doc=(
        "Per-group z-score outlier flagging: broadcast the per-type "
        "moments (one tiny aggregate) back onto the stream and keep "
        "|z| >= 2.5. At 100 TB the stats side is a handful of rows, so "
        "the enrich join is a broadcast — the fact table never shuffles."
    ),
)
def outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_samp("value"), 6).alias("sd"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", z.alias("z"))
        .filter(F.abs(F.col("z")) >= 2.5)
    )


@query(
    "window_count_distinct",
    oracle="""
    SELECT event_id, event_type,
           CAST(count(DISTINCT user_id) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS running_distinct_users
    FROM events
    """,
    doc=(
        "Running COUNT(DISTINCT) over a window — Spark forbids DISTINCT "
        "aggregates in window frames, so the engine rewrites it as the "
        "first-occurrence trick: row_number()=1 per (type, user) flags "
        "each user's first event, and a running sum of flags over the "
        "same total order IS the running distinct count. Two window "
        "passes, two exchanges: one keyed (type, user) for the flags, "
        "one keyed type for the running sum — versus the naive "
        "distinct-set-per-frame approach which is quadratic. Oracle "
        "uses DuckDB's native DISTINCT window aggregate."
    ),
)
def window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first_seen = (F.row_number().over(w_first) == 1).cast("long")
    return ev.select(
        "event_id",
        "event_type",
        F.col("ts"),
        first_seen.alias("__first"),
    ).select(
        "event_id",
        "event_type",
        F.sum("__first").over(w_run).cast("long").alias("running_distinct_users"),
    )


@query(
    "window_rolling_corr",
    oracle="""
    WITH t AS (
        SELECT event_id, event_type, value,
               epoch_us(ts) / 86400000000.0 AS days,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT event_id, event_type,
           round(corr(value, days) OVER (
               PARTITION BY event_type ORDER BY rn
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 6) AS rolling_corr
    FROM t QUALIFY rn >= 20
    """,
    doc=(
        "Rolling correlation: per event type, the Pearson correlation of "
        "value against event time over a trailing 20-row frame — the "
        "moving trend-strength signal monitoring dashboards window over "
        "metric streams. Only complete frames are emitted (rows 20+ per "
        "partition), so the statistic is always over exactly 20 points "
        "and never hits the degenerate n<2 NULL/NaN divergence between "
        "engines. Time enters as days-since-epoch (integer microsecond "
        "arithmetic divided on both engines) to keep the co-moment "
        "magnitudes small and the round-6 cross-engine compare stable. "
        "One shuffle on event_type; the frame is a bounded ROWS frame, "
        "so state per partition is O(frame), not O(partition)."
    ),
)
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "event_type",
        "value",
        (F.unix_micros("ts") / F.lit(86400000000.0)).alias("days"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    frame = (
        Window.partitionBy("event_type").orderBy("rn").rowsBetween(-19, Window.currentRow)
    )
    return (
        base.withColumn("rolling_corr", F.round(F.corr("value", "days").over(frame), 6))
        .filter(F.col("rn") >= 20)
        .select("event_id", "event_type", "rolling_corr")
    )


@query(
    "window_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           round(sum(value) OVER w, 2) AS v_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    doc=(
        "Time-based RANGE frame: per-user rolling 1-hour count and sum — "
        "the value-based frame (RANGE over microseconds) rather than a "
        "row-count frame, so ties and gaps behave like the SQL standard "
        "RANGE INTERVAL window. Spark's rangeBetween needs a numeric "
        "order key: unix_micros(ts) with a -3.6e9 lower bound is exactly "
        "INTERVAL 1 HOUR in integer microseconds. One user-keyed "
        "exchange serves both frames."
    ),
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1000000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_last_hour"),
        F.round(F.sum("value").over(w), 2).alias("v_last_hour"),
    )


@query(
    "window_ignore_nulls",
    oracle="""
    WITH v AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
        FROM events
    )
    SELECT event_id, user_id,
           last_value(purchase_value IGNORE NULLS) OVER w AS last_purchase_value,
           first_value(purchase_value IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_purchase_value
    FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc=(
        "IGNORE NULLS window semantics: carry the last seen purchase "
        "value forward over non-purchase events (the LOCF idiom) and "
        "pin each user's first purchase — last/first with "
        "ignorenulls=True over a running frame. One user-keyed exchange "
        "serves both; this is the general forward-fill primitive "
        "(timeseries_gapfill_locf applies it to gap-filled spines)."
    ),
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    v = ev.withColumn(
        "purchase_value",
        F.when(F.col("event_type") == "purchase", F.col("value")),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return v.select(
        "event_id",
        "user_id",
        F.last("purchase_value", ignorenulls=True).over(w).alias("last_purchase_value"),
        F.first("purchase_value", ignorenulls=True).over(wf).alias("first_purchase_value"),
    )


@query(
    "window_index_to_first",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id, value,
               first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS first_value_
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, event_id,
           round(100.0 * value / first_value_, 6) AS indexed_value
    FROM p WHERE first_value_ <> 0
    """,
    doc=(
        "Index-to-first normalization: every purchase value rebased to "
        "100 x value / the user's first purchase — the 'indexed to "
        "baseline' transformation behind cohort comparison charts. One "
        "first_value window per user; the purchase filter is pushed to "
        "the scan."
    ),
)
def window_index_to_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        "user_id", "event_id", "value", F.first("value").over(w).alias("first_value_")
    )
    return p.filter(F.col("first_value_") != 0).select(
        "user_id",
        "event_id",
        F.round(100.0 * F.col("value") / F.col("first_value_"), 6).alias("indexed_value"),
    )


@query(
    "window_lag_defaults",
    oracle="""
    SELECT event_id, user_id,
           round(lag(value, 1, 0.0) OVER w, 2) AS prev_value_or_zero,
           round(lead(value, 1, -1.0) OVER w, 2) AS next_value_or_neg1,
           round(lag(value, 3, 0.0) OVER w, 2) AS value_3_back_or_zero
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc=(
        "lag/lead with explicit defaults (3-arg form): partition "
        "boundaries yield the supplied default instead of NULL — the "
        "form that lets downstream arithmetic skip null guards. All "
        "three offsets share one user-keyed window sort."
    ),
)
def window_lag_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.lag("value", 1, 0.0).over(w), 2).alias("prev_value_or_zero"),
        F.round(F.lead("value", 1, -1.0).over(w), 2).alias("next_value_or_neg1"),
        F.round(F.lag("value", 3, 0.0).over(w), 2).alias("value_3_back_or_zero"),
    )


@query(
    "window_rolling_regression",
    oracle="""
    WITH t AS (
        SELECT event_id, event_type, value,
               CAST(row_number() OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS DOUBLE) AS x
        FROM events
    ),
    w AS (
        SELECT event_id, event_type, x,
               avg(x) OVER f AS mx,
               avg(value) OVER f AS my,
               avg(x * value) OVER f AS mxy
        FROM t
        WINDOW f AS (PARTITION BY event_type ORDER BY x
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, event_type,
           round((mxy - mx * my) / 33.25, 6) AS rolling_slope
    FROM w WHERE x >= 20
    """,
    doc=(
        "Rolling OLS slope: per event type, the least-squares slope of "
        "value against event time over a trailing 20-row frame — the "
        "moving trend-RATE companion to window_rolling_corr's trend "
        "strength (corr tells you whether the trend is real, the slope "
        "tells you how fast it moves; units = value per observation "
        "step). x is the per-series OBSERVATION INDEX, not wall time: "
        "over any complete 20-row frame the x-moments are then exact "
        "small integers and the denominator is the CONSTANT "
        "Var(1..20) = 33.25 — both a time-x denominator (E[x^2]-E[x]^2 "
        "over closely spaced timestamps, measured diverging in the 4th "
        "decimal) and even a rebased one (knife-edge frames remained) "
        "are catastrophic cancellations that amplify engine "
        "summation-order noise; the index form leaves only the bounded "
        "numerator noise, ~1e-10 of the 6dp round. Complete frames "
        "only. One "
        "shuffle on event_type, bounded ROWS frame — O(frame) state."
    ),
)
def window_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "event_type",
        "value",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("ts", "event_id"))
        .cast("double")
        .alias("x"),
    )
    f = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(-19, Window.currentRow)
    )
    w = base.select(
        "event_id",
        "event_type",
        "x",
        F.avg("x").over(f).alias("mx"),
        F.avg("value").over(f).alias("my"),
        F.avg(F.col("x") * F.col("value")).over(f).alias("mxy"),
    )
    return w.filter(F.col("x") >= 20).select(
        "event_id",
        "event_type",
        F.round(
            (F.col("mxy") - F.col("mx") * F.col("my")) / F.lit(33.25), 6
        ).alias("rolling_slope"),
    )
