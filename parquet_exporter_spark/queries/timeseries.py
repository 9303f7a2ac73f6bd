"""Time-series operators: recursive date spines, gap filling with LOCF,
and value-range histogram bucketing.

The reference has no time-series surface (its operator list ends at R24,
`/root/reference/export.py:244-262`); these extend the engine per
SURVEY.md section 2.2 for event/feed data. Everything here is a pure
Catalyst expression composition, oracle-checked against DuckDB.

Scale notes:
- the month spine is O(months) rows — trivially small at any data scale;
  the recursion happens on the spine, never on the fact table;
- the daily gap-fill partitions BOTH the spine and the LOCF window by
  user_id, so at 100 TB the work shuffles once on the key and every
  partition's window is evaluated independently (no global sort);
- the histogram groups on a derived bucket id (13 distinct values), so
  the aggregation is a map-side partial + a 13-row final reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_exporter_spark.queries._util import rmoney, rratio
from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table, register


@query(
    "sql_recursive_cte_spine",
    oracle="""
    WITH RECURSIVE months(m, mx) AS (
        SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE),
               CAST(date_trunc('month', max(o_orderdate)) AS DATE)
        FROM orders
        UNION ALL
        SELECT CAST(m + INTERVAL 1 MONTH AS DATE), mx FROM months WHERE m < mx
    ),
    monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               count(*) AS n_orders,
               sum(o_totalprice) AS rev
        FROM orders GROUP BY 1
    )
    SELECT strftime(months.m, '%Y-%m') AS month_start,
           CAST(coalesce(monthly.n_orders, 0) AS BIGINT) AS n_orders,
           round(coalesce(monthly.rev, 0), 2) AS revenue
    FROM months LEFT JOIN monthly ON months.m = monthly.m
    """,
    doc=(
        "Recursive CTE (Spark 4 WITH RECURSIVE) generating a complete "
        "month spine from min to max order date, left-joined to monthly "
        "revenue so empty months surface as zero rows. The recursion "
        "carries the max bound as a column, so the recursive step needs "
        "no subquery; spine cardinality is O(months), independent of "
        "fact-table size."
    ),
)
def sql_recursive_cte_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH RECURSIVE months(m, mx) AS (
            SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE),
                   CAST(date_trunc('month', max(o_orderdate)) AS DATE)
            FROM orders
            UNION ALL
            SELECT add_months(m, 1), mx FROM months WHERE m < mx
        ),
        monthly AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                   count(*) AS n_orders,
                   sum(o_totalprice) AS rev
            FROM orders GROUP BY 1
        )
        SELECT date_format(months.m, 'yyyy-MM') AS month_start,
               CAST(coalesce(monthly.n_orders, 0) AS BIGINT) AS n_orders,
               round(coalesce(monthly.rev, 0d), 2) AS revenue
        FROM months LEFT JOIN monthly ON months.m = monthly.m
        """
    )


@query(
    "timeseries_gapfill_locf",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d, round(sum(value), 6) AS daily_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
        FROM events GROUP BY 1
    ),
    spine AS (
        SELECT user_id,
               unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
        FROM bounds
    )
    SELECT s.user_id, s.d,
           last_value(daily.daily_value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
           daily.daily_value IS NOT NULL AS is_observed
    FROM spine s
    LEFT JOIN daily ON s.user_id = daily.user_id AND s.d = daily.d
    """,
    doc=(
        "Per-user daily gap filling: build each user's calendar spine with "
        "sequence()+explode, left-join observed daily sums, then carry the "
        "last observation forward (LOCF) with last(ignorenulls) over a "
        "user-partitioned running window. The spine never has leading "
        "nulls because it starts at the user's first observed day."
    ),
)
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        rratio(F.sum("value")).alias("daily_value")
    )
    bounds = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("d")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "d"], "left")
        .select(
            "user_id",
            "d",
            F.last("daily_value", ignorenulls=True).over(w).alias("value_filled"),
            F.col("daily_value").isNotNull().alias("is_observed"),
        )
    )


_HIST_LO, _HIST_HI, _HIST_N = 0.0, 600000.0, 12


@query(
    "agg_width_bucket_histogram",
    # DuckDB has no width_bucket; the CASE mirrors Spark's WidthBucket
    # expression bit-for-bit: same double division (hi-lo)/n, same floor,
    # v < lo -> 0, v >= hi -> n+1.
    oracle=f"""
    WITH b AS (
        SELECT CASE WHEN o_totalprice < {_HIST_LO} THEN 0
                    WHEN o_totalprice >= {_HIST_HI} THEN {_HIST_N + 1}
                    ELSE CAST(floor((o_totalprice - {_HIST_LO})
                              / (({_HIST_HI} - {_HIST_LO}) / {_HIST_N})) AS BIGINT) + 1
               END AS bucket,
               o_totalprice
        FROM orders
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS bucket_revenue
    FROM b GROUP BY 1 ORDER BY 1
    """,
    doc=(
        "Equi-width histogram of order totals via width_bucket: 12 "
        "buckets over [0, 600k) plus underflow/overflow buckets 0 and 13. "
        "The group-by key has at most 14 values, so the shuffle after the "
        "map-side partial aggregation is 14 rows per task regardless of "
        "input scale."
    ),
)
def agg_width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    bucket = F.width_bucket(
        F.col("o_totalprice"), F.lit(_HIST_LO), F.lit(_HIST_HI), F.lit(_HIST_N)
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            rmoney(F.sum("o_totalprice")).alias("bucket_revenue"),
        )
        .orderBy("bucket")
    )


@query(
    "scd2_history_from_events",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, event_id, ts,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, event_type, event_id, ts AS valid_from
        FROM ordered
        WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type, valid_from,
           coalesce(lead(valid_from) OVER w2,
                    TIMESTAMP '2099-12-31 00:00:00') AS valid_to,
           CAST(lead(valid_from) OVER w2 IS NULL AS BOOLEAN) AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_id)
    """,
    doc=(
        "SCD Type-2 dimension history from a change stream (CDC -> "
        "dimension): collapse each user's event stream to its change "
        "points, then stitch [valid_from, valid_to) intervals with "
        "lead(); the open interval is the current row. ONE hash exchange "
        "on user_id serves both windows (same partitioning), so history "
        "rebuild is a single shuffle at any scale; incremental "
        "maintenance of the same shape runs in streaming/upsert.py."
    ),
)
def scd2_history_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", "event_type", "event_id", F.col("ts").alias("valid_from"))
    )
    # event_id tiebreak keeps lead() deterministic when two change points
    # share a timestamp (cross-engine ordering parity)
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    # Open intervals end at a far-future sentinel, not NULL — the standard
    # SCD2 convention; range predicates stay sargable (valid_from <= t AND
    # t < valid_to needs no NULL branch). 2099 (not 9999) keeps the value
    # inside pandas datetime64[ns] bounds for Arrow interchange.
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.coalesce(
            F.lead("valid_from").over(w2),
            F.lit("2099-12-31 00:00:00").cast("timestamp"),
        ).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


@query(
    "timeseries_interpolate_linear",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d, round(sum(value), 6) AS dv
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
        FROM events GROUP BY 1
    ),
    spine AS (
        SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
        FROM bounds
    ),
    joined AS (
        SELECT s.user_id, s.d, daily.dv
        FROM spine s LEFT JOIN daily USING (user_id, d)
    ),
    ctx AS (
        SELECT user_id, d, dv,
               last_value(dv IGNORE NULLS) OVER w_prev AS prev_v,
               last_value(CASE WHEN dv IS NOT NULL THEN d END IGNORE NULLS)
                   OVER w_prev AS prev_d,
               first_value(dv IGNORE NULLS) OVER w_next AS next_v,
               first_value(CASE WHEN dv IS NOT NULL THEN d END IGNORE NULLS)
                   OVER w_next AS next_d
        FROM joined
        WINDOW w_prev AS (PARTITION BY user_id ORDER BY d
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_next AS (PARTITION BY user_id ORDER BY d
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, d,
           round(CASE
               WHEN dv IS NOT NULL THEN dv
               WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                   prev_v + (next_v - prev_v)
                   * CAST(date_diff('day', prev_d, d) AS DOUBLE)
                   / CAST(date_diff('day', prev_d, next_d) AS DOUBLE)
               ELSE coalesce(prev_v, next_v)
           END, 6) AS value_interp,
           dv IS NOT NULL AS is_observed
    FROM ctx
    """,
    doc=(
        "Daily spine with LINEAR interpolation between observed points "
        "(edges fall back to nearest-observed), complementing the LOCF "
        "variant. Same scale shape as the LOCF query: the spine and both "
        "context windows partition on user_id, so history rebuild is one "
        "shuffle and each user's window evaluates independently — no "
        "global sort at any scale. Interpolation arithmetic runs on "
        "both-side-rounded daily values, so the IEEE ops are bit-equal "
        "across engines before the final rounding."
    ),
)
def timeseries_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        rratio(F.sum("value")).alias("dv")
    )
    spine = (
        ev.groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi"))
        .select("user_id", F.explode(F.sequence("lo", "hi")).alias("d"))
    )
    joined = spine.join(daily, ["user_id", "d"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("dv").isNotNull(), F.col("d"))
    ctx = joined.select(
        "user_id",
        "d",
        "dv",
        F.last("dv", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(obs_d, ignorenulls=True).over(w_prev).alias("prev_d"),
        F.first("dv", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(obs_d, ignorenulls=True).over(w_next).alias("next_d"),
    )
    interp = (
        F.when(F.col("dv").isNotNull(), F.col("dv"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * F.datediff("d", "prev_d").cast("double")
            / F.datediff("next_d", "prev_d").cast("double"),
        )
        .otherwise(F.coalesce("prev_v", "next_v"))
    )
    return ctx.select(
        "user_id",
        "d",
        F.round(interp, 6).alias("value_interp"),
        F.col("dv").isNotNull().alias("is_observed"),
    )


@query(
    "timeseries_downsample_ohlc",
    oracle="""
    SELECT user_id,
           make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 * 1000000 AS BIGINT))
               AS bucket_start,
           round(arg_min(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                                || '-' || lpad(CAST(event_id AS VARCHAR), 10, '0')), 6)
               AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                                || '-' || lpad(CAST(event_id AS VARCHAR), 10, '0')), 6)
               AS close,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
    doc=(
        "OHLC downsampling: per (user, 6-hour bucket) open/high/low/close "
        "over the event stream — the standard time-series resample. "
        "Open/close use min_by/max_by on a zero-padded (epoch_us, "
        "event_id) string key, giving a deterministic engine-portable "
        "tiebreak for same-timestamp events. One hash aggregate with "
        "map-side partials; min_by/max_by carry one candidate row per "
        "partition, same cost class as min/max."
    ),
)
def timeseries_downsample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lit("-"),
        F.lpad(F.col("event_id").cast("string"), 10, "0"),
    )
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp("ts") / 21600).cast("bigint") * 21600
    )
    return (
        ev.groupBy("user_id", bucket.alias("bucket_start"))
        .agg(
            rratio(F.min_by("value", key)).alias("open"),
            rratio(F.max("value")).alias("high"),
            rratio(F.min("value")).alias("low"),
            rratio(F.max_by("value", key)).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "timeseries_ewma",
    oracle="""
    SELECT user_id,
           round(list_reduce(
               CAST(list(value ORDER BY ts, event_id) AS DOUBLE[]),
               (acc, x) -> 0.3 * x + 0.7 * acc
           ), 6) AS ewma
    FROM events
    GROUP BY user_id
    """,
    doc=(
        "Exponentially weighted moving average per key (alpha=0.3, "
        "s_0 = x_0): an ORDER-DEPENDENT fold no commutative aggregate can "
        "express. One shuffle on the key, then a per-group sorted fold via "
        "higher-order F.aggregate over the collected series — state is "
        "O(series length per key), the same bound as any sessionization; "
        "unbounded streams use streaming/stateful.py instead. Oracle is "
        "DuckDB list_reduce over the identically-ordered list."
    ),
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    series = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    ewma = F.aggregate(
        series,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            F.lit(0.3) * x + F.lit(0.7) * acc
        ),
    )
    return ev.groupBy("user_id").agg(F.round(ewma, 6).alias("ewma"))


@query(
    "timeseries_latency_percentiles",
    oracle="""
    SELECT event_type,
           time_bucket(INTERVAL 10 MINUTE, ts) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type, bucket
    """,
    doc=(
        "The operations-dashboard shape: P50/P95/P99 of a metric per "
        "(series, time bucket) — exact interpolated percentiles here "
        "(one shuffle keyed on type+bucket; DuckDB twin quantile_cont), "
        "with approx_percentile as the stated drop-in at 100 TB where "
        "per-group sorting of raw values stops being free. Bucketing "
        "uses date_trunc-aligned 10-minute windows so both engines "
        "agree on boundaries."
    ),
)
def timeseries_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        (F.unix_timestamp("ts") / 600).cast("long") * 600
    )
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.percentile("value", F.lit(0.50)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
            F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        )
    )


@query(
    "timeseries_hierarchical_rollup",
    oracle="""
    SELECT 'minute' AS level, date_trunc('minute', ts) AS bucket,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'hour', date_trunc('hour', ts),
           CAST(count(*) AS BIGINT), round(sum(value), 2)
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'day', date_trunc('day', ts),
           CAST(count(*) AS BIGINT), round(sum(value), 2)
    FROM events GROUP BY 2
    """,
    doc=(
        "Hypertable-style hierarchical rollup (the continuous-aggregate "
        "pattern): minute-level partial aggregates are computed from raw "
        "events ONCE, then the hour level is derived by merging minute "
        "partials and the day level by merging hour partials — raw data "
        "is never rescanned per resolution. The oracle recomputes every "
        "level from raw; equality is the losslessness proof for "
        "mergeable (count, sum) state, same contract as "
        "cdc_incremental_agg. The minute level is checkpointed once "
        "(AQE does not unify the three identical union-branch "
        "exchanges), so raw events is scanned and shuffled once; at "
        "100 TB each level materializes as its own table and refreshes "
        "incrementally from the level below."
    ),
)
def timeseries_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    minute = events.groupBy(
        F.date_trunc("minute", "ts").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    # The minute level feeds its own output branch AND the hour/day
    # derivations; materialize it once so raw events is scanned and
    # shuffled once (AQE does not unify the three identical union-branch
    # exchanges). localCheckpoint instead of persist: same
    # compute-once guarantee, but the blocks are released when the
    # DataFrame is garbage-collected rather than pinned in the
    # CacheManager for the session lifetime. This is the
    # materialized-continuous-aggregate shape: at 100 TB the checkpoint
    # becomes a stored minute-level table.
    minute = minute.localCheckpoint(eager=True)
    hour = minute.groupBy(
        F.date_trunc("hour", "bucket").alias("bucket")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("total_value").alias("total_value"),
    )
    day = hour.groupBy(
        F.date_trunc("day", "bucket").alias("bucket")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("total_value").alias("total_value"),
    )

    def leveled(df, name):
        return df.select(
            F.lit(name).alias("level"),
            "bucket",
            F.col("n_events").cast("long").alias("n_events"),
            F.round("total_value", 2).alias("total_value"),
        )

    return (
        leveled(minute, "minute")
        .unionByName(leveled(hour, "hour"))
        .unionByName(leveled(day, "day"))
    )


@query(
    "scd2_temporal_lookup",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, event_id, ts,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, event_type, event_id, ts AS valid_from
        FROM ordered
        WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    dim AS (
        SELECT user_id, event_type AS state, valid_from,
               coalesce(lead(valid_from) OVER w2,
                        TIMESTAMP '2099-12-31 00:00:00') AS valid_to
        FROM changes
        WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_id)
    )
    SELECT f.event_id, f.user_id, f.ts, d.state AS state_at_purchase
    FROM events f JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.valid_from AND f.ts < d.valid_to
    WHERE f.event_type = 'purchase'
    """,
    doc=(
        "Temporal dimension lookup: every purchase fact joins the SCD2 "
        "history (scd2_history_from_events) on its OWN point in time — "
        "equi key user_id, interval residual valid_from <= ts < "
        "valid_to — answering 'what state was the user in when they "
        "purchased'. Exactly one interval matches per fact (the "
        "intervals partition each user's timeline), which the row count "
        "pins. Plan: the dim build and the fact side share the user_id "
        "hash partitioning, so the lookup is one co-shuffled equi join "
        "with the range condition evaluated as a join residual — never "
        "an interval explosion; at 100 TB the dim is a stored table "
        "bucketed on the same key and the fact shuffle is the only "
        "data-sized movement."
    ),
)
def scd2_temporal_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", F.col("event_type").alias("state"), "event_id",
                F.col("ts").alias("valid_from"))
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    dim = changes.select(
        F.col("user_id").alias("d_user"),
        "state",
        "valid_from",
        F.coalesce(
            F.lead("valid_from").over(w2),
            F.lit("2099-12-31 00:00:00").cast("timestamp"),
        ).alias("valid_to"),
    )
    facts = events.filter(F.col("event_type") == "purchase")
    return (
        facts.join(
            dim,
            (facts.user_id == dim.d_user)
            & (facts.ts >= dim.valid_from)
            & (facts.ts < dim.valid_to),
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("state").alias("state_at_purchase"),
        )
    )


@query(
    "timeseries_cusum_shift",
    oracle="""
    WITH stats AS (
        SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
        FROM events GROUP BY event_type
    ),
    cums AS (
        SELECT e.event_type, e.ts, e.event_id, s.sigma,
               sum(e.value - s.mu - 0.5 * s.sigma) OVER (
                   PARTITION BY e.event_type
                   ORDER BY e.ts, e.event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM events e JOIN stats s USING (event_type)
    ),
    c AS (
        SELECT event_type, sigma, cum,
               min(cum) OVER (
                   PARTITION BY event_type
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin
        FROM cums
    )
    SELECT event_type,
           round(max(cum - least(0, runmin)), 6) AS cusum_max,
           (max(cum - least(0, runmin)) > 4 * any_value(sigma)) AS shift_detected
    FROM c GROUP BY event_type
    """,
    doc=(
        "One-sided CUSUM mean-shift detection per series (slack k = "
        "sigma/2, threshold h = 4*sigma — the standard control-chart "
        "parameterization): completes the monitoring family's time "
        "dimension (dq_drift_psi = distribution shift between halves, "
        "streaming/drift.py = per-batch shift, this = WHEN the mean "
        "moved). The recurrence S_t = max(0, S_{t-1} + y_t) is rewritten "
        "with the prefix identity S_t = C_t - min(0, running_min(C)) — "
        "pure cumulative windows instead of an order-dependent fold, so "
        "the plan is one keyed exchange serving three same-ordered "
        "window passes and a final aggregate, with none of the "
        "collected-array state the EWMA fold needs."
    ),
)
def timeseries_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    joined = ev.join(F.broadcast(stats), "event_type")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(
        F.col("value") - F.col("mu") - 0.5 * F.col("sigma")
    ).over(w)
    c = joined.select(
        "event_type",
        "sigma",
        cum.alias("cum"),
        F.min(cum).over(w).alias("runmin"),
    )
    s_t = F.col("cum") - F.least(F.lit(0.0), F.col("runmin"))
    return c.groupBy("event_type").agg(
        F.round(F.max(s_t), 6).alias("cusum_max"),
        (F.max(s_t) > 4 * F.first("sigma")).alias("shift_detected"),
    )


@query(
    "timeseries_autocorr",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS cnt
        FROM events GROUP BY 1, 2
    ), lagged AS (
        SELECT event_type, cnt,
               lag(cnt) OVER (PARTITION BY event_type ORDER BY day) AS prev_cnt
        FROM daily
    )
    SELECT event_type, round(corr(cnt, prev_cnt), 6) AS lag1_autocorr,
           CAST(count(prev_cnt) AS BIGINT) AS n_pairs
    FROM lagged GROUP BY 1
    """,
    doc=(
        "Lag-1 autocorrelation of the daily event-count series per type: "
        "daily rollup (one keyed partial-agg shuffle), lag() over the "
        "per-type day order, then corr(cnt, prev_cnt) — the standard "
        "seasonality/trend screen before forecasting. The window and the "
        "final aggregate share the event_type partitioning, and the "
        "series length (days) is bounded, so the windowed stage is tiny "
        "regardless of raw event volume."
    ),
)
def timeseries_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.withColumn("prev_cnt", F.lag("cnt").over(w))
    return lagged.groupBy("event_type").agg(
        F.round(F.corr("cnt", "prev_cnt"), 6).alias("lag1_autocorr"),
        F.count("prev_cnt").cast("long").alias("n_pairs"),
    )


@query(
    "timeseries_seasonal_baseline",
    oracle="""
    WITH stats AS (
        SELECT event_type, CAST(hour(ts) AS INTEGER) AS hr,
               avg(value) AS mu, stddev_samp(value) AS sigma,
               count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT s.event_type, s.hr, round(s.mu, 6) AS baseline_mean,
           CAST(s.n AS BIGINT) AS n,
           CAST(count(*) FILTER (WHERE abs(e.value - s.mu) > 2 * s.sigma) AS BIGINT)
               AS n_anomalies
    FROM events e
    JOIN stats s ON s.event_type = e.event_type AND s.hr = hour(e.ts)
    GROUP BY s.event_type, s.hr, s.mu, s.n
    """,
    doc=(
        "Hour-of-day seasonal baseline + anomaly count: per (type, hour) "
        "mean/stddev profile, then a second pass flags events more than "
        "2 sigma from their slot's baseline. The profile is bounded "
        "(|types| x 24 rows) and broadcast back onto the fact scan, so "
        "the raw events shuffle once for the profile and never for the "
        "flagging join — the two-pass shape that survives 100 TB (the "
        "profile stays dimension-sized however large the stream)."
    ),
)
def timeseries_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type", F.hour("ts").alias("hr")).agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = ev.withColumn("hr", F.hour("ts")).join(F.broadcast(stats), ["event_type", "hr"])
    return (
        joined.groupBy("event_type", "hr", "mu", "n")
        .agg(
            F.count(
                F.when(F.abs(F.col("value") - F.col("mu")) > 2 * F.col("sigma"), 1)
            ).alias("n_anomalies")
        )
        .select(
            "event_type",
            "hr",
            F.round("mu", 6).alias("baseline_mean"),
            F.col("n").cast("long").alias("n"),
            F.col("n_anomalies").cast("long").alias("n_anomalies"),
        )
    )


@query(
    "timeseries_rate_of_change",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(value), 2) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, v,
           round(v - lag(v) OVER w, 2) AS delta,
           round((v - lag(v) OVER w) / nullif(lag(v) OVER w, 0), 6) AS pct_change
    FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
    doc=(
        "Day-over-day rate of change per series: absolute delta and "
        "percent change (nullif-guarded against zero baselines) off one "
        "lag window — the first derivative every metrics dashboard "
        "plots. Daily rollup first, so the window runs over bounded "
        "series lengths; rollup, window, and output share the "
        "event_type key."
    ),
)
def timeseries_rate_of_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("v").over(w)
    return daily.select(
        "event_type",
        "day",
        "v",
        F.round(F.col("v") - prev, 2).alias("delta"),
        F.round((F.col("v") - prev) / F.nullif(prev, F.lit(0)), 6).alias("pct_change"),
    )


@query(
    "timeseries_weekday_weekend_lift",
    oracle="""
    WITH base AS (
        SELECT event_type,
               CASE WHEN dayofweek(ts) IN (0, 6) THEN 'weekend' ELSE 'weekday' END AS day_kind,
               value
        FROM events
    ), agg AS (
        SELECT event_type,
               avg(CASE WHEN day_kind = 'weekday' THEN value END) AS wd,
               avg(CASE WHEN day_kind = 'weekend' THEN value END) AS we,
               count(CASE WHEN day_kind = 'weekday' THEN 1 END) AS n_weekday,
               count(CASE WHEN day_kind = 'weekend' THEN 1 END) AS n_weekend
        FROM base GROUP BY 1
    )
    SELECT event_type, round(wd, 6) AS weekday_avg, round(we, 6) AS weekend_avg,
           round(we / wd, 6) AS weekend_lift,
           CAST(n_weekday AS BIGINT) AS n_weekday, CAST(n_weekend AS BIGINT) AS n_weekend
    FROM agg
    """,
    doc=(
        "Weekday/weekend lift per series: conditional averages split by "
        "calendar day class and their ratio — the day-mix control every "
        "weekly metric needs. Day-of-week numbering is pinned cross-"
        "engine (Spark Sunday=1/Saturday=7 vs DuckDB 0/6). One "
        "conditional-aggregate scan, no second pass."
    ),
)
def timeseries_weekday_weekend_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    kind = F.when(F.dayofweek("ts").isin(1, 7), "weekend").otherwise("weekday")
    base = ev.select("event_type", kind.alias("day_kind"), "value")
    agg = base.groupBy("event_type").agg(
        F.avg(F.when(F.col("day_kind") == "weekday", F.col("value"))).alias("wd"),
        F.avg(F.when(F.col("day_kind") == "weekend", F.col("value"))).alias("we"),
        F.count(F.when(F.col("day_kind") == "weekday", 1)).cast("long").alias("n_weekday"),
        F.count(F.when(F.col("day_kind") == "weekend", 1)).cast("long").alias("n_weekend"),
    )
    return agg.select(
        "event_type",
        F.round("wd", 6).alias("weekday_avg"),
        F.round("we", 6).alias("weekend_avg"),
        F.round(F.col("we") / F.col("wd"), 6).alias("weekend_lift"),
        "n_weekday",
        "n_weekend",
    )


@query(
    "timeseries_decompose_additive",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               sum(value) AS v
        FROM events GROUP BY 1, 2
    ), trended AS (
        SELECT event_type, day, v,
               avg(v) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
        FROM daily
    ), seasonal AS (
        SELECT event_type, day, v, trend,
               avg(v - trend) OVER (PARTITION BY event_type, dayofweek(day)) AS seas
        FROM trended
    )
    SELECT event_type, day,
           round(trend, 6) AS trend,
           round(seas, 6) AS seasonal,
           round(v - trend - seas, 6) AS remainder
    FROM seasonal
    """,
    doc=(
        "Classical additive decomposition: centered 7-day moving-average "
        "trend, day-of-week seasonal means of the detrended series, and "
        "the remainder — trend + seasonal + remainder == the series "
        "identically. All three components come from windows that share "
        "the event_type partitioning over the BOUNDED daily rollup "
        "(dayofweek numbering differs by engine but partitions "
        "identically). The per-type series length is days, so this "
        "costs the same at 100 TB of raw events."
    ),
)
def timeseries_decompose_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum("value").alias("v"))
    w_trend = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    trended = daily.withColumn("trend", F.avg("v").over(w_trend))
    w_seas = Window.partitionBy("event_type", F.dayofweek("day"))
    seasonal = trended.withColumn("seas", F.avg(F.col("v") - F.col("trend")).over(w_seas))
    return seasonal.select(
        "event_type",
        "day",
        F.round("trend", 6).alias("trend"),
        F.round("seas", 6).alias("seasonal"),
        F.round(F.col("v") - F.col("trend") - F.col("seas"), 6).alias("remainder"),
    )


@query(
    "timeseries_peak_detection",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(value), 2) AS v
        FROM events GROUP BY 1, 2
    ), nbr AS (
        SELECT event_type, day, v,
               lag(v) OVER w AS prev_v, lead(v) OVER w AS next_v,
               avg(v) OVER (PARTITION BY event_type) AS mu
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day, v
    FROM nbr
    WHERE prev_v IS NOT NULL AND next_v IS NOT NULL
      AND v > prev_v AND v > next_v AND v > 1.2 * mu
    """,
    doc=(
        "Peak detection: strict local maxima of the daily series that "
        "also clear 1.2x the series mean — neighbor comparison via "
        "lag/lead plus a same-key mean window, all sharing one "
        "event_type exchange over the bounded rollup. The spike-finding "
        "primitive under alerting and campaign attribution."
    ),
)
def timeseries_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    wm = Window.partitionBy("event_type")
    nbr = daily.select(
        "event_type",
        "day",
        "v",
        F.lag("v").over(w).alias("prev_v"),
        F.lead("v").over(w).alias("next_v"),
        F.avg("v").over(wm).alias("mu"),
    )
    return nbr.filter(
        F.col("prev_v").isNotNull()
        & F.col("next_v").isNotNull()
        & (F.col("v") > F.col("prev_v"))
        & (F.col("v") > F.col("next_v"))
        & (F.col("v") > 1.2 * F.col("mu"))
    ).select("event_type", "day", "v")


@query(
    "timeseries_seasonality_strength",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               sum(value) AS v
        FROM events GROUP BY 1, 2
    ), trended AS (
        SELECT event_type, day, v,
               avg(v) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
        FROM daily
    ), seasonal AS (
        SELECT event_type, day, v - trend AS detrended,
               avg(v - trend) OVER (PARTITION BY event_type, dayofweek(day)) AS seas
        FROM trended
    )
    SELECT event_type,
           round(greatest(0, 1 - var_samp(detrended - seas) / var_samp(detrended)), 6)
               AS seasonality_strength,
           CAST(count(*) AS BIGINT) AS n_days
    FROM seasonal GROUP BY 1
    """,
    doc=(
        "Seasonality strength (the STL diagnostic): 1 - Var(remainder)/"
        "Var(detrended), clamped at 0 — near 1 means the dow pattern "
        "explains the detrended series, near 0 means noise; THE number "
        "that says whether a seasonal forecast model is worth fitting. "
        "Same window stack as timeseries_decompose_additive collapsed "
        "to one row per series."
    ),
)
def timeseries_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum("value").alias("v"))
    w_trend = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    trended = daily.withColumn("trend", F.avg("v").over(w_trend))
    w_seas = Window.partitionBy("event_type", F.dayofweek("day"))
    seasonal = trended.select(
        "event_type",
        (F.col("v") - F.col("trend")).alias("detrended"),
        F.avg(F.col("v") - F.col("trend")).over(w_seas).alias("seas"),
    )
    return seasonal.groupBy("event_type").agg(
        F.round(
            F.greatest(
                F.lit(0),
                1 - F.var_samp(F.col("detrended") - F.col("seas")) / F.var_samp("detrended"),
            ),
            6,
        ).alias("seasonality_strength"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )


@query(
    "timeseries_cross_correlation",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) FILTER (WHERE event_type = 'click') AS clicks,
               count(*) FILTER (WHERE event_type = 'purchase') AS purchases
        FROM events GROUP BY 1
    ), lagged AS (
        SELECT d.k, daily.clicks,
               lead(daily.purchases, d.k) OVER (PARTITION BY d.k ORDER BY daily.day)
                   AS purchases_shifted
        FROM daily CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(k)
    )
    SELECT k, round(corr(clicks, purchases_shifted), 6) AS xcorr,
           CAST(count(purchases_shifted) AS BIGINT) AS n_days
    FROM lagged GROUP BY 1 ORDER BY 1
    """,
    doc=(
        "Lead-lag cross-correlation: corr(clicks today, purchases k days "
        "later) for k in 0..3 — the lag-discovery scan that tells you "
        "how long conversions trail traffic. The daily rollup is "
        "computed once; the 4-row lag table replicates it per k "
        "(bounded x4), and each k's lead runs over the same bounded "
        "day series."
    ),
)
def timeseries_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
    )
    ks = spark.range(4).select(F.col("id").cast("int").alias("k"))
    lagged = daily.crossJoin(F.broadcast(ks)).select("k", "clicks", "purchases", "day")
    w = Window.partitionBy("k").orderBy("day")
    shifted = lagged.withColumn(
        "purchases_shifted",
        F.when(F.col("k") == 0, F.lead("purchases", 0).over(w))
        .when(F.col("k") == 1, F.lead("purchases", 1).over(w))
        .when(F.col("k") == 2, F.lead("purchases", 2).over(w))
        .when(F.col("k") == 3, F.lead("purchases", 3).over(w)),
    )
    return (
        shifted.groupBy("k")
        .agg(
            F.round(F.corr("clicks", "purchases_shifted"), 6).alias("xcorr"),
            F.count("purchases_shifted").cast("long").alias("n_days"),
        )
        .orderBy("k")
    )


@query(
    "timeseries_acf",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS cnt
        FROM events GROUP BY 1, 2
    ), lagged AS (
        SELECT event_type, k.k, daily.cnt,
               lag(daily.cnt, k.k) OVER (PARTITION BY event_type, k.k ORDER BY daily.day)
                   AS prev_cnt
        FROM daily CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6), (7)) AS k(k)
    )
    SELECT event_type, k AS lag_days,
           round(corr(cnt, prev_cnt), 6) AS acf,
           CAST(count(prev_cnt) AS BIGINT) AS n_pairs
    FROM lagged GROUP BY 1, 2
    """,
    doc=(
        "Autocorrelation function, lags 1-7: the full ACF table whose "
        "lag-7 spike identifies weekly seasonality (the generalization "
        "of timeseries_autocorr's single lag). The daily rollup is "
        "computed once and replicated over the bounded 7-row lag table; "
        "every per-lag window shares the (type, k) partitioning."
    ),
)
def timeseries_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    ks = spark.range(1, 8).select(F.col("id").cast("int").alias("k"))
    rep = daily.crossJoin(F.broadcast(ks))
    w = Window.partitionBy("event_type", "k").orderBy("day")
    expr = F.when(F.col("k") == 1, F.lag("cnt", 1).over(w))
    for i in range(2, 8):
        expr = expr.when(F.col("k") == i, F.lag("cnt", i).over(w))
    lagged = rep.withColumn("prev_cnt", expr)
    return lagged.groupBy("event_type", F.col("k").alias("lag_days")).agg(
        F.round(F.corr("cnt", "prev_cnt"), 6).alias("acf"),
        F.count("prev_cnt").cast("long").alias("n_pairs"),
    )


@query(
    "timeseries_max_drawdown",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               sum(value) AS v
        FROM events GROUP BY 1, 2
    ), cum0 AS (
        SELECT event_type, day,
               sum(v) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_v
        FROM daily
    ), cum AS (
        SELECT event_type, day, cum_v,
               max(cum_v) OVER (PARTITION BY event_type ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        FROM cum0
    )
    SELECT event_type,
           round(max(peak - cum_v), 2) AS max_drawdown,
           round(max((peak - cum_v) / nullif(peak, 0)), 6) AS max_drawdown_frac
    FROM cum GROUP BY 1
    """,
    doc=(
        "Maximum drawdown of the cumulative value series: largest "
        "peak-to-current drop (absolute and as a fraction of the peak) "
        "— the risk metric from finance, equally useful for 'how far "
        "below its high-water mark did this KPI fall'. Two stacked "
        "cumulative windows + a final aggregate, all sharing one "
        "event_type exchange over the bounded daily rollup."
    ),
)
def timeseries_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum("value").alias("v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "event_type", "day", F.sum("v").over(w).alias("cum_v")
    ).withColumn("peak", F.max("cum_v").over(w))
    dd = F.col("peak") - F.col("cum_v")
    return cum.groupBy("event_type").agg(
        F.round(F.max(dd), 2).alias("max_drawdown"),
        F.round(F.max(dd / F.nullif(F.col("peak"), F.lit(0))), 6).alias("max_drawdown_frac"),
    )


@query(
    "timeseries_burstiness",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           round(var_samp(n) / avg(n), 6) AS fano_factor,
           round((stddev_samp(n) - avg(n)) / (stddev_samp(n) + avg(n)), 6)
               AS burstiness,
           CAST(count(*) AS BIGINT) AS n_days
    FROM daily GROUP BY 1
    """,
    doc=(
        "Burstiness metrics: Fano factor (variance/mean of daily counts "
        "— 1 under Poisson arrivals) and the Goh-Barabasi burstiness "
        "coefficient (sigma-mu)/(sigma+mu) in [-1, 1] — the dispersion "
        "diagnostics that say whether traffic is smooth, Poisson, or "
        "bursty (and therefore how much headroom autoscaling needs). "
        "One rollup + one bounded aggregate."
    ),
)
def timeseries_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return daily.groupBy("event_type").agg(
        F.round(F.var_samp("n") / F.avg("n"), 6).alias("fano_factor"),
        F.round(
            (F.stddev_samp("n") - F.avg("n")) / (F.stddev_samp("n") + F.avg("n")), 6
        ).alias("burstiness"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )


@query(
    "timeseries_realized_volatility",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               sum(value) AS v
        FROM events GROUP BY 1, 2
    ), rets AS (
        SELECT event_type, day,
               (v - lag(v) OVER w) / nullif(lag(v) OVER w, 0) AS ret
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day,
           round(stddev_samp(ret) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS vol_7d
    FROM rets WHERE ret IS NOT NULL
    """,
    doc=(
        "Realized volatility: 7-day rolling stddev of daily returns "
        "(pct change, zero-baseline guarded) per series — the "
        "instability gauge that pairs with timeseries_rate_of_change's "
        "first derivative. Lag window and rolling-std window share the "
        "event_type partitioning over the bounded daily rollup."
    ),
)
def timeseries_realized_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum("value").alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("v").over(w)
    rets = daily.select(
        "event_type", "day", ((F.col("v") - prev) / F.nullif(prev, F.lit(0))).alias("ret")
    ).filter(F.col("ret").isNotNull())
    wv = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    return rets.select(
        "event_type", "day", F.round(F.stddev_samp("ret").over(wv), 6).alias("vol_7d")
    )


@query(
    "timeseries_dow_adjusted",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, sum(value) AS v
        FROM events GROUP BY 1
    ), factors AS (
        SELECT day, v,
               avg(v) OVER (PARTITION BY dayofweek(day)) AS dow_mean,
               avg(v) OVER () AS overall_mean
        FROM daily
    )
    SELECT day, round(v, 2) AS raw,
           round(v / (dow_mean / overall_mean), 2) AS dow_adjusted,
           round(dow_mean / overall_mean, 6) AS dow_factor
    FROM factors
    """,
    doc=(
        "Day-of-week adjustment (multiplicative): each day's value "
        "divided by its weekday's mean-relative factor — the "
        "'seasonally adjusted' series that makes a Tuesday comparable "
        "to a Saturday (the multiplicative twin of the additive "
        "decomposition). Factor windows run over the bounded daily "
        "rollup; dow partition identity is engine-offset-proof."
    ),
)
def timeseries_dow_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.sum("value").alias("v")
    )
    factors = daily.select(
        "day",
        "v",
        F.avg("v").over(Window.partitionBy(F.dayofweek("day"))).alias("dow_mean"),
        F.avg("v").over(Window.partitionBy()).alias("overall_mean"),
    )
    factor = F.col("dow_mean") / F.col("overall_mean")
    return factors.select(
        "day",
        F.round("v", 2).alias("raw"),
        F.round(F.col("v") / factor, 2).alias("dow_adjusted"),
        F.round(factor, 6).alias("dow_factor"),
    )


@query(
    "timeseries_sma_crossover",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               sum(value) AS v
        FROM events GROUP BY 1, 2
    ), sma AS (
        SELECT event_type, day,
               avg(v) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sma3,
               avg(v) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS sma7,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        FROM daily
    ), sig AS (
        SELECT event_type, day, sma3, sma7,
               lag(sma3 > sma7) OVER (PARTITION BY event_type ORDER BY day) AS was_above,
               sma3 > sma7 AS is_above
        FROM sma WHERE rn >= 7
    )
    SELECT event_type, day,
           CASE WHEN is_above AND NOT was_above THEN 'golden_cross'
                ELSE 'death_cross' END AS signal,
           round(sma3, 6) AS sma3, round(sma7, 6) AS sma7
    FROM sig
    WHERE was_above IS NOT NULL AND is_above <> was_above
    """,
    doc=(
        "Moving-average crossover signals: days where the fast SMA(3) "
        "crosses the slow SMA(7) (golden/death cross) after both "
        "windows are fully populated — trend-change detection by "
        "crossing, complementing peak detection's local extrema. Both "
        "SMAs, the rank guard, and the lag comparison share one "
        "event_type exchange over the bounded rollup."
    ),
)
def timeseries_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum("value").alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    sma = daily.select(
        "event_type",
        "day",
        F.avg("v").over(w.rowsBetween(-2, 0)).alias("sma3"),
        F.avg("v").over(w.rowsBetween(-6, 0)).alias("sma7"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") >= 7)
    is_above = F.col("sma3") > F.col("sma7")
    sig = sma.select(
        "event_type",
        "day",
        "sma3",
        "sma7",
        F.lag(is_above).over(Window.partitionBy("event_type").orderBy("day")).alias("was_above"),
        is_above.alias("is_above"),
    )
    return sig.filter(
        F.col("was_above").isNotNull() & (F.col("is_above") != F.col("was_above"))
    ).select(
        "event_type",
        "day",
        F.when(F.col("is_above") & ~F.col("was_above"), "golden_cross")
        .otherwise("death_cross")
        .alias("signal"),
        F.round("sma3", 6).alias("sma3"),
        F.round("sma7", 6).alias("sma7"),
    )


@query(
    "timeseries_theil_sen_trend",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(count(*) AS DOUBLE) AS n
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, n,
               CAST(date_diff('day', DATE '2024-01-01', d) AS DOUBLE) AS x
        FROM daily
    ),
    slopes AS (
        SELECT a.event_type, (b.n - a.n) / (b.x - a.x) AS slope
        FROM idx a JOIN idx b
          ON a.event_type = b.event_type AND a.x < b.x
    )
    SELECT event_type,
           round(median(slope), 6) AS theil_sen_slope,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM slopes GROUP BY 1
    """,
    doc=(
        "Theil-Sen robust trend estimator: the median of all pairwise "
        "slopes of the per-type daily counts — unlike regr_slope "
        "(analytics_user_value_trend's OLS), a 29%-outlier-tolerant "
        "trend, the robust-statistics twin of outlier_mad vs z-score. "
        "The O(days^2) pairwise join runs on the BOUNDED daily rollup "
        "(|days| rows per type, never raw events) keyed on event_type — "
        "the same rollup-first discipline as the ACF/burstiness family, "
        "so at 100 TB the quadratic term is |days|^2 ~ 1e5 pairs per "
        "type per year, constant in event volume."
    ),
)
def timeseries_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    idx = daily.select(
        "event_type",
        "n",
        F.datediff("d", F.lit("2024-01-01").cast("date")).cast("double").alias("x"),
    )
    a = idx.select(
        F.col("event_type"), F.col("n").alias("n_a"), F.col("x").alias("x_a")
    )
    b = idx.select(
        F.col("event_type").alias("et_b"),
        F.col("n").alias("n_b"),
        F.col("x").alias("x_b"),
    )
    slopes = a.join(
        b, (F.col("event_type") == F.col("et_b")) & (F.col("x_a") < F.col("x_b"))
    ).select(
        "event_type",
        ((F.col("n_b") - F.col("n_a")) / (F.col("x_b") - F.col("x_a"))).alias("slope"),
    )
    return slopes.groupBy("event_type").agg(
        F.round(F.expr("median(slope)"), 6).alias("theil_sen_slope"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )


@query(
    "timeseries_locf_bounded",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d, round(sum(value), 6) AS v
        FROM events WHERE user_id < 40 GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id, min(d) AS lo, max(d) AS hi FROM daily GROUP BY 1
    ),
    spine AS (
        SELECT b.user_id, CAST(unnest(generate_series(b.lo, b.hi,
                                      INTERVAL 1 DAY)) AS DATE) AS d
        FROM bounds b
    ),
    joined AS (
        SELECT s.user_id, s.d, dl.v,
               max(CASE WHEN dl.v IS NOT NULL THEN s.d END) OVER w AS last_obs_d
        FROM spine s LEFT JOIN daily dl USING (user_id, d)
        WINDOW w AS (PARTITION BY s.user_id ORDER BY s.d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, d,
           CASE WHEN d - last_obs_d <= 2 THEN
               last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           END AS v_filled,
           CAST(v IS NOT NULL AS INTEGER) AS observed
    FROM joined
    """,
    doc=(
        "Bounded-staleness LOCF: gap-fill carries the last observation "
        "forward AT MOST 2 days — past that the series goes NULL instead "
        "of serving stale data, the freshness contract production "
        "feature stores enforce (unbounded LOCF, timeseries_gapfill_locf "
        "above, silently serves arbitrarily old values after an outage). "
        "Two stacked windows over one user-key exchange: a running "
        "max-of-observed-date computes staleness, and last(ignorenulls) "
        "supplies the carried value only when staleness <= the bound. "
        "Calendar spine via sequence/explode, same as the unbounded "
        "variant."
    ),
)
def timeseries_locf_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    bounds = daily.groupBy("user_id").agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d"),
    )
    joined = spine.join(daily, ["user_id", "d"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_obs_d = F.max(F.when(F.col("v").isNotNull(), F.col("d"))).over(w)
    carried = F.last("v", ignorenulls=True).over(w)
    return joined.select(
        "user_id",
        "d",
        F.when(F.datediff(F.col("d"), last_obs_d) <= 2, carried).alias("v_filled"),
        F.col("v").isNotNull().cast("int").alias("observed"),
    )


_KALMAN_Q, _KALMAN_R = 0.01, 1.0


@query(
    "timeseries_kalman_1d",
    oracle=f"""
    WITH pts AS (
        SELECT user_id, list([value] ORDER BY ts, event_id) AS zs
        FROM events WHERE user_id < 150 AND value IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(zs) AS BIGINT) AS n_points,
           round(list_reduce(zs, (acc, z) -> [
               acc[1] + ((coalesce(acc[2], 1.0) + {_KALMAN_Q})
                         / ((coalesce(acc[2], 1.0) + {_KALMAN_Q}) + {_KALMAN_R}))
                        * (z[1] - acc[1]),
               (1.0 - ((coalesce(acc[2], 1.0) + {_KALMAN_Q})
                       / ((coalesce(acc[2], 1.0) + {_KALMAN_Q}) + {_KALMAN_R})))
               * (coalesce(acc[2], 1.0) + {_KALMAN_Q})
           ])[1], 6) AS kalman_estimate
    FROM pts
    """,
    doc=(
        "1-D Kalman filter (random-walk state, noisy measurement) per "
        "user series: p_pred = p + q; K = p_pred/(p_pred + r); "
        "x += K*(z - x); p = (1-K)*p_pred — the optimal streaming "
        "smoother whose gain ADAPTS (high when uncertain, low once "
        "converged), unlike the fixed-decay EWMA twin. Every step is "
        "rational arithmetic, so the sequential fold is bit-identical "
        "across engines (F.aggregate == DuckDB list_reduce; the DuckDB "
        "fold seeds from the first element, so p's seed rides in as "
        "coalesce(acc[2], 1.0) — mirrored exactly by the Spark init "
        "struct). Scale shape: one user-keyed shuffle, O(1) state per "
        "key — the recurrence drops into applyInPandasWithState "
        "unchanged for the streaming variant."
    ),
)
def timeseries_kalman_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 150) & F.col("value").isNotNull()
    )
    pts = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("ts").cast("double").alias("t"),
                    F.col("event_id").cast("double").alias("e"),
                    F.col("value").cast("double").alias("z"),
                )
            )
        ).alias("xs")
    )

    def step(acc, x):
        p_pred = acc.p + F.lit(_KALMAN_Q)
        gain = p_pred / (p_pred + F.lit(_KALMAN_R))
        return F.struct(
            (acc.x + gain * (x.z - acc.x)).alias("x"),
            ((F.lit(1.0) - gain) * p_pred).alias("p"),
        )

    fold = F.aggregate(
        F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
        F.struct(
            F.element_at("xs", 1).z.alias("x"), F.lit(1.0).alias("p")
        ),
        step,
    )
    return pts.select(
        "user_id",
        F.size("xs").cast("long").alias("n_points"),
        F.round(fold.x, 6).alias("kalman_estimate"),
    )


_HAMPEL_K = 3.0  # the canonical Hampel threshold (Pearson's 3-sigma
# analogue after the 1.4826 MAD-to-sigma consistency factor); fires on
# real spikes at both test SFs (positive-case tested on crafted data).


@query(
    "timeseries_hampel_outliers",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ),
    win AS (
        SELECT event_type, day, v,
               list(v) OVER (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS lst
        FROM daily
    ),
    med AS (
        SELECT event_type, day, v, lst,
               (list_sort(lst)[(len(lst)+1)//2]
                + list_sort(lst)[(len(lst)+2)//2]) / 2 AS med
        FROM win
    ),
    mad AS (
        SELECT event_type, day, v, med,
               (list_sort([abs(x - med) for x in lst])[(len(lst)+1)//2]
                + list_sort([abs(x - med) for x in lst])[(len(lst)+2)//2]) / 2
                   AS mad
        FROM med
    )
    SELECT event_type, day, CAST(v AS BIGINT) AS n_events,
           round(med, 6) AS med, round(mad, 6) AS mad
    FROM mad WHERE mad > 0 AND abs(v - med) > {_HAMPEL_K} * 1.4826 * mad
    """,
    doc=(
        "Hampel filter spike detection: a day is an outlier when its "
        "event volume deviates from the +-3-day rolling MEDIAN by more "
        "than 3 x 1.4826 x rolling MAD — the robust twin of z-score "
        "detection (CUSUM catches level SHIFTS, this catches SPIKES "
        "without the spike itself inflating the threshold, which is "
        "exactly what mean/stddev windows get wrong). Both median and "
        "MAD come from ONE windowed collect over the bounded per-type "
        "daily rollup (7 elements, array_sort + the same two-middle "
        "interpolation formula in both engines — bit-identical, no "
        "holistic-aggregate implementation drift), and the MAD=0 "
        "degenerate case (constant window) is excluded per the "
        "published filter. Volumes are counts, so every windowed sum "
        "is integer-exact regardless of execution order. The window "
        "partitions by event_type over days — at 100 TB the raw scan "
        "reduces map-side to |types| x |days| rows before any window "
        "sees it."
    ),
)
def timeseries_hampel_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("v"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    win = daily.withColumn("lst", F.collect_list("v").over(w))

    def _arr_median(arr):
        s = F.array_sort(arr)
        n = F.size(arr)
        lo = F.element_at(s, F.floor((n + 1) / 2).cast("int"))
        hi = F.element_at(s, F.floor((n + 2) / 2).cast("int"))
        return (lo + hi) / 2

    med = win.withColumn("med", _arr_median(F.col("lst")))
    mad = med.withColumn(
        "mad", _arr_median(F.transform("lst", lambda x: F.abs(x - F.col("med"))))
    )
    return mad.filter(
        (F.col("mad") > 0)
        & (F.abs(F.col("v") - F.col("med")) > _HAMPEL_K * 1.4826 * F.col("mad"))
    ).select(
        "event_type",
        "day",
        F.col("v").cast("long").alias("n_events"),
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
    )


@query(
    "timeseries_mase",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT event_type, day, v,
               lag(v, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1,
               lag(v, 7) OVER (PARTITION BY event_type ORDER BY day) AS l7
        FROM daily
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(sum(abs(v - l1)) / count(l1), 6) AS naive_mae,
           round(sum(abs(v - l7)) / count(l7), 6) AS seasonal_mae,
           round((sum(abs(v - l7)) / count(l7))
                 / nullif(sum(abs(v - l1)) / count(l1), 0), 6) AS mase
    FROM lagged GROUP BY event_type
    """,
    doc=(
        "MASE (mean absolute scaled error, Hyndman-Koehler): the "
        "weekly seasonal-naive forecast's MAE scaled by the one-step "
        "naive MAE — the standard scale-free forecast-quality score "
        "(< 1: weekly seasonality beats persistence; > 1: it does "
        "not), complementing seasonality_strength's variance-ratio "
        "view with an error-ratio view. Lags are positional over "
        "observed days (gap days contribute no term, same contract as "
        "the SMA/ACF family). Volumes are counts, so both MAE "
        "numerators are integer-exact sums in any execution order and "
        "the final divisions are single IEEE ops — deterministic "
        "cross-engine without value rounding tricks. One partial-agg "
        "scan to the bounded rollup, one event_type exchange shared by "
        "both lag windows and the final group-by."
    ),
)
def timeseries_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "v",
        F.lag("v", 1).over(w).alias("l1"),
        F.lag("v", 7).over(w).alias("l7"),
    )
    naive = F.sum(F.abs(F.col("v") - F.col("l1"))) / F.count("l1")
    seasonal = F.sum(F.abs(F.col("v") - F.col("l7"))) / F.count("l7")
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(naive, 6).alias("naive_mae"),
        F.round(seasonal, 6).alias("seasonal_mae"),
        F.round(seasonal / F.nullif(naive, F.lit(0.0)), 6).alias("mase"),
    )


@query(
    "timeseries_changepoint_meanshift",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, day, v,
               sum(v) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS cum,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
               sum(v) OVER (PARTITION BY event_type) AS total,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ),
    scored AS (
        SELECT event_type, day,
               cum / k AS mean_before,
               (total - cum) / (n - k) AS mean_after,
               abs(cum / k - (total - cum) / (n - k))
                   * sqrt(CAST(k AS DOUBLE) * (n - k) / n) AS score
        FROM stats WHERE k < n
    )
    SELECT event_type, day AS change_day, round(score, 6) AS score,
           round(mean_before, 6) AS mean_before,
           round(mean_after, 6) AS mean_after
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY score DESC, day) AS rn
          FROM scored)
    WHERE rn = 1
    """,
    doc=(
        "Offline single-changepoint detection (binary-segmentation "
        "step / CUSUM max statistic): for every candidate split of the "
        "per-type daily series, score |mean_before - mean_after| x "
        "sqrt(k(n-k)/n) — the two-sample mean-shift statistic whose "
        "argmax is the changepoint estimate and whose sqrt factor "
        "de-biases edge splits — and return the best split per type "
        "with its segment means. CUSUM (dq family) monitors drift "
        "ONLINE against a fixed reference; this answers the "
        "retrospective question WHERE the level changed. Every term "
        "is exact until the final sqrt/multiply (prefix sums of "
        "counts are integer-exact in any order; divisions and the "
        "IEEE-correctly-rounded sqrt are single deterministic ops), "
        "so the argmax comparison itself is bit-identical across "
        "engines. All three windows share one event_type exchange "
        "over the bounded rollup; recursing into segments (full "
        "binary segmentation) repeats this same bounded query per "
        "segment at depth O(log changepoints)."
    ),
)
def timeseries_changepoint_meanshift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("v"))
    wo = Window.partitionBy("event_type").orderBy("day")
    wa = Window.partitionBy("event_type")
    stats = daily.select(
        "event_type",
        "day",
        "v",
        F.sum("v").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(wo).alias("k"),
        F.sum("v").over(wa).alias("total"),
        F.count(F.lit(1)).over(wa).alias("n"),
    ).filter(F.col("k") < F.col("n"))
    mean_before = F.col("cum") / F.col("k")
    mean_after = (F.col("total") - F.col("cum")) / (F.col("n") - F.col("k"))
    scored = stats.select(
        "event_type",
        "day",
        mean_before.alias("mean_before"),
        mean_after.alias("mean_after"),
        (
            F.abs(mean_before - mean_after)
            * F.sqrt(
                F.col("k").cast("double") * (F.col("n") - F.col("k")) / F.col("n")
            )
        ).alias("score"),
    )
    wr = Window.partitionBy("event_type").orderBy(F.desc("score"), "day")
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.round("score", 6).alias("score"),
            F.round("mean_before", 6).alias("mean_before"),
            F.round("mean_after", 6).alias("mean_after"),
        )
    )


def _meanshift_best_split(daily: DataFrame, part_cols: list[str]) -> DataFrame:
    """Best mean-shift split per partition of a (part_cols..., day, v)
    rollup: the changepoint_meanshift statistic |mean_L - mean_R| x
    sqrt(k(n-k)/n) arg-maxed within each partition (score desc, day
    tiebreak). Shared by the single-changepoint query and the depth-2
    binary segmentation — identical arithmetic at every depth."""
    wo = Window.partitionBy(*part_cols).orderBy("day")
    wa = Window.partitionBy(*part_cols)
    stats = daily.select(
        *part_cols,
        "day",
        "v",
        F.sum("v").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(wo).alias("k"),
        F.sum("v").over(wa).alias("total"),
        F.count(F.lit(1)).over(wa).alias("n"),
    ).filter(F.col("k") < F.col("n"))
    mean_before = F.col("cum") / F.col("k")
    mean_after = (F.col("total") - F.col("cum")) / (F.col("n") - F.col("k"))
    scored = stats.select(
        *part_cols,
        "day",
        mean_before.alias("mean_before"),
        mean_after.alias("mean_after"),
        (
            F.abs(mean_before - mean_after)
            * F.sqrt(
                F.col("k").cast("double") * (F.col("n") - F.col("k")) / F.col("n")
            )
        ).alias("score"),
    )
    wr = Window.partitionBy(*part_cols).orderBy(F.desc("score"), "day")
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _binseg_oracle() -> str:
    # One level of the recursion as a reusable CTE body: scored splits
    # within (event_type, seg), arg-maxed. Level 1 runs it with seg =
    # 'all'; level 2 relabels rows by the level-1 split and reruns the
    # SAME text — the SQL twin of _meanshift_best_split's reuse.
    def level(src: str, out: str) -> str:
        return f"""
    {out}_stats AS (
        SELECT event_type, seg, day, v,
               sum(v) OVER (PARTITION BY event_type, seg ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS cum,
               row_number() OVER (PARTITION BY event_type, seg
                                  ORDER BY day) AS k,
               sum(v) OVER (PARTITION BY event_type, seg) AS total,
               count(*) OVER (PARTITION BY event_type, seg) AS n
        FROM {src}
    ),
    {out}_scored AS (
        SELECT event_type, seg, day,
               cum / k AS mean_before,
               (total - cum) / (n - k) AS mean_after,
               abs(cum / k - (total - cum) / (n - k))
                   * sqrt(CAST(k AS DOUBLE) * (n - k) / n) AS score
        FROM {out}_stats WHERE k < n
    ),
    {out} AS (
        SELECT event_type, seg, day, mean_before, mean_after, score FROM (
            SELECT *, row_number() OVER (PARTITION BY event_type, seg
                                         ORDER BY score DESC, day) AS rn
            FROM {out}_scored
        ) WHERE rn = 1
    )"""

    return f"""
    WITH daily AS (
        SELECT event_type, 'all' AS seg,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS DOUBLE) AS v
        FROM events GROUP BY 1, 3
    ),{level("daily", "lv1")},
    relabeled AS (
        SELECT d.event_type,
               CASE WHEN d.day <= s.day THEN 'L' ELSE 'R' END AS seg,
               d.day, d.v
        FROM daily d JOIN lv1 s ON d.event_type = s.event_type
    ),{level("relabeled", "lv2")}
    SELECT event_type, 1 AS level, seg, day AS change_day,
           round(score, 6) AS score,
           round(mean_before, 6) AS mean_before,
           round(mean_after, 6) AS mean_after
    FROM lv1
    UNION ALL
    SELECT event_type, 2 AS level, seg, day AS change_day,
           round(score, 6) AS score,
           round(mean_before, 6) AS mean_before,
           round(mean_after, 6) AS mean_after
    FROM lv2
    """


@query(
    "timeseries_binseg_depth2",
    oracle=_binseg_oracle(),
    doc=(
        "Binary segmentation to depth 2 — MULTI-changepoint detection: "
        "the level-1 mean-shift argmax splits each type's daily series "
        "(exactly timeseries_changepoint_meanshift), then the IDENTICAL "
        "statistic re-runs inside each resulting half ('L'/'R' segment "
        "labels join back on the bounded split table, never the raw "
        "events), yielding up to 3 ranked changepoints per type — the "
        "classic Scott-Knott/binary-segmentation recursion, each level "
        "one more keyed window pass over the bounded rollup. Arithmetic "
        "is the changepoint query's (integer prefix sums, exact "
        "divisions, IEEE sqrt), so the per-level argmax stays "
        "bit-identical cross-engine and the recursion depth only "
        "changes WHICH partitions the same expressions run in. At full "
        "depth-d the cost is d keyed passes — O(d) shuffles of "
        "|types| x |days| rows, independent of event count."
    ),
)
def timeseries_binseg_depth2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("v")).withColumn(
        "seg", F.lit("all")
    )
    lv1 = _meanshift_best_split(daily, ["event_type", "seg"])
    relabeled = (
        daily.drop("seg")
        .join(
            lv1.select("event_type", F.col("day").alias("split_day")), "event_type"
        )
        .select(
            "event_type",
            F.when(F.col("day") <= F.col("split_day"), "L").otherwise("R").alias("seg"),
            "day",
            "v",
        )
    )
    lv2 = _meanshift_best_split(relabeled, ["event_type", "seg"])

    def out(df: DataFrame, level: int) -> DataFrame:
        return df.select(
            "event_type",
            F.lit(level).cast("int").alias("level"),
            "seg",
            F.col("day").alias("change_day"),
            F.round("score", 6).alias("score"),
            F.round("mean_before", 6).alias("mean_before"),
            F.round("mean_after", 6).alias("mean_after"),
        )

    return out(lv1, 1).unionByName(out(lv2, 2))


_CROSTON_ALPHA = 0.25  # exact binary fraction, the fold-family rule


@query(
    "timeseries_croston",
    oracle=f"""
    WITH d AS (
        SELECT user_id,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(date_trunc('day', ts) AS DATE)) AS DOUBLE) AS ed,
               CAST(count(*) AS DOUBLE) AS q
        FROM events WHERE event_type = 'purchase' AND user_id < 200
        GROUP BY 1, 2),
    s AS (
        SELECT user_id, list([ed, q] ORDER BY ed) AS xs,
               CAST(count(*) AS BIGINT) AS n_demand_days
        FROM d GROUP BY user_id),
    folded AS (
        SELECT user_id, n_demand_days,
               list_reduce(
                   list_prepend(CAST([xs[1][2], 1, xs[1][1]] AS DOUBLE[]),
                                xs[2:]),
                   (acc, x) -> [{_CROSTON_ALPHA} * x[2]
                                    + {1 - _CROSTON_ALPHA} * acc[1],
                                {_CROSTON_ALPHA} * (x[1] - acc[3])
                                    + {1 - _CROSTON_ALPHA} * acc[2],
                                x[1]]) AS st
        FROM s)
    SELECT user_id, n_demand_days,
           round(st[1], 6) AS demand_level,
           round(st[2], 6) AS interval_level,
           round(st[1] / st[2], 6) AS forecast_per_day
    FROM folded
    """,
    doc=(
        "Croston's method for INTERMITTENT demand — the estimator for "
        "series that are zero most days (a user's purchases), where "
        "ordinary exponential smoothing decays toward zero between "
        "demands and forecasts garbage: smooth the nonzero demand sizes "
        "and the inter-demand intervals as two separate EWMAs updated "
        "ONLY at demand points (z' = a*q + (1-a)z, p' = a*gap + "
        "(1-a)p), and forecast demand-per-day as z/p. The zero days "
        "never materialize anywhere — intermittency is carried by the "
        "integer day gaps between consecutive demand rows, so the fold "
        "input is |demand days| per user, not |days| (the reason "
        "Croston scales where a dense daily spine would not). Same "
        "rational-arithmetic fold contract as the EWMA/Holt family: "
        "a=1/4 exact binary fraction, integer counts and integer gaps, "
        "explicit full-arity prepended seed (z=first demand, p=1, "
        "prev=first day) so a single-demand user returns the seed "
        "unapplied on both engines. Scale shape: one partial-agg "
        "shuffle to (user, day) rows, one user-keyed shuffle of "
        "bounded demand arrays, O(1) state per user, "
        "applyInPandasWithState-ready."
    ),
)
def timeseries_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 200)
    )
    d = ev.groupBy(
        "user_id",
        F.datediff(F.to_date(F.date_trunc("day", "ts")), F.lit("1970-01-01").cast("date"))
        .cast("double")
        .alias("ed"),
    ).agg(F.count(F.lit(1)).cast("double").alias("q"))
    s = d.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ed", "q"))).alias("xs"),
        F.count(F.lit(1)).cast("long").alias("n_demand_days"),
    )
    a = _CROSTON_ALPHA

    def step(acc, x):
        z = F.lit(a) * x["q"] + F.lit(1 - a) * F.element_at(acc, 1)
        p = F.lit(a) * (x["ed"] - F.element_at(acc, 3)) + F.lit(1 - a) * F.element_at(
            acc, 2
        )
        return F.array(z, p, x["ed"])

    seed = F.array(
        F.element_at("xs", 1)["q"], F.lit(1.0), F.element_at("xs", 1)["ed"]
    )
    fold = F.aggregate(
        F.slice("xs", 2, F.greatest(F.size("xs") - 1, F.lit(0))), seed, step
    )
    return s.select(
        "user_id",
        "n_demand_days",
        F.round(fold[0], 6).alias("demand_level"),
        F.round(fold[1], 6).alias("interval_level"),
        F.round(fold[0] / fold[1], 6).alias("forecast_per_day"),
    )


_BOLL_WIN = 7  # trailing days per band; current day excluded (hampel lesson)
_BOLL_K = 2.0  # exact binary fraction band width


@query(
    "timeseries_bollinger_bands",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2),
    win AS (
        SELECT event_type, day, n_events,
               CAST(count(*) OVER w AS BIGINT) AS wn,
               CAST(sum(n_events) OVER w AS BIGINT) AS sx,
               CAST(sum(n_events * n_events) OVER w AS BIGINT) AS sxx
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN {_BOLL_WIN} PRECEDING AND 1 PRECEDING))
    SELECT event_type, day, n_events,
           round(mid, 6) AS band_mid,
           round(mid + {_BOLL_K} * sd, 6) AS band_upper,
           round(mid - {_BOLL_K} * sd, 6) AS band_lower,
           n_events > mid + {_BOLL_K} * sd
               OR n_events < mid - {_BOLL_K} * sd AS is_breakout
    FROM (SELECT *,
                 CAST(sx AS DOUBLE) / {_BOLL_WIN} AS mid,
                 sqrt(CAST({_BOLL_WIN} * sxx - sx * sx AS DOUBLE)
                      / {_BOLL_WIN * (_BOLL_WIN - 1)}) AS sd
          FROM win WHERE wn = {_BOLL_WIN})
    """,
    doc=(
        f"Bollinger bands over the per-event-type daily count series: a "
        f"{_BOLL_WIN}-day TRAILING window (current day excluded, so a "
        "spike can never inflate its own band — the Hampel causality "
        "rule) yields mid = mean and +/-"
        f"{_BOLL_K} sample-stddev bands, with is_breakout flagging days "
        "outside them — the volatility-scaled alternative to fixed "
        "thresholds (quiet series get tight bands, noisy ones wide). "
        "Cross-engine exactness WITHOUT any float summation: the window "
        "aggregates are INTEGER sums (sx, sxx over integer counts — "
        "exact in both engines), variance comes from the integer "
        f"identity ({_BOLL_WIN}*sxx - sx^2) / "
        f"{_BOLL_WIN * (_BOLL_WIN - 1)} whose numerator is computed in "
        "exact long arithmetic and divided once, and sqrt is IEEE "
        "correctly-rounded — so mid/sd/bands are bit-identical given "
        "identical rows, with round-6 only at the boundary (documented "
        "long-overflow bound: daily counts past ~2^26 per key need the "
        "decimal widening the HHI query uses). Only full windows emit "
        "(wn = "
        f"{_BOLL_WIN}), so warmup days carry no under-sampled verdict. "
        "Scale shape: one partial-agg shuffle to |type, day| rows, then "
        "a key-partitioned window over bounded daily rows — never the "
        "events."
    ),
)
def timeseries_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-_BOLL_WIN, -1)
    )
    win = daily.select(
        "event_type",
        "day",
        "n_events",
        F.count(F.lit(1)).over(w).cast("long").alias("wn"),
        F.sum("n_events").over(w).cast("long").alias("sx"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).cast("long").alias("sxx"),
    ).filter(F.col("wn") == _BOLL_WIN)
    mid = F.col("sx").cast("double") / _BOLL_WIN
    sd = F.sqrt(
        (F.lit(_BOLL_WIN) * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        / (_BOLL_WIN * (_BOLL_WIN - 1))
    )
    return win.select(
        "event_type",
        "day",
        "n_events",
        F.round(mid, 6).alias("band_mid"),
        F.round(mid + _BOLL_K * sd, 6).alias("band_upper"),
        F.round(mid - _BOLL_K * sd, 6).alias("band_lower"),
        (
            (F.col("n_events") > mid + _BOLL_K * sd)
            | (F.col("n_events") < mid - _BOLL_K * sd)
        ).alias("is_breakout"),
    )


_DOMP_MAX_LAG = 10


@query(
    "timeseries_dominant_period",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2),
    lagged AS (
        SELECT event_type, k.k, daily.cnt AS x,
               lag(daily.cnt, k.k) OVER (
                   PARTITION BY event_type, k.k ORDER BY daily.day) AS y
        FROM daily CROSS JOIN generate_series(2, {_DOMP_MAX_LAG}) AS k(k)),
    mom AS (
        SELECT event_type, k,
               CAST(count(y) AS BIGINT) AS n,
               CAST(sum(x) FILTER (WHERE y IS NOT NULL) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) FILTER (WHERE y IS NOT NULL) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM lagged GROUP BY 1, 2),
    r AS (
        SELECT event_type, k, n,
               CAST(n * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                      * (n * syy - sy * sy)) AS acf
        FROM mom
        WHERE n >= 3 AND n * sxx > sx * sx AND n * syy > sy * sy)
    SELECT event_type, CAST(k AS BIGINT) AS dominant_lag,
           round(acf, 6) AS acf, n AS n_pairs
    FROM (SELECT *, row_number() OVER (
              PARTITION BY event_type ORDER BY acf DESC, k) AS rn
          FROM r)
    WHERE rn = 1
    """,
    doc=(
        f"Dominant period detection: argmax over lags 2-{_DOMP_MAX_LAG} "
        "of the lag-k autocorrelation of each event_type's daily count "
        "series — 'what cycle length does this series actually have', "
        "the question the full ACF table (timeseries_acf) leaves to "
        "the reader and the Holt-Winters period constant hard-codes. "
        "Unlike the ACF query this does NOT call engine corr(): the "
        "correlation is rebuilt from EXACT INTEGER MOMENTS (n, Sx, Sy, "
        "Sxy, Sxx, Syy over paired integer counts — every sum exact in "
        "longs), so both engines produce the bit-identical double and "
        "the ARGMAX cannot flip on a last-ulp disagreement, which is "
        "precisely the failure mode an argmax over engine-float corr "
        "values would invite (id tiebreak on the lag for exact ties). "
        "Degenerate lags (constant series or < 3 pairs) are excluded "
        "from candidacy rather than scored NaN. Scale shape: one "
        "partial-agg shuffle to |type, day| rows, a bounded "
        f"{_DOMP_MAX_LAG - 1}-row-per-type lag replication, and "
        "windows over the per-type daily rollup — never the events."
    ),
)
def timeseries_dominant_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    ks = spark.range(2, _DOMP_MAX_LAG + 1).select(F.col("id").cast("int").alias("k"))
    rep = daily.crossJoin(F.broadcast(ks))
    w = Window.partitionBy("event_type", "k").orderBy("day")
    expr = F.when(F.col("k") == 2, F.lag("cnt", 2).over(w))
    for i in range(3, _DOMP_MAX_LAG + 1):
        expr = expr.when(F.col("k") == i, F.lag("cnt", i).over(w))
    lagged = rep.select(
        "event_type", "k", F.col("cnt").alias("x"), expr.alias("y")
    )
    paired = F.col("y").isNotNull()
    mom = lagged.groupBy("event_type", "k").agg(
        F.count("y").cast("long").alias("n"),
        F.sum(F.when(paired, F.col("x"))).cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.when(paired, F.col("x") * F.col("x"))).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    r = mom.filter(
        (F.col("n") >= 3) & (varx > 0) & (vary > 0)
    ).select(
        "event_type",
        "k",
        "n",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt(varx.cast("double") * vary)
        ).alias("acf"),
    )
    wr = Window.partitionBy("event_type").orderBy(F.desc("acf"), "k")
    return (
        r.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("k").cast("long").alias("dominant_lag"),
            F.round("acf", 6).alias("acf"),
            F.col("n").alias("n_pairs"),
        )
    )


# ---------------------------------------------------------------------------
# Round 12: STL-style loess trend decomposition and Cutler's RSI — the
# seasonal-trend family's local-regression member (timeseries_decompose_
# additive is the moving-average classical form) and the momentum
# oscillator, both built on the repo's exact-arithmetic contract.

_LOESS_H = 4  # tricube half-window: weights (h^3 - |d|^3)^3 for |d| < h.
# h=4 keeps every weighted moment and their cross products inside int64
# at sf1 daily-count magnitudes (max |numer| ~ 3e18 < 2^63).


@query(
    "timeseries_stl_loess",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    idx AS (
        SELECT event_type, day, y,
               CAST(day - DATE '1970-01-01' AS BIGINT) AS d
        FROM daily),
    pairs AS (
        SELECT a.event_type, a.day, a.y,
               b.d - a.d AS xo, b.y AS yj,
               (64 - abs(b.d - a.d) * abs(b.d - a.d) * abs(b.d - a.d))
               * (64 - abs(b.d - a.d) * abs(b.d - a.d) * abs(b.d - a.d))
               * (64 - abs(b.d - a.d) * abs(b.d - a.d) * abs(b.d - a.d)) AS u
        FROM idx a JOIN idx b
          ON a.event_type = b.event_type
         AND abs(b.d - a.d) <= {_LOESS_H - 1}),
    mom AS (
        SELECT event_type, day, y,
               CAST(sum(u) AS BIGINT) AS sw,
               CAST(sum(u * xo) AS BIGINT) AS sx,
               CAST(sum(u * yj) AS BIGINT) AS sy,
               CAST(sum(u * xo * xo) AS BIGINT) AS sxx,
               CAST(sum(u * xo * yj) AS BIGINT) AS sxy
        FROM pairs GROUP BY 1, 2, 3),
    tr AS (
        SELECT event_type, day, y,
               round(CASE WHEN sw * sxx - sx * sx = 0
                          THEN CAST(y AS DOUBLE)
                          ELSE CAST(sxx * sy - sx * sxy AS DOUBLE)
                               / CAST(sw * sxx - sx * sx AS DOUBLE) END,
                     6) AS trend
        FROM mom),
    det AS (
        SELECT event_type, day, y, trend,
               CAST(round((y - trend) * 1000000) AS BIGINT) AS dm
        FROM tr),
    seas AS (
        SELECT event_type, day, y, trend,
               CAST(sum(dm) OVER (PARTITION BY event_type, dayofweek(day))
                    AS BIGINT) AS sdm,
               CAST(count(*) OVER (PARTITION BY event_type, dayofweek(day))
                    AS BIGINT) AS k
        FROM det)
    SELECT event_type, day, CAST(y AS BIGINT) AS n_events, trend,
           round(CAST(sdm AS DOUBLE) / (CAST(k AS DOUBLE) * 1000000.0), 6)
               AS seasonal,
           round(y - trend
                 - CAST(sdm AS DOUBLE) / (CAST(k AS DOUBLE) * 1000000.0), 6)
               AS remainder
    FROM seas
    """,
    doc=(
        "STL-style decomposition with a LOESS trend — the "
        "local-regression member of the seasonal family "
        "(timeseries_decompose_additive is the classical moving-average "
        "form; loess is what distinguishes STL, Cleveland et al. 1990): "
        "per (event_type, day), fit a tricube-weighted local LINE over "
        f"the +/-{_LOESS_H - 1}-day neighborhood and take its value at "
        "the center — unlike a centered mean, the local line does not "
        "flatten ramps or lag turning points, and it degrades "
        "gracefully at series edges (asymmetric neighborhoods just fit "
        "on what exists). Exact-arithmetic contract end to end: y is a "
        "daily COUNT (integer), tricube weights (h^3-|d|^3)^3 on "
        "integer day offsets are exact integers, every weighted moment "
        "(Sw, Sx, Sy, Sxx, Sxy) is an integer sum, and the fitted "
        "value (Sxx*Sy - Sx*Sxy)/(Sw*Sxx - Sx^2) is ONE deterministic "
        "IEEE division of two exact int64s (h=4 sizes all cross "
        "products inside int64 at sf1; single-day degenerate series "
        "fall back to trend=y). The weekday seasonal means are exact "
        "too: detrended values snap to 1e-6-scaled integers before the "
        "order-independent integer sum, one division per weekday — the "
        "exact-integer-moments rule applied to a decomposition. Scale "
        "shape: one bounded rollup, a +/-3-day self-join on the "
        "(type, day) rollup (equi on type; O(7) matches per row "
        "regardless of raw-event scale), and weekday windows sharing "
        "the type exchange — raw events are touched exactly once."
    ),
)
def timeseries_stl_loess(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    idx = daily.withColumn(
        "d", F.datediff("day", F.lit("1970-01-01")).cast("long")
    )
    a, b = idx.alias("a"), idx.alias("b")
    xo = F.col("b.d") - F.col("a.d")
    c = 64 - F.abs(xo) * F.abs(xo) * F.abs(xo)
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.abs(F.col("b.d") - F.col("a.d")) <= _LOESS_H - 1),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day").alias("day"),
            F.col("a.y").alias("y"),
            xo.alias("xo"),
            F.col("b.y").alias("yj"),
            (c * c * c).alias("u"),
        )
    )
    mom = pairs.groupBy("event_type", "day", "y").agg(
        F.sum("u").cast("long").alias("sw"),
        F.sum(F.col("u") * F.col("xo")).cast("long").alias("sx"),
        F.sum(F.col("u") * F.col("yj")).cast("long").alias("sy"),
        F.sum(F.col("u") * F.col("xo") * F.col("xo")).cast("long").alias("sxx"),
        F.sum(F.col("u") * F.col("xo") * F.col("yj")).cast("long").alias("sxy"),
    )
    denom = F.col("sw") * F.col("sxx") - F.col("sx") * F.col("sx")
    numer = F.col("sxx") * F.col("sy") - F.col("sx") * F.col("sxy")
    tr = mom.select(
        "event_type",
        "day",
        "y",
        F.round(
            F.when(denom == 0, F.col("y").cast("double")).otherwise(
                numer.cast("double") / denom.cast("double")
            ),
            6,
        ).alias("trend"),
    )
    det = tr.withColumn(
        "dm", F.round((F.col("y") - F.col("trend")) * 1000000).cast("long")
    )
    wd = Window.partitionBy("event_type", F.dayofweek("day"))
    seas = det.select(
        "event_type",
        "day",
        "y",
        "trend",
        F.sum("dm").over(wd).cast("long").alias("sdm"),
        F.count(F.lit(1)).over(wd).cast("long").alias("k"),
    )
    seasonal = F.col("sdm").cast("double") / (F.col("k").cast("double") * 1000000.0)
    return seas.select(
        "event_type",
        "day",
        F.col("y").cast("long").alias("n_events"),
        "trend",
        F.round(seasonal, 6).alias("seasonal"),
        F.round(F.col("y") - F.col("trend") - seasonal, 6).alias("remainder"),
    )


_RSI_N = 14  # Cutler's RSI lookback: a simple (not Wilder-smoothed) mean,
# so gains/losses are plain window sums — exact integers on count series.


@query(
    "timeseries_rsi_cutler",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    diffs AS (
        SELECT event_type, day, y,
               y - lag(y) OVER (PARTITION BY event_type ORDER BY day) AS dy
        FROM daily),
    sums AS (
        SELECT event_type, day, y, dy,
               CAST(sum(CASE WHEN dy > 0 THEN dy ELSE 0 END) OVER w AS BIGINT)
                   AS gain,
               CAST(sum(CASE WHEN dy < 0 THEN -dy ELSE 0 END) OVER w AS BIGINT)
                   AS loss,
               CAST(count(dy) OVER w AS BIGINT) AS n_diffs
        FROM diffs
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN {_RSI_N - 1} PRECEDING AND CURRENT ROW))
    SELECT event_type, day, CAST(y AS BIGINT) AS n_events,
           CAST(dy AS BIGINT) AS diff, gain, loss,
           round(CASE WHEN gain + loss = 0 THEN 50.0
                 ELSE 100.0 * CAST(gain AS DOUBLE)
                      / CAST(gain + loss AS DOUBLE) END, 6) AS rsi,
           100 * gain > 70 * (gain + loss) AS overbought,
           100 * gain < 30 * (gain + loss) AS oversold
    FROM sums
    WHERE n_diffs = {_RSI_N}
    """,
    doc=(
        "Cutler's RSI (relative strength index) over per-type daily "
        "activity: gains and losses are window SUMS of the positive/"
        f"negative day-over-day deltas across the last {_RSI_N} diffs, "
        "RSI = 100*G/(G+L). Cutler's simple-mean variant is chosen "
        "over Wilder's exponential smoothing deliberately: on an "
        "integer count series the deltas, gains and losses are EXACT "
        "integers, RSI is one deterministic IEEE division, and — the "
        "exact-integer-moments rule — the overbought/oversold DECISION "
        "booleans are pure integer comparisons (100*G vs 70*(G+L)), "
        "immune to float representation at the 70/30 thresholds where "
        "Wilder's recursive float smoothing could flip a boundary "
        "case. Flat windows (G+L=0) define RSI as the neutral 50. "
        "Rows emit only with a full lookback (n_diffs = 14), so the "
        "warm-up period never fabricates momentum. Scale shape: the "
        "bounded daily rollup first (raw events touched once, map-side "
        "combined), then lag + two frame sums sharing one event_type "
        "exchange — O(days) rows per type at any raw scale."
    ),
)
def timeseries_rsi_cutler(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    wo = Window.partitionBy("event_type").orderBy("day")
    diffs = daily.withColumn("dy", F.col("y") - F.lag("y").over(wo))
    wf = wo.rowsBetween(-(_RSI_N - 1), 0)
    sums = diffs.select(
        "event_type",
        "day",
        "y",
        "dy",
        F.sum(F.when(F.col("dy") > 0, F.col("dy")).otherwise(0))
        .over(wf)
        .cast("long")
        .alias("gain"),
        F.sum(F.when(F.col("dy") < 0, -F.col("dy")).otherwise(0))
        .over(wf)
        .cast("long")
        .alias("loss"),
        F.count("dy").over(wf).cast("long").alias("n_diffs"),
    )
    rsi = F.when(F.col("gain") + F.col("loss") == 0, F.lit(50.0)).otherwise(
        100.0
        * F.col("gain").cast("double")
        / (F.col("gain") + F.col("loss")).cast("double")
    )
    return sums.filter(F.col("n_diffs") == _RSI_N).select(
        "event_type",
        "day",
        F.col("y").cast("long").alias("n_events"),
        F.col("dy").cast("long").alias("diff"),
        "gain",
        "loss",
        F.round(rsi, 6).alias("rsi"),
        (100 * F.col("gain") > 70 * (F.col("gain") + F.col("loss"))).alias(
            "overbought"
        ),
        (100 * F.col("gain") < 30 * (F.col("gain") + F.col("loss"))).alias(
            "oversold"
        ),
    )
