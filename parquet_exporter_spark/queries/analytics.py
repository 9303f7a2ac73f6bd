"""Product-analytics query shapes over the events table: funnels and
cohort retention — the standard sessionized-event workloads an analytics
engine is judged on (the reference has no event surface; SURVEY.md
section 2.2 extension).

Scale notes: both queries reduce the fact table to per-user aggregates
first (one shuffle on user_id, map-side partial min/distinct), so every
later join touches at most |users| rows — at 100 TB of events the
user dimension is what shuffles, never the raw stream. The funnel's
final counts are three 1-row aggregates cross-joined driver-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table


@query(
    "funnel_three_step",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
        WHERE e.event_type = 'click' GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
        WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_after_view,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_after_click
    """,
    doc=(
        "Ordered three-step funnel (view -> click -> purchase): each stage "
        "keeps users whose stage event happens strictly AFTER their "
        "previous stage's first event — order matters, not mere "
        "co-occurrence. Stages are per-user min-timestamp aggregates, so "
        "each step joins user-cardinality tables."
    ),
)
def funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_after(stage: str, prev: DataFrame, prev_ts: str, out_ts: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == stage)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = first_after("click", v, "t_view", "t_click")
    p = first_after("purchase", c.select("user_id", "t_click"), "t_click", "t_purchase")
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_click")))
    )


@query(
    "cohort_retention",
    oracle="""
    WITH first AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort
        FROM events GROUP BY 1
    ),
    act AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort, a.wk) // 7 AS INT) AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM first f JOIN act a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
    doc=(
        "Weekly cohort retention: users grouped by first-activity week, "
        "counted distinct in each later week. Both inputs are per-user "
        "reductions (first week, distinct active weeks), so the retention "
        "join is users x ~weeks rows — the raw event stream shuffles "
        "exactly once. Week starts are Monday-truncated in both engines; "
        "the offset divides an exact multiple of 7 days."
    ),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        first.join(act, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "outlier_mad",
    oracle="""
    WITH med AS (
        SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_id, e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type,
           round(0.6745 * (d.value - d.med) / m.mad, 6) AS robust_z
    FROM dev d JOIN mad m USING (event_type)
    WHERE abs(round(0.6745 * (d.value - d.med) / m.mad, 6)) > 3.5
    """,
    doc=(
        "Robust outlier detection via Median Absolute Deviation "
        "(Iglewicz-Hoaglin modified z-score, |0.6745*(x-med)/MAD| > 3.5) "
        "— unlike mean/stddev z-scores (outlier_zscore), the cutoff "
        "itself is not dragged by the outliers it hunts. Both medians "
        "are rounded before reuse so downstream arithmetic is "
        "engine-exact. Shape: two tiny per-type aggregates (exact "
        "percentile; at 100 TB swap approx_percentile) broadcast back "
        "onto the stream — the fact table never shuffles."
    ),
)
def outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.percentile("adev", F.lit(0.5)), 6).alias("mad")
    )
    z = F.round(0.6745 * (F.col("value") - F.col("med")) / F.col("mad"), 6)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select("event_id", "event_type", z.alias("robust_z"))
        .filter(F.abs(F.col("robust_z")) > 3.5)
    )


@query(
    "ab_test_proportions",
    oracle="""
    WITH assigned AS (
        SELECT user_id, user_id % 2 AS variant,
               CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       > sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT CAST(count(*) FILTER (variant = 0) AS BIGINT) AS n_a,
               CAST(sum(converted) FILTER (variant = 0) AS BIGINT) AS conv_a,
               CAST(count(*) FILTER (variant = 1) AS BIGINT) AS n_b,
               CAST(sum(converted) FILTER (variant = 1) AS BIGINT) AS conv_b
        FROM assigned
    )
    SELECT n_a, conv_a, round(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a,
           n_b, conv_b, round(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b,
           round((conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
                 / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                        * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                        * (1.0 / n_a + 1.0 / n_b)), 4) AS z_score
    FROM arms
    """,
    doc=(
        "A/B test analysis: deterministic hash-bucket variant assignment "
        "(user_id parity), per-arm user counts and conversion rates "
        "(converted = more purchases than errors), and the pooled "
        "two-proportion z statistic — the "
        "experimentation readout every event pipeline serves. Two "
        "aggregation levels: a per-user conversion flag (one shuffle on "
        "user_id, map-side partial max) collapsed into a single "
        "FILTER-clause aggregate row; the z arithmetic is a scalar "
        "projection over that 1-row result, so the fact table is "
        "scanned once and shuffled once regardless of scale."
    ),
)
def ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    # conversion = strictly more purchase than error events for the user
    # (a has-any-purchase flag saturates at 100% on this event density)
    assigned = events.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            > F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        ).cast("int").alias("converted")
    ).select((F.col("user_id") % 2).alias("variant"), "converted")
    arms = assigned.agg(
        F.count(F.when(F.col("variant") == 0, F.lit(1))).alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted"))).alias("conv_a"),
        F.count(F.when(F.col("variant") == 1, F.lit(1))).alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted"))).alias("conv_b"),
    )
    rate_a = F.col("conv_a") / F.col("n_a").cast("double")
    rate_b = F.col("conv_b") / F.col("n_b").cast("double")
    pooled = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (rate_a - rate_b) / F.sqrt(
        pooled * (1 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return arms.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("conv_a").cast("long").alias("conv_a"),
        F.round(rate_a, 6).alias("rate_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("conv_b").cast("long").alias("conv_b"),
        F.round(rate_b, 6).alias("rate_b"),
        F.round(z, 4).alias("z_score"),
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        FROM events
    )
    SELECT from_type, to_type,
           CAST(count(*) AS BIGINT) AS n_transitions,
           round(count(*) / CAST(sum(count(*)) OVER (PARTITION BY from_type)
                 AS DOUBLE), 6) AS p_transition
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
    doc=(
        "Clickstream transition matrix: counts and row-normalized "
        "probabilities of ADJACENT event-type transitions per user "
        "stream — the first-order Markov model behind 'what do users do "
        "right after X' product analytics and the strict-adjacency "
        "complement of funnel_three_step's loose ordering. One user-"
        "keyed exchange for the lead() sequencing, then a partial-agg'd "
        "(from, to) aggregate whose cardinality is |types|^2; the "
        "normalizing window runs over those aggregate rows, never the "
        "event stream. The same shape at 100 TB feeds session-path "
        "mining (N-gram transitions = longer lead chains)."
    ),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_norm = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(w_norm).cast("double"),
            6,
        ).alias("p_transition"),
    )


@query(
    "event_longest_streak",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             - row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS island
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type, island, count(*) AS run_len
        FROM seq GROUP BY user_id, event_type, island
    )
    SELECT user_id, event_type AS streak_type,
           CAST(run_len AS BIGINT) AS longest_streak
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id
            ORDER BY run_len DESC, event_type, island) AS rn
        FROM runs
    ) WHERE rn = 1
    """,
    doc=(
        "Longest same-type streak per user: the VALUE-streak variant of "
        "gaps-and-islands (sessionize_gaps_islands islands by time gap; "
        "this islands by consecutive equal values via the classic "
        "rn - rn_per_value difference). Deterministic winner: longest "
        "run, then type, then island position. One user-keyed exchange "
        "serves both row_number passes, the run aggregate, and the "
        "final per-user WindowGroupLimit cut — island ids are "
        "partition-local arithmetic, so nothing reshuffles."
    ),
)
def event_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("island"),
    )
    runs = seq.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    w_pick = Window.partitionBy("user_id").orderBy(
        F.col("run_len").desc(), "event_type", "island"
    )
    return (
        runs.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("streak_type"),
            F.col("run_len").cast("long").alias("longest_streak"),
        )
    )


@query(
    "analytics_rfm_segmentation",
    oracle="""
    WITH base AS (
        SELECT o_custkey AS custkey,
               date_diff('day', CAST(max(o_orderdate) AS DATE),
                         (SELECT CAST(max(o_orderdate) AS DATE) FROM orders)) AS recency_days,
               count(*) AS frequency,
               round(sum(o_totalprice), 2) AS monetary
        FROM orders GROUP BY 1
    )
    SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency, monetary,
           CAST(ntile(5) OVER (ORDER BY recency_days, custkey) AS INTEGER) AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency DESC, custkey) AS INTEGER) AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary DESC, custkey) AS INTEGER) AS m_score
    FROM base
    """,
    doc=(
        "RFM customer segmentation: per-customer recency (days since last "
        "order vs the corpus max date), frequency (order count), monetary "
        "(total spend), each scored into quintiles by ntile(5) with a "
        "custkey tie-break so the quintile boundaries are deterministic. "
        "The fact table reduces to |customers| rows in one keyed shuffle "
        "before any window runs; the three global ntile windows sort the "
        "customer summary, not the orders — at 100 TB the single-partition "
        "window is over the bounded dimension, and the standard scale-out "
        "is percentile-bucket scores (width_bucket over approx quantiles) "
        "which drops the global sort entirely."
    ),
)
def analytics_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    corpus_max = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("corpus_max"))
    base = base.join(F.broadcast(corpus_max)).withColumn(
        "recency_days", F.datediff("corpus_max", "last_order").cast("long")
    )
    return base.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5).over(Window.orderBy("recency_days", "custkey")).alias("r_score"),
        F.ntile(5).over(Window.orderBy(F.col("frequency").desc(), "custkey")).alias("f_score"),
        F.ntile(5).over(Window.orderBy(F.col("monetary").desc(), "custkey")).alias("m_score"),
    )


@query(
    "analytics_pareto_share",
    oracle="""
    WITH rev AS (
        SELECT o_custkey AS custkey, round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1
    ), tot AS (SELECT sum(revenue) AS total FROM rev)
    SELECT custkey, revenue,
           CAST(row_number() OVER (ORDER BY revenue DESC, custkey) AS BIGINT) AS rnk,
           round(sum(revenue) OVER (ORDER BY revenue DESC, custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / total, 6) AS cum_share,
           (sum(revenue) OVER (ORDER BY revenue DESC, custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - revenue)
                < 0.8 * total AS in_top80
    FROM rev, tot
    """,
    doc=(
        "Pareto (80/20) revenue concentration: customers ranked by "
        "revenue, running cumulative share, and an in_top80 flag marking "
        "the smallest prefix of customers covering 80% of revenue (a "
        "customer is in the head while the share BEFORE it is under 0.8, "
        "so the flag flips exactly once). The cumulative window runs in "
        "identical (revenue DESC, custkey) frame order on both engines, "
        "so the float partial sums add in the same sequence. Input to the "
        "window is the per-customer aggregate (one keyed shuffle); the "
        "global ordered window is over the bounded customer dimension."
    ),
)
def analytics_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    rev = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    tot = rev.agg(F.sum("revenue").alias("total"))
    w = Window.orderBy(F.col("revenue").desc(), "custkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        rev.join(F.broadcast(tot))
        .withColumn("cum_rev", F.sum("revenue").over(w))
        .select(
            "custkey",
            "revenue",
            F.row_number()
            .over(Window.orderBy(F.col("revenue").desc(), "custkey"))
            .cast("long")
            .alias("rnk"),
            F.round(F.col("cum_rev") / F.col("total"), 6).alias("cum_share"),
            ((F.col("cum_rev") - F.col("revenue")) < 0.8 * F.col("total")).alias("in_top80"),
        )
    )


@query(
    "analytics_market_basket",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
    ), n AS (SELECT count(DISTINCT okey) AS n_orders FROM items),
    cnt AS (SELECT part, count(*) AS part_n FROM items GROUP BY 1),
    pairs AS (
        SELECT a.part AS part_a, b.part AS part_b, count(*) AS pair_n
        FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
        GROUP BY 1, 2
    )
    SELECT part_a, part_b, CAST(pair_n AS BIGINT) AS pair_n,
           round(pair_n * n_orders / (ca.part_n * CAST(cb.part_n AS DOUBLE)), 6) AS lift
    FROM pairs
    JOIN cnt ca ON ca.part = part_a
    JOIN cnt cb ON cb.part = part_b, n
    WHERE pair_n >= 2
    """,
    doc=(
        "Market-basket pair mining: support count and lift for part pairs "
        "co-occurring in an order (support >= 2). The self-join is keyed "
        "on the order id, so the blow-up is bounded per basket (k items "
        "-> k(k-1)/2 pairs within one partition's rows), never a global "
        "cross product; at 100 TB the standard guard is capping basket "
        "size (huge baskets are degenerate for lift anyway) and the "
        "item-count side joins broadcast. Lift = P(ab)/(P(a)P(b)) on the "
        "distinct-basket event space."
    ),
)
def analytics_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    ).distinct()
    n = items.agg(F.countDistinct("okey").alias("n_orders"))
    cnt = items.groupBy("part").agg(F.count(F.lit(1)).alias("part_n"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.part") < F.col("b.part")))
        .groupBy(F.col("a.part").alias("part_a"), F.col("b.part").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= 2)
    )
    return (
        pairs.join(
            F.broadcast(cnt).withColumnRenamed("part", "part_a").withColumnRenamed("part_n", "n_a"),
            "part_a",
        )
        .join(
            F.broadcast(cnt).withColumnRenamed("part", "part_b").withColumnRenamed("part_n", "n_b"),
            "part_b",
        )
        .join(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("pair_n").cast("long").alias("pair_n"),
            F.round(
                F.col("pair_n") * F.col("n_orders") / (F.col("n_a") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "analytics_event_paths",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt1,
               lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt2
        FROM events
    )
    SELECT event_type || '>' || nxt1 || '>' || nxt2 AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE nxt2 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 10
    """,
    doc=(
        "Top event-type trigram paths (path mining): per-user ordered "
        "lead(1)/lead(2) windows build every 3-step path, then a global "
        "count + top-10. Both leads share one user-keyed sort-window "
        "partitioning (single exchange); path cardinality is bounded by "
        "|event_type|^3, so the final aggregate is tiny and the top-10 "
        "is TakeOrdered, not a global sort."
    ),
)
def analytics_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("nxt1"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    ).filter(F.col("nxt2").isNotNull())
    return (
        seq.select(F.concat_ws(">", "event_type", "nxt1", "nxt2").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


@query(
    "analytics_repeat_purchase_interval",
    oracle="""
    WITH p AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(avg(epoch_us(ts) - epoch_us(prev_ts)) / 3600e6, 6) AS avg_gap_hours
    FROM p GROUP BY 1 HAVING count(*) >= 2
    """,
    doc=(
        "Repeat-purchase cadence: mean hours between consecutive "
        "purchases per returning user (lag over the per-user purchase "
        "sequence, averaged in exact integer microseconds before the "
        "single float division). The event_type filter is pushed to the "
        "scan, and the window + aggregate share the user key — one "
        "exchange over purchases only, not the full stream."
    ),
)
def analytics_repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select("user_id", "ts", F.lag("ts").over(w).alias("prev_ts"))
    return (
        p.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.round(
                F.avg(F.unix_micros("ts") - F.unix_micros("prev_ts")) / 3600e6, 6
            ).alias("avg_gap_hours"),
        )
        .filter(F.col("n_purchases") >= 2)
    )


@query(
    "analytics_gini_revenue",
    oracle="""
    WITH rev AS (
        SELECT o_custkey AS custkey, round(sum(o_totalprice), 2) AS x
        FROM orders GROUP BY 1
    ), ranked AS (
        SELECT x, row_number() OVER (ORDER BY x, custkey) AS i,
               count(*) OVER () AS n, sum(x) OVER () AS sx
        FROM rev
    )
    SELECT round(2.0 * sum(i * x) / (max(n) * max(sx)) - (max(n) + 1.0) / max(n), 6)
               AS gini,
           CAST(max(n) AS BIGINT) AS n_customers
    FROM ranked
    """,
    doc=(
        "Gini coefficient of revenue concentration via the rank identity "
        "G = 2*sum(i*x_i)/(n*sum x) - (n+1)/n over ascending-sorted "
        "spend (custkey tie-break makes the rank deterministic). The "
        "global rank window runs over the bounded per-customer "
        "aggregate; the identity needs one ordered pass, not pairwise "
        "differences."
    ),
)
def analytics_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    rev = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("x")
    )
    w = Window.orderBy("x", "custkey")
    ranked = rev.select(
        "x",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.sum("x").over(Window.partitionBy()).alias("sx"),
    )
    return ranked.agg(
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x")) / (F.max("n") * F.max("sx"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
        F.max("n").cast("long").alias("n_customers"),
    )


@query(
    "analytics_new_vs_returning",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS first_day
        FROM events GROUP BY 1
    ), daily AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    )
    SELECT d.day,
           CAST(count(*) FILTER (WHERE d.day = f.first_day) AS BIGINT) AS new_users,
           CAST(count(*) FILTER (WHERE d.day > f.first_day) AS BIGINT) AS returning_users
    FROM daily d JOIN first_seen f ON f.user_id = d.user_id
    GROUP BY 1
    """,
    doc=(
        "New-vs-returning daily actives: each (user, day) active pair is "
        "classified against the user's first-seen day — the growth "
        "dashboard's headline split. Both the first-seen aggregate and "
        "the distinct actives shuffle once on user_id (shared key, "
        "co-partitioned join); the final rollup is bounded by days."
    ),
)
def analytics_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    first_seen = ev.groupBy("user_id").agg(F.min(day).alias("first_day"))
    daily = ev.select("user_id", day.alias("day")).distinct()
    j = daily.join(first_seen, "user_id")
    return j.groupBy("day").agg(
        F.count(F.when(F.col("day") == F.col("first_day"), 1)).cast("long").alias("new_users"),
        F.count(F.when(F.col("day") > F.col("first_day"), 1))
        .cast("long")
        .alias("returning_users"),
    )


@query(
    "analytics_cohort_ltv",
    oracle="""
    WITH first_p AS (
        SELECT user_id, CAST(date_trunc('month', min(ts)) AS DATE) AS cohort_month
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), monthly AS (
        SELECT f.cohort_month,
               date_diff('month', f.cohort_month, CAST(date_trunc('month', e.ts) AS DATE))
                   AS age_months,
               sum(e.value) AS rev
        FROM events e JOIN first_p f ON f.user_id = e.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2
    )
    SELECT cohort_month, CAST(age_months AS INTEGER) AS age_months,
           round(sum(rev) OVER (PARTITION BY cohort_month ORDER BY age_months), 2)
               AS cum_revenue
    FROM monthly
    """,
    doc=(
        "Cohort LTV curves: cumulative purchase revenue by (first-"
        "purchase-month cohort, months-since-first) — the lifetime-value "
        "readout stacked on top of cohort_retention's shape. The "
        "purchase filter is pushed to the scan, the cohort join is "
        "user-keyed, and the cumulative window runs over the bounded "
        "(cohort x age) aggregate."
    ),
)
def analytics_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    month = F.date_trunc("month", "ts").cast("date")
    first_p = ev.groupBy("user_id").agg(F.min(month).alias("cohort_month"))
    joined = ev.join(first_p, "user_id").select(
        "cohort_month",
        (
            (F.year(month) - F.year("cohort_month")) * 12
            + (F.month(month) - F.month("cohort_month"))
        ).alias("age_months"),
        "value",
    )
    monthly = joined.groupBy("cohort_month", "age_months").agg(F.sum("value").alias("rev"))
    w = Window.partitionBy("cohort_month").orderBy("age_months")
    return monthly.select(
        "cohort_month",
        F.col("age_months").cast("int").alias("age_months"),
        F.round(F.sum("rev").over(w), 2).alias("cum_revenue"),
    )


@query(
    "analytics_monthly_churn",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id, CAST(date_trunc('month', ts) AS DATE) AS month
        FROM events
    ), months AS (SELECT max(month) AS last_month FROM act)
    SELECT a.month,
           CAST(count(*) AS BIGINT) AS active_users,
           CAST(count(*) FILTER (WHERE b.user_id IS NULL) AS BIGINT) AS churned_next_month,
           round(count(*) FILTER (WHERE b.user_id IS NULL) / CAST(count(*) AS DOUBLE), 6)
               AS churn_rate
    FROM act a
    LEFT JOIN act b
      ON b.user_id = a.user_id
     AND b.month = CAST(a.month + INTERVAL 1 MONTH AS DATE)
    CROSS JOIN months
    WHERE a.month < last_month
    GROUP BY a.month
    """,
    doc=(
        "Month-over-month churn: a user active in month m churns if "
        "absent in m+1 (the final month has no verdict and is excluded). "
        "Spelled as a self left-join of the distinct (user, month) "
        "activity table against itself shifted one month (add_months on "
        "the build side, so the join stays equi on (user, month)); both "
        "sides share the user-keyed distinct aggregate."
    ),
)
def analytics_monthly_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("month", "ts").cast("date").alias("month")
    ).distinct()
    last = act.agg(F.max("month").alias("last_month"))
    a = act.alias("a")
    b = act.select(
        F.col("user_id").alias("b_user"), F.add_months(F.col("month"), -1).alias("b_prev_month")
    ).alias("b")
    j = a.join(
        b,
        (F.col("a.user_id") == F.col("b_user")) & (F.col("a.month") == F.col("b_prev_month")),
        "left",
    )
    return (
        j.join(F.broadcast(last))
        .filter(F.col("a.month") < F.col("last_month"))
        .groupBy(F.col("a.month").alias("month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("active_users"),
            F.count(F.when(F.col("b_user").isNull(), 1)).cast("long").alias("churned_next_month"),
            F.round(
                F.count(F.when(F.col("b_user").isNull(), 1)) / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("churn_rate"),
        )
    )


@query(
    "analytics_weekly_churn",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    ), weeks AS (SELECT max(week) AS last_week FROM act)
    SELECT a.week,
           CAST(count(*) AS BIGINT) AS active_users,
           CAST(count(*) FILTER (WHERE b.user_id IS NULL) AS BIGINT) AS churned_next_week,
           round(count(*) FILTER (WHERE b.user_id IS NULL) / CAST(count(*) AS DOUBLE), 6)
               AS churn_rate
    FROM act a
    LEFT JOIN act b
      ON b.user_id = a.user_id
     AND b.week = CAST(a.week + INTERVAL 7 DAY AS DATE)
    CROSS JOIN weeks
    WHERE a.week < last_week
    GROUP BY a.week
    """,
    doc=(
        "Week-over-week churn: the monthly-churn shape on the ISO-week "
        "grain (date_trunc('week') is Monday-based in both engines, and "
        "week+7d is exact where month+1 needs add_months) — a user "
        "active in week w churns if absent in w+1; the final week has "
        "no verdict and is excluded. Registered alongside "
        "analytics_monthly_churn because churn at the week grain FIRES "
        "at sf0.01 (the 30-day test window holds ~4 verdict weeks but "
        "at most one month boundary, so the monthly query's driver "
        "stamp is structurally 0=0 there — round-10 verdict watch item; "
        "this variant gives the same operator a row-producing stamp at "
        "every SF). Same scale shape: the distinct (user, week) "
        "activity table is tiny next to events, the self-join is equi "
        "on (user, week), and the 1-row last-week bound broadcasts."
    ),
)
def analytics_weekly_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    last = act.agg(F.max("week").alias("last_week"))
    a = act.alias("a")
    b = act.select(
        F.col("user_id").alias("b_user"),
        F.date_sub(F.col("week"), 7).alias("b_prev_week"),
    ).alias("b")
    j = a.join(
        b,
        (F.col("a.user_id") == F.col("b_user"))
        & (F.col("a.week") == F.col("b_prev_week")),
        "left",
    )
    return (
        j.join(F.broadcast(last))
        .filter(F.col("a.week") < F.col("last_week"))
        .groupBy(F.col("a.week").alias("week"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("active_users"),
            F.count(F.when(F.col("b_user").isNull(), 1))
            .cast("long")
            .alias("churned_next_week"),
            F.round(
                F.count(F.when(F.col("b_user").isNull(), 1))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("churn_rate"),
        )
    )


@query(
    "analytics_order_value_deciles",
    oracle="""
    WITH d AS (
        SELECT o_totalprice,
               ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders
    )
    SELECT decile, CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi,
           round(avg(o_totalprice), 6) AS mean
    FROM d GROUP BY 1
    """,
    doc=(
        "Order-value decile table: ntile(10) bands with per-band "
        "count/min/max/mean — the distribution summary behind pricing "
        "reports. Deterministic tie-break on the key; the global ntile "
        "runs over orders (bounded relative to lineitem) and at 100 TB "
        "the same table comes from approx_percentile cut points + "
        "width_bucket with no global sort, as with the RFM scores."
    ),
)
def analytics_order_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    d = orders.select("o_totalprice", F.ntile(10).over(w).alias("decile"))
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
        F.round(F.avg("o_totalprice"), 6).alias("mean"),
    )


@query(
    "analytics_cumulative_users",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS first_day
        FROM events GROUP BY 1
    ), daily_new AS (
        SELECT first_day AS day, count(*) AS new_users FROM first_seen GROUP BY 1
    )
    SELECT day, CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cumulative_users
    FROM daily_new
    """,
    doc=(
        "Cumulative unique users (the growth curve): per-user first-seen "
        "day, daily new-user counts, running total. The cumulative "
        "distinct-count trap is avoided by construction — counting "
        "first-seen days IS the incremental form, so no day recounts "
        "any user; the only global window runs over the bounded "
        "day-count series."
    ),
)
def analytics_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    first_seen = ev.groupBy("user_id").agg(F.min(day).alias("first_day"))
    daily_new = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily_new.select(
        "day",
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


@query(
    "analytics_last_touch_attribution",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, event_type, ts,
               CASE WHEN event_type IN ('click', 'view') THEN event_id END AS touch_id,
               CASE WHEN event_type IN ('click', 'view') THEN event_type END AS touch_type,
               CASE WHEN event_type IN ('click', 'view') THEN ts END AS touch_ts
        FROM events
    ), attributed AS (
        SELECT user_id, event_id AS purchase_id, ts,
               last_value(touch_id IGNORE NULLS) OVER w AS touch_id,
               last_value(touch_type IGNORE NULLS) OVER w AS touch_type,
               last_value(touch_ts IGNORE NULLS) OVER w AS touch_ts
        FROM seq WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        QUALIFY event_type = 'purchase'
    )
    SELECT user_id, purchase_id, touch_id, touch_type,
           CAST((epoch_us(ts) - epoch_us(touch_ts)) // 60000000 AS BIGINT)
               AS minutes_since_touch
    FROM attributed
    WHERE touch_id IS NOT NULL
      AND epoch_us(ts) - epoch_us(touch_ts) <= CAST(604800000000 AS BIGINT)
    """,
    doc=(
        "Last-touch attribution: each purchase credits the most recent "
        "click/view strictly before it within a 7-day lookback — the "
        "default marketing-attribution model, spelled as last(ignorenulls) "
        "over a frame ending 1 PRECEDING (so a purchase can never credit "
        "itself or a simultaneous touch). One user-keyed window over the "
        "interleaved stream; no join, no per-purchase scan."
    ),
)
def analytics_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    is_touch = F.col("event_type").isin("click", "view")
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.when(is_touch, F.col("event_id")).alias("t_id"),
        F.when(is_touch, F.col("event_type")).alias("t_type"),
        F.when(is_touch, F.col("ts")).alias("t_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attributed = seq.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "event_type",
        "ts",
        F.last("t_id", ignorenulls=True).over(w).alias("touch_id"),
        F.last("t_type", ignorenulls=True).over(w).alias("touch_type"),
        F.last("t_ts", ignorenulls=True).over(w).alias("touch_ts"),
    ).filter(F.col("event_type") == "purchase")
    gap_us = F.unix_micros("ts") - F.unix_micros("touch_ts")
    return attributed.filter(
        F.col("touch_id").isNotNull() & (gap_us <= 7 * 86400 * 1000000)
    ).select(
        "user_id",
        "purchase_id",
        "touch_id",
        "touch_type",
        F.expr("(unix_micros(ts) - unix_micros(touch_ts)) div 60000000").alias(
            "minutes_since_touch"
        ),
    )


@query(
    "analytics_feature_adoption",
    oracle="""
    WITH u AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
    per_type AS (
        SELECT event_type, count(DISTINCT user_id) AS n_adopters
        FROM events GROUP BY 1
    )
    SELECT event_type, CAST(n_adopters AS BIGINT) AS n_adopters,
           round(n_adopters / CAST(n_users AS DOUBLE), 6) AS adoption_rate
    FROM per_type, u
    """,
    doc=(
        "Feature adoption: distinct users per event type over total "
        "distinct users — the feature-penetration matrix. Both distinct "
        "counts are exact two-phase aggregates (partial distinct "
        "map-side); the 1-row denominator broadcasts."
    ),
)
def analytics_feature_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    u = ev.agg(F.countDistinct("user_id").alias("n_users"))
    per_type = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_adopters"))
    return per_type.join(F.broadcast(u)).select(
        "event_type",
        F.col("n_adopters").cast("long").alias("n_adopters"),
        F.round(F.col("n_adopters") / F.col("n_users").cast("double"), 6).alias(
            "adoption_rate"
        ),
    )


@query(
    "analytics_ship_lag_monthly",
    oracle="""
    SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS order_month,
           CAST(count(*) AS BIGINT) AS n_items,
           round(avg(date_diff('day', CAST(o.o_orderdate AS DATE),
                               CAST(l.l_shipdate AS DATE))), 6) AS avg_ship_lag_days
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
    doc=(
        "Operational ship-lag trend: mean days from order to line-item "
        "ship date per order month — the fulfillment-latency KPI. "
        "Orderkey-keyed join (orders side broadcast-eligible), then a "
        "bounded month rollup; day difference computed on calendar "
        "dates so both engines count identically."
    ),
)
def analytics_ship_lag_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    return j.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.round(
            F.avg(
                F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
            ),
            6,
        ).alias("avg_ship_lag_days"),
    )


@query(
    "analytics_user_value_trend",
    oracle="""
    WITH base AS (
        SELECT user_id, value,
               epoch_us(ts) / 86400000000.0 AS t_days
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(regr_slope(value, t_days), 6) AS value_trend_per_day
    FROM base GROUP BY 1 HAVING count(*) >= 20
    """,
    doc=(
        "Per-user value trajectory: OLS slope of event value against "
        "time (days) for users with enough history — the engagement "
        "trend feature behind churn models. regr_slope is a single-pass "
        "co-moment aggregate, so this is one user-keyed shuffle however "
        "long the histories are."
    ),
)
def analytics_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "value", (F.unix_micros("ts") / 86400000000.0).alias("t_days")
    )
    return (
        base.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.regr_slope("value", "t_days"), 6).alias("value_trend_per_day"),
        )
        .filter(F.col("n_events") >= 20)
    )


@query(
    "analytics_order_backlog",
    oracle="""
    WITH per_order AS (
        SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS placed,
               CAST(max(l.l_shipdate) AS DATE) AS done
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ), deltas AS (
        SELECT placed AS day, count(*) AS delta FROM per_order GROUP BY 1
        UNION ALL
        SELECT done, -count(*) FROM per_order GROUP BY done
    ), daily AS (
        SELECT day, sum(delta) AS net FROM deltas GROUP BY 1
    )
    SELECT day, CAST(net AS BIGINT) AS net_change,
           CAST(sum(net) OVER (ORDER BY day) AS BIGINT) AS open_orders
    FROM daily
    """,
    doc=(
        "Open-order backlog curve via the sweep-line (+1 at placement, "
        "-1 at final ship) — the interval-counting identity that turns "
        "'how many orders were open each day' from a day x order range "
        "join into two aggregates and one cumulative sum over the "
        "bounded day series. The per-order rollup shuffles on the order "
        "key once."
    ),
)
def analytics_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    per_order = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("placed"))
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("done"))
    )
    plus = per_order.groupBy(F.col("placed").alias("day")).agg(
        F.count(F.lit(1)).alias("delta")
    )
    minus = per_order.groupBy(F.col("done").alias("day")).agg(
        (-F.count(F.lit(1))).alias("delta")
    )
    daily = plus.unionAll(minus).groupBy("day").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        F.col("net").cast("long").alias("net_change"),
        F.sum("net").over(w).cast("long").alias("open_orders"),
    )


@query(
    "analytics_session_conversion",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, event_type, ts,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id) > 300000000
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sess AS (
        SELECT user_id, event_id, event_type, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        FROM flagged
    ), per_sess AS (
        SELECT user_id, session_no,
               min(ts) FILTER (WHERE event_type = 'view') AS t_view,
               min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
        FROM sess GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(*) FILTER (WHERE t_view IS NOT NULL) AS BIGINT) AS n_with_view,
           CAST(count(*) FILTER (WHERE t_view IS NOT NULL AND t_purchase > t_view)
                AS BIGINT) AS n_converted,
           round(count(*) FILTER (WHERE t_view IS NOT NULL AND t_purchase > t_view)
                 / CAST(nullif(count(*) FILTER (WHERE t_view IS NOT NULL), 0) AS DOUBLE), 6)
               AS view_to_purchase_rate
    FROM per_sess
    """,
    doc=(
        "Sessionized conversion: the 5-minute gaps-and-islands "
        "sessionization (sessionize_gaps_islands' machinery) composed "
        "with an ordered view->purchase check WITHIN each session — "
        "conversion measured at session granularity, where funnels are "
        "actually reported. One user-keyed window stack + a session "
        "aggregate + a 1-row verdict."
    ),
)
def analytics_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 300000000), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_sess = sess.groupBy("user_id", "session_no").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    has_view = F.col("t_view").isNotNull()
    converted = has_view & (F.col("t_purchase") > F.col("t_view"))
    return per_sess.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.count(F.when(has_view, 1)).cast("long").alias("n_with_view"),
        F.count(F.when(converted, 1)).cast("long").alias("n_converted"),
        F.round(
            F.count(F.when(converted, 1))
            / F.nullif(F.count(F.when(has_view, 1)), F.lit(0)).cast("double"),
            6,
        ).alias("view_to_purchase_rate"),
    )


@query(
    "analytics_top_movers",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(value), 2) AS v
        FROM events GROUP BY 1, 2
    ), diffs AS (
        SELECT event_type, day, v,
               round(v - lag(v) OVER (PARTITION BY event_type ORDER BY day), 2) AS delta
        FROM daily
    )
    SELECT event_type, day, v, delta
    FROM diffs WHERE delta IS NOT NULL
    ORDER BY abs(delta) DESC, event_type, day LIMIT 5
    """,
    doc=(
        "Top movers: the 5 largest day-over-day absolute swings across "
        "all series — the 'what changed most' alert feed. Lag windows "
        "over the bounded daily rollup; the global top-5 is TakeOrdered "
        "on |series x days| rows, never the raw events."
    ),
)
def analytics_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    diffs = daily.withColumn("delta", F.round(F.col("v") - F.lag("v").over(w), 2))
    return (
        diffs.filter(F.col("delta").isNotNull())
        .orderBy(F.abs("delta").desc(), "event_type", "day")
        .limit(5)
    )


@query(
    "analytics_activity_heatmap",
    oracle="""
    SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
           CAST(hour(ts) AS INTEGER) AS hr,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc=(
        "Activity heatmap: the (day-of-week x hour) count/value matrix "
        "in long form — the usage-pattern grid every product dashboard "
        "opens with. One partial-agg scan to at most 168 rows; dow "
        "numbering pinned cross-engine (+1 in the oracle)."
    ),
)
def analytics_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hr")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "analytics_dau_wau_stickiness",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ), days AS (SELECT DISTINCT day FROM ud),
    dau AS (
        SELECT day, count(*) AS dau FROM ud GROUP BY 1
    ), wau AS (
        SELECT d.day, count(DISTINCT u.user_id) AS wau
        FROM days d JOIN ud u
          ON u.day <= d.day AND u.day > d.day - INTERVAL 7 DAY
        GROUP BY 1
    )
    SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
           round(dau.dau / CAST(wau.wau AS DOUBLE), 6) AS stickiness
    FROM dau JOIN wau ON wau.day = dau.day
    """,
    doc=(
        "DAU/WAU stickiness: daily actives over trailing-7-day actives "
        "— the engagement-frequency ratio product teams steer by. The "
        "rolling distinct count (not window-expressible) is rewritten "
        "as a BOUNDED replication: each (user, day) activity explodes "
        "to the <=7 report days it supports, turning the range join "
        "into an equi join on day with duplication factor exactly 7 — "
        "the same rewrite as join_time_bucketed_range, applied to "
        "windowed distinct counting."
    ),
)
def analytics_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.date_trunc("day", "ts").cast("date").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    offsets = F.sequence(F.lit(0), F.lit(6))
    rep = ud.select(
        "user_id", F.explode(offsets).alias("off"), F.col("day").alias("act_day")
    ).select("user_id", F.date_add(F.col("act_day"), F.col("off")).alias("day"))
    days = ud.select("day").distinct()
    wau = rep.join(days, "day").groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return dau.join(wau, "day").select(
        "day",
        F.col("dau").cast("long").alias("dau"),
        F.col("wau").cast("long").alias("wau"),
        F.round(F.col("dau") / F.col("wau").cast("double"), 6).alias("stickiness"),
    )


@query(
    "analytics_time_to_first_purchase",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(ts) AS first_seen,
               min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
        FROM events GROUP BY 1
    ), conv AS (
        SELECT user_id,
               (epoch_us(first_purchase) - epoch_us(first_seen)) / 3600e6 AS hours
        FROM firsts WHERE first_purchase IS NOT NULL AND first_purchase > first_seen
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(hours, 0.5), 6) AS p50_hours,
           round(quantile_cont(hours, 0.9), 6) AS p90_hours,
           round(avg(hours), 6) AS mean_hours
    FROM conv
    """,
    doc=(
        "Time to first purchase: hours from a user's first event to "
        "their first purchase (strictly later), summarized p50/p90/mean "
        "— the activation-latency metric. Both firsts come from ONE "
        "user-keyed conditional-min aggregate; the exact percentile "
        "runs over converted users only."
    ),
)
def analytics_time_to_first_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    conv = firsts.filter(
        F.col("first_purchase").isNotNull() & (F.col("first_purchase") > F.col("first_seen"))
    ).select(
        ((F.unix_micros("first_purchase") - F.unix_micros("first_seen")) / 3600e6).alias(
            "hours"
        )
    )
    return conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.percentile("hours", F.lit(0.5)), 6).alias("p50_hours"),
        F.round(F.percentile("hours", F.lit(0.9)), 6).alias("p90_hours"),
        F.round(F.avg("hours"), 6).alias("mean_hours"),
    )


@query(
    "analytics_revenue_bridge",
    oracle="""
    WITH cm AS (
        SELECT user_id, CAST(date_trunc('month', ts) AS DATE) AS month,
               round(sum(value), 2) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ), joined AS (
        SELECT coalesce(CAST(p.month + INTERVAL 1 MONTH AS DATE), c.month) AS month,
               coalesce(c.rev, 0) AS cur_rev, coalesce(p.rev, 0) AS prev_rev
        FROM cm c FULL OUTER JOIN cm p
          ON p.user_id = c.user_id AND CAST(p.month + INTERVAL 1 MONTH AS DATE) = c.month
    )
    SELECT month,
           round(sum(CASE WHEN prev_rev = 0 THEN cur_rev ELSE 0 END), 2) AS new_rev,
           round(sum(CASE WHEN cur_rev > prev_rev AND prev_rev > 0
                          THEN cur_rev - prev_rev ELSE 0 END), 2) AS expansion,
           round(sum(CASE WHEN cur_rev < prev_rev AND cur_rev > 0
                          THEN cur_rev - prev_rev ELSE 0 END), 2) AS contraction,
           round(sum(CASE WHEN cur_rev = 0 THEN -prev_rev ELSE 0 END), 2) AS churned_rev,
           round(sum(cur_rev - prev_rev), 2) AS net_change
    FROM joined GROUP BY 1
    """,
    doc=(
        "Month-over-month revenue bridge: each month's net change "
        "decomposed into new / expansion / contraction / churned "
        "components (the SaaS waterfall; new + expansion + contraction "
        "+ churned == net by construction). A per-(user, month) rollup "
        "full-outer joined to itself shifted one month — equi keys via "
        "add_months on the build side, so the bridge is one "
        "co-partitioned join over the bounded customer-month table. "
        "Negations live INSIDE the sums so empty components are +0 on "
        "both engines (IEEE -0 formats differently)."
    ),
)
def analytics_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cm = ev.groupBy(
        "user_id", F.date_trunc("month", "ts").cast("date").alias("month")
    ).agg(F.round(F.sum("value"), 2).alias("rev"))
    c = cm.alias("c")
    p = cm.select(
        F.col("user_id").alias("p_user"),
        F.add_months("month", 1).alias("p_next"),
        F.col("rev").alias("prev_rev0"),
    ).alias("p")
    joined = c.join(
        p,
        (F.col("c.user_id") == F.col("p_user")) & (F.col("c.month") == F.col("p_next")),
        "full_outer",
    ).select(
        F.coalesce(F.col("p_next"), F.col("c.month")).alias("month"),
        F.coalesce(F.col("c.rev"), F.lit(0)).alias("cur_rev"),
        F.coalesce(F.col("prev_rev0"), F.lit(0)).alias("prev_rev"),
    )
    cur, prev = F.col("cur_rev"), F.col("prev_rev")
    return joined.groupBy("month").agg(
        F.round(F.sum(F.when(prev == 0, cur).otherwise(0)), 2).alias("new_rev"),
        F.round(F.sum(F.when((cur > prev) & (prev > 0), cur - prev).otherwise(0)), 2).alias(
            "expansion"
        ),
        F.round(F.sum(F.when((cur < prev) & (cur > 0), cur - prev).otherwise(0)), 2).alias(
            "contraction"
        ),
        F.round(F.sum(F.when(cur == 0, -prev).otherwise(0)), 2).alias("churned_rev"),
        F.round(F.sum(cur - prev), 2).alias("net_change"),
    )


@query(
    "analytics_spearman_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) FILTER (WHERE event_type = 'click') AS clicks,
               count(*) FILTER (WHERE event_type = 'purchase') AS purchases
        FROM events GROUP BY 1
    ), ranked AS (
        SELECT row_number() OVER (ORDER BY clicks, day) AS r1,
               row_number() OVER (ORDER BY purchases, day) AS r2
        FROM daily
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(1 - 6.0 * sum((r1 - r2) * (r1 - r2))
                     / (count(*) * (count(*) * count(*) - 1.0)), 6) AS spearman_rho
    FROM ranked
    """,
    doc=(
        "Spearman rank correlation of daily clicks vs purchases: ranks "
        "by row_number with a deterministic day tie-break, then the "
        "classic 1 - 6*sum(d^2)/(n(n^2-1)) identity — the monotone-"
        "association complement to Pearson corr (agg_stats) that "
        "ignores outlier magnitudes. Integer rank arithmetic, so the "
        "result is exact on both engines up to the final rounding."
    ),
)
def analytics_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
    )
    ranked = daily.select(
        F.row_number().over(Window.orderBy("clicks", "day")).alias("r1"),
        F.row_number().over(Window.orderBy("purchases", "day")).alias("r2"),
    )
    d2 = (F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2"))
    n = F.count(F.lit(1))
    return ranked.agg(
        n.cast("long").alias("n_days"),
        F.round(1 - 6.0 * F.sum(d2) / (n * (n * n - 1.0)), 6).alias("spearman_rho"),
    )


@query(
    "analytics_lifecycle_stages",
    oracle="""
    WITH last_seen AS (
        SELECT user_id, max(ts) AS last_ts FROM events GROUP BY 1
    ), corpus AS (SELECT max(ts) AS max_ts FROM events),
    staged AS (
        SELECT CASE
                 WHEN epoch_us(max_ts) - epoch_us(last_ts)
                      <= CAST(7 * 86400 AS BIGINT) * 1000000 THEN 'active'
                 WHEN epoch_us(max_ts) - epoch_us(last_ts)
                      <= CAST(21 * 86400 AS BIGINT) * 1000000 THEN 'at_risk'
                 ELSE 'churned'
               END AS stage
        FROM last_seen, corpus
    ), n AS (SELECT count(*) AS total FROM staged)
    SELECT stage, CAST(count(*) AS BIGINT) AS n_users,
           round(count(*) / CAST(total AS DOUBLE), 6) AS share
    FROM staged, n GROUP BY stage, total
    """,
    doc=(
        "User lifecycle stages: recency bands against the corpus "
        "watermark classify every user active / at-risk / churned — the "
        "segmentation the retention team acts on (RFM's recency axis "
        "collapsed to named stages). One user-keyed max aggregate + a "
        "1-row watermark broadcast + a 3-row rollup."
    ),
)
def analytics_lifecycle_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    last_seen = ev.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    corpus = ev.agg(F.max("ts").alias("max_ts"))
    gap = F.unix_micros("max_ts") - F.unix_micros("last_ts")
    staged = last_seen.join(F.broadcast(corpus)).select(
        F.when(gap <= 7 * 86400 * 1000000, "active")
        .when(gap <= 21 * 86400 * 1000000, "at_risk")
        .otherwise("churned")
        .alias("stage")
    )
    n = staged.agg(F.count(F.lit(1)).alias("total"))
    return (
        staged.groupBy("stage")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .join(F.broadcast(n))
        .select(
            "stage",
            "n_users",
            F.round(F.col("n_users") / F.col("total").cast("double"), 6).alias("share"),
        )
    )


@query(
    "analytics_touches_before_purchase",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, event_type, ts,
               count(*) FILTER (WHERE event_type IN ('click', 'view'))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_touches
        FROM events
    ), p AS (
        SELECT least(coalesce(n_touches, 0), 10) AS touches_bucket
        FROM seq WHERE event_type = 'purchase'
    )
    SELECT CAST(touches_bucket AS INTEGER) AS touches_bucket,
           CAST(count(*) AS BIGINT) AS n_purchases
    FROM p GROUP BY 1 ORDER BY 1
    """,
    doc=(
        "Dose-response of marketing touches: for every purchase, the "
        "running count of prior clicks/views (capped at 10+), "
        "histogrammed — the curve that says how many touches typically "
        "precede conversion (the aggregate complement to "
        "analytics_last_touch_attribution's per-purchase credit). One "
        "user-keyed running conditional count."
    ),
)
def analytics_touches_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_touches = F.count(F.when(F.col("event_type").isin("click", "view"), 1)).over(w)
    seq = ev.select("event_type", n_touches.alias("n_touches"))
    p = seq.filter(F.col("event_type") == "purchase").select(
        F.least(F.coalesce(F.col("n_touches"), F.lit(0)), F.lit(10))
        .cast("int")
        .alias("touches_bucket")
    )
    return (
        p.groupBy("touches_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
        .orderBy("touches_bucket")
    )


@query(
    "analytics_day_n_retention",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ), first_seen AS (
        SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1
    ), cohorted AS (
        SELECT f.user_id, f.first_day,
               max(CASE WHEN u.day = f.first_day + 1 THEN 1 ELSE 0 END) AS d1,
               max(CASE WHEN u.day = f.first_day + 7 THEN 1 ELSE 0 END) AS d7,
               max(CASE WHEN u.day = f.first_day + 14 THEN 1 ELSE 0 END) AS d14
        FROM first_seen f JOIN ud u ON u.user_id = f.user_id
        GROUP BY 1, 2
    ), lastd AS (SELECT max(day) AS last_day FROM ud)
    SELECT CAST(count(*) FILTER (WHERE first_day + 1 <= last_day) AS BIGINT) AS n_d1_eligible,
           round(sum(d1) FILTER (WHERE first_day + 1 <= last_day)
                 / CAST(nullif(count(*) FILTER (WHERE first_day + 1 <= last_day), 0)
                        AS DOUBLE), 6) AS d1_retention,
           round(sum(d7) FILTER (WHERE first_day + 7 <= last_day)
                 / CAST(nullif(count(*) FILTER (WHERE first_day + 7 <= last_day), 0)
                        AS DOUBLE), 6) AS d7_retention,
           round(sum(d14) FILTER (WHERE first_day + 14 <= last_day)
                 / CAST(nullif(count(*) FILTER (WHERE first_day + 14 <= last_day), 0)
                        AS DOUBLE), 6) AS d14_retention
    FROM cohorted, lastd
    """,
    doc=(
        "Day-N retention (N = 1, 7, 14): fraction of users active ON "
        "exactly the Nth day after their first day, denominators "
        "restricted to users whose day-N window has elapsed (the "
        "right-censoring correction naive retention numbers miss). "
        "The user-keyed join + conditional-max aggregate share one "
        "partitioning; day-of-first granularity matches "
        "cohort_retention's monthly shape."
    ),
)
def analytics_day_n_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.date_trunc("day", "ts").cast("date").alias("day")).distinct()
    first_seen = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = first_seen.join(ud, "user_id")
    cohorted = j.groupBy("user_id", "first_day").agg(
        F.max(F.when(F.col("day") == F.date_add("first_day", 1), 1).otherwise(0)).alias("d1"),
        F.max(F.when(F.col("day") == F.date_add("first_day", 7), 1).otherwise(0)).alias("d7"),
        F.max(F.when(F.col("day") == F.date_add("first_day", 14), 1).otherwise(0)).alias("d14"),
    )
    lastd = ud.agg(F.max("day").alias("last_day"))
    c = cohorted.join(F.broadcast(lastd))

    def ret(n: int, col: str):
        eligible = F.date_add("first_day", n) <= F.col("last_day")
        return F.round(
            F.sum(F.when(eligible, F.col(col)))
            / F.nullif(F.count(F.when(eligible, 1)), F.lit(0)).cast("double"),
            6,
        )

    return c.agg(
        F.count(F.when(F.date_add("first_day", 1) <= F.col("last_day"), 1))
        .cast("long")
        .alias("n_d1_eligible"),
        ret(1, "d1").alias("d1_retention"),
        ret(7, "d7").alias("d7_retention"),
        ret(14, "d14").alias("d14_retention"),
    )


@query(
    "analytics_user_activity_powerlaw",
    oracle="""
    WITH per_user AS (
        SELECT user_id, count(*) AS n FROM events GROUP BY 1
    ), ranked AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, user_id) AS rnk
        FROM per_user
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(regr_slope(log(n), log(rnk)), 6) AS powerlaw_slope,
           round(regr_r2(log(n), log(rnk)), 6) AS r2
    FROM ranked WHERE rnk <= 1000
    """,
    doc=(
        "User-activity power law: log-log slope of events-per-user "
        "against rank (the behavioral twin of text_zipf_slope) — a "
        "heavy-tailed slope predicts hot-key skew in every user-keyed "
        "shuffle, so this number directly informs when the salted "
        "variants (skew_salted_agg/join) are needed. One rank window "
        "over the bounded per-user aggregate + a regr aggregate."
    ),
)
def analytics_user_activity_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    ranked = per_user.select(
        "n", F.row_number().over(Window.orderBy(F.col("n").desc(), "user_id")).alias("rnk")
    ).filter(F.col("rnk") <= 1000)
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.regr_slope(F.log("n"), F.log("rnk")), 6).alias("powerlaw_slope"),
        F.round(F.regr_r2(F.log("n"), F.log("rnk")), 6).alias("r2"),
    )


@query(
    "funnel_time_bounded",
    oracle="""
    WITH staged AS (
        SELECT user_id, event_type, ts,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t_view
        FROM events
    ),
    clicked AS (
        SELECT *,
               min(CASE WHEN event_type = 'click'
                         AND ts >= t_view
                         AND ts <= t_view + INTERVAL 1 HOUR THEN ts END)
                   OVER (PARTITION BY user_id) AS t_click
        FROM staged
    ),
    done AS (
        SELECT DISTINCT user_id, t_view, t_click,
               min(CASE WHEN event_type = 'purchase'
                         AND ts >= t_click
                         AND ts <= t_click + INTERVAL 24 HOUR THEN ts END)
                   OVER (PARTITION BY user_id) AS t_purchase
        FROM clicked
        WHERE t_view IS NOT NULL
    )
    SELECT user_id, t_view, t_click, t_purchase,
           CAST(t_purchase IS NOT NULL AS INTEGER) AS converted
    FROM done
    """,
    doc=(
        "Time-BOUNDED conversion funnel (the product-analytics standard "
        "funnel_three_step deliberately omits): first view, first click "
        "within 1 HOUR of that view, first purchase within 24 HOURS of "
        "that click — per-user timestamps plus a converted flag, so "
        "downstream can both count stage conversion and analyze latency "
        "distributions. Implementation is three STACKED conditional-min "
        "windows over the same user partitioning: one shuffle on user_id "
        "total, no self-joins — each stage's window predicate references "
        "the previous stage's result column, which Spark evaluates in "
        "sequent projections without re-partitioning. At 100 TB the "
        "events stream shuffles once; everything else is per-row."
    ),
)
def funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    staged = ev.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    clicked = staged.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.col("t_view"))
                & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 1 HOUR")),
                F.col("ts"),
            )
        ).over(w),
    )
    done = (
        clicked.filter(F.col("t_view").isNotNull())
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t_click"))
                    & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 24 HOUR")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .select("user_id", "t_view", "t_click", "t_purchase")
        .distinct()
    )
    return done.withColumn(
        "converted", F.col("t_purchase").isNotNull().cast("int")
    )


@query(
    "analytics_event_regex_match",
    oracle="""
    WITH seqs AS (
        SELECT user_id,
               string_agg(left(event_type, 1), '' ORDER BY ts, event_id)
                   AS seq
        FROM events
        GROUP BY user_id
    )
    SELECT user_id, seq,
           CAST(regexp_matches(seq, 'vc*p') AS INTEGER) AS matched,
           regexp_extract(seq, 'vc*p') AS first_match
    FROM seqs
    """,
    doc=(
        "MATCH_RECOGNIZE-style sequential pattern detection (the SQL:2016 "
        "row-pattern feature Spark lacks): each user's event history is "
        "collapsed IN EVENT ORDER to a compact symbol string (first "
        "letter of event_type), then the pattern — here 'view, any "
        "number of clicks, purchase' as the regex vc*p — is matched "
        "against the sequence. This is the standard trick for "
        "funnel-with-repetition / path-pattern questions that window "
        "functions can't express: one user-keyed shuffle builds the "
        "ordered symbol string (ORDER BY inside the aggregate on DuckDB, "
        "sort_array(collect_list(struct)) on Spark — both deterministic "
        "under ties via event_id), and the regex engine does the "
        "sequence automaton per user. State per user is O(events/user) "
        "symbols — bytes, not rows; at 100 TB the shuffle carries "
        "1-char symbols instead of event payloads."
    ),
)
def analytics_event_regex_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    sym = F.substring("event_type", 1, 1)
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", sym.alias("s")))),
        lambda x: x["s"],
    )
    seqs = ev.groupBy("user_id").agg(
        F.concat_ws("", ordered).alias("seq")
    )
    return seqs.select(
        "user_id",
        "seq",
        F.col("seq").rlike("vc*p").cast("int").alias("matched"),
        F.regexp_extract("seq", "vc*p", 0).alias("first_match"),
    )


@query(
    "feature_target_encode_loo",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round((sum(o_totalprice) OVER w - o_totalprice)
                 / nullif(count(*) OVER w - 1, 0), 2) AS loo_priority_mean
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority)
    """,
    doc=(
        "Leave-one-out target encoding (the leakage-safe categorical "
        "encoder for gradient-boosted/linear models): each order's "
        "priority is encoded as the mean target (o_totalprice) of all "
        "OTHER orders sharing the priority — (group_sum - y_i) / "
        "(group_n - 1) — so a row never sees its own label, the classic "
        "target-leakage fix (2-decimal money rounding: big-group float "
        "sums differ across engines in the 6th decimal). Singleton categories encode as NULL "
        "(nullif guard) rather than a self-mean. One shuffle on the "
        "category key; sum and count ride the same unbounded window "
        "frame, so the fact table is scanned and exchanged once. At "
        "100 TB the category cardinality is what matters, not row "
        "count — the window state per key is two numbers."
    ),
)
def feature_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    loo = (F.sum("o_totalprice").over(w) - F.col("o_totalprice")) / F.nullif(
        F.count(F.lit(1)).over(w) - F.lit(1), F.lit(0)
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(loo, 2).alias("loo_priority_mean"),
    )


@query(
    "analytics_survival_km",
    oracle="""
    WITH w AS (SELECT max(ts) AS wm FROM events),
    users AS (
        SELECT user_id,
               date_diff('day', min(ts), max(ts)) AS duration,
               CASE WHEN max(ts) < (SELECT wm FROM w) - INTERVAL 7 DAY
                    THEN 1 ELSE 0 END AS churned
        FROM events GROUP BY user_id
    ),
    per_t AS (
        SELECT duration AS t,
               sum(churned) AS d,
               count(*) AS leaving
        FROM users GROUP BY 1
    ),
    risk AS (
        SELECT t, d,
               (SELECT count(*) FROM users) -
               coalesce(sum(leaving) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
        FROM per_t
    )
    SELECT CAST(t AS INTEGER) AS t,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           round(exp(sum(ln(greatest(1.0 - CAST(d AS DOUBLE) / n_risk, 1e-12)))
                     OVER (ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
                 6) AS survival
    FROM risk
    """,
    doc=(
        "Kaplan-Meier survival curve for user lifetime (first to last "
        "activity) with RIGHT-CENSORING: users still active within 7 "
        "days of the corpus watermark are censored, not counted as "
        "churned — the estimator product S(t) = prod(1 - d_i/n_i) only "
        "steps on true churn events, which is what separates KM from the "
        "naive retention curve (analytics_day_n_retention corrects a "
        "single horizon; KM corrects the whole curve). Computed as "
        "exp(cumsum(ln)) over the BOUNDED per-duration table (<= |days| "
        "rows): the fact table reduces to per-user min/max in one "
        "shuffle, and every window thereafter runs over duration rows — "
        "the global-order window is over ~hundreds of rows at any data "
        "scale, never events."
    ),
)
def analytics_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    wm = ev.agg(F.max("ts").alias("wm"))
    users = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(wm))
        .select(
            F.datediff("last_ts", "first_ts").alias("duration"),
            (F.col("last_ts") < F.col("wm") - F.expr("INTERVAL 7 DAY"))
            .cast("int")
            .alias("churned"),
        )
    )
    per_t = users.groupBy(F.col("duration").alias("t")).agg(
        F.sum("churned").alias("d"), F.count(F.lit(1)).alias("leaving")
    )
    total = users.agg(F.count(F.lit(1)).alias("n_total"))
    w_prior = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risk = per_t.crossJoin(F.broadcast(total)).withColumn(
        "n_risk",
        F.col("n_total") - F.coalesce(F.sum("leaving").over(w_prior), F.lit(0)),
    )
    hazard_ln = F.log(
        F.greatest(
            F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk"), F.lit(1e-12)
        )
    )
    return risk.select(
        F.col("t").cast("int").alias("t"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.round(F.exp(F.sum(hazard_ln).over(w_cum)), 6).alias("survival"),
    )


# Poisson(1) inverse CDF thresholds (cumulative e^-1 * sum 1/k!), embedded
# as identical literals in both engines so replica draws are bit-equal.
import math as _math

_BOOT_THRESH = []
_acc, _term = 0.0, _math.exp(-1.0)
for _k in range(6):
    _acc += _term
    _BOOT_THRESH.append(_acc)
    _term /= _k + 1
_BOOT_B = 16  # bootstrap replicas


def _bootstrap_oracle() -> str:
    from parquet_exporter_spark.functions import dedup as _D

    key = "concat(CAST(o_orderkey AS VARCHAR), ':', CAST(b AS VARCHAR))"
    # base_hash_31 is 28 bits (7 hex digits), so 2^28 is the right uniform
    # denominator — dividing by the Mersenne prime would cap u at 0.125
    u = f"({_D.sql_base_hash_31(key)} / {float(1 << 28)!r})"
    case = "CASE " + " ".join(
        f"WHEN {u} < {t!r} THEN {k}" for k, t in enumerate(_BOOT_THRESH)
    ) + " ELSE 6 END"
    return f"""
    WITH reps AS (SELECT CAST(unnest(range(0, {_BOOT_B})) AS BIGINT) AS b),
    draws AS (
        SELECT b, {case} AS k, o_totalprice
        FROM orders CROSS JOIN reps
    )
    SELECT b AS replica,
           round(sum(k * o_totalprice), 2) AS boot_total,
           CAST(sum(k) AS BIGINT) AS boot_rows
    FROM draws GROUP BY b
    """


@query(
    "analytics_bootstrap_ci",
    oracle=_bootstrap_oracle(),
    doc=(
        "Poisson bootstrap — THE resampling scheme that works on "
        "distributed data (Chamandy et al., Google 2012): classic "
        "bootstrap needs n draws WITH replacement from the whole dataset "
        "(a global operation), but Poisson(1) per-row weights approximate "
        "it with a purely ROW-LOCAL draw, so B=16 resampled totals of "
        "o_totalprice come from one scan + one 16-group aggregate — no "
        "shuffle of data, no driver loop, embarrassingly parallel at "
        "100 TB. Draws are deterministic md5 uniforms pushed through the "
        "Poisson(1) inverse CDF as shared literal thresholds, so every "
        "replica hash-matches the DuckDB twin. Downstream CI = "
        "percentiles of the B boot_total values (a 16-row driver-side "
        "readout); the per-replica table is the checkable artifact."
    ),
)
def analytics_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_exporter_spark.functions import dedup as _D

    orders = read_table(spark, sf_dir, "orders")
    reps = F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b")
    drawn = orders.select("o_orderkey", "o_totalprice", reps)
    u = _D.base_hash_31(
        F.concat(
            F.col("o_orderkey").cast("string"),
            F.lit(":"),
            F.col("b").cast("string"),
        )
    ) / float(1 << 28)
    k = F.lit(6)
    for kk in range(len(_BOOT_THRESH) - 1, -1, -1):
        k = F.when(u < _BOOT_THRESH[kk], F.lit(kk)).otherwise(k)
    return (
        drawn.select(F.col("b").cast("long").alias("replica"),
                     (k * F.col("o_totalprice")).alias("w"),
                     k.alias("k"))
        .groupBy("replica")
        .agg(
            F.round(F.sum("w"), 2).alias("boot_total"),
            F.sum("k").cast("long").alias("boot_rows"),
        )
    )


@query(
    "analytics_diff_in_diff",
    oracle="""
    WITH treat AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    cells AS (
        SELECT (t.user_id IS NOT NULL) AS treated,
               (e.ts >= TIMESTAMP '2024-01-16 00:00:00') AS post,
               avg(e.value) AS mean_value,
               CAST(count(*) AS BIGINT) AS n
        FROM events e LEFT JOIN treat t USING (user_id)
        GROUP BY 1, 2
    )
    SELECT treated, post, round(mean_value, 6) AS mean_value, n,
           round(
               (SELECT (max(CASE WHEN treated AND post THEN mean_value END)
                        - max(CASE WHEN treated AND NOT post THEN mean_value END))
                       - (max(CASE WHEN NOT treated AND post THEN mean_value END)
                          - max(CASE WHEN NOT treated AND NOT post THEN mean_value END))
                FROM cells), 6) AS did_estimate
    FROM cells
    """,
    doc=(
        "Difference-in-differences readout — the workhorse quasi-"
        "experimental estimator when randomization isn't available: "
        "treated = users who ever purchased, pre/post split at a fixed "
        "calendar cutoff, outcome = mean event value per (treated, post) "
        "cell; DiD = (T_post - T_pre) - (C_post - C_pre) strips both the "
        "group baseline and the common time trend. One scan + one "
        "4-group aggregate (the treated flag is a semi-join-shaped "
        "broadcast against the distinct purchaser set); the 4-cell table "
        "plus the scalar estimate are emitted together so the whole "
        "readout hash-matches. Pairs with ab_test_proportions (the "
        "randomized-experiment readout)."
    ),
)
def analytics_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    treat = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("__t", F.lit(True))
    )
    cells = (
        events.join(F.broadcast(treat), "user_id", "left")
        .groupBy(
            F.coalesce("__t", F.lit(False)).alias("treated"),
            (F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp")).alias(
                "post"
            ),
        )
        .agg(F.avg("value").alias("mv"), F.count(F.lit(1)).alias("n"))
    )
    one = F.first  # 4-row input; each cell key appears once
    did = cells.agg(
        F.round(
            (
                one(F.when(F.col("treated") & F.col("post"), F.col("mv")), True)
                - one(F.when(F.col("treated") & ~F.col("post"), F.col("mv")), True)
            )
            - (
                one(F.when(~F.col("treated") & F.col("post"), F.col("mv")), True)
                - one(F.when(~F.col("treated") & ~F.col("post"), F.col("mv")), True)
            ),
            6,
        ).alias("did_estimate")
    )
    return cells.select(
        "treated",
        "post",
        F.round("mv", 6).alias("mean_value"),
        "n",
    ).crossJoin(F.broadcast(did))


@query(
    "analytics_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    trans AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT from_type, sum(n) AS row_total FROM trans GROUP BY 1
    )
    SELECT t.from_type, t.to_type, t.n,
           round(t.n / CAST(o.row_total AS DOUBLE), 6) AS p
    FROM trans t JOIN tot o ON t.from_type = o.from_type
    """,
    doc=(
        "First-order Markov transition matrix over per-user event "
        "journeys: P(next event type | current), estimated from every "
        "consecutive pair in each user's (ts, event_id)-ordered stream "
        "— the user-journey model behind next-action prediction, "
        "absorbing-state funnel analysis, and PageRank-style flow "
        "attribution, complementing event_paths' literal trigram "
        "counting with a normalized conditional-probability view. One "
        "user-keyed exchange for the lead window, then a |types|^2-"
        "bounded aggregate with map-side combine; row totals join on "
        "the bounded matrix itself, never the raw stream. Counts are "
        "integer-exact; each probability is one division, round-6 for "
        "the cross-engine contract. At 100 TB the matrix stays "
        "|types|^2 rows regardless of event count — the estimation is "
        "embarrassingly partial-aggregable."
    ),
)
def analytics_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = trans.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return trans.join(tot, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.col("row_total").cast("double"), 6).alias("p"),
    )


@query(
    "analytics_nelson_aalen",
    oracle="""
    WITH w AS (SELECT max(ts) AS wm FROM events),
    users AS (
        SELECT user_id,
               date_diff('day', min(ts), max(ts)) AS duration,
               CASE WHEN max(ts) < (SELECT wm FROM w) - INTERVAL 7 DAY
                    THEN 1 ELSE 0 END AS churned
        FROM events GROUP BY user_id
    ),
    per_t AS (
        SELECT duration AS t,
               sum(churned) AS d,
               count(*) AS leaving
        FROM users GROUP BY 1
    ),
    risk AS (
        SELECT t, d,
               (SELECT count(*) FROM users) -
               coalesce(sum(leaving) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
        FROM per_t
    )
    SELECT CAST(t AS INTEGER) AS t,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           round(sum(CAST(d AS DOUBLE) / n_risk)
                 OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS cum_hazard,
           round(sum(CAST(d AS DOUBLE) / n_risk / n_risk)
                 OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS cum_hazard_var
    FROM risk
    """,
    doc=(
        "Nelson-Aalen cumulative-hazard estimator for user lifetime "
        "with the SAME right-censoring model as analytics_survival_km "
        "(active within 7 days of the corpus watermark = censored): "
        "H(t) = sum_{t_i <= t} d_i / n_i, plus its classic variance "
        "estimator sum d_i / n_i^2. Where KM answers 'what fraction "
        "survives to t', NA answers 'how much churn FORCE has "
        "accumulated by t' — the additive form is what feeds "
        "proportional-hazards diagnostics (a straight H(t) means "
        "constant hazard; KM's product form can't be read that way), "
        "and exp(-H) gives the Fleming-Harrington survival alternative "
        "when d_i/n_i is small. Each term is one exact integer "
        "division; the cumulative sums run over the BOUNDED "
        "per-duration table (<= |days| rows at any scale — the fact "
        "table reduces to per-user min/max in one shuffle), the same "
        "single-partition-waived shape as KM."
    ),
)
def analytics_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    wm = ev.agg(F.max("ts").alias("wm"))
    users = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(wm))
        .select(
            F.datediff("last_ts", "first_ts").alias("duration"),
            (F.col("last_ts") < F.col("wm") - F.expr("INTERVAL 7 DAY"))
            .cast("int")
            .alias("churned"),
        )
    )
    n_users = users.count()
    per_t = users.groupBy(F.col("duration").alias("t")).agg(
        F.sum("churned").alias("d"), F.count(F.lit(1)).alias("leaving")
    )
    w_before = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = per_t.withColumn(
        "n_risk", F.lit(n_users) - F.coalesce(F.sum("leaving").over(w_before), F.lit(0))
    )
    term = F.col("d").cast("double") / F.col("n_risk")
    return risk.select(
        F.col("t").cast("int").alias("t"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.round(F.sum(term).over(w_cum), 6).alias("cum_hazard"),
        F.round(F.sum(term / F.col("n_risk")).over(w_cum), 6).alias(
            "cum_hazard_var"
        ),
    )


@query(
    "analytics_cuped_adjustment",
    oracle="""
    WITH span AS (
        SELECT CAST(date_trunc('day', min(ts)) AS DATE)
               + CAST(floor(date_diff('day',
                     CAST(date_trunc('day', min(ts)) AS DATE),
                     CAST(date_trunc('day', max(ts)) AS DATE)) / 2) AS INT)
                   AS cutoff
        FROM events),
    ux AS (
        SELECT user_id, user_id % 2 AS variant,
               CAST(count(*) FILTER (
                   WHERE CAST(date_trunc('day', ts) AS DATE)
                         <= (SELECT cutoff FROM span)) AS BIGINT) AS x,
               CAST(count(*) FILTER (
                   WHERE CAST(date_trunc('day', ts) AS DATE)
                         > (SELECT cutoff FROM span)) AS BIGINT) AS y
        FROM events GROUP BY user_id),
    pooled AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM ux),
    coef AS (
        SELECT n, sx,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / (n * sxx - sx * sx) AS theta,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   * (n * sxy - sx * sy)
                   / (CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy))
                   AS rho2
        FROM pooled)
    SELECT variant,
           CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS mean_y,
           round((sum(y) - any_value(theta)
                      * (sum(x) - count(*) * CAST(any_value(sx) AS DOUBLE)
                                              / any_value(n)))
                 / count(*), 6) AS mean_y_adj,
           round(any_value(theta), 6) AS theta,
           round(any_value(rho2), 6) AS var_reduction
    FROM ux CROSS JOIN coef
    GROUP BY variant
    """,
    doc=(
        "CUPED variance reduction for A/B readouts: the post-period "
        "metric Y (per-user event count after the span midpoint) is "
        "adjusted by the PRE-period covariate X (count before it), "
        "Y_adj = Y - theta*(X - mean(X)) with theta = cov(X,Y)/var(X) "
        "pooled across variants — the industry-standard trick that "
        "removes the between-user variance the randomization already "
        "balanced, shrinking CIs by the reported var_reduction = rho^2 "
        "without touching the treatment effect (E[X] is identical "
        "across variants by randomization, here the deterministic "
        "user_id%2 split). EVERY moment is an exact integer sum (n, "
        "Sx, Sy, Sxx, Syy, Sxy over integer counts), theta and rho^2 "
        "are single divisions of exact longs, and the group-level "
        "adjusted mean uses the CLOSED FORM sum(Y_adj) = Sy_g - "
        "theta*(Sx_g - n_g*mean(X)) — no per-row float ever sums, so "
        "the whole readout is bit-deterministic cross-engine before "
        "the final round-6 (the oracle-float rule, applied to a "
        "statistic that usually ships as a numpy afterthought). Scale "
        "shape: one user-keyed partial-agg shuffle, then 1-row pooled "
        "moments broadcast into a 2-row group-by."
    ),
)
def analytics_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    span = ev.agg(
        F.date_add(
            F.to_date(F.date_trunc("day", F.min("ts"))),
            F.floor(
                F.datediff(
                    F.to_date(F.date_trunc("day", F.max("ts"))),
                    F.to_date(F.date_trunc("day", F.min("ts"))),
                )
                / 2
            ).cast("int"),
        ).alias("cutoff")
    )
    ux = (
        ev.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.sum(
                (F.to_date(F.date_trunc("day", "ts")) <= F.col("cutoff")).cast("long")
            ).alias("x"),
            F.sum(
                (F.to_date(F.date_trunc("day", "ts")) > F.col("cutoff")).cast("long")
            ).alias("y"),
        )
        .select((F.col("user_id") % 2).alias("variant"), "x", "y")
    )
    pooled = ux.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    coef = pooled.select(
        "n",
        "sx",
        (cov_n.cast("double") / varx_n).alias("theta"),
        (
            cov_n.cast("double") * cov_n / (varx_n.cast("double") * vary_n)
        ).alias("rho2"),
    )
    return (
        ux.crossJoin(F.broadcast(coef))
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 6).alias("mean_y"),
            F.round(
                (
                    F.sum("y")
                    - F.any_value("theta")
                    * (
                        F.sum("x")
                        - F.count(F.lit(1))
                        * F.any_value("sx").cast("double")
                        / F.any_value("n")
                    )
                )
                / F.count(F.lit(1)),
                6,
            ).alias("mean_y_adj"),
            F.round(F.any_value("theta"), 6).alias("theta"),
            F.round(F.any_value("rho2"), 6).alias("var_reduction"),
        )
    )


@query(
    "analytics_herfindahl_monthly",
    oracle="""
    WITH cust AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               o_custkey,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2)
    SELECT month,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE)
                 / (CAST(sum(cents) AS DOUBLE) * CAST(sum(cents) AS DOUBLE)),
                 6) AS hhi,
           round((CAST(sum(cents) AS DOUBLE) * CAST(sum(cents) AS DOUBLE))
                 / CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE),
                 4) AS effective_n
    FROM cust GROUP BY month
    """,
    doc=(
        "Herfindahl-Hirschman revenue concentration per month: HHI = "
        "sum(share_i^2) over each customer's share of the month's "
        "revenue, folded into the division-free identity sum(rev_i^2) "
        "/ (sum rev_i)^2 so no per-customer float share is ever "
        "computed or summed — revenue is EXACT INTEGER CENTS "
        "(cast-to-decimal(18,2) then x100, identical rounding in both "
        "engines since the stored doubles are within ulps of their "
        "2-decimal values), the squares accumulate in wide integers "
        "(Spark decimal(38,0), DuckDB HUGEINT — both exact), and one "
        "double division lands at the end. effective_n = 1/HHI is the "
        "'equivalent equal-size customers' reading analysts actually "
        "quote (HHI 0.04 = 25 equal customers). Scale shape: one "
        "partial-agg shuffle to (month, customer), one to month — the "
        "same two-level rollup as cohort LTV; the wide-integer trick "
        "is what keeps it exact at 100 TB where counts overflow longs."
    ),
)
def analytics_herfindahl_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    cents = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("long")
    cust = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        "o_custkey",
    ).agg(F.sum(cents).cast("long").alias("cents"))
    sq = F.col("cents").cast("decimal(19,0)") * F.col("cents").cast("decimal(19,0)")
    s = F.sum(F.col("cents")).cast("double")
    q = F.sum(sq).cast("double")
    return cust.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(q / (s * s), 6).alias("hhi"),
        F.round((s * s) / q, 4).alias("effective_n"),
    )


@query(
    "analytics_auc_mann_whitney",
    oracle="""
    WITH uy AS (
        SELECT user_id, user_id % 2 AS variant,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY user_id),
    ranked AS (
        SELECT variant, y,
               -- average tie rank = (2*min_rank + ties - 1) / 2: exact
               -- halves, every partial sum exact below 2^52
               (2 * rank() OVER (ORDER BY y)
                + count(*) OVER (PARTITION BY y) - 1) / 2.0 AS avg_rank
        FROM uy),
    grp AS (
        SELECT CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               sum(CASE WHEN variant = 1 THEN avg_rank ELSE 0 END) AS r1
        FROM ranked),
    ties AS (
        SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie_term
        FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM uy GROUP BY y))
    SELECT n1, n0,
           r1 - n1 * (n1 + 1) / 2.0 AS u_stat,
           round((r1 - n1 * (n1 + 1) / 2.0) / (CAST(n1 AS DOUBLE) * n0), 6)
               AS auc,
           CASE WHEN sqrt(CAST(n1 AS DOUBLE) * n0 / 12
                          * ((n1 + n0 + 1)
                             - CAST(tie_term AS DOUBLE)
                               / ((n1 + n0) * (n1 + n0 - 1.0)))) > 0
                THEN round((r1 - n1 * (n1 + 1) / 2.0
                            - CAST(n1 AS DOUBLE) * n0 / 2)
                           / sqrt(CAST(n1 AS DOUBLE) * n0 / 12
                                  * ((n1 + n0 + 1)
                                     - CAST(tie_term AS DOUBLE)
                                       / ((n1 + n0) * (n1 + n0 - 1.0)))), 6)
                END AS z_score
    FROM grp CROSS JOIN ties
    """,
    doc=(
        "Mann-Whitney U / rank-sum readout between the deterministic "
        "user_id%2 variants on per-user event counts, reported as the "
        "AUC (= P(random treatment user > random control user), the "
        "common-language effect size — and literally ROC-AUC when the "
        "variant flag is a binary label, which is why this one operator "
        "serves both A/B readouts and model-score evaluation) plus the "
        "tie-corrected normal z. The nonparametric complement to the "
        "mean-difference tests (ab_test_proportions, "
        "analytics_diff_in_diff): a few whale users cannot move it. "
        "Exactness: average tie ranks are (2*min_rank + ties - 1)/2 — "
        "exact binary halves whose sums stay exact below 2^52, U and "
        "AUC are single divisions of those exact values, and the tie "
        "correction sum(t^3 - t) is an exact integer — nothing "
        "engine-ordered anywhere before the final round-6 (z's sqrt is "
        "IEEE correctly-rounded). Scale shape: one user-keyed "
        "partial-agg shuffle; the rank window is global-order but runs "
        "over the per-user table, and at 100 TB the same ranks come "
        "from the value-histogram CDF (ties group by VALUE, so the "
        "window collapses to |distinct y| rows — the zorder_key_approx "
        "trick)."
    ),
)
def analytics_auc_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    uy = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("y")).select(
        (F.col("user_id") % 2).alias("variant"), "y"
    )
    ranked = uy.select(
        "variant",
        (
            (
                2 * F.rank().over(Window.orderBy("y"))
                + F.count(F.lit(1)).over(Window.partitionBy("y"))
                - 1
            )
            / 2.0
        ).alias("avg_rank"),
    )
    grp = ranked.agg(
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("variant") == 1, F.col("avg_rank")).otherwise(0.0)).alias(
            "r1"
        ),
    )
    ties = (
        uy.groupBy("y")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("long")
            .alias("tie_term")
        )
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    n1d = F.col("n1").cast("double")
    n = F.col("n1") + F.col("n0")
    sigma = F.sqrt(
        n1d
        * F.col("n0")
        / 12
        * (
            (n + 1)
            - F.col("tie_term").cast("double") / (n * (n - F.lit(1.0)))
        )
    )
    return grp.crossJoin(F.broadcast(ties)).select(
        "n1",
        "n0",
        u.alias("u_stat"),
        F.round(u / (n1d * F.col("n0")), 6).alias("auc"),
        # all-tied input makes sigma 0 (tie correction removes the whole
        # variance): no sampling distribution exists, report NULL z
        F.when(sigma > 0, F.round((u - n1d * F.col("n0") / 2) / sigma, 6))
        .alias("z_score"),
    )


@query(
    "analytics_audience_overlap",
    oracle="""
    WITH aud AS (
        SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_overlap,
           CAST(any_value(na.n) AS BIGINT) AS n_a,
           CAST(any_value(nb.n) AS BIGINT) AS n_b,
           round(CAST(count(*) AS DOUBLE)
                 / (any_value(na.n) + any_value(nb.n) - count(*)), 6)
               AS jaccard,
           round(CAST(count(*) AS DOUBLE)
                 / least(any_value(na.n), any_value(nb.n)), 6)
               AS containment
    FROM aud a
    JOIN aud b ON a.user_id = b.user_id AND a.event_type < b.event_type
    JOIN (SELECT event_type, count(*) AS n FROM aud GROUP BY 1) na
      ON na.event_type = a.event_type
    JOIN (SELECT event_type, count(*) AS n FROM aud GROUP BY 1) nb
      ON nb.event_type = b.event_type
    GROUP BY 1, 2
    """,
    doc=(
        "Pairwise audience-overlap matrix across event types: for every "
        "type pair, the EXACT user intersection plus Jaccard and "
        "containment (overlap coefficient) — the 'do my segments reach "
        "the same people' readout ad/product teams sketch with "
        "theta-sketch intersections; here the per-type audiences are "
        "distinct (type, user) rows so the intersection is one "
        "user-keyed equi self-join and every quantity is an exact "
        "integer with two deterministic divisions at the end (union "
        "via inclusion-exclusion, never a float sum). Scale shape: the "
        "distinct audience table is bounded by users x types; the "
        "self-join shuffles once on user_id and the pair rollup is "
        "|types|^2 rows. At true sketch scale (billions of users) the "
        "SAME query shape runs over the exact bitmap family "
        "(agg_bitmap_exact_distinct) or HLL union/intersection "
        "estimates — this is the exact anchor those estimators are "
        "judged against."
    ),
)
def analytics_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    aud = ev.select("event_type", "user_id").distinct()
    sizes = aud.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = aud.select(F.col("event_type").alias("type_a"), "user_id")
    b = aud.select(F.col("event_type").alias("type_b"), "user_id")
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    na = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    j = pairs.join(na, "type_a").join(nb, "type_b")
    return j.select(
        "type_a",
        "type_b",
        "n_overlap",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(
            F.col("n_overlap").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_overlap")),
            6,
        ).alias("jaccard"),
        F.round(
            F.col("n_overlap").cast("double") / F.least("n_a", "n_b"), 6
        ).alias("containment"),
    )


@query(
    "analytics_srm_check",
    oracle="""
    WITH counts AS (
        SELECT CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0
        FROM (SELECT DISTINCT user_id FROM events))
    SELECT n1, n0,
           round(CAST((n1 - n0) * (n1 - n0) AS DOUBLE) / (n1 + n0), 6)
               AS chi2,
           CAST((n1 - n0) * (n1 - n0) AS DOUBLE) / (n1 + n0) > 3.841459
               AS srm_detected
    FROM counts
    """,
    doc=(
        "Sample-ratio-mismatch guard for the 50/50 user_id%2 split: the "
        "1-dof chi-square (n1-n0)^2/(n1+n0) against the 3.84 critical "
        "value (p<0.05) — the sanity gate every experimentation "
        "platform runs BEFORE reading any metric, because a biased "
        "assignment invalidates the whole readout (the CUPED and "
        "Mann-Whitney queries here assume the split it checks). Exact "
        "integer counts, one deterministic division, and the boolean "
        "compares that exact double against an exact literal — nothing "
        "engine-ordered. Scale shape: one distinct-user shuffle "
        "collapsing to a 1-row verdict."
    ),
)
def analytics_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    counts = users.agg(
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
    )
    diff = F.col("n1") - F.col("n0")
    chi2 = (diff * diff).cast("double") / (F.col("n1") + F.col("n0"))
    return counts.select(
        "n1",
        "n0",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841459).alias("srm_detected"),
    )
