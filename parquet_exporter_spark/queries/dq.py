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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table, tiny_df


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
    return tiny_df(spark, rows, "table_name string, n_rows long")


N_PSI_BINS = 10
PSI_EPS = 0.5  # Laplace-style smoothing count per bin (avoids ln(0))


@query(
    "dq_drift_psi",
    oracle=f"""
    WITH bounds AS (
        SELECT min(ts) AS lo_ts, max(ts) AS hi_ts,
               min(value) AS lo_v, max(value) AS hi_v
        FROM events
    ),
    binned AS (
        SELECT e.event_type,
               CASE WHEN epoch_us(e.ts) * 2 < epoch_us(b.lo_ts) + epoch_us(b.hi_ts)
                    THEN 'ref' ELSE 'cur' END AS period,
               least({N_PSI_BINS} - 1, greatest(0, CAST(floor(
                   (e.value - b.lo_v) / ((b.hi_v - b.lo_v) / {N_PSI_BINS})
               ) AS INTEGER))) AS bin
        FROM events e CROSS JOIN bounds b
    ),
    counts AS (
        SELECT event_type, bin,
               sum(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS n_ref,
               sum(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS n_cur
        FROM binned GROUP BY event_type, bin
    ),
    totals AS (
        SELECT event_type, sum(n_ref) AS t_ref, sum(n_cur) AS t_cur
        FROM counts GROUP BY event_type
    )
    SELECT c.event_type,
           round(sum(
               (((c.n_cur + {PSI_EPS}) / (t.t_cur + {PSI_EPS} * {N_PSI_BINS}))
                - ((c.n_ref + {PSI_EPS}) / (t.t_ref + {PSI_EPS} * {N_PSI_BINS})))
               * ln(((c.n_cur + {PSI_EPS}) / (t.t_cur + {PSI_EPS} * {N_PSI_BINS}))
                    / ((c.n_ref + {PSI_EPS}) / (t.t_ref + {PSI_EPS} * {N_PSI_BINS})))
           ), 6) AS psi,
           CAST(max(t.t_ref) AS BIGINT) AS n_ref,
           CAST(max(t.t_cur) AS BIGINT) AS n_cur
    FROM counts c JOIN totals t USING (event_type)
    GROUP BY c.event_type
    """,
    doc=(
        "Distribution-drift detection via Population Stability Index: "
        "events are split at the time-range midpoint into reference/"
        "current halves, `value` is equal-width binned, and per "
        "event_type PSI = sum (p_cur - p_ref) * ln(p_cur / p_ref) with "
        "Laplace-smoothed bin shares. The monitoring pass a production "
        "training-data pipeline runs between snapshots. Shape: one 4-"
        "value global aggregate broadcast back, then counts keyed on "
        "(event_type, bin) — cardinality ~types*bins, so at 100 TB the "
        "only full-data cost is one scan with map-side partial counts."
    ),
)
def dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min("ts").alias("lo_ts"),
        F.max("ts").alias("hi_ts"),
        F.min("value").alias("lo_v"),
        F.max("value").alias("hi_v"),
    )
    epoch = F.unix_micros  # exact integer microseconds, matches epoch_us
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(
            epoch(F.col("ts")) * 2 < epoch(F.col("lo_ts")) + epoch(F.col("hi_ts")),
            F.lit("ref"),
        )
        .otherwise(F.lit("cur"))
        .alias("period"),
        F.least(
            F.lit(N_PSI_BINS - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col("value") - F.col("lo_v"))
                    / ((F.col("hi_v") - F.col("lo_v")) / N_PSI_BINS)
                ).cast("int"),
            ),
        ).alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("period") == "ref", 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("period") == "cur", 1).otherwise(0)).alias("n_cur"),
    )
    # Per-type totals as a window over the tiny counts table (types x bins
    # rows) rather than a groupBy + self-join: reusing `counts` on both
    # sides of a join would duplicate the whole events-scan subtree in the
    # physical plan — two scans of the fact table instead of one.
    from pyspark.sql import Window

    w = Window.partitionBy("event_type")
    enriched = counts.withColumn("t_ref", F.sum("n_ref").over(w)).withColumn(
        "t_cur", F.sum("n_cur").over(w)
    )
    denom_r = F.col("t_ref") + PSI_EPS * N_PSI_BINS
    denom_c = F.col("t_cur") + PSI_EPS * N_PSI_BINS
    p_ref = (F.col("n_ref") + PSI_EPS) / denom_r
    p_cur = (F.col("n_cur") + PSI_EPS) / denom_c
    return enriched.groupBy("event_type").agg(
        F.round(F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)), 6).alias("psi"),
        F.max("t_ref").cast("long").alias("n_ref"),
        F.max("t_cur").cast("long").alias("n_cur"),
    )


@query(
    "profile_numeric_correlations",
    oracle="""
    SELECT col_a, col_b, corr_val FROM (
        SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_val
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity', 'l_discount',
               round(corr(l_quantity, l_discount), 6)
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', 'l_discount',
               round(corr(l_extendedprice, l_discount), 6)
        FROM lineitem
    )
    """,
    doc=(
        "Pairwise correlation matrix over the numeric columns, long "
        "format (col_a, col_b, corr) — the multivariate profiling pass "
        "that catches redundant or leaking features before training. "
        "All three co-moment aggregates run in ONE scan of the fact "
        "table (single agg node, map-side partials); the oracle's "
        "three-scan UNION is the portable but slower equivalent."
    ),
)
def profile_numeric_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    wide = li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("qty_disc"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("price_disc"),
    )
    return wide.select(
        F.expr(
            "stack(3, "
            "'l_quantity', 'l_extendedprice', qty_price, "
            "'l_quantity', 'l_discount', qty_disc, "
            "'l_extendedprice', 'l_discount', price_disc) "
            "AS (col_a, col_b, corr_val)"
        )
    )


# Declarative expectation suite: rule name -> (SQL predicate over orders,
# severity). Evaluated in ONE scan via FILTER-clause aggregates.
DQ_RULES = (
    ("totalprice_positive", "o_totalprice > 0", "error"),
    ("orderdate_in_range",
     "o_orderdate >= TIMESTAMP '1992-01-01' AND o_orderdate < TIMESTAMP '2000-01-01'",
     "error"),
    ("status_in_domain", "o_orderstatus IN ('O', 'F', 'P')", "error"),
    ("priority_not_null", "o_orderpriority IS NOT NULL", "warn"),
    ("totalprice_under_cap", "o_totalprice < 500000", "warn"),
)


@query(
    "dq_rule_engine",
    oracle="""
    WITH t AS (SELECT count(*) AS n,
       sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS v1,
       sum(CASE WHEN o_orderdate >= TIMESTAMP '1992-01-01'
                 AND o_orderdate < TIMESTAMP '2000-01-01' THEN 0 ELSE 1 END) AS v2,
       sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 0 ELSE 1 END) AS v3,
       sum(CASE WHEN o_orderpriority IS NOT NULL THEN 0 ELSE 1 END) AS v4,
       sum(CASE WHEN o_totalprice < 500000 THEN 0 ELSE 1 END) AS v5
    FROM orders)
    SELECT rule, severity, CAST(violations AS BIGINT) AS violations,
           round(1.0 - violations / CAST(n AS DOUBLE), 6) AS pass_rate,
           (violations = 0) AS passed
    FROM t UNPIVOT (violations FOR rule IN (
        v1 AS 'totalprice_positive', v2 AS 'orderdate_in_range',
        v3 AS 'status_in_domain', v4 AS 'priority_not_null',
        v5 AS 'totalprice_under_cap'))
    JOIN (VALUES ('totalprice_positive', 'error'),
                 ('orderdate_in_range', 'error'),
                 ('status_in_domain', 'error'),
                 ('priority_not_null', 'warn'),
                 ('totalprice_under_cap', 'warn')) sev(rule2, severity)
      ON rule = rule2
    """,
    doc=(
        "Declarative data-quality rule engine (expectation-suite shape): "
        "a literal rule table of (name, predicate, severity) compiles to "
        "ONE FILTER-clause aggregate pass over the table — violations "
        "for every rule are counted in a single scan with map-side "
        "partial aggregation, then unpivoted to the long verdict format "
        "dashboards ingest (rule, severity, violations, pass_rate, "
        "passed). Adding a rule adds an aggregate expression, never a "
        "scan; at 100 TB this is the only affordable shape for a "
        "50-rule suite. Complements dq_constraint_checks (cross-table "
        "FK/PK checks) with per-row domain expectations."
    ),
)
def dq_rule_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.when(F.expr(pred), F.lit(0)).otherwise(F.lit(1))).alias(f"v{i}")
        for i, (_, pred, _) in enumerate(DQ_RULES)
    ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', v{i}" for i, (name, _, _) in enumerate(DQ_RULES)
    )
    long = wide.selectExpr(
        "n", f"stack({len(DQ_RULES)}, {stack_args}) AS (rule, violations)"
    )
    sev = F.create_map(
        *[x for name, _, s in DQ_RULES for x in (F.lit(name), F.lit(s))]
    )
    return long.select(
        "rule",
        sev[F.col("rule")].alias("severity"),
        F.col("violations").cast("long").alias("violations"),
        F.round(1.0 - F.col("violations") / F.col("n").cast("double"), 6).alias(
            "pass_rate"
        ),
        (F.col("violations") == 0).alias("passed"),
    )


@query(
    "dq_freshness_lag",
    oracle="""
    WITH per_type AS (
        SELECT event_type, max(ts) AS latest_ts, count(*) AS n_events
        FROM events GROUP BY event_type
    ),
    ref AS (SELECT max(latest_ts) AS corpus_latest FROM per_type)
    SELECT p.event_type, p.latest_ts,
           CAST(p.n_events AS BIGINT) AS n_events,
           CAST(floor(date_diff('second', p.latest_ts, r.corpus_latest) / 60)
               AS BIGINT) AS staleness_minutes,
           (floor(date_diff('second', p.latest_ts, r.corpus_latest) / 60) > 360)
               AS is_stale
    FROM per_type p CROSS JOIN ref r
    """,
    doc=(
        "Data-freshness audit (the DQ dimension the constraint/drift/"
        "profiling family lacked): per event type, the latest event "
        "time, its staleness in minutes behind the freshest partition, "
        "and a >6h stale flag — the check every ingestion pipeline "
        "pages on (staleness = floor of elapsed whole seconds / 60: both "
        "engines count second boundaries identically, unlike their "
        "divergent minute-boundary date_diff conventions). One "
        "partial-agg'd scan to |types| rows; the corpus "
        "watermark is a 1-row aggregate OVER THOSE ROWS (not a second "
        "scan) broadcast back. At 100 TB the per-type maxima come from "
        "partition-level footer stats (catalog_row_counts' metadata "
        "path), making the whole check metadata-only."
    ),
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.max("ts").alias("latest_ts"), F.count(F.lit(1)).alias("n_events")
    )
    ref = F.broadcast(per_type.agg(F.max("latest_ts").alias("corpus_latest")))
    lag_min = (
        (F.unix_timestamp("corpus_latest") - F.unix_timestamp("latest_ts")) / 60
    ).cast("long")
    return per_type.crossJoin(ref).select(
        "event_type",
        "latest_ts",
        "n_events",
        lag_min.alias("staleness_minutes"),
        (lag_min > 360).alias("is_stale"),
    )


@query(
    "dq_sequence_gaps",
    oracle="""
    WITH seq AS (
        SELECT event_id,
               lead(event_id) OVER (ORDER BY event_id) AS next_id
        FROM (SELECT DISTINCT event_id FROM events)
    )
    SELECT event_id + 1 AS gap_start, next_id - 1 AS gap_end,
           CAST(next_id - event_id - 1 AS BIGINT) AS missing
    FROM seq
    WHERE next_id - event_id > 1
    """,
    doc=(
        "Sequence-gap detection: ranges of missing ids in what should be "
        "a dense surrogate-key sequence — the completeness check that "
        "catches dropped ingestion batches (a gap of exactly one batch "
        "size is the classic symptom). Emits one row per gap RANGE "
        "rather than one per missing id, so output is bounded by the "
        "number of DISCONTINUITIES, not the hole sizes. The default "
        "(scale_safe=True) plan is the per-partition-range "
        "decomposition: range-partition the distinct ids, lead() WITHIN "
        "each partition (every task sorts |ids|/partitions rows), then "
        "stitch cross-partition gaps from the per-partition min/max "
        "table — one tiny bounded pass, |partitions| rows (the "
        "ids_global_rownum decomposition in reverse, result-equality "
        "tested against the legacy form). scale_safe=False keeps the "
        "single-window spelling whose one task sorts ALL distinct ids — "
        "only for plan comparison, never the registered path."
    ),
)
def dq_sequence_gaps(
    spark: SparkSession, sf_dir: str, scale_safe: bool = True
) -> DataFrame:
    from pyspark.sql import Window

    events = read_table(spark, sf_dir, "events")
    ids = events.select("event_id").distinct()
    if not scale_safe:
        w = Window.orderBy("event_id")
        return (
            ids.withColumn("next_id", F.lead("event_id").over(w))
            .filter(F.col("next_id") - F.col("event_id") > 1)
            .select(
                (F.col("event_id") + 1).alias("gap_start"),
                (F.col("next_id") - 1).alias("gap_end"),
                (F.col("next_id") - F.col("event_id") - 1)
                .cast("long")
                .alias("missing"),
            )
        )
    # Pin partition identity before the plan fans out to the gap branch
    # and the bounds branch: AQE may coalesce the range exchange
    # differently per branch, which would make spark_partition_id
    # disagree between them (same localCheckpoint rationale as
    # operators/ids.global_row_number). RangePartitioner assigns
    # ascending key ranges to ascending partition ids, so __pid order IS
    # id order and the boundary stitch below is correct.
    tagged = (
        ids.repartitionByRange("event_id")
        .sortWithinPartitions("event_id")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_in = Window.partitionBy("__pid").orderBy("event_id")
    within = (
        tagged.withColumn("next_id", F.lead("event_id").over(w_in))
        .filter(F.col("next_id") - F.col("event_id") > 1)
        .select("event_id", "next_id")
    )
    bounds = tagged.groupBy("__pid").agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    )
    # |partitions| rows: the one global-order window here is bounded by
    # the task count, never the data (allowlisted in the plan audit).
    w_b = Window.orderBy("__pid")
    boundary = (
        bounds.withColumn("next_lo", F.lead("lo").over(w_b))
        .filter(F.col("next_lo") - F.col("hi") > 1)
        .select(F.col("hi").alias("event_id"), F.col("next_lo").alias("next_id"))
    )
    return within.unionByName(boundary).select(
        (F.col("event_id") + 1).alias("gap_start"),
        (F.col("next_id") - 1).alias("gap_end"),
        (F.col("next_id") - F.col("event_id") - 1).cast("long").alias("missing"),
    )


@query(
    "dq_benford_first_digit",
    oracle="""
    WITH d AS (
        SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INTEGER) AS digit
        FROM orders WHERE o_totalprice >= 1
    ), n AS (SELECT count(*) AS total FROM d)
    SELECT digit, CAST(count(*) AS BIGINT) AS n,
           round(count(*) / CAST(total AS DOUBLE), 6) AS observed_p,
           round(log10(1 + 1.0 / digit), 6) AS expected_p
    FROM d, n GROUP BY digit, total ORDER BY digit
    """,
    doc=(
        "Benford first-digit audit: the leading significant digit of "
        "every order amount vs Benford's law expectation log10(1+1/d) — "
        "the classic fabricated-data / unit-mixup screen for financial "
        "columns. The digit is extracted integer-exactly (floor -> bigint "
        "-> first character of its decimal string), avoiding any "
        "float-formatting or log10-at-power-of-ten edge between engines. "
        "One partial-agg scan to 9 rows plus a 1-row total broadcast."
    ),
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    d = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    n = d.agg(F.count(F.lit(1)).alias("total"))
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(n))
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("total").cast("double"), 6).alias("observed_p"),
            F.round(F.log10(1 + 1.0 / F.col("digit")), 6).alias("expected_p"),
        )
        .orderBy("digit")
    )


@query(
    "dq_outlier_iqr",
    oracle="""
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM events GROUP BY 1
    )
    SELECT e.event_type,
           round(max(q.q1), 6) AS q1, round(max(q.q3), 6) AS q3,
           CAST(count(*) FILTER (WHERE e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                                    OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)) AS BIGINT)
               AS n_outliers,
           CAST(count(*) AS BIGINT) AS n
    FROM events e JOIN q ON q.event_type = e.event_type
    GROUP BY e.event_type
    """,
    doc=(
        "Tukey (IQR) fences per group: exact interpolated quartiles, "
        "then a second pass counts values outside [q1-1.5*IQR, "
        "q3+1.5*IQR] — the distribution-free outlier screen that "
        "complements MAD (outlier_mad) and z-scores (outlier_zscore). "
        "The bounded per-type quantile profile broadcasts back onto the "
        "fact scan, same two-pass profile-broadcast shape as "
        "timeseries_seasonal_baseline; at 100 TB the exact percentile "
        "swaps for approx_percentile with everything else unchanged."
    ),
)
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    joined = ev.join(F.broadcast(q), "event_type")
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("value") < F.col("q1") - 1.5 * iqr) | (
        F.col("value") > F.col("q3") + 1.5 * iqr
    )
    return joined.groupBy("event_type").agg(
        F.round(F.max("q1"), 6).alias("q1"),
        F.round(F.max("q3"), 6).alias("q3"),
        F.count(F.when(is_out, 1)).cast("long").alias("n_outliers"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@query(
    "dq_null_fractions",
    oracle="""
    WITH n AS (SELECT count(*) AS total FROM events)
    SELECT col, CAST(n_null AS BIGINT) AS n_null,
           round(n_null / CAST(total AS DOUBLE), 6) AS null_fraction
    FROM (
        SELECT 'event_id' AS col, count(*) FILTER (WHERE event_id IS NULL) AS n_null FROM events
        UNION ALL
        SELECT 'ts', count(*) FILTER (WHERE ts IS NULL) FROM events
        UNION ALL
        SELECT 'user_id', count(*) FILTER (WHERE user_id IS NULL) FROM events
        UNION ALL
        SELECT 'event_type', count(*) FILTER (WHERE event_type IS NULL) FROM events
        UNION ALL
        SELECT 'value', count(*) FILTER (WHERE value IS NULL) FROM events
        UNION ALL
        SELECT 'props', count(*) FILTER (WHERE props IS NULL) FROM events
    ), n
    """,
    doc=(
        "Per-column completeness profile in long form: every column's "
        "null count comes from ONE conditional-aggregate scan (the "
        "oracle's 6-scan UNION is the semantic spec, not the plan), "
        "then a stack() unpivot to (col, n_null, fraction) rows. The "
        "generic schema-driven variant of dq_constraint_checks' "
        "not-null verdicts; output is O(columns)."
    ),
)
def dq_null_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    agg = ev.agg(
        F.count(F.lit(1)).alias("total"),
        *[F.count(F.when(F.col(c).isNull(), 1)).alias(f"n_{c}") for c in cols],
    )
    stacked = agg.selectExpr(
        "total",
        "stack({n}, {args}) AS (col, n_null)".format(
            n=len(cols), args=", ".join(f"'{c}', n_{c}" for c in cols)
        ),
    )
    return stacked.select(
        "col",
        F.col("n_null").cast("long").alias("n_null"),
        F.round(F.col("n_null") / F.col("total").cast("double"), 6).alias("null_fraction"),
    )


@query(
    "dq_duplicate_full_rows",
    oracle="""
    SELECT md5(concat_ws('|',
               CAST(event_id AS VARCHAR), CAST(epoch_us(ts) AS VARCHAR),
               CAST(user_id AS VARCHAR), event_type,
               CAST(value AS VARCHAR), props)) AS row_hash,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM events
    GROUP BY 1 HAVING count(*) > 1
    """,
    doc=(
        "Whole-row duplicate detection: md5 over every column (ts "
        "serialized as integer microseconds so both engines hash the "
        "same bytes; doubles via their shortest decimal repr) grouped "
        "to find rows ingested twice — the double-delivery check. Only "
        "the 16-byte hash shuffles, never the row payload; an empty "
        "result IS the pass verdict."
    ),
)
def dq_duplicate_full_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    row_hash = F.md5(
        F.concat_ws(
            "|",
            F.col("event_id").cast("string"),
            F.unix_micros("ts").cast("string"),
            F.col("user_id").cast("string"),
            F.col("event_type"),
            F.col("value").cast("string"),
            F.col("props"),
        )
    )
    return (
        ev.select(row_hash.alias("row_hash"))
        .groupBy("row_hash")
        .agg(F.count(F.lit(1)).cast("long").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


@query(
    "dq_row_count_anomaly",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
        FROM events GROUP BY 1
    ), s AS (
        SELECT avg(n) AS mu, stddev_samp(n) AS sigma FROM daily
    )
    SELECT day, CAST(n AS BIGINT) AS n,
           round((n - mu) / sigma, 6) AS z,
           abs(n - mu) > 3 * sigma AS is_anomaly
    FROM daily, s
    """,
    doc=(
        "Ingest-volume anomaly screen: daily row counts z-scored against "
        "the corpus mean/stddev, 3-sigma flag — the pipeline-health "
        "check that catches dropped or doubled loads before any "
        "content-level audit. One partial-agg rollup to days, one 1-row "
        "stats broadcast."
    ),
)
def dq_row_count_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    s = daily.agg(F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma"))
    return daily.join(F.broadcast(s)).select(
        "day",
        F.col("n").cast("long").alias("n"),
        F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 6).alias("z"),
        (F.abs(F.col("n") - F.col("mu")) > 3 * F.col("sigma")).alias("is_anomaly"),
    )


@query(
    "dq_fk_coverage",
    oracle="""
    SELECT * FROM (
        SELECT 'lineitem.l_orderkey->orders' AS fk,
               CAST(count(*) AS BIGINT) AS n_child,
               CAST(count(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT) AS n_orphans
        FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
        UNION ALL
        SELECT 'orders.o_custkey->customer',
               CAST(count(*) AS BIGINT),
               CAST(count(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
        FROM orders r LEFT JOIN customer c ON c.c_custkey = r.o_custkey
        UNION ALL
        SELECT 'customer.c_nationkey->nation',
               CAST(count(*) AS BIGINT),
               CAST(count(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
        FROM customer cu LEFT JOIN nation n ON n.n_nationkey = cu.c_nationkey
    )
    """,
    doc=(
        "Referential-coverage matrix: one row per FK edge of the schema "
        "with child cardinality and orphan count — the relationship-"
        "level rollup of dq_constraint_checks' single-FK verdict. Each "
        "edge is a left join against the DISTINCT parent keys (parent "
        "side dedupes before the join; dims broadcast), so the report "
        "costs one pass per edge over the child keys only."
    ),
)
def dq_fk_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")

    def edge(name: str, child: DataFrame, ckey: str, parent: DataFrame, pkey: str) -> DataFrame:
        p = parent.select(F.col(pkey).alias("__pk")).distinct()
        j = child.select(F.col(ckey).alias("__ck")).join(
            p, F.col("__ck") == F.col("__pk"), "left"
        )
        return j.agg(
            F.lit(name).alias("fk"),
            F.count(F.lit(1)).cast("long").alias("n_child"),
            F.count(F.when(F.col("__pk").isNull(), 1)).cast("long").alias("n_orphans"),
        )

    return (
        edge("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey")
        .unionAll(edge("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey"))
        .unionAll(
            edge("customer.c_nationkey->nation", cust, "c_nationkey", nation, "n_nationkey")
        )
    )


@query(
    "dq_cross_field_consistency",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(count(*) FILTER (WHERE l.l_shipdate < o.o_orderdate) AS BIGINT)
               AS n_ship_before_order,
           round(count(*) FILTER (WHERE l.l_shipdate < o.o_orderdate)
                 / CAST(count(*) AS DOUBLE), 6) AS violation_rate
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
    doc=(
        "Cross-table temporal consistency: line items shipped BEFORE "
        "their order date — the impossible-sequence audit that catches "
        "timezone bugs and backdated loads, broken down by priority. "
        "One orderkey join + conditional aggregate; the violation "
        "predicate stays a per-row expression, so cost is the join "
        "alone."
    ),
)
def dq_cross_field_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    bad = F.col("l_shipdate") < F.col("o_orderdate")
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.count(F.when(bad, 1)).cast("long").alias("n_ship_before_order"),
        F.round(F.count(F.when(bad, 1)) / F.count(F.lit(1)).cast("double"), 6).alias(
            "violation_rate"
        ),
    )


@query(
    "dq_total_reconciliation",
    oracle="""
    WITH item_sums AS (
        SELECT l_orderkey,
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS computed
        FROM lineitem GROUP BY 1
    )
    SELECT o.o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (WHERE abs(computed - o.o_totalprice)
                                       > 0.01 * o.o_totalprice) AS BIGINT) AS n_mismatched,
           round(count(*) FILTER (WHERE abs(computed - o.o_totalprice)
                                        > 0.01 * o.o_totalprice)
                 / CAST(count(*) AS DOUBLE), 6) AS mismatch_rate
    FROM orders o JOIN item_sums i ON i.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
    doc=(
        "Header/detail reconciliation: each order's stored total against "
        "the recomputed sum of its line charges, mismatches beyond a 1% "
        "relative tolerance counted per status — the classic financial "
        "closing check. The item rollup and the header join share the "
        "order key; the tolerance is relative so float noise can't flip "
        "verdicts."
    ),
)
def dq_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    sums = li.groupBy("l_orderkey").agg(
        F.sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("computed")
    )
    j = orders.join(sums, orders.o_orderkey == sums.l_orderkey)
    bad = F.abs(F.col("computed") - F.col("o_totalprice")) > 0.01 * F.col("o_totalprice")
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.count(F.when(bad, 1)).cast("long").alias("n_mismatched"),
        F.round(F.count(F.when(bad, 1)) / F.count(F.lit(1)).cast("double"), 6).alias(
            "mismatch_rate"
        ),
    )


@query(
    "dq_categorical_profile",
    oracle="""
    WITH et AS (
        SELECT event_type AS val, count(*) AS n FROM events GROUP BY 1
    ), pr AS (
        SELECT o_orderpriority AS val, count(*) AS n FROM orders GROUP BY 1
    ), st AS (
        SELECT o_orderstatus AS val, count(*) AS n FROM orders GROUP BY 1
    )
    SELECT col, CAST(n_distinct AS BIGINT) AS n_distinct, top_value,
           CAST(top_n AS BIGINT) AS top_n
    FROM (
        SELECT 'events.event_type' AS col, count(*) AS n_distinct,
               (SELECT val FROM et ORDER BY n DESC, val DESC LIMIT 1) AS top_value,
               max(n) AS top_n
        FROM et
        UNION ALL
        SELECT 'orders.o_orderpriority', count(*),
               (SELECT val FROM pr ORDER BY n DESC, val DESC LIMIT 1), max(n) FROM pr
        UNION ALL
        SELECT 'orders.o_orderstatus', count(*),
               (SELECT val FROM st ORDER BY n DESC, val DESC LIMIT 1), max(n) FROM st
    )
    """,
    doc=(
        "Categorical-column profile in long form: distinct count, modal "
        "value (deterministic max_by(val, (n, val)) tie-break) and its "
        "frequency for each profiled column — the categorical complement "
        "of profile_table_summary's numeric stats. Each column costs one "
        "partial-agg scan collapsed to one row."
    ),
)
def dq_categorical_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    orders = read_table(spark, sf_dir, "orders")

    def profile(df: DataFrame, col: str, label: str) -> DataFrame:
        counts = df.groupBy(F.col(col).alias("val")).agg(F.count(F.lit(1)).alias("n"))
        return counts.agg(
            F.lit(label).alias("col"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.max_by("val", F.struct("n", "val")).alias("top_value"),
            F.max("n").cast("long").alias("top_n"),
        )

    return (
        profile(ev, "event_type", "events.event_type")
        .unionAll(profile(orders, "o_orderpriority", "orders.o_orderpriority"))
        .unionAll(profile(orders, "o_orderstatus", "orders.o_orderstatus"))
    )


@query(
    "dq_enum_new_values",
    oracle="""
    WITH bounds AS (
        SELECT make_timestamp((epoch_us(min(ts)) + epoch_us(max(ts))) // 2) AS mid
        FROM events
    ),
    old AS (SELECT DISTINCT event_type FROM events, bounds WHERE ts < mid),
    new AS (
        SELECT event_type, count(*) AS n
        FROM events, bounds WHERE ts >= mid GROUP BY 1
    )
    SELECT n.event_type AS new_value, CAST(n.n AS BIGINT) AS n_rows
    FROM new n LEFT JOIN old o ON o.event_type = n.event_type
    WHERE o.event_type IS NULL
    """,
    doc=(
        "Enum drift detection: categorical values appearing in the "
        "recent half of the data that were never seen in the older half "
        "— the upstream-schema-change alarm (a new event_type silently "
        "breaks every CASE WHEN downstream). Two bounded distinct/"
        "count aggregates + an anti-join on the category; empty output "
        "IS the pass verdict."
    ),
)
def dq_enum_new_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.timestamp_micros(
            F.expr("(unix_micros(min(ts)) + unix_micros(max(ts))) div 2")
        ).alias("mid")
    )
    withmid = ev.join(F.broadcast(bounds))
    old = withmid.filter(F.col("ts") < F.col("mid")).select("event_type").distinct()
    new = (
        withmid.filter(F.col("ts") >= F.col("mid"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        new.join(
            old.withColumnRenamed("event_type", "old_type"),
            new.event_type == F.col("old_type"),
            "left",
        )
        .filter(F.col("old_type").isNull())
        .select(F.col("event_type").alias("new_value"), F.col("n").cast("long").alias("n_rows"))
    )


@query(
    "dq_uniqueness_report",
    oracle="""
    SELECT col, CAST(n AS BIGINT) AS n, CAST(n_distinct AS BIGINT) AS n_distinct,
           round(n_distinct / CAST(n AS DOUBLE), 6) AS uniqueness
    FROM (
        SELECT 'events.event_id' AS col, count(*) AS n,
               count(DISTINCT event_id) AS n_distinct FROM events
        UNION ALL
        SELECT 'events.user_id', count(*), count(DISTINCT user_id) FROM events
        UNION ALL
        SELECT 'events.event_type', count(*), count(DISTINCT event_type) FROM events
        UNION ALL
        SELECT 'documents.doc_id', count(*), count(DISTINCT doc_id) FROM documents
    )
    """,
    doc=(
        "Uniqueness profile: distinct/total ratio per column in long "
        "form — 1.0 identifies key candidates, low values identify "
        "categoricals; the first screen when onboarding an unknown "
        "table. One exact two-phase distinct aggregate per column, "
        "each collapsing to a single row."
    ),
)
def dq_uniqueness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    docs = read_table(spark, sf_dir, "documents")

    def profile(df: DataFrame, col: str, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("col"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct(col).cast("long").alias("n_distinct"),
        )

    out = (
        profile(ev, "event_id", "events.event_id")
        .unionAll(profile(ev, "user_id", "events.user_id"))
        .unionAll(profile(ev, "event_type", "events.event_type"))
        .unionAll(profile(docs, "doc_id", "documents.doc_id"))
    )
    return out.select(
        "col",
        "n",
        "n_distinct",
        F.round(F.col("n_distinct") / F.col("n").cast("double"), 6).alias("uniqueness"),
    )


SKEW_PARTS = 32  # assumed shuffle-partition count for the salt advice


@query(
    "dq_join_key_skew",
    oracle=f"""
    WITH per_key AS (
        SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ),
    tot AS (SELECT sum(n) AS total, count(*) AS n_keys FROM per_key)
    SELECT k.user_id AS key, CAST(k.n AS BIGINT) AS n_rows,
           round(k.n / CAST(t.total AS DOUBLE), 6) AS share,
           floor(k.n * t.n_keys * 100.0 / CAST(t.total AS DOUBLE) + 0.5)
               / 100.0 AS x_mean,
           CAST(greatest(1, ceil(k.n * {SKEW_PARTS} / CAST(t.total AS DOUBLE)))
                AS BIGINT) AS suggested_salts,
           CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT user_id, n,
                 row_number() OVER (ORDER BY n DESC, user_id) AS rnk
          FROM per_key) k, tot t
    WHERE rnk <= 10
    """,
    doc=(
        "Join-key skew profiler: the pre-join diagnostic for THE classic "
        "100 TB shuffle failure (one hot key pins one reducer while the "
        "fleet idles). Per candidate join key (events.user_id): the 10 "
        "heaviest keys with row count, share of the table, multiple of "
        "the mean key size, and a suggested per-key salt fan-out = "
        "ceil(share x shuffle partitions) — the factor that spreads that "
        "key back to average-sized reduce tasks (operators/skew.py "
        "implements the salted exec; this op tells you WHERE and HOW "
        "MUCH). One keyed aggregate + a bounded top-10 over the per-key "
        "table; the 1-row total/mean scalar joins broadcast."
    ),
)
def dq_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    # mean multiple via floor(x*100 + 0.5)/100 over the exact integer
    # product (n * n_keys): engine round() half-way semantics differ on
    # exact .5 boundaries (Spark HALF_UP on the shortest decimal repr,
    # DuckDB on the binary value), while floor(+0.5) is identical math
    tot = per_key.agg(
        F.sum("n").cast("double").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    # top-10 via TakeOrdered (distributed heap), THEN rank the bounded
    # 10-row result — a global row_number window over per_key would
    # single-partition-sort the whole key table
    top10 = per_key.orderBy(F.col("n").desc(), F.col("user_id")).limit(10)
    ranked = top10.select(
        "user_id",
        "n",
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("user_id")))
        .alias("rnk"),
    )
    return ranked.join(F.broadcast(tot)).select(
        F.col("user_id").alias("key"),
        F.col("n").cast("long").alias("n_rows"),
        F.round(F.col("n") / F.col("total"), 6).alias("share"),
        (
            F.floor(F.col("n") * F.col("n_keys") * 100.0 / F.col("total") + 0.5)
            / 100.0
        ).alias("x_mean"),
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.col("n") * SKEW_PARTS / F.col("total")).cast("long"),
        ).alias("suggested_salts"),
        F.col("rnk").cast("long").alias("rnk"),
    )


@query(
    "dq_distribution_ks",
    oracle="""
    WITH tagged AS (
        SELECT event_type, value,
               CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS in1,
               CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END AS in2
        FROM events
    ),
    per_value AS (
        SELECT event_type, value,
               CAST(sum(in1) AS BIGINT) AS c1, CAST(sum(in2) AS BIGINT) AS c2
        FROM tagged GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, value,
               sum(c1) OVER (PARTITION BY event_type ORDER BY value) AS cum1,
               sum(c2) OVER (PARTITION BY event_type ORDER BY value) AS cum2,
               sum(c1) OVER (PARTITION BY event_type) AS n1,
               sum(c2) OVER (PARTITION BY event_type) AS n2
        FROM per_value
    )
    SELECT event_type,
           CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
           round(max(abs(CAST(cum1 AS DOUBLE) / n1
                         - CAST(cum2 AS DOUBLE) / n2)), 6) AS ks_stat,
           max(abs(CAST(cum1 AS DOUBLE) / n1 - CAST(cum2 AS DOUBLE) / n2))
               > 1.358 * sqrt((max(n1) + max(n2))
                              / CAST(max(n1) * max(n2) AS DOUBLE)) AS drift_at_5pct
    FROM cum GROUP BY event_type
    """,
    doc=(
        "Two-sample Kolmogorov-Smirnov drift test between the first and "
        "second half-month of events, per type: KS = max |F1(v) - F2(v)| "
        "over the pooled value domain, with the 5% critical-value "
        "verdict (c(alpha)=1.358 x sqrt((n1+n2)/(n1 n2))). The "
        "DISTRIBUTION-shape complement to dq_drift_psi's binned "
        "divergence: PSI needs a bin design and misses within-bin "
        "shifts; KS is binning-free and distribution-free. Shape: one "
        "(type, value) aggregate, then cumulative windows per type — "
        "empirical CDFs never materialize per row against each other, "
        "and the per-type result is 1 row. Integer cumulative counts "
        "divided identically in both engines -> fully hash-matched."
    ),
)
def dq_distribution_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    tagged = ev.select(
        "event_type",
        "value",
        F.when(F.col("ts") < cutoff, 1).otherwise(0).alias("in1"),
        F.when(F.col("ts") < cutoff, 0).otherwise(1).alias("in2"),
    )
    per_value = tagged.groupBy("event_type", "value").agg(
        F.sum("in1").alias("c1"), F.sum("in2").alias("c2")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = per_value.select(
        "event_type",
        F.sum("c1").over(w_cum).alias("cum1"),
        F.sum("c2").over(w_cum).alias("cum2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    gap = F.abs(
        F.col("cum1").cast("double") / F.col("n1")
        - F.col("cum2").cast("double") / F.col("n2")
    )
    return (
        cum.withColumn("gap", gap)
        .groupBy("event_type")
        .agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.round(F.max("gap"), 6).alias("ks_stat"),
            (
                F.max("gap")
                > 1.358
                * F.sqrt(
                    (F.max("n1") + F.max("n2"))
                    / (F.max("n1") * F.max("n2")).cast("double")
                )
            ).alias("drift_at_5pct"),
        )
    )


@query(
    "dq_counter_reset_rate",
    oracle="""
    WITH deltas AS (
        SELECT user_id, value,
               lag(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev
        FROM events WHERE user_id < 150 AND value IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(CASE WHEN prev IS NOT NULL AND value < prev
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
           round(sum(CASE WHEN prev IS NULL THEN 0
                          WHEN value >= prev THEN value - prev
                          ELSE value END), 6) AS total_increase
    FROM deltas
    GROUP BY user_id
    """,
    doc=(
        "Monotonic-counter rate extraction with RESET handling — the "
        "Prometheus increase() contract: per-series delta is "
        "value - prev when the counter moved forward, or the full new "
        "value after a reset (process restart re-zeroes the counter; a "
        "naive lag-diff would book a huge NEGATIVE delta and corrupt "
        "every downstream rate). Emits per-series point/reset counts "
        "and the reset-corrected total increase. One user-keyed "
        "exchange serves the lag window and the aggregate."
    ),
)
def dq_counter_reset_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = read_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 150) & F.col("value").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id", "value", F.lag("value").over(w).alias("prev")
    )
    reset = F.col("prev").isNotNull() & (F.col("value") < F.col("prev"))
    delta = (
        F.when(F.col("prev").isNull(), F.lit(0.0))
        .when(F.col("value") >= F.col("prev"), F.col("value") - F.col("prev"))
        .otherwise(F.col("value"))
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum(reset.cast("int")).cast("long").alias("n_resets"),
        F.round(F.sum(delta), 6).alias("total_increase"),
    )


N_W1_BINS = 256


@query(
    "dq_drift_wasserstein",
    oracle=f"""
    WITH bounds AS (
        SELECT min(ts) AS lo_ts, max(ts) AS hi_ts,
               min(value) AS lo_v, max(value) AS hi_v
        FROM events
    ),
    binned AS (
        SELECT e.event_type,
               CASE WHEN epoch_us(e.ts) * 2 < epoch_us(b.lo_ts) + epoch_us(b.hi_ts)
                    THEN 'ref' ELSE 'cur' END AS period,
               least({N_W1_BINS} - 1, greatest(0, CAST(floor(
                   (e.value - b.lo_v) / ((b.hi_v - b.lo_v) / {N_W1_BINS})
               ) AS INTEGER))) AS bin
        FROM events e CROSS JOIN bounds b
    ),
    counts AS (
        SELECT event_type, bin,
               sum(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS n_ref,
               sum(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS n_cur
        FROM binned GROUP BY event_type, bin
    ),
    spine AS (
        SELECT t.event_type, g.b AS bin
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(generate_series(0, {N_W1_BINS} - 1)) AS b) g
    ),
    dense AS (
        SELECT s.event_type, s.bin,
               coalesce(c.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur
        FROM spine s LEFT JOIN counts c
          ON s.event_type = c.event_type AND s.bin = c.bin
    ),
    cdf AS (
        SELECT event_type, bin,
               sum(n_ref) OVER (PARTITION BY event_type ORDER BY bin)
                   / sum(n_ref) OVER (PARTITION BY event_type) AS f_ref,
               sum(n_cur) OVER (PARTITION BY event_type ORDER BY bin)
                   / sum(n_cur) OVER (PARTITION BY event_type) AS f_cur
        FROM dense
    )
    SELECT c.event_type,
           round(sum(abs(f_ref - f_cur))
                 * ((b.hi_v - b.lo_v) / {N_W1_BINS}), 6) AS w1,
           round((b.hi_v - b.lo_v) / {N_W1_BINS}, 6) AS bin_width
    FROM cdf c CROSS JOIN bounds b
    GROUP BY c.event_type, b.hi_v, b.lo_v
    """,
    doc=(
        "Distribution drift as the 1-D WASSERSTEIN-1 distance (earth "
        "mover's) between the time-split halves of each type's value "
        "distribution, on a shared 256-bin grid: W1 = bin_width x "
        "sum_b |CDF_ref(b) - CDF_cur(b)| — the drift measure PSI and "
        "KS structurally miss, because it weights HOW FAR mass moved, "
        "not just that it moved (a shift of one bin and a shift across "
        "the whole range give identical KS yet very different W1). "
        "Densified bin spine (distinct types x generate_series) so "
        "empty bins still carry their |CDF gap| term; CDFs are integer "
        "cumulative counts over the bounded types x 256 table divided "
        "once — the only full-data costs are the 4-value bounds "
        "aggregate and one binning scan with map-side partial counts, "
        "identical shape to dq_drift_psi. The grid approximation is "
        "the standard practice at scale (exact W1 needs a global sort "
        "of every value); halving the grid halves the resolution, "
        "never the scan count."
    ),
)
def dq_drift_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min("ts").alias("lo_ts"),
        F.max("ts").alias("hi_ts"),
        F.min("value").alias("lo_v"),
        F.max("value").alias("hi_v"),
    )
    epoch = F.unix_micros
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(
            epoch(F.col("ts")) * 2 < epoch(F.col("lo_ts")) + epoch(F.col("hi_ts")),
            F.lit("ref"),
        )
        .otherwise(F.lit("cur"))
        .alias("period"),
        F.least(
            F.lit(N_W1_BINS - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col("value") - F.col("lo_v"))
                    / ((F.col("hi_v") - F.col("lo_v")) / N_W1_BINS)
                ).cast("int"),
            ),
        ).alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("period") == "ref", 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("period") == "cur", 1).otherwise(0)).alias("n_cur"),
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .select("event_type", F.explode(F.sequence(F.lit(0), F.lit(N_W1_BINS - 1))).alias("bin"))
    )
    dense = spine.join(counts, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    wo = Window.partitionBy("event_type").orderBy("bin")
    wa = Window.partitionBy("event_type")
    cdf = dense.select(
        "event_type",
        (F.sum("n_ref").over(wo) / F.sum("n_ref").over(wa)).alias("f_ref"),
        (F.sum("n_cur").over(wo) / F.sum("n_cur").over(wa)).alias("f_cur"),
    )
    width = (F.col("hi_v") - F.col("lo_v")) / N_W1_BINS
    return (
        cdf.groupBy("event_type")
        .agg(F.sum(F.abs(F.col("f_ref") - F.col("f_cur"))).alias("gap_sum"))
        .crossJoin(F.broadcast(bounds.select("lo_v", "hi_v")))
        .select(
            "event_type",
            F.round(F.col("gap_sum") * width, 6).alias("w1"),
            F.round(width, 6).alias("bin_width"),
        )
    )


@query(
    "dq_cramer_v",
    oracle="""
    WITH obs AS (
        SELECT event_type, isodow(ts) AS dow, CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2),
    rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1),
    ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1),
    n AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                 CAST(count(DISTINCT event_type) AS BIGINT) AS nr,
                 CAST(count(DISTINCT dow) AS BIGINT) AS nc
          FROM obs),
    grid AS (
        -- the FULL r x c grid: a category pair that never co-occurs is
        -- an O=0 cell whose (0-E)^2/E term chi2 requires; groupBy alone
        -- would silently drop it and undercount association
        SELECT rt.event_type, ct.dow, rt.r, ct.c, coalesce(obs.o, 0) AS o
        FROM rt CROSS JOIN ct
        LEFT JOIN obs USING (event_type, dow)),
    terms AS (
        SELECT grid.event_type, grid.dow,
               (CAST(o AS DOUBLE) * n.n - CAST(r AS DOUBLE) * c)
               * (CAST(o AS DOUBLE) * n.n - CAST(r AS DOUBLE) * c)
               / (CAST(n.n AS DOUBLE) * r * c) AS t
        FROM grid CROSS JOIN n),
    chi AS (
        SELECT list_reduce(
                   list_prepend(CAST(0 AS DOUBLE),
                                list(t ORDER BY event_type, dow)),
                   (acc, x) -> acc + x) AS chi2
        FROM terms)
    SELECT n.n AS n_rows, n.nr AS n_row_cats, n.nc AS n_col_cats,
           CAST((n.nr - 1) * (n.nc - 1) AS BIGINT) AS dof,
           round(chi.chi2, 6) AS chi2,
           round(sqrt(chi.chi2 / (n.n * least(n.nr - 1, n.nc - 1))), 6)
               AS cramer_v
    FROM chi CROSS JOIN n
    """,
    doc=(
        "Cramer's V association between event_type and ISO weekday — "
        "the bounded [0,1] effect-size reading of the chi-square "
        "independence test ('is traffic mix weekday-dependent, and how "
        "much'), which raw chi2 can't give because it grows with N: "
        "V = sqrt(chi2 / (N * min(r-1, c-1))). Every contingency count "
        "is an exact integer; each cell's term uses the cross-"
        "multiplied identity (O*N - R*C)^2 / (N*R*C) evaluated with "
        "the SAME double operations in the same order on both engines "
        "(products of exact-integer-valued doubles round identically; "
        "no subtotal float E=R*C/N is materialized), zero cells are "
        "restored by a row-domain x column-domain grid (a pair that "
        "never co-occurs still owes its (0-E)^2/E term — dropping it "
        "undercounts association; V=1 cases read 0.71 without it), and "
        "the 35-cell sum is an ORDERED fold over the (event_type, "
        "dow)-sorted term "
        "list — no engine-dependent summation order anywhere, the "
        "oracle-float rule for sums that round-6 alone shouldn't be "
        "trusted to absorb. Scale shape: one partial-agg shuffle to "
        "the r x c contingency table; everything after runs on <= 35 "
        "rows at any data scale."
    ),
)
def dq_cramer_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.expr("weekday(ts)") + 1).alias("dow")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").cast("long").alias("r"))
    ct = obs.groupBy("dow").agg(F.sum("o").cast("long").alias("c"))
    n = obs.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("event_type").cast("long").alias("nr"),
        F.countDistinct("dow").cast("long").alias("nc"),
    )
    # full r x c grid: zero cells (pairs that never co-occur) still owe
    # their (0-E)^2/E term — without them a perfect-association table
    # reads V=0.71 instead of 1
    grid = (
        rt.crossJoin(ct)
        .join(obs, ["event_type", "dow"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
    )
    diff = F.col("o").cast("double") * F.col("n") - F.col("r").cast("double") * F.col(
        "c"
    )
    terms = (
        grid.crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "dow",
            "n",
            "nr",
            "nc",
            (diff * diff / (F.col("n").cast("double") * F.col("r") * F.col("c"))).alias(
                "t"
            ),
        )
    )
    chi = terms.groupBy("n", "nr", "nc").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("event_type", "dow", "t"))),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("chi2")
    )
    return chi.select(
        F.col("n").alias("n_rows"),
        F.col("nr").alias("n_row_cats"),
        F.col("nc").alias("n_col_cats"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))),
            6,
        ).alias("cramer_v"),
    )


@query(
    "dq_mutual_information",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority AS x, o_orderstatus AS y,
               CAST(count(*) AS BIGINT) AS n_xy
        FROM orders GROUP BY 1, 2),
    margx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY x),
    margy AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY y),
    tot AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM cells)
    SELECT c.x, c.y, c.n_xy, mx.n_x, my.n_y, t.n,
           round(CAST(mx.n_x AS DOUBLE) * CAST(my.n_y AS DOUBLE)
                 / CAST(t.n AS DOUBLE), 6) AS expected,
           c.n_xy * t.n > mx.n_x * my.n_y AS over_represented,
           round(ln((CAST(c.n_xy AS DOUBLE) * CAST(t.n AS DOUBLE))
                    / (CAST(mx.n_x AS DOUBLE) * CAST(my.n_y AS DOUBLE))), 6)
               AS pmi_nats,
           round((CAST(c.n_xy AS DOUBLE) / CAST(t.n AS DOUBLE))
                 * ln((CAST(c.n_xy AS DOUBLE) * CAST(t.n AS DOUBLE))
                      / (CAST(mx.n_x AS DOUBLE) * CAST(my.n_y AS DOUBLE))), 6)
               AS mi_contribution_nats
    FROM cells c
    JOIN margx mx USING (x) JOIN margy my USING (y) CROSS JOIN tot t
    """,
    doc=(
        "Mutual-information dependence profile between two categorical "
        "columns (order priority x order status), decomposed PER CELL — "
        "the directional complement to dq_cramer_v's single association "
        "statistic: each cell carries its observed count, both margins, "
        "the expected count under independence, and its pointwise "
        "mutual information plus contribution to total MI (sum of the "
        "round-6 contributions = MI in nats). The repo's oracle-float "
        "discipline: all counts and margins are exact integer sums, the "
        "over/under-representation DECISION is the pure integer "
        "comparison n_xy*n vs n_x*n_y (no float at the lift=1 "
        "boundary), and the libm ln() appears only in round-6 PAYLOAD "
        "columns — per cell, never inside a float summation, so no "
        "engine-order drift exists anywhere. Scale shape: one map-side "
        "combined cell aggregate over the raw table, then margins and "
        "the 1-row total derived from the BOUNDED cell table (|X|x|Y| "
        "rows) — at 100 TB the raw scan happens once and everything "
        "downstream is metadata-sized."
    ),
)
def dq_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderpriority").alias("x"), F.col("o_orderstatus").alias("y")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
    cells = cells.persist()
    try:
        margx = cells.groupBy("x").agg(F.sum("n_xy").cast("long").alias("n_x"))
        margy = cells.groupBy("y").agg(F.sum("n_xy").cast("long").alias("n_y"))
        tot = cells.agg(F.sum("n_xy").cast("long").alias("n"))
        j = (
            cells.join(F.broadcast(margx), "x")
            .join(F.broadcast(margy), "y")
            .join(F.broadcast(tot))
        )
        lift = (F.col("n_xy").cast("double") * F.col("n").cast("double")) / (
            F.col("n_x").cast("double") * F.col("n_y").cast("double")
        )
        out = j.select(
            "x",
            "y",
            "n_xy",
            "n_x",
            "n_y",
            "n",
            F.round(
                F.col("n_x").cast("double")
                * F.col("n_y").cast("double")
                / F.col("n").cast("double"),
                6,
            ).alias("expected"),
            (F.col("n_xy") * F.col("n") > F.col("n_x") * F.col("n_y")).alias(
                "over_represented"
            ),
            F.round(F.log(lift), 6).alias("pmi_nats"),
            F.round(
                (F.col("n_xy").cast("double") / F.col("n").cast("double"))
                * F.log(lift),
                6,
            ).alias("mi_contribution_nats"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        cells.unpersist()
