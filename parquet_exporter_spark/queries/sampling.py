"""Corpus sampling operators for training-data curation.

A 100 TB crawl is never trained on whole: pipelines select to a token
budget (highest-value documents per source until the budget is spent)
or sample stratified by source so the mixture matches a recipe. Both
are single-shuffle window/sample operations here.

Scale notes: the budget selection is one shuffle on `source` and a
per-partition running sum — no global sort, no driver materialization.
Stratified sampling is a narrow map (per-row Bernoulli draw keyed by
the stratum fraction), zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_exporter_spark.functions import text as T
from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table, tiny_df

_BUDGET_TOKENS = 20_000  # per-source token budget


@query(
    "sample_tokens_budget",
    oracle=f"""
    WITH sized AS (
        SELECT source, doc_id, n_chars,
               len({T.sql_tokens('text')}) AS n_tokens
        FROM documents
    ),
    ranked AS (
        SELECT source, doc_id, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source
                                   ORDER BY n_chars DESC, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_tokens
        FROM sized
    )
    SELECT source, doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM ranked
    WHERE cum_tokens <= {_BUDGET_TOKENS}
    """,
    doc=(
        "Token-budget curriculum selection: per source, keep documents in "
        "descending-length order (doc_id tiebreak) until the cumulative "
        "token count exceeds the budget. The running sum is a "
        "source-partitioned window — one shuffle, then each partition "
        "scans once; the budget cut happens executor-side, so the driver "
        "never sees the corpus."
    ),
)
def sample_tokens_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    sized = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.size(T.tokens(F.col("text"))).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_chars"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sized.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= _BUDGET_TOKENS)
        .select(
            "source",
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        )
    )


# Mixture recipe: fraction of each source stratum to keep. Sources absent
# from the map are dropped entirely (fraction 0), the sampleBy contract.
STRATA_FRACTIONS = {"src0": 0.2, "src1": 0.8, "src2": 0.5}


@query(
    "sample_stratified",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_population,
           TRUE AS sample_within_4sigma
    FROM documents
    WHERE source IN ('src0', 'src1', 'src2')
    GROUP BY source
    """,
    doc=(
        "Stratified (per-source) sampling with sampleBy: each stratum is "
        "kept at its recipe fraction via an independent Bernoulli draw — "
        "a narrow map over the scan, no shuffle, deterministic under a "
        "fixed seed. BOUNDED-ERROR VERDICT oracle (the engine-private PRNG "
        "makes the row set un-hashable cross-engine): emits each stratum's "
        "exact population count plus a boolean asserting the seeded sample "
        "size lands within 4 binomial standard deviations (+1 for tiny "
        "strata) of fraction*n — a hash match proves per-stratum sampling "
        "ACCURACY, not liveness. Exact-row determinism under the fixed "
        "seed stays asserted in tests/test_operators.py."
    ),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    sampled = (
        docs.sampleBy("source", STRATA_FRACTIONS, seed=42)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    pop = (
        docs.filter(F.col("source").isin(*STRATA_FRACTIONS))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_population"))
    )
    frac = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in STRATA_FRACTIONS.items() for x in kv]
        ),
        F.col("source"),
    )
    joined = pop.join(sampled, "source", "left").select(
        "source",
        "n_population",
        F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        frac.alias("f"),
    )
    bound = 4 * F.sqrt(F.col("n_population") * F.col("f") * (1 - F.col("f"))) + 1
    return joined.select(
        "source",
        "n_population",
        (
            F.abs(F.col("n_sampled") - F.col("f") * F.col("n_population")) <= bound
        ).alias("sample_within_4sigma"),
    )


@query(
    "sample_global_shuffle",
    oracle="""
    SELECT doc_id, source,
           row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS shuffle_pos
    FROM documents
    """,
    doc=(
        "Deterministic global corpus shuffle: pre-training wants examples "
        "in a reproducible pseudo-random order, which is exactly 'assign "
        "contiguous positions in md5(doc_id) order'. Composes the global "
        "row-id operator (operators/ids.py) over the hash key — one range "
        "shuffle, no single-partition sort, same order every run and every "
        "engine."
    ),
)
def sample_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_exporter_spark.operators.ids import global_row_number

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5(F.col("doc_id").cast("string")).alias("__k")
    )
    return global_row_number(docs, ["__k", "doc_id"], id_col="shuffle_pos").select(
        "doc_id", "source", "shuffle_pos"
    )


MIX_TEMPERATURE = 0.7  # the standard multilingual-mixing alpha


@query(
    "sample_mixture_temperature",
    oracle=f"""
    WITH per_source AS (
        SELECT source,
               CAST(sum(len({T.sql_tokens('text')})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    powered AS (
        SELECT source, n_tokens,
               pow(n_tokens, {MIX_TEMPERATURE}) AS p
        FROM per_source
    )
    SELECT source, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / (SELECT sum(n_tokens) FROM powered), 6)
               AS raw_share,
           round(p / (SELECT sum(p) FROM powered), 6) AS temp_share,
           round((p / (SELECT sum(p) FROM powered))
                 / (CAST(n_tokens AS DOUBLE) / (SELECT sum(n_tokens) FROM powered)),
                 6) AS upsample_factor
    FROM powered
    """,
    doc=(
        "Temperature-scaled mixture weights (alpha = 0.7): sampling "
        "shares proportional to tokens^alpha instead of tokens — the "
        "published recipe for up-weighting low-resource sources in a "
        "multilingual/multi-domain corpus without letting any one "
        "source dominate. upsample_factor > 1 marks the sources the "
        "temperature boosts. Shape: one partial-agg scan to per-source "
        "token counts (cardinality = |sources|), then window totals "
        "over that tiny table — the corpus shuffles nothing bigger "
        "than its source list."
    ),
)
def sample_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.sum(F.size(T.tokens(F.col("text")))).cast("long").alias("n_tokens")
    )
    powered = per_source.withColumn(
        "p", F.pow(F.col("n_tokens"), F.lit(MIX_TEMPERATURE))
    )
    w = Window.partitionBy()
    raw_share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)
    temp_share = F.col("p") / F.sum("p").over(w)
    return powered.select(
        "source",
        "n_tokens",
        F.round(raw_share, 6).alias("raw_share"),
        F.round(temp_share, 6).alias("temp_share"),
        F.round(temp_share / raw_share, 6).alias("upsample_factor"),
    )


@query(
    "sample_interleave_sources",
    oracle="""
    SELECT doc_id, source,
           CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
               AS round_ix
    FROM documents
    """,
    doc=(
        "Source-balanced interleave layout: every document gets a round "
        "index = its deterministic md5-order position WITHIN its source, "
        "so reading in (round_ix, source) order round-robins across "
        "sources — the anti-clumping training layout that keeps any "
        "window of examples mixed across domains (the opposite goal of "
        "sample_semantic_order's adjacency, and the other standard "
        "choice). Per-source windows only — cardinality-bounded, no "
        "global order; the final global id at write time composes with "
        "ids_global_rownum exactly like the semantic layout."
    ),
)
def sample_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("long").alias("round_ix"),
    )


@query(
    "sample_balanced_classes",
    oracle="""
    WITH counts AS (
        SELECT lang, count(*) AS n FROM documents GROUP BY 1
    ), m AS (SELECT min(n) AS min_n FROM counts),
    ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    )
    SELECT doc_id, lang FROM ranked, m WHERE rn <= min_n
    """,
    doc=(
        "Class-balanced downsample: every language keeps exactly the "
        "minority class's count, selected in deterministic md5 order "
        "within each class — the standard rebalancing step before "
        "training a classifier on skewed labels. One per-class window "
        "(keyed exchange) plus a 1-row min-count broadcast; nothing "
        "global. The same shape serves any per-group quota."
    ),
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    m = counts.agg(F.min("n").alias("min_n"))
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
    return (
        ranked.join(F.broadcast(m))
        .filter(F.col("rn") <= F.col("min_n"))
        .select("doc_id", "lang")
    )


@query(
    "sample_proportional_quota",
    oracle="""
    WITH c AS (
        SELECT source, count(*) AS n FROM documents GROUP BY 1
    ), t AS (SELECT sum(n) AS total FROM c),
    alloc AS (
        SELECT source, n,
               floor(1000.0 * n / total) AS base_quota,
               1000.0 * n / total - floor(1000.0 * n / total) AS frac,
               1000 - sum(floor(1000.0 * n / total)) OVER () AS leftover
        FROM c, t
    )
    SELECT source, CAST(n AS BIGINT) AS n,
           CAST(base_quota
                + CASE WHEN row_number() OVER (ORDER BY frac DESC, source) <= leftover
                       THEN 1 ELSE 0 END AS BIGINT) AS quota
    FROM alloc
    """,
    doc=(
        "Proportional quota allocation with largest-remainder rounding: "
        "a fixed budget of 1000 samples split across sources in "
        "proportion to size, floors first, then the leftover units go "
        "to the largest fractional parts (deterministic source "
        "tie-break) so quotas sum to the budget EXACTLY — the allocation "
        "step in front of sample_stratified/sample_per_group_cap. All "
        "windows run over the |sources|-row aggregate."
    ),
)
def sample_proportional_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    share = 1000.0 * F.col("n") / F.col("total")
    alloc = c.join(F.broadcast(t)).select(
        "source",
        "n",
        F.floor(share).alias("base_quota"),
        (share - F.floor(share)).alias("frac"),
    )
    alloc = alloc.withColumn(
        "leftover", 1000 - F.sum("base_quota").over(Window.partitionBy())
    )
    rn = F.row_number().over(Window.orderBy(F.col("frac").desc(), "source"))
    return alloc.select(
        "source",
        F.col("n").cast("long").alias("n"),
        (F.col("base_quota") + F.when(rn <= F.col("leftover"), 1).otherwise(0))
        .cast("long")
        .alias("quota"),
    )


@query(
    "sample_hash_rate_sweep",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               ('0x' || substring(md5('rate:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS unif
        FROM documents
    )
    SELECT r.rate,
           CAST(count(*) FILTER (WHERE unif < r.rate) AS BIGINT) AS n_kept,
           round(count(*) FILTER (WHERE unif < r.rate) / CAST(count(*) AS DOUBLE), 6)
               AS achieved_rate
    FROM u CROSS JOIN (VALUES (0.01), (0.1), (0.5)) AS r(rate)
    GROUP BY 1 ORDER BY 1
    """,
    doc=(
        "Deterministic Bernoulli sampler calibration: the md5-derived "
        "uniform (first 8 hex digits / 2^32 — the same keyed-hash "
        "uniform sample_weighted uses) swept against target keep rates, "
        "reporting achieved vs requested — both the sampler primitive "
        "and the evidence it is unbiased, hash-matched across engines. "
        "Nested sampling property holds by construction: the 1% sample "
        "is a subset of the 10% sample."
    ),
)
def sample_hash_rate_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    unif = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("rate:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    u = docs.select(unif.alias("unif"))
    rates = tiny_df(spark, [(0.01,), (0.1,), (0.5,)], "rate: double")
    rep = u.crossJoin(F.broadcast(rates))
    kept = F.col("unif") < F.col("rate")
    return (
        rep.groupBy("rate")
        .agg(
            F.count(F.when(kept, 1)).cast("long").alias("n_kept"),
            F.round(F.count(F.when(kept, 1)) / F.count(F.lit(1)).cast("double"), 6).alias(
                "achieved_rate"
            ),
        )
        .orderBy("rate")
    )


@query(
    "sample_systematic_every_k",
    oracle="""
    WITH pos AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS rn
        FROM documents
    )
    SELECT doc_id, source, n_chars, CAST(rn AS BIGINT) AS rn
    FROM pos WHERE rn % 10 = 1
    """,
    doc=(
        "Systematic (every-k-th) sampling: a deterministic hash order "
        "gives an implicit shuffle, then rows at positions 1, k+1, 2k+1, "
        "... are taken — the classic audit/QA draw (exactly ceil(N/k) "
        "rows, evenly spread through the randomized order, reproducible "
        "for review). Positions come from the global contiguous row-id "
        "operator (operators/ids.py: range-partitioned offsets + "
        "mapInPandas increments — NO single-partition global sort), so "
        "the draw distributes; the oracle spells the same positions as a "
        "window over the same md5 order."
    ),
)
def sample_systematic_every_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_exporter_spark.operators.ids import global_row_number

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", F.md5(F.col("doc_id").cast("string")).alias("__h")
    )
    numbered = global_row_number(docs, sort_cols=["__h", "doc_id"], id_col="rn")
    return numbered.filter(F.col("rn") % 10 == 1).select(
        "doc_id", "source", "n_chars", "rn"
    )


@query(
    "sample_neyman_allocation",
    oracle="""
    WITH strata AS (
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_pop,
               round(stddev_pop(c_acctbal), 4) AS sigma
        FROM customer GROUP BY 1
    ),
    w AS (
        SELECT *, n_pop * sigma AS wt,
               sum(n_pop * sigma) OVER () AS wt_total
        FROM strata
    ),
    alloc AS (
        SELECT c_mktsegment, n_pop, sigma,
               round(wt / wt_total, 6) AS share,
               CAST(floor(100 * wt / wt_total) AS BIGINT) AS base_n,
               100 * wt / wt_total - floor(100 * wt / wt_total) AS rem,
               CAST(100 - sum(CAST(floor(100 * wt / wt_total) AS BIGINT))
                        OVER () AS BIGINT) AS leftover
        FROM w
    )
    SELECT c_mktsegment, n_pop, sigma, share,
           base_n + CASE WHEN row_number() OVER (
                        ORDER BY rem DESC, c_mktsegment) <= leftover
                    THEN 1 ELSE 0 END AS n_alloc
    FROM alloc
    """,
    doc=(
        "Neyman allocation for stratified sampling: a fixed budget of "
        "n=100 draws split across strata proportionally to N_h * sigma_h "
        "— the variance-optimal design (big AND volatile strata get more "
        "samples; uniform or proportional allocation wastes budget on "
        "homogeneous strata). Integer counts come from floor + "
        "largest-remainder so allocations sum to exactly n. sigma is "
        "rounded to 4dp BEFORE it enters the weights, so both engines "
        "derive every downstream share/floor/rank from bit-identical "
        "inputs (raw stddev differs in the last ulp between Welford and "
        "co-moment accumulations, which could flip a knife-edge "
        "remainder rank). One aggregate over the table; everything "
        "after is a |strata|-row computation. Pairs with "
        "sample_stratified (the executing sampler) and "
        "sample_proportional_quota (the size-only variant)."
    ),
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    strata = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_pop"),
        F.round(F.stddev_pop("c_acctbal"), 4).alias("sigma"),
    )
    w_all = Window.partitionBy()
    w = strata.select(
        "*",
        (F.col("n_pop") * F.col("sigma")).alias("wt"),
    ).withColumn("wt_total", F.sum("wt").over(w_all))
    alloc = w.select(
        "c_mktsegment",
        "n_pop",
        "sigma",
        F.round(F.col("wt") / F.col("wt_total"), 6).alias("share"),
        F.floor(100 * F.col("wt") / F.col("wt_total"))
        .cast("long")
        .alias("base_n"),
        (
            100 * F.col("wt") / F.col("wt_total")
            - F.floor(100 * F.col("wt") / F.col("wt_total"))
        ).alias("rem"),
    ).withColumn(
        "leftover", (100 - F.sum("base_n").over(w_all)).cast("long")
    )
    rnk = F.row_number().over(
        Window.orderBy(F.col("rem").desc(), F.col("c_mktsegment"))
    )
    return alloc.select(
        "c_mktsegment",
        "n_pop",
        "sigma",
        "share",
        (
            F.col("base_n")
            + F.when(rnk <= F.col("leftover"), 1).otherwise(0)
        ).alias("n_alloc"),
    )
