"""Round-8 additions: containment dedup, winnowing fingerprints, MERGE
upsert emulation, priority (PPSWOR) sampling, irregular-gap EWMA.

Each follows the established contract: a Spark-first plan plus a DuckDB
oracle on portable arithmetic (md5-derived 28-bit base hashes, rational
decay instead of transcendentals, sequential folds that are bit-identical
across engines — see functions/dedup.py and the oracle-float rules in
registry.py's module docstring).

Reference parity note: the reference engine (OpenBeta/parquet-exporter,
export.py) delegates querying to embedded DuckDB; these operators extend
the training-data-pipeline surface beyond it, per SURVEY.md §2's extended
inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_exporter_spark.functions import dedup as D
from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table

_FP_MAXDF = 20  # drop fingerprints shared by more docs (stop-fingerprints)
_FP_MIN_SHARED = 2  # candidate pairs must share at least this many


@query(
    "dedup_winnow_containment",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               [{D.sql_base_hash_31("substring(t, i, 7)")}
                for i in generate_series(1, greatest(len(t) - 6, 1))] AS h
        FROM norm
    ),
    fps AS (
        SELECT doc_id, unnest(list_distinct(
                   [list_min(h[greatest(1, j - 3):j])
                    for j in generate_series(1, len(h))])) AS fp
        FROM grams
    ),
    kept AS (
        SELECT fp FROM fps GROUP BY fp
        HAVING count(*) <= {_FP_MAXDF}
    ),
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM fps a JOIN kept USING (fp) JOIN fps b USING (fp)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= {_FP_MIN_SHARED}
    ),
    sh AS (
        SELECT doc_id, {D.sql_char_shingles("text")} AS s FROM documents
    ),
    scored AS (
        SELECT c.id_a, c.id_b,
               round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                     / len(sa.s), 6) AS cont_a_in_b,
               round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                     / len(sb.s), 6) AS cont_b_in_a
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.id_a
        JOIN sh sb ON sb.doc_id = c.id_b
    )
    SELECT id_a, id_b, cont_a_in_b, cont_b_in_a
    FROM scored
    WHERE greatest(cont_a_in_b, cont_b_in_a) >= 0.5
    """,
    doc=(
        "ASYMMETRIC near-dup detection: shingle containment "
        "|A intersect B| / |A| instead of Jaccard — the right measure "
        "when one document is embedded in a larger one (quoted posts, "
        "boilerplate-wrapped articles, benchmark text pasted into a "
        "crawl page), where Jaccard is diluted by the larger doc's size "
        "but containment of the smaller side stays ~1. Candidate "
        "generation deliberately does NOT reuse the MinHash bands: "
        "band-collision probability tracks JACCARD, so Jaccard-banded "
        "candidates structurally miss exactly the asymmetric pairs this "
        "measure exists for (verified by the small-in-big test before "
        "this design replaced it). Candidates instead come from shared "
        "WINNOWING fingerprints — any shared substring of k+w-1 chars "
        "guarantees a common fingerprint irrespective of the docs' "
        "sizes — with a stop-fingerprint document-frequency cap "
        f"(<= {_FP_MAXDF} docs) and a >= {_FP_MIN_SHARED}-shared-"
        "fingerprint threshold bounding the equi-join fanout; exact "
        "containment verify runs on candidates only."
    ),
)
def dedup_winnow_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return D.winnow_containment_pairs(
        docs,
        winnowing_fingerprints,
        max_fp_df=_FP_MAXDF,
        min_shared=_FP_MIN_SHARED,
        containment_threshold=0.5,
    )


_WIN_K, _WIN_W = 7, 4
# Spark-SQL spelling of functions/dedup.base_hash_31 (conv returns a
# string; the cast makes the modulus integer arithmetic).
_SPARK_HASH = (
    f"CAST(conv(substring(md5({{s}}), 1, 7), 16, 10) AS BIGINT) % {D.MERSENNE_31}"
)


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = _WIN_K,
    w: int = _WIN_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, fingerprint) rows — the winnowing selection over ``text_col``.

    Both the normalized text and the gram-hash array are bound as lambda
    variables via one-element arrays so each is evaluated ONCE per row.
    Referencing them as projected columns is NOT enough: CollapseProject
    inlines the defining expression into every lambda position — the
    normalization re-runs per gram and the whole md5-transform re-runs
    per window, O(len^2) per document (this exact plan hung the sf0.001
    oracle check before the bind; same trap as
    functions/dedup.char_shingles)."""
    gram_hash = _SPARK_HASH.format(s=f"substring(t, i, {k})")
    fps = F.expr(
        "array_distinct(flatten(flatten("
        f"transform(array(trim(regexp_replace(lower({text_col}), '\\\\s+', ' '))), t -> "
        f"transform(array(transform(sequence(1, greatest(length(t) - {k - 1}, 1)), "
        f"i -> {gram_hash})), h -> "
        f"transform(sequence(1, size(h)), "
        f"j -> array_min(slice(h, greatest(1, j - {w - 1}), least(j, {w})))))"
        "))))"
    )
    return docs.select(F.col(id_col), F.explode(fps).alias("fingerprint"))



@query(
    "text_kgram_winnowing",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
        FROM documents WHERE doc_id < 300
    ),
    grams AS (
        SELECT doc_id,
               [{D.sql_base_hash_31(f"substring(t, i, {_WIN_K})")}
                for i in generate_series(1, greatest(len(t) - {_WIN_K - 1}, 1))] AS h
        FROM norm
    ),
    fps AS (
        SELECT doc_id,
               list_distinct([list_min(h[greatest(1, j - {_WIN_W - 1}):j])
                              for j in generate_series(1, len(h))]) AS fp
        FROM grams
    )
    SELECT doc_id, unnest(fp) AS fingerprint FROM fps
    """,
    doc=(
        "Winnowing document fingerprints (Schleimer et al., MOSS): hash "
        f"every {_WIN_K}-char k-gram, slide a window of {_WIN_W} hashes, "
        "keep each window's minimum, dedupe — guaranteeing any shared "
        "substring of length k+w-1 contributes at least one COMMON "
        "fingerprint, so local plagiarism/contamination survives "
        "surrounding edits that break whole-document MinHash. "
        "Prefix-inclusive variant: windows shorter than w at the start "
        "keep their prefix minimum (deterministic in both engines; the "
        "canonical rightmost-tie rule needs positions, not values). "
        "Narrow per-doc compute (the HOF chain) + one distinct — at "
        "100 TB fingerprints equi-join across docs for match candidates, "
        "the same index shape as the MinHash band store."
    ),
)
def text_kgram_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return winnowing_fingerprints(D._widen_if_undersplit(docs))


@query(
    "sql_merge_upsert",
    oracle="""
    WITH tgt AS (
        SELECT c_custkey, round(c_acctbal, 2) AS bal
        FROM customer WHERE c_custkey < 3000
    ),
    src AS (
        SELECT o_custkey AS k, round(sum(o_totalprice), 2) AS total
        FROM orders WHERE o_custkey % 2 = 0 GROUP BY o_custkey
        UNION ALL
        SELECT o_custkey + 3000000 AS k, round(sum(o_totalprice), 2) AS total
        FROM orders WHERE o_custkey < 200 GROUP BY o_custkey
    )
    SELECT
        coalesce(t.c_custkey, s.k) AS c_custkey,
        CASE WHEN s.k IS NULL THEN 'kept'
             WHEN t.c_custkey IS NULL THEN 'inserted'
             ELSE 'updated' END AS action,
        round(CASE WHEN s.k IS NULL THEN t.bal
                   WHEN t.c_custkey IS NULL THEN s.total
                   ELSE t.bal + s.total END, 2) AS new_bal
    FROM tgt t FULL OUTER JOIN src s ON s.k = t.c_custkey
    WHERE NOT (t.c_custkey IS NOT NULL AND s.k IS NOT NULL
               AND s.k % 10 = 0)
    """,
    doc=(
        "MERGE INTO emulation on plain parquet — the upsert primitive "
        "Delta/Iceberg expose natively, expressed as ONE full-outer join "
        "+ conditional projection + anti-filter: WHEN MATCHED AND "
        "key % 10 = 0 THEN DELETE (a deterministic business-key churn "
        "rule, chosen so the branch actually fires at every SF — a "
        "value predicate like total < 5000 never would on this data), "
        "WHEN MATCHED THEN UPDATE (bal += total), WHEN NOT MATCHED THEN "
        "INSERT, unmatched targets kept. All four branches exercised at "
        "EVERY scale factor: the source covers the even-keyed half of "
        "the targets (a fixed key cutoff broke at sf0.001, where every "
        "customer has orders), plus synthetic new keys; "
        "tests/test_round8_ops.py pins branch presence). Scale shape: "
        "one shuffle per side on the merge key — identical to what a "
        "table format's MERGE executes; rewriting only matched files is "
        "the format's job, not the plan's."
    ),
)
def sql_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    tgt = cust.filter(F.col("c_custkey") < 3000).select(
        "c_custkey", F.round("c_acctbal", 2).alias("bal")
    )
    base = orders.filter(F.col("o_custkey") % 2 == 0).groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total")
    )
    novel = (
        orders.filter(F.col("o_custkey") < 200)
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select((F.col("o_custkey") + 3000000).alias("o_custkey"), "total")
    )
    src = base.unionByName(novel).withColumnRenamed("o_custkey", "k")
    j = tgt.join(src, tgt.c_custkey == src.k, "full_outer")
    matched = tgt.c_custkey.isNotNull() & src.k.isNotNull()
    return (
        j.filter(~(matched & (src.k % 10 == 0)))  # WHEN MATCHED ... DELETE
        .select(
            F.coalesce(tgt.c_custkey, src.k).alias("c_custkey"),
            F.when(src.k.isNull(), F.lit("kept"))
            .when(tgt.c_custkey.isNull(), F.lit("inserted"))
            .otherwise(F.lit("updated"))
            .alias("action"),
            F.round(
                F.when(src.k.isNull(), tgt.bal)
                .when(tgt.c_custkey.isNull(), src.total)
                .otherwise(tgt.bal + src.total),
                2,
            ).alias("new_bal"),
        )
    )


_PPS_N = 200


@query(
    "sample_priority_ppswor",
    oracle=f"""
    WITH keyed AS (
        SELECT o_orderkey, o_totalprice,
               ({D.sql_base_hash_31("CAST(o_orderkey AS VARCHAR)")} + 1)
                   / 268435456.0 AS u
        FROM orders
    ),
    pri AS (
        SELECT o_orderkey, round(o_totalprice, 2) AS weight,
               round(o_totalprice / u, 6) AS priority
        FROM keyed
    )
    SELECT o_orderkey, weight, priority,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (ORDER BY priority DESC, o_orderkey) AS rnk
        FROM pri
    ) WHERE rnk <= {_PPS_N}
    """,
    doc=(
        "Priority sampling (PPSWOR — probability proportional to size, "
        "without replacement; Duffield/Lund/Thorup): each record draws "
        "u from a deterministic portable hash (28-bit md5 prefix -> "
        "(h+1)/2^28, never 0), priority = weight/u, keep the global "
        "top-n by priority. The standard one-pass weighted sample for "
        "training-data selection — heavy documents enter with "
        "probability ~min(1, n*w/W) and the estimator stays unbiased "
        "under the priority threshold. Scale shape: narrow scoring + "
        "global top-n (WindowGroupLimit prunes each partition to n "
        "before the single-partition cut — the same shape as "
        "topk_global, no full sort). Priority is rounded to 6dp on both "
        "engines BEFORE ranking (round-before-rank rule)."
    ),
)
def sample_priority_ppswor(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    u = (D.base_hash_31(F.col("o_orderkey").cast("string")) + 1) / F.lit(
        268435456.0
    )
    pri = orders.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("weight"),
        F.round(F.col("o_totalprice") / u, 6).alias("priority"),
    )
    w = Window.orderBy(F.col("priority").desc(), F.col("o_orderkey"))
    return (
        pri.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _PPS_N)
    )


_EWMA_TAU = 3600.0  # rational-decay time constant, seconds


@query(
    "timeseries_ewma_irregular",
    oracle=f"""
    WITH pts AS (
        SELECT user_id,
               list([CAST(epoch(ts) AS DOUBLE), value]
                    ORDER BY ts, event_id) AS xs
        FROM events WHERE user_id < 200 AND value IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(xs) AS BIGINT) AS n_points,
           round(list_reduce(xs, (acc, x) -> [
               x[1],
               acc[2] + ((x[1] - acc[1]) / ((x[1] - acc[1]) + {_EWMA_TAU}))
                        * (x[2] - acc[2])
           ])[2], 6) AS ewma
    FROM pts
    """,
    doc=(
        "EWMA over IRREGULARLY-spaced events: classic EWMA assumes a "
        "fixed tick; real event streams don't have one. Decay per step "
        "uses the RATIONAL gap weight a = dt/(dt+tau) (tau=1h) — same "
        "limiting behavior as 1-exp(-dt/tau) (a->0 for bursts, a->1 "
        "after long gaps) but pure arithmetic, so the sequential fold "
        "is bit-identical across engines (exp/pow are libm calls that "
        "may differ in the last ulp — the oracle-float rule). The fold "
        "runs as F.aggregate over each user's time-sorted points "
        "(DuckDB: list_reduce), seeded with the first point, ties "
        "broken by event_id. Scale shape: one shuffle on user_id; "
        "per-user state is O(1) — the same recurrence ships as the "
        "streaming stateful operator's update rule."
    ),
)
def timeseries_ewma_irregular(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 200) & F.col("value").isNotNull()
    )
    pts = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("ts").cast("double").alias("t"),
                    F.col("event_id").cast("double").alias("e"),
                    F.col("value").cast("double").alias("v"),
                )
            )
        ).alias("xs")
    )
    # DuckDB's list_reduce seeds with the first element; mirror exactly:
    # acc = (t_0, v_0), fold over the tail.
    fold = F.aggregate(
        F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
        F.struct(
            F.element_at("xs", 1).t.alias("t"),
            F.element_at("xs", 1).v.alias("s"),
        ),
        lambda acc, x: F.struct(
            x.t.alias("t"),
            (
                acc.s
                + ((x.t - acc.t) / ((x.t - acc.t) + F.lit(_EWMA_TAU)))
                * (x.v - acc.s)
            ).alias("s"),
        ),
    )
    return pts.select(
        "user_id",
        F.size("xs").cast("long").alias("n_points"),
        F.round(fold.s, 6).alias("ewma"),
    )
