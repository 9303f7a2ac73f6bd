"""Second wave of LLM-data-pipeline operators: PII redaction, repetition
analysis, boilerplate detection, benchmark-contamination checks, embedding
quantization, corpus reporting, and an end-to-end cleaning pipeline.

Like queries/llm.py, every operator is a composition of built-in Catalyst
expressions (JVM-side, whole-stage codegen) with an exact DuckDB SQL twin,
so all of them are oracle-checked. Regex patterns are shared constants —
both Java regex and DuckDB's RE2 accept the dialect subset used here
(char classes, bounded repetition, ``\\b``, ``\\d``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_exporter_spark.functions import dedup as D
from parquet_exporter_spark.functions import text as T
from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table

# --------------------------------------------------------- PII redaction

# Patterns are valid in both Java regex (Spark) and RE2 (DuckDB).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{4}\b"


def redact_pii(raw) -> "F.Column":
    """Mask emails, then IPs, then phones. Order matters: emails embed
    digits, so the narrower numeric patterns must run after; the
    replacement tokens contain no digits, so no pass can create a match
    for a later pass (property-tested in tests/test_properties.py)."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )


@query(
    "text_pii_redaction",
    oracle=f"""
    WITH seeded AS (
        SELECT doc_id,
               text || ' Contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or call 555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                    || '.7' AS raw
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{EMAIL_RE}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(raw, '{IPV4_RE}')) AS INTEGER) AS n_ips,
           regexp_replace(
               regexp_replace(
                   regexp_replace(raw, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{IPV4_RE}', '<IP>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM seeded
    """,
    doc=(
        "PII redaction for training corpora: count and mask emails, IPv4 "
        "addresses, and phone numbers with shared Java/RE2-compatible "
        "regexes. The corpus is synthetic word soup, so deterministic PII "
        "is seeded from doc_id first — the operator under test is the "
        "count+mask pass, a pure per-row expression (no shuffle). "
        "Masking order matters: emails first (they embed digits), then "
        "IPs, then phones, so the narrower patterns never eat a prefix of "
        "a wider match."
    ),
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    redacted = redact_pii(raw)
    return docs.select(
        "doc_id",
        F.regexp_count(raw, F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(raw, F.lit(IPV4_RE)).cast("int").alias("n_ips"),
        redacted.alias("redacted"),
    )


# ----------------------------------------------------- repetition analysis


def repetition_ratios(docs: DataFrame) -> DataFrame:
    """docs(doc_id, text) -> per-doc top-bigram and duplicate-bigram
    fractions (docs with <2 tokens have no bigrams and produce no row)."""
    toks = T.tokens(F.col("text"))
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    counts = (
        docs.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy("doc_id").agg(
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_bigram_frac"),
        F.round(1.0 - F.count(F.lit(1)).cast("double") / F.sum("c"), 6).alias(
            "dup_bigram_frac"
        ),
    )


@query(
    "text_repetition_ratio",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {T.sql_tokens('text')} AS t FROM documents
    ),
    bigrams AS (
        SELECT doc_id,
               unnest([t[i] || ' ' || t[i + 1]
                       for i in generate_series(1, len(t) - 1)]) AS bigram
        FROM toks
    ),
    counts AS (
        SELECT doc_id, bigram, count(*) AS c
        FROM bigrams GROUP BY doc_id, bigram
    )
    SELECT doc_id,
           round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_bigram_frac,
           round(1.0 - CAST(count(*) AS DOUBLE) / sum(c), 6) AS dup_bigram_frac
    FROM counts
    GROUP BY doc_id
    """,
    doc=(
        "Repetition quality signals (Gopher-rule style): the fraction of "
        "bigrams taken by the single most frequent bigram, and the "
        "fraction of bigram occurrences that are repeats. High values "
        "flag boilerplate/spam documents. One explode + one aggregation "
        "shuffle keyed by (doc, bigram) — repetition is computed inside "
        "each document, so the key never skews across documents."
    ),
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_ratios(read_table(spark, sf_dir, "documents"))


@query(
    "dedup_boilerplate_chunks",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {T.sql_tokens('text')} AS t FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               unnest([array_to_string(list_slice(t, i * 10 + 1, i * 10 + 10), ' ')
                       for i in generate_series(0, CAST(floor(len(t) / 10) AS INT) - 1)])
                   AS chunk
        FROM toks
    )
    SELECT chunk, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM chunks
    GROUP BY chunk
    HAVING count(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, chunk
    LIMIT 50
    """,
    doc=(
        "Cross-document boilerplate detection: split each document into "
        "non-overlapping 10-token chunks and surface chunks shared by >=2 "
        "documents (headers, footers, license blurbs in a real crawl). "
        "At 100 TB the group-by key is xxhash64(chunk) so the shuffle "
        "carries 8-byte keys; here the chunk text itself is kept so the "
        "result is oracle-comparable."
    ),
)
def dedup_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    n_chunks = F.floor(F.size(toks) / 10).cast("int")
    chunks = F.when(n_chunks >= 1, F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * 10 + 1, 10), " "),
    )).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", F.explode(chunks).alias("chunk"))
        .groupBy("chunk")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "chunk")
        .limit(50)
    )


# ------------------------------------------------- benchmark contamination


@query(
    "text_contamination_check",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, {T.sql_tokens('text')} AS t FROM documents
    ),
    grams AS (
        SELECT doc_id, source,
               unnest(list_distinct(
                   [array_to_string(list_slice(t, i, i + 7), ' ')
                    for i in generate_series(1, len(t) - 7)])) AS gram
        FROM toks
    ),
    bench AS (
        SELECT DISTINCT gram FROM grams WHERE source = 'src0'
    ),
    corpus AS (
        SELECT doc_id, gram FROM grams WHERE source <> 'src0'
    )
    SELECT corpus.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           round(CAST(sum(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS contamination_frac
    FROM corpus LEFT JOIN bench ON corpus.gram = bench.gram
    GROUP BY corpus.doc_id
    """,
    doc=(
        "Benchmark-contamination check (the n-gram overlap test run before "
        "training): docs from source 'src0' act as the held-out benchmark; "
        "every other document reports what fraction of its distinct 8-token "
        "grams appear verbatim in the benchmark. The benchmark gram set is "
        "small after distinct -> broadcast the join side; at 100 TB both "
        "sides join on xxhash64(gram) instead of gram text."
    ),
)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    n = F.size(toks)
    grams_arr = F.when(n >= 8, F.array_distinct(F.transform(
        F.sequence(F.lit(1), n - 7),
        lambda i: F.array_join(F.slice(toks, i, 8), " "),
    ))).otherwise(F.array().cast("array<string>"))
    grams = docs.select("doc_id", "source", F.explode(grams_arr).alias("gram"))
    bench = (
        grams.filter(F.col("source") == "src0")
        .select(F.col("gram").alias("bench_gram"))
        .distinct()
    )
    corpus = grams.filter(F.col("source") != "src0")
    return (
        corpus.join(
            F.broadcast(bench), corpus.gram == F.col("bench_gram"), "left_outer"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("bench_gram").isNotNull(), 1).otherwise(0)
            ).alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            F.round(
                F.col("n_contaminated").cast("double") / F.col("n_grams"), 6
            ).alias("contamination_frac"),
        )
    )


# ------------------------------------------------- embedding quantization


def quantize_int8(e) -> "F.Column":
    """Symmetric int8 quantization of an array<double> column: scale by
    127/max|x| and round half-away-from-zero. The max-|x| element maps to
    exactly +/-127; reconstruction error is bounded by max|x|/254 per
    element (property-tested)."""
    max_abs = F.array_max(F.transform(e, lambda x: F.abs(x)))
    return F.transform(e, lambda x: F.round(127.0 * x / max_abs).cast("int"))


@query(
    "emb_quantize_int8",
    oracle="""
    WITH d AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        WHERE vec_id < 100
    )
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(e, x -> x * x))), 6) AS l2_norm,
           round(list_max(list_transform(e, x -> abs(x))), 6) AS max_abs,
           array_to_string(
               list_transform(e, x -> CAST(round(
                   127.0 * x / list_max(list_transform(e, y -> abs(y)))) AS INTEGER)),
               ',') AS q_int8
    FROM d
    """,
    doc=(
        "Symmetric int8 embedding quantization (the storage/serving format "
        "for ANN at scale): scale by 127/max|x| per vector and round. "
        "Per-row lambda expressions only — no shuffle, and float->double "
        "widening plus sequential list folds make both engines' doubles "
        "bit-identical before the shared round-half-away-from-zero. The "
        "int8 vector is comma-joined to a scalar string for the driver "
        "canonicalizer."
    ),
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    e = F.col("embedding").cast("array<double>")
    max_abs = F.array_max(F.transform(e, lambda x: F.abs(x)))
    sq_sum = F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x)
    return emb.select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.round(max_abs, 6).alias("max_abs"),
        F.array_join(quantize_int8(e), ",").alias("q_int8"),
    )


# ----------------------------------------------------------- corpus report


@query(
    "corpus_source_stats",
    oracle=f"""
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len({T.sql_tokens('text')})) AS BIGINT) AS total_tokens,
           round(sum(round({T.sql_quality_score('text')} * 1000000))
                 / count(*)) / 1000000 AS mean_quality,
           round(median(n_chars), 2) AS median_chars
    FROM documents
    GROUP BY source, lang
    ORDER BY source, lang
    """,
    doc=(
        "Per-(source, lang) corpus report: volume, token totals, mean "
        "quality, median length — the summary table a dataset card is "
        "built from. One partial-aggregated shuffle on a low-cardinality "
        "key; the exact median is fine per-group at this cardinality, at "
        "100 TB swap in approx_percentile."
    ),
)
def corpus_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(T.tokens(F.col("text"))).cast("bigint")).alias("total_tokens"),
            # integerize before summing AND round in micro-unit space:
            # micro-unit sums are exact in a double, and a k.5 midpoint is
            # exactly representable there, so both engines' round() agree —
            # rounding after the 1e-6 division knife-edges on the engines'
            # differing decimal-midpoint algorithms
            (
                F.round(
                    F.sum(F.round(T.quality_score(F.col("text")) * 1000000))
                    / F.count(F.lit(1))
                )
                / 1000000
            ).alias("mean_quality"),
            F.round(F.median("n_chars"), 2).alias("median_chars"),
        )
        .orderBy("source", "lang")
    )


# ------------------------------------------------- end-to-end clean pipeline


@query(
    "cleaning_pipeline_kept",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source, {D.sql_char_shingles("text")} AS sh,
               {T.sql_fingerprint('text')} AS fp
        FROM documents
        WHERE lang = 'en' AND {T.sql_quality_score('text')} >= 0.45
    ),
    exact_kept AS (
        SELECT min(doc_id) AS doc_id FROM scored GROUP BY fp
    ),
    survivors AS (
        SELECT s.doc_id, s.source, s.sh
        FROM scored s JOIN exact_kept USING (doc_id)
    ),
    near_pairs AS (
        SELECT b.doc_id AS drop_id
        FROM survivors a JOIN survivors b
          ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    )
    SELECT doc_id FROM survivors
    WHERE doc_id NOT IN (SELECT drop_id FROM near_pairs)
    ORDER BY doc_id
    """,
    doc=(
        "End-to-end corpus cleaning: language filter -> quality filter "
        "(composite score >= 0.45) -> exact dedup (keep the lowest doc_id "
        "per content fingerprint) -> near-dup removal (drop any doc whose "
        "5-char-shingle Jaccard with a lower-id survivor in the same "
        "source block is >= 0.5). Each stage is the scale-ready form: "
        "fingerprint group-by, blocked pair join, anti join — the LSH "
        "variant swaps the blocked join for banding with identical "
        "downstream wiring."
    ),
)
def cleaning_pipeline_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    scored = (
        docs.filter(
            (F.col("lang") == "en") & (T.quality_score(F.col("text")) >= 0.45)
        )
        .select(
            "doc_id",
            "source",
            D.char_shingles(F.col("text")).alias("sh"),
            T.fingerprint(F.col("text")).alias("fp"),
        )
    )
    exact_kept = scored.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    survivors = scored.join(
        exact_kept, scored.doc_id == F.col("keep_id"), "left_semi"
    ).persist()
    a = survivors.select(
        F.col("doc_id").alias("id_a"), "source", F.col("sh").alias("sh_a")
    )
    b = survivors.select(
        F.col("doc_id").alias("id_b"),
        F.col("source").alias("source_b"),
        F.col("sh").alias("sh_b"),
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    drops = (
        a.join(
            b,
            (F.col("source") == F.col("source_b")) & (F.col("id_a") < F.col("id_b")),
        )
        .filter(jac >= 0.5)
        .select(F.col("id_b").alias("drop_id"))
        .distinct()
    )
    return (
        survivors.join(drops, survivors.doc_id == F.col("drop_id"), "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    )


# ------------------------------------------------- train/holdout split


@query(
    "split_train_holdout",
    oracle="""
    SELECT doc_id,
           CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS INT) AS bucket,
           CASE WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 < 90
                THEN 'train' ELSE 'holdout' END AS split
    FROM documents
    """,
    doc=(
        "Deterministic content-hash train/holdout split: bucket = "
        "md5(text) first 8 hex chars mod 100, <90 -> train. Hashing the "
        "CONTENT (not the id) keeps exact duplicates in the same split, "
        "so the holdout can't leak via copies; no RNG, so the split is "
        "reproducible across runs and engines."
    ),
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint") % 100
    ).cast("int")
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 90, "train").otherwise("holdout").alias("split"),
    )


@query(
    "text_boilerplate_strip_rebuild",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {T.sql_tokens('text')} AS t FROM documents
    ),
    ch AS (
        SELECT doc_id,
               unnest([array_to_string(list_slice(t, i * 10 + 1, i * 10 + 10), ' ')
                       for i in generate_series(0, CAST(floor(len(t) / 10) AS INT) - 1)])
                   AS chunk,
               unnest([i for i in generate_series(0, CAST(floor(len(t) / 10) AS INT) - 1)])
                   AS idx
        FROM toks
    ),
    freq AS (
        SELECT chunk, count(DISTINCT doc_id) AS nd FROM ch GROUP BY chunk
    ),
    rebuilt AS (
        SELECT c.doc_id,
               string_agg(CASE WHEN f.nd < 3 THEN c.chunk END, ' ' ORDER BY c.idx)
                   AS cleaned,
               count(*) FILTER (WHERE f.nd < 3) AS n_kept,
               count(*) FILTER (WHERE f.nd >= 3) AS n_dropped
        FROM ch c JOIN freq f USING (chunk)
        GROUP BY c.doc_id
    )
    SELECT d.doc_id,
           coalesce(r.cleaned, '') AS cleaned_text,
           CAST(coalesce(r.n_kept, 0) AS INTEGER) AS n_kept_chunks,
           CAST(coalesce(r.n_dropped, 0) AS INTEGER) AS n_dropped_chunks
    FROM documents d
    LEFT JOIN rebuilt r USING (doc_id)
    """,
    doc=(
        "Boilerplate STRIP-and-REBUILD (the CCNet/RefinedWeb line-dedup "
        "pass): chunks appearing in >=3 documents (headers, footers, "
        "license blurbs) are removed and each document is reassembled from "
        "its surviving chunks in original order. Two bounded shuffles — "
        "chunk-keyed frequency (8-byte hash keys at scale) and doc-keyed "
        "reassembly; per-doc state is the chunk list, the same bound as "
        "tokenization. Short documents (<10 tokens) pass through with "
        "empty cleaned_text, counted explicitly."
    ),
)
def text_boilerplate_strip_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    n_chunks = F.floor(F.size(toks) / 10).cast("int")
    chunks = F.when(
        n_chunks >= 1,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(toks, i * 10 + 1, 10), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ch = docs.select("doc_id", F.posexplode(chunks).alias("idx", "chunk"))
    freq = ch.groupBy("chunk").agg(F.count_distinct("doc_id").alias("nd"))
    tagged = ch.join(freq, "chunk").select(
        "doc_id",
        F.struct(F.col("idx"), (F.col("nd") < 3).alias("keep"), F.col("chunk")).alias(
            "c"
        ),
    )
    arr = F.array_sort(F.collect_list("c"))
    kept = F.filter(arr, lambda s: s["keep"])
    rebuilt = tagged.groupBy("doc_id").agg(
        F.array_join(F.transform(kept, lambda s: s["chunk"]), " ").alias("cleaned"),
        F.size(kept).alias("n_kept"),
        (F.size(arr) - F.size(kept)).alias("n_dropped"),
    )
    return docs.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cleaned", F.lit("")).alias("cleaned_text"),
        F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept_chunks"),
        F.coalesce("n_dropped", F.lit(0)).cast("int").alias("n_dropped_chunks"),
    )


@query(
    "split_kfold_assign",
    oracle="""
    WITH folded AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5(text), 1, 8))::BIGINT % 5 AS INT) AS fold
        FROM documents
    )
    SELECT fold, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM folded GROUP BY fold
    """,
    doc=(
        "K-fold cross-validation assignment (k=5): fold = content-hash "
        "mod k, same leak-proofing as split_train_holdout — exact "
        "duplicate documents land in the same fold, so no fold's "
        "validation set can leak into another's training set via copies. "
        "Emitted as per-fold balance stats (sizes, source coverage); a "
        "training loop filters `fold <> i` per run. One partial-agg'd "
        "shuffle on the 5-value fold key; assignment itself is a "
        "per-row expression, zero extra cost at 100 TB."
    ),
)
def split_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint") % 5
    ).cast("int")
    return (
        docs.select("doc_id", "source", fold.alias("fold"))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@query(
    "split_time_holdout_leakage",
    oracle="""
    WITH bounds AS (
        SELECT make_timestamp((epoch_us(min(ts)) + epoch_us(max(ts))) // 2) AS cutoff
        FROM events
    ), sides AS (
        SELECT user_id,
               count(*) FILTER (WHERE ts < cutoff) AS n_train,
               count(*) FILTER (WHERE ts >= cutoff) AS n_test
        FROM events, bounds GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(*) FILTER (WHERE n_train > 0 AND n_test > 0) AS BIGINT)
               AS n_leaking_users,
           round(count(*) FILTER (WHERE n_train > 0 AND n_test > 0)
                 / CAST(count(*) AS DOUBLE), 6) AS leak_fraction,
           CAST(sum(n_train) AS BIGINT) AS n_train_events,
           CAST(sum(n_test) AS BIGINT) AS n_test_events
    FROM sides
    """,
    doc=(
        "Time-based holdout with entity-leakage report: split at the "
        "integer-microsecond midpoint, then count users present on BOTH "
        "sides — the leakage a temporal split permits and a group split "
        "(split_train_holdout's hash split) would forbid; this query IS "
        "the measurement that decides between them. One user-keyed "
        "conditional aggregate + a 1-row verdict."
    ),
)
def split_time_holdout_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.timestamp_micros(
            F.expr("(unix_micros(min(ts)) + unix_micros(max(ts))) div 2")
        ).alias("cutoff")
    )
    sides = (
        ev.join(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.count(F.when(F.col("ts") < F.col("cutoff"), 1)).alias("n_train"),
            F.count(F.when(F.col("ts") >= F.col("cutoff"), 1)).alias("n_test"),
        )
    )
    leak = (F.col("n_train") > 0) & (F.col("n_test") > 0)
    return sides.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count(F.when(leak, 1)).cast("long").alias("n_leaking_users"),
        F.round(F.count(F.when(leak, 1)) / F.count(F.lit(1)).cast("double"), 6).alias(
            "leak_fraction"
        ),
        F.sum("n_train").cast("long").alias("n_train_events"),
        F.sum("n_test").cast("long").alias("n_test_events"),
    )


@query(
    "text_decontaminate_corpus",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, lang, n_chars, {T.sql_tokens('text')} AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id, source,
               unnest(list_distinct(
                   [array_to_string(list_slice(t, i, i + 7), ' ')
                    for i in generate_series(1, len(t) - 7)])) AS gram
        FROM toks
    ),
    bench AS (SELECT DISTINCT gram FROM grams WHERE source = 'src0'),
    hits AS (
        SELECT g.doc_id, count(*) AS n_hits
        FROM grams g JOIN bench b ON g.gram = b.gram
        WHERE g.source <> 'src0'
        GROUP BY 1
    )
    SELECT d.doc_id, d.source, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM toks d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.source <> 'src0' AND h.doc_id IS NULL
    """,
    doc=(
        "Corpus DECONTAMINATION — the drop stage the contamination REPORT "
        "(text_contamination_check) feeds: any document sharing even one "
        "verbatim 8-token gram with the held-out benchmark (source "
        "'src0') is removed from the training corpus; survivors pass "
        "through with their metadata. This is the pre-training hygiene "
        "step every eval-integrity audit requires (GPT-3 appendix C / "
        "PaLM-style n-gram decontamination). Shape: the distinct "
        "benchmark gram set broadcasts; contaminated doc_ids resolve via "
        "one LEFT ANTI join, so the corpus itself is never shuffled by "
        "gram — only the (doc, gram) explode is, same as the report "
        "query. At 100 TB both sides join on xxhash64(gram)."
    ),
)
def text_decontaminate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    n = F.size(toks)
    grams_arr = F.when(n >= 8, F.array_distinct(F.transform(
        F.sequence(F.lit(1), n - 7),
        lambda i: F.array_join(F.slice(toks, i, 8), " "),
    ))).otherwise(F.array().cast("array<string>"))
    grams = docs.select("doc_id", "source", F.explode(grams_arr).alias("gram"))
    bench = (
        grams.filter(F.col("source") == "src0")
        .select(F.col("gram").alias("bench_gram"))
        .distinct()
    )
    contaminated = (
        grams.filter(F.col("source") != "src0")
        .join(F.broadcast(bench), F.col("gram") == F.col("bench_gram"))
        .select("doc_id")
        .distinct()
    )
    return (
        docs.filter(F.col("source") != "src0")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "source", "lang", "n_chars")
    )
