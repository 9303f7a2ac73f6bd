"""Training-data pipeline operators, part 3: sequence packing, lexical
quality signals, blocklist filtering, corpus LM scoring.

These extend the LLM-pipeline family (llm.py / llm2.py) with the
operations a pre-training corpus build runs between cleaning and
tokenizer sharding. Everything is built-in Catalyst expressions — no
Python UDFs — and each operator's shuffle structure is chosen for the
100 TB posture (noted per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_exporter_spark.functions import text as T
from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table, tiny_df

SEQ_BUDGET = 512  # tokens per packed training sequence

_TOK = T.sql_tokens("text")


@query(
    "sample_sequence_packing",
    oracle=f"""
    SELECT doc_id, source, n_tokens,
           CAST(floor((cum - n_tokens) / {SEQ_BUDGET}) AS BIGINT) AS seq_id,
           CAST(cum - n_tokens
                - floor((cum - n_tokens) / {SEQ_BUDGET}) * {SEQ_BUDGET} AS BIGINT)
               AS seq_offset
    FROM (
        SELECT doc_id, source, len({_TOK}) AS n_tokens,
               sum(len({_TOK})) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents
    )
    """,
    doc=(
        "Sequence packing for training: concatenate each source block's "
        "documents (deterministic doc_id order) into a token stream and "
        "chunk it at the sequence budget; every doc gets (seq_id, offset). "
        "Scale shape: packing is windowed PER SOURCE BLOCK, so the running "
        "sum parallelizes across blocks instead of forcing a global "
        "single-partition prefix scan — the standard two-phase global "
        "packing is only needed when one block exceeds a worker."
    ),
)
def sample_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    n_tokens = F.size(T.tokens(F.col("text")))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).cast("bigint")
    seq_id = F.floor(start / SEQ_BUDGET).cast("bigint")
    return (
        docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
        .withColumn("start", start)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            seq_id.alias("seq_id"),
            (F.col("start") - seq_id * SEQ_BUDGET).cast("bigint").alias("seq_offset"),
        )
    )


@query(
    "text_char_entropy",
    oracle="""
    SELECT doc_id,
           round(-list_sum(list_transform(
               list_distinct(string_split(text, '')), c ->
                   (CAST(len(list_filter(string_split(text, ''), x -> x = c))
                         AS DOUBLE) / len(string_split(text, '')))
                   * log2(CAST(len(list_filter(string_split(text, ''), x -> x = c))
                               AS DOUBLE) / len(string_split(text, ''))))), 6)
               AS char_entropy
    FROM documents
    """,
    doc=(
        "Character-level Shannon entropy per document — a cheap quality "
        "signal (gibberish and boilerplate sit at distribution extremes). "
        "Entirely narrow: higher-order array expressions per row, zero "
        "shuffles, linear at any scale."
    ),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    chars = F.split(F.col("text"), "")
    n = F.size(chars)
    probs = F.transform(
        F.array_distinct(chars),
        lambda c: F.size(F.filter(chars, lambda x: x == c)).cast("double") / n,
    )
    ent = -F.aggregate(
        F.transform(probs, lambda p: p * F.log2(p)), F.lit(0.0), lambda a, x: a + x
    )
    return docs.select("doc_id", F.round(ent, 6).alias("char_entropy"))


@query(
    "text_type_token_ratio",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOK}) AS BIGINT) AS n_tokens,
           round(CAST(len(list_distinct({_TOK})) AS DOUBLE) / len({_TOK}), 6) AS ttr
    FROM documents
    """,
    doc=(
        "Type-token ratio (lexical diversity) per document: distinct "
        "tokens over total tokens. Low TTR flags repetitive/spammy text. "
        "Narrow, zero shuffles."
    ),
)
def text_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("ttr"),
    )


BLOCKED_SOURCES = ("src0", "src7")


@query(
    "filter_domain_blocklist",
    oracle=f"""
    SELECT doc_id, source FROM documents
    WHERE source NOT IN {BLOCKED_SOURCES!r}
    """,
    doc=(
        "Corpus cleaning: drop documents from blocklisted sources/domains "
        "via a BROADCAST LEFT ANTI join — the blocklist (thousands of "
        "domains in practice) ships to every executor, the corpus never "
        "shuffles. The NOT IN form the oracle runs is what Catalyst "
        "decorrelates to the same anti join."
    ),
)
def filter_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    block = tiny_df(spark, [(s,) for s in BLOCKED_SOURCES], "source string")
    return docs.join(F.broadcast(block), "source", "left_anti").select("doc_id", "source")


@query(
    "text_unigram_logprob",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOK}) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    freq AS (
        SELECT *, sum(tf) OVER (PARTITION BY term) AS term_freq,
                  sum(tf) OVER () AS total_tokens
        FROM tf
    )
    SELECT doc_id,
           round(sum(tf * ln(CAST(term_freq AS DOUBLE) / total_tokens))
                 / sum(tf), 6) AS avg_logprob
    FROM freq GROUP BY doc_id
    """,
    doc=(
        "Corpus unigram language-model score per document: average "
        "ln p(token) under the corpus's own unigram distribution — the "
        "cheap perplexity proxy used to rank text quality before a real "
        "LM scores survivors. Shuffle structure mirrors tfidf: one "
        "(doc,term) aggregation, one term-partitioned window for corpus "
        "frequencies, one per-doc aggregation — partial aggregation "
        "map-side at each step; the global token total rides the term "
        "window (NOT a single-partition window over the corpus: it's "
        "computed per term partition as a 1-row broadcast-joined "
        "aggregate)."
    ),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    term_freq = F.sum("tf").over(Window.partitionBy("term"))
    # 1-row total joined via broadcast: scale-safe (no global window)
    total = F.broadcast(tf.agg(F.sum("tf").alias("total_tokens")))
    scored = (
        tf.withColumn("term_freq", term_freq)
        .crossJoin(total)
        .withColumn(
            "logp", F.log(F.col("term_freq").cast("double") / F.col("total_tokens"))
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum(F.col("tf") * F.col("logp")) / F.sum("tf"), 6).alias("avg_logprob")
    )


@query(
    "text_duplicate_line_fraction",
    oracle="""
    WITH lines AS (
        SELECT doc_id, unnest(string_split(text, chr(10))) AS line
        FROM documents),
    per_line AS (
        SELECT doc_id, line, CAST(count(*) AS BIGINT) AS cnt,
               CAST(length(line) AS BIGINT) AS chars
        FROM lines GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_lines,
           CAST(sum(cnt - 1) AS BIGINT) AS n_dup_lines,
           round(CAST(sum(cnt - 1) AS DOUBLE) / sum(cnt), 6)
               AS dup_line_frac,
           CASE WHEN sum(cnt * chars) = 0 THEN 0.0
                ELSE round(CAST(sum((cnt - 1) * chars) AS DOUBLE)
                           / sum(cnt * chars), 6) END AS dup_char_frac
    FROM per_line GROUP BY doc_id
    """,
    doc=(
        "Per-document duplicate-line fraction — the Gopher repetition "
        "rule at LINE granularity (their 'duplicate line fraction' and "
        "'duplicate line character fraction' signals), catching "
        "templated/boilerplate pages whose repetition is structural "
        "(repeated nav rows, chat logs, scraped tables) and invisible "
        "to the char-n-gram repetition ratio: n_dup_lines counts every "
        "occurrence beyond a line's first, and dup_char_frac weights "
        "those occurrences by character mass so one long repeated "
        "banner outweighs many empty lines. All-integer counts with "
        "one final division (round-6); empty documents degrade to the "
        "single empty line with 0 fractions rather than 0/0. Scale "
        "shape: one explode + (doc, line)-keyed partial agg, one "
        "doc-keyed reduce — at 100 TB the line key would be "
        "xxhash64(line) so the shuffle carries 8-byte keys, the "
        "dedup_boilerplate_chunks trick."
    ),
)
def text_duplicate_line_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    lines = docs.select(
        "doc_id", F.explode(F.split("text", "\n")).alias("line")
    )
    per_line = lines.groupBy("doc_id", "line").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.length("line").cast("long").alias("chars"),
    )
    tot_chars = F.sum(F.col("cnt") * F.col("chars"))
    return per_line.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_lines"),
        F.sum(F.col("cnt") - 1).cast("long").alias("n_dup_lines"),
        F.round(F.sum(F.col("cnt") - 1).cast("double") / F.sum("cnt"), 6).alias(
            "dup_line_frac"
        ),
        F.when(tot_chars == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.sum((F.col("cnt") - 1) * F.col("chars")).cast("double") / tot_chars,
                6,
            )
        )
        .alias("dup_char_frac"),
    )


@query(
    "text_dedup_lines_rebuild",
    oracle="""
    WITH pos AS (
        SELECT doc_id, p.line, p.i
        FROM documents,
             LATERAL (SELECT unnest(string_split(text, chr(10))) AS line,
                             generate_subscripts(
                                 string_split(text, chr(10)), 1) AS i) p),
    firsts AS (
        SELECT doc_id, line, min(i) AS first_i, count(*) AS cnt
        FROM pos GROUP BY 1, 2)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines_kept,
           CAST(sum(cnt - 1) AS BIGINT) AS n_lines_dropped,
           string_agg(line, chr(10) ORDER BY first_i) AS cleaned_text
    FROM firsts GROUP BY doc_id
    """,
    doc=(
        "Within-document line dedup with ORDER-PRESERVING rebuild: keep "
        "each distinct line's first occurrence and reassemble the "
        "document — the RefinedWeb/CCNet line-dedup cleaning step "
        "itself, where text_duplicate_line_fraction is only its "
        "diagnostic (that query scores, this one transforms; a corpus "
        "build runs both: score to threshold, transform to clean). "
        "Order preservation is the contract: lines re-join sorted by "
        "their first position (posexplode / generate_subscripts), not "
        "by value — a value-sorted rebuild would destroy the document. "
        "Counts are exact integers, the rebuilt text is byte-exact on "
        "both engines (split on chr(10), join on chr(10)), so the "
        "transform itself is hash-verified, not just its row count. "
        "Scale shape: one posexplode + (doc, line)-keyed partial agg, "
        "one doc-keyed rebuild; at 100 TB the rebuild's collect_list "
        "is bounded by document size, the same per-entity bound every "
        "chunker here relies on."
    ),
)
def text_dedup_lines_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("i", "line")
    )
    firsts = pos.groupBy("doc_id", "line").agg(
        F.min("i").alias("first_i"), F.count(F.lit(1)).alias("cnt")
    )
    return firsts.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines_kept"),
        F.sum(F.col("cnt") - 1).cast("long").alias("n_lines_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("first_i", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("cleaned_text"),
    )
