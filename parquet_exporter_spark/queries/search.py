"""Full-text retrieval over the documents corpus: BM25 keyword scoring
and hybrid rank fusion — the query side of a RAG / data-curation stack
(the embedding side lives in functions/similarity.py).

Both operators are fully deterministic — corpus cardinality comes from
catalog statistics as a literal, ranks order by ROUNDED scores with
doc_id tiebreaks — so the entire retrieval pipeline hash-matches its
DuckDB replica.

Scale shape: the query term set is a literal (bounded), so scoring
touches only the posting rows for query terms — one explode filtered to
|Q| terms, one (doc) aggregate, TakeOrdered for the page. Document
frequencies for |Q| terms and the average document length are
broadcast scalars. Nothing corpus-sized shuffles except the filtered
postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_exporter_spark import tables
from parquet_exporter_spark.functions import text as T
from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table

QUERY_TERMS = ("spark", "join", "window", "stream")
QUERY_TEXT = "spark join window stream data"
K1 = 1.2
B = 0.75
TOP_N = 20
RRF_K = 60
LEG_N = 100  # each retriever leg contributes its top-100 list to fusion


def _query_shingles(text: str, k: int = 5) -> list[str]:
    """Python twin of functions/dedup.char_shingles for a LITERAL query."""
    norm = " ".join(text.lower().split())
    n = max(len(norm) - k + 1, 1)
    return sorted({norm[i : i + k] for i in range(n)})


_SQL_TOK = T.sql_tokens("text")

from parquet_exporter_spark.functions.dedup import sql_char_shingles  # noqa: E402

_SQL_SHINGLES = sql_char_shingles("text")
_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score) for every document matching >= 1 query term."""
    docs = read_table(spark, sf_dir, "documents")
    n_docs = tables.table_rowcount(sf_dir, "documents")
    toks = docs.select(
        "doc_id", T.tokens(F.col("text")).alias("toks")
    ).select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
    postings = toks.filter(F.col("term").isin(*QUERY_TERMS))
    tf = postings.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # average document length over the WHOLE corpus: exact integer sum of
    # token counts divided by the catalog cardinality — deterministic.
    avgdl = (
        docs.select(F.size(T.tokens(F.col("text"))).alias("dl"))
        .agg((F.sum("dl") / F.lit(n_docs)).alias("avgdl"))
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = idf * (
        F.col("tf")
        * (K1 + 1)
        / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(avgdl))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("score"))
    )


_BM25_ORACLE_BODY = f"""
    toks AS (
        SELECT doc_id, len({_SQL_TOK}) AS dl, unnest({_SQL_TOK}) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf, first(dl) AS dl
        FROM toks WHERE term IN ({_TERMS_SQL})
        GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    stats AS (
        SELECT CAST(sum(len({_SQL_TOK})) AS DOUBLE)
               / (SELECT count(*) FROM documents) AS avgdl
        FROM documents
    ),
    scored AS (
        SELECT tf.doc_id,
               round(sum(
                   ln(((SELECT count(*) FROM documents) - dfreq.df + 0.5)
                      / (dfreq.df + 0.5) + 1.0)
                   * (tf.tf * ({K1} + 1)
                      / (tf.tf + {K1} * (1 - {B} + {B} * tf.dl / stats.avgdl)))
               ), 6) AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        GROUP BY tf.doc_id
    )
"""


@query(
    "search_bm25",
    oracle=f"""
    WITH {_BM25_ORACLE_BODY}
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id LIMIT {TOP_N}
    """,
    doc=(
        "BM25 keyword retrieval (k1=1.2, b=0.75, Lucene-style "
        "ln(1 + (N-df+.5)/(df+.5)) idf) against a literal query term "
        "set. Corpus cardinality is a catalog-statistics literal; the "
        "only corpus-sized work is the explode filtered to |Q| terms "
        "(posting rows), then one per-doc aggregate and a TakeOrdered "
        "page. Scores round to 6 so the summation order across query "
        "terms is hash-stable."
    ),
)
def search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(TOP_N)
    )


_QSH = _query_shingles(QUERY_TEXT)


@query(
    "search_hybrid_rrf",
    oracle=f"""
    WITH {_BM25_ORACLE_BODY},
    kw_rank AS (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
        FROM (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT {LEG_N})
    ),
    fz AS (
        SELECT doc_id,
               len(list_intersect({_SQL_SHINGLES}, {_QSH!r})) AS inter,
               len({_SQL_SHINGLES}) AS n_sh
        FROM documents
    ),
    fz_scored AS (
        SELECT doc_id,
               round(CAST(inter AS DOUBLE)
                     / (n_sh + {len(_QSH)} - inter), 6) AS jac
        FROM fz WHERE inter > 0
    ),
    fz_rank AS (
        SELECT doc_id, row_number() OVER (ORDER BY jac DESC, doc_id) AS r
        FROM (SELECT * FROM fz_scored ORDER BY jac DESC, doc_id LIMIT {LEG_N})
    )
    SELECT doc_id,
           round(coalesce(1.0 / ({RRF_K} + k.r), 0)
                 + coalesce(1.0 / ({RRF_K} + f.r), 0), 6) AS rrf,
           CAST(coalesce(k.r, 0) AS BIGINT) AS kw_r,
           CAST(coalesce(f.r, 0) AS BIGINT) AS fz_r
    FROM kw_rank k FULL OUTER JOIN fz_rank f USING (doc_id)
    ORDER BY rrf DESC, doc_id LIMIT {TOP_N}
    """,
    doc=(
        "Hybrid retrieval via Reciprocal Rank Fusion (k=60): a sparse "
        "BM25 keyword ranking and a fuzzy character-shingle Jaccard "
        "ranking against the same literal query, fused by summing "
        "1/(60+rank) with absent ranks contributing zero — the standard "
        "recipe for combining lexical and similarity retrievers without "
        "score calibration. Ranks order by ROUNDED scores with doc_id "
        "tiebreaks, so both engines agree at every position; the query "
        "shingle set is a literal computed once. Scale: the keyword leg "
        "touches only |Q|-term postings; the fuzzy leg is one narrow "
        "intersect per row; the fusion joins two rank lists bounded by "
        "matching docs."
    ),
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_exporter_spark.functions.dedup import char_shingles

    docs = read_table(spark, sf_dir, "documents")
    # each leg is cut to its top-LEG_N via TakeOrdered (per-partition
    # heaps) BEFORE ranking, so the global rank windows run over a
    # constant-bounded list — the standard fuse-top-N RRF recipe.
    kw = (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(LEG_N)
    )
    w_kw = Window.orderBy(F.col("score").desc(), "doc_id")
    kw_rank = kw.select("doc_id", F.row_number().over(w_kw).alias("r"))

    qsh = F.array(*[F.lit(s) for s in _QSH])
    sh = char_shingles(F.col("text"))
    jac = F.round(
        F.col("inter").cast("double") / (F.col("n_sh") + len(_QSH) - F.col("inter")), 6
    )
    fz = (
        docs.select(
            "doc_id",
            F.size(F.array_intersect(sh, qsh)).alias("inter"),
            F.size(sh).alias("n_sh"),
        )
        .filter(F.col("inter") > 0)
        .select("doc_id", jac.alias("jac"))
        .orderBy(F.col("jac").desc(), "doc_id")
        .limit(LEG_N)
    )
    w_fz = Window.orderBy(F.col("jac").desc(), "doc_id")
    fz_rank = fz.select("doc_id", F.row_number().over(w_fz).alias("r"))

    k, f_ = kw_rank.alias("k"), fz_rank.alias("f")
    joined = k.join(f_, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            F.coalesce(1.0 / (RRF_K + F.col("k.r")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("f.r")), F.lit(0.0)),
            6,
        ).alias("rrf"),
        F.coalesce(F.col("k.r"), F.lit(0)).cast("long").alias("kw_r"),
        F.coalesce(F.col("f.r"), F.lit(0)).cast("long").alias("fz_r"),
    )
    return joined.orderBy(F.col("rrf").desc(), "doc_id").limit(TOP_N)
