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
from parquet_exporter_spark.tables import read_table, tiny_df

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


# ------------------------------------------------------- MMR reranking

MMR_N_QUERIES = 3   # probes: vec_id < 3
MMR_CAND = 20       # relevance shortlist per probe
MMR_K = 5           # diverse picks per probe
MMR_LAMBDA = 0.5    # relevance / diversity tradeoff


def _mmr_oracle() -> str:
    """DuckDB replica of the MMR loop with the K selection rounds
    UNROLLED as CTE stages (deterministic: 6-decimal rounded cosines,
    neighbor_id tiebreaks), so the WHOLE greedy rerank hash-matches."""
    from parquet_exporter_spark.functions.similarity import sql_cosine

    cos_qc = sql_cosine("q.qe", "c.embedding")
    cos_ab = sql_cosine("ea.embedding", "eb.embedding")
    stages = ["""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe FROM embeddings
        WHERE vec_id < 3
    ),
    cand AS (
        SELECT query_id, neighbor_id, cos_sim FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   round(""" + cos_qc + f""", 6) AS cos_sim,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round({cos_qc}, 6) DESC, c.vec_id) AS rnk
            FROM q JOIN embeddings c ON c.vec_id <> q.query_id
        ) WHERE rnk <= {MMR_CAND}
    ),
    pair AS (
        SELECT a.query_id, a.neighbor_id AS id_a, b.neighbor_id AS id_b,
               round({cos_ab}, 6) AS sim
        FROM cand a
        JOIN cand b ON a.query_id = b.query_id
                   AND a.neighbor_id <> b.neighbor_id
        JOIN embeddings ea ON ea.vec_id = a.neighbor_id
        JOIN embeddings eb ON eb.vec_id = b.neighbor_id
    ),
    sel1 AS (
        SELECT query_id, neighbor_id, 1 AS pick_order, cos_sim AS mmr_score
        FROM (SELECT query_id, neighbor_id, cos_sim,
                     row_number() OVER (PARTITION BY query_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rn
              FROM cand) WHERE rn = 1
    )"""]
    for r in range(2, MMR_K + 1):
        prev = " UNION ALL ".join(
            f"SELECT * FROM sel{i}" for i in range(1, r)
        )
        stages.append(f""",
    seldone{r} AS ({prev}),
    rem{r} AS (
        SELECT c.* FROM cand c
        WHERE NOT EXISTS (SELECT 1 FROM seldone{r} s
                          WHERE s.query_id = c.query_id
                            AND s.neighbor_id = c.neighbor_id)
    ),
    ms{r} AS (
        SELECT p.query_id, p.id_a AS neighbor_id, max(p.sim) AS max_sim
        FROM pair p JOIN seldone{r} s
          ON s.query_id = p.query_id AND s.neighbor_id = p.id_b
        GROUP BY 1, 2
    ),
    sel{r} AS (
        SELECT query_id, neighbor_id, {r} AS pick_order, mmr_score
        FROM (SELECT rm.query_id, rm.neighbor_id,
                     round({MMR_LAMBDA} * rm.cos_sim
                           - {1 - MMR_LAMBDA} * m.max_sim, 6) AS mmr_score,
                     row_number() OVER (PARTITION BY rm.query_id
                         ORDER BY round({MMR_LAMBDA} * rm.cos_sim
                               - {1 - MMR_LAMBDA} * m.max_sim, 6) DESC,
                               rm.neighbor_id) AS rn
              FROM rem{r} rm
              JOIN ms{r} m ON m.query_id = rm.query_id
                          AND m.neighbor_id = rm.neighbor_id)
        WHERE rn = 1
    )""")
    union_all = " UNION ALL ".join(f"SELECT * FROM sel{i}" for i in range(1, MMR_K + 1))
    return "".join(stages) + f"""
    SELECT query_id, neighbor_id, CAST(pick_order AS BIGINT) AS pick_order,
           mmr_score
    FROM ({union_all})
    """


@query(
    "search_mmr_rerank",
    oracle=_mmr_oracle(),
    doc=(
        "Maximal Marginal Relevance reranking (Carbonell & Goldstein "
        "1998), the diversity stage of a RAG serving stack: from each "
        "probe's exact top-20 cosine shortlist, greedily pick 5 results "
        "maximizing lambda*relevance - (1-lambda)*max-similarity-to-"
        "already-picked. Everything is relational: the shortlist is the "
        "brute-force top-k, candidate-candidate similarities are one "
        "bounded self-join (20x19 pairs per probe), and the K greedy "
        "rounds unroll into a fixed-depth plan of anti-join + max-agg + "
        "argmax-window stages — no UDF, no driver loop over data. "
        "6-decimal rounded scores with neighbor_id tiebreaks make the "
        "greedy argmax deterministic, so the ENTIRE rerank hash-matches "
        "the unrolled DuckDB CTE replica. Scale: candidates per probe "
        "are bounded (20), so every stage is |probes|-proportional; the "
        "corpus appears only in the shortlist scan."
    ),
)
def search_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_exporter_spark.functions.similarity import brute_force_topk

    emb = read_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < MMR_N_QUERIES)
    # cand and pair are BOUNDED (20 rows and 20x19 pairs per probe) but
    # feed every greedy round: localCheckpoint them once so the K rounds
    # reference materialized blocks instead of re-deriving the corpus
    # scan per round — without it the unrolled plan duplicates the
    # shortlist subtree ~2^K times (a 28k-line physical plan at K=5).
    cand = (
        brute_force_topk(probes, emb, k=MMR_CAND)
        .drop("rnk")
        .localCheckpoint(eager=True)
    )

    # candidate-candidate cosine within each probe's shortlist (bounded)
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    ea = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__ea"))
    eb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__eb"))
    ca = cand.select("query_id", F.col("neighbor_id").alias("id_a"))
    cb = cand.select("query_id", F.col("neighbor_id").alias("id_b"))
    va = F.col("__ea").cast("array<double>")
    vb = F.col("__eb").cast("array<double>")
    pair = (
        ca.join(cb, "query_id")
        .filter(F.col("id_a") != F.col("id_b"))
        .join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "query_id",
            "id_a",
            "id_b",
            F.round(
                dot(va, vb) / (F.sqrt(dot(va, va)) * F.sqrt(dot(vb, vb))), 6
            ).alias("sim"),
        )
    ).localCheckpoint(eager=True)

    w1 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    selected = (
        cand.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "neighbor_id",
            F.lit(1).cast("long").alias("pick_order"),
            F.col("cos_sim").alias("mmr_score"),
        )
    )
    for r in range(2, MMR_K + 1):
        rem = cand.join(
            selected.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_anti",
        )
        ms = (
            pair.join(
                selected.select(
                    "query_id", F.col("neighbor_id").alias("id_b")
                ),
                ["query_id", "id_b"],
            )
            .groupBy("query_id", F.col("id_a").alias("neighbor_id"))
            .agg(F.max("sim").alias("max_sim"))
        )
        mmr = F.round(
            MMR_LAMBDA * F.col("cos_sim") - (1 - MMR_LAMBDA) * F.col("max_sim"), 6
        )
        wr = Window.partitionBy("query_id").orderBy(
            mmr.desc(), F.col("neighbor_id")
        )
        pick = (
            rem.join(ms, ["query_id", "neighbor_id"])
            .withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") == 1)
            .select(
                "query_id",
                "neighbor_id",
                F.lit(r).cast("long").alias("pick_order"),
                mmr.alias("mmr_score"),
            )
        )
        # selected is <= 3*r rows but feeds the next round's anti-join and
        # max-sim stages: checkpoint per round so plan depth stays linear
        # in K instead of the union lineage re-deriving every prior round
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
    return selected


import math as _math

_NDCG_KS = (5, 10, 20)
# log2 discounts quantized ONCE in Python to integer micro-weights and
# embedded as identical literals in BOTH engines — no cross-engine libm
# anywhere in the metric (the text_langid_predict micronat trick).
_NDCG_W = tuple(
    int(round(1_000_000 / _math.log2(i + 1))) for i in range(1, TOP_N + 1)
)
_WTS_SQL = ", ".join(f"({i + 1}, {w})" for i, w in enumerate(_NDCG_W))


@query(
    "search_ndcg_eval",
    oracle=f"""
    WITH {_BM25_ORACLE_BODY},
    grades AS MATERIALIZED (
        SELECT doc_id,
               CAST(least(3, CAST(sum(tf) AS BIGINT) // 3) AS BIGINT) AS grade
        FROM tf GROUP BY doc_id),
    ranked AS MATERIALIZED (
        SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                            AS BIGINT) AS rn
        FROM (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT {TOP_N})),
    wts AS (SELECT * FROM (VALUES {_WTS_SQL}) AS t(rn, w)),
    sys AS MATERIALIZED (
        SELECT r.rn, coalesce(g.grade, 0) AS grade, w.w
        FROM ranked r LEFT JOIN grades g USING (doc_id) JOIN wts w USING (rn)),
    ideal AS MATERIALIZED (
        SELECT CAST(row_number() OVER (ORDER BY grade DESC, doc_id) AS BIGINT)
                   AS rn,
               grade
        FROM grades ORDER BY grade DESC, doc_id LIMIT {TOP_N}),
    idealw AS (SELECT i.rn, i.grade, w.w FROM ideal i JOIN wts w USING (rn)),
    mrr AS (
        SELECT coalesce(round(1.0 / min(rn), 6), 0.0) AS mrr
        FROM sys WHERE grade > 0),
    ks AS (SELECT * FROM (VALUES {", ".join(f"({k})" for k in _NDCG_KS)})
           AS t(k)),
    dcg AS (
        SELECT ks.k,
               CAST(sum(CASE WHEN s.rn <= ks.k AND s.grade > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_topk,
               CAST(sum(CASE WHEN s.rn <= ks.k THEN s.grade * s.w
                             ELSE 0 END) AS BIGINT) AS dcg_q
        FROM ks CROSS JOIN sys s GROUP BY ks.k),
    idcg AS (
        SELECT ks.k,
               CAST(sum(CASE WHEN i.rn <= ks.k THEN i.grade * i.w
                             ELSE 0 END) AS BIGINT) AS idcg_q
        FROM ks CROSS JOIN idealw i GROUP BY ks.k)
    SELECT CAST(d.k AS BIGINT) AS k, d.n_rel_topk,
           round(CAST(d.n_rel_topk AS DOUBLE) / d.k, 6) AS precision_at_k,
           d.dcg_q, i.idcg_q,
           round(CAST(d.dcg_q AS DOUBLE) / i.idcg_q, 6) AS ndcg_at_k,
           m.mrr
    FROM dcg d JOIN idcg i USING (k) CROSS JOIN mrr m
    """,
    doc=(
        "Graded-relevance retrieval evaluation — nDCG@k, precision@k "
        "and MRR over the BM25 ranking, the metric layer a RAG / "
        "curation stack grades its retrievers with (recall@k existed "
        "for the ANN paths; this adds the rank-discounted, "
        "graded-relevance form). Relevance grades are deterministic "
        "data: grade = min(3, total query-term occurrences div 3) from "
        "the same posting rows BM25 scores — a tf-graded truth that "
        "deliberately disagrees with BM25's dl-normalized idf ranking "
        "at the margin, so the metric discriminates (nDCG@20 < 1 on "
        "the fixture corpus, suite-pinned) instead of echoing the "
        "system's own order. The decision path obeys the "
        "exact-integer rule end to end: the log2 rank discounts are "
        "quantized ONCE in Python to integer micro-weights embedded as "
        "identical literals in both engines (no cross-engine libm in "
        "the metric), so DCG@k and IDCG@k are exact BIGINT dot "
        "products — order-independent sums — and nDCG is one IEEE "
        "divide of exact longs, rounded at emit. IDCG ranks the full "
        "graded set (grade DESC, doc_id), so the ratio is the textbook "
        "normalization. Scale shape: everything after the |Q|-term "
        "posting filter is bounded — a TOP_N ranking, a 20-row weight "
        "literal, 3 k-values; the one corpus-sized pass is the scoring "
        "scan BM25 already pays."
    ),
)
def search_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("term")
    ).filter(F.col("term").isin(*QUERY_TERMS))
    grades = toks.groupBy("doc_id").agg(
        F.least(F.lit(3), F.expr("count(1) div 3")).cast("long").alias("grade")
    )
    wr = Window.orderBy(F.col("score").desc(), "doc_id")
    ranked = (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(TOP_N)
        .withColumn("rn", F.row_number().over(wr).cast("long"))
    )
    wts = tiny_df(
        spark, [(i + 1, w) for i, w in enumerate(_NDCG_W)], "rn long, w long"
    )
    sys_t = (
        ranked.join(grades, "doc_id", "left")
        .select("rn", F.coalesce("grade", F.lit(0)).alias("grade"))
        .join(F.broadcast(wts), "rn")
    )
    wi = Window.orderBy(F.col("grade").desc(), "doc_id")
    ideal = (
        grades.orderBy(F.col("grade").desc(), "doc_id")
        .limit(TOP_N)
        .withColumn("rn", F.row_number().over(wi).cast("long"))
        .join(F.broadcast(wts), "rn")
    )
    mrr = sys_t.filter(F.col("grade") > 0).agg(
        F.coalesce(F.round(1.0 / F.min("rn"), 6), F.lit(0.0)).alias("mrr")
    )
    ks = tiny_df(spark, [(k,) for k in _NDCG_KS], "k long")
    dcg = (
        ks.crossJoin(F.broadcast(sys_t))
        .groupBy("k")
        .agg(
            F.sum(
                F.when((F.col("rn") <= F.col("k")) & (F.col("grade") > 0), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_rel_topk"),
            F.sum(
                F.when(
                    F.col("rn") <= F.col("k"), F.col("grade") * F.col("w")
                ).otherwise(0)
            )
            .cast("long")
            .alias("dcg_q"),
        )
    )
    idcg = (
        ks.crossJoin(F.broadcast(ideal))
        .groupBy("k")
        .agg(
            F.sum(
                F.when(
                    F.col("rn") <= F.col("k"), F.col("grade") * F.col("w")
                ).otherwise(0)
            )
            .cast("long")
            .alias("idcg_q")
        )
    )
    return (
        dcg.join(idcg, "k")
        .crossJoin(F.broadcast(mrr))
        .select(
            "k",
            "n_rel_topk",
            F.round(F.col("n_rel_topk").cast("double") / F.col("k"), 6).alias(
                "precision_at_k"
            ),
            "dcg_q",
            "idcg_q",
            F.round(
                F.col("dcg_q").cast("double") / F.col("idcg_q"), 6
            ).alias("ndcg_at_k"),
            "mrr",
        )
    )
