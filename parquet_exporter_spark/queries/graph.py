"""Graph operator: connected components over near-duplicate candidate
edges, turning pairwise dedup hits into whole duplicate CLUSTERS.

LSH/boilerplate dedup produces pairs (A~B, B~C); a cleaning pipeline
needs the transitive closure (A,B,C share one cluster id, keep one doc
per cluster). The reference has no graph surface; this extends the
engine per SURVEY.md section 2.2.

Spark side: iterative min-label propagation on DataFrames (the classic
Pregel/GraphX formulation expressed as join + groupBy.min). Each
iteration is one shuffle on the node key; lineage is truncated with
localCheckpoint so plans stay flat no matter how many iterations run.
Convergence is detected by counting changed labels (an O(nodes) agg,
not a collect of the data). At 100 TB this is exactly the GraphFrames
strategy: iterations ~ graph diameter, which for boilerplate-share
graphs is tiny (shared chunks form near-cliques).

Oracle side: DuckDB recursive CTE with UNION (distinct) reachability —
min reachable label per node — which terminates on cyclic graphs
because the distinct-union fixpoint is finite.

Spark's own WITH RECURSIVE (used in timeseries.py) only supports UNION
ALL, which cannot terminate on a cyclic edge set, so the iterative
DataFrame loop IS the idiomatic Spark formulation, not a workaround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_exporter_spark.functions import text as T
from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table

_CHUNK = 10  # tokens per chunk; same chunking as dedup_boilerplate_chunks


def _chunk_edges(docs: DataFrame) -> DataFrame:
    """Candidate edges: documents sharing a non-overlapping 10-token
    chunk (same chunking as queries/llm2.py dedup_boilerplate_chunks).
    Returns a directed edge set with both (a,b) and (b,a).

    At 100 TB the join key would be xxhash64(chunk) so the shuffle
    carries 8-byte keys; the text key is kept here for oracle parity.
    """
    toks = T.tokens(F.col("text"))
    n_chunks = F.floor(F.size(toks) / _CHUNK).cast("int")
    chunks = F.when(
        n_chunks >= 1,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(toks, i * _CHUNK + 1, _CHUNK), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    c = docs.select("doc_id", F.explode(chunks).alias("chunk"))
    return (
        c.alias("a")
        .join(c.alias("b"), "chunk")
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(edges: DataFrame, max_iters: int = 20) -> DataFrame:
    """Min-label propagation until fixpoint: (node, component) where
    component = min doc_id reachable from the node. `edges` must
    contain both directions of every undirected edge."""
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        prop = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


# Shared oracle CTEs: chunk-share edges (base), plus recursive min-label
# reachability (_CC_CTES) layered on top for the component queries.
_EDGE_CTES = f"""
    toks AS (
        SELECT doc_id, {T.sql_tokens('text')} AS t FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               unnest([array_to_string(list_slice(t, i * {_CHUNK} + 1, i * {_CHUNK} + {_CHUNK}), ' ')
                       for i in generate_series(0, CAST(floor(len(t) / {_CHUNK}) AS INT) - 1)])
                   AS chunk
        FROM toks
    ),
    edges AS (
        SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        FROM chunks a JOIN chunks b
          ON a.chunk = b.chunk AND a.doc_id <> b.doc_id
    )
"""

_CC_CTES = "WITH RECURSIVE" + _EDGE_CTES + """,
    reach(node, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    )
"""


@query(
    "dedup_connected_components",
    oracle=_CC_CTES
    + """
    SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS component
    FROM reach GROUP BY node
    """,
    doc=(
        "Duplicate-cluster assignment: connected components over "
        "shared-boilerplate-chunk candidate edges; component id = min "
        "doc_id in the cluster. A cleaning pipeline keeps one document "
        "per component instead of dropping both ends of every pair."
    ),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    edges = _chunk_edges(docs).persist()
    try:
        labels = connected_components(edges)
        return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))
    finally:
        edges.unpersist()



_PR_DAMPING = 0.85
_PR_ITERS = 5


def _pagerank_oracle() -> str:
    """Unrolled-iteration PageRank CTE: the fixed iteration count makes
    the iterative algorithm expressible as plain SQL, so even this
    operator is value-checked against DuckDB rather than rows-only."""
    ctes = [
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "n AS (SELECT count(*) AS n_nodes FROM nodes)",
        "outdeg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src)",
        "it0 AS (SELECT node, round(1.0 / n.n_nodes, 9) AS rank FROM nodes CROSS JOIN n)",
    ]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""it{i} AS (
            SELECT e.dst AS node,
                   round((1 - {_PR_DAMPING}) / any_value(n.n_nodes)
                         + {_PR_DAMPING} * sum(r.rank / o.deg), 9) AS rank
            FROM edges e
            JOIN it{i - 1} r ON e.src = r.node
            JOIN outdeg o ON o.node = e.src
            CROSS JOIN n
            GROUP BY e.dst)"""
        )
    return (
        f"WITH {_EDGE_CTES}, "
        + ", ".join(ctes)
        + f" SELECT node AS doc_id, round(rank, 6) AS rank FROM it{_PR_ITERS}"
    )


@query(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    doc=(
        f"PageRank ({_PR_ITERS} fixed iterations, d={_PR_DAMPING}) over the "
        "shared-chunk document graph — centrality for duplicate-cluster "
        "auditing (which boilerplate hub connects everything). Spark side "
        "is the iterative join+agg loop with localCheckpoint lineage "
        "truncation (the GraphX formulation on DataFrames); each "
        "iteration is ONE shuffle on dst. Ranks are snapped to 1e-9 per "
        "iteration on BOTH engines so cross-engine float summation order "
        "cannot accumulate drift — that is what makes an iterative "
        "algorithm hash-comparable. The oracle unrolls the fixed "
        "iteration count into chained CTEs."
    ),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    edges = _chunk_edges(docs).persist()
    try:
        nodes = edges.select(F.col("src").alias("node")).distinct()
        n_nodes = nodes.count()  # scalar driver action, like CC convergence
        outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        ranks = nodes.withColumn(
            "rank", F.round(F.lit(1.0 / n_nodes), 9)
        ).localCheckpoint(eager=True)
        for _ in range(_PR_ITERS):
            contrib = (
                edges.join(ranks, edges.src == ranks.node)
                .join(outdeg, edges.src == outdeg.src)
                .select(
                    F.col("dst").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"),
                )
            )
            ranks = (
                contrib.groupBy("node")
                .agg(
                    F.round(
                        (1 - _PR_DAMPING) / n_nodes + _PR_DAMPING * F.sum("c"), 9
                    ).alias("rank")
                )
                .localCheckpoint(eager=True)
            )
        return ranks.select(
            F.col("node").alias("doc_id"), F.round("rank", 6).alias("rank")
        )
    finally:
        edges.unpersist()


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH {_EDGE_CTES}
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e1.dst = e2.src AND e1.src < e1.dst AND e2.src < e2.dst
    JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    """,
    doc=(
        "Global triangle count over the shared-chunk graph (each triangle "
        "counted once via the a<b<c ordering): the standard clustering "
        "/ community-density signal. Two equi-joins on node keys — the "
        "canonical distributed formulation; at scale the oriented "
        "(degree-ordered) variant bounds the join fan-out on hubs."
    ),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    e = _chunk_edges(docs)
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b")).filter(
        F.col("a") < F.col("b")
    )
    e2 = e.select(F.col("src").alias("b2"), F.col("dst").alias("c")).filter(
        F.col("b2") < F.col("c")
    )
    e3 = e.select(F.col("src").alias("a3"), F.col("dst").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a3") == F.col("a")) & (F.col("c3") == F.col("c")))
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


@query(
    "dedup_near_keep_canonical",
    oracle=_CC_CTES
    + """
    SELECT d.doc_id,
           CAST(coalesce(r.component, d.doc_id) AS BIGINT) AS keep_id,
           d.doc_id = coalesce(r.component, d.doc_id) AS is_kept
    FROM documents d
    LEFT JOIN (
        SELECT node, min(label) AS component FROM reach GROUP BY node
    ) r ON d.doc_id = r.node
    """,
    doc=(
        "End-to-end near-dedup keep-one policy: cluster candidate edges "
        "with connected components, keep the minimum doc_id per cluster as "
        "the canonical copy, and map every document to its keeper "
        "(singletons keep themselves). This is the row a cleaning pipeline "
        "filters on (`is_kept`) and the provenance column it writes "
        "(`keep_id`). Same scale posture as dedup_connected_components: "
        "edges from one chunk-hash shuffle, O(diameter) label-propagation "
        "iterations, then one left join back to the corpus."
    ),
)
def dedup_near_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    edges = _chunk_edges(docs).persist()
    try:
        labels = connected_components(edges)
        keep = F.coalesce(F.col("label"), F.col("doc_id"))
        return (
            docs.join(labels, docs.doc_id == labels.node, "left")
            .select(
                "doc_id",
                keep.alias("keep_id"),
                (F.col("doc_id") == keep).alias("is_kept"),
            )
        )
    finally:
        edges.unpersist()


_LPA_ITERS = 3

# One synchronous LPA round as SQL: neighbor-label counts, then per-node
# argmax with min-label tiebreak; isolated nodes keep their own label.
def _lpa_round_sql(prev: str, out: str) -> str:
    return f"""
    i_{out} AS (
        SELECT e.src AS node, l.label, count(*) AS c
        FROM edges e JOIN {prev} l ON e.dst = l.node
        GROUP BY e.src, l.label
    ),
    {out} AS (
        SELECT n.doc_id AS node, coalesce(w.label, n.doc_id) AS label
        FROM nodes n LEFT JOIN (
            SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node
                           ORDER BY c DESC, label) AS rn
                FROM i_{out}
            ) WHERE rn = 1
        ) w ON w.node = n.doc_id
    )"""


@query(
    "graph_label_propagation",
    oracle="WITH" + _EDGE_CTES
    + """,
    nodes AS (SELECT DISTINCT doc_id FROM documents),
    l0 AS (SELECT doc_id AS node, doc_id AS label FROM nodes),"""
    + ",".join(_lpa_round_sql(f"l{i}", f"l{i + 1}") for i in range(_LPA_ITERS))
    + f"""
    SELECT node AS doc_id, CAST(label AS BIGINT) AS community FROM l{_LPA_ITERS}
    """,
    doc=(
        "Community detection via synchronous Label Propagation (LPA, "
        f"{_LPA_ITERS} rounds): every node adopts the most frequent "
        "label among its neighbors, ties to the smallest label, isolated "
        "nodes keep their own — the GraphFrames labelPropagation "
        "formulation made DETERMINISTIC (synchronous rounds + fixed "
        "tiebreak) so the full run hash-matches an unrolled SQL replica. "
        "Unlike connected components, LPA splits a weakly-bridged blob "
        "into dense communities. One neighbor-join + one (node, label) "
        "aggregate + one per-node window per round, lineage truncated "
        "between rounds."
    ),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    nodes = docs.select("doc_id").distinct()
    edges = _chunk_edges(docs).persist()
    try:
        labels = nodes.select(
            F.col("doc_id").alias("node"), F.col("doc_id").alias("label")
        )
        w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("label"))
        for _ in range(_LPA_ITERS):
            nb = edges.join(
                labels.withColumnRenamed("node", "dst"), "dst"
            ).select(F.col("src").alias("node"), "label")
            best = (
                nb.groupBy("node", "label")
                .agg(F.count(F.lit(1)).alias("c"))
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("node", F.col("label").alias("new_label"))
            )
            labels = (
                nodes.select(F.col("doc_id").alias("node"))
                .join(best, "node", "left")
                .select(
                    "node",
                    F.coalesce("new_label", F.col("node")).alias("label"),
                )
                .localCheckpoint(eager=False)
            )
        return labels.select(
            F.col("node").alias("doc_id"), F.col("label").cast("long").alias("community")
        )
    finally:
        edges.unpersist()


_BFS_DEPTH = 4  # recursion bound: chunk-share graphs have tiny diameter


@query(
    "graph_bfs_hops",
    oracle="WITH RECURSIVE" + _EDGE_CTES
    + f""",
    seeds AS (
        SELECT src AS node FROM edges GROUP BY src HAVING min(dst) > src
    ),
    bfs(node, dist) AS (
        SELECT node, 0 FROM seeds
        UNION ALL
        SELECT DISTINCT e.dst, b.dist + 1
        FROM bfs b JOIN edges e ON e.src = b.node
        WHERE b.dist < {_BFS_DEPTH}
    )
    SELECT node AS doc_id, CAST(min(dist) AS INT) AS hops
    FROM bfs GROUP BY node
    """,
    doc=(
        "Bounded-depth BFS over the duplicate-candidate graph via Spark "
        "4's native WITH RECURSIVE: hop distance from every 'keeper' "
        "node (a node with no smaller-id neighbor — the canonical "
        "representative in keep-smallest dedup) to the duplicates it "
        "covers. Both engines run the SAME recursive SQL: UNION ALL "
        "recursion whose recursive step is SELECT DISTINCT (per-level "
        f"frontier dedup) with an explicit dist < {_BFS_DEPTH} guard, "
        "then min-dist per node. The DISTINCT is the fan-out bound: on "
        "the near-clique components dedup graphs actually produce, raw "
        "path enumeration grows ~degree^depth (a 100-doc clique would "
        "enumerate ~1e8 paths at depth 4), while the deduped frontier "
        "is at most |V| rows per level, so total work is O(depth * |E|) "
        "on both engines. The depth guard additionally terminates "
        "cyclic edge sets; for UNBOUNDED diameters the iterative "
        "frontier loop (connected_components above) is the production "
        "path. Edges come from the same persisted chunk-share builder "
        "as the other graph queries."
    ),
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    # Optimization r14 (guide §1.2 step 1): the recursive CTE references
    # __bfs_edges in the seed scan AND at every recursion level, so the
    # tokenize + chunk-explode + self-join + DISTINCT chain re-ran once
    # per BFS depth. Materialize the (bounded, doc-pair-sized) edge set
    # once; every level then reads the checkpointed rows. Values are
    # unchanged — the same edge relation, computed once instead of
    # depth+1 times.
    _chunk_edges(docs).localCheckpoint(eager=True).createOrReplaceTempView(
        "__bfs_edges"
    )
    return spark.sql(
        f"""
        WITH RECURSIVE seeds AS (
            SELECT src AS node FROM __bfs_edges GROUP BY src HAVING min(dst) > src
        ),
        bfs(node, dist) AS (
            SELECT node, 0 AS dist FROM seeds
            UNION ALL
            SELECT DISTINCT e.dst AS node, b.dist + 1 AS dist
            FROM bfs b JOIN __bfs_edges e ON e.src = b.node
            WHERE b.dist < {_BFS_DEPTH}
        )
        SELECT node AS doc_id, CAST(min(dist) AS INT) AS hops
        FROM bfs GROUP BY node
        """
    )


@query(
    "graph_degree_distribution",
    oracle="""
    WITH pe AS (
        SELECT DISTINCT user_id, event_type FROM events
    ), deg AS (
        SELECT user_id, count(*) AS degree FROM pe GROUP BY 1
    )
    SELECT CAST(degree AS INTEGER) AS degree,
           CAST(count(*) AS BIGINT) AS n_users
    FROM deg GROUP BY 1 ORDER BY 1
    """,
    doc=(
        "Degree distribution of the user/event-type bipartite graph: "
        "per-node distinct-neighbour degree, then the degree histogram — "
        "the first diagnostic over any graph (power-law check, skew "
        "detection before joins). Two partial-agg shuffles, the second "
        "over at most |distinct degrees| keys; the distinct and the "
        "degree count share the user partitioning."
    ),
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    pe = ev.select("user_id", "event_type").distinct()
    deg = pe.groupBy("user_id").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(F.col("degree").cast("int").alias("degree"), "n_users")
        .orderBy("degree")
    )


@query(
    "graph_component_sizes",
    oracle=_CC_CTES
    + """,
    comp AS (
        SELECT node, min(label) AS component FROM reach GROUP BY node
    ), sizes AS (
        SELECT component, count(*) AS size FROM comp GROUP BY 1
    )
    SELECT CAST(size AS BIGINT) AS component_size,
           CAST(count(*) AS BIGINT) AS n_components
    FROM sizes GROUP BY size
    """,
    doc=(
        "Duplicate-cluster size distribution: histogram of connected-"
        "component sizes over the shared-chunk edge set — the dedup "
        "health report (a fat tail means boilerplate is gluing "
        "unrelated documents into mega-clusters and the chunk length "
        "needs raising). Two bounded aggregates on top of the same "
        "label-propagation labels as dedup_connected_components."
    ),
)
def graph_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    edges = _chunk_edges(docs).persist()
    try:
        labels = connected_components(edges)
        sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))
        return sizes.groupBy(F.col("size").cast("long").alias("component_size")).agg(
            F.count(F.lit(1)).cast("long").alias("n_components")
        )
    finally:
        edges.unpersist()


_AA_TOPK = 3


@query(
    "graph_adamic_adar",
    oracle=f"""
    WITH lines AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    co_edges AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lines a JOIN lines b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
    deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
            FROM co_edges GROUP BY src),
    cand AS (
        SELECT e1.src AS a, e2.dst AS b, e1.dst AS w
        FROM co_edges e1 JOIN co_edges e2 ON e1.dst = e2.src
        WHERE e1.src <> e2.dst),
    nonedge AS (
        SELECT c.a, c.b, c.w FROM cand c
        LEFT JOIN co_edges x ON x.src = c.a AND x.dst = c.b
        WHERE x.src IS NULL),
    scored AS (
        SELECT a, b, CAST(count(*) AS BIGINT) AS n_common,
               CAST(sum(1000000000000 // d.deg) AS BIGINT) AS ra_fp,
               round(sum(1.0 / ln(CAST(d.deg AS DOUBLE))), 6) AS aa_score
        FROM nonedge JOIN deg d ON d.node = nonedge.w
        GROUP BY a, b)
    SELECT a AS part_key, b AS predicted_part, CAST(rn AS BIGINT) AS rank,
           n_common, ra_fp, aa_score
    FROM (SELECT *, row_number() OVER (
              PARTITION BY a ORDER BY ra_fp DESC, b) AS rn
          FROM scored)
    WHERE rn <= {_AA_TOPK}
    """,
    doc=(
        "Rare-neighbor-weighted link prediction over the part "
        "co-purchase graph (same DISTINCT co-order edge model as "
        "graph_kcore, llm8.py:760): for part pairs NOT yet co-ordered, "
        "weight each common co-purchase neighbor w INVERSELY to its "
        "degree so rare shared neighbors vote harder than promiscuous "
        "ones, and keep the top-3 predictions per part. The DECISION "
        "path is the Resource Allocation index (Zhou-Lu-Zhang 2009, "
        "Adamic-Adar's rational sibling: sum 1/deg(w) instead of "
        "sum 1/ln deg(w)) computed in EXACT fixed-point integers — "
        "each term is the integer division 1e12 div deg(w), summed as "
        "longs, so the rarity weighting itself ranks the predictions "
        "(round-12 advice closure: n_common-first ranking had dropped "
        "the rarity signal from the decision) with zero libm and zero "
        "float summation; a candidate with 2 rare shared neighbors now "
        "outranks one with 3 promiscuous ones exactly when RA says so. "
        "The float Adamic-Adar score stays as a round-6 PAYLOAD column "
        "excluded from ordering (the repo's oracle-float rule). Both "
        "directions of each pair are scored, so every part gets its "
        "own top-k. The common-neighbor join composes two keyed "
        "equi-joins and one anti-join on the SAME edge relation (no "
        "all-pairs over parts; candidates are 2-hop walks, bounded by "
        "TPC-H's <= 7 lines per order on the first hop), the deg side "
        "is a map-side-combined aggregate, and the top-k cut never "
        "leaves its part partition — the identical shape GraphFrames' "
        "motif join would plan. At 100 TB the edge relation would be "
        "bucketed on src so both hops and the anti-join co-locate "
        "shuffle-free."
    ),
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    lines = li.select("l_orderkey", "l_partkey").distinct()
    # Optimization r14 (guide §1.2 step 1, §3.1): the edge relation was
    # referenced FOUR times (e1, e2, the anti-join probe set, deg) with no
    # persist, so the lineitem scan + self-join + DISTINCT re-ran four
    # times per execution; persist computes it once (231k rows / ~4 MB at
    # sf0.01 — node-graph-sized, bounded). The anti-join's right side and
    # the degree table are explicitly broadcast: both are edge/node-sized,
    # while the left side is the 2-hop candidate stream (tens of millions
    # of rows) whose post-join size estimate is inflated far past
    # autoBroadcastJoinThreshold — without the hints the planner shuffled
    # the candidate stream TWICE (SortMergeJoin LeftAnti + SortMergeJoin
    # for deg) before the aggregate; with them the candidates flow from
    # the 2-hop join straight into the partial aggregate with zero
    # intermediate exchange (plans/r14/graph_adamic_adar_{before,after}).
    edges = (
        lines.alias("a")
        .join(lines.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
        .persist()
    )
    try:
        deg = edges.groupBy("src").agg(
            F.count(F.lit(1)).alias("deg")
        ).withColumnRenamed("src", "node")
        # Optimization r14 round 2 (guide §1.2 step 1, §2.3): the edge set
        # is symmetric by construction (both directions of every co-order
        # pair survive the != filter), so n_common / ra_fp / aa_score are
        # symmetric in (a, b) — the walk multisets {a->w->b} and {b->w->a}
        # are mirror-bijective. Score only the a < b half of the candidate
        # stream and mirror the pair-level aggregate afterwards, which
        # also makes the float aa_score payload exactly equal between the
        # two directions. deg(w) is attached to the EDGE relation (231k
        # rows at sf0.01) before the 2-hop join instead of probing a
        # broadcast join once per walk row.
        #
        # Optimization r15 (guide §1.2 step 2, §2.3): the per-walk-row
        # addends — 1e12 div deg(w) and 1/ln(deg(w)) — are precomputed ON
        # THE EDGE RELATION (one div + one log per edge, 231k rows at
        # sf0.01) instead of once per walk row (13.8M rows): the identical
        # long division and the identical double 1/ln value reach the
        # aggregate, only computed O(edges) times instead of O(walks).
        edges_w = edges.join(
            F.broadcast(deg), edges["dst"] == deg["node"]
        ).select(
            "src",
            "dst",
            F.expr("1000000000000L div deg").alias("ra_w"),
            (1.0 / F.log(F.col("deg").cast("double"))).alias("aa_w"),
        )
        cand = (
            edges_w.alias("e1")
            .join(edges.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
            .filter(F.col("e1.src") < F.col("e2.dst"))
            .select(
                F.col("e1.src").alias("a"),
                F.col("e2.dst").alias("b"),
                F.col("e1.ra_w").alias("ra_w"),
                F.col("e1.aa_w").alias("aa_w"),
            )
        )
        # Skew posture (guide §2.5): the e1.dst == e2.src self-join is the
        # hub-node blowup point on a power-law graph. AQE skew-join
        # (session default, spark.sql.adaptive.skewJoin.enabled) splits an
        # oversized sort-merge partition on BOTH sides at runtime —
        # including a single giant key, whose map output is split into
        # ranges joined against the duplicated other side — so per-hub
        # deg(w)^2 row generation parallelizes without a manual salt
        # branch. The partial HashAggregate below (map-side pre-aggregation
        # of the (a, b) groups) sits AHEAD of the pair exchange, so only
        # partially-collapsed pair rows cross the wire.
        agg = cand.groupBy("a", "b").agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("ra_w").cast("long").alias("ra_fp"),
            F.round(F.sum("aa_w"), 6).alias("aa_score"),
        )
        # Optimization r15 (guide §1.2 step 1): the non-edge filter is a
        # predicate purely on the GROUP KEY (a, b), so filtering AFTER
        # the aggregate is result-identical while probing the edge hash
        # once per surviving PAIR (~2.3M at sf0.01) instead of once per
        # walk row (13.8M). Formulated as LEFT OUTER + isNull rather than
        # a left_anti join because PushDownLeftSemiAntiJoin would push an
        # anti join straight back below the aggregate onto the walk
        # stream (verified in the plan; the outer form stays put —
        # interleaved A/B 3.27 vs 2.46 s on this segment). The eager
        # localCheckpoint materializes the half-pair aggregate ONCE,
        # where the mirror union used to re-run the whole walk +
        # aggregate for its second branch (measured: the union cost 2x
        # the half aggregate; exchange reuse did not absorb the mirror).
        probe = edges.select(
            F.col("src").alias("__pa"),
            F.col("dst").alias("__pb"),
            F.lit(1).alias("__hit"),
        )
        half = (
            agg.join(
                F.broadcast(probe),
                (agg["a"] == probe["__pa"]) & (agg["b"] == probe["__pb"]),
                "left_outer",
            )
            .filter(F.col("__hit").isNull())
            .drop("__pa", "__pb", "__hit")
            .localCheckpoint(eager=True)
        )
    finally:
        edges.unpersist()
    scored = half.unionByName(
        half.select(
            F.col("b").alias("a"),
            F.col("a").alias("b"),
            "n_common",
            "ra_fp",
            "aa_score",
        )
    )
    wr = Window.partitionBy("a").orderBy(F.desc("ra_fp"), "b")
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= _AA_TOPK)
        .select(
            F.col("a").alias("part_key"),
            F.col("b").alias("predicted_part"),
            F.col("rn").cast("long").alias("rank"),
            "n_common",
            "ra_fp",
            "aa_score",
        )
    )


_HITS_ITERS = 3


def _hits_oracle() -> str:
    """Unrolled fixed-iteration HITS, the graph_pagerank oracle pattern:
    every CTE is MATERIALIZED (each score table is referenced by both
    the next propagation and its own normalizer). Scores are carried
    between iterations as EXACT 1e9-scaled integers (nano-units): every
    sum is a long sum (order-independent by construction), and each
    normalization is floor((v/t) * 1e9) — two exact-long casts, one
    IEEE division, one IEEE multiply, one floor, all correctly-rounded
    deterministic ops on identical operands — so no float summation
    order exists anywhere for drift to accumulate in (round-12 advice
    closure: round-9 snapping AFTER an order-dependent float sum was
    probabilistic, not exact)."""
    ctes = [
        """edges AS MATERIALIZED (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey)""",
        "nc AS MATERIALIZED (SELECT count(DISTINCT c) AS n FROM edges)",
        """h0 AS MATERIALIZED (
        SELECT DISTINCT c, 1000000000 // nc.n AS hub
        FROM edges CROSS JOIN nc)""",
    ]
    norm = (
        "CAST(floor((CAST(v AS DOUBLE) / CAST(({t}) AS DOUBLE))"
        " * 1000000000.0) AS BIGINT)"
    )
    prev_h = "h0"
    for i in range(1, _HITS_ITERS + 1):
        ctes += [
            f"""a{i}r AS MATERIALIZED (
            SELECT e.s, CAST(sum(h.hub) AS BIGINT) AS v FROM edges e
            JOIN {prev_h} h ON h.c = e.c GROUP BY e.s)""",
            f"""a{i} AS MATERIALIZED (
            SELECT s, {norm.format(t=f'SELECT CAST(sum(v) AS BIGINT) FROM a{i}r')}
                   AS auth
            FROM a{i}r)""",
            f"""h{i}r AS MATERIALIZED (
            SELECT e.c, CAST(sum(a.auth) AS BIGINT) AS v FROM edges e
            JOIN a{i} a ON a.s = e.s GROUP BY e.c)""",
            f"""h{i} AS MATERIALIZED (
            SELECT c, {norm.format(t=f'SELECT CAST(sum(v) AS BIGINT) FROM h{i}r')}
                   AS hub
            FROM h{i}r)""",
        ]
        prev_h = f"h{i}"
    return (
        "WITH "
        + ", ".join(ctes)
        + f"""
        SELECT s AS supp_key,
               CAST(auth AS BIGINT) AS auth_nano,
               round(auth / 1000000000.0, 6) AS authority,
               CAST(row_number() OVER (
                   ORDER BY auth DESC, s) AS BIGINT) AS rank
        FROM a{_HITS_ITERS}"""
    )


@query(
    "graph_hits",
    oracle=_hits_oracle(),
    doc=(
        f"HITS hubs-and-authorities ({_HITS_ITERS} fixed iterations, "
        "sum-normalized) over the DIRECTED customer->supplier purchase "
        "graph (distinct (o_custkey, l_suppkey) pairs through "
        "orders x lineitem): authority ranks suppliers by how much "
        "well-connected-customer demand flows into them — the mutual "
        "reinforcement signal raw degree misses (a supplier serving ten "
        "broad-basket customers outranks one serving ten single-supplier "
        "customers), and the reason HITS beats degree on bipartite-ish "
        "commerce graphs where PageRank's random surfer has nowhere to "
        "walk back. Each half-iteration is ONE shuffle on the receiving "
        "key (the GraphX formulation on DataFrames, localCheckpoint "
        "lineage truncation); normalizers are 1-row broadcast "
        "aggregates. Scores are carried between iterations as EXACT "
        "1e9-scaled integers: long sums (order-independent), then "
        "floor((v/t)*1e9) per normalization — a single deterministic "
        "IEEE divide+multiply+floor on exact-long operands — so NO "
        "order-dependent float sum exists anywhere in the recursion "
        "(round-12 advice closure), and the final ordering ranks on "
        "the exact integer auth_nano with supplier-id tiebreak; the "
        "double authority column is display payload. At 100 TB the edge "
        "relation is bucketed on the propagation key per iteration; "
        "iterations are fixed, so the plan is a known 2x"
        f"{_HITS_ITERS}-shuffle pipeline, never a convergence gamble."
    ),
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .persist()
    )
    try:
        # Optimization r14 (guide §1.2 step 1, §2.4): each half-iteration
        # used to evaluate its aggregate TWICE — once under the 1-row
        # broadcast total (a_tot/h_tot re-derived a_raw/h_raw, which were
        # never persisted) and once on the main path — costing an extra
        # join+groupBy per half-step plus a broadcast-exchange job. The
        # normalizer is now an unpartitioned window SUM over the raw
        # aggregate (node-sized input: one row per supplier/customer), so
        # each half-iteration is ONE join + ONE groupBy + one single-
        # partition window: 2 Exchanges instead of 4 per half-step and no
        # broadcast job. The nano-unit integer math is unchanged — long
        # sums, then floor((v/t)*1e9) on exact-long operands — so every
        # score is bit-identical to the unrolled oracle recursion. The
        # per-half-iteration eager checkpoint stays: it bounds lineage and
        # keeps each iteration's shuffle out of the next plan.
        from pyspark.sql import Window as W

        wall = W.partitionBy()
        # hub init folded into the same window trick: 1e9 DIV n_cust as an
        # exact long division (no separate count() job).
        hubs = (
            edges.select("c")
            .distinct()
            .withColumn("__n", F.count(F.lit(1)).over(wall))
            .select("c", F.expr("CAST(1000000000 DIV __n AS BIGINT)").alias("hub"))
        )
        norm = lambda v, t: F.floor(  # noqa: E731 — one deterministic step
            (v.cast("double") / t.cast("double")) * F.lit(1000000000.0)
        ).cast("long")
        auth = None
        for _ in range(_HITS_ITERS):
            a_raw = (
                edges.join(hubs, "c").groupBy("s").agg(F.sum("hub").alias("v"))
            )
            auth = (
                a_raw.select(
                    "s", norm(F.col("v"), F.sum("v").over(wall)).alias("auth")
                )
                .localCheckpoint(eager=True)
            )
            h_raw = (
                edges.join(auth, "s").groupBy("c").agg(F.sum("auth").alias("v"))
            )
            hubs = (
                h_raw.select(
                    "c", norm(F.col("v"), F.sum("v").over(wall)).alias("hub")
                )
                .localCheckpoint(eager=True)
            )
        w = Window.orderBy(F.desc("auth_nano"), "supp_key")
        return (
            auth.select(
                F.col("s").alias("supp_key"),
                F.col("auth").alias("auth_nano"),
                F.round(F.col("auth") / 1000000000.0, 6).alias("authority"),
            )
            .withColumn("rank", F.row_number().over(w).cast("long"))
        )
    finally:
        edges.unpersist()


_JAC_TOPK = 3


@query(
    "graph_jaccard_neighbors",
    oracle=f"""
    WITH lines AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    co_edges AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lines a JOIN lines b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
    deg AS MATERIALIZED (
        SELECT src AS node, count(*) AS deg FROM co_edges GROUP BY src),
    inter AS (
        SELECT e1.src AS a, e2.dst AS b, CAST(count(*) AS BIGINT) AS n_inter
        FROM co_edges e1 JOIN co_edges e2 ON e1.dst = e2.src
        WHERE e1.src <> e2.dst
        GROUP BY 1, 2),
    scored AS (
        SELECT i.a, i.b, i.n_inter,
               CAST(da.deg + db.deg - 2 * i.n_inter AS BIGINT) + i.n_inter
                   AS n_union,
               CAST(i.n_inter AS DOUBLE)
                   / (da.deg + db.deg - i.n_inter) AS jac
        FROM inter i
        JOIN deg da ON da.node = i.a
        JOIN deg db ON db.node = i.b)
    SELECT a AS part_key, b AS other_part, CAST(rn AS BIGINT) AS rank,
           n_inter, n_union, round(jac, 6) AS jaccard
    FROM (SELECT *, row_number() OVER (
              PARTITION BY a ORDER BY jac DESC, b) AS rn
          FROM scored)
    WHERE rn <= {_JAC_TOPK}
    """,
    doc=(
        "Neighborhood-Jaccard link scoring over the part co-purchase "
        "graph (same DISTINCT co-order edge model as graph_kcore / "
        "graph_adamic_adar): for part pairs sharing >= 1 co-purchase "
        "neighbor, |N(a) n N(b)| / |N(a) u N(b)| — the normalized "
        "common-neighbor signal that corrects Adamic-Adar's hub bias "
        "(two parts each co-bought with everything score low here). "
        "BOTH directions of each pair are scored (round-12 advice "
        "closure: the old upper-triangle cut silently excluded every "
        "smaller-id partner from a part's top-3, so some parts never "
        "appeared as part_key at all), matching the adamic-adar "
        "sibling's per-part contract. "
        "EVERY quantity is exact integer arithmetic (intersection from "
        "the 2-hop join, union = deg(a)+deg(b)-inter), and the ranking "
        "orders on the RAW division of those exact integers — IEEE "
        "division of identical operands is bit-identical cross-engine, "
        "so no libm call and no float summation enters the ordering "
        "(the oracle-float rule the adamic-adar fix established); the "
        "rounded jaccard is payload. Same scale shape as the siblings: "
        "two keyed equi-joins on the edge relation, a map-side-combined "
        "degree aggregate, and a part-keyed top-k window; at 100 TB the "
        "edge relation is bucketed on src so both hops co-locate."
    ),
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    lines = li.select("l_orderkey", "l_partkey").distinct()
    # Optimization r14 (guide §1.2 step 1, §3.1): same treatment as
    # graph_adamic_adar — edges was referenced three times (e1, e2, deg)
    # with no persist (lineitem scan + self-join + DISTINCT ran 3x), and
    # the two node-sized degree lookups joined the aggregated pair stream
    # through SortMergeJoins; persist edges once, broadcast both degree
    # sides (plans/r14/graph_jaccard_neighbors_{before,after}.txt).
    edges = (
        lines.alias("a")
        .join(lines.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
        .persist()
    )
    try:
        deg = edges.groupBy("src").agg(
            F.count(F.lit(1)).alias("deg")
        ).withColumnRenamed("src", "node")
        # Optimization r14 round 2 (guide §1.2 step 1, §2.3): n_inter is
        # symmetric (the edge set contains both directions of every
        # co-order pair, so walks a->w->b and b->w->a are mirror-
        # bijective); aggregate only the a < b half of the 2-hop walk
        # stream and mirror the pair-level counts — half the aggregate
        # hashing and shuffle on the walk stream, identical scored set.
        inter_half = (
            edges.alias("e1")
            .join(edges.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
            .filter(F.col("e1.src") < F.col("e2.dst"))
            .groupBy(
                F.col("e1.src").alias("a"), F.col("e2.dst").alias("b")
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
        )
        da = F.broadcast(
            deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
        )
        db = F.broadcast(
            deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
        )
        # Optimization r15 (guide §1.2 step 1, §2.3): attach degrees and
        # compute n_union/jac on the HALF-pair aggregate BEFORE the mirror
        # (n_union and jac are symmetric: long addition commutes, so the
        # swapped direction reuses identical values), and eagerly
        # localCheckpoint the scored half so the mirror union reads the
        # materialized 2M rows instead of re-running the whole walk +
        # aggregate for its second branch (measured 2x before: exchange
        # reuse did not absorb the mirror branch). Halves the broadcast
        # degree probes and the score arithmetic as well.
        half = (
            inter_half.join(da, "a")
            .join(db, "b")
            .select(
                "a",
                "b",
                "n_inter",
                (F.col("deg_a") + F.col("deg_b") - F.col("n_inter"))
                .cast("long")
                .alias("n_union"),
                (
                    F.col("n_inter").cast("double")
                    / (F.col("deg_a") + F.col("deg_b") - F.col("n_inter"))
                ).alias("jac"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        edges.unpersist()
    scored = half.unionByName(
        half.select(
            F.col("b").alias("a"),
            F.col("a").alias("b"),
            "n_inter",
            "n_union",
            "jac",
        )
    )
    w = Window.partitionBy("a").orderBy(F.desc("jac"), "b")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _JAC_TOPK)
        .select(
            F.col("a").alias("part_key"),
            F.col("b").alias("other_part"),
            F.col("rn").cast("long").alias("rank"),
            "n_inter",
            "n_union",
            F.round("jac", 6).alias("jaccard"),
        )
    )


@query(
    "graph_closeness_bfs",
    oracle="""
    WITH lines AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    co AS MATERIALIZED (
        SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS n
        FROM lines a JOIN lines b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2),
    edges AS MATERIALIZED (SELECT src, dst FROM co WHERE n >= 2),
    d1 AS MATERIALIZED (
        SELECT src, dst FROM edges WHERE src % 20 = 0),
    d2 AS MATERIALIZED (
        SELECT DISTINCT p.src, e.dst FROM d1 p
        JOIN edges e ON p.dst = e.src
        WHERE p.src <> e.dst
          AND NOT EXISTS (SELECT 1 FROM d1 x
                          WHERE x.src = p.src AND x.dst = e.dst)),
    d3 AS MATERIALIZED (
        SELECT DISTINCT p.src, e.dst FROM d2 p
        JOIN edges e ON p.dst = e.src
        WHERE p.src <> e.dst
          AND NOT EXISTS (SELECT 1 FROM d1 x
                          WHERE x.src = p.src AND x.dst = e.dst)
          AND NOT EXISTS (SELECT 1 FROM d2 y
                          WHERE y.src = p.src AND y.dst = e.dst)),
    cnts AS (
        SELECT p.src AS part_key,
               CAST(count(*) AS BIGINT) AS c1,
               CAST(any_value(coalesce(c2, 0)) AS BIGINT) AS c2,
               CAST(any_value(coalesce(c3, 0)) AS BIGINT) AS c3
        FROM d1 p
        LEFT JOIN (SELECT src, count(*) AS c2 FROM d2 GROUP BY src) a
               ON a.src = p.src
        LEFT JOIN (SELECT src, count(*) AS c3 FROM d3 GROUP BY src) b
               ON b.src = p.src
        GROUP BY p.src)
    SELECT part_key, c1, c2, c3,
           round((6 * c1 + 3 * c2 + 2 * c3) / 6.0, 6) AS harmonic,
           CAST(row_number() OVER (
               ORDER BY 6 * c1 + 3 * c2 + 2 * c3 DESC, part_key) AS BIGINT)
               AS rank
    FROM cnts
    """,
    doc=(
        "Harmonic closeness centrality within 3 hops from SAMPLED PIVOT "
        "sources (part_key % 20 = 0 — the deterministic stand-in for "
        "the random pivot set) over the >= 2-co-order part graph (the "
        "same sparsified edge relation graph_kcore peels): sum(1/dist) "
        "over the c1 direct, c2 two-hop, c3 three-hop neighbors — the "
        "centrality that credits a part for the BREADTH of the basket "
        "neighborhood it reaches, well-defined on disconnected graphs "
        "(unreachable = 0 contribution), where raw degree sees one hop. "
        "The 1/3 terms are not binary-exact, so the score is folded "
        "into the INTEGER numerator 6*c1 + 3*c2 + 2*c3 over common "
        "denominator 6: the ranking orders on that exact integer (id "
        "tiebreak) and harmonic is one deterministic division — no "
        "float sum, no libm (the oracle-float rule). Hop sets are "
        "level-peeled frontiers (d2 excludes direct, d3 excludes both) "
        "with DISTINCT dedup, all keyed equi/anti-joins. The pivot "
        "sampling IS the scale design, not a shortcut: exact all-pairs "
        "closeness is O(n*m) and was measured infeasible even at "
        "sf0.01 on the dense >= 1-co-order graph (231k edges); "
        "Eppstein-Wang-style sampled pivots bound the frontier to "
        "O(pivots * avg 3-hop ball) at ANY scale, and the estimate "
        "sharpens by adding pivots, not by touching more graph."
    ),
)
def graph_closeness_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _closeness_from_pivots(spark, sf_dir, pivot_mod=20)


def _closeness_from_pivots(
    spark: SparkSession, sf_dir: str, pivot_mod: int
) -> DataFrame:
    """3-hop harmonic closeness from the src % pivot_mod == 0 pivot
    set. pivot_mod=20 is the registered sampled query; pivot_mod=1 is
    the exact all-sources run the error-bound property test compares
    against (feasible only on tiny graphs — the sampling IS the scale
    design)."""
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    lines = li.select("l_orderkey", "l_partkey").distinct()
    edges = (
        lines.alias("a")
        .join(lines.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("src", "dst")
        .persist()
    )
    try:
        d1 = edges.filter(F.col("src") % pivot_mod == 0).persist()
        d2 = (
            d1.alias("p")
            .join(edges.alias("e"), F.col("p.dst") == F.col("e.src"))
            .filter(F.col("p.src") != F.col("e.dst"))
            .select(F.col("p.src").alias("src"), F.col("e.dst").alias("dst"))
            .distinct()
            .join(d1, ["src", "dst"], "left_anti")
            .persist()
        )
        d3 = (
            d2.alias("p")
            .join(edges.alias("e"), F.col("p.dst") == F.col("e.src"))
            .filter(F.col("p.src") != F.col("e.dst"))
            .select(F.col("p.src").alias("src"), F.col("e.dst").alias("dst"))
            .distinct()
            .join(d1, ["src", "dst"], "left_anti")
            .join(d2, ["src", "dst"], "left_anti")
        )
        c1 = d1.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("c1"))
        c2 = d2.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("c2"))
        c3 = d3.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("c3"))
        cnts = (
            c1.join(c2, "src", "left")
            .join(c3, "src", "left")
            .select(
                F.col("src").alias("part_key"),
                "c1",
                F.coalesce("c2", F.lit(0)).cast("long").alias("c2"),
                F.coalesce("c3", F.lit(0)).cast("long").alias("c3"),
            )
        )
        numer = 6 * F.col("c1") + 3 * F.col("c2") + 2 * F.col("c3")
        w = Window.orderBy(F.desc(numer), "part_key")
        out = cnts.select(
            "part_key",
            "c1",
            "c2",
            "c3",
            F.round(numer / 6.0, 6).alias("harmonic"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        return out.localCheckpoint(eager=True)  # materialize before unpersist
    finally:
        edges.unpersist()


_CO_EDGE_SQL = """lines AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    co AS MATERIALIZED (
        SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS n
        FROM lines a JOIN lines b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2),
    edges AS MATERIALIZED (SELECT src, dst FROM co WHERE n >= 2),
    deg AS MATERIALIZED (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        FROM edges GROUP BY src)"""


def _co_edges_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The >= 2-co-order part edge relation (both directions), shared by
    kcore / closeness / assortativity / clustering."""
    li = read_table(spark, sf_dir, "lineitem")
    lines = li.select("l_orderkey", "l_partkey").distinct()
    return (
        lines.alias("a")
        .join(lines.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("src", "dst")
    )


@query(
    "graph_assortativity",
    oracle=f"""
    WITH {_CO_EDGE_SQL},
    pairs AS (
        SELECT da.deg AS x, db.deg AS y
        FROM edges e
        JOIN deg da ON da.node = e.src
        JOIN deg db ON db.node = e.dst),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM pairs)
    SELECT n AS n_directed_edges,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * (n * syy - sy * sy)), 6) AS assortativity
    FROM mom
    """,
    doc=(
        "Degree assortativity of the >= 2-co-order part graph: the "
        "Pearson correlation of endpoint degrees over every directed "
        "edge (Newman's r) — positive means hubs prefer hubs "
        "(resilient core, dedup clusters collapse together), negative "
        "means hub-and-spoke (remove the hub and the neighborhood "
        "shatters), the one-number structure summary degree "
        "distributions can't give. Rebuilt from EXACT INTEGER MOMENTS "
        "over the edge-endpoint pairs (n, Sx, Sy, Sxy, Sxx, Syy — the "
        "timeseries_dominant_period contract), so the correlation is "
        "bit-identical cross-engine before round-6; the symmetric edge "
        "relation makes x/y moments equal, which the oracle computes "
        "rather than assumes. Scale shape: degree is one "
        "map-side-combined aggregate, the endpoint join is two keyed "
        "equi-joins on the edge relation, and the moments collapse to "
        "one row."
    ),
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _co_edges_sparse(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    da = deg.select(F.col("src").alias("a"), F.col("deg").alias("x"))
    db = deg.select(F.col("src").alias("b"), F.col("deg").alias("y"))
    pairs = (
        edges.join(da, edges.src == da.a)
        .join(db, edges.dst == db.b)
        .select("x", "y")
    )
    mom = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return mom.select(
        F.col("n").alias("n_directed_edges"),
        F.round(num.cast("double") / F.sqrt(vx.cast("double") * vy), 6).alias(
            "assortativity"
        ),
    )


@query(
    "graph_local_clustering",
    oracle=f"""
    WITH {_CO_EDGE_SQL},
    wedges AS (
        SELECT e1.src AS v, e1.dst AS a, e2.dst AS b
        FROM edges e1 JOIN edges e2
          ON e1.src = e2.src AND e1.dst < e2.dst),
    tri AS (
        SELECT w.v, CAST(count(*) AS BIGINT) AS triangles
        FROM wedges w
        JOIN edges x ON x.src = w.a AND x.dst = w.b
        GROUP BY w.v)
    SELECT d.node AS part_key, d.deg,
           coalesce(t.triangles, 0) AS triangles,
           round(CAST(2 * coalesce(t.triangles, 0) AS DOUBLE)
                 / (d.deg * (d.deg - 1)), 6) AS clustering
    FROM deg d LEFT JOIN tri t ON t.v = d.node
    WHERE d.deg >= 2
    """,
    doc=(
        "Local clustering coefficient per part over the >= 2-co-order "
        "graph: 2*triangles(v) / (deg(v)*(deg(v)-1)) — how close each "
        "node's neighborhood is to a clique, the per-node refinement "
        "of graph_triangle_count's global number (a part can sit in "
        "many triangles yet cluster weakly if its degree is huge; this "
        "is the signal that separates 'bridge' parts from 'community' "
        "parts for basket segmentation). Triangles come from the "
        "wedge-then-close formulation — enumerate each node's "
        "neighbor PAIRS once (a < b), close them against the edge "
        "relation with one equi-join — the canonical distributed "
        "shape whose cost is sum(deg^2), bounded here by the "
        "sparsified relation exactly as graph_kcore bounds it; at "
        "100 TB the degree-ordered orientation halves the wedge count "
        "on hubs. All-integer counts, one deterministic division, "
        "round-6 at the boundary; isolated and degree-1 nodes are "
        "excluded (coefficient undefined)."
    ),
)
def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _co_edges_sparse(spark, sf_dir).persist()
    try:
        deg = edges.groupBy("src").agg(
            F.count(F.lit(1)).cast("long").alias("deg")
        )
        wedges = (
            edges.alias("e1")
            .join(edges.alias("e2"), F.col("e1.src") == F.col("e2.src"))
            .filter(F.col("e1.dst") < F.col("e2.dst"))
            .select(
                F.col("e1.src").alias("v"),
                F.col("e1.dst").alias("a"),
                F.col("e2.dst").alias("b"),
            )
        )
        closed = wedges.join(
            edges.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            ["a", "b"],
        )
        tri = closed.groupBy("v").agg(
            F.count(F.lit(1)).cast("long").alias("triangles")
        )
        out = (
            deg.filter(F.col("deg") >= 2)
            .join(tri, deg.src == tri.v, "left")
            .select(
                F.col("src").alias("part_key"),
                "deg",
                F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
                F.round(
                    (2 * F.coalesce("triangles", F.lit(0))).cast("double")
                    / (F.col("deg") * (F.col("deg") - 1)),
                    6,
                ).alias("clustering"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        edges.unpersist()
