"""Similarity-search primitives over embedding columns (array<float>).

The exact path (cosine via zip_with + aggregate) is a pure Catalyst
expression: elementwise double products accumulated left-to-right, which is
bit-identical to a sequential SQL implementation — that's what makes the
brute-force top-k oracle-checkable. The approximate path (random
hyperplane LSH) is the 100 TB strategy: candidate generation touches only
bucket-colliding pairs instead of the full cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# SQL twin (DuckDB): identical arithmetic, sequential over the list.
def sql_dot(a: str, b: str) -> str:
    return f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, one window per query for the top-k cut.

    Scale shape: |Q| × |corpus| scored rows with Q broadcast — linear in
    corpus size, no corpus self-join. The per-query window shuffles only
    the scored pairs, and ranking uses the rounded score with the corpus
    id as tiebreak so results are stable across engines.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec).alias("__qvec")
    )
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec).alias("__cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (LCG-based so no
    numpy state leaks into the plan; same planes every run)."""
    planes: list[list[float]] = []
    state = seed & 0x7FFFFFFF
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append((state / float(1 << 31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id from random-hyperplane projections: bit i set
    iff dot(vec, plane_i) >= 0. Cosine-similar vectors collide with high
    probability; bucket count = 2^n_planes."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(vec, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    df: DataFrame,
    k: int,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Approximate all-pairs top-k via multi-table random-hyperplane LSH.

    Each of the L tables buckets on n_planes hyperplane signs; a pair is a
    candidate if it collides in ANY table (OR-amplification): recall is
    1 - (1 - p^n_planes)^n_tables for collision probability p = 1 - θ/π.
    Candidates are deduped across tables, then scored exactly.

    At 100 TB this replaces the O(n^2) cross join with one shuffle per
    table over (bucket, vector) plus within-bucket scoring: tune n_planes
    up to shrink buckets, n_tables up to recover recall.
    """
    tagged = df.select(F.col(id_col).alias("id"), F.col(vec).alias("v"))
    # One bucket column per table, then explode: a single shuffle on
    # (table, bucket) instead of L separate joins.
    bucket_cols = []
    for t in range(n_tables):
        planes = random_hyperplanes(dim, n_planes, seed=42 + 1000 * t)
        bucket_cols.append(
            F.struct(F.lit(t).alias("t"), lsh_bucket(F.col("v"), planes).alias("b"))
        )
    bucketed = tagged.select(
        "id", "v", F.explode(F.array(*bucket_cols)).alias("tb")
    ).select("id", "v", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    left = bucketed.select(F.col("id").alias("query_id"), F.col("v").alias("__qv"), "t", "b")
    right = bucketed.select(F.col("id").alias("neighbor_id"), "t", "b")
    candidates = (
        left.join(right, ["t", "b"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "__qv", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    corpus = tagged.select(F.col("id").alias("neighbor_id"), F.col("v").alias("__cv"))
    scored = candidates.join(corpus, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )
