"""Product quantization (PQ) for embedding compression — the codebook
half of the FAISS-style IVF+PQ ANN stack (the IVF half is
functions/similarity.py's cell-partitioned index).

A D-dim vector is split into M contiguous subvectors; each subspace
gets its own K-centroid codebook (deterministic Lloyd's, same contract
as the oracle-checked emb_kmeans_cluster: fixed init by vec_id order,
fixed iteration count, 1e-9 snapping). A vector compresses to M small
integer codes — D floats (256 bytes at D=64) become M bytes — and
asymmetric distance computation against the codebooks approximates
full-precision distances for re-ranking.

Scale shape: assignment is a narrow expression over literal centroids
(zero shuffle); each training iteration is ONE posexplode aggregate per
subspace whose K x D/M result is the model state collected driver-side
— bounded by the codebook, never the corpus. At 100 TB, train the
codebooks on a sample and broadcast them as literals, exactly like the
K-means/MinHash fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(col, centroid: list[float]):
    carr = F.array(*[F.lit(v) for v in centroid])
    return F.round(
        F.aggregate(
            F.zip_with(col, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        9,
    )


def _assign(sub_col, cents: list[list[float]]):
    """(code, dist) expressions: nearest centroid, min-index tiebreak.

    Optimization r14 (guide §1.2 step 2, §7.2): the K distances are built
    ONCE into an array and the argmin is ``array_position(arr, array_min
    (arr))`` — the first index achieving the minimum, i.e. the identical
    min-index tiebreak the previous K-deep ``when`` chain computed, but
    each distance subexpression now appears once instead of three times
    (in ``least``, in each ``when`` probe, and in the carried dist),
    shrinking the analyzed/codegen'd expression tree ~3x per subspace.
    Distances are round(·, 9)-snapped, so equality semantics are
    unchanged.

    Optimization r14 (second pass, guide §1.2 step 2, §7.3 "frames
    mentioning Analyzer/Optimizer"): the distance array is now ONE
    ``transform`` over a literal array-of-arrays codebook instead of K
    separate ``aggregate(zip_with(...))`` expressions. The dominant
    residual cost of emb_pq_codes was driver-side analysis/codegen of
    K*M higher-order-function trees (each with its own lambda bindings),
    rebuilt every Lloyd iteration because the literal centroid values
    change; folding the K per-centroid HOFs into one lambda shrinks the
    analyzed HOF count per subspace K-fold while evaluating the IDENTICAL
    float operations in the identical order (zip_with squared-diff fold
    over the same doubles, round-9 snap), so codes and distances are
    bit-identical — pinned by the suite's determinism tests and the
    in-round A/B against the previous implementation."""
    books_lit = F.array(*[F.array(*[F.lit(v) for v in c]) for c in cents])
    darr = F.transform(
        books_lit,
        lambda c: F.round(
            F.aggregate(
                F.zip_with(sub_col, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            9,
        ),
    )
    m = F.array_min(darr)
    code = (F.array_position(darr, m) - 1).cast("int")
    return code, m


def pq_encode(
    emb: DataFrame,
    n_subspaces: int = 8,
    n_centroids: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Train per-subspace codebooks and encode every vector; see pq_model."""
    return pq_model(emb, n_subspaces, n_centroids, n_iters, id_col, vec)[0]


def pq_model(
    emb: DataFrame,
    n_subspaces: int = 8,
    n_centroids: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Train per-subspace codebooks and encode every vector.

    Returns (encoded, codebooks): encoded is (vec_id, codes array<int> of
    length n_subspaces, recon_err) with recon_err the total squared
    reconstruction error across subspaces, rounded to 9 — deterministic
    run to run. codebooks[m][c] is centroid c of subspace m, the model
    state ADC search needs.
    """
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec, lambda v: v.cast("double")).alias("x"),
    )
    dim = base.select(F.size("x")).first()[0]
    sub_dim = dim // n_subspaces
    subs = base.select(
        "vec_id",
        *[
            F.slice("x", m * sub_dim + 1, sub_dim).alias(f"s{m}")
            for m in range(n_subspaces)
        ],
    )

    init = subs.orderBy("vec_id").limit(n_centroids).collect()
    books: list[list[list[float]]] = [
        [list(r[f"s{m}"]) for r in init] for m in range(n_subspaces)
    ]

    for it in range(n_iters - 1):
        # Optimization r14 (guide §1.2 step 1: don't compute things you
        # throw away): the M-step used to run one collect() PER SUBSPACE —
        # 8 jobs, each re-evaluating the assignment expressions for ALL 8
        # subspaces and keeping one — i.e. 8x the assignment compute and
        # 8 analysis/codegen/scheduling rounds per iteration. All
        # subspaces now explode into one (m, c, i, v) stream and ONE
        # map-side-combinable aggregate (guide §2.3) returns every
        # codebook in a single K*M*(D/M)-row collect. Centroid values are
        # avg + round(·, 9) exactly as before, so the 1e-9 snapping that
        # already absorbed partial-aggregation order keeps them
        # bit-identical.
        # The heavy argmin expressions are computed in a Project BELOW the
        # explode (measured 3x faster than inlining them in the generator:
        # the Generate path evaluates its generator expression row-at-a-time
        # outside whole-stage codegen); the exploded structs then carry only
        # cheap column references.
        proj = subs.select(
            *[F.col(f"s{m}") for m in range(n_subspaces)],
            *[
                _assign(F.col(f"s{m}"), books[m])[0].alias(f"c{m}")
                for m in range(n_subspaces)
            ],
        )
        assigned = proj.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            F.col(f"c{m}").alias("c"),
                            F.col(f"s{m}").alias("s"),
                        )
                        for m in range(n_subspaces)
                    ]
                )
            ).alias("e")
        )
        rows = (
            assigned.select("e.m", "e.c", F.posexplode("e.s").alias("i", "v"))
            .groupBy("m", "c", "i")
            .agg(F.round(F.avg("v"), 9).alias("mu"))
            .collect()
        )
        by_mc: dict[int, dict[int, dict[int, float]]] = {}
        for r in rows:
            by_mc.setdefault(r.m, {}).setdefault(r.c, {})[r.i] = r.mu
        # empty clusters keep their previous centroid
        for m in range(n_subspaces):
            by_c = by_mc.get(m, {})
            books[m] = [
                [by_c.get(c, {}).get(i, books[m][c][i]) for i in range(sub_dim)]
                for c in range(n_centroids)
            ]

    code_dist = [
        _assign(F.col(f"s{m}"), books[m]) for m in range(n_subspaces)
    ]
    total = code_dist[0][1]
    for cd in code_dist[1:]:
        total = total + cd[1]
    encoded = subs.select(
        "vec_id",
        F.array(*[cd[0].cast("int") for cd in code_dist]).alias("codes"),
        F.round(total, 9).alias("recon_err"),
    )
    return encoded, books


def pq_adc_topk(
    encoded: DataFrame,
    books: list[list[list[float]]],
    query: list[float],
    k: int,
) -> DataFrame:
    """Asymmetric distance computation over PQ codes: the query is NOT
    quantized — per subspace, a 1 x n_centroids lookup table of squared
    distances from the query subvector to every centroid is computed
    driver-side (O(M*K*D/M) work, model-sized), and each stored vector's
    approximate distance is the sum of M table lookups by its codes.

    ADC distance == exact squared distance from the query to the
    vector's RECONSTRUCTION (sum over subspaces of ||q_m - c_{code_m}||²)
    — an identity the tests pin. Per-row cost is M array lookups inside
    codegen; top-k via orderBy+limit (per-partition heaps)."""
    n_subspaces = len(books)
    sub_dim = len(books[0][0])
    luts = []
    for m in range(n_subspaces):
        q_m = query[m * sub_dim : (m + 1) * sub_dim]
        luts.append(
            [
                round(sum((a - b) * (a - b) for a, b in zip(q_m, c)), 9)
                for c in books[m]
            ]
        )
    dist = None
    for m in range(n_subspaces):
        lut = F.array(*[F.lit(v) for v in luts[m]])
        term = F.element_at(lut, F.element_at("codes", m + 1) + 1)
        dist = term if dist is None else dist + term
    return (
        encoded.select("vec_id", F.round(dist, 9).alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(k)
    )
