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
    """(code, dist) expressions: nearest centroid, min-index tiebreak."""
    dists = [_sq_dist(sub_col, c) for c in cents]
    m = F.least(*dists)
    code = F.lit(len(cents) - 1)
    for cid in range(len(cents) - 2, -1, -1):
        code = F.when(dists[cid] == m, F.lit(cid)).otherwise(code)
    return code, m


def pq_encode(
    emb: DataFrame,
    n_subspaces: int = 8,
    n_centroids: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Train per-subspace codebooks and encode every vector.

    Returns (vec_id, codes array<int> of length n_subspaces, recon_err)
    where recon_err is the total squared reconstruction error across
    subspaces, rounded to 9 — deterministic run to run.
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
        assigned = subs.select(
            "vec_id",
            *[F.col(f"s{m}") for m in range(n_subspaces)],
            *[
                _assign(F.col(f"s{m}"), books[m])[0].alias(f"c{m}")
                for m in range(n_subspaces)
            ],
        )
        for m in range(n_subspaces):
            rows = (
                assigned.select(F.col(f"c{m}").alias("c"), F.posexplode(f"s{m}").alias("i", "v"))
                .groupBy("c", "i")
                .agg(F.round(F.avg("v"), 9).alias("mu"))
                .collect()
            )
            by_c: dict[int, dict[int, float]] = {}
            for r in rows:
                by_c.setdefault(r.c, {})[r.i] = r.mu
            # empty clusters keep their previous centroid
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
    return subs.select(
        "vec_id",
        F.array(*[cd[0].cast("int") for cd in code_dist]).alias("codes"),
        F.round(total, 9).alias("recon_err"),
    )
