"""Distributed PCA for embedding columns.

Scale shape (the standard two-phase moment design):
1. **Fit**: one Arrow-batched ``mapInPandas`` pass emits ONE partial-moment
   row per partition — (n, sum vector, Gram matrix) — so the driver
   collects O(partitions) rows of O(d^2) floats, never data rows. The
   d x d eigendecomposition runs on the driver (d = embedding width,
   64 here; trivial at any corpus size — the cost is independent of n).
2. **Project**: the top-k components become literal arrays in a pure
   Catalyst expression (zip_with dot product), so projection is a narrow
   zero-shuffle map over the corpus, free-riding on whatever scan the
   pipeline already does.

Sign convention: each component is normalized so its largest-magnitude
coordinate is positive (eigenvector sign is otherwise arbitrary, which
would make results run-to-run unstable).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pca_fit(df: DataFrame, col: str, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (mean[d], components[k, d], explained_variance[k])."""
    first = df.select(F.size(F.col(col)).alias("d")).first()
    if first is None:
        raise ValueError("empty input")
    d = first["d"]

    moment_schema = "n long, s array<double>, g array<double>"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(d)
        g = np.zeros((d, d))
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        yield pd.DataFrame({"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]})

    parts = df.select(col).mapInPandas(partial, moment_schema).collect()
    n = sum(r.n for r in parts)
    if n < 2:
        raise ValueError("need at least 2 rows")
    s = np.sum([np.array(r.s) for r in parts], axis=0)
    g = np.sum([np.array(r.g).reshape(d, d) for r in parts], axis=0)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # deterministic sign: largest-|coord| positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def _dot_literal(col: Column, w: np.ndarray) -> Column:
    warr = F.array(*[F.lit(float(v)) for v in w])
    return F.aggregate(
        F.zip_with(col, warr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pca_project(df: DataFrame, col: str, mean: np.ndarray, comps: np.ndarray) -> DataFrame:
    """Append proj_1..proj_k columns: (x - mean) . comps[j]."""
    out = df
    for j in range(comps.shape[0]):
        offset = float(np.dot(mean, comps[j]))
        out = out.withColumn(
            f"proj_{j + 1}", _dot_literal(F.col(col), comps[j]) - F.lit(offset)
        )
    return out
