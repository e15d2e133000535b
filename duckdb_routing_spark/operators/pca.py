"""Distributed PCA over embedding columns.

The classic two-pass-free formulation: PCA needs only the d x d second-
moment matrix, the d-vector first moment, and the count — d(d+1)/2 + d + 1
numbers no matter how many vectors the corpus holds. Each partition folds
its vectors into an integer partial moment matrix with one numpy matmul
(`mapInPandas`, Arrow-batched), the partials meet in ONE tiny aggregation
shuffle (<= ~2k groups at d=64), and the eigendecomposition runs on the
driver over a d x d matrix — the only driver-side math, independent of
corpus size. Projection back over the corpus is a single broadcast-matrix
Arrow stage with no shuffle at all.

Exactness contract (the repo float policy): components are quantized ONCE
at the source — q = floor(float64(x) * scale) — so every distributed sum
is exact BIGINT under any aggregation order and partitioning, and the
DuckDB oracle reproduces the moment table bit-for-bit. Overflow bound:
|sum q_i * q_j| < n * (scale * max|x|)^2 must stay under 2^63 — at the
default scale=1000 and |x| <= ~30 that holds past 10^12 vectors.

The reference engine has no spectral surface; this module belongs to the
embedding tier of the training-data pipeline (whitening, decorrelation,
dimensionality reduction ahead of ANN / SemDeDup)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1000


def moment_components(
    emb: DataFrame, vec_col: str = "embedding", dim: int = 64, scale: int = SCALE
) -> DataFrame:
    """(i, j, s_mu) exact-integer moment table of the quantized vectors:

      (-1, -1)      -> vector count n
      (i, -1)       -> sum_vec q_i              (first moments)
      (i, j), i<=j  -> sum_vec q_i * q_j        (upper-triangle seconds)

    with q = floor(float64(x) * scale). One Arrow stage computes each
    partition's full partial moment matrix with a single integer matmul;
    the shuffle that merges partials carries d(d+1)/2 + d + 1 groups."""
    schema = "i int, j int, s_mu long"
    iu, ju = np.triu_indices(dim)

    def _partials(batches):
        g = np.zeros((dim, dim), dtype=np.int64)
        m = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(x * scale).astype(np.int64)
            g += q.T @ q
            m += q.sum(axis=0)
            n += len(q)
        yield pd.DataFrame(
            {
                "i": np.concatenate(([-1], np.arange(dim), iu)),
                "j": np.concatenate(([-1], np.full(dim, -1), ju)),
                "s_mu": np.concatenate(([n], m, g[iu, ju])),
            }
        ).astype({"i": "int32", "j": "int32", "s_mu": "int64"})

    return (
        emb.select(vec_col)
        .mapInPandas(_partials, schema)
        .groupBy("i", "j")
        .agg(F.sum("s_mu").alias("s_mu"))
    )


def moment_components_oracle_sql(
    table: str = "embeddings", vec_col: str = "embedding", dim: int = 64, scale: int = SCALE
) -> str:
    """DuckDB twin of moment_components (identical quantization: one
    float64 cast, one IEEE multiply, one floor). Row-explosive (d^2 rows
    per vector) where the Spark side is one matmul per partition — fine at
    oracle scale, which is the point of the integer contract: the oracle
    checks VALUES, the engine owns the execution shape."""
    return f"""
WITH x AS (SELECT list_transform({vec_col}, v -> floor(v::DOUBLE * {scale})::BIGINT) AS q
           FROM {table}),
pos AS (SELECT range::INT AS p FROM range({dim})),
cnt AS (SELECT -1::INT AS i, -1::INT AS j, count(*)::BIGINT AS s_mu FROM x),
firsts AS (SELECT pos.p AS i, -1::INT AS j, sum(x.q[pos.p + 1])::BIGINT AS s_mu
           FROM x, pos GROUP BY 1),
seconds AS (SELECT a.p AS i, b.p AS j, sum(x.q[a.p + 1] * x.q[b.p + 1])::BIGINT AS s_mu
            FROM x, pos a, pos b WHERE a.p <= b.p GROUP BY 1, 2)
SELECT i, j, s_mu FROM cnt
UNION ALL SELECT i, j, s_mu FROM firsts
UNION ALL SELECT i, j, s_mu FROM seconds
"""


def pca_fit(
    emb: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = SCALE,
):
    """Fit PCA from the exact moment table: returns (mean, components,
    eigvals) — mean (d,), components (k, d) rows = top-k principal axes,
    eigvals (k,) their covariance eigenvalues, all in the ORIGINAL units.

    The covariance is assembled driver-side from the collected ~2k moment
    rows (C = S/n - mu mu^T over the quantized values, rescaled), then
    numpy eigh — deterministic given the exact integers. Eigenvector sign
    is canonicalized: the largest-|.| component of each axis is positive,
    so two fits of the same corpus are byte-identical."""
    rows = moment_components(emb, vec_col, dim, scale).collect()
    s = np.zeros((dim, dim), dtype=np.float64)
    m = np.zeros(dim, dtype=np.float64)
    n = 0
    for r in rows:
        if r.i == -1:
            n = r.s_mu
        elif r.j == -1:
            m[r.i] = r.s_mu
        else:
            s[r.i, r.j] = s[r.j, r.i] = r.s_mu
    if n == 0:
        raise ValueError("cannot fit PCA on an empty corpus")
    mean_q = m / n
    cov = (s / n - np.outer(mean_q, mean_q)) / (scale * scale)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T.copy()
    for row in comps:  # deterministic sign: largest-|.| component positive
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1
    return mean_q / scale, comps, eigvals[order]


def pca_project(
    emb: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    eigvals: np.ndarray | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pca",
    whiten: bool = False,
) -> DataFrame:
    """(id_col, out_col): project every vector onto the fitted axes —
    (x - mean) @ components^T, optionally whitened by 1/sqrt(eigval) so
    the output components have unit variance. One broadcast-matrix Arrow
    stage; NO shuffle (the projection is row-local)."""
    if whiten:
        if eigvals is None:
            raise ValueError("whiten=True needs eigvals from pca_fit")
        w = components / np.sqrt(np.maximum(eigvals, 1e-12))[:, None]
    else:
        w = components
    wt = w.T.astype(np.float64).copy()
    mu = np.asarray(mean, dtype=np.float64)

    @F.pandas_udf("array<float>")
    def _proj(vs: pd.Series) -> pd.Series:
        x = np.stack(vs.to_numpy()).astype(np.float64)
        out = (x - mu) @ wt
        return pd.Series(list(out.astype(np.float32)))

    return emb.select(F.col(id_col), _proj(F.col(vec_col)).alias(out_col))


def pca_reduce(
    emb: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    whiten: bool = False,
) -> DataFrame:
    """Fit + project in one call — the embedding-pipeline convenience:
    corpus -> (vec_id, pca array<float>[k])."""
    mean, comps, eigvals = pca_fit(emb, k, vec_col, dim)
    return pca_project(emb, mean, comps, eigvals, vec_col, id_col, whiten=whiten)
