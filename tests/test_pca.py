"""Distributed PCA: exact-integer moment parity vs a direct numpy
reference, eigenfit determinism, projection/whitening semantics, and the
no-shuffle plan shape of the projection stage."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_routing_spark.operators import pca
from duckdb_routing_spark.plans.audit import formatted_plan
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def X(emb):
    return np.stack(emb.orderBy("vec_id").toPandas()["embedding"].to_numpy()).astype(np.float64)


def test_moment_components_match_numpy_exactly(spark, emb, X):
    """The distributed integer moments equal a single-process numpy fold
    of the same quantization — bit-for-bit, any partitioning."""
    q = np.floor(X * 1000).astype(np.int64)
    got = {(r.i, r.j): r.s_mu for r in pca.moment_components(emb.repartition(13)).collect()}
    assert got[(-1, -1)] == len(q)
    g = q.T @ q
    m = q.sum(axis=0)
    for i in range(64):
        assert got[(i, -1)] == m[i]
        for j in range(i, 64):
            assert got[(i, j)] == g[i, j]
    assert len(got) == 64 * 65 // 2 + 64 + 1


def test_pca_fit_matches_reference_and_is_deterministic(spark, emb, X):
    """pca_fit reproduces the numpy eigendecomposition of the quantized
    covariance (same sign canonicalization), and two fits are
    byte-identical."""
    q = np.floor(X * 1000)
    cov = (q.T @ q / len(q) - np.outer(q.mean(0), q.mean(0))) / 1e6
    ev, vecs = np.linalg.eigh(cov)
    order = np.argsort(ev)[::-1][:8]
    ref = vecs[:, order].T.copy()
    for row in ref:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1
    mean, comps, eigs = pca.pca_fit(emb, k=8)
    assert np.allclose(comps, ref, atol=1e-12)
    assert np.allclose(eigs, ev[order])
    mean2, comps2, eigs2 = pca.pca_fit(emb, k=8)
    assert (mean == mean2).all() and (comps == comps2).all() and (eigs == eigs2).all()


def test_pca_projection_semantics(spark, emb):
    """Projected variance equals the eigenvalues in non-increasing order;
    whitening normalizes every component to unit variance; components are
    mutually uncorrelated (PCA's decorrelation contract)."""
    mean, comps, eigs = pca.pca_fit(emb, k=8)
    P = np.stack(
        pca.pca_project(emb, mean, comps, eigs).toPandas()["pca"].to_numpy()
    ).astype(np.float64)
    var = P.var(axis=0)
    assert np.allclose(var, eigs, rtol=1e-3)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(len(var) - 1))
    c = np.corrcoef(P.T)
    assert np.allclose(c - np.diag(np.diag(c)), 0, atol=1e-2)
    W = np.stack(
        pca.pca_project(emb, mean, comps, eigs, whiten=True).toPandas()["pca"].to_numpy()
    )
    assert np.allclose(W.var(axis=0), 1.0, rtol=1e-3)


def test_pca_reduce_end_to_end_and_plan(spark, emb):
    """pca_reduce yields (vec_id, k-dim array); the projection plan has NO
    exchange (row-local broadcast matmul) and exactly one Python stage."""
    out = pca.pca_reduce(emb, k=4)
    rows = out.collect()
    assert len(rows) == emb.count() and all(len(r.pca) == 4 for r in rows)
    plan = formatted_plan(out)
    assert "Exchange" not in plan
    # reconstruction improves with k: top-4 explains less than top-16
    mean, comps, eigs = pca.pca_fit(emb, k=16)
    assert eigs[:4].sum() < eigs.sum()


def test_pca_fit_empty_raises(spark, emb):
    with pytest.raises(ValueError):
        pca.pca_fit(emb.filter("vec_id < 0"), k=2)
