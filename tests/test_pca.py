"""PCA fit/energy/projection (operators/similarity.py): numpy parity on
crafted anisotropic data, whitening, and the distributed sufficient
statistics."""

import numpy as np
import pytest

from docs2kg_spark.operators.similarity import pca_energy, pca_fit, pca_project


def _emb_df(spark, M):
    rows = [(i, [float(x) for x in M[i]], 0) for i in range(len(M))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def _crafted(n=300, seed=11):
    # variance concentrated on axes 0 (sd 5) and 1 (sd 2); the other 62
    # axes carry sd 0.05 noise; nonzero mean tests the centering
    rng = np.random.RandomState(seed)
    M = rng.randn(n, 64) * 0.05
    M[:, 0] = rng.randn(n) * 5.0 + 3.0
    M[:, 1] = rng.randn(n) * 2.0 - 1.0
    return np.asarray(M, dtype=np.float32)


def test_pca_fit_matches_numpy(spark):
    M = _crafted()
    fit = pca_fit(_emb_df(spark, M))
    Md = M.astype(np.float64)
    cov = np.cov(Md, rowvar=False, bias=True)
    want = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert fit["n"] == len(M)
    # float32 ingestion + distributed summation: parity to ~1e-6 rel
    np.testing.assert_allclose(fit["eigvals"][:5], want[:5], rtol=1e-5)
    np.testing.assert_allclose(fit["mean"], Md.mean(axis=0), atol=1e-6)


def test_pca_energy_concentrates(spark):
    fit = pca_fit(_emb_df(spark, _crafted()))
    curve = pca_energy(fit)
    assert curve[1] > 0.98  # two crafted axes hold ~all variance
    assert curve[-1] == pytest.approx(1.0)
    assert all(b >= a for a, b in zip(curve, curve[1:]))


def test_pca_project_and_whiten(spark):
    M = _crafted()
    df = _emb_df(spark, M)
    fit = pca_fit(df)
    P = {r["vec_id"]: r["proj"] for r in pca_project(df, fit, k=2).collect()}
    Pm = np.array([P[i] for i in range(len(M))])
    # projected covariance is diagonal with the top-2 eigenvalues
    pc = np.cov(Pm, rowvar=False, bias=True)
    assert abs(pc[0, 1]) < 1e-3 * pc[0, 0]
    np.testing.assert_allclose(np.diag(pc), fit["eigvals"][:2], rtol=1e-4)
    # whitened projection has ~unit variance on both axes
    W = {r["vec_id"]: r["proj"] for r in pca_project(df, fit, k=2, whiten=True).collect()}
    Wm = np.array([W[i] for i in range(len(M))])
    np.testing.assert_allclose(Wm.var(axis=0), [1.0, 1.0], rtol=1e-3)


def test_pca_fit_rejects_tiny_input(spark):
    with pytest.raises(ValueError):
        pca_fit(_emb_df(spark, _crafted(n=1)))
