"""Iterative (sparse/structured) tapering & full-scale-tapering engine tests.

Equivalence oracle: the dense kernel-adapter engine evaluates the SAME
approximate model (ops/taper.py) exactly, so the iterative engine must agree
up to CG tolerance (quadratic form, predictions — tight) and SLQ probe noise
(log-determinant — the reference's iterative tolerance tiers, 1e-2 relative;
R-package/tests/testthat/test_GPModel_gaussian_process.R:6-9).
"""

import numpy as np
import pytest
import jax.numpy as jnp

import gpboost_tpu as gpb
from gpboost_tpu.models.fsa_iterative import FSAIterativeGaussianEngine

pytestmark = pytest.mark.slow  # compile-heavy tier (pytest.ini)


def _sim(n=350, seed=0):
    rng = np.random.RandomState(seed)
    coords = rng.uniform(size=(n, 2))
    D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    y = np.linalg.cholesky(1.2 * np.exp(-D / 0.2)
                           + 0.1 * np.eye(n)) @ rng.normal(size=n)
    return coords, y


def _pair(approx, coords, mim, **kw):
    return gpb.GPModel(gp_coords=coords, cov_function="exponential",
                       gp_approx=approx, cov_fct_taper_range=0.15,
                       cov_fct_taper_shape=1.0, num_ind_points=50,
                       matrix_inversion_method=mim, **kw)


@pytest.mark.parametrize("approx", ["tapering", "full_scale_tapering"])
def test_engine_dispatch_and_operator_exactness(approx):
    coords, y = _sim(200)
    mi = _pair(approx, coords, "iterative")
    md = _pair(approx, coords, "cholesky")
    assert isinstance(mi._engine, FSAIterativeGaussianEngine)
    assert not isinstance(md._engine, FSAIterativeGaussianEngine)
    # the structured matvec must reproduce the dense adapter matrix EXACTLY
    ed, ei = md._engine, mi._engine
    t = ed.transform_pars([0.1, 1.2, 0.2])
    th = jnp.asarray(np.log(t[1:]))
    Md = np.asarray(ed.psi_tilde(th))
    p = ei._factors(th)
    n = len(coords)
    Mi = np.column_stack([np.asarray(ei._matvec(p, jnp.asarray(
        np.eye(n)[:, j]))) for j in range(n)])
    np.testing.assert_allclose(Mi, Md, atol=1e-10)


@pytest.mark.parametrize("approx", ["tapering", "full_scale_tapering"])
def test_nll_and_grad_parity(approx):
    coords, y = _sim()
    mi = _pair(approx, coords, "iterative")
    md = _pair(approx, coords, "cholesky")
    pars = [0.1, 1.2, 0.2]
    nd = md.neg_log_likelihood(cov_pars=pars, y=y)
    ni = mi.neg_log_likelihood(cov_pars=pars, y=y)
    assert abs(ni - nd) / abs(nd) < 2e-2          # SLQ probe noise
    # profiled gradients: same direction within stochastic-trace noise
    t = md._engine.transform_pars(pars)
    th = jnp.asarray(np.log(t[1:]))
    yj = jnp.asarray(y)
    (vd, _), gd = md._engine.nll_profiled_vag(th, yj)
    (vi, _), gi = mi._engine.nll_profiled_vag(th, yj)
    gd, gi = np.asarray(gd), np.asarray(gi)
    cos = gd @ gi / (np.linalg.norm(gd) * np.linalg.norm(gi))
    assert cos > 0.99, (gd, gi)


@pytest.mark.parametrize("approx", ["tapering", "full_scale_tapering"])
def test_fit_and_predict_parity(approx):
    coords, y = _sim()
    mi = _pair(approx, coords, "iterative")
    md = _pair(approx, coords, "cholesky")
    prm = {"optimizer_cov": "lbfgs", "maxit": 30,
           "init_cov_pars": [0.2, 1.0, 0.15]}
    md.fit(y=y, params=prm)
    mi.fit(y=y, params=prm)
    pd_ = np.asarray(md.get_cov_pars()).ravel()
    pi_ = np.asarray(mi.get_cov_pars()).ravel()
    np.testing.assert_allclose(pi_, pd_, rtol=0.3, atol=0.05)
    # predictions at the SAME parameters are CG-exact (no SLQ involved)
    rng = np.random.RandomState(3)
    cp = rng.uniform(size=(7, 2))
    pars = [0.1, 1.2, 0.2]
    od = md.predict(y=y, gp_coords_pred=cp, cov_pars=pars, predict_var=True,
                    predict_response=False)
    oi = mi.predict(y=y, gp_coords_pred=cp, cov_pars=pars, predict_var=True,
                    predict_response=False)
    np.testing.assert_allclose(oi["mu"], od["mu"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(oi["var"], od["var"], rtol=1e-3, atol=1e-6)
    oc = mi.predict(y=y, gp_coords_pred=cp, cov_pars=pars,
                    predict_cov_mat=True, predict_response=False)
    dc = md.predict(y=y, gp_coords_pred=cp, cov_pars=pars,
                    predict_cov_mat=True, predict_response=False)
    np.testing.assert_allclose(oc["cov"], dc["cov"], atol=1e-5)


def test_linear_covariates_fsa_iterative():
    coords, y = _sim()
    rng = np.random.RandomState(5)
    X = np.column_stack([np.ones(len(y)), rng.normal(size=len(y))])
    beta = np.array([1.5, -0.7])
    y2 = y + X @ beta
    mi = _pair("full_scale_tapering", coords, "iterative")
    mi.fit(y=y2, X=X, params={"optimizer_cov": "lbfgs", "maxit": 30,
                              "init_cov_pars": [0.2, 1.0, 0.15]})
    coef = np.asarray(mi.get_coef()).ravel()
    np.testing.assert_allclose(coef, beta, atol=0.25)


def test_auto_dispatch_threshold():
    # auto -> iterative only at scale; small n stays on the dense adapter
    coords, _ = _sim(150)
    m_small = _pair("full_scale_tapering", coords, "auto")
    assert not isinstance(m_small._engine, FSAIterativeGaussianEngine)


def test_scale_smoke_n20k():
    """n=20k FSA: construction + one NLL+gradient evaluation must run in
    O(n(m+k)) memory (the dense adapter would need 3.2 GB just for Sigma)."""
    rng = np.random.RandomState(1)
    n = 20000
    coords = rng.uniform(size=(n, 2))
    y = np.sin(5 * coords[:, 0]) + rng.normal(size=n)
    m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="full_scale_tapering",
                    cov_fct_taper_range=0.02, cov_fct_taper_shape=1.0,
                    num_ind_points=100, matrix_inversion_method="iterative")
    assert isinstance(m._engine, FSAIterativeGaussianEngine)
    t = m._engine.transform_pars([0.5, 1.0, 0.1])
    (v, _), g = m._engine.nll_profiled_vag(jnp.asarray(np.log(t[1:])),
                                           jnp.asarray(y))
    assert np.isfinite(float(v)) and np.all(np.isfinite(np.asarray(g)))
