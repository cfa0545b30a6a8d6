"""Iterative (matrix-free) combined Vecchia GP + grouped-RE engine vs the
dense joint-H formulation.

The dense engine is golden-pinned against the reference R suite
(test_combined_gp_re_golden.py / test_GPModel_combined_GP_random_effects.R);
here the scale formulation (models/vecchia_grouped._build_jitted_iterative,
ref re_model_template.h:7085 sparse-chol/SSOR-CG default) is checked against
it: marginal NLL, fits, and predictions must agree up to SLQ sampling error.
"""

import numpy as np
import pytest
from scipy.stats import norm

import gpboost_tpu as gpb

pytestmark = pytest.mark.slow  # compile-heavy tier (pytest.ini)


@pytest.fixture(scope="module")
def combo_data():
    n, q = 1200, 30
    rng = np.random.RandomState(7)
    coords = np.round(rng.rand(n, 2), 2)          # induces duplicate coords
    g = rng.randint(0, q, n)
    bg = 0.7 * rng.normal(size=q)
    f = np.sin(5 * coords[:, 0]) * np.cos(3 * coords[:, 1])
    y = (rng.rand(n) < norm.cdf(f + bg[g])).astype(float)
    return dict(n=n, q=q, coords=coords, g=g, y=y)


def _models(d, **extra):
    kw = dict(group_data=d["g"], gp_coords=d["coords"],
              cov_function="exponential", gp_approx="vecchia",
              num_neighbors=15, likelihood="bernoulli_probit", **extra)
    dense = gpb.GPModel(matrix_inversion_method="cholesky", **kw)
    it = gpb.GPModel(matrix_inversion_method="iterative", **kw)
    return dense, it


def test_nll_parity(combo_data):
    dense, it = _models(combo_data)
    pars = np.array([0.5, 1.0, 0.12])
    nd = dense.neg_log_likelihood(cov_pars=pars, y=combo_data["y"])
    ni = it.neg_log_likelihood(cov_pars=pars, y=combo_data["y"])
    assert abs(nd - ni) / abs(nd) < 5e-3       # SLQ estimator error


def test_fit_parity(combo_data):
    dense, it = _models(combo_data)
    p0 = {"maxit": 30, "init_cov_pars": [0.5, 1.0, 0.12]}
    dense.fit(y=combo_data["y"], params=dict(p0))
    it.fit(y=combo_data["y"], params=dict(p0))
    pd_ = dense.get_cov_pars()
    pi_ = it.get_cov_pars()
    # stochastic log-det gradients wiggle the optimum a little
    np.testing.assert_allclose(pi_, pd_, rtol=0.15)
    assert it.get_num_optim_iter() > 0
    # CG iteration counter is live (GetNumCGSteps analogue)
    assert it.get_num_cg_steps() > 0


def test_predict_parity(combo_data):
    dense, it = _models(combo_data)
    rng = np.random.RandomState(1)
    cp = rng.rand(7, 2)
    q = combo_data["q"]
    gp_new = np.array([0, 1, 2, 3, q, q, 2])   # includes new group levels
    pars = np.array([0.5, 0.8, 0.15])
    kw = dict(y=combo_data["y"], gp_coords_pred=cp, group_data_pred=gp_new,
              predict_var=True, cov_pars=pars)
    pd_ = dense.predict(**kw)
    pi_ = it.predict(**kw)
    np.testing.assert_allclose(pi_["mu"], pd_["mu"], atol=5e-3)
    np.testing.assert_allclose(pi_["var"], pd_["var"], rtol=2e-2)


def test_predict_response_parity(combo_data):
    dense, it = _models(combo_data)
    rng = np.random.RandomState(2)
    cp = rng.rand(5, 2)
    gp_new = np.array([0, 1, 2, 3, 4])
    pars = np.array([0.5, 0.8, 0.15])
    kw = dict(y=combo_data["y"], gp_coords_pred=cp, group_data_pred=gp_new,
              predict_var=True, predict_response=True, cov_pars=pars)
    pd_ = dense.predict(**kw)
    pi_ = it.predict(**kw)
    np.testing.assert_allclose(pi_["mu"], pd_["mu"], atol=5e-3)
    np.testing.assert_allclose(pi_["var"], pd_["var"], rtol=2e-2)


def test_gaussian_likelihood_joint(combo_data):
    """Gaussian y runs through the joint-latent path (gaussian_latent)
    with the error variance as the likelihood aux parameter."""
    rng = np.random.RandomState(3)
    d = combo_data
    yg = np.sin(5 * d["coords"][:, 0]) + 0.3 * rng.normal(size=d["n"])
    it = gpb.GPModel(group_data=d["g"], gp_coords=d["coords"],
                     cov_function="exponential", gp_approx="vecchia",
                     num_neighbors=15, likelihood="gaussian",
                     matrix_inversion_method="iterative")
    it.fit(y=yg, params={"maxit": 20, "init_cov_pars": [0.5, 1.0, 0.12]})
    assert np.all(np.isfinite(it.get_cov_pars()))
