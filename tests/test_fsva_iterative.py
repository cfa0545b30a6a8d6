"""Iterative full_scale_vecchia (FSVA) engine vs the dense VIF adapter.

The dense adapter (ops/taper.VIFCovarianceFunction + DenseGaussianEngine)
is golden-pinned in test_vif_golden.py; the scale engine
(models/fsva_iterative, ref re_model_template.h:5866 vifdu + CG_utils.h
CG/SLQ) must reproduce its NLL/predictions up to SLQ sampling error.
"""

import numpy as np
import pytest

import gpboost_tpu as gpb

pytestmark = pytest.mark.slow  # compile-heavy tier (pytest.ini)


@pytest.fixture(scope="module")
def fsva_data():
    n = 1200
    rng = np.random.RandomState(2)
    coords = rng.rand(n, 2)
    y = np.sin(5 * coords[:, 0]) * np.cos(3 * coords[:, 1]) \
        + 0.4 * rng.randn(n)
    return coords, y


def _models(coords):
    kw = dict(gp_coords=coords, cov_function="exponential",
              gp_approx="full_scale_vecchia", num_ind_points=60,
              num_neighbors=15)
    dense = gpb.GPModel(matrix_inversion_method="cholesky", **kw)
    it = gpb.GPModel(matrix_inversion_method="iterative", **kw)
    assert type(it._engine).__name__ == "FSVAIterativeGaussianEngine"
    return dense, it


def test_nll_parity(fsva_data):
    coords, y = fsva_data
    dense, it = _models(coords)
    pars = [0.2, 1.0, 0.15]
    nd = dense.neg_log_likelihood(cov_pars=pars, y=y)
    ni = it.neg_log_likelihood(cov_pars=pars, y=y)
    assert abs(nd - ni) / abs(nd) < 5e-3     # SLQ estimator error


def test_fit_runs_and_matches_nugget(fsva_data):
    """Full-fit comparison: the exponential kernel's (var, range) ridge is
    microergodically flat, so the two formulations may stop at different
    ridge points under stochastic log-det gradients — the nugget and the
    resulting predictions are the identifiable quantities."""
    coords, y = fsva_data
    dense, it = _models(coords)
    p0 = {"maxit": 30, "init_cov_pars": [0.2, 1.0, 0.15]}
    dense.fit(y=y, params=dict(p0))
    it.fit(y=y, params=dict(p0))
    pd_ = dense.get_cov_pars()
    pi_ = it.get_cov_pars()
    np.testing.assert_allclose(pi_[0], pd_[0], rtol=0.05)    # nugget
    rng = np.random.RandomState(1)
    cp = rng.rand(10, 2)
    mu_d = dense.predict(gp_coords_pred=cp)["mu"]
    mu_i = it.predict(gp_coords_pred=cp)["mu"]
    np.testing.assert_allclose(mu_i, mu_d, atol=0.02)


def test_predict_parity(fsva_data):
    coords, y = fsva_data
    dense, it = _models(coords)
    rng = np.random.RandomState(1)
    cp = rng.rand(8, 2)
    pars = [0.2, 0.8, 0.2]
    pd_ = dense.predict(y=y, gp_coords_pred=cp, predict_var=True,
                        cov_pars=pars)
    pi_ = it.predict(y=y, gp_coords_pred=cp, predict_var=True,
                     cov_pars=pars)
    np.testing.assert_allclose(pi_["mu"], pd_["mu"], atol=5e-3)
    np.testing.assert_allclose(pi_["var"], pd_["var"], rtol=1e-2)


def test_covariates_and_training_re(fsva_data):
    coords, y = fsva_data
    rng = np.random.RandomState(4)
    X = np.column_stack([np.ones(len(y)), rng.rand(len(y))])
    beta = np.array([1.0, -0.5])
    y2 = y + X @ beta
    _, it = _models(coords)
    it.fit(y=y2, X=X, params={"maxit": 20,
                              "init_cov_pars": [0.2, 1.0, 0.15]})
    coef = it.get_coef()
    np.testing.assert_allclose(coef, beta, atol=0.25)  # GP absorbs part of the intercept
    tre, _ = it._engine.training_re(it.get_cov_pars(),
                                    y2 - X @ np.asarray(coef))
    assert tre.shape == (len(y), 1) and np.all(np.isfinite(tre))


def test_correlation_based_neighbors(fsva_data):
    """full_scale_vecchia_correlation_based routes through the same
    iterative engine (residual-correlation kNN, Vecchia_utils.h:192)."""
    coords, y = fsva_data
    m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="full_scale_vecchia_correlation_based",
                    num_ind_points=60, num_neighbors=15,
                    matrix_inversion_method="iterative")
    assert type(m._engine).__name__ == "FSVAIterativeGaussianEngine"
    nll = m.neg_log_likelihood(cov_pars=[0.2, 1.0, 0.15], y=y)
    assert np.isfinite(nll)
