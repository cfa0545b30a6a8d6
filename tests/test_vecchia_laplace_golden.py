"""Vecchia-Laplace golden tests (binary classification, Vecchia GP).

Expected values from test_GPModel_non_Gaussian_data.R:1354-1500 — with
num_neighbors = n-1 and ordering "none" the Vecchia-Laplace results equal the
dense Laplace ones exactly.
"""

import numpy as np
import pytest
from scipy import stats

from gpboost_tpu import GPModel
from gpboost_tpu.utils.datasim import sim_rand_unif, qnorm

TOL_STRICT = 1e-6
TOL_MEDIUM = 1e-3


@pytest.fixture(scope="module")
def vl_data():
    n, d = 100, 2
    coords = sim_rand_unif(n * d, init_c=0.1).reshape(d, n).T
    D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    L = np.linalg.cholesky(np.exp(-D / 0.1) + 1e-20 * np.eye(n))
    probs = stats.norm.cdf(L @ qnorm(sim_rand_unif(n, init_c=0.8)))
    y = (sim_rand_unif(n, init_c=0.19341) < probs).astype(float)
    X = np.column_stack([np.ones(n),
                         np.sin((np.arange(1, n + 1) - n / 2) ** 2 * 2 * np.pi / n)])
    return coords, D, y, X


class TestVecchiaLaplaceBinary:
    def test_nll(self, vl_data):
        coords, D, y, X = vl_data
        m = GPModel(gp_coords=coords, cov_function="exponential",
                    likelihood="bernoulli_probit", gp_approx="vecchia",
                    num_neighbors=99, vecchia_ordering="none")
        nll = m.neg_log_likelihood(cov_pars=[1.0, 0.2], y=y)
        assert abs(nll - 67.18342059) < TOL_STRICT

    def test_estimation_with_covariates(self, vl_data):
        coords, D, y, X = vl_data
        iu = np.triu_indices(100, k=1)
        m = GPModel(gp_coords=coords, cov_function="exponential",
                    likelihood="bernoulli_probit", gp_approx="vecchia",
                    num_neighbors=99, vecchia_ordering="none")
        m.fit(y=y, X=X, params=dict(
            optimizer_cov="gradient_descent", optimizer_coef="gradient_descent",
            use_nesterov_acc=True, lr_cov=0.1, lr_coef=0.1, maxit=1000,
            acc_rate_cov=0.5, init_cov_pars=[1.0, np.mean(D[iu]) / 3]))
        assert np.sum(np.abs(m.get_cov_pars()
                             - [0.92350821208, 0.05944214192])) < TOL_STRICT
        assert np.sum(np.abs(m.get_coef()
                             - [0.3983333, -0.2653886])) < TOL_STRICT
        assert m.get_num_optim_iter() == 17

        coord_test = np.column_stack([[0.1, 0.11, 0.7], [0.9, 0.91, 0.55]])
        X_test = np.column_stack([np.ones(3), [-0.5, 0.2, 1.0]])
        pred = m.predict(y=y, gp_coords_pred=coord_test, predict_var=True,
                         predict_response=False, cov_pars=[1.0, 0.2],
                         X_pred=X_test)
        assert np.sum(np.abs(pred["mu"]
                             - [0.3389905, 0.1512445, -0.1039307])) < TOL_MEDIUM
        assert np.sum(np.abs(pred["var"]
                             - [0.6193229, 0.6159349, 0.4291674])) < TOL_MEDIUM
        predr = m.predict(y=y, gp_coords_pred=coord_test, predict_var=True,
                          predict_response=True, cov_pars=[1.0, 0.2],
                          X_pred=X_test)
        assert np.sum(np.abs(predr["mu"]
                             - [0.6050312, 0.5473537, 0.4653610])) < TOL_MEDIUM
        assert np.sum(np.abs(predr["var"]
                             - [0.2389684, 0.2477576, 0.2488001])) < TOL_MEDIUM
