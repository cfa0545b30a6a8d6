"""Tweedie likelihood golden tests (test_GPModel_tweedie.R)."""

import numpy as np
import pytest
from scipy import stats

from gpboost_tpu import fitGPModel, GPModel
from gpboost_tpu.utils.datasim import sim_rand_unif, qnorm

# reference tolerance is 1e-4 relative on its own optimizer endpoint; 1e-3
# absolute covers the endpoint difference (our converged nll matches to 6e-6)
TOL = 1e-3


def _sim_tweedie(mu, phi, p, init_count, init_gamma):
    lam = mu ** (2 - p) / (phi * (2 - p))
    counts = stats.poisson.ppf(sim_rand_unif(len(mu), init_count), mu=lam)
    ans = np.zeros(len(mu))
    ind = counts > 0
    u = sim_rand_unif(int(ind.sum()), init_gamma)
    ans[ind] = stats.gamma.ppf(u, a=counts[ind] * (2 - p) / (p - 1),
                               scale=phi * (p - 1) * mu[ind] ** (p - 1))
    return ans


@pytest.fixture(scope="module")
def tw_data():
    n = 120
    x = 2 * sim_rand_unif(n, 0.17) - 1
    group1 = np.repeat(np.arange(1, 21), 6)
    group2 = np.tile(np.arange(1, 13), 10)
    b1 = 0.45 * qnorm(sim_rand_unif(20, 0.73))
    b2 = 0.30 * qnorm(sim_rand_unif(12, 0.29))
    return dict(n=n, x=x, group1=group1, group2=group2, b1=b1, b2=b2)


class TestTweedie:
    def test_grouped_with_covariates(self, tw_data):
        d = tw_data
        eta = 0.25 + 0.55 * d["x"] + d["b1"][d["group1"] - 1]
        y = _sim_tweedie(np.exp(eta), 0.7, 1.55, 0.41, 0.91)
        X = np.column_stack([np.ones(d["n"]), d["x"]])
        fit = fitGPModel(group_data=d["group1"], y=y, X=X, likelihood="tweedie",
                         params=dict(maxit=30, delta_rel_conv=1e-5))
        assert np.sum(np.abs(fit.get_aux_pars()
                             - [0.6784574, 1.5862270])) < TOL
        assert np.sum(np.abs(fit.get_coef()
                             - [0.2322927, 0.5900659])) < TOL
        assert abs(fit.get_cov_pars()[0] - 0.1609974) < TOL
        assert abs(fit.get_current_neg_log_likelihood() - 162.8843124) < TOL
        pred = fit.predict(group_data_pred=d["group1"][:4],
                           X_pred=X[:4], predict_response=True,
                           predict_var=True, y=y)
        assert np.sum(np.abs(pred["mu"] - [1.1208706, 1.0178572, 1.0705185,
                                           0.9196092])) < 4 * TOL
        assert np.sum(np.abs(pred["var"] - [0.9145121, 0.7822045, 0.8488394,
                                            0.6636168])) < 4 * TOL

    def test_crossed_fixed_p(self, tw_data):
        d = tw_data
        eta = 0.15 + d["b1"][d["group1"] - 1] + d["b2"][d["group2"] - 1]
        y = _sim_tweedie(np.exp(eta), 0.7, 1.55, 0.47, 0.87)
        fit = fitGPModel(group_data=np.column_stack([d["group1"], d["group2"]]),
                         y=y, likelihood="tweedie_fixed_p",
                         likelihood_additional_param=1.55,
                         params=dict(maxit=30, delta_rel_conv=1e-5))
        assert abs(fit.get_aux_pars()[0] - 0.7761666) < TOL
        assert np.sum(np.abs(fit.get_cov_pars()
                             - [0.3481216, 0.0704993])) < 2 * TOL
        assert abs(fit.get_current_neg_log_likelihood() - 155.8381249) < TOL
