"""AR1 multifidelity covariance golden parity.

Expected numbers from test_GPModel_ar1_multifidelity.R (reference:
cov_fcts.h:1690 InitializeAR1Multifidelity, :1798
CalculateCovMatAR1Multifidelity).
"""

import numpy as np
import pytest

import gpboost_tpu as gpb
from gpboost_tpu.utils.datasim import sim_rand_unif, qnorm


@pytest.fixture(scope="module")
def ar1_data():
    """simulate_ar1_mf_test_data (test_GPModel_ar1_multifidelity.R:31-45)."""
    x_low = np.linspace(0.02, 0.98, 18)
    x_high = np.linspace(0.04, 0.96, 14) + 0.001
    gc = np.vstack([np.column_stack([x_low, np.zeros(18)]),
                    np.column_stack([x_high, np.ones(14)])])
    cov_pars = np.array([0.08, 1.1, 0.25, 0.5, 0.12, -0.6])

    def K_of(gpc, cp):
        f = gpc[:, -1]
        c = gpc[:, :-1]
        D = np.abs(c[:, None, 0] - c[None, :, 0])
        Kl = cp[0] * np.exp(-D / cp[1])
        Kd = cp[2] * np.exp(-D / cp[3])
        L = np.where(f == 0, 1.0, cp[4])
        return Kl * np.outer(L, L) + Kd * np.outer(f, f)

    K = K_of(gc, cov_pars[1:])
    lat = np.linalg.cholesky(K + 1e-10 * np.eye(32)) \
        @ qnorm(sim_rand_unif(32, 0.8))
    y = lat + np.sqrt(0.08) * qnorm(sim_rand_unif(32, 0.1))
    from scipy.stats import norm
    y_bin = (sim_rand_unif(32, 0.2341) < norm.cdf(0.2 + lat)).astype(float)
    return dict(gc=gc, cov_pars=cov_pars, y=y, y_bin=y_bin)


class TestGaussianAR1MF:
    def test_nll(self, ar1_data):
        d = ar1_data
        m = gpb.GPModel(gp_coords=d["gc"], cov_function="ar1_mf_exponential")
        nll = m.neg_log_likelihood(y=d["y"], cov_pars=d["cov_pars"])
        assert abs(nll - 32.151882541105891) < 1e-7

    def test_fit_and_predict(self, ar1_data):
        d = ar1_data
        m = gpb.fitGPModel(gp_coords=d["gc"],
                           cov_function="ar1_mf_exponential", y=d["y"],
                           params=dict(init_cov_pars=d["cov_pars"],
                                       optimizer_cov="lbfgs", maxit=100))
        est = np.asarray(m.get_cov_pars())
        expected = [0.08322014059140172, 1.5703531702502687,
                    0.7399583067633473, 0.29026274917533995,
                    0.07650147001772063, -0.34035408255962485]
        assert np.max(np.abs(est - expected)) < 2e-3
        assert abs(m.get_current_neg_log_likelihood()
                   - 29.648872793557288) < 1e-5
        pr = m.predict(gp_coords_pred=np.array([[0.333, 0], [0.777, 1]]),
                       predict_var=True)
        assert np.max(np.abs(pr["mu"] - [1.2562002371164092,
                                         -0.6291054571606833])) < 2e-3
        assert np.max(np.abs(pr["var"] - [0.17368271785874975,
                                          0.24035170660934424])) < 2e-3

    def test_ard_estimate_shape_base(self, ar1_data):
        d = ar1_data
        gc3 = np.column_stack([d["gc"][:, 0], d["gc"][:, 0] ** 2,
                               d["gc"][:, 1]])
        m = gpb.GPModel(gp_coords=gc3,
                        cov_function="ar1_mf_matern_ard_estimate_shape")
        pars = [0.08, 1.1, 0.25, 0.4, 1.5, 0.5, 0.12, 0.3, 2.5, -0.6]
        nll = m.neg_log_likelihood(y=d["y"], cov_pars=pars)
        assert abs(nll - 33.334283736830095) < 1e-6

    def test_vecchia_euclidean(self, ar1_data):
        d = ar1_data
        m = gpb.GPModel(gp_coords=d["gc"], cov_function="ar1_mf_exponential",
                        gp_approx="vecchia_euclidean", num_neighbors=6,
                        vecchia_ordering="none")
        nll = m.neg_log_likelihood(y=d["y"], cov_pars=d["cov_pars"])
        assert abs(nll - 32.227109558939020) < 1e-7


class TestNonGaussianAR1MF:
    def test_bernoulli_exact_nll(self, ar1_data):
        d = ar1_data
        m = gpb.GPModel(gp_coords=d["gc"], cov_function="ar1_mf_exponential",
                        likelihood="bernoulli_probit")
        nll = m.neg_log_likelihood(y=d["y_bin"],
                                   cov_pars=d["cov_pars"][1:])
        assert abs(nll - 20.102559552391824) < 1e-6

    def test_bernoulli_fit_two_iters(self, ar1_data):
        d = ar1_data
        m = gpb.fitGPModel(gp_coords=d["gc"],
                           cov_function="ar1_mf_exponential",
                           likelihood="bernoulli_probit", y=d["y_bin"],
                           params=dict(init_cov_pars=d["cov_pars"][1:],
                                       optimizer_cov="lbfgs", maxit=2))
        assert np.all(np.isfinite(np.asarray(m.get_cov_pars())))
        assert np.isfinite(m.get_current_neg_log_likelihood())


class TestValidation:
    def test_rejects_invalid_fidelity(self, ar1_data):
        d = ar1_data
        bad = d["gc"].copy()
        bad[5, -1] = 2.0
        with pytest.raises(ValueError, match="0 \\(low fidelity\\) and 1"):
            gpb.GPModel(gp_coords=bad, cov_function="ar1_mf_exponential")

    def test_rejects_invalid_pred_fidelity(self, ar1_data):
        d = ar1_data
        m = gpb.GPModel(gp_coords=d["gc"],
                        cov_function="ar1_mf_exponential")
        with pytest.raises(ValueError, match="found -1"):
            m.predict(y=d["y"], cov_pars=d["cov_pars"],
                      gp_coords_pred=np.array([[0.5, -1.0]]),
                      predict_var=True)
