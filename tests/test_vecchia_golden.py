"""Golden-value parity tests for the Vecchia approximation (Gaussian).

Expected numbers from test_GPModel_gaussian_process.R:1090-1312.
"""

import numpy as np
import pytest

from gpboost_tpu import GPModel, fitGPModel

from conftest import TOLERANCE_STRICT, TOLERANCE_MEDIUM, TOLERANCE_LOOSE


class TestVecchiaGaussian:
    def test_nll_full_neighbors_equals_exact(self, gp_sim_data):
        y = gp_sim_data["y"]
        m = GPModel(gp_coords=gp_sim_data["coords"], cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=99,
                    vecchia_ordering="none")
        nll = m.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        assert abs(nll - 124.2549533) < TOLERANCE_STRICT

    def test_nll_30_neighbors(self, gp_sim_data):
        y = gp_sim_data["y"]
        m = GPModel(gp_coords=gp_sim_data["coords"], cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=30,
                    vecchia_ordering="none")
        nll = m.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        assert abs(nll - 124.2252524) < TOLERANCE_STRICT

    def test_estimation_full_neighbors(self, gp_sim_data):
        """n-1 neighbors: estimates equal the exact dense model's
        (test_GPModel_gaussian_process.R:1174-1187)."""
        y = gp_sim_data["y"]
        iu = np.triu_indices(100, k=1)
        init = [np.var(y, ddof=1) / 2, np.var(y, ddof=1) / 2,
                np.mean(gp_sim_data["D"][iu]) / 3]
        m = fitGPModel(gp_coords=gp_sim_data["coords"],
                       cov_function="exponential", gp_approx="vecchia",
                       num_neighbors=99, vecchia_ordering="none", y=y,
                       params=dict(optimizer_cov="gradient_descent", lr_cov=0.1,
                                   use_nesterov_acc=True, acc_rate_cov=0.5,
                                   delta_rel_conv=1e-6,
                                   convergence_criterion="relative_change_in_parameters",
                                   init_cov_pars=init, std_dev=True))
        expected = np.array([0.03276547, 1.07617676, 0.11352557])
        # medium, not strict: the 382-iteration reference trajectory tail runs
        # at the linear-algebra noise floor (see test_gp_gaussian_golden.py)
        assert np.sum(np.abs(m.get_cov_pars(std_err=False) - expected)) \
            < TOLERANCE_MEDIUM
        assert abs(m.get_current_neg_log_likelihood() - 122.7752664) \
            < TOLERANCE_MEDIUM

    def test_prediction_cond_all(self, gp_sim_data):
        y = gp_sim_data["y"]
        m = GPModel(gp_coords=gp_sim_data["coords"], cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=99,
                    vecchia_ordering="none")
        m.set_prediction_data(vecchia_pred_type="order_obs_first_cond_all",
                              num_neighbors_pred=102)
        coord_test = np.column_stack([[0.1, 0.2, 0.7], [0.9, 0.4, 0.55]])
        pred = m.predict(y=y, gp_coords_pred=coord_test, cov_pars=[0.02, 1.2, 0.9],
                         predict_cov_mat=True, predict_response=True)
        exp_mu = np.array([0.08704577, 1.63875604, 0.48513581])
        exp_cov = np.array(
            [1.189093e-01, 1.171632e-05, -4.172444e-07, 1.171632e-05,
             7.427727e-02, 1.492859e-06, -4.172444e-07, 1.492859e-06,
             8.107455e-02])
        assert np.sum(np.abs(pred["mu"] - exp_mu)) < TOLERANCE_STRICT
        assert np.sum(np.abs(pred["cov"].ravel() - exp_cov)) < TOLERANCE_STRICT
        # latent scale removes the nugget from the diagonal
        pred_lat = m.predict(y=y, gp_coords_pred=coord_test,
                             cov_pars=[0.02, 1.2, 0.9], predict_cov_mat=True,
                             predict_response=False)
        exp_lat = exp_cov.copy()
        exp_lat[[0, 4, 8]] -= 0.02
        assert np.sum(np.abs(pred_lat["cov"].ravel() - exp_lat)) \
            < TOLERANCE_STRICT

    def test_random_ordering_full_neighbors(self, gp_sim_data):
        """With n-1 neighbors the ordering is irrelevant: still exact."""
        y = gp_sim_data["y"]
        m = GPModel(gp_coords=gp_sim_data["coords"], cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=99,
                    vecchia_ordering="random")
        nll = m.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        assert abs(nll - 124.2549533) < TOLERANCE_STRICT


class TestVecchiaPredictionOrderings:
    """Batched prediction paths: exactness oracles at m = n-1 (full
    conditioning sets make Vecchia exact) against the dense engine."""

    def _dense_pred(self, gp_sim_data, coord_test, cov_pars, response):
        m = GPModel(gp_coords=gp_sim_data["coords"],
                    cov_function="exponential")
        return m.predict(y=gp_sim_data["y"], gp_coords_pred=coord_test,
                         cov_pars=cov_pars, predict_var=True,
                         predict_response=response)

    def test_latent_cond_all_full_neighbors_exact(self, gp_sim_data):
        y = gp_sim_data["y"]
        coord_test = np.column_stack([[0.1, 0.2, 0.7], [0.9, 0.4, 0.55]])
        cov_pars = [0.1, 1.2, 0.3]
        exact = self._dense_pred(gp_sim_data, coord_test, cov_pars, False)
        m = GPModel(gp_coords=gp_sim_data["coords"],
                    cov_function="exponential", gp_approx="vecchia",
                    num_neighbors=99, vecchia_ordering="none")
        m.set_prediction_data(
            vecchia_pred_type="latent_order_obs_first_cond_all",
            num_neighbors_pred=102)
        pred = m.predict(y=y, gp_coords_pred=coord_test, cov_pars=cov_pars,
                         predict_var=True, predict_response=False)
        assert np.max(np.abs(pred["mu"] - exact["mu"])) < 1e-4
        assert np.max(np.abs(pred["var"] - exact["var"])) < 1e-4

    def test_cond_obs_only_full_neighbors_exact(self, gp_sim_data):
        y = gp_sim_data["y"]
        coord_test = np.column_stack([[0.1, 0.2, 0.7], [0.9, 0.4, 0.55]])
        cov_pars = [0.1, 1.2, 0.3]
        exact = self._dense_pred(gp_sim_data, coord_test, cov_pars, True)
        m = GPModel(gp_coords=gp_sim_data["coords"],
                    cov_function="exponential", gp_approx="vecchia",
                    num_neighbors=99, vecchia_ordering="none")
        m.set_prediction_data(
            vecchia_pred_type="order_obs_first_cond_obs_only",
            num_neighbors_pred=100)
        pred = m.predict(y=y, gp_coords_pred=coord_test, cov_pars=cov_pars,
                         predict_var=True, predict_response=True)
        assert np.max(np.abs(pred["mu"] - exact["mu"])) < TOLERANCE_STRICT
        assert np.max(np.abs(pred["var"] - exact["var"])) < TOLERANCE_STRICT


class TestVecchiaAnisotropic:
    def test_ard_full_neighbors_equals_dense(self, gp_sim_data):
        """matern_ard Vecchia with m=n-1 reproduces the dense NLL exactly,
        and prediction uses ALL ranges (round-1 bug: alphas[0] only)."""
        y = gp_sim_data["y"]
        coords = gp_sim_data["coords"]
        cov_pars = [0.1, 1.3, 0.2, 0.4]
        dense = GPModel(gp_coords=coords, cov_function="matern_ard",
                        cov_fct_shape=1.5)
        nll_dense = dense.neg_log_likelihood(cov_pars=cov_pars, y=y)
        mv = GPModel(gp_coords=coords, cov_function="matern_ard",
                     cov_fct_shape=1.5, gp_approx="vecchia",
                     num_neighbors=99, vecchia_ordering="none")
        nll_v = mv.neg_log_likelihood(cov_pars=cov_pars, y=y)
        assert abs(nll_v - nll_dense) < TOLERANCE_STRICT

        coord_test = np.column_stack([[0.1, 0.2, 0.7], [0.9, 0.4, 0.55]])
        exact = dense.predict(y=y, gp_coords_pred=coord_test,
                              cov_pars=cov_pars, predict_var=True,
                              predict_response=True)
        mv.set_prediction_data(
            vecchia_pred_type="order_obs_first_cond_obs_only",
            num_neighbors_pred=100)
        pred = mv.predict(y=y, gp_coords_pred=coord_test, cov_pars=cov_pars,
                          predict_var=True, predict_response=True)
        assert np.max(np.abs(pred["mu"] - exact["mu"])) < TOLERANCE_STRICT
        assert np.max(np.abs(pred["var"] - exact["var"])) < TOLERANCE_STRICT

    def test_space_time_vecchia_fits(self, gp_sim_data):
        """matern_space_time + vecchia runs end to end (m=30)."""
        y = gp_sim_data["y"]
        coords3 = np.column_stack([np.linspace(0, 1, 100),
                                   gp_sim_data["coords"]])
        m = GPModel(gp_coords=coords3, cov_function="matern_space_time",
                    cov_fct_shape=1.5, gp_approx="vecchia", num_neighbors=30,
                    vecchia_ordering="time")
        nll = m.neg_log_likelihood(cov_pars=[0.1, 1.0, 0.5, 0.2], y=y)
        assert np.isfinite(nll)


class TestVecchiaLatent:
    """gp_approx='vecchia_latent': Vecchia on the latent process for Gaussian
    data via the Laplace path with the nugget as aux parameter
    (re_model_template.h:207-210; test_GPModel_gaussian_process.R:1115-1136)."""

    def test_nll_equals_exact(self, gp_sim_data):
        from gpboost_tpu import GPModel
        y = gp_sim_data["y"]
        coords = gp_sim_data["coords"]
        m0 = GPModel(gp_coords=coords, cov_function="exponential")
        exp_nll = m0.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        m = GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia_latent", num_neighbors=99,
                    vecchia_ordering="none")
        nll = m.neg_log_likelihood(cov_pars=[1.6, 0.2], y=y, aux_pars=[0.1])
        assert abs(nll - exp_nll) < 1e-5

    def test_nll_iterative(self, gp_sim_data):
        from gpboost_tpu import GPModel
        y = gp_sim_data["y"]
        coords = gp_sim_data["coords"]
        m0 = GPModel(gp_coords=coords, cov_function="exponential")
        exp_nll = m0.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        m = GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia_latent", num_neighbors=99,
                    vecchia_ordering="none",
                    matrix_inversion_method="iterative")
        m.set_optim_params(params=dict(num_rand_vec_trace=1000,
                                       seed_rand_vec_trace=1))
        nll = m.neg_log_likelihood(cov_pars=[1.6, 0.2], y=y, aux_pars=[0.1])
        assert abs(nll - exp_nll) < 0.25


class TestNeighborRedetermination:
    """UpdateNearestNeighbors for anisotropic kernels (Vecchia_utils.h:354,
    re_model_template.h:5105): neighbors live in the range-scaled coordinate
    space and are re-determined as ranges change."""

    @pytest.fixture(scope="class")
    def aniso_data(self):
        rng = np.random.RandomState(0)
        n = 400
        coords = rng.rand(n, 2)
        sc = np.array([1 / 0.05, 1 / 0.5])
        D = np.sqrt(((((coords * sc))[:, None, :]
                      - (coords * sc)[None, :, :]) ** 2).sum(-1))
        y = np.linalg.cholesky(np.exp(-D) + 1e-8 * np.eye(n)) \
            @ rng.randn(n) + 0.3 * rng.randn(n)
        return dict(coords=coords, y=y)

    def test_redetermination_improves_nll(self, aniso_data):
        import numpy as np
        from gpboost_tpu import GPModel
        d = aniso_data
        pars = [0.1, 1.2, 0.07, 0.7]
        m = GPModel(gp_coords=d["coords"], cov_function="matern_ard",
                    cov_fct_shape=0.5, gp_approx="vecchia",
                    num_neighbors=10, vecchia_ordering="none")
        nll_unscaled = m.neg_log_likelihood(cov_pars=pars, y=d["y"])
        t = m._engine.transform_pars(np.asarray(pars))
        assert m._engine.redetermine_neighbors(t[2:])
        nll_scaled = m.neg_log_likelihood(cov_pars=pars, y=d["y"])
        m0 = GPModel(gp_coords=d["coords"], cov_function="matern_ard",
                     cov_fct_shape=0.5)
        nll_exact = m0.neg_log_likelihood(cov_pars=pars, y=d["y"])
        # scaled-space neighbors approximate the exact NLL much better
        assert nll_scaled < nll_unscaled
        assert abs(nll_scaled - nll_exact) < 0.3 * abs(nll_unscaled
                                                       - nll_exact)

    def test_ard_fit_recovers_anisotropy(self, aniso_data):
        from gpboost_tpu import fitGPModel
        d = aniso_data
        m = fitGPModel(gp_coords=d["coords"], cov_function="matern_ard",
                       cov_fct_shape=0.5, gp_approx="vecchia",
                       num_neighbors=30, vecchia_ordering="none",
                       y=d["y"], params={"optimizer_cov": "lbfgs",
                                         "maxit": 100})
        m0 = fitGPModel(gp_coords=d["coords"], cov_function="matern_ard",
                        cov_fct_shape=0.5, y=d["y"],
                        params={"optimizer_cov": "lbfgs", "maxit": 100})
        est, est0 = np.asarray(m.get_cov_pars()), np.asarray(m0.get_cov_pars())
        # both recover the 10x range anisotropy
        assert est[3] / est[2] > 5 and est0[3] / est0[2] > 5
        assert abs(m.get_current_neg_log_likelihood()
                   - m0.get_current_neg_log_likelihood()) < 2.0
