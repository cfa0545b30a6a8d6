"""FITC / predictive-process approximation tests.

With num_ind_points = n (all points inducing), FITC is exact — NLL,
estimation, and predictions must match the dense golden values
(analogous to the reference's FITC tests in test_GPModel_gaussian_process.R).
"""

import numpy as np

from gpboost_tpu import GPModel, fitGPModel

from conftest import TOLERANCE_STRICT, TOLERANCE_MEDIUM, TOLERANCE_LOOSE


class TestFITC:
    def test_nll_all_inducing_equals_exact(self, gp_sim_data):
        y = gp_sim_data["y"]
        m = GPModel(gp_coords=gp_sim_data["coords"], cov_function="exponential",
                    gp_approx="fitc", num_ind_points=100,
                    ind_points_selection="random")
        nll = m.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        assert abs(nll - 124.2549533) < TOLERANCE_STRICT

    def test_estimation_all_inducing(self, gp_sim_data):
        y = gp_sim_data["y"]
        m = fitGPModel(gp_coords=gp_sim_data["coords"],
                       cov_function="exponential", gp_approx="fitc",
                       num_ind_points=100, ind_points_selection="random", y=y,
                       params=dict(optimizer_cov="lbfgs"))
        expected = np.array([0.03276547, 1.07617676, 0.11352557])
        assert np.sum(np.abs(m.get_cov_pars() - expected)) < TOLERANCE_MEDIUM

    def test_prediction_all_inducing(self, gp_sim_data):
        y = gp_sim_data["y"]
        m = GPModel(gp_coords=gp_sim_data["coords"], cov_function="exponential",
                    gp_approx="fitc", num_ind_points=100,
                    ind_points_selection="random")
        coord_test = np.column_stack([[0.1, 0.2, 0.7], [0.9, 0.4, 0.55]])
        pred = m.predict(y=y, gp_coords_pred=coord_test,
                         cov_pars=[0.02, 1.2, 0.9], predict_var=True,
                         predict_response=True)
        exp_mu = np.array([0.08704577, 1.63875604, 0.48513581])
        exp_var = np.array([1.189093e-01, 7.427727e-02, 8.107455e-02])
        assert np.sum(np.abs(pred["mu"] - exp_mu)) < TOLERANCE_STRICT
        assert np.sum(np.abs(pred["var"] - exp_var)) < TOLERANCE_STRICT

    def test_fewer_inducing_points_approximates(self, gp_sim_data):
        y = gp_sim_data["y"]
        m = GPModel(gp_coords=gp_sim_data["coords"], cov_function="exponential",
                    gp_approx="fitc", num_ind_points=40)
        nll = m.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        assert abs(nll - 124.2549533) < 5.0  # approximation, same ballpark
