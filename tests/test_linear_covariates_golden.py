"""Golden-value tests for Gaussian models with a linear regression term.

Expected numbers from test_GPModel_gaussian_process.R
("Gaussian process model with linear regression term").
"""

import numpy as np

from gpboost_tpu import fitGPModel

from conftest import TOLERANCE_STRICT


class TestGPWithLinearRegression:
    def test_fisher_scoring_wls(self, gp_sim_data):
        d = gp_sim_data
        beta = np.array([2.0, 2.0])
        y = d["eps"] + d["X"] @ beta + d["xi"]
        iu = np.triu_indices(100, k=1)
        init = [np.var(y, ddof=1) / 2, np.var(y, ddof=1) / 2,
                np.mean(d["D"][iu]) / 3]
        gp_model = fitGPModel(
            gp_coords=d["coords"], cov_function="exponential", y=y, X=d["X"],
            params=dict(optimizer_cov="fisher_scoring", optimizer_coef="wls",
                        delta_rel_conv=1e-6, use_nesterov_acc=False,
                        convergence_criterion="relative_change_in_parameters",
                        init_cov_pars=init, std_dev=True))
        exp_cov = np.array([0.008461342, 0.069973492, 1.001562822,
                            0.214358560, 0.094656409, 0.029400407])
        exp_coef = np.array([2.30780026, 0.21365770, 1.89951426, 0.09484768])
        cov_i = np.asarray(gp_model.get_cov_pars(std_err=True)).T.ravel()
        coef_i = np.asarray(gp_model.get_coef(std_err=True)).T.ravel()
        assert np.sum(np.abs(cov_i - exp_cov)) < TOLERANCE_STRICT
        assert np.sum(np.abs(coef_i - exp_coef)) < TOLERANCE_STRICT
        assert abs(gp_model.get_current_neg_log_likelihood() - 121.482402) \
            < TOLERANCE_STRICT

        # prediction with X_pred
        coord_test = np.column_stack([[0.1, 0.2, 0.201], [0.9, 0.4, 0.401]])
        X_test = np.column_stack([np.ones(3), [-0.5, 0.2, 0.4]])
        pred = gp_model.predict(gp_coords_pred=coord_test, X_pred=X_test,
                                predict_cov_mat=True, predict_response=True)
        exp_mu = np.array([1.196952, 4.063324, 4.446861])
        exp_cov_p = np.array(
            [6.305383e-01, 1.358861e-05, 1.414550e-05, 1.358861e-05,
             3.469270e-01, 3.282926e-01, 1.414550e-05, 3.282926e-01,
             3.561731e-01])
        assert np.sum(np.abs(pred["mu"] - exp_mu)) < TOLERANCE_STRICT
        assert np.sum(np.abs(pred["cov"].ravel() - exp_cov_p)) < TOLERANCE_STRICT
