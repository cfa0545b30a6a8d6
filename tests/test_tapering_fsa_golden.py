"""Golden-value parity for gp_approx='tapering' and 'full_scale_tapering'.

Expected numbers from test_GPModel_gaussian_process.R:1893-2008 (Tapering)
and :2262-2400 (FSA). The tapering goldens are fully portable; the FSA
small-taper-range goldens depend on the reference's kmeans++ draw, so those
are asserted against the no-approximation fit (the same equivalence the
reference asserts) plus a loose check against the reference numbers.
"""

import numpy as np
import pytest

from gpboost_tpu import GPModel, fitGPModel

from conftest import TOLERANCE_STRICT, TOLERANCE_MEDIUM, TOLERANCE_LOOSE

GD_PARAMS = dict(
    optimizer_cov="gradient_descent", lr_cov=0.1, use_nesterov_acc=True,
    acc_rate_cov=0.5, delta_rel_conv=1e-6, optimizer_coef="gradient_descent",
    lr_coef=0.1,
    convergence_criterion="relative_change_in_log_likelihood",
)

COORD_TEST = np.column_stack([[0.1, 0.2, 0.7], [0.9, 0.4, 0.55]])
X_TEST = np.column_stack([np.ones(3), [-0.5, 0.2, 0.4]])


@pytest.fixture(scope="module")
def reg_data(gp_sim_data):
    y = gp_sim_data["eps"] + gp_sim_data["X"] @ np.array([2.0, 2.0]) \
        + gp_sim_data["xi"]
    iu = np.triu_indices(100, k=1)
    md = np.mean(gp_sim_data["D"][iu])
    return dict(y=y, X=gp_sim_data["X"], coords=gp_sim_data["coords"], md=md)


class TestTapering:
    """test_GPModel_gaussian_process.R:1893-2008."""

    def test_nll_large_taper_range_equals_exact(self, reg_data):
        init = [np.var(reg_data["y"], ddof=1) / 2,
                np.var(reg_data["y"], ddof=1) / 2, reg_data["md"] / 3]
        gp_model = GPModel(gp_coords=reg_data["coords"],
                           cov_function="exponential", gp_approx="tapering",
                           cov_fct_taper_shape=0, cov_fct_taper_range=1e6)
        nll = gp_model.neg_log_likelihood(y=reg_data["y"], cov_pars=init)
        assert abs(nll - 212.9854341) < TOLERANCE_STRICT

    def test_fit_large_taper_range(self, reg_data):
        params = dict(GD_PARAMS)
        params["init_cov_pars"] = [np.var(reg_data["y"], ddof=1) / 2,
                                   np.var(reg_data["y"], ddof=1) / 2,
                                   reg_data["md"] / 3]
        gp_model = fitGPModel(gp_coords=reg_data["coords"],
                              cov_function="exponential",
                              gp_approx="tapering", cov_fct_taper_shape=0,
                              cov_fct_taper_range=1e6, y=reg_data["y"],
                              X=reg_data["X"], params=params)
        est = np.asarray(gp_model.get_cov_pars())
        assert np.sum(np.abs(est - [0.01621846, 0.99717680, 0.09616230])) \
            < TOLERANCE_MEDIUM
        coef = np.asarray(gp_model.get_coef())
        assert np.sum(np.abs(coef - [2.30554610, 1.89920767])) \
            < TOLERANCE_MEDIUM
        assert gp_model.get_num_optim_iter() == 100
        pred = gp_model.predict(gp_coords_pred=COORD_TEST, X_pred=X_TEST,
                                predict_cov_mat=True)
        expected_mu = [1.195910242, 4.060125034, 3.15963272]
        expected_cov = np.array(
            [6.304732e-01, 1.313601e-05, 1.008080e-07, 1.313601e-05,
             3.524404e-01, 3.699813e-07, 1.008080e-07, 3.699813e-07,
             4.277339e-01]).reshape(3, 3)
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOLERANCE_MEDIUM
        assert np.sum(np.abs(pred["cov"] - expected_cov)) < TOLERANCE_MEDIUM

    def test_fit_small_taper_range(self, reg_data):
        params = dict(GD_PARAMS)
        params["init_cov_pars"] = [np.var(reg_data["y"], ddof=1) / 2,
                                   np.var(reg_data["y"], ddof=1) / 2,
                                   reg_data["md"] / 3]
        gp_model = fitGPModel(gp_coords=reg_data["coords"],
                              cov_function="exponential",
                              gp_approx="tapering", cov_fct_taper_shape=0,
                              cov_fct_taper_range=0.5, y=reg_data["y"],
                              X=reg_data["X"], params=params)
        est = np.asarray(gp_model.get_cov_pars())
        # NOTE (verified against the compiled reference library): the
        # reference applies the Wendland taper in CalculateCovMat but NOT in
        # CalculateGradientCovMat (cov_fcts.h:699/799 vs :1113-1260), so its
        # GD uses untapered-kernel gradients and converges to a point that is
        # not a stationary point of the true tapered NLL. Our autodiff
        # gradient is exact; we land near the reference numbers and at an
        # equal-or-better NLL.
        assert np.sum(np.abs(est - [0.02593993, 0.99435221, 0.17712808])) \
            < TOLERANCE_LOOSE
        coef = np.asarray(gp_model.get_coef())
        assert np.sum(np.abs(coef - [2.32410488, 1.89498931])) < 0.05
        assert abs(gp_model.get_num_optim_iter() - 75) <= 2

    def test_fit_matern_taper_small_range_strict(self, reg_data):
        """R:1998-2007 — matern 1.5 + taper_shape 1, range 0.5 (exercises
        GetTaperMu = (1+2)/2 + 1 + 0.5 = 3).

        Oracle-verified facts (compiled reference library):
        - our tapered NLL == the reference's to 1e-10 at the reference's
          reported optimum (121.93726329644426 on both);
        - the reference's GD uses UNTAPERED gradients for tapered kernels
          (taper applied in CalculateCovMat only, cov_fcts.h:699, never in
          CalculateGradientCovMat), so its "optimum" (nll 121.9373) is not a
          stationary point of the tapered NLL; our exact gradients reach
          121.9035. We therefore assert NLL-function parity + match-or-beat
          instead of the R point estimates."""
        params = dict(GD_PARAMS, std_dev=True)
        params["init_cov_pars"] = [np.var(reg_data["y"], ddof=1) / 2,
                                   np.var(reg_data["y"], ddof=1) / 2,
                                   reg_data["md"] / 4.7]
        gp_model = fitGPModel(gp_coords=reg_data["coords"],
                              cov_function="matern", cov_fct_shape=1.5,
                              gp_approx="tapering", cov_fct_taper_shape=1,
                              cov_fct_taper_range=0.5, y=reg_data["y"],
                              X=reg_data["X"], params=params)
        # exact NLL-function parity at the reference's reported optimum
        ref_opt = [0.18970609, 0.80493104, 0.11212289]
        ref_beta = np.array([2.35889350, 1.87422223])
        r = reg_data["y"] - reg_data["X"] @ ref_beta
        nll_at_ref = gp_model.neg_log_likelihood(cov_pars=ref_opt, y=r)
        assert abs(nll_at_ref - 121.93726329644426) < 1e-8
        # our optimum is at least as good as the reference's
        assert gp_model.get_current_neg_log_likelihood() \
            <= nll_at_ref + TOLERANCE_STRICT
        est_se = np.asarray(gp_model.get_cov_pars(std_err=True)).T.ravel()
        expected = [0.18970609, 0.07263436, 0.80493104, 0.20220891,
                    0.11212289, 0.02562848]
        assert np.sum(np.abs(est_se - expected)) < 0.1
        coef_se = np.asarray(gp_model.get_coef(std_err=True)).T.ravel()
        assert np.sum(np.abs(coef_se - [2.35889350, 0.17954660, 1.87422223,
                                        0.09831309])) < 0.1


class TestFSA:
    """test_GPModel_gaussian_process.R:2262-2400: full_scale_tapering."""

    @pytest.fixture(scope="class")
    def no_approx_fit(self, reg_data):
        params = dict(GD_PARAMS)
        params["init_cov_pars"] = [np.var(reg_data["y"], ddof=1) / 2,
                                   np.var(reg_data["y"], ddof=1) / 2,
                                   reg_data["md"] / 3]
        gp_model = fitGPModel(gp_coords=reg_data["coords"],
                              cov_function="exponential", y=reg_data["y"],
                              X=reg_data["X"], params=params)
        pred = gp_model.predict(gp_coords_pred=COORD_TEST, X_pred=X_TEST,
                                predict_var=True, cov_pars=[0.1, 1, 0.1])
        return dict(model=gp_model, params=params, pred=pred)

    def test_large_taper_range_equals_exact(self, reg_data, no_approx_fit):
        gp_model = fitGPModel(gp_coords=reg_data["coords"],
                              cov_function="exponential",
                              gp_approx="full_scale_tapering",
                              num_ind_points=60, cov_fct_taper_shape=2,
                              cov_fct_taper_range=1e6, y=reg_data["y"],
                              X=reg_data["X"],
                              params=no_approx_fit["params"])
        ref = no_approx_fit["model"]
        assert np.sum(np.abs(np.asarray(gp_model.get_cov_pars())
                             - np.asarray(ref.get_cov_pars()))) \
            < TOLERANCE_LOOSE
        assert np.sum(np.abs(np.asarray(gp_model.get_coef())
                             - np.asarray(ref.get_coef()))) < TOLERANCE_LOOSE
        assert abs(gp_model.get_current_neg_log_likelihood()
                   - ref.get_current_neg_log_likelihood()) < TOLERANCE_LOOSE
        assert gp_model.get_num_optim_iter() == ref.get_num_optim_iter()
        pred = gp_model.predict(gp_coords_pred=COORD_TEST, X_pred=X_TEST,
                                predict_var=True, cov_pars=[0.1, 1, 0.1])
        assert np.sum(np.abs(pred["mu"] - no_approx_fit["pred"]["mu"])) \
            < TOLERANCE_LOOSE
        assert np.sum(np.abs(pred["var"] - no_approx_fit["pred"]["var"])) < 0.2

    def test_n_minus_1_ip_small_taper_equals_exact(self, reg_data,
                                                   no_approx_fit):
        gp_model = fitGPModel(gp_coords=reg_data["coords"],
                              cov_function="exponential",
                              gp_approx="full_scale_tapering",
                              num_ind_points=99, cov_fct_taper_shape=2,
                              cov_fct_taper_range=0.4, y=reg_data["y"],
                              X=reg_data["X"],
                              params=no_approx_fit["params"])
        ref = no_approx_fit["model"]
        assert np.sum(np.abs(np.asarray(gp_model.get_cov_pars())
                             - np.asarray(ref.get_cov_pars()))) \
            < TOLERANCE_LOOSE
        assert abs(gp_model.get_current_neg_log_likelihood()
                   - ref.get_current_neg_log_likelihood()) < TOLERANCE_LOOSE
        pred = gp_model.predict(gp_coords_pred=COORD_TEST, X_pred=X_TEST,
                                predict_var=True, cov_pars=[0.1, 1, 0.1])
        assert np.sum(np.abs(pred["mu"] - no_approx_fit["pred"]["mu"])) \
            < TOLERANCE_LOOSE
        assert np.sum(np.abs(pred["var"] - no_approx_fit["pred"]["var"])) \
            < TOLERANCE_LOOSE

    def test_50_ip_taper_05_near_reference(self, reg_data, no_approx_fit):
        """R:2389-2397 golden (0.01503776, 1.00219308, 0.09835141) depends on
        the reference's kmeans++ draw; with our own inducing points the
        estimates must land near them (the approximation error dominates the
        inducing-point choice)."""
        gp_model = fitGPModel(gp_coords=reg_data["coords"],
                              cov_function="exponential",
                              gp_approx="full_scale_tapering",
                              num_ind_points=50, cov_fct_taper_shape=2,
                              cov_fct_taper_range=0.5, y=reg_data["y"],
                              X=reg_data["X"],
                              params=no_approx_fit["params"])
        est = np.asarray(gp_model.get_cov_pars())
        assert np.sum(np.abs(est - [0.01503776, 1.00219308, 0.09835141])) < 0.1
        coef = np.asarray(gp_model.get_coef())
        assert np.sum(np.abs(coef - [2.30508771, 1.89918852])) < 0.05
