"""full_scale_vecchia (VIF) golden parity.

Reference: test_GPModel_gaussian_process.R:2501-2640 ("VIF or Full scale
Vecchia"); Vecchia_utils.cpp:1476, FSVA paths in re_model_template.h.
"""

import numpy as np
import pytest

from gpboost_tpu import GPModel, fitGPModel

from conftest import TOLERANCE_STRICT, TOLERANCE_LOOSE

BFGS = dict(optimizer_cov="lbfgs", optimizer_coef="lbfgs", maxit=1000)
COORD_TEST = np.column_stack([[0.1, 0.2, 0.7], [0.9, 0.4, 0.55]])
X_TEST = np.column_stack([np.ones(3), [-0.5, 0.2, 0.4]])


@pytest.fixture(scope="module")
def reg_data(gp_sim_data):
    y = gp_sim_data["eps"] + gp_sim_data["X"] @ np.array([2.0, 2.0]) \
        + gp_sim_data["xi"]
    return dict(y=y, X=gp_sim_data["X"], coords=gp_sim_data["coords"])


@pytest.fixture(scope="module")
def no_approx(reg_data):
    m = fitGPModel(gp_coords=reg_data["coords"], cov_function="exponential",
                   y=reg_data["y"], X=reg_data["X"], params=dict(BFGS))
    pred = m.predict(gp_coords_pred=COORD_TEST, X_pred=X_TEST,
                     predict_var=True, cov_pars=[0.1, 1, 0.1])
    return dict(model=m, pred=pred)


@pytest.mark.parametrize("gp_approx", ["full_scale_vecchia",
                                       "full_scale_vecchia_correlation_based"])
class TestVIF:
    def test_many_neighbors_equals_exact(self, reg_data, no_approx,
                                         gp_approx):
        m = fitGPModel(gp_coords=reg_data["coords"],
                       cov_function="exponential", gp_approx=gp_approx,
                       num_ind_points=60, num_neighbors=50,
                       y=reg_data["y"], X=reg_data["X"], params=dict(BFGS))
        ref = no_approx["model"]
        assert np.sum(np.abs(np.asarray(m.get_cov_pars())
                             - np.asarray(ref.get_cov_pars()))) \
            < TOLERANCE_LOOSE
        assert np.sum(np.abs(np.asarray(m.get_coef())
                             - np.asarray(ref.get_coef()))) < TOLERANCE_LOOSE
        assert abs(m.get_current_neg_log_likelihood()
                   - ref.get_current_neg_log_likelihood()) < TOLERANCE_LOOSE
        pred = m.predict(gp_coords_pred=COORD_TEST, X_pred=X_TEST,
                         predict_var=True, cov_pars=[0.1, 1, 0.1])
        assert np.sum(np.abs(pred["mu"] - no_approx["pred"]["mu"])) < 0.1
        assert np.sum(np.abs(pred["var"] - no_approx["pred"]["var"])) < 0.2

    def test_n_minus_1_ip_few_neighbors(self, reg_data, no_approx, gp_approx):
        m = fitGPModel(gp_coords=reg_data["coords"],
                       cov_function="exponential", gp_approx=gp_approx,
                       num_ind_points=99, num_neighbors=5,
                       y=reg_data["y"], X=reg_data["X"], params=dict(BFGS))
        ref = no_approx["model"]
        assert np.sum(np.abs(np.asarray(m.get_cov_pars())
                             - np.asarray(ref.get_cov_pars()))) \
            < TOLERANCE_LOOSE
        assert abs(m.get_current_neg_log_likelihood()
                   - ref.get_current_neg_log_likelihood()) < TOLERANCE_LOOSE
        pred = m.predict(gp_coords_pred=COORD_TEST, X_pred=X_TEST,
                         predict_var=True, cov_pars=[0.1, 1, 0.1])
        assert np.sum(np.abs(pred["mu"] - no_approx["pred"]["mu"])) \
            < TOLERANCE_LOOSE
        assert np.sum(np.abs(pred["var"] - no_approx["pred"]["var"])) \
            < TOLERANCE_LOOSE

    def test_50ip_15nn_near_reference_goldens(self, reg_data, gp_approx):
        """R:2580-2597 goldens (0.009170, 1.002068, 0.095037) depend on the
        reference's kmeans++ draw; with our own inducing points the estimates
        land near them."""
        m = fitGPModel(gp_coords=reg_data["coords"],
                       cov_function="exponential", gp_approx=gp_approx,
                       num_ind_points=50, num_neighbors=15,
                       y=reg_data["y"], X=reg_data["X"], params=dict(BFGS))
        est = np.asarray(m.get_cov_pars())
        assert np.sum(np.abs(est - [0.009170148, 1.002068032, 0.095036760])) \
            < 0.1
        coef = np.asarray(m.get_coef())
        assert np.sum(np.abs(coef - [2.305036, 1.899353])) < 0.05


class TestVIFFixedPars:
    def test_estimate_cov_par_index(self, reg_data):
        """R:2612-2636: freezing parameters keeps them at init values."""
        init = [np.var(reg_data["y"], ddof=1) / 2,
                np.var(reg_data["y"], ddof=1) / 2, 0.17864807736]
        m = fitGPModel(gp_coords=reg_data["coords"],
                       cov_function="exponential",
                       gp_approx="full_scale_vecchia", num_ind_points=50,
                       num_neighbors=10, y=reg_data["y"], X=reg_data["X"],
                       params=dict(BFGS, init_cov_pars=init,
                                   estimate_cov_par_index=[1, 0, 0]))
        est = np.asarray(m.get_cov_pars())
        assert np.sum(np.abs(est[1:] - init[1:])) < TOLERANCE_STRICT
        m2 = fitGPModel(gp_coords=reg_data["coords"],
                        cov_function="exponential",
                        gp_approx="full_scale_vecchia", num_ind_points=50,
                        num_neighbors=10, y=reg_data["y"], X=reg_data["X"],
                        params=dict(BFGS, init_cov_pars=init,
                                    estimate_cov_par_index=[0, 1, 0]))
        est2 = np.asarray(m2.get_cov_pars())
        assert abs(est2[0] - init[0]) < TOLERANCE_STRICT
        assert abs(est2[2] - init[2]) < TOLERANCE_STRICT


class TestIterationCounters:
    """Introspection API (re_model.h:145-157 GetNumCGSteps /
    GetNumModeFindingSteps)."""

    def test_mode_and_cg_counters(self, reg_data):
        import gpboost_tpu as gpb
        rng = np.random.RandomState(0)
        ycnt = rng.poisson(np.exp(reg_data["y"] * 0.2)).astype(float)
        m = GPModel(gp_coords=reg_data["coords"],
                    cov_function="exponential", likelihood="poisson",
                    gp_approx="vecchia", num_neighbors=30,
                    vecchia_ordering="none",
                    matrix_inversion_method="iterative")
        m.neg_log_likelihood(cov_pars=[1.0, 0.2], y=ycnt)
        assert m.get_num_mode_finding_steps() > 0
        assert m.get_num_cg_steps() > 0
        md = GPModel(gp_coords=reg_data["coords"],
                     cov_function="exponential", likelihood="poisson")
        md.neg_log_likelihood(cov_pars=[1.0, 0.2], y=ycnt)
        assert md.get_num_mode_finding_steps() > 0
        with pytest.raises(ValueError):
            md.get_num_cg_steps()
