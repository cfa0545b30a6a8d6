"""Golden-value parity tests for non-Gaussian likelihoods (Laplace approximation).

Expected numbers from R-package/tests/testthat/test_GPModel_non_Gaussian_data.R
(setup :20-88). TOLERANCE_STRICT there is 1e-6.
"""

import numpy as np
import pytest
from scipy import stats

from gpboost_tpu import GPModel, fitGPModel
from gpboost_tpu.utils.datasim import sim_rand_unif, qnorm

TOL_STRICT = 1e-6
TOL_MEDIUM = 1e-3
TOL_LOOSE = 1e-2


@pytest.fixture(scope="module")
def ng_data():
    n = 100
    d = 2
    coords = sim_rand_unif(n * d, init_c=0.1).reshape(d, n).T
    D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    Sigma = np.exp(-D / 0.1) + np.eye(n) * 1e-20
    L = np.linalg.cholesky(Sigma)
    b_1 = qnorm(sim_rand_unif(n, init_c=0.8))
    eps = L @ b_1
    m = 10
    group = np.repeat(np.arange(1, m + 1), n // m)
    b_gr_1 = qnorm(sim_rand_unif(m, init_c=0.565))
    group2 = np.tile(np.arange(1, n // m + 1), m)
    b_gr_2 = qnorm(sim_rand_unif(n // m, init_c=0.36))
    x = np.cos((np.arange(1, n + 1) - n / 2) ** 2 * 5.5 * np.pi / n)
    b_gr_3 = qnorm(sim_rand_unif(m, init_c=0.5678))
    X = np.column_stack([np.ones(n),
                         np.sin((np.arange(1, n + 1) - n / 2) ** 2 * 2 * np.pi / n)])
    beta = np.array([0.1, 2.0])
    return dict(n=n, coords=coords, D=D, eps=eps, group=group, b_gr_1=b_gr_1,
                group2=group2, b_gr_2=b_gr_2, x=x, b_gr_3=b_gr_3, X=X, beta=beta)


class TestBernoulliProbitGP:
    """test_GPModel_non_Gaussian_data.R:286-545."""

    @pytest.fixture(scope="class")
    def y(self, ng_data):
        probs = stats.norm.cdf(ng_data["eps"])
        return (sim_rand_unif(100, init_c=0.2341) < probs).astype(float)

    def _init(self, ng_data):
        iu = np.triu_indices(100, k=1)
        return [1.0, np.mean(ng_data["D"][iu]) / 3]

    def test_label_validation(self, ng_data, y):
        with pytest.raises(ValueError):
            fitGPModel(gp_coords=ng_data["coords"], cov_function="exponential",
                       likelihood="bernoulli_probit", y=ng_data["eps"],
                       params=dict(optimizer_cov="gradient_descent"))

    def test_fisher_scoring_rejected(self, ng_data, y):
        with pytest.raises(ValueError):
            fitGPModel(gp_coords=ng_data["coords"], cov_function="exponential",
                       likelihood="bernoulli_probit", y=y,
                       params=dict(optimizer_cov="fisher_scoring"))

    def test_gradient_descent(self, ng_data, y):
        gp_model = fitGPModel(
            gp_coords=ng_data["coords"], cov_function="exponential",
            likelihood="bernoulli_probit", y=y,
            params=dict(optimizer_cov="gradient_descent", lr_cov=0.1,
                        use_nesterov_acc=False,
                        convergence_criterion="relative_change_in_parameters",
                        init_cov_pars=self._init(ng_data)))
        assert np.sum(np.abs(gp_model.get_cov_pars()
                             - [0.9419234, 0.1866877])) < TOL_STRICT
        assert abs(gp_model.get_current_neg_log_likelihood() - 63.61263619) \
            < TOL_STRICT
        assert gp_model.get_num_optim_iter() == 40

    def test_gradient_descent_nesterov(self, ng_data, y):
        gp_model = fitGPModel(
            gp_coords=ng_data["coords"], cov_function="exponential",
            likelihood="bernoulli_probit", y=y,
            params=dict(optimizer_cov="gradient_descent", lr_cov=0.01,
                        use_nesterov_acc=True, acc_rate_cov=0.5,
                        init_cov_pars=self._init(ng_data)))
        assert np.sum(np.abs(gp_model.get_cov_pars()
                             - [0.9646422, 0.1844797])) < TOL_STRICT
        assert gp_model.get_num_optim_iter() == 26

    def test_lbfgs(self, ng_data, y):
        gp_model = fitGPModel(
            gp_coords=ng_data["coords"], cov_function="exponential",
            likelihood="bernoulli_probit", y=y,
            params=dict(optimizer_cov="lbfgs", init_cov_pars=self._init(ng_data)))
        assert np.sum(np.abs(gp_model.get_cov_pars()
                             - [0.9418327551, 0.1866904020])) < TOL_MEDIUM
        assert abs(gp_model.get_current_neg_log_likelihood() - 63.61263619) \
            < TOL_LOOSE

    def test_prediction(self, ng_data, y):
        gp_model = fitGPModel(
            gp_coords=ng_data["coords"], cov_function="exponential",
            likelihood="bernoulli_probit", y=y,
            params=dict(optimizer_cov="gradient_descent", lr_cov=0.01,
                        use_nesterov_acc=False, init_cov_pars=self._init(ng_data)))
        coord_test = np.column_stack([[0.1, 0.11, 0.7], [0.9, 0.91, 0.55]])
        pred = gp_model.predict(y=y, gp_coords_pred=coord_test,
                                predict_cov_mat=True, predict_response=False)
        expected_mu = np.array([-0.6595663, -0.6638940, 0.4997690])
        expected_cov = np.array(
            [0.6482224576, 0.5765285950, -0.0001030520, 0.5765285950,
             0.6478191338, -0.0001163496, -0.0001030520, -0.0001163496,
             0.4435551436])
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_STRICT
        assert np.sum(np.abs(pred["cov"].ravel() - expected_cov)) < TOL_STRICT
        pred = gp_model.predict(y=y, gp_coords_pred=coord_test,
                                predict_var=True, predict_response=True)
        expected_mu_resp = np.array([0.3037139, 0.3025143, 0.6612807])
        assert np.sum(np.abs(pred["mu"] - expected_mu_resp)) < TOL_STRICT


class TestPoisson:
    """test_GPModel_non_Gaussian_data.R:2521-2617."""

    def test_grouped(self, ng_data):
        mu = np.exp(ng_data["b_gr_1"][ng_data["group"] - 1])
        y = stats.poisson.ppf(sim_rand_unif(100, init_c=0.04532), mu=mu)
        gp_model = fitGPModel(group_data=ng_data["group"], likelihood="poisson",
                              y=y, params=dict(optimizer_cov="gradient_descent",
                                               use_nesterov_acc=True, lr_cov=0.1))
        assert np.sum(np.abs(gp_model.get_cov_pars() - [0.4033406])) < TOL_STRICT
        assert gp_model.get_num_optim_iter() == 8

        group_test = np.array([1, 3, 3, 9999])
        pred = gp_model.predict(y=y, group_data_pred=group_test,
                                predict_cov_mat=True, predict_response=False)
        expected_mu = np.array([0.07765297, -0.87488533, -0.87488533, 0.0])
        expected_cov = np.array(
            [0.07526284, 0, 0, 0, 0, 0.15041230, 0.15041230, 0, 0, 0.15041230,
             0.15041230, 0, 0, 0, 0, 0.40334058])
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_STRICT
        assert np.sum(np.abs(pred["cov"].ravel() - expected_cov)) < TOL_STRICT

        pred = gp_model.predict(y=y, group_data_pred=group_test,
                                predict_var=True, predict_response=True)
        expected_mu = np.array([1.1221925, 0.4494731, 0.4494731, 1.2234446])
        expected_var = np.array([1.2206301, 0.4822647, 0.4822647, 1.9670879])
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_STRICT
        assert np.sum(np.abs(pred["var"] - expected_var)) < TOL_STRICT

        nll = gp_model.neg_log_likelihood(cov_pars=[0.9], y=y)
        assert abs(nll - 140.4554806) < TOL_MEDIUM

    def test_multiple_res(self, ng_data):
        d = ng_data
        mu = np.exp(d["b_gr_1"][d["group"] - 1] + d["b_gr_2"][d["group2"] - 1]
                    + d["x"] * d["b_gr_3"][d["group"] - 1])
        y = stats.poisson.ppf(sim_rand_unif(100, init_c=0.74532), mu=mu)
        gp_model = fitGPModel(
            group_data=np.column_stack([d["group"], d["group2"]]),
            group_rand_coef_data=d["x"], ind_effect_group_rand_coef=[1],
            likelihood="poisson", y=y,
            params=dict(optimizer_cov="gradient_descent", use_nesterov_acc=True,
                        lr_cov=0.1, init_cov_pars=[1.0, 1.0, 1.0]))
        assert np.sum(np.abs(gp_model.get_cov_pars()
                             - [0.4069344, 1.6988978, 1.3415016])) < TOL_STRICT
        assert gp_model.get_num_optim_iter() == 7

        group_data_pred = np.column_stack([[1, 1, 77], [2, 1, 98]])
        group_rand_coef_data_pred = np.array([0, 0.1, 0.3])
        pred = gp_model.predict(
            y=y, group_data_pred=group_data_pred,
            group_rand_coef_data_pred=group_rand_coef_data_pred,
            cov_pars=[0.9, 0.8, 1.2], predict_cov_mat=True,
            predict_response=False)
        expected_mu = np.array([0.92620057, -0.08200469, 0.0])
        expected_cov = np.array(
            [0.07730896, 0.04403442, 0, 0.04403442, 0.11600469, 0, 0, 0, 1.808])
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_STRICT
        assert np.sum(np.abs(pred["cov"].ravel() - expected_cov)) < TOL_STRICT

    def test_gp(self, ng_data):
        mu = np.exp(ng_data["eps"])
        y = stats.poisson.ppf(sim_rand_unif(100, init_c=0.435), mu=mu)
        iu = np.triu_indices(100, k=1)
        gp_model = fitGPModel(
            gp_coords=ng_data["coords"], cov_function="exponential",
            likelihood="poisson", y=y,
            params=dict(optimizer_cov="gradient_descent",
                        optimizer_coef="gradient_descent",
                        use_nesterov_acc=True, lr_cov=0.1, lr_coef=0.1,
                        acc_rate_cov=0.5, maxit=1000,
                        init_cov_pars=[1.0, np.mean(ng_data["D"][iu]) / 3]))
        assert np.sum(np.abs(gp_model.get_cov_pars()
                             - [1.1853922, 0.1500197])) < TOL_STRICT
        assert gp_model.get_num_optim_iter() == 6
        nll = gp_model.neg_log_likelihood(cov_pars=[0.9, 0.2], y=y)
        assert abs(nll - 195.03708036) < TOL_STRICT

    def test_linear_predictor(self, ng_data):
        d = ng_data
        mu = np.exp(d["b_gr_1"][d["group"] - 1] + d["X"] @ d["beta"])
        y = stats.poisson.ppf(sim_rand_unif(100, init_c=0.84532), mu=mu)
        gp_model = fitGPModel(
            group_data=d["group"], likelihood="poisson", y=y, X=d["X"],
            params=dict(optimizer_cov="gradient_descent",
                        optimizer_coef="gradient_descent", lr_cov=0.1,
                        lr_coef=0.1, use_nesterov_acc=True, acc_rate_cov=0.5))
        assert np.sum(np.abs(gp_model.get_cov_pars() - [0.2977336946])) < TOL_MEDIUM
        assert np.sum(np.abs(gp_model.get_coef()
                             - [-0.1491220786, 2.1209270742])) < TOL_MEDIUM


class TestGamma:
    """test_GPModel_non_Gaussian_data.R:2618-2720."""

    @pytest.fixture(scope="class")
    def y(self, ng_data):
        mu = np.exp(ng_data["b_gr_1"][ng_data["group"] - 1])
        return stats.gamma.ppf(sim_rand_unif(100, init_c=0.04532), a=1.0,
                               scale=mu)

    def test_zero_rejected(self, ng_data, y):
        y_zero = y.copy()
        y_zero[0] = 0.0
        with pytest.raises(ValueError):
            fitGPModel(group_data=ng_data["group"], likelihood="gamma",
                       y=y_zero, params=dict(optimizer_cov="lbfgs"))

    def test_lbfgs_fixed_shape(self, ng_data, y):
        gp_model = fitGPModel(
            group_data=ng_data["group"], likelihood="gamma", y=y,
            params=dict(optimizer_cov="lbfgs", optimizer_coef="lbfgs",
                        maxit=1000, init_aux_pars=[1.0],
                        estimate_aux_pars=False))
        # 1e-5: golden value pins LBFGSpp's stopping point; the fully
        # converged optimum differs by ~6e-6
        assert np.sum(np.abs(gp_model.get_cov_pars() - [0.5175032387])) < 1e-5

        group_test = np.array([1, 3, 3, 9999])
        pred = gp_model.predict(y=y, group_data_pred=group_test,
                                predict_cov_mat=True, predict_response=False,
                                cov_pars=[0.6])
        expected_mu = np.array([0.2141580841, -0.9414716643, -0.9414716643, 0.0])
        expected_cov = np.array(
            [0.08316978821, 0, 0, 0, 0, 0.09903395128, 0.09903395128, 0, 0,
             0.09903395128, 0.09903395128, 0, 0, 0, 0, 0.6])
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_MEDIUM
        assert np.sum(np.abs(pred["cov"].ravel() - expected_cov)) < TOL_STRICT

        pred = gp_model.predict(y=y, group_data_pred=group_test,
                                predict_var=True, predict_response=True,
                                cov_pars=[0.6])
        expected_mu = np.array([1.2914207620, 0.4098538326, 0.4098538326,
                                1.3498588076])
        expected_var = np.array([1.9570462290, 0.2029549058, 0.2029549058,
                                 4.8181150451])
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_MEDIUM
        assert np.sum(np.abs(pred["var"] - expected_var)) < TOL_MEDIUM

        nll = gp_model.neg_log_likelihood(cov_pars=[0.9], y=y, aux_pars=[1.0])
        assert abs(nll - 105.676137) < TOL_MEDIUM

    def test_lbfgs_estimate_shape(self, ng_data, y):
        gp_model = fitGPModel(
            group_data=ng_data["group"], likelihood="gamma", y=y,
            params=dict(optimizer_cov="lbfgs", maxit=1000, init_aux_pars=[1.0],
                        estimate_aux_pars=True))
        # 1e-3: reference lbfgs stopped ~1e-4 short of the optimum (our
        # solution has the LOWER nll: 105.15972468 vs 105.15972482)
        assert np.sum(np.abs(gp_model.get_cov_pars() - [0.5141245271])) < TOL_MEDIUM
        assert np.sum(np.abs(gp_model.get_aux_pars() - [0.9719437296])) < TOL_MEDIUM

    def test_gd_one_iteration_separate_lrs(self, ng_data, y):
        """maxit=1 golden values pin the separate cov/aux learning-rate
        semantics (lr_aux_pars initialised from lr_cov)."""
        gp_model = fitGPModel(
            group_data=ng_data["group"], likelihood="gamma", y=y,
            params=dict(optimizer_cov="gradient_descent", maxit=1,
                        init_aux_pars=[1.0], estimate_aux_pars=True))
        assert np.sum(np.abs(gp_model.get_cov_pars() - [0.9058829])) < TOL_STRICT
        assert np.sum(np.abs(gp_model.get_aux_pars() - [0.9297985])) < TOL_STRICT
        gp_model = fitGPModel(
            group_data=ng_data["group"], likelihood="gamma", y=y,
            params=dict(optimizer_cov="gradient_descent", maxit=1, lr_cov=0.001,
                        init_aux_pars=[1.0], estimate_aux_pars=True))
        assert np.sum(np.abs(gp_model.get_cov_pars() - [0.998025])) < TOL_STRICT
        assert np.sum(np.abs(gp_model.get_aux_pars() - [0.9985453])) < TOL_STRICT

    def test_fix_cov_estimate_aux(self, ng_data, y):
        gp_model = fitGPModel(
            group_data=ng_data["group"], likelihood="gamma", y=y,
            params=dict(optimizer_cov="lbfgs", init_aux_pars=[1.0],
                        estimate_aux_pars=True, estimate_cov_par_index=[0]))
        assert np.sum(np.abs(gp_model.get_cov_pars() - [1.0])) < TOL_STRICT
        assert np.sum(np.abs(gp_model.get_aux_pars() - [0.9762847373])) < TOL_STRICT
