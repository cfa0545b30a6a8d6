"""Golden-value parity for two-predictor likelihoods: regression zero models
(hurdle_regression_*, zero_inflated_regression_*) and gaussian_heteroscedastic.

Expected numbers from test_GPModel_zero_inflated_hurdle.R:120-225 and
test_GPModel_non_Gaussian_data.R:4134-4190.
"""

import numpy as np
import pytest
from scipy import stats

from gpboost_tpu import GPModel, fitGPModel
from gpboost_tpu.utils.datasim import sim_rand_unif, qnorm

TOL_STRICT = 1e-5
TOL_MED = 1e-3
TOL_LOOSE = 1e-2


def _relerr(a, b):
    a = np.atleast_1d(np.asarray(a, dtype=np.float64))
    b = np.atleast_1d(np.asarray(b, dtype=np.float64))
    return np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-10))


@pytest.fixture(scope="module")
def reg_data():
    n, m = 500, 50
    group = np.repeat(np.arange(1, m + 1), n // m)
    group2 = np.tile(np.arange(1, n // m + 1), m)
    b1 = qnorm(sim_rand_unif(m, 0.15))
    b2 = qnorm(sim_rand_unif(n // m, 0.37))
    u1 = sim_rand_unif(n, 0.271)
    u2 = sim_rand_unif(n, 0.55)
    xc = 2 * sim_rand_unif(n, 0.42) - 1
    Xr = np.column_stack([np.ones(n), xc])
    coords = sim_rand_unif(n * 2, 0.63).reshape(2, n).T
    Dm = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    Sig = np.exp(-Dm / 0.2) + np.eye(n) * 1e-8
    gp_re = np.linalg.cholesky(Sig) @ qnorm(sim_rand_unif(n, 0.9))
    p0r = 1.0 / (1.0 + np.exp(-(-0.3 + 1.2 * xc)))
    return dict(n=n, m=m, group=group, group2=group2, b1=b1, b2=b2, u1=u1,
                u2=u2, xc=xc, Xr=Xr, coords=coords, gp_re=gp_re, p0r=p0r)


class TestHurdleRegressionLognormal:
    """test_GPModel_zero_inflated_hurdle.R:120-138."""

    def test_eval_estimation_prediction(self, reg_data):
        n, m = reg_data["n"], reg_data["m"]
        eta_r = 0.5 + 0.7 * reg_data["b1"][reg_data["group"] - 1] \
            + 0.6 * reg_data["xc"]
        y = np.where(reg_data["u1"] < reg_data["p0r"], 0.0,
                     np.exp(stats.norm.ppf(reg_data["u2"],
                                           np.log(np.exp(eta_r)) - 0.25,
                                           np.sqrt(0.5))))
        gpm = GPModel(group_data=reg_data["group"],
                      likelihood="hurdle_regression_lognormal")
        nll = gpm.neg_log_likelihood(cov_pars=[0.5], y=y,
                                     fixed_effects=np.zeros(2 * n),
                                     aux_pars=[0.5])
        assert _relerr(nll, 724.385) < TOL_STRICT
        gp = fitGPModel(group_data=reg_data["group"],
                        likelihood="hurdle_regression_lognormal",
                        y=y, X=reg_data["Xr"], params=dict(maxit=100))
        coef = np.asarray(gp.get_coef())
        assert len(coef) == 4
        est = np.concatenate([gp.get_cov_pars(), coef, gp.get_aux_pars(),
                              [gp.get_current_neg_log_likelihood()]])
        golden = [0.305373, 0.352269, 0.734696, -0.33679, 1.22878,
                  0.451265, 648.497]
        assert _relerr(est, golden) < TOL_MED
        pd = gp.predict(group_data_pred=np.array([1, m + 1]),
                        X_pred=np.array([[1, 0.4], [1, -0.4]]),
                        predict_var=True, predict_response=True)
        assert _relerr(pd["mu"], [0.518035, 0.85956]) < TOL_MED
        assert _relerr(pd["var"], [0.710859, 1.52345]) < TOL_MED


class TestZICountRegression:
    """test_GPModel_zero_inflated_hurdle.R:140-175 (CREG block)."""

    CREG = {
        "zero_inflated_regression_poisson": dict(
            eval=454.8418, est=[0.1851334, -0.3526239, 0.6497278,
                                -0.5526028, 1.452601, 443.291]),
        "zero_inflated_regression_negative_binomial": dict(
            eval=430.0845, est=[0.1524396, -0.7631289, 0.3785567, -3.035804,
                                3.555543, 0.6356567, 422.1173]),
        "zero_inflated_regression_negative_binomial_1": dict(
            eval=431.3405, est=[0.1296883, -0.6813157, 0.528945, -2.079165,
                                2.584585, 0.8593076, 423.4761]),
    }

    def _sim(self, fam, reg_data):
        eta_r = -0.2 + 0.7 * reg_data["b1"][reg_data["group"] - 1] \
            + 0.6 * reg_data["xc"]
        mu_r = np.exp(eta_r)
        u1, u2, p0r = reg_data["u1"], reg_data["u2"], reg_data["p0r"]
        if fam == "zero_inflated_regression_poisson":
            pos = stats.poisson.ppf(u2, mu_r)
        elif fam == "zero_inflated_regression_negative_binomial":
            pos = stats.nbinom.ppf(u2, 2, 2.0 / (2.0 + mu_r))
        else:
            r = mu_r / 0.6
            pos = stats.nbinom.ppf(u2, r, 1.0 / 1.6)
        return np.where(u1 < p0r, 0.0, pos)

    @pytest.mark.parametrize("fam", list(CREG))
    def test_eval(self, reg_data, fam):
        y = self._sim(fam, reg_data)
        aux = {"zero_inflated_regression_poisson": None,
               "zero_inflated_regression_negative_binomial": [2],
               "zero_inflated_regression_negative_binomial_1": [0.6]}[fam]
        gpm = GPModel(group_data=reg_data["group"], likelihood=fam)
        nll = gpm.neg_log_likelihood(cov_pars=[0.5], y=y,
                                     fixed_effects=np.zeros(2 * reg_data["n"]),
                                     aux_pars=aux)
        assert _relerr(nll, self.CREG[fam]["eval"]) < TOL_STRICT

    def test_estimation_prediction_poisson(self, reg_data):
        fam = "zero_inflated_regression_poisson"
        y = self._sim(fam, reg_data)
        gp = fitGPModel(group_data=reg_data["group"], likelihood=fam,
                        y=y, X=reg_data["Xr"], params=dict(maxit=100))
        est = np.concatenate([gp.get_cov_pars(), gp.get_coef(),
                              [gp.get_current_neg_log_likelihood()]])
        golden = self.CREG[fam]["est"]
        assert _relerr(est[-1], golden[-1]) < TOL_MED
        assert np.max(np.abs(est[:-1] - golden[:-1])) < 0.02
        pd = gp.predict(group_data_pred=np.array([1, reg_data["m"] + 1]),
                        X_pred=np.array([[1, 0.4], [1, -0.4]]),
                        predict_var=True, predict_response=True)
        assert _relerr(pd["mu"], [0.3792956, 0.4497843]) < TOL_LOOSE
        assert _relerr(pd["var"], [0.565987, 0.5692858]) < TOL_LOOSE

    def test_crossed_re_coupled(self, reg_data):
        """Crossed grouped REs exercise the coupled zeta gradient
        (test_GPModel_zero_inflated_hurdle.R:177-190)."""
        muc = np.exp(-0.2 + 0.7 * reg_data["b1"][reg_data["group"] - 1]
                     + 0.5 * reg_data["b2"][reg_data["group2"] - 1]
                     + 0.6 * reg_data["xc"])
        yc = np.where(reg_data["u1"] < reg_data["p0r"], 0.0,
                      stats.poisson.ppf(reg_data["u2"], muc))
        gc = fitGPModel(
            group_data=np.column_stack([reg_data["group"],
                                        reg_data["group2"]]),
            likelihood="zero_inflated_regression_poisson", y=yc,
            X=reg_data["Xr"], params=dict(maxit=100))
        est = np.concatenate([gc.get_cov_pars(), gc.get_coef(),
                              [gc.get_current_neg_log_likelihood()]])
        golden = [0.1362728, 0.1014989, -0.4518659, 0.4179769, -0.426195,
                  0.8633492, 424.9478]
        assert _relerr(est[-1], golden[-1]) < TOL_MED
        assert np.max(np.abs(est[:-1] - golden[:-1])) < 0.06

    def test_vecchia_coupled(self, reg_data):
        """Vecchia GP + regression zero model
        (test_GPModel_zero_inflated_hurdle.R:191-203)."""
        muv = np.exp(-0.2 + reg_data["gp_re"] + 0.6 * reg_data["xc"])
        yv = np.where(reg_data["u1"] < reg_data["p0r"], 0.0,
                      stats.poisson.ppf(reg_data["u2"], muv))
        gpv = fitGPModel(
            gp_coords=reg_data["coords"], cov_function="exponential",
            gp_approx="vecchia", num_neighbors=15, vecchia_ordering="none",
            likelihood="zero_inflated_regression_poisson", y=yv,
            X=reg_data["Xr"], params=dict(maxit=100))
        est = np.concatenate([gpv.get_cov_pars(), gpv.get_coef(),
                              [gpv.get_current_neg_log_likelihood()]])
        golden = [0.549663, 0.150791, 0.031629, 0.74816, -0.277397,
                  1.42993, 580.322]
        assert _relerr(est[-1], golden[-1]) < TOL_MED
        assert np.max(np.abs(est[:-1] - golden[:-1])) < 0.05


class TestGaussianHeteroscedastic:
    """test_GPModel_non_Gaussian_data.R:4134-4190."""

    @pytest.fixture(scope="class")
    def het(self):
        n = 100
        group = np.repeat(np.arange(1, 11), 10)
        X = np.column_stack([np.ones(n), sim_rand_unif(n, 0.256)])
        b = qnorm(sim_rand_unif(10, 0.741))
        mean_true = X @ [0.3, 0.7] + b[group - 1]
        log_var_true = X @ [-0.5, 1.2]
        y = mean_true + qnorm(sim_rand_unif(n, 0.369)) \
            * np.exp(0.5 * log_var_true)
        return dict(n=n, group=group, X=X, y=y)

    def test_eval(self, het):
        F = np.concatenate([het["X"] @ [0.2, 0.5], het["X"] @ [-0.3, 0.8]])
        gpm = GPModel(group_data=het["group"],
                      likelihood="gaussian_heteroscedastic")
        nll = gpm.neg_log_likelihood(cov_pars=[0.3], y=het["y"],
                                     fixed_effects=F)
        assert abs(nll - 157.80743264) < TOL_MED

    def test_boosting_two_trees_per_iteration(self, het):
        """LaGaBoost with num_sets_fixed_effects = 2 (c_api.cpp:132): two
        trees per iteration (mean + log-variance); the boosted objective
        must beat the linear fit's (trees nest richer mean/variance
        shapes)."""
        from gpboost_tpu import GPModel, Dataset, train
        gplin = fitGPModel(group_data=het["group"],
                           likelihood="gaussian_heteroscedastic",
                           y=het["y"], X=het["X"],
                           params=dict(optimizer_cov="lbfgs",
                                       optimizer_coef="lbfgs", maxit=1000))
        nll_lin = gplin.get_current_neg_log_likelihood()
        gp = GPModel(group_data=het["group"],
                     likelihood="gaussian_heteroscedastic")
        ds = Dataset(het["X"][:, 1:2], label=het["y"])
        bst = train({"learning_rate": 0.05, "max_depth": 2,
                     "min_data_in_leaf": 5, "verbose": 0}, ds,
                    num_boost_round=100, gp_model=gp)
        assert len(bst.trees) == 200       # two trees per iteration
        nll_boost = gp.neg_log_likelihood(
            cov_pars=gp._fit_result.cov_pars, y=het["y"],
            fixed_effects=bst.F)
        assert np.isfinite(nll_boost) and nll_boost < nll_lin
        pred = bst.predict(het["X"][:3, 1:2],
                           group_data_pred=np.array([1, 3, 11]),
                           predict_var=True)
        assert np.all(np.isfinite(pred["response_mean"]))
        assert np.all(pred["response_var"] > 0)

    def test_estimation_prediction(self, het):
        gp = fitGPModel(group_data=het["group"],
                        likelihood="gaussian_heteroscedastic",
                        y=het["y"], X=het["X"],
                        params=dict(optimizer_cov="lbfgs",
                                    optimizer_coef="lbfgs", maxit=1000))
        coef = np.asarray(gp.get_coef())
        assert len(coef) == 4
        assert np.sum(np.abs(coef - [-0.16843105, 1.05258998, -0.64123490,
                                     1.54924057])) < TOL_MED * 10
        assert abs(gp.get_cov_pars()[0] - 0.24994751) < TOL_MED * 5
        assert abs(gp.get_current_neg_log_likelihood() - 155.27522914) \
            < TOL_MED * 5
        pd = gp.predict(group_data_pred=np.array([1, 3, 11]),
                        X_pred=np.column_stack([np.ones(3), [0.1, 0.4, 0.8]]),
                        predict_var=True, predict_response=True)
        assert np.sum(np.abs(pd["mu"] - [0.35476713, 0.16102877,
                                         0.67364093])) < TOL_MED * 10
        assert np.sum(np.abs(pd["var"] - [0.69153035, 1.04948914,
                                          2.06871225])) < TOL_MED * 10
