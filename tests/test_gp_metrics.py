"""GP-routed validation metrics for boosting: neg_log_likelihood,
approx_neg_marginal_log_likelihood, test_neg_log_likelihood, crps_gaussian.

Reference: random_effects_metric.hpp:25,69; regression_metric.hpp:373
TestNegLogLikelihood; oracle formulas replicated from
test_z_GPBoost_algorithm.R:559-620 (the R suite validates the metric against
predictions exactly this way).
"""

import numpy as np
import pytest
from scipy.stats import norm

import gpboost_tpu as gpb


@pytest.fixture(scope="module")
def boost_data():
    rng = np.random.RandomState(3)
    n = 400
    X = rng.rand(n, 4)
    group = rng.randint(0, 20, n)
    b = rng.randn(20) * 0.7
    f = 2 * np.sin(3 * X[:, 0]) + X[:, 1]
    y = f + b[group] + 0.3 * rng.randn(n)
    tr = np.arange(n) < 300
    return dict(X=X, y=y, group=group, tr=tr)


def _make_valid(d):
    te = ~d["tr"]
    vset = gpb.Dataset(d["X"][te], label=d["y"][te])
    vset.gp_valid_data = {"group_data_pred": d["group"][te]}
    return vset


def _train(d, metric, use_gp=True, gp=True, nrounds=8):
    tr = d["tr"]
    gp_model = gpb.GPModel(group_data=d["group"][tr]) if gp else None
    ds = gpb.Dataset(d["X"][tr], label=d["y"][tr])
    vset = _make_valid(d)
    evals = {}
    bst = gpb.train({"objective": "regression", "learning_rate": 0.1,
                     "num_leaves": 7, "min_data_in_leaf": 5, "verbose": 0,
                     "metric": metric,
                     "use_gp_model_for_validation": use_gp},
                    ds, num_boost_round=nrounds, gp_model=gp_model,
                    valid_sets=[vset], evals_result=evals)
    return bst, gp_model, evals, vset


class TestTestNegLogLikelihood:
    def test_with_gp(self, boost_data):
        d = boost_data
        bst, gp_model, evals, vset = _train(d, "test_neg_log_likelihood")
        te = ~d["tr"]
        pred = bst.predict(d["X"][te], group_data_pred=d["group"][te],
                           predict_var=True)
        nll = 0.5 * np.mean(
            (d["y"][te] - pred["response_mean"]) ** 2 / pred["response_var"]
            + np.log(pred["response_var"] * 2 * np.pi))
        assert abs(evals["valid_0"]["test_neg_log_likelihood"][-1]
                   - nll) < 1e-8

    def test_without_gp_model(self, boost_data):
        d = boost_data
        bst, _, evals, _ = _train(d, "test_neg_log_likelihood", gp=False)
        te = ~d["tr"]
        tr = d["tr"]
        F_tr = bst.predict(d["X"][tr], raw_score=True)
        var_est = np.var(d["y"][tr] - F_tr, ddof=1)
        F_te = bst.predict(d["X"][te], raw_score=True)
        nll = 0.5 * np.mean((d["y"][te] - F_te) ** 2 / var_est
                            + np.log(var_est * 2 * np.pi))
        assert abs(evals["valid_0"]["test_neg_log_likelihood"][-1]
                   - nll) < 1e-8

    def test_use_gp_false(self, boost_data):
        d = boost_data
        bst, gp_model, evals, _ = _train(d, "test_neg_log_likelihood",
                                         use_gp=False)
        te = ~d["tr"]
        tr = d["tr"]
        F_tr = bst.predict(d["X"][tr], raw_score=True, ignore_gp_model=True)
        var_est = np.var(d["y"][tr] - F_tr, ddof=1)
        F_te = bst.predict(d["X"][te], raw_score=True, ignore_gp_model=True)
        nll = 0.5 * np.mean((d["y"][te] - F_te) ** 2 / var_est
                            + np.log(var_est * 2 * np.pi))
        assert abs(evals["valid_0"]["test_neg_log_likelihood"][-1]
                   - nll) < 1e-8


class TestCRPSGaussian:
    def test_with_gp(self, boost_data):
        d = boost_data
        bst, gp_model, evals, _ = _train(d, "crps_gaussian")
        te = ~d["tr"]
        pred = bst.predict(d["X"][te], group_data_pred=d["group"][te],
                           predict_var=True)
        sd = np.sqrt(pred["response_var"])
        r = (d["y"][te] - pred["response_mean"]) / sd
        crps = np.mean(sd * (-1 / np.sqrt(np.pi) + 2 * norm.pdf(r)
                             + r * (2 * norm.cdf(r) - 1)))
        assert abs(evals["valid_0"]["crps_gaussian"][-1] - crps) < 1e-8


class TestGPTrainMetrics:
    def test_neg_log_likelihood_training_metric(self, boost_data):
        d = boost_data
        bst, gp_model, evals, _ = _train(d, "neg_log_likelihood")
        assert abs(evals["valid_0"]["neg_log_likelihood"][-1]
                   - gp_model.get_current_neg_log_likelihood()) < 1e-10
        # the training NLL should decrease over boosting iterations
        hist = evals["valid_0"]["neg_log_likelihood"]
        assert hist[-1] < hist[0]

    def test_laplace_nll_metric(self, boost_data):
        d = boost_data
        tr = d["tr"]
        y01 = (d["y"] > np.median(d["y"])).astype(float)
        gp_model = gpb.GPModel(group_data=d["group"][tr],
                               likelihood="bernoulli_logit")
        ds = gpb.Dataset(d["X"][tr], label=y01[tr])
        vset = gpb.Dataset(d["X"][~tr], label=y01[~tr])
        vset.gp_valid_data = {"group_data_pred": d["group"][~tr]}
        evals = {}
        gpb.train({"objective": "binary", "learning_rate": 0.1,
                   "num_leaves": 7, "min_data_in_leaf": 5, "verbose": 0,
                   "metric": "approx_neg_marginal_log_likelihood"},
                  ds, num_boost_round=5, gp_model=gp_model,
                  valid_sets=[vset], evals_result=evals)
        hist = evals["valid_0"]["approx_neg_marginal_log_likelihood"]
        assert len(hist) == 5
        assert hist[-1] < hist[0]
        assert abs(hist[-1]
                   - gp_model.get_current_neg_log_likelihood()) < 1e-10


class TestNonGaussianTestNLL:
    def test_poisson_gh_quadrature(self, boost_data):
        """GH-quadrature predictive NLL for a Poisson LaGaBoost model matches
        a brute-force numerical integration."""
        d = boost_data
        tr = d["tr"]
        ycnt = np.random.RandomState(5).poisson(
            np.exp(0.3 * d["y"] - 0.5)).astype(float)
        gp_model = gpb.GPModel(group_data=d["group"][tr],
                               likelihood="poisson")
        ds = gpb.Dataset(d["X"][tr], label=ycnt[tr])
        vset = gpb.Dataset(d["X"][~tr], label=ycnt[~tr])
        vset.gp_valid_data = {"group_data_pred": d["group"][~tr]}
        evals = {}
        bst = gpb.train({"objective": "poisson", "learning_rate": 0.1,
                         "num_leaves": 7, "min_data_in_leaf": 5, "verbose": 0,
                         "metric": "test_neg_log_likelihood"},
                        ds, num_boost_round=4, gp_model=gp_model,
                        valid_sets=[vset], evals_result=evals)
        got = evals["valid_0"]["test_neg_log_likelihood"][-1]
        # brute force: log sum over latent grid
        pred = bst.predict(d["X"][~tr], group_data_pred=d["group"][~tr],
                           pred_latent=True, predict_var=True)
        mu = pred["fixed_effect"] + pred["random_effect_mean"]
        v = pred["random_effect_var"]
        from scipy.stats import poisson as pois
        from scipy import integrate
        yv = ycnt[~tr]
        lls = []
        for i in range(len(yv)):
            f = lambda b: pois.pmf(yv[i], np.exp(b)) \
                * norm.pdf(b, mu[i], np.sqrt(v[i]))
            val, _ = integrate.quad(f, mu[i] - 10 * np.sqrt(v[i]),
                                    mu[i] + 10 * np.sqrt(v[i]))
            lls.append(np.log(val))
        expected = -np.mean(lls)
        assert abs(got - expected) < 1e-6
