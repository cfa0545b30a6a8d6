"""Boosting engine tests: tree learner, GBDT loop, GPBoost combination.

Functional tests (the reference's boosting golden values pin LightGBM's exact
binning/tie-breaking, which this rebuild does not replicate bit-for-bit;
GPBoost-algorithm parity is asserted at the behavioral level instead).
"""

import numpy as np
import pytest

import gpboost_tpu as gpb


@pytest.fixture(scope="module")
def reg_data():
    rng = np.random.RandomState(1)
    n, p = 800, 8
    X = rng.rand(n, p)
    f_true = 3 * X[:, 0] + np.sin(8 * X[:, 1]) + (X[:, 2] > 0.5)
    y = f_true + 0.3 * rng.randn(n)
    return X, y, f_true


class TestTreeLearner:
    def test_single_tree_reduces_loss(self, reg_data):
        X, y, _ = reg_data
        ds = gpb.Dataset(X, label=y)
        bst = gpb.Booster(params={"num_leaves": 15, "learning_rate": 1.0},
                          train_set=ds)
        mse0 = np.mean((bst.F - y) ** 2)
        bst.update()
        mse1 = np.mean((bst.F - y) ** 2)
        assert mse1 < 0.7 * mse0

    def test_min_data_in_leaf(self, reg_data):
        X, y, _ = reg_data
        ds = gpb.Dataset(X, label=y)
        bst = gpb.Booster(params={"num_leaves": 31, "min_data_in_leaf": 100},
                          train_set=ds)
        bst.update()
        tree = bst.trees[0]
        slots, counts = np.unique(
            bst.learner.train(bst.F - y, np.ones(len(y)))[1],
            return_counts=True)
        assert counts.min() >= 100

    def test_max_depth(self, reg_data):
        X, y, _ = reg_data
        ds = gpb.Dataset(X, label=y)
        bst = gpb.Booster(params={"num_leaves": 31, "max_depth": 2},
                          train_set=ds)
        bst.update()
        assert bst.trees[0].num_leaves <= 4

    def test_train_predict_consistency(self, reg_data):
        """Raw-feature prediction must match the binned training-path score."""
        X, y, _ = reg_data
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"num_leaves": 31}, ds, num_boost_round=10)
        pred = bst.predict(X)
        assert np.allclose(pred, bst.F, atol=1e-10)


class TestGBDT:
    def test_regression_fits(self, reg_data):
        X, y, f_true = reg_data
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"learning_rate": 0.1, "num_leaves": 31},
                        ds, num_boost_round=80)
        pred = bst.predict(X)
        assert 1 - np.var(y - pred) / np.var(y) > 0.9
        # closer to truth than to noise
        assert np.sqrt(np.mean((pred - f_true) ** 2)) < 0.3

    def test_binary(self, reg_data):
        X, _, f_true = reg_data
        rng = np.random.RandomState(3)
        yb = (rng.rand(len(X)) < 1 / (1 + np.exp(-(f_true - f_true.mean())))
              ).astype(float)
        ds = gpb.Dataset(X, label=yb)
        bst = gpb.train({"objective": "binary", "num_leaves": 15},
                        ds, num_boost_round=40)
        p = bst.predict(X)
        assert np.all((p > 0) & (p < 1))
        logloss = -np.mean(yb * np.log(p) + (1 - yb) * np.log(1 - p))
        base = -np.mean(yb * np.log(yb.mean()) + (1 - yb) * np.log(1 - yb.mean()))
        assert logloss < 0.8 * base

    def test_save_load_roundtrip(self, reg_data, tmp_path):
        X, y, _ = reg_data
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"num_leaves": 15}, ds, num_boost_round=10)
        f = str(tmp_path / "model.json")
        bst.save_model(f)
        bst2 = gpb.Booster(model_file=f)
        assert np.allclose(bst.predict(X), bst2.predict(X))


class TestSampling:
    """bagging_fraction / bagging_freq / feature_fraction (config.h)."""

    def test_bagging_still_fits(self, reg_data):
        X, y, f_true = reg_data
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"learning_rate": 0.1, "num_leaves": 31,
                         "bagging_fraction": 0.5, "bagging_freq": 1},
                        ds, num_boost_round=80)
        pred = bst.predict(X)
        assert 1 - np.var(y - pred) / np.var(y) > 0.85

    def test_bagging_changes_trees(self, reg_data):
        X, y, _ = reg_data
        ds = gpb.Dataset(X, label=y)
        b1 = gpb.train({"num_leaves": 15}, ds, num_boost_round=5)
        b2 = gpb.train({"num_leaves": 15, "bagging_fraction": 0.5,
                        "bagging_freq": 1}, ds, num_boost_round=5)
        assert not np.allclose(b1.predict(X), b2.predict(X))

    def test_feature_fraction_masks_features(self, reg_data):
        X, y, _ = reg_data
        ds = gpb.Dataset(X, label=y)
        # with 1 of 8 features per tree, single-tree splits use ONE feature
        bst = gpb.Booster(params={"num_leaves": 15,
                                  "feature_fraction": 1.0 / 8.0},
                          train_set=ds)
        bst.update()
        t = bst.trees[0]
        feats = {int(t.split_feature[i]) for i in range(t.num_nodes)
                 if not t.is_leaf[i]}
        assert len(feats) <= 1

    def test_feature_fraction_still_fits(self, reg_data):
        X, y, _ = reg_data
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"learning_rate": 0.1, "num_leaves": 31,
                         "feature_fraction": 0.6}, ds, num_boost_round=80)
        pred = bst.predict(X)
        assert 1 - np.var(y - pred) / np.var(y) > 0.85


class TestGPBoostAlgorithm:
    """The combined tree-boosting + random effects algorithm (SURVEY §3.2)."""

    def test_gaussian_gpboost(self):
        rng = np.random.RandomState(7)
        n, p = 500, 5
        X = rng.rand(n, p)
        f_true = 2 * X[:, 0] + np.sin(6 * X[:, 1])
        group = rng.randint(0, 25, size=n)
        b = 0.8 * rng.randn(25)
        y = f_true + b[group] + 0.2 * rng.randn(n)

        gp = gpb.GPModel(group_data=group)
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"learning_rate": 0.1, "num_leaves": 15,
                         "min_data_in_leaf": 10},
                        ds, num_boost_round=40, gp_model=gp)
        # variance components recovered
        cov = gp.get_cov_pars()
        assert abs(cov[0] - 0.04) < 0.05        # nugget = 0.2^2
        assert abs(cov[1] - 0.64) < 0.5         # group var = 0.8^2
        # combined prediction beats trees-only
        pred = bst.predict(X, group_data_pred=group)
        resid_comb = y - pred["response_mean"]
        bst_only = gpb.train({"learning_rate": 0.1, "num_leaves": 15,
                              "min_data_in_leaf": 10},
                             gpb.Dataset(X, label=y), num_boost_round=40)
        resid_trees = y - bst_only.predict(X)
        assert np.mean(resid_comb ** 2) < np.mean(resid_trees ** 2)
        # fixed effect tracks f_true (up to a constant)
        fe = pred["fixed_effect"]
        assert np.corrcoef(fe, f_true)[0, 1] > 0.9

    def test_leaves_newton_update(self):
        """leaves_newton_update: joint GLS re-solve of leaf values must lower
        the marginal objective vs plain gradient leaves after few rounds
        (re_model_template.h:4947)."""
        rng = np.random.RandomState(5)
        n = 400
        X = rng.rand(n, 4)
        f_true = np.sin(6 * X[:, 0]) + X[:, 1]
        group = rng.randint(0, 20, size=n)
        y = f_true + 0.7 * rng.randn(20)[group] + 0.2 * rng.randn(n)
        ds = gpb.Dataset(X, label=y)

        def run(newton):
            gp = gpb.GPModel(group_data=group)
            bst = gpb.train({"learning_rate": 0.3, "num_leaves": 7,
                             "leaves_newton_update": newton},
                            ds, num_boost_round=8, gp_model=gp)
            t = gp._engine.transform_pars(gp._fit_result.cov_pars)
            r = y - bst.F
            from gpboost_tpu.boosting.gbdt import _psi_tilde_inv_apply
            return float(r @ _psi_tilde_inv_apply(gp._engine, t, r))

        assert run(True) < run(False)

    def test_line_search_step_length(self):
        """line_search_step_length: optimal per-tree step, still converges
        (re_model.cpp:697)."""
        rng = np.random.RandomState(9)
        n = 400
        X = rng.rand(n, 4)
        group = rng.randint(0, 20, size=n)
        y = np.sin(6 * X[:, 0]) + 0.5 * rng.randn(20)[group] + 0.2 * rng.randn(n)
        gp = gpb.GPModel(group_data=group)
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"learning_rate": 0.1, "num_leaves": 7,
                         "line_search_step_length": True},
                        ds, num_boost_round=30, gp_model=gp)
        pred = bst.predict(X, group_data_pred=group)
        assert np.mean((y - pred["response_mean"]) ** 2) < 0.25 * np.var(y)

    def test_lagaboost_binary(self):
        rng = np.random.RandomState(11)
        n, p = 500, 5
        X = rng.rand(n, p)
        f_true = 2.0 * (X[:, 0] - 0.5) + np.sin(6 * X[:, 1]) - 0.5
        group = rng.randint(0, 20, size=n)
        b = 0.8 * rng.randn(20)
        lp = f_true + b[group]
        y = (rng.rand(n) < 1 / (1 + np.exp(-lp))).astype(float)

        gp = gpb.GPModel(group_data=group, likelihood="bernoulli_logit")
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"learning_rate": 0.1, "num_leaves": 7,
                         "min_data_in_leaf": 20, "maxit_gp": 20},
                        ds, num_boost_round=20, gp_model=gp)
        pred = bst.predict(X, group_data_pred=group)
        p_hat = pred["response_mean"]
        assert np.all((p_hat >= 0) & (p_hat <= 1))
        logloss = -np.mean(y * np.log(p_hat + 1e-9)
                           + (1 - y) * np.log(1 - p_hat + 1e-9))
        base = -np.mean(y * np.log(y.mean()) + (1 - y) * np.log(1 - y.mean()))
        assert logloss < base


class TestFeatureImportance:
    def test_split_and_gain(self, reg_data):
        X, y, _ = reg_data
        bst = gpb.train({"num_leaves": 15}, gpb.Dataset(X, label=y),
                        num_boost_round=20)
        fi_split = bst.feature_importance("split")
        fi_gain = bst.feature_importance("gain")
        assert fi_split.sum() == sum(t.num_leaves - 1 for t in bst.trees)
        assert np.all(fi_gain >= 0)
        # informative features 0..2 dominate the noise features
        assert fi_gain[:3].sum() > 5 * fi_gain[3:].sum()
        with pytest.raises(ValueError):
            bst.feature_importance("nonsense")


class TestDartGoss:
    def test_dart_fits_and_training_score_consistent(self, reg_data):
        """DART must fit well AND keep self.F == ensemble prediction after
        all the drop/normalize bookkeeping (dart.hpp Normalize invariant)."""
        X, y, _ = reg_data
        bst = gpb.train({"learning_rate": 0.1, "num_leaves": 15,
                         "boosting": "dart", "drop_rate": 0.3,
                         "skip_drop": 0.3},
                        gpb.Dataset(X, label=y), num_boost_round=60)
        pred = bst.predict(X)
        assert np.allclose(pred, bst.F, atol=1e-8)
        assert 1 - np.var(y - pred) / np.var(y) > 0.8

    def test_goss_fits(self, reg_data):
        X, y, _ = reg_data
        bst = gpb.train({"learning_rate": 0.1, "num_leaves": 15,
                         "boosting": "goss"},
                        gpb.Dataset(X, label=y), num_boost_round=60)
        pred = bst.predict(X)
        assert np.allclose(pred, bst.F, atol=1e-10)
        assert 1 - np.var(y - pred) / np.var(y) > 0.85

    def test_unknown_boosting_raises(self, reg_data):
        X, y, _ = reg_data
        with pytest.raises(ValueError):
            gpb.Booster(params={"boosting": "rf_like"},
                        train_set=gpb.Dataset(X, label=y))


class TestRandomForest:
    def test_rf_fits_and_averages(self, reg_data):
        X, y, _ = reg_data
        bst = gpb.train({"boosting": "rf", "bagging_fraction": 0.6,
                         "bagging_freq": 1, "num_leaves": 31,
                         "min_data_in_leaf": 5},
                        gpb.Dataset(X, label=y), num_boost_round=50)
        pred = bst.predict(X)
        assert np.allclose(pred, bst.F, atol=1e-10)
        assert 1 - np.var(y - pred) / np.var(y) > 0.7
        # averaging: prediction scale must not grow with tree count
        p10 = gpb.train({"boosting": "rf", "bagging_fraction": 0.6,
                         "bagging_freq": 1, "num_leaves": 31,
                         "min_data_in_leaf": 5},
                        gpb.Dataset(X, label=y), num_boost_round=10).predict(X)
        assert abs(np.mean(pred) - np.mean(p10)) < 0.2

    def test_rf_requires_bagging(self, reg_data):
        X, y, _ = reg_data
        with pytest.raises(ValueError):
            gpb.Booster(params={"boosting": "rf"},
                        train_set=gpb.Dataset(X, label=y))

    def test_rf_rejects_gp_model(self, reg_data):
        X, y, _ = reg_data
        with pytest.raises(ValueError):
            gpb.Booster(params={"boosting": "rf", "bagging_fraction": 0.5,
                                "bagging_freq": 1},
                        train_set=gpb.Dataset(X, label=y),
                        gp_model=gpb.GPModel(
                            group_data=np.arange(len(y)) % 5))


class TestContinuedTraining:
    def test_init_model_continues(self, reg_data):
        X, y, _ = reg_data
        ds = gpb.Dataset(X, label=y)
        b1 = gpb.train({"num_leaves": 15, "learning_rate": 0.1}, ds,
                       num_boost_round=20)
        b2 = gpb.train({"num_leaves": 15, "learning_rate": 0.1}, ds,
                       num_boost_round=20, init_model=b1)
        assert len(b2.trees) == 40
        mse1 = np.mean((y - b1.predict(X)) ** 2)
        mse2 = np.mean((y - b2.predict(X)) ** 2)
        assert mse2 < mse1
        # continuing must not mutate the source model
        assert np.isclose(np.mean((y - b1.predict(X)) ** 2), mse1)

    def test_init_model_from_file(self, reg_data, tmp_path):
        X, y, _ = reg_data
        ds = gpb.Dataset(X, label=y)
        b1 = gpb.train({"num_leaves": 15}, ds, num_boost_round=10)
        f = str(tmp_path / "m.json")
        b1.save_model(f)
        b2 = gpb.train({"num_leaves": 15}, ds, num_boost_round=5, init_model=f)
        assert len(b2.trees) == 15

    def test_init_model_rejected_for_rf(self, reg_data):
        X, y, _ = reg_data
        ds = gpb.Dataset(X, label=y)
        b1 = gpb.train({"num_leaves": 7}, ds, num_boost_round=2)
        with pytest.raises(ValueError):
            gpb.train({"boosting": "rf", "bagging_fraction": 0.5,
                       "bagging_freq": 1}, ds, num_boost_round=2,
                      init_model=b1)
