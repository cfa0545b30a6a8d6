"""Fused multi-round training (one device dispatch per block of boosting
iterations) must match the per-round host loop exactly.

Reference semantics: gbdt.cpp:412 TrainOneIter repeated; the fused paths are
Booster.update_many (plain objectives) and Booster.update_many_gpboost
(Gaussian GPBoost algorithm with the end-of-iteration OptimCovPar refit,
gbdt.cpp:549). The host loop is forced via a no-op callback.
"""

import numpy as np
import pytest

import gpboost_tpu as gpb

pytestmark = pytest.mark.slow  # compile-heavy tier (pytest.ini)


def _data(n=1200, p=6, seed=3):
    rng = np.random.RandomState(seed)
    X = rng.rand(n, p)
    y = X[:, 0] * 2 + np.sin(5 * X[:, 1]) + 0.3 * rng.randn(n)
    return X, y


class TestScanFastPath:
    @pytest.mark.parametrize("obj", ["regression", "binary", "quantile",
                                     "poisson"])
    def test_matches_per_round_loop(self, obj):
        X, y = _data()
        if obj == "binary":
            yy = (y > 1.0).astype(float)
        elif obj == "poisson":
            yy = np.floor(np.exp(np.clip(y * 0.3, -2, 2)))
        else:
            yy = y
        params = {"objective": obj, "num_leaves": 15, "learning_rate": 0.1,
                  "verbose": 0}
        b_fast = gpb.train(params, gpb.Dataset(X, label=yy),
                           num_boost_round=10)
        b_slow = gpb.train(params, gpb.Dataset(X, label=yy),
                           num_boost_round=10,
                           callbacks=[lambda env: None])
        pf = np.asarray(b_fast.predict(X[:300]))
        ps = np.asarray(b_slow.predict(X[:300]))
        assert len(b_fast.trees) == len(b_slow.trees) == 10
        np.testing.assert_allclose(pf, ps, rtol=0, atol=1e-12)

    def test_chunking_matches_single_block(self):
        X, y = _data(800)
        params = {"objective": "regression", "num_leaves": 7,
                  "learning_rate": 0.2, "verbose": 0}
        ds1 = gpb.Dataset(X, label=y)
        b1 = gpb.Booster(params=params, train_set=ds1)
        b1.update_many(9, chunk=4)          # 4 + 4 + 1
        ds2 = gpb.Dataset(X, label=y)
        b2 = gpb.Booster(params=params, train_set=ds2)
        b2.update_many(9, chunk=9)
        np.testing.assert_allclose(b1.F, b2.F, rtol=0, atol=1e-12)

    def test_weights_respected(self):
        X, y = _data(600)
        w = 0.5 + np.random.RandomState(0).rand(600)
        params = {"objective": "regression", "num_leaves": 7, "verbose": 0}
        bf = gpb.train(params, gpb.Dataset(X, label=y, weight=w),
                       num_boost_round=5)
        bs = gpb.train(params, gpb.Dataset(X, label=y, weight=w),
                       num_boost_round=5, callbacks=[lambda env: None])
        np.testing.assert_allclose(np.asarray(bf.predict(X[:200])),
                                   np.asarray(bs.predict(X[:200])),
                                   atol=1e-12)

    def test_ineligible_configs_fall_back(self):
        X, y = _data(500)
        # bagging forces the per-round loop; result must still train
        bst = gpb.train({"objective": "regression", "num_leaves": 7,
                         "verbose": 0, "bagging_fraction": 0.8,
                         "bagging_freq": 1}, gpb.Dataset(X, label=y),
                        num_boost_round=4)
        assert len(bst.trees) == 4
        ds = gpb.Dataset(X, label=y)
        b = gpb.Booster(params={"objective": "regression", "verbose": 0,
                                "bagging_fraction": 0.8, "bagging_freq": 1},
                        train_set=ds)
        assert not b.can_train_scanned()
        b2 = gpb.Booster(params={"objective": "regression", "verbose": 0},
                         train_set=gpb.Dataset(X, label=y))
        assert b2.can_train_scanned()


class TestScanMulti:
    def test_multiclass_matches_per_round_loop(self):
        rng = np.random.RandomState(11)
        n, p, K = 900, 6, 3
        X = rng.rand(n, p)
        yy = (np.digitize(X[:, 0] + 0.3 * rng.randn(n),
                          [0.33, 0.66])).astype(float)
        params = {"objective": "multiclass", "num_class": K,
                  "num_leaves": 7, "learning_rate": 0.2, "verbose": 0}
        bf = gpb.train(params, gpb.Dataset(X, label=yy), num_boost_round=6)
        bs = gpb.train(params, gpb.Dataset(X, label=yy), num_boost_round=6,
                       callbacks=[lambda env: None])
        assert len(bf.trees) == len(bs.trees) == 6 * K
        np.testing.assert_allclose(np.asarray(bf.predict(X[:200])),
                                   np.asarray(bs.predict(X[:200])),
                                   rtol=0, atol=1e-12)

    def test_mean_scale_matches_per_round_loop(self):
        rng = np.random.RandomState(12)
        n = 700
        X = rng.rand(n, 5)
        yy = X[:, 0] * 2 + np.exp(X[:, 1]) * 0.3 * rng.randn(n)
        params = {"objective": "mean_scale_regression", "num_leaves": 7,
                  "learning_rate": 0.1, "verbose": 0}
        bf = gpb.train(params, gpb.Dataset(X, label=yy), num_boost_round=5)
        bs = gpb.train(params, gpb.Dataset(X, label=yy), num_boost_round=5,
                       callbacks=[lambda env: None])
        assert len(bf.trees) == len(bs.trees) == 10
        pf, ps = bf.predict(X[:200]), bs.predict(X[:200])
        np.testing.assert_allclose(np.asarray(pf["pred_mean"]),
                                   np.asarray(ps["pred_mean"]),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(pf["pred_var"]),
                                   np.asarray(ps["pred_var"]),
                                   rtol=0, atol=1e-12)


class TestScanGPBoost:
    def test_matches_per_round_loop(self):
        rng = np.random.RandomState(5)
        n = 500
        coords = rng.rand(n, 2)
        X = rng.rand(n, 4)
        y = (np.sin(3 * X[:, 0]) + X[:, 1] ** 2
             + np.sin(6 * coords[:, 0]) * np.cos(4 * coords[:, 1])
             + 0.3 * rng.randn(n))

        def run(fast):
            gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                             gp_approx="vecchia", num_neighbors=10)
            ds = gpb.Dataset(X, label=y)
            bst = gpb.train({"objective": "regression",
                             "learning_rate": 0.1, "num_leaves": 7,
                             "verbose": 0}, ds, num_boost_round=6,
                            gp_model=gp,
                            callbacks=None if fast else [lambda env: None])
            return bst, gp

        bf, gf = run(True)
        bs, gs = run(False)
        assert len(bf.trees) == len(bs.trees) == 6
        np.testing.assert_allclose(np.ravel(gf.get_cov_pars()),
                                   np.ravel(gs.get_cov_pars()), rtol=1e-6)
        pf = bf.predict(X[:100], gp_coords_pred=coords[:100])
        ps = bs.predict(X[:100], gp_coords_pred=coords[:100])
        np.testing.assert_allclose(pf["response_mean"], ps["response_mean"],
                                   rtol=0, atol=1e-6)


class TestScanLaGaBoost:
    def test_matches_per_round_loop(self):
        rng = np.random.RandomState(9)
        n = 400
        coords = rng.rand(n, 2)
        X = rng.rand(n, 3)
        lat = (0.4 * np.sin(3 * X[:, 0])
               + 0.6 * np.sin(6 * coords[:, 0]) * np.cos(4 * coords[:, 1]))
        y = rng.poisson(np.exp(lat)).astype(float)

        def run(fast):
            gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                             likelihood="poisson", gp_approx="vecchia",
                             num_neighbors=8,
                             matrix_inversion_method="cholesky")
            ds = gpb.Dataset(X, label=y)
            bst = gpb.train({"objective": "poisson", "learning_rate": 0.1,
                             "num_leaves": 7, "verbose": 0}, ds,
                            num_boost_round=5, gp_model=gp,
                            callbacks=None if fast else [lambda env: None])
            return bst, gp

        bf, gf = run(True)
        bs, gs = run(False)
        assert bf.can_train_scanned_lagaboost()
        assert len(bf.trees) == len(bs.trees) == 5
        # rtol 1e-4: the two paths are the same algorithm but different XLA
        # programs; 5 rounds of warm-started GD cov refits compound float
        # reassociation differences to ~5e-5 on some hosts
        np.testing.assert_allclose(np.ravel(gf.get_cov_pars()),
                                   np.ravel(gs.get_cov_pars()), rtol=1e-4)
        pf = bf.predict(X[:50], gp_coords_pred=coords[:50],
                        pred_latent=True)
        ps = bs.predict(X[:50], gp_coords_pred=coords[:50],
                        pred_latent=True)
        np.testing.assert_allclose(pf["fixed_effect"], ps["fixed_effect"],
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(pf["random_effect_mean"],
                                   ps["random_effect_mean"],
                                   rtol=0, atol=1e-5)
