"""Missing-value handling in the boosting path.

Reference semantics: io/bin.cpp FindBin + bin.h MissingType (NaN gets a
dedicated bin; zero_as_missing maps zeros there too; use_missing=false
treats NaN as zero), feature_histogram.hpp:167-190 (split search runs BOTH
missing directions and records default_left), tree.h decision_type_
kDefaultLeftMask (prediction routes missing by the learned direction).
"""

import numpy as np
import pytest

import gpboost_tpu as gpb


def _simple_missing_data(n=200, seed=3):
    # n small enough that every distinct value gets its own bin, so a bin
    # boundary can separate the classes exactly at the 0.5 gap
    rng = np.random.RandomState(seed)
    x = rng.rand(n)
    x = np.where(x < 0.5, x * 0.8, 0.6 + (x - 0.5) * 0.8)
    miss = rng.rand(n) < 0.3
    x = np.where(miss, np.nan, x)
    # missing rows behave like LOW x: only (x <= t OR missing) -> left
    # separates the classes, i.e. a default_left split
    y = np.where(miss | (np.nan_to_num(x, nan=1.0) < 0.5), 1.0, -1.0)
    return x[:, None], y, miss


class TestDefaultDirection:
    def test_learned_default_left_single_split(self):
        X, y, miss = _simple_missing_data()
        bst = gpb.train({"objective": "regression", "num_leaves": 2,
                         "learning_rate": 1.0, "min_data_in_leaf": 1,
                         "verbose": 0}, gpb.Dataset(X, label=y),
                        num_boost_round=1)
        pred = bst.predict(X)
        # one split separates the classes ONLY if NaN routes left
        assert np.abs(pred - y).max() < 1e-6
        t = bst.trees[0]
        assert bool(t.default_left[0])
        assert t.missing_bin[0] >= 0

    def test_learned_default_right(self):
        X, _, miss = _simple_missing_data()
        # missing belongs with HIGH x -> the separating split routes
        # missing right (default_left = False)
        y = np.where(miss | (np.nan_to_num(X[:, 0], nan=1.0) > 0.5),
                     1.0, -1.0)
        bst = gpb.train({"objective": "regression", "num_leaves": 2,
                         "learning_rate": 1.0, "min_data_in_leaf": 1,
                         "verbose": 0}, gpb.Dataset(X, label=y),
                        num_boost_round=1)
        pred = bst.predict(X)
        assert np.abs(pred - y).max() < 1e-6
        assert not bool(bst.trees[0].default_left[0])

    def test_train_predict_consistency_with_nan(self):
        rng = np.random.RandomState(0)
        n = 600
        X = rng.rand(n, 4)
        X[rng.rand(n, 4) < 0.2] = np.nan
        y = np.nansum(X, axis=1) + 0.1 * rng.randn(n)
        bst = gpb.train({"objective": "regression", "num_leaves": 15,
                         "learning_rate": 0.2, "verbose": 0},
                        gpb.Dataset(X, label=y), num_boost_round=8)
        # raw-threshold descent must route NaN exactly like the binned
        # training partition did
        pred = bst.predict(X)
        resid = y - pred
        assert np.var(resid) < 0.6 * np.var(y)

    def test_save_load_preserves_missing_routing(self, tmp_path):
        X, y, miss = _simple_missing_data()
        bst = gpb.train({"objective": "regression", "num_leaves": 4,
                         "learning_rate": 0.5, "min_data_in_leaf": 1,
                         "verbose": 0}, gpb.Dataset(X, label=y),
                        num_boost_round=3)
        pred = bst.predict(X)
        f = str(tmp_path / "m.json")
        bst.save_model(f)
        loaded = gpb.Booster(model_file=f)
        np.testing.assert_allclose(loaded.predict(X), pred, rtol=1e-12)

    def test_nan_free_data_has_no_direction_overhead(self):
        rng = np.random.RandomState(1)
        X = rng.rand(300, 3)
        y = X[:, 0] + rng.randn(300) * 0.1
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"objective": "regression", "num_leaves": 8,
                         "verbose": 0}, ds, num_boost_round=2)
        assert bst.learner.nan_bin_t is None
        for t in bst.trees:
            assert not t.default_left[:t.num_nodes].any()


class TestMissingTypes:
    def test_use_missing_false_nan_is_zero(self):
        rng = np.random.RandomState(2)
        n = 300
        x = rng.rand(n) * 2 - 1
        x[:40] = 0.0
        x[40:80] = np.nan
        y = np.where(np.nan_to_num(x, nan=0.0) <= 0.0, 1.0, -1.0)
        X = x[:, None]
        bst = gpb.train({"objective": "regression", "num_leaves": 4,
                         "learning_rate": 1.0, "use_missing": False,
                         "verbose": 0}, gpb.Dataset(X, label=y),
                        num_boost_round=1)
        # NaN treated as zero end to end (binning AND prediction)
        assert bst.learner.nan_bin_t is None
        assert bst.trees[0].missing_bin[0] == -1
        np.testing.assert_allclose(bst.predict(np.array([[np.nan]])),
                                   bst.predict(np.array([[0.0]])))

    def test_zero_as_missing_routes_zero_like_nan(self):
        rng = np.random.RandomState(4)
        n = 200
        u = rng.rand(n)                # strictly positive, gap at (0.9, 1.1)
        x = np.where(u < 0.5, 0.5 + u * 0.8, 1.1 + (u - 0.5) * 0.8)
        zero = rng.rand(n) < 0.3
        x = np.where(zero, 0.0, x)
        y = np.where(zero | (x < 1.0), 1.0, -1.0)
        X = x[:, None]
        bst = gpb.train({"objective": "regression", "num_leaves": 2,
                         "learning_rate": 1.0, "zero_as_missing": True,
                         "min_data_in_leaf": 1, "verbose": 0},
                        gpb.Dataset(X, label=y, params={
                            "zero_as_missing": True}),
                        num_boost_round=1)
        assert np.abs(bst.predict(X) - y).max() < 1e-6
        # zeros and NaN follow the same learned direction
        np.testing.assert_allclose(bst.predict(np.array([[0.0]])),
                                   bst.predict(np.array([[np.nan]])))

    def test_zero_as_missing_binning(self):
        from gpboost_tpu.boosting.dataset import BinMapper
        v = np.array([0.0, 0.0, 1.0, 2.0, 3.0, 4.0, 5.0])
        m = BinMapper(v, max_bin=16, min_data_in_bin=1,
                      zero_as_missing=True)
        assert m.has_nan
        b = m.transform(v)
        assert (b[:2] == m.nan_bin).all()
        assert (b[2:] != m.nan_bin).all()
        assert m.transform([np.nan])[0] == m.nan_bin


class TestShapWithNan:
    def test_pred_contrib_additivity_with_nan(self):
        """TreeSHAP must route missing rows by default_left like prediction
        does — additivity (rows sum to the raw score) catches any
        divergence."""
        rng = np.random.RandomState(7)
        n = 300
        X = rng.rand(n, 3)
        X[rng.rand(n, 3) < 0.3] = np.nan
        y = np.nansum(X, axis=1) + 0.1 * rng.randn(n)
        bst = gpb.train({"objective": "regression", "num_leaves": 7,
                         "learning_rate": 0.3, "verbose": 0},
                        gpb.Dataset(X, label=y), num_boost_round=5)
        phi = bst.predict(X, pred_contrib=True)
        raw = bst.predict(X, raw_score=True)
        np.testing.assert_allclose(phi.sum(axis=1), raw, rtol=1e-8,
                                   atol=1e-10)


class TestFusedScanWithNan:
    def test_scan_path_equals_host_loop(self):
        """The fused multi-round lax.scan path must route missing rows
        identically to the host per-tree loop (both ride
        _grow_tree_partitioned_impl with the same nan_bin)."""
        rng = np.random.RandomState(5)
        n = 500
        X = rng.rand(n, 3)
        X[rng.rand(n, 3) < 0.25] = np.nan
        y = np.nansum(X, axis=1) + 0.05 * rng.randn(n)
        params = {"objective": "regression", "num_leaves": 7,
                  "learning_rate": 0.3, "verbose": 0}
        # a no-op callback forces the per-round host loop
        b1 = gpb.train(params, gpb.Dataset(X, label=y), num_boost_round=6,
                       callbacks=[lambda env: None])
        b2 = gpb.train(params, gpb.Dataset(X, label=y), num_boost_round=6)
        np.testing.assert_allclose(b1.predict(X), b2.predict(X),
                                   rtol=0, atol=1e-12)


@pytest.mark.parametrize("mode", ["data", "feature"])
def test_parallel_learners_route_missing(mode):
    """1-vs-8 virtual-device equivalence THROUGH train() with NaN data
    (data_parallel_tree_learner.cpp / feature_parallel_tree_learner.cpp
    analogues must apply the same default-direction search)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.RandomState(6)
    n = 512
    X = rng.rand(n, 4)
    X[rng.rand(n, 4) < 0.25] = np.nan
    y = np.nansum(X, axis=1) + 0.05 * rng.randn(n)
    params = {"objective": "regression", "num_leaves": 7,
              "learning_rate": 0.3, "verbose": 0}
    b1 = gpb.train(params, gpb.Dataset(X, label=y), num_boost_round=3)
    b8 = gpb.train(dict(params, num_parallel_devices=8,
                        tree_learner=mode + "_parallel"),
                   gpb.Dataset(X, label=y), num_boost_round=3)
    np.testing.assert_allclose(b8.predict(X), b1.predict(X),
                               rtol=1e-6, atol=1e-8)
