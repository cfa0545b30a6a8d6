"""Boosting breadth: multiclass/quantile/cross-entropy objectives,
lambda_l1, monotone constraints, categorical features, linear trees.

Reference: src/LightGBM/objective/{multiclass,regression,xentropy}_
objective.hpp, treelearner/feature_histogram.hpp (L1 / monotone),
io/bin.cpp categorical bins, treelearner/linear_tree_learner.cpp.
"""

import json
import os
import tempfile

import numpy as np
import pytest

import gpboost_tpu as gpb


class TestMulticlass:
    @pytest.fixture(scope="class")
    def mc_data(self):
        rng = np.random.RandomState(2)
        n = 900
        X = rng.rand(n, 4)
        logits = np.stack([2 * X[:, 0], 2 * X[:, 1], 2 * X[:, 2]])
        y = np.argmax(logits + 0.3 * rng.gumbel(size=(3, n)),
                      axis=0).astype(float)
        return dict(X=X, y=y)

    def test_train_predict(self, mc_data):
        d = mc_data
        ds = gpb.Dataset(d["X"][:700], label=d["y"][:700])
        bst = gpb.train({"objective": "multiclass", "num_class": 3,
                         "num_leaves": 15, "min_data_in_leaf": 10,
                         "verbose": 0}, ds, num_boost_round=40)
        P = bst.predict(d["X"][700:])
        assert P.shape == (200, 3)
        np.testing.assert_allclose(P.sum(1), 1.0, rtol=1e-10)
        assert (P.argmax(1) == d["y"][700:]).mean() > 0.6
        raw = bst.predict(d["X"][700:], raw_score=True)
        assert raw.shape == (200, 3)

    def test_multi_logloss_metric(self, mc_data):
        d = mc_data
        ds = gpb.Dataset(d["X"][:700], label=d["y"][:700])
        vs = gpb.Dataset(d["X"][700:], label=d["y"][700:])
        ev = {}
        gpb.train({"objective": "multiclass", "num_class": 3,
                   "num_leaves": 15, "min_data_in_leaf": 10, "verbose": 0,
                   "metric": "multi_logloss"}, ds, num_boost_round=10,
                  valid_sets=[vs], evals_result=ev)
        hist = ev["valid_0"]["multi_logloss"]
        assert len(hist) == 10 and hist[-1] < hist[0]


class TestQuantileXentropy:
    def test_quantile_coverage(self):
        rng = np.random.RandomState(3)
        n = 900
        X = rng.rand(n, 4)
        y = 3 * X[:, 0] + 0.5 * rng.randn(n)
        ds = gpb.Dataset(X[:700], label=y[:700])
        bst = gpb.train({"objective": "quantile", "alpha": 0.9,
                         "num_leaves": 15, "min_data_in_leaf": 10,
                         "verbose": 0}, ds, num_boost_round=60)
        cover = (y[700:] <= bst.predict(X[700:])).mean()
        assert 0.8 < cover < 0.98

    def test_cross_entropy(self):
        rng = np.random.RandomState(3)
        n = 900
        X = rng.rand(n, 4)
        y = np.clip(X[:, 0] + 0.1 * rng.randn(n), 0, 1)
        ds = gpb.Dataset(X[:700], label=y[:700])
        bst = gpb.train({"objective": "cross_entropy", "num_leaves": 15,
                         "min_data_in_leaf": 10, "verbose": 0},
                        ds, num_boost_round=60)
        p = bst.predict(X[700:])
        assert np.all((p >= 0) & (p <= 1))
        assert np.corrcoef(p, y[700:])[0, 1] > 0.8


class TestRegularizationAndConstraints:
    def test_lambda_l1_shrinks_leaves(self):
        rng = np.random.RandomState(1)
        n = 500
        X = rng.rand(n, 3)
        y = X[:, 0] + 0.5 * rng.randn(n)
        ds = gpb.Dataset(X, label=y)
        b0 = gpb.train({"objective": "regression", "num_leaves": 31,
                        "min_data_in_leaf": 5, "verbose": 0},
                       ds, num_boost_round=5)
        b1 = gpb.train({"objective": "regression", "num_leaves": 31,
                        "min_data_in_leaf": 5, "verbose": 0,
                        "lambda_l1": 50.0}, ds, num_boost_round=5)
        s0 = sum(np.abs(t.leaf_value[:t.num_nodes][t.is_leaf[:t.num_nodes]])
                 .sum() for t in b0.trees)
        s1 = sum(np.abs(t.leaf_value[:t.num_nodes][t.is_leaf[:t.num_nodes]])
                 .sum() for t in b1.trees)
        assert s1 < s0

    def test_monotone_increasing(self):
        rng = np.random.RandomState(1)
        n = 600
        X = rng.rand(n, 3)
        y = 2 * X[:, 0] + np.sin(6 * X[:, 1]) + 0.2 * rng.randn(n)
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"objective": "regression", "num_leaves": 31,
                         "min_data_in_leaf": 10, "verbose": 0,
                         "monotone_constraints": [1, 0, 0]},
                        ds, num_boost_round=40)
        xs = np.linspace(0.02, 0.98, 60)
        base = np.full((60, 3), 0.5)
        base[:, 0] = xs
        p = bst.predict(base)
        assert (np.diff(p) >= -1e-10).all()

    def test_monotone_decreasing(self):
        rng = np.random.RandomState(1)
        n = 600
        X = rng.rand(n, 3)
        y = -2 * X[:, 0] + 0.2 * rng.randn(n)
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"objective": "regression", "num_leaves": 15,
                         "min_data_in_leaf": 10, "verbose": 0,
                         "monotone_constraints": [-1, 0, 0]},
                        ds, num_boost_round=30)
        xs = np.linspace(0.02, 0.98, 60)
        base = np.full((60, 3), 0.5)
        base[:, 0] = xs
        p = bst.predict(base)
        assert (np.diff(p) <= 1e-10).all()


class TestCategorical:
    @pytest.fixture(scope="class")
    def cat_data(self):
        rng = np.random.RandomState(4)
        n = 1200
        cat = rng.randint(0, 12, n).astype(float)
        effect = np.array([3.0, -2, 1.5, 0.2, -3, 2.2, -1, 0.5, 2.8,
                           -0.7, -2.5, 1.0])
        X = np.column_stack([cat, rng.rand(n)])
        y = effect[cat.astype(int)] + 0.3 * rng.randn(n)
        return dict(X=X, y=y)

    def test_fit_and_round_trip(self, cat_data):
        d = cat_data
        ds = gpb.Dataset(d["X"][:900], label=d["y"][:900],
                         categorical_feature=[0])
        bst = gpb.train({"objective": "regression", "num_leaves": 15,
                         "min_data_in_leaf": 10, "verbose": 0},
                        ds, num_boost_round=30)
        p = bst.predict(d["X"][900:])
        assert np.mean((p - d["y"][900:]) ** 2) < 0.2
        # categorical split sets survive JSON round trips
        fn = tempfile.mktemp(suffix=".json")
        bst.save_model(fn)
        b2 = gpb.Booster(model_file=fn)
        np.testing.assert_allclose(b2.predict(d["X"][900:]), p)
        os.unlink(fn)
        assert any(t.cat_left_values for t in bst.trees)

    def test_one_tree_separates_categories(self, cat_data):
        """A single tree with enough leaves should isolate the 12 category
        means — impossible for numeric splits at depth limits that low if
        category ids are not ordered by effect."""
        d = cat_data
        ds = gpb.Dataset(d["X"][:900], label=d["y"][:900],
                         categorical_feature=[0])
        bst = gpb.train({"objective": "regression", "num_leaves": 4,
                         "max_depth": 2, "min_data_in_leaf": 10,
                         "learning_rate": 1.0, "verbose": 0},
                        ds, num_boost_round=1)
        dsn = gpb.Dataset(d["X"][:900], label=d["y"][:900])
        bn = gpb.train({"objective": "regression", "num_leaves": 4,
                        "max_depth": 2, "min_data_in_leaf": 10,
                        "learning_rate": 1.0, "verbose": 0},
                       dsn, num_boost_round=1)
        mse_cat = np.mean((bst.predict(d["X"][900:]) - d["y"][900:]) ** 2)
        mse_num = np.mean((bn.predict(d["X"][900:]) - d["y"][900:]) ** 2)
        assert mse_cat < mse_num


class TestLinearTree:
    def test_linear_trees_beat_constant_leaves_on_linear_data(self):
        rng = np.random.RandomState(5)
        n = 800
        X = rng.rand(n, 3)
        y = 3 * X[:, 0] + 2 * X[:, 1] + 0.1 * rng.randn(n)
        ds = gpb.Dataset(X[:600], label=y[:600])
        b_lin = gpb.train({"objective": "regression", "num_leaves": 7,
                           "min_data_in_leaf": 20, "verbose": 0,
                           "linear_tree": True}, ds, num_boost_round=20)
        b_std = gpb.train({"objective": "regression", "num_leaves": 7,
                           "min_data_in_leaf": 20, "verbose": 0},
                          ds, num_boost_round=20)
        m_lin = np.mean((b_lin.predict(X[600:]) - y[600:]) ** 2)
        m_std = np.mean((b_std.predict(X[600:]) - y[600:]) ** 2)
        assert m_lin < m_std * 0.6

    def test_round_trip(self):
        rng = np.random.RandomState(5)
        n = 400
        X = rng.rand(n, 3)
        y = 3 * X[:, 0] + 0.1 * rng.randn(n)
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"objective": "regression", "num_leaves": 7,
                         "min_data_in_leaf": 20, "verbose": 0,
                         "linear_tree": True}, ds, num_boost_round=5)
        fn = tempfile.mktemp(suffix=".json")
        bst.save_model(fn)
        b2 = gpb.Booster(model_file=fn)
        np.testing.assert_allclose(b2.predict(X), bst.predict(X))
        os.unlink(fn)


class TestEFB:
    """Exclusive feature bundling (io/dataset_loader.cpp FindGroups,
    io/bin.cpp bundling)."""

    def _exclusive_data(self, n=600, k=3, seed=1):
        rng = np.random.RandomState(seed)
        Z = np.zeros((n, k))
        sel = rng.randint(0, k, n)
        Z[np.arange(n), sel] = 1.0
        y = np.linspace(-1, 1, k)[sel]
        return Z, y, sel

    def test_bundles_formed_and_exact(self):
        Z, y, sel = self._exclusive_data()
        ds = gpb.Dataset(Z, label=y, params={"enable_bundle": True})
        ds.construct()
        assert len(ds.bundles) == 1
        assert ds.bins.shape[1] == 1        # 3 features -> 1 column
        bst = gpb.train({"objective": "regression", "num_leaves": 8,
                         "min_data_in_leaf": 5, "verbose": 0,
                         "learning_rate": 1.0}, ds, num_boost_round=1)
        assert np.mean((bst.predict(Z) - y) ** 2) < 1e-10

    def test_round_trip(self):
        Z, y, sel = self._exclusive_data()
        ds = gpb.Dataset(Z, label=y, params={"enable_bundle": True})
        bst = gpb.train({"objective": "regression", "num_leaves": 8,
                         "min_data_in_leaf": 5, "verbose": 0},
                        ds, num_boost_round=5)
        fn = tempfile.mktemp(suffix=".json")
        bst.save_model(fn)
        b2 = gpb.Booster(model_file=fn)
        np.testing.assert_allclose(b2.predict(Z), bst.predict(Z))
        os.unlink(fn)

    def test_dense_features_not_bundled(self):
        rng = np.random.RandomState(0)
        X = rng.rand(300, 3)                # dense -> no bundling
        ds = gpb.Dataset(X, label=X[:, 0],
                         params={"enable_bundle": True})
        ds.construct()
        assert len(ds.bundles) == 0

    def test_conflict_rate(self):
        rng = np.random.RandomState(2)
        n = 600
        Z = np.zeros((n, 3))
        sel = rng.randint(0, 3, n)
        Z[np.arange(n), sel] = 1.0
        # introduce 5% conflicts
        clash = rng.rand(n) < 0.05
        Z[clash] = 1.0
        ds0 = gpb.Dataset(Z, label=np.ones(n),
                          params={"enable_bundle": True})
        ds0.construct()
        assert len(ds0.bundles) == 0        # strict: conflicts block bundling
        ds1 = gpb.Dataset(Z, label=np.ones(n),
                          params={"enable_bundle": True,
                                  "max_conflict_rate": 0.1})
        ds1.construct()
        assert len(ds1.bundles) == 1


class TestDatasetIO:
    def test_libsvm(self):
        fn = tempfile.mktemp()
        with open(fn, "w") as f:
            f.write("1.5 1:2.0 3:0.5\n-0.5 2:1.0\n2.0 1:1.0 2:3.0 3:1.5\n")
        ds = gpb.Dataset(fn)
        assert ds.data.shape == (3, 3)
        np.testing.assert_allclose(ds.get_label(), [1.5, -0.5, 2.0])
        assert ds.data[0, 0] == 2.0 and ds.data[2, 2] == 1.5
        os.unlink(fn)

    def test_csv_with_header(self):
        fn = tempfile.mktemp(suffix=".csv")
        M = np.column_stack([np.arange(4.0), np.eye(4)])
        np.savetxt(fn, M, delimiter=",", header="y,a,b,c,d", comments="")
        ds = gpb.Dataset(fn)
        assert ds.data.shape == (4, 4)
        assert ds.get_label()[3] == 3.0
        os.unlink(fn)


class TestRefit:
    """Booster.refit (basic.py:3804; gbdt.cpp:314 RefitTree)."""

    def test_refit_moves_toward_new_data(self):
        rng = np.random.RandomState(0)
        X = rng.rand(500, 5)
        y1 = X[:, 0] + 0.05 * rng.randn(500)
        y2 = -X[:, 0] + 0.05 * rng.randn(500)   # opposite relationship
        ds = gpb.Dataset(X, label=y1)
        bst = gpb.train({"verbose": 0, "learning_rate": 0.1,
                         "num_leaves": 15}, ds, num_boost_round=30)
        mse_before = np.mean((bst.predict(X) - y2) ** 2)
        ref = bst.refit(X, y2, decay_rate=0.1)
        mse_after = np.mean((ref.predict(X) - y2) ** 2)
        assert mse_after < mse_before
        # original booster untouched
        assert np.mean((bst.predict(X) - y2) ** 2) == mse_before

    def test_decay_one_is_identity(self):
        rng = np.random.RandomState(1)
        X = rng.rand(200, 3)
        y = X[:, 0] + 0.1 * rng.randn(200)
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"verbose": 0}, ds, num_boost_round=5)
        ref = bst.refit(X, rng.randn(200), decay_rate=1.0)
        np.testing.assert_allclose(ref.predict(X), bst.predict(X),
                                   rtol=1e-12)

    def test_refit_same_data_improves_or_holds(self):
        rng = np.random.RandomState(2)
        X = rng.rand(300, 4)
        y = np.sin(3 * X[:, 0]) + 0.05 * rng.randn(300)
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"verbose": 0, "learning_rate": 0.3}, ds,
                        num_boost_round=10)
        ref = bst.refit(X, y, decay_rate=0.5)
        m0 = np.mean((bst.predict(X) - y) ** 2)
        m1 = np.mean((ref.predict(X) - y) ** 2)
        assert m1 < m0 * 1.2


class TestPandasInput:
    """DataFrame input with auto-detected categorical columns
    (basic.py _data_from_pandas)."""

    def test_dataframe_train_predict(self):
        pd = pytest.importorskip("pandas")
        rng = np.random.RandomState(3)
        n = 400
        cat = rng.choice(["a", "b", "c", "d"], n)
        eff = {"a": 0.0, "b": 1.0, "c": -1.0, "d": 2.0}
        x1 = rng.rand(n)
        y = x1 + np.array([eff[c] for c in cat]) + 0.05 * rng.randn(n)
        df = pd.DataFrame({"x1": x1, "cat": pd.Categorical(cat)})
        ds = gpb.Dataset(df, label=pd.Series(y))
        assert ds.categorical_feature == [1]
        bst = gpb.train({"verbose": 0, "learning_rate": 0.2,
                         "num_leaves": 15}, ds, num_boost_round=40)
        p = bst.predict(df)
        assert np.mean((p - y) ** 2) < 0.02
        # per-category means are separated
        pa = p[cat == "a"].mean()
        pd_ = p[cat == "d"].mean()
        assert pd_ - pa > 1.5

    def test_object_columns_and_roundtrip(self):
        pd = pytest.importorskip("pandas")
        rng = np.random.RandomState(4)
        n = 300
        cat = rng.choice(["u", "v", "w"], n)
        y = np.array([{"u": 0.0, "v": 2.0, "w": -2.0}[c] for c in cat]) \
            + 0.1 * rng.randn(n)
        df = pd.DataFrame({"g": cat, "z": rng.rand(n)})
        ds = gpb.Dataset(df, label=y)
        bst = gpb.train({"verbose": 0, "learning_rate": 0.3,
                         "min_data_in_leaf": 5}, ds, num_boost_round=20)
        fn = tempfile.mktemp(suffix=".json")
        bst.save_model(fn)
        bst2 = gpb.Booster(model_file=fn)
        np.testing.assert_allclose(bst2.predict(df), bst.predict(df),
                                   rtol=1e-12)
        os.unlink(fn)


class TestPathSmooth:
    def test_path_smooth_shrinks_toward_parent(self):
        """path_smooth (config.h): larger values pull leaf outputs toward
        the parent chain -> lower-variance predictions; 0 is a no-op."""
        rng = np.random.RandomState(11)
        n = 2000
        X = rng.randn(n, 5)
        y = X[:, 0] * 2 + rng.randn(n) * 0.1
        import gpboost_tpu as gpb
        preds = {}
        for ps in (0.0, 50.0, 1e7):
            ds = gpb.Dataset(X, label=y)
            bst = gpb.train({"objective": "regression", "num_leaves": 15,
                             "verbose": 0, "path_smooth": ps,
                             "learning_rate": 1.0},
                            ds, num_boost_round=1)
            preds[ps] = bst.predict(X)
        base = gpb.train({"objective": "regression", "num_leaves": 15,
                          "verbose": 0, "learning_rate": 1.0},
                         gpb.Dataset(X, label=y), num_boost_round=1)
        np.testing.assert_allclose(preds[0.0], base.predict(X), rtol=1e-6)
        assert np.var(preds[50.0]) < np.var(preds[0.0])
        assert np.var(preds[1e7]) < 1e-3 * np.var(preds[0.0])


class TestPredContribEFB:
    def test_shap_rows_sum_with_bundles(self):
        """pred_contrib under EFB: SHAP runs in bundled space and decodes to
        the active member; rows still sum to the raw prediction."""
        rng = np.random.RandomState(12)
        n = 1500
        dense = rng.randn(n, 2)
        s1 = np.where(rng.rand(n) < 0.3, rng.randn(n), 0.0)
        s2 = np.where((rng.rand(n) < 0.3) & (s1 == 0.0), rng.randn(n), 0.0)
        X = np.column_stack([dense, s1, s2])
        y = X[:, 0] + 2 * X[:, 2] - X[:, 3] + 0.1 * rng.randn(n)
        import gpboost_tpu as gpb
        ds = gpb.Dataset(X, label=y, params={"enable_bundle": True})
        bst = gpb.train({"objective": "regression", "num_leaves": 15,
                         "verbose": 0}, ds, num_boost_round=10)
        if not getattr(ds, "bundles", None):
            import pytest
            pytest.skip("EFB did not bundle on this data")
        phi = bst.predict(X[:200], pred_contrib=True)
        raw = bst.predict(X[:200], raw_score=True)
        assert phi.shape == (200, X.shape[1] + 1)
        np.testing.assert_allclose(phi.sum(axis=1), raw, rtol=1e-5,
                                   atol=1e-7)


class TestSklearnMulticlass:
    def test_classifier_multiclass(self):
        rng = np.random.RandomState(13)
        n = 900
        X = rng.randn(n, 4)
        y = np.array(["a", "b", "c"])[
            np.argmax(np.column_stack(
                [X[:, 0], X[:, 1], 0.5 * X[:, 2]]), axis=1)]
        import gpboost_tpu as gpb
        clf = gpb.GPBoostClassifier(n_estimators=20, num_leaves=15)
        clf.fit(X, y)
        assert clf.n_classes_ == 3
        proba = clf.predict_proba(X)
        assert proba.shape == (n, 3)
        np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-6)
        acc = np.mean(clf.predict(X) == y)
        assert acc > 0.85, acc


class TestCEGB:
    """Cost-effective gradient boosting
    (cost_effective_gradient_boosting.hpp): split gains penalized by
    tradeoff * penalty_split * n_leaf and a once-per-model coupled
    per-feature cost."""

    def _data(self):
        rng = np.random.RandomState(13)
        n = 1500
        X = rng.rand(n, 4)
        # feature 0 is strong, feature 1 is a slightly weaker copy
        X[:, 1] = X[:, 0] + 0.05 * rng.randn(n)
        y = 2.0 * X[:, 0] + 0.2 * rng.randn(n)
        return X, y

    def test_coupled_penalty_steers_feature_choice(self):
        from gpboost_tpu import Dataset, train
        X, y = self._data()
        params = {"objective": "regression", "num_leaves": 7, "verbose": 0}
        b0 = train(dict(params), Dataset(X, label=y), num_boost_round=5)
        # a large coupled penalty on feature 0 pushes splits to feature 1
        b1 = train(dict(params, cegb_penalty_feature_coupled=[1e6, 0, 0, 0]),
                   Dataset(X, label=y), num_boost_round=5)
        used0 = {int(f) for t in b0.trees
                 for i, f in enumerate(t.split_feature[:t.num_nodes])
                 if not t.is_leaf[i]}
        used1 = {int(f) for t in b1.trees
                 for i, f in enumerate(t.split_feature[:t.num_nodes])
                 if not t.is_leaf[i]}
        assert 0 in used0
        assert 0 not in used1 and 1 in used1

    def test_coupled_penalty_paid_once_per_model(self):
        from gpboost_tpu import Dataset, train
        X, y = self._data()
        # a modest penalty: worth paying once for the dominant feature,
        # after which feature 0 splits are free again
        b = train({"objective": "regression", "num_leaves": 7, "verbose": 0,
                   "cegb_penalty_feature_coupled": [50.0, 1e6, 1e6, 1e6]},
                  Dataset(X, label=y), num_boost_round=4)
        used = [int(f) for t in b.trees
                for i, f in enumerate(t.split_feature[:t.num_nodes])
                if not t.is_leaf[i]]
        assert set(used) == {0}
        assert len(used) > 1     # feature 0 reused after the one-time cost

    def test_lazy_penalty_zero_is_noop(self):
        from gpboost_tpu import Dataset, train
        X, y = self._data()
        params = {"objective": "regression", "num_leaves": 7, "verbose": 0}
        b0 = train(dict(params), Dataset(X, label=y), num_boost_round=3)
        b1 = train(dict(params, cegb_penalty_feature_lazy=[0, 0, 0, 0]),
                   Dataset(X, label=y), num_boost_round=3)
        np.testing.assert_allclose(b0.predict(X), b1.predict(X), atol=1e-7)

    def test_lazy_penalty_steers_feature_choice(self):
        from gpboost_tpu import Dataset, train
        X, y = self._data()
        params = {"objective": "regression", "num_leaves": 7, "verbose": 0}
        # a large per-row acquisition cost on feature 0 pushes splits to the
        # slightly weaker copy (feature 1)
        b1 = train(dict(params, cegb_penalty_feature_lazy=[1e6, 0, 0, 0]),
                   Dataset(X, label=y), num_boost_round=5)
        used1 = {int(f) for t in b1.trees
                 for i, f in enumerate(t.split_feature[:t.num_nodes])
                 if not t.is_leaf[i]}
        assert 0 not in used1 and 1 in used1

    def test_lazy_penalty_amortizes_across_trees(self):
        from gpboost_tpu import Dataset, train
        X, y = self._data()
        # feature 0's per-row cost is worth paying at the root (all rows):
        # once its rows have acquired it, later trees split it for free while
        # the other features stay prohibitively expensive
        b = train({"objective": "regression", "num_leaves": 4, "verbose": 0,
                   "cegb_tradeoff": 1.0,
                   "cegb_penalty_feature_lazy": [0.001, 1e6, 1e6, 1e6]},
                  Dataset(X, label=y), num_boost_round=4)
        used = [int(f) for t in b.trees
                for i, f in enumerate(t.split_feature[:t.num_nodes])
                if not t.is_leaf[i]]
        assert set(used) == {0}
        assert len(used) > 1

    def test_split_penalty_prunes(self):
        from gpboost_tpu import Dataset, train
        X, y = self._data()
        params = {"objective": "regression", "num_leaves": 31, "verbose": 0}
        b0 = train(dict(params), Dataset(X, label=y), num_boost_round=2)
        b1 = train(dict(params, cegb_penalty_split=10.0),
                   Dataset(X, label=y), num_boost_round=2)
        n_splits = lambda bb: sum(int((~t.is_leaf[:t.num_nodes]).sum())
                                  for t in bb.trees)
        assert n_splits(b1) < n_splits(b0)


class TestExtraTrees:
    """config.h extra_trees: one uniformly random split threshold per
    feature per node (feature_histogram.hpp USE_RAND)."""

    def test_learns_but_differs_from_exact_search(self):
        from gpboost_tpu import Dataset, train
        rng = np.random.RandomState(21)
        n = 2000
        X = rng.rand(n, 5)
        y = 2 * X[:, 0] + np.sin(5 * X[:, 1]) + 0.2 * rng.randn(n)
        params = {"objective": "regression", "num_leaves": 15,
                  "learning_rate": 0.2, "verbose": 0}
        b0 = train(dict(params), Dataset(X, label=y), num_boost_round=20)
        b1 = train(dict(params, extra_trees=True), Dataset(X, label=y),
                   num_boost_round=20)
        p0 = np.asarray(b0.predict(X[:500]))
        p1 = np.asarray(b1.predict(X[:500]))
        # the randomized trees differ from the exact search...
        assert np.max(np.abs(p0 - p1)) > 1e-6
        # ...but still fit the signal
        r2 = 1 - np.var(y[:500] - p1) / np.var(y[:500])
        assert r2 > 0.7

    def test_deterministic_given_seed(self):
        from gpboost_tpu import Dataset, train
        rng = np.random.RandomState(22)
        X = rng.rand(800, 4)
        y = X[:, 0] + 0.1 * rng.randn(800)
        params = {"objective": "regression", "num_leaves": 7, "verbose": 0,
                  "extra_trees": True, "extra_seed": 11}
        p1 = train(dict(params), Dataset(X, label=y),
                   num_boost_round=4).predict(X[:100])
        p2 = train(dict(params), Dataset(X, label=y),
                   num_boost_round=4).predict(X[:100])
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))
        p3 = train(dict(params, extra_seed=12), Dataset(X, label=y),
                   num_boost_round=4).predict(X[:100])
        assert np.max(np.abs(np.asarray(p1) - np.asarray(p3))) > 1e-9


class TestForcedSplits:
    """forcedsplits_filename (serial_tree_learner.cpp:453 ForceSplits):
    the JSON-specified splits are applied before any gain-based split."""

    def test_forced_structure_respected(self, tmp_path):
        import json
        from gpboost_tpu import Dataset, train
        rng = np.random.RandomState(31)
        n = 1500
        X = rng.rand(n, 4)
        y = 2 * X[:, 0] + 0.2 * rng.randn(n)    # feature 0 dominates
        fs = {"feature": 3, "threshold": 0.5,
              "left": {"feature": 2, "threshold": 0.25}}
        fpath = tmp_path / "forced.json"
        fpath.write_text(json.dumps(fs))
        bst = train({"objective": "regression", "num_leaves": 7,
                     "verbose": 0, "forcedsplits_filename": str(fpath)},
                    Dataset(X, label=y), num_boost_round=2)
        for t in bst.trees:
            # root split must be on feature 3 (never gain-chosen: y has no
            # dependence on it), its left child on feature 2
            assert int(t.split_feature[0]) == 3
            assert abs(t.threshold_real[0] - 0.5) < 0.02
            left = int(t.left[0])
            assert not t.is_leaf[left]
            assert int(t.split_feature[left]) == 2

    def test_growth_continues_gain_based_after_forced(self, tmp_path):
        import json
        from gpboost_tpu import Dataset, train
        rng = np.random.RandomState(32)
        X = rng.rand(1200, 3)
        y = 3 * X[:, 0] + 0.1 * rng.randn(1200)
        fpath = tmp_path / "forced.json"
        fpath.write_text(json.dumps({"feature": 1, "threshold": 0.5}))
        bst = train({"objective": "regression", "num_leaves": 15,
                     "verbose": 0, "forcedsplits_filename": str(fpath)},
                    Dataset(X, label=y), num_boost_round=12)
        used = {int(f) for t in bst.trees
                for i, f in enumerate(t.split_feature[:t.num_nodes])
                if not t.is_leaf[i]}
        assert 1 in used and 0 in used
        pred = np.asarray(bst.predict(X[:300]))
        r2 = 1 - np.var(y[:300] - pred) / np.var(y[:300])
        assert r2 > 0.7


class TestInteractionConstraints:
    """config.h interaction_constraints (col_sampler.hpp
    SetUsedFeatureByNode): every branch may only combine features from a
    single constraint set; features outside all sets are never used."""

    @staticmethod
    def _branch_feature_sets(tree):
        """Feature sets of all root->leaf paths."""
        sets = []

        def walk(node, path):
            if tree.is_leaf[node]:
                sets.append(frozenset(path))
                return
            f = int(tree.split_feature[node])
            walk(int(tree.left[node]), path | {f})
            walk(int(tree.right[node]), path | {f})

        walk(0, frozenset())
        return sets

    def test_branches_stay_within_one_set(self):
        from gpboost_tpu import Dataset, train
        rng = np.random.RandomState(41)
        n = 2000
        X = rng.rand(n, 5)
        # y depends on interactions across all features so unconstrained
        # trees would freely mix them
        y = (2 * X[:, 0] * X[:, 3] + X[:, 1] + X[:, 2] * X[:, 4]
             + 0.1 * rng.randn(n))
        groups = [[0, 1], [2, 3], [4]]
        bst = train({"objective": "regression", "num_leaves": 15,
                     "verbose": 0, "interaction_constraints": groups},
                    Dataset(X, label=y), num_boost_round=10)
        gsets = [frozenset(g) for g in groups]
        n_splits = 0
        for t in bst.trees:
            for s in self._branch_feature_sets(t):
                n_splits += len(s)
                assert any(s <= g for g in gsets), \
                    f"branch features {sorted(s)} span constraint sets"
        assert n_splits > 0

    def test_string_form_and_excluded_feature(self):
        from gpboost_tpu import Dataset, train
        rng = np.random.RandomState(42)
        n = 1500
        X = rng.rand(n, 4)
        # feature 3 is the strongest signal but is in no constraint set
        y = 5 * X[:, 3] + X[:, 0] + 0.1 * rng.randn(n)
        bst = train({"objective": "regression", "num_leaves": 7,
                     "verbose": 0,
                     "interaction_constraints": "[0,1],[1,2]"},
                    Dataset(X, label=y), num_boost_round=5)
        used = {int(f) for t in bst.trees
                for i, f in enumerate(t.split_feature[:t.num_nodes])
                if not t.is_leaf[i]}
        assert 3 not in used
        assert used <= {0, 1, 2}

    def test_single_set_matches_feature_subset(self):
        """One constraint set == training on only those columns."""
        from gpboost_tpu import Dataset, train
        rng = np.random.RandomState(43)
        n = 1200
        X = rng.rand(n, 4)
        y = 2 * X[:, 0] + X[:, 1] + 0.2 * rng.randn(n)
        params = {"objective": "regression", "num_leaves": 15,
                  "verbose": 0, "min_data_in_leaf": 20}
        b1 = train(dict(params, interaction_constraints=[[0, 1]]),
                   Dataset(X, label=y), num_boost_round=6)
        b2 = train(params, Dataset(X[:, :2], label=y), num_boost_round=6)
        p1 = np.asarray(b1.predict(X[:200]))
        p2 = np.asarray(b2.predict(X[:200, :2]))
        np.testing.assert_allclose(p1, p2, rtol=1e-6, atol=1e-6)


class TestPredEarlyStop:
    """Prediction early stopping (src/LightGBM/prediction_early_stop.cpp)."""

    def test_binary_early_stop_matches_when_margin_huge(self):
        rng = np.random.RandomState(11)
        X = rng.randn(400, 5)
        y = (X[:, 0] + 0.3 * rng.randn(400) > 0).astype(float)
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"objective": "binary", "num_leaves": 7,
                         "verbose": 0}, ds, num_boost_round=30)
        base = bst.predict(X)
        es = bst.predict(X, pred_early_stop=True,
                         pred_early_stop_margin=1e10)
        np.testing.assert_allclose(es, base, rtol=0, atol=0)

    def test_binary_early_stop_keeps_decisions(self):
        rng = np.random.RandomState(12)
        X = rng.randn(600, 5)
        y = (X[:, 0] + 0.1 * rng.randn(600) > 0).astype(float)
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"objective": "binary", "num_leaves": 15,
                         "learning_rate": 0.3, "verbose": 0},
                        ds, num_boost_round=60)
        base = bst.predict(X)
        es = bst.predict(X, pred_early_stop=True, pred_early_stop_freq=5,
                         pred_early_stop_margin=4.0)
        # rows that stopped early have |raw| >= 4 -> prob saturated; the
        # predicted CLASS must agree everywhere
        np.testing.assert_array_equal(es > 0.5, base > 0.5)
        # and saturated rows stay saturated
        assert np.all(np.abs(es - base) < 0.02)

    def test_multiclass_early_stop_keeps_decisions(self):
        rng = np.random.RandomState(13)
        n = 600
        X = rng.randn(n, 4)
        y = np.argmax(X[:, :3] + 0.1 * rng.randn(n, 3), axis=1).astype(float)
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"objective": "multiclass", "num_class": 3,
                         "num_leaves": 15, "learning_rate": 0.3,
                         "verbose": 0}, ds, num_boost_round=40)
        base = bst.predict(X)
        es = bst.predict(X, pred_early_stop=True, pred_early_stop_freq=5,
                         pred_early_stop_margin=3.0)
        np.testing.assert_array_equal(np.argmax(es, 1), np.argmax(base, 1))


class TestRegressionObjectiveFamily:
    """The remaining LightGBM regression objectives: l1 (MAE), huber, fair,
    mape, tweedie (src/LightGBM/objective/regression_objective.hpp:300-868)
    + their metrics (src/LightGBM/metric/regression_metric.hpp)."""

    def _xy(self, seed=21, n=800):
        rng = np.random.RandomState(seed)
        X = rng.randn(n, 5)
        y = 2.0 * X[:, 0] + X[:, 1] + 0.3 * rng.randn(n)
        return X, y

    def test_l1_boost_from_median_and_fit(self):
        X, y = self._xy()
        y = y + 10.0          # shift so mean != median matters
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"objective": "regression_l1", "num_leaves": 15,
                         "learning_rate": 0.2, "verbose": 0},
                        ds, num_boost_round=60)
        assert abs(bst.init_score - float(np.median(y))) < 1e-8
        mae = float(np.mean(np.abs(y - bst.predict(X))))
        assert mae < 0.4 * float(np.mean(np.abs(y - np.median(y))))

    @pytest.mark.parametrize("obj", ["huber", "fair"])
    def test_huber_fair_fit(self, obj):
        X, y = self._xy(seed=22)
        # a few gross outliers: robust losses must still recover the signal
        y[::97] += 50.0
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"objective": obj, "num_leaves": 15,
                         "learning_rate": 0.2, "verbose": 0},
                        ds, num_boost_round=80)
        clean = np.ones(len(y), dtype=bool)
        clean[::97] = False
        resid = y[clean] - bst.predict(X)[clean]
        assert float(np.median(np.abs(resid))) < 0.5

    def test_mape_fit_and_metric(self):
        rng = np.random.RandomState(23)
        X = rng.randn(600, 4)
        y = np.exp(0.5 * X[:, 0]) * 10.0
        ds = gpb.Dataset(X, label=y)
        ev = {}
        bst = gpb.train({"objective": "mape", "num_leaves": 15,
                         "learning_rate": 0.2, "verbose": 0,
                         "metric": "mape"}, ds, num_boost_round=80,
                        valid_sets=[gpb.Dataset(X, label=y)],
                        evals_result=ev)
        mape = float(np.mean(np.abs(y - bst.predict(X))
                             / np.maximum(1.0, np.abs(y))))
        mape0 = float(np.mean(np.abs(y - bst.init_score)
                              / np.maximum(1.0, np.abs(y))))
        assert mape < 0.55 * mape0
        hist = ev["valid_0"]["mape"]
        assert hist[-1] < hist[0]

    def test_tweedie_fit_response_scale(self):
        rng = np.random.RandomState(24)
        n = 1200
        X = rng.randn(n, 4)
        mu = np.exp(0.8 * X[:, 0])
        # zero-inflated positive outcome, Tweedie-ish
        y = np.where(rng.uniform(size=n) < 0.4, 0.0,
                     rng.gamma(2.0, mu / 2.0))
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"objective": "tweedie",
                         "tweedie_variance_power": 1.5, "num_leaves": 15,
                         "learning_rate": 0.1, "verbose": 0},
                        ds, num_boost_round=60)
        pred = bst.predict(X)
        assert np.all(pred > 0)               # exp ConvertOutput
        assert abs(bst.init_score - np.log(np.mean(y))) < 1e-8
        # predictions track the conditional mean (monotone in X0)
        order = np.argsort(X[:, 0])
        lo = pred[order[: n // 4]].mean()
        hi = pred[order[-n // 4:]].mean()
        assert hi > 2.0 * lo
        raw = bst.predict(X, raw_score=True)
        np.testing.assert_allclose(np.exp(raw), pred, rtol=1e-12)

    @pytest.mark.parametrize("obj", ["huber", "fair", "tweedie"])
    def test_fused_scan_matches_host_loop(self, obj):
        """can_train_scanned covers the new objectives: fused-scan rounds
        must equal the per-round host loop."""
        X, y = self._xy(seed=25, n=640)
        if obj == "tweedie":
            y = np.abs(y)
        params = {"objective": obj, "num_leaves": 7, "learning_rate": 0.2,
                  "verbose": 0}
        ds = gpb.Dataset(X, label=y)
        bst_scan = gpb.train(params, ds, num_boost_round=10)   # fused scan
        assert bst_scan.can_train_scanned()
        from gpboost_tpu.boosting.gbdt import Booster
        bst_host = Booster(params=params, train_set=gpb.Dataset(X, label=y))
        for _ in range(10):                                    # host loop
            bst_host.update()
        np.testing.assert_allclose(bst_scan.predict(X, raw_score=True),
                                   bst_host.predict(X, raw_score=True),
                                   rtol=1e-6, atol=1e-8)

    def test_l1_renews_leaves_to_residual_median(self):
        """RenewTreeOutput (regression_objective.hpp:351): after one tree,
        each leaf's (unshrunk) output is the median of its residuals."""
        X, y = self._xy(seed=26, n=500)
        ds = gpb.Dataset(X, label=y)
        lr = 0.3
        bst = gpb.train({"objective": "l1", "num_leaves": 7,
                         "learning_rate": lr, "verbose": 0},
                        ds, num_boost_round=1)
        assert not bst.can_train_scanned()
        tree = bst.trees[0]
        resid = y - bst.init_score
        node = tree.leaf_index_raw(np.asarray(X))
        for leaf in np.unique(node):
            med = np.percentile(resid[node == leaf], 50.0)
            np.testing.assert_allclose(tree.leaf_value[leaf], lr * med,
                                       rtol=1e-10)

    def test_quantile_renews_leaves_to_alpha_percentile(self):
        X, y = self._xy(seed=27, n=500)
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"objective": "quantile", "alpha": 0.8,
                         "num_leaves": 7, "learning_rate": 1.0,
                         "verbose": 0}, ds, num_boost_round=1)
        tree = bst.trees[0]
        resid = y - bst.init_score
        node = tree.leaf_index_raw(np.asarray(X))
        for leaf in np.unique(node):
            q = np.percentile(resid[node == leaf], 80.0)
            np.testing.assert_allclose(tree.leaf_value[leaf], q, rtol=1e-10)


class TestBinaryObjectiveOptions:
    """LightGBM binary-objective options: sigmoid scaling, is_unbalance /
    scale_pos_weight class re-weighting (binary_objective.hpp:27-33,
    :91-160) and the weighted cross_entropy_lambda objective
    (xentropy_objective.hpp:153-265)."""

    def _xy(self, seed=31, n=900, pos_frac=0.15):
        rng = np.random.RandomState(seed)
        X = rng.randn(n, 5)
        eta = X[:, 0] + 0.5 * X[:, 1] + np.log(pos_frac / (1 - pos_frac))
        y = (rng.uniform(size=n) < 1 / (1 + np.exp(-eta))).astype(float)
        return X, y

    def test_plain_binary_unchanged(self):
        X, y = self._xy()
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"objective": "binary", "num_leaves": 7,
                         "verbose": 0}, ds, num_boost_round=5)
        assert bst.objective_name == "bernoulli_logit"

    def test_scale_pos_weight_raises_positive_probabilities(self):
        X, y = self._xy()
        preds = {}
        for spw in (1.0, 5.0):
            ds = gpb.Dataset(X, label=y)
            bst = gpb.train({"objective": "binary", "num_leaves": 7,
                             "scale_pos_weight": spw, "verbose": 0},
                            ds, num_boost_round=30)
            if spw != 1.0:
                assert bst.objective_name == "binary_lgb"
            preds[spw] = bst.predict(X)
        # up-weighting positives must raise predicted probabilities overall
        assert preds[5.0].mean() > preds[1.0].mean() + 0.05

    def test_is_unbalance_conflicts_with_scale_pos_weight(self):
        X, y = self._xy()
        ds = gpb.Dataset(X, label=y)
        with pytest.raises(ValueError):
            gpb.train({"objective": "binary", "is_unbalance": True,
                       "scale_pos_weight": 3.0, "verbose": 0},
                      ds, num_boost_round=2)

    def test_is_unbalance_equals_explicit_ratio(self):
        X, y = self._xy(seed=32)
        npos = float(y.sum())
        nneg = float(len(y) - npos)
        p1 = {"objective": "binary", "num_leaves": 7, "verbose": 0,
              "is_unbalance": True}
        p2 = {"objective": "binary", "num_leaves": 7, "verbose": 0,
              "scale_pos_weight": nneg / npos}
        preds = []
        for p in (p1, p2):
            bst = gpb.train(p, gpb.Dataset(X, label=y), num_boost_round=10)
            preds.append(bst.predict(X))
        np.testing.assert_allclose(preds[0], preds[1], rtol=1e-10)

    def test_sigmoid_scaling(self):
        X, y = self._xy(seed=33)
        ds = gpb.Dataset(X, label=y)
        sig = 2.5
        bst = gpb.train({"objective": "binary", "sigmoid": sig,
                         "num_leaves": 7, "verbose": 0},
                        ds, num_boost_round=20)
        raw = bst.predict(X, raw_score=True)
        prob = bst.predict(X)
        np.testing.assert_allclose(prob, 1 / (1 + np.exp(-sig * raw)),
                                   rtol=1e-12)
        # boost-from-average divides by sigmoid
        pavg = y.mean()
        assert abs(bst.init_score
                   - np.log(pavg / (1 - pavg)) / sig) < 1e-10

    def test_xentlambda_unweighted_matches_xentropy(self):
        X, y = self._xy(seed=34)
        preds = []
        for obj in ("cross_entropy", "xentlambda"):
            bst = gpb.train({"objective": obj, "num_leaves": 7,
                             "verbose": 0}, gpb.Dataset(X, label=y),
                            num_boost_round=10)
            preds.append(bst.predict(X, raw_score=True))
        # same loss once weights are unity; trees differ slightly because
        # the init-score formulas differ (logit vs log(exp(havg)-1)), which
        # perturbs every later split
        r0 = preds[0] - preds[0].mean()
        r1 = preds[1] - preds[1].mean()
        assert np.corrcoef(r0, r1)[0, 1] > 0.98

    def test_xentlambda_weighted_output_is_lambda(self):
        rng = np.random.RandomState(35)
        X, y = self._xy(seed=35)
        w = rng.uniform(0.5, 2.0, size=len(y))
        ds = gpb.Dataset(X, label=y, weight=w)
        bst = gpb.train({"objective": "xentlambda", "num_leaves": 7,
                         "verbose": 0}, ds, num_boost_round=40)
        lam = bst.predict(X)
        assert np.all(lam > 0)          # log1p(exp(F)) > 0
        raw = bst.predict(X, raw_score=True)
        np.testing.assert_allclose(lam, np.log1p(np.exp(raw)), rtol=1e-12)
        # prob(z) = 1-(1-z)^w must track the labels
        z = 1 / (1 + np.exp(-raw))
        prob = 1 - (1 - z) ** w
        auc_num = np.mean(prob[y == 1][:, None] > prob[y == 0][None, :])
        assert auc_num > 0.75

    def test_binary_lgb_fused_scan_matches_host_loop(self):
        X, y = self._xy(seed=36)
        params = {"objective": "binary", "scale_pos_weight": 3.0,
                  "num_leaves": 7, "verbose": 0}
        bst_scan = gpb.train(params, gpb.Dataset(X, label=y),
                             num_boost_round=10)
        assert bst_scan.can_train_scanned()
        from gpboost_tpu.boosting.gbdt import Booster
        bst_host = Booster(params=params,
                           train_set=gpb.Dataset(X, label=y))
        for _ in range(10):
            bst_host.update()
        np.testing.assert_allclose(bst_scan.predict(X, raw_score=True),
                                   bst_host.predict(X, raw_score=True),
                                   rtol=1e-6, atol=1e-8)

    def test_pred_early_stop_engages_for_binary(self):
        """The early-stop margin loop must actually trigger (the alias is
        bernoulli_logit, not 'binary')."""
        X, y = self._xy(seed=37)
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"objective": "binary", "num_leaves": 15,
                         "learning_rate": 0.3, "verbose": 0},
                        ds, num_boost_round=60)
        base = bst.predict(X)
        es = bst.predict(X, pred_early_stop=True, pred_early_stop_freq=2,
                         pred_early_stop_margin=3.0)
        assert not np.allclose(es, base)     # some rows stopped early
        # early stopping is approximate (a stopped row could still have
        # flipped later); at margin 3 (prob 0.95) flips must be rare
        agree = np.mean((es > 0.5) == (base > 0.5))
        assert agree > 0.99


class TestPredictionAndInitOptions:
    """pred_leaf, boost_from_average, refit_decay_rate
    (basic.py predict pred_leaf; config.h boost_from_average,
    refit_decay_rate)."""

    def test_pred_leaf_shapes_and_consistency(self):
        rng = np.random.RandomState(51)
        X = rng.randn(300, 4)
        y = X[:, 0] + 0.1 * rng.randn(300)
        bst = gpb.train({"objective": "regression", "num_leaves": 7,
                         "verbose": 0}, gpb.Dataset(X, label=y),
                        num_boost_round=5)
        leaves = bst.predict(X, pred_leaf=True)
        assert leaves.shape == (300, 5)
        assert leaves.dtype == np.int32
        # rows landing in the same leaf of tree 0 share its contribution
        t0 = bst.trees[0]
        for leaf in np.unique(leaves[:, 0]):
            assert t0.is_leaf[leaf]

    def test_pred_leaf_multiclass_interleaved(self):
        rng = np.random.RandomState(52)
        X = rng.randn(300, 4)
        y = (X[:, 0] > 0).astype(float) + (X[:, 1] > 0)
        bst = gpb.train({"objective": "multiclass", "num_class": 3,
                         "num_leaves": 7, "verbose": 0},
                        gpb.Dataset(X, label=y), num_boost_round=4)
        leaves = bst.predict(X, pred_leaf=True)
        assert leaves.shape == (300, 12)       # 4 iterations x 3 classes

    def test_boost_from_average_false(self):
        rng = np.random.RandomState(53)
        X = rng.randn(300, 3)
        y = X[:, 0] + 5.0
        bst = gpb.train({"objective": "regression", "num_leaves": 7,
                         "boost_from_average": False, "verbose": 0},
                        gpb.Dataset(X, label=y), num_boost_round=2)
        assert bst.init_score == 0.0
        bst2 = gpb.train({"objective": "regression", "num_leaves": 7,
                          "verbose": 0}, gpb.Dataset(X, label=y),
                         num_boost_round=2)
        assert abs(bst2.init_score - 5.0) < 0.5

    def test_refit_decay_rate_param(self):
        rng = np.random.RandomState(54)
        X = rng.randn(400, 3)
        y = X[:, 0] + 0.1 * rng.randn(400)
        bst = gpb.train({"objective": "regression", "num_leaves": 7,
                         "refit_decay_rate": 0.0, "verbose": 0},
                        gpb.Dataset(X, label=y), num_boost_round=5)
        X2 = rng.randn(400, 3)
        y2 = -X2[:, 0] + 0.1 * rng.randn(400)
        rf_param = bst.refit(X2, y2)             # uses refit_decay_rate=0.0
        rf_explicit = bst.refit(X2, y2, decay_rate=0.0)
        np.testing.assert_allclose(rf_param.predict(X2),
                                   rf_explicit.predict(X2))
        rf_09 = bst.refit(X2, y2, decay_rate=0.9)
        assert not np.allclose(rf_param.predict(X2), rf_09.predict(X2))


class TestCategoricalRegularization:
    """Categorical-split regularization (config.h cat_smooth, cat_l2,
    max_cat_threshold, min_data_per_group; feature_histogram.hpp:376-443)."""

    def _cat_xy(self, seed=61, n=1500, ncat=10):
        rng = np.random.RandomState(seed)
        cat = rng.randint(0, ncat, n).astype(float)
        effect = np.linspace(-2, 2, ncat)
        X = np.column_stack([cat, rng.rand(n)])
        y = effect[cat.astype(int)] + 0.2 * rng.randn(n)
        return X, y, rng

    def test_min_data_per_group_blocks_cat_splits(self):
        X, y, _ = self._cat_xy()
        ds = gpb.Dataset(X, label=y, categorical_feature=[0])
        bst = gpb.train({"objective": "regression", "num_leaves": 7,
                         "min_data_per_group": 10**9, "verbose": 0},
                        ds, num_boost_round=3)
        # no categorical split can satisfy the group minimum
        for t in bst.trees:
            for i in range(t.num_nodes):
                if not t.is_leaf[i]:
                    assert int(t.split_feature[i]) != 0

    def test_max_cat_threshold_limits_split_set(self):
        """Every categorical split must put at most max_cat_threshold
        categories on its SHORTER side, counted among the categories
        actually present (and participating) in that node."""
        X, y, _ = self._cat_xy(ncat=10)
        ds = gpb.Dataset(X, label=y, categorical_feature=[0])
        bst = gpb.train({"objective": "regression", "num_leaves": 4,
                         "max_cat_threshold": 1, "min_data_per_group": 1,
                         "cat_smooth": 1.0, "verbose": 0},
                        ds, num_boost_round=2)
        found = False
        for t in bst.trees:
            # route training rows down the tree, checking each cat split
            node_rows = {0: np.arange(len(X))}
            for i in range(t.num_nodes):
                if t.is_leaf[i] or i not in node_rows:
                    continue
                rows = node_rows[i]
                f = int(t.split_feature[i])
                cl = t.cat_left_values.get(i)
                if cl is not None:
                    vals = X[rows, f]
                    go_left = np.isin(vals, np.asarray(cl))
                    n_left_cats = len(np.unique(vals[go_left]))
                    n_right_cats = len(np.unique(vals[~go_left]))
                    assert min(n_left_cats, n_right_cats) <= 1
                    found = True
                else:
                    go_left = X[rows, f] <= t.threshold_real[i]
                node_rows[int(t.left[i])] = rows[go_left]
                node_rows[int(t.right[i])] = rows[~go_left]
        assert found

    def test_cat_smooth_filters_rare_categories(self):
        """Categories with fewer than cat_smooth rows cannot enter the left
        split set (they sort after all participants)."""
        rng = np.random.RandomState(62)
        n = 1200
        cat = rng.randint(0, 5, n).astype(float)
        rare = rng.choice(n, size=5, replace=False)
        cat[rare] = 5.0                       # category 5: only 5 rows
        effect = np.array([-2.0, -1, 0, 1, 2, 50.0])
        X = np.column_stack([cat, rng.rand(n)])
        y = effect[cat.astype(int)] + 0.2 * rng.randn(n)
        ds = gpb.Dataset(X, label=y, categorical_feature=[0])
        bst = gpb.train({"objective": "regression", "num_leaves": 4,
                         "cat_smooth": 10.0, "min_data_per_group": 1,
                         "verbose": 0}, ds, num_boost_round=1)
        t = bst.trees[0]
        for i in range(t.num_nodes):
            if not t.is_leaf[i] and int(t.split_feature[i]) == 0:
                cats_left = t.cat_left_values.get(i)
                if cats_left is not None:
                    # the rare (huge-effect) category must not be isolated
                    # on the left despite its extreme mean
                    assert 5 not in [int(c) for c in cats_left] \
                        or len(cats_left) > 1

    def test_cat_l2_reduces_cat_gains(self):
        X, y, _ = self._cat_xy(seed=63)
        gains = {}
        for cl2 in (0.0, 1e6):
            ds = gpb.Dataset(X, label=y, categorical_feature=[0])
            bst = gpb.train({"objective": "regression", "num_leaves": 4,
                             "cat_l2": cl2, "min_data_per_group": 1,
                             "verbose": 0}, ds, num_boost_round=1)
            imp = bst.feature_importance(importance_type="gain")
            gains[cl2] = imp[0]
        assert gains[1e6] < gains[0.0]
