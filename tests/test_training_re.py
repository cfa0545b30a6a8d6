"""predict_training_data_random_effects: per-component training-point REs
(reference: basic.py:6780, re_model_template.h:4420)."""

import numpy as np
import pytest

import gpboost_tpu as gpb


@pytest.fixture(scope="module")
def grouped_fit():
    rng = np.random.RandomState(0)
    n, m = 500, 30
    group = rng.randint(0, m, n)
    y = 0.8 * rng.randn(m)[group] + 0.5 * rng.randn(n)
    model = gpb.fitGPModel(group_data=group, y=y)
    return model, group, y


class TestGaussian:
    def test_grouped_matches_predict(self, grouped_fit):
        """Column must equal predict()'s posterior mean at the same levels."""
        model, group, y = grouped_fit
        df = model.predict_training_data_random_effects(predict_var=True)
        assert df.shape == (len(y), 2)
        pred = model.predict(group_data_pred=group, y=y, predict_var=True,
                             predict_response=False)
        assert np.allclose(df.iloc[:, 0].values, pred["mu"], atol=1e-8)
        # training-point RE variance excludes the nugget
        assert np.allclose(df.iloc[:, 1].values, pred["var"], atol=1e-8)

    def test_constant_within_group(self, grouped_fit):
        model, group, _ = grouped_fit
        df = model.predict_training_data_random_effects()
        re = df.iloc[:, 0].values
        for g in np.unique(group):
            assert np.ptp(re[group == g]) < 1e-12

    def test_woodbury_vs_dense(self):
        """Grouped (Woodbury) and a dense GP+group model agree on the grouped
        column."""
        rng = np.random.RandomState(1)
        n, m = 200, 10
        group = rng.randint(0, m, n)
        y = rng.randn(m)[group] + 0.5 * rng.randn(n)
        mw = gpb.fitGPModel(group_data=group, y=y)
        # dense path: same model via gp_coords trick is overkill; instead use
        # two grouped comps to force the dense-capable engine? Woodbury covers
        # multi-comp too — compare against explicit posterior algebra instead.
        df = mw.predict_training_data_random_effects(predict_var=True)
        s2, v = mw.get_cov_pars()
        Z = np.zeros((n, m))
        Z[np.arange(n), group] = 1.0
        A = Z.T @ Z + (s2 / v) * np.eye(m)
        bhat = np.linalg.solve(A, Z.T @ y)
        assert np.allclose(df.iloc[:, 0].values, bhat[group], atol=1e-8)
        var_b = s2 * np.diagonal(np.linalg.inv(A))
        assert np.allclose(df.iloc[:, 1].values, var_b[group], atol=1e-8)

    def test_gp_matches_predict_at_training_points(self):
        rng = np.random.RandomState(2)
        n = 150
        coords = rng.rand(n, 2)
        y = np.sin(4 * coords[:, 0]) + 0.4 * rng.randn(n)
        model = gpb.fitGPModel(gp_coords=coords, cov_function="exponential",
                               y=y, params={"optimizer_cov": "lbfgs"})
        df = model.predict_training_data_random_effects(predict_var=True)
        pred = model.predict(gp_coords_pred=coords, y=y, predict_var=True,
                             predict_response=False)
        assert np.allclose(df.iloc[:, 0].values, pred["mu"], atol=1e-6)
        assert np.allclose(df.iloc[:, 1].values, pred["var"], atol=1e-6)

    def test_vecchia_exact_at_full_neighbors(self):
        rng = np.random.RandomState(3)
        n = 120
        coords = rng.rand(n, 2)
        y = np.sin(4 * coords[:, 0]) + 0.4 * rng.randn(n)
        md = gpb.fitGPModel(gp_coords=coords, y=y,
                            params={"optimizer_cov": "lbfgs"})
        mv = gpb.GPModel(gp_coords=coords, gp_approx="vecchia",
                         num_neighbors=n - 1, vecchia_ordering="none")
        mv.fit(y=y, params={"optimizer_cov": "lbfgs"})
        rd = md.predict_training_data_random_effects().iloc[:, 0].values
        rv = mv.predict_training_data_random_effects().iloc[:, 0].values
        assert np.allclose(rd, rv, atol=1e-4)
        with pytest.raises(ValueError):
            mv.predict_training_data_random_effects(predict_var=True)

    def test_random_slope_reports_latent(self):
        """Random-coefficient column = the slope itself (constant within
        group), not slope * covariate."""
        rng = np.random.RandomState(4)
        n, m = 400, 20
        group = rng.randint(0, m, n)
        x = rng.rand(n)
        y = rng.randn(m)[group] + x * (0.7 * rng.randn(m))[group] \
            + 0.4 * rng.randn(n)
        model = gpb.fitGPModel(group_data=group, group_rand_coef_data=x,
                               ind_effect_group_rand_coef=[1], y=y)
        df = model.predict_training_data_random_effects()
        assert df.shape[1] == 2
        slope = df.iloc[:, 1].values
        for g in np.unique(group):
            assert np.ptp(slope[group == g]) < 1e-10

    def test_covariates_use_residuals(self):
        rng = np.random.RandomState(5)
        n, m = 300, 15
        group = rng.randint(0, m, n)
        X = np.column_stack([np.ones(n), rng.rand(n)])
        y = X @ [1.0, 2.0] + rng.randn(m)[group] + 0.5 * rng.randn(n)
        model = gpb.fitGPModel(group_data=group, y=y, X=X)
        df = model.predict_training_data_random_effects()
        re = df.iloc[:, 0].values
        b_true = np.array([np.mean((y - X @ model.get_coef())[group == g])
                           for g in range(m)])
        # shrinkage: same sign, smaller magnitude, high correlation
        assert np.corrcoef(re, b_true[group])[0, 1] > 0.99


class TestNonGaussian:
    def test_bernoulli_grouped_matches_predict(self):
        rng = np.random.RandomState(6)
        n, m = 500, 25
        group = rng.randint(0, m, n)
        b = 1.0 * rng.randn(m)
        y = (rng.rand(n) < 1 / (1 + np.exp(-b[group]))).astype(float)
        model = gpb.fitGPModel(group_data=group, likelihood="bernoulli_logit",
                               y=y)
        df = model.predict_training_data_random_effects()
        pred = model.predict(group_data_pred=group, y=y,
                             predict_response=False)
        assert np.allclose(df.iloc[:, 0].values, pred["mu"], atol=1e-5)


class TestBooster:
    def test_gpboost_training_re(self):
        rng = np.random.RandomState(7)
        n, m = 400, 20
        X = rng.rand(n, 4)
        group = rng.randint(0, m, n)
        b = 0.8 * rng.randn(m)
        y = 2 * X[:, 0] + b[group] + 0.3 * rng.randn(n)
        gp = gpb.GPModel(group_data=group)
        bst = gpb.train({"learning_rate": 0.1, "num_leaves": 15},
                        gpb.Dataset(X, label=y), num_boost_round=30,
                        gp_model=gp)
        df = bst.predict_training_data_random_effects()
        re = df.iloc[:, 0].values
        first = np.array([np.where(group == g)[0][0] for g in range(m)])
        assert np.corrcoef(re[first], b)[0, 1] > 0.9

    def test_booster_without_gp_model_raises(self):
        rng = np.random.RandomState(8)
        X = rng.rand(100, 3)
        y = rng.randn(100)
        bst = gpb.train({"num_leaves": 7}, gpb.Dataset(X, label=y),
                        num_boost_round=2)
        with pytest.raises(ValueError):
            bst.predict_training_data_random_effects()
