"""Lossless model persistence: GPModel save/load round trips (aux pars,
std errors, approximation settings) and the combined booster+GP file.

Reference: basic.py:6927 model_to_dict / :7003 save_model; combined file with
"has_gp_model": 1 (basic.py:2451-2515); R-side save/load round-trip asserts
in test_GPModel_gaussian_process.R:2641-2712.
"""

import json
import os
import tempfile

import numpy as np
import pytest

import gpboost_tpu as gpb


@pytest.fixture(scope="module")
def spatial_pois():
    rng = np.random.RandomState(0)
    n = 200
    coords = rng.rand(n, 2)
    D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    lat = np.linalg.cholesky(np.exp(-D / 0.2) + 1e-8 * np.eye(n)) \
        @ rng.randn(n)
    y = rng.poisson(np.exp(0.3 + lat)).astype(float)
    return dict(coords=coords, y=y, pred=rng.rand(5, 2))


def _tmpfile():
    fd, fn = tempfile.mkstemp(suffix=".json")
    os.close(fd)
    return fn


class TestGPModelRoundTrip:
    def test_gaussian_with_stderr(self, spatial_pois):
        d = spatial_pois
        yg = np.log1p(d["y"]) + 0.1
        m = gpb.fitGPModel(gp_coords=d["coords"], cov_function="exponential",
                           y=yg, params={"std_dev": True})
        fn = _tmpfile()
        m.save_model(fn)
        m2 = gpb.GPModel(model_file=fn)
        np.testing.assert_allclose(m2.get_cov_pars(std_err=False),
                                   m.get_cov_pars(std_err=False))
        np.testing.assert_allclose(
            np.asarray(m2.get_cov_pars(std_err=True)),
            np.asarray(m.get_cov_pars(std_err=True)))
        p1 = m.predict(gp_coords_pred=d["pred"], predict_var=True)
        p2 = m2.predict(gp_coords_pred=d["pred"], predict_var=True)
        np.testing.assert_allclose(p2["mu"], p1["mu"], rtol=1e-10)
        np.testing.assert_allclose(p2["var"], p1["var"], rtol=1e-10)
        os.unlink(fn)

    def test_vecchia_nongaussian_aux(self, spatial_pois):
        d = spatial_pois
        ygam = d["y"] + 0.5
        m = gpb.fitGPModel(gp_coords=d["coords"], cov_function="exponential",
                           likelihood="gamma", gp_approx="vecchia",
                           num_neighbors=30, vecchia_ordering="none",
                           y=ygam, params={"maxit": 20})
        fn = _tmpfile()
        m.save_model(fn)
        m2 = gpb.GPModel(model_file=fn)
        # approximation settings survive
        assert m2.gp_approx == "vecchia"
        assert m2.num_neighbors == 30
        assert m2.vecchia_ordering == "none"
        # aux pars survive
        r1, r2 = m._fit_result, m2._fit_result
        if r1.aux_pars is not None:
            np.testing.assert_allclose(r2.aux_pars, r1.aux_pars)
        p1 = m.predict(gp_coords_pred=d["pred"], predict_var=True,
                       predict_response=True)
        p2 = m2.predict(gp_coords_pred=d["pred"], predict_var=True,
                        predict_response=True)
        np.testing.assert_allclose(p2["mu"], p1["mu"], rtol=1e-8)
        np.testing.assert_allclose(p2["var"], p1["var"], rtol=1e-8)
        os.unlink(fn)

    def test_weights_survive(self, spatial_pois):
        d = spatial_pois
        yg = np.log1p(d["y"])
        w = np.linspace(0.5, 2.0, len(yg))
        m = gpb.fitGPModel(gp_coords=d["coords"], cov_function="exponential",
                           y=yg, weights=w)
        fn = _tmpfile()
        m.save_model(fn)
        m2 = gpb.GPModel(model_file=fn)
        np.testing.assert_allclose(m2.weights, w)
        os.unlink(fn)


class TestCombinedBoosterGP:
    def test_round_trip(self, spatial_pois):
        d = spatial_pois
        rng = np.random.RandomState(1)
        X = rng.rand(len(d["y"]), 3)
        yg = np.log1p(d["y"]) + X[:, 0]
        gp_model = gpb.GPModel(gp_coords=d["coords"],
                               cov_function="exponential")
        ds = gpb.Dataset(X, label=yg)
        bst = gpb.train({"objective": "regression", "num_leaves": 7,
                         "min_data_in_leaf": 5, "verbose": 0},
                        ds, num_boost_round=5, gp_model=gp_model)
        fn = _tmpfile()
        bst.save_model(fn)
        with open(fn) as f:
            blob = json.load(f)
        assert blob["has_gp_model"] == 1
        bst2 = gpb.Booster(model_file=fn)
        Xp = rng.rand(4, 3)
        p1 = bst.predict(Xp, gp_coords_pred=d["pred"][:4])
        p2 = bst2.predict(Xp, gp_coords_pred=d["pred"][:4])
        np.testing.assert_allclose(p2["response_mean"], p1["response_mean"],
                                   rtol=1e-10)
        os.unlink(fn)

    def test_save_with_num_iteration(self, spatial_pois):
        """gpb.save(num_iteration=...) slice semantics
        (test_z_GPBoost_algorithm.R:1526)."""
        d = spatial_pois
        rng = np.random.RandomState(2)
        X = rng.rand(len(d["y"]), 3)
        yg = np.log1p(d["y"]) + X[:, 0]
        ds = gpb.Dataset(X, label=yg)
        bst = gpb.train({"verbose": 0, "num_leaves": 7,
                         "min_data_in_leaf": 5}, ds, num_boost_round=8)
        fn = _tmpfile()
        bst.save_model(fn, num_iteration=5)
        bst2 = gpb.Booster(model_file=fn)
        assert bst2.num_trees() == 5
        np.testing.assert_allclose(bst2.predict(X[:10]),
                                   bst.predict(X[:10], num_iteration=5),
                                   rtol=1e-12)
        os.unlink(fn)


class TestLogger:
    def test_register_logger(self):
        msgs = []

        class L:
            def info(self, m):
                msgs.append(("i", m))

            def warning(self, m):
                msgs.append(("w", m))

        gpb.register_logger(L())
        try:
            gpb.Log.info("hello")
            gpb.Log.warning("careful")
            gpb.set_log_level("warning")
            gpb.Log.info("suppressed")
        finally:
            gpb.register_logger(None)
            gpb.set_log_level("info")
        assert ("i", "[GPBoost] [Info] hello") in msgs
        assert ("w", "[GPBoost] [Warning] careful") in msgs
        assert all("suppressed" not in m for _, m in msgs)

    def test_fatal_raises(self):
        with pytest.raises(RuntimeError):
            gpb.Log.fatal("boom")

    def test_summary_routed(self, spatial_pois):
        d = spatial_pois
        yg = np.log1p(d["y"])
        m = gpb.fitGPModel(gp_coords=d["coords"], cov_function="exponential",
                           y=yg)
        msgs = []

        class L:
            def info(self, m_):
                msgs.append(m_)

            def warning(self, m_):
                msgs.append(m_)

        gpb.register_logger(L())
        try:
            m.summary()
        finally:
            gpb.register_logger(None)
        assert any("Covariance parameters" in m_ for m_ in msgs)


class TestPosteriorSampling:
    """sample_posterior / sample_prior (basic.py:6191, likelihoods.h:8784
    Sample_Posterior_LaplaceApprox_*)."""

    def test_nongaussian_posterior_samples_match_moments(self, spatial_pois):
        d = spatial_pois
        m = gpb.fitGPModel(gp_coords=d["coords"], cov_function="exponential",
                           likelihood="poisson", y=d["y"],
                           params={"maxit": 20})
        p = m.predict(gp_coords_pred=d["pred"], sample_posterior=True,
                      num_post_samples=4000, predict_response=False, seed=1)
        assert p["posterior_samples"].shape == (5, 4000)
        np.testing.assert_allclose(p["posterior_samples"].mean(1), p["mu"],
                                   atol=0.05)
        pv = m.predict(gp_coords_pred=d["pred"], predict_var=True,
                       predict_response=False)
        np.testing.assert_allclose(p["posterior_samples"].var(1), pv["var"],
                                   rtol=0.15)

    def test_prior_samples(self, spatial_pois):
        d = spatial_pois
        yg = np.log1p(d["y"])
        m = gpb.fitGPModel(gp_coords=d["coords"], cov_function="exponential",
                           y=yg)
        p = m.predict(gp_coords_pred=d["pred"], sample_prior=True,
                      num_prior_samples=2000, predict_response=False, seed=2)
        assert p["prior_samples"].shape == (5, 2000)
        # prior variance ~= GP variance
        v = np.asarray(m.get_cov_pars())[1]
        np.testing.assert_allclose(p["prior_samples"].var(1),
                                   np.full(5, v), rtol=0.2)


class TestSpecialObjectiveRoundTrip:
    """Save/load for objectives with dedicated (non-likelihood-registry)
    formulas: multiclass, quantile, tweedie, binary_lgb, mean-scale.
    Loading these used to crash in get_likelihood()."""

    def _round_trip(self, bst, X):
        import tempfile
        import os
        fn = tempfile.mktemp(suffix=".json")
        bst.save_model(fn)
        b2 = gpb.Booster(model_file=fn)
        os.unlink(fn)
        return b2.predict(X)

    def test_multiclass(self):
        rng = np.random.RandomState(41)
        n = 600
        X = rng.randn(n, 4)
        y = np.argmax(X[:, :3] + 0.1 * rng.randn(n, 3), axis=1).astype(float)
        bst = gpb.train({"objective": "multiclass", "num_class": 3,
                         "num_leaves": 7, "verbose": 0},
                        gpb.Dataset(X, label=y), num_boost_round=8)
        p = bst.predict(X)
        np.testing.assert_allclose(self._round_trip(bst, X), p)

    def test_quantile(self):
        rng = np.random.RandomState(42)
        X = rng.randn(400, 3)
        y = X[:, 0] + 0.3 * rng.randn(400)
        bst = gpb.train({"objective": "quantile", "alpha": 0.8,
                         "num_leaves": 7, "verbose": 0},
                        gpb.Dataset(X, label=y), num_boost_round=8)
        np.testing.assert_allclose(self._round_trip(bst, X),
                                   bst.predict(X))

    def test_tweedie_response_scale_survives(self):
        rng = np.random.RandomState(43)
        X = rng.randn(400, 3)
        y = np.abs(X[:, 0]) + 0.1
        bst = gpb.train({"objective": "tweedie", "num_leaves": 7,
                         "verbose": 0}, gpb.Dataset(X, label=y),
                        num_boost_round=8)
        p = bst.predict(X)
        assert np.all(p > 0)
        np.testing.assert_allclose(self._round_trip(bst, X), p)

    def test_binary_lgb_sigmoid_survives(self):
        rng = np.random.RandomState(44)
        X = rng.randn(400, 3)
        y = (X[:, 0] > 0).astype(float)
        bst = gpb.train({"objective": "binary", "sigmoid": 2.0,
                         "num_leaves": 7, "verbose": 0},
                        gpb.Dataset(X, label=y), num_boost_round=8)
        assert bst.objective_name == "binary_lgb"
        np.testing.assert_allclose(self._round_trip(bst, X),
                                   bst.predict(X))

    def test_mean_scale(self):
        rng = np.random.RandomState(45)
        X = rng.randn(500, 3)
        y = X[:, 0] + np.exp(0.3 * X[:, 1]) * rng.randn(500)
        bst = gpb.train({"objective": "mean_scale_regression",
                         "num_leaves": 7, "verbose": 0},
                        gpb.Dataset(X, label=y), num_boost_round=8)
        p = bst.predict(X)
        p2 = self._round_trip(bst, X)
        np.testing.assert_allclose(p2["pred_mean"], p["pred_mean"])
        np.testing.assert_allclose(p2["pred_var"], p["pred_var"])
