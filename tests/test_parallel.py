"""Multi-device sharding tests (8 virtual CPU devices, see conftest)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpboost_tpu.parallel import make_mesh, make_sharded_grouped_lmm_step

pytestmark = pytest.mark.slow  # compile-heavy tier (pytest.ini)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_lmm_step_matches_single_device():
    q = 8
    n = 128
    rng = np.random.RandomState(0)
    codes = rng.randint(0, q, size=n)
    Z = np.zeros((n, q))
    Z[np.arange(n), codes] = 1.0
    y = Z @ rng.randn(q) + 0.5 * rng.randn(n)
    u0 = np.log([0.25, 4.0])

    step8 = make_sharded_grouped_lmm_step(make_mesh(8), q=q, lr=0.1)
    u8, nll8 = step8(jnp.asarray(u0), jnp.asarray(y), jnp.asarray(Z))

    step1 = make_sharded_grouped_lmm_step(make_mesh(1), q=q, lr=0.1)
    u1, nll1 = step1(jnp.asarray(u0), jnp.asarray(y), jnp.asarray(Z))

    assert np.allclose(np.asarray(u8), np.asarray(u1), atol=1e-10)
    assert abs(float(nll8) - float(nll1)) < 1e-8

    # and against the Woodbury engine's NLL at the same parameters
    from gpboost_tpu.models.components import GroupedComponent
    from gpboost_tpu.models.grouped_re import WoodburyGaussianEngine
    eng = WoodburyGaussianEngine([GroupedComponent(codes)], n)
    s2, vt = np.exp(u0)
    nll_ref = eng.neg_log_likelihood([s2, vt * s2], y)
    assert abs(float(nll8) - nll_ref) < 1e-8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_vecchia_step_matches_engine_nll():
    from gpboost_tpu.models.components import GPComponent
    from gpboost_tpu.ops.cov_fcts import CovarianceFunction
    from gpboost_tpu.models.vecchia import VecchiaGaussianEngine
    from gpboost_tpu.parallel import (make_mesh, make_sharded_vecchia_gd_step,
                                      shard_vecchia_inputs)
    rng = np.random.RandomState(0)
    n, m = 256, 8
    coords = rng.rand(n, 2)
    y = rng.randn(n)
    eng = VecchiaGaussianEngine(
        [GPComponent(coords, CovarianceFunction("exponential"))], n,
        num_neighbors=m, vecchia_ordering="none")
    d_nn, d_ni, mask, y_ord, y_nbr, rv, n_eff = shard_vecchia_inputs(eng, y, 8)
    step = make_sharded_vecchia_gd_step(
        make_mesh(8), eng.comp.cov_fn.corr_from_dist, n_eff, m, lr=0.1)
    u = jnp.asarray(np.log([1.0, 5.0]))
    _, nll_sharded = step(u, jnp.asarray(d_nn), jnp.asarray(d_ni),
                          jnp.asarray(mask), jnp.asarray(y_ord),
                          jnp.asarray(y_nbr), jnp.asarray(rv))
    # reference value: the engine's own profiled NLL at the same parameters
    (nll_ref, _), _ = eng.nll_profiled_vag(u, jnp.asarray(y_ord[:n]))
    assert abs(float(nll_sharded) - float(nll_ref)) < 1e-8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_graft_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


class TestProductDataParallel:
    """Data parallelism through the PRODUCT APIs (GPModel.fit / train),
    1-device vs 8-device equivalence on the virtual CPU mesh."""

    def test_gpmodel_vecchia_fit_sharded_matches(self):
        rng = np.random.RandomState(3)
        n = 512
        coords = rng.rand(n, 2)
        y = np.sin(5 * coords[:, 0]) + 0.5 * rng.randn(n)
        from gpboost_tpu import GPModel
        res = []
        for ndev in (1, 8):
            m = GPModel(gp_coords=coords, cov_function="exponential",
                        gp_approx="vecchia", num_neighbors=10,
                        vecchia_ordering="none",
                        num_parallel_devices=ndev if ndev > 1 else None)
            m.fit(y=y, params={"optimizer_cov": "lbfgs", "maxit": 20,
                               "init_cov_pars": [0.5, 1.0, 0.1],
                               "use_device_optimizer": True})
            res.append(m._fit_result)
        np.testing.assert_allclose(res[0].cov_pars, res[1].cov_pars,
                                   rtol=1e-5)
        assert abs(res[0].neg_log_likelihood
                   - res[1].neg_log_likelihood) < 1e-6

    def test_train_sharded_trees_match(self):
        rng = np.random.RandomState(5)
        n, p = 1000, 6
        X = rng.randn(n, p)
        y = X[:, 0] - 2.0 * X[:, 1] + 0.3 * rng.randn(n)
        from gpboost_tpu import Dataset, train
        preds = []
        for ndev in (1, 8):
            ds = Dataset(X, label=y)
            params = {"objective": "regression", "num_leaves": 15,
                      "verbose": 0}
            if ndev > 1:
                params["num_parallel_devices"] = ndev
            bst = train(params, ds, num_boost_round=5)
            preds.append(bst.predict(X))
            if ndev > 1:
                assert bst.learner.mesh is not None
        np.testing.assert_allclose(preds[0], preds[1], rtol=1e-5, atol=1e-7)


class TestFeatureParallel:
    def test_train_feature_sharded_trees_match(self):
        """Feature-parallel learner (feature_parallel_tree_learner.cpp:83
        analogue): the feature dimension of bins/histograms sharded over the
        mesh; 1-vs-8 device equivalence through train()."""
        rng = np.random.RandomState(6)
        n, p = 800, 40
        X = rng.randn(n, p)
        y = X[:, 0] - 2.0 * X[:, 1] + X[:, 20] * 0.5 + 0.3 * rng.randn(n)
        from gpboost_tpu import Dataset, train
        preds = []
        for ndev in (1, 8):
            ds = Dataset(X, label=y)
            params = {"objective": "regression", "num_leaves": 15,
                      "verbose": 0}
            if ndev > 1:
                params["num_parallel_devices"] = ndev
                params["tree_learner"] = "feature"
            bst = train(params, ds, num_boost_round=5)
            preds.append(bst.predict(X))
            if ndev > 1:
                assert bst.learner.mesh is not None
                assert bst.learner.parallel_mode == "feature"
        np.testing.assert_allclose(preds[0], preds[1], rtol=1e-5, atol=1e-7)

class TestVotingParallel:
    """PV-tree voting-parallel learner
    (voting_parallel_tree_learner.cpp:465 analogue)."""

    def test_voting_exact_when_all_features_selected(self):
        """With 2*top_k >= p every feature wins the vote, so voting must
        reproduce the serial learner's trees exactly."""
        rng = np.random.RandomState(7)
        n, p = 960, 6
        X = rng.randn(n, p)
        y = X[:, 0] - 2.0 * X[:, 1] + 0.5 * X[:, 3] + 0.3 * rng.randn(n)
        from gpboost_tpu import Dataset, train
        preds = []
        for ndev in (1, 8):
            ds = Dataset(X, label=y)
            params = {"objective": "regression", "num_leaves": 15,
                      "verbose": 0}
            if ndev > 1:
                params["num_parallel_devices"] = ndev
                params["tree_learner"] = "voting"
                params["top_k"] = p          # 2k >= p: exact
            bst = train(params, ds, num_boost_round=5)
            preds.append(bst.predict(X))
            if ndev > 1:
                assert bst.learner.mesh is not None
                assert bst.learner.parallel_mode == "voting"
        np.testing.assert_allclose(preds[0], preds[1], rtol=1e-5, atol=1e-7)

    def test_voting_approximate_small_top_k(self):
        """With a small top_k the vote bounds the merged feature set; the
        model is an approximation but must still learn the signal."""
        rng = np.random.RandomState(8)
        n, p = 1200, 30
        X = rng.randn(n, p)
        y = 2.0 * X[:, 0] + X[:, 7] + 0.1 * rng.randn(n)
        from gpboost_tpu import Dataset, train
        ds = Dataset(X, label=y)
        bst = train({"objective": "regression", "num_leaves": 15,
                     "verbose": 0, "num_parallel_devices": 8,
                     "tree_learner": "voting", "top_k": 3},
                    ds, num_boost_round=20)
        pred = bst.predict(X)
        resid = y - pred
        assert float(np.var(resid)) < 0.25 * float(np.var(y))

    def test_voting_rejects_categoricals(self):
        rng = np.random.RandomState(9)
        X = rng.randn(300, 4)
        X[:, 2] = rng.randint(0, 5, 300)
        y = X[:, 0] + 0.1 * rng.randn(300)
        from gpboost_tpu import Dataset, train
        import pytest as _pytest
        ds = Dataset(X, label=y, categorical_feature=[2])
        with _pytest.raises(NotImplementedError):
            train({"objective": "regression", "num_leaves": 7, "verbose": 0,
                   "num_parallel_devices": 8, "tree_learner": "voting"},
                  ds, num_boost_round=2)
