"""On-device Laplace L-BFGS (_optimize_laplace_device / lbfgs_run_state).

The whole non-Gaussian fit as one jitted dispatch must reproduce the
host-driven scipy path (reference: OptimExternal with LBFGSpp,
optim_utils.h:562-706; Laplace mode warm starts likelihoods.h:3746-3752,
mode reset re_model_template.h:2593). The grouped RE-scale engine is
validated here and auto-enables the device loop at n>=20000
(device_opt_auto); other engines require use_device_optimizer=True.
"""

import numpy as np
import pytest

import gpboost_tpu as gpb


def _glmm_data(seed=42, n=1500, q=40):
    rng = np.random.RandomState(seed)
    g = rng.randint(0, q, n)
    b = 0.8 * rng.normal(size=q)
    return rng, g, b


class TestDeviceLaplaceLBFGS:
    def test_bernoulli_grouped_matches_host(self):
        rng, g, b = _glmm_data()
        eta = 0.3 + b[g]
        y = (rng.uniform(size=len(g)) < 1 / (1 + np.exp(-eta))).astype(float)
        res = {}
        for dev in (False, True):
            m = gpb.GPModel(group_data=g, likelihood="bernoulli_logit")
            m.fit(y=y, params={"use_device_optimizer": dev})
            res[dev] = m
        nll_h = res[False]._fit_result.neg_log_likelihood
        nll_d = res[True]._fit_result.neg_log_likelihood
        assert abs(nll_d - nll_h) < 1e-3 * max(abs(nll_h), 1.0)
        np.testing.assert_allclose(res[True].get_cov_pars(),
                                   res[False].get_cov_pars(),
                                   rtol=0.02)
        # converged well before maxit (the round-3 bench ran all 50
        # host-side iterations; the device loop stops at delta_rel_conv)
        assert res[True]._fit_result.num_it < 40
        assert res[True]._fit_result.converged

    def test_covariates_matches_host(self):
        rng, g, b = _glmm_data(seed=7)
        n = len(g)
        X = np.c_[np.ones(n), rng.randn(n)]
        eta = X @ np.array([0.3, 0.5]) + b[g]
        y = (rng.uniform(size=n) < 1 / (1 + np.exp(-eta))).astype(float)
        res = {}
        for dev in (False, True):
            m = gpb.GPModel(group_data=g, likelihood="bernoulli_logit")
            m.fit(y=y, X=X, params={"use_device_optimizer": dev})
            res[dev] = m
        nll_h = res[False]._fit_result.neg_log_likelihood
        nll_d = res[True]._fit_result.neg_log_likelihood
        assert abs(nll_d - nll_h) < 1e-3 * max(abs(nll_h), 1.0)
        np.testing.assert_allclose(res[True].get_coef(),
                                   res[False].get_coef(),
                                   atol=0.02)

    def test_aux_pars_matches_host(self):
        """negative_binomial: aux (overdispersion) parameter estimated
        jointly — the safeguarded step cap must keep the device loop out of
        the numerically-broken large-aux region."""
        rng, g, b = _glmm_data(seed=11)
        y = rng.poisson(np.exp(0.1 + 0.5 * b[g])).astype(float)
        res = {}
        for dev in (False, True):
            m = gpb.GPModel(group_data=g, likelihood="negative_binomial")
            m.fit(y=y, params={"use_device_optimizer": dev})
            res[dev] = m
        nll_h = res[False]._fit_result.neg_log_likelihood
        nll_d = res[True]._fit_result.neg_log_likelihood
        assert abs(nll_d - nll_h) < 1e-3 * max(abs(nll_h), 1.0)
        np.testing.assert_allclose(res[True].get_cov_pars(),
                                   res[False].get_cov_pars(), rtol=0.02)

    def test_auto_gate_respects_engine_flag(self):
        """Auto-dispatch requires device_opt_auto on the engine; a Vecchia-
        Laplace model at large n must stay on the host path unless forced."""
        from gpboost_tpu.models.grouped_laplace import GroupedRELaplaceEngine
        assert GroupedRELaplaceEngine.device_opt_auto
        from gpboost_tpu.models.vecchia_laplace import VecchiaLaplaceEngine
        assert not getattr(VecchiaLaplaceEngine, "device_opt_auto", False)


class TestLbfgsRunState:
    def test_quadratic_with_state_counter(self):
        import jax.numpy as jnp
        from gpboost_tpu.ops.lbfgs import lbfgs_run_state

        A = jnp.asarray(np.diag([1.0, 4.0, 9.0]))
        bvec = jnp.asarray([1.0, -2.0, 3.0])

        def vag(x, st):
            f = 0.5 * x @ (A @ x) - bvec @ x
            return f, A @ x - bvec, st + 1

        x, f, st, k, done = lbfgs_run_state(
            vag, jnp.zeros(3), jnp.asarray(0), 100, ftol=1e-14)
        np.testing.assert_allclose(np.asarray(x),
                                   np.linalg.solve(np.diag([1., 4., 9.]),
                                                   [1., -2., 3.]),
                                   atol=1e-8)
        assert int(st) > 0          # state threaded through evaluations
        assert bool(done)

    def test_step_cap_limits_first_move(self):
        """A huge-gradient objective must not jump beyond max_step per
        coordinate in one iteration (the NaN-region safeguard)."""
        import jax.numpy as jnp
        from gpboost_tpu.ops.lbfgs import lbfgs_run_state

        seen = []

        def vag(x, st):
            # minimum far away at x=1000 with huge gradient scale
            return 1e6 * jnp.sum((x - 1000.0) ** 2), \
                2e6 * (x - 1000.0), st

        x, f, st, k, done = lbfgs_run_state(
            vag, jnp.zeros(2), jnp.asarray(0.0), 1)
        assert float(jnp.max(jnp.abs(x))) <= 5.0 + 1e-9
