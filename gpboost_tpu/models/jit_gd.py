"""Whole-optimizer-on-device: the Gaussian gradient-descent loop as ONE jit.

Used by the boosting engine's per-iteration covariance refits (GPBoost
algorithm): the reference re-runs its host optimizer every boosting iteration
(regression_objective.hpp:153-201 OptimCovPar) with warm-started learning rates
(config.h:181 reuse_learning_rates_gp_model). Here the whole warm-started
Nesterov-GD loop — profiling out the nugget, Armijo backtracking with permanent
learning-rate halving, relative-ll convergence — compiles to a single program,
so one boosting round costs one device call for the GP update instead of
dozens of host round-trips.

Semantics mirror models/optimize.py `_optimize_internal` (gradient_descent
branch, no covariates, all parameters estimated).
"""

from ..ops.jit_utils import lifted_jit
import math
from functools import partial

import jax
import jax.numpy as jnp

LR_SHRINK = 0.5
C_ARMIJO = 1e-4
C_ARMIJO_MOM = 1e-4
MAX_SHRINK_STEPS = 30
MAX_LOG_STEP = math.log(100.0)


def gd_fit_engine(engine, cov_pars_init, y, lr0=0.1, max_iter=50, delta=1e-6):
    """Run the on-device GD loop on any Gaussian engine exposing
    nll_parts_raw / prep_y_gd. Returns (cov_pars_orig, nll, lr, n_it).

    Host<->device traffic is bundled: args go in through the jit call itself
    and all outputs come back in one device_get (remote-runtime round-trips
    for small transfers are the dominant cost otherwise)."""
    import numpy as np
    if not hasattr(engine, "_jit_gd"):
        engine._jit_gd = make_jitted_gd(engine.nll_parts_raw, engine.n)
    t = engine.transform_pars(np.asarray(cov_pars_init, dtype=np.float64))
    ydata = engine.prep_y_gd(y)
    out = engine._jit_gd(np.log(t), ydata, float(lr0), int(max_iter),
                         float(delta))
    u, nll, lr, it = jax.device_get(out)
    pars = engine.back_transform_pars(np.exp(np.asarray(u, dtype=np.float64)))
    return pars, float(nll), float(lr), int(it)


def make_jitted_gd(nll_parts_raw, n, momentum_offset=2, acc_rate0=0.5):
    """Build fit(u0, y, lr0, max_iter, delta) -> (u, nll, lr, n_it).

    nll_parts_raw(theta_log, sigma2, y) -> (nll, quad) must be pure jax.
    u = log([sigma2, theta...]) on the engine's internal transformed scale.
    """

    def nll_theta(theta_log, sigma2, y):
        return nll_parts_raw(theta_log, sigma2, y)[0]

    vag = jax.value_and_grad(nll_theta)

    @lifted_jit
    def fit(u0, y, lr0, max_iter, delta):
        nll0, quad0 = nll_parts_raw(u0[1:], jnp.exp(u0[0]), y)

        def body(carry):
            u, nll, quad, lr, th_ag_lag1, it, done = carry
            sigma2 = quad / n                       # ProfileOutSigma2
            _, g = vag(u[1:], sigma2, y)
            max_abs = jnp.max(jnp.abs(g))
            lr = jnp.minimum(lr, MAX_LOG_STEP / jnp.maximum(max_abs, 1e-300))
            dir_deriv = -(g @ g)
            mom_dd = g @ (u[1:] - th_ag_lag1)

            def bt_cond(bt):
                _, _, ok, ih, *_ = bt
                return jnp.logical_and(~ok, ih < MAX_SHRINK_STEPS)

            def bt_body(bt):
                lr_l, acc_r, _, ih, _, _, _, _ = bt
                th_grad = u[1:] - lr_l * g
                mu = jnp.where(it >= momentum_offset, acc_r, 0.0)
                th_acc = (1.0 + mu) * th_grad - mu * th_ag_lag1
                nll_new, quad_new = nll_parts_raw(th_acc, sigma2, y)
                bound = nll + C_ARMIJO * lr_l * dir_deriv \
                    + C_ARMIJO_MOM * mu * mom_dd
                ok = jnp.logical_and(nll_new <= bound, jnp.isfinite(nll_new))
                return (jnp.where(ok, lr_l, lr_l * LR_SHRINK),
                        jnp.where(ok, acc_r, acc_r * 0.5),
                        ok, ih + 1, th_grad, th_acc, nll_new, quad_new)

            p = u.shape[0] - 1
            bt0 = (lr, acc_rate0, False, 0,
                   jnp.zeros(p, u.dtype), jnp.zeros(p, u.dtype),
                   nll, quad)
            lr_l, _, _, _, th_grad, th_acc, nll_new, quad_new = \
                jax.lax.while_loop(bt_cond, bt_body, bt0)

            u_new = jnp.concatenate([jnp.log(sigma2)[None], th_acc])
            conv = (nll - nll_new) <= delta * jnp.maximum(jnp.abs(nll), 1.0)
            bad = ~jnp.isfinite(nll_new)
            return (u_new, nll_new, quad_new, lr_l, th_grad, it + 1,
                    jnp.logical_or(conv, bad))

        def cond(carry):
            *_, it, done = carry
            return jnp.logical_and(~done, it < max_iter)

        carry0 = (u0, nll0, quad0, lr0, u0[1:], 0, False)
        u, nll, quad, lr, _, it, _ = jax.lax.while_loop(cond, body, carry0)
        # final profiling of the nugget (the last update used the lagged one)
        sigma2 = quad / n
        u = u.at[0].set(jnp.log(sigma2))
        return u, nll, lr, it

    return fit


def gd_fit_laplace_engine(engine, cov_pars_init, aux_init, y, F, a_init,
                          lr0=0.1, max_iter=50, delta=1e-6, est_aux=True):
    """Warm-started Nesterov-GD refit of a Laplace engine's (cov, aux)
    parameters as ONE device call — the non-Gaussian analogue of
    gd_fit_engine, used by the LaGaBoost per-round covariance refits
    (regression_objective.hpp:175-183 OptimCovPar given fixed effects).

    Returns (cov_pars_orig, aux_pars, nll, lr, n_it, mode_state)."""
    import numpy as np
    key = ("_jit_gd_lap", bool(est_aux))
    if getattr(engine, "_jit_gd_lap_key", None) != key:
        engine._jit_gd_lap = make_jitted_gd_laplace(
            engine._nll_raw, engine.num_theta, engine.num_aux, est_aux)
        engine._jit_gd_lap_key = key
    t = engine.transform_pars(np.asarray(cov_pars_init, dtype=np.float64))
    u = np.log(t)
    if engine.num_aux:
        aux_int = engine.likelihood.aux_to_internal(
            np.asarray(aux_init, dtype=np.float64))
        u = np.concatenate([u, np.log(aux_int)])
    Fd = jnp.asarray(F, engine.dtype)
    yd = jnp.asarray(y, engine.dtype)
    prep = getattr(engine, "_permute", None)
    if prep is not None:
        # Vecchia-Laplace engines evaluate _nll_raw in the Vecchia ordering
        # (models/vecchia_laplace.py "host-facing API permutes")
        Fd, yd = prep(Fd), prep(yd)
    out = engine._jit_gd_lap(jnp.asarray(u, engine.dtype), Fd, yd,
                             a_init, float(lr0), int(max_iter), float(delta))
    u_new, nll, lr, it, a_state = out
    u_new = np.asarray(jax.device_get(u_new), dtype=np.float64)
    pars = engine.back_transform_pars(np.exp(u_new[:engine.num_theta]))
    aux = None
    if engine.num_aux:
        aux = engine.likelihood.aux_from_internal(
            np.exp(u_new[engine.num_theta:]))
    return pars, aux, float(nll), float(lr), int(it), a_state


def make_jitted_gd_laplace(nll_raw, num_theta, num_aux, est_aux=True):
    """Build fit(u0, F, y, a0, lr0, max_iter, delta) for a Laplace nll of
    signature nll_raw(u, F, y, a_init) -> (nll, (a, nit)).

    Mirrors models/optimize.py `_optimize_laplace_gd` (no covariates):
    Nesterov momentum (offset 2, acc rate 0.5), Armijo backtracking with
    permanent learning-rate halving, relative-nll convergence. Aux-parameter
    coordinates are frozen when est_aux=False."""

    vag = jax.value_and_grad(nll_raw, argnums=0, has_aux=True)
    p = num_theta + num_aux
    if est_aux:
        mask = jnp.ones(p)
    else:
        mask = jnp.concatenate([jnp.ones(num_theta), jnp.zeros(num_aux)])

    @lifted_jit
    def fit(u0, F, y, a0, lr0, max_iter, delta):
        nll0, (a0_, _) = nll_raw(u0, F, y, a0)

        def body(carry):
            u, nll, a, lr, u_ag_lag1, it, done = carry
            (nll_c, (a_c, _)), g = vag(u, F, y, a)
            g = g * mask
            max_abs = jnp.max(jnp.abs(g))
            lr = jnp.minimum(lr, MAX_LOG_STEP / jnp.maximum(max_abs, 1e-300))
            dir_deriv = -(g @ g)
            mom_dd = g @ (u - u_ag_lag1)

            def bt_cond(bt):
                _, _, ok, ih, *_ = bt
                return jnp.logical_and(~ok, ih < MAX_SHRINK_STEPS)

            def bt_body(bt):
                lr_l, acc_r, _, ih, _, _, _, _ = bt
                u_grad = u - lr_l * g
                mu = jnp.where(it >= 2, acc_r, 0.0)
                u_acc = (1.0 + mu) * u_grad - mu * u_ag_lag1
                nll_new, (a_new, _) = nll_raw(u_acc, F, y, a_c)
                bound = nll + C_ARMIJO * lr_l * dir_deriv \
                    + C_ARMIJO_MOM * mu * mom_dd
                ok = jnp.logical_and(nll_new <= bound, jnp.isfinite(nll_new))
                return (jnp.where(ok, lr_l, lr_l * LR_SHRINK),
                        jnp.where(ok, acc_r, acc_r * 0.5),
                        ok, ih + 1, u_grad, u_acc, nll_new, a_new)

            bt0 = (lr, 0.5, False, 0, jnp.zeros_like(u), jnp.zeros_like(u),
                   nll, a_c)
            lr_l, _, _, _, u_grad, u_acc, nll_new, a_new = \
                jax.lax.while_loop(bt_cond, bt_body, bt0)

            conv = (nll - nll_new) <= delta * jnp.maximum(jnp.abs(nll), 1.0)
            bad = ~jnp.isfinite(nll_new)
            return (u_acc, nll_new, a_new, lr_l, u_grad, it + 1,
                    jnp.logical_or(conv, bad))

        def cond(carry):
            *_, it, done = carry
            return jnp.logical_and(~done, it < max_iter)

        carry0 = (u0, nll0, a0_, lr0, u0, 0, False)
        u, nll, a, lr, _, it, _ = jax.lax.while_loop(cond, body, carry0)
        return u, nll, lr, it, a

    return fit
