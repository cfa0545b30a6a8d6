"""On-device L-BFGS: the whole optimizer loop as one jitted lax.while_loop.

TPU-first replacement for driving scipy's L-BFGS-B from the host: every
host-driven iteration costs a device round-trip (tens of ms on a remote
runtime), which dominates the n=100k Vecchia fit. Here the two-loop
recursion, backtracking line search, and convergence checks all live on
device; one dispatch runs the entire fit.

Reference semantics being replaced: OptimExternal driving LBFGSpp
(optim_utils.h:562-706) — same memory size (default m=20 there too), Armijo
backtracking line search, convergence on relative objective change.

History pairs that fail the curvature condition s'y > 0 are stored with
rho = 0 and masked out of the two-loop recursion (LBFGSpp skips them).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def lbfgs_run(vag, x0, max_iter, m=20, ftol=1e-16, gtol=1e-12, c1=1e-4,
              max_ls=30, has_aux=False):
    """Minimize via L-BFGS entirely on device.

    vag: x -> (f, g), a pure jax function (value and gradient); with
    has_aux=True, x -> (f, g, aux) and the aux of the final accepted
    iterate is returned too (so callers need no separate final-state
    evaluation — which would cost a second cold compile of the whole
    objective graph).
    max_iter may be a traced scalar (no recompile when it changes).
    Returns (x, f, num_iter, converged) or (x, f, aux, num_iter, converged).
    """
    d = x0.shape[0]
    dtype = x0.dtype
    raw_vag = vag
    if not has_aux:
        def vag(x):
            f, g = raw_vag(x)
            return f, g, jnp.zeros((), dtype)

    def keep(ok, new, old):
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), new, old)

    f0, g0, aux0 = vag(x0)
    S = jnp.zeros((m, d), dtype)
    Y = jnp.zeros((m, d), dtype)
    rho = jnp.zeros((m,), dtype)
    max_iter = jnp.asarray(max_iter, jnp.int32)

    def two_loop(g, S, Y, rho, gamma, k):
        """r = H_k g via the standard two-loop recursion (masked circular
        buffers, newest-to-oldest then oldest-to-newest)."""
        n_hist = jnp.minimum(k, m)

        def bw(i, carry):
            q, alphas = carry
            j = jnp.mod(k - 1 - i, m)
            valid = (i < n_hist) & (rho[j] > 0)
            a = rho[j] * jnp.dot(S[j], q)
            q = jnp.where(valid, q - a * Y[j], q)
            alphas = alphas.at[j].set(jnp.where(valid, a, 0.0))
            return q, alphas

        q, alphas = lax.fori_loop(0, m, bw, (g, jnp.zeros((m,), dtype)))
        r = gamma * q

        def fw(i, r):
            j = jnp.mod(k - n_hist + i, m)
            valid = (i < n_hist) & (rho[j] > 0)
            b = rho[j] * jnp.dot(Y[j], r)
            return jnp.where(valid, r + S[j] * (alphas[j] - b), r)

        return lax.fori_loop(0, m, fw, r)

    def line_search(x, f, g, aux, p):
        """Backtracking Armijo: halve until f(x+t p) <= f + c1 t g'p."""
        gp = jnp.dot(g, p)
        # fall back to steepest descent if p is not a descent direction
        bad = gp >= 0
        p = jnp.where(bad, -g, p)
        gp = jnp.where(bad, -jnp.dot(g, g), gp)

        def cond(c):
            i, done = c[4], c[5]
            return (~done) & (i < max_ls)

        def body(c):
            t, fn, xn, gn, i, _, auxn = c
            x_try = x + t * p
            f_try, g_try, aux_try = vag(x_try)
            ok = (f_try <= f + c1 * t * gp) & jnp.isfinite(f_try)
            t_next = jnp.where(ok, t, t * 0.5)
            return (t_next,
                    jnp.where(ok, f_try, fn),
                    jnp.where(ok, x_try, xn),
                    jnp.where(ok, g_try, gn),
                    i + 1, ok, keep(ok, aux_try, auxn))

        t0 = jnp.asarray(1.0, dtype)
        init = (t0, f, x, g, jnp.asarray(0, jnp.int32), jnp.asarray(False),
                aux)
        _, fn, xn, gn, _, ok, auxn = lax.while_loop(cond, body, init)
        return fn, xn, gn, auxn, ok

    def cond(state):
        k, done = state[6], state[7]
        return (~done) & (k < max_iter)

    def body(state):
        x, f, g, S, Y, rho, k, _, gamma, aux = state
        p = -two_loop(g, S, Y, rho, gamma, k)
        fn, xn, gn, auxn, ls_ok = line_search(x, f, g, aux, p)

        s = xn - x
        yv = gn - g
        sy = jnp.dot(s, yv)
        good = ls_ok & (sy > 1e-10 * jnp.linalg.norm(s) * jnp.linalg.norm(yv))
        j = jnp.mod(k, m)
        S = S.at[j].set(jnp.where(good, s, 0.0))
        Y = Y.at[j].set(jnp.where(good, yv, 0.0))
        rho = rho.at[j].set(jnp.where(good, 1.0 / jnp.where(good, sy, 1.0),
                                      0.0))
        gamma = jnp.where(good, sy / jnp.dot(yv, yv), gamma)

        done = ((f - fn) <= ftol * jnp.maximum(jnp.abs(f), 1.0)) \
            | (jnp.max(jnp.abs(gn)) <= gtol) | (~ls_ok)
        return xn, fn, gn, S, Y, rho, k + 1, done, gamma, auxn

    init = (x0, f0, g0, S, Y, rho, jnp.asarray(0, jnp.int32),
            jnp.asarray(False), jnp.asarray(1.0, dtype), aux0)
    x, f, g, _, _, _, k, done, _, aux = lax.while_loop(cond, body, init)
    if has_aux:
        return x, f, aux, k, done
    return x, f, k, done


def lbfgs_run_state(vag, x0, st0, max_iter, m=20, ftol=1e-16, gtol=1e-12,
                    c1=1e-4, max_ls=30, max_step=5.0):
    """L-BFGS with an auxiliary warm-start state threaded through every
    objective evaluation — the on-device analogue of the host loop's
    Laplace-mode carry-over (`state["a"]` in models/optimize.py
    `_optimize_laplace_external`; reference: mode warm starts across
    optimizer evaluations, likelihoods.h:3746-3752).

    vag: (x, st) -> (f, g, st_new), pure jax. st may be any pytree of
    arrays. The state from the most recent FINITE evaluation is carried
    forward (non-finite trials keep the previous state — the
    ResetLaplaceApproxModeToPreviousValue guard).

    Laplace marginal-likelihood surfaces can return plausible-looking
    finite values in numerically broken regions (mode finding diverged,
    W-curvature invalid), so unlike the Gaussian `lbfgs_run` this variant
    safeguards the step: the search direction's inf-norm is capped at
    `max_step` (parameters live on log scale — e^5 per coordinate per
    iteration is already enormous), the very first step is scaled to unit
    length (LBFGSpp's `step = 1/||d||` initialization), and the
    relative-objective convergence test only arms from the second
    iteration.
    Returns (x, f, st, num_iter, converged)."""
    d = x0.shape[0]
    dtype = x0.dtype

    def keep(fin, new, old):
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(fin, a, b), new, old)

    f0, g0, st1 = vag(x0, st0)
    st = keep(jnp.isfinite(f0), st1, st0)
    S = jnp.zeros((m, d), dtype)
    Y = jnp.zeros((m, d), dtype)
    rho = jnp.zeros((m,), dtype)
    max_iter = jnp.asarray(max_iter, jnp.int32)

    def two_loop(g, S, Y, rho, gamma, k):
        n_hist = jnp.minimum(k, m)

        def bw(i, carry):
            q, alphas = carry
            j = jnp.mod(k - 1 - i, m)
            valid = (i < n_hist) & (rho[j] > 0)
            a = rho[j] * jnp.dot(S[j], q)
            q = jnp.where(valid, q - a * Y[j], q)
            alphas = alphas.at[j].set(jnp.where(valid, a, 0.0))
            return q, alphas

        q, alphas = lax.fori_loop(0, m, bw, (g, jnp.zeros((m,), dtype)))
        r = gamma * q

        def fw(i, r):
            j = jnp.mod(k - n_hist + i, m)
            valid = (i < n_hist) & (rho[j] > 0)
            b = rho[j] * jnp.dot(Y[j], r)
            return jnp.where(valid, r + S[j] * (alphas[j] - b), r)

        return lax.fori_loop(0, m, fw, r)

    def line_search(x, f, g, p, st, t0):
        gp = jnp.dot(g, p)
        bad = gp >= 0
        p = jnp.where(bad, -g, p)
        gp = jnp.where(bad, -jnp.dot(g, g), gp)

        def cond(c):
            _, _, _, _, st_c, i, done = c
            return (~done) & (i < max_ls)

        def body(c):
            t, fn, xn, gn, st_c, i, _ = c
            # every trial warm-starts from the state of the last ACCEPTED
            # iterate (st), never from a rejected trial's state: a wild
            # trial point can leave a numerically-poisoned Laplace mode
            # that corrupts all subsequent evaluations
            x_try = x + t * p
            f_try, g_try, st_try = vag(x_try, st)
            fin = jnp.isfinite(f_try)
            ok = (f_try <= f + c1 * t * gp) & fin
            t_next = jnp.where(ok, t, t * 0.5)
            return (t_next,
                    jnp.where(ok, f_try, fn),
                    jnp.where(ok, x_try, xn),
                    keep(ok, g_try, gn),
                    keep(ok, st_try, st_c),
                    i + 1, ok)

        init = (t0, f, x, g, st, jnp.asarray(0, jnp.int32),
                jnp.asarray(False))
        _, fn, xn, gn, st, _, ok = lax.while_loop(cond, body, init)
        return fn, xn, gn, st, ok

    def cond(state):
        k, done = state[6], state[7]
        return (~done) & (k < max_iter)

    def body(state):
        x, f, g, S, Y, rho, k, _, gamma, st = state
        p = -two_loop(g, S, Y, rho, gamma, k)
        # step safeguards (see docstring): cap coordinate magnitude, unit
        # first step
        pn = jnp.max(jnp.abs(p))
        p = p * jnp.minimum(1.0, max_step / jnp.maximum(pn, 1e-300))
        t0 = jnp.where(k == 0,
                       1.0 / jnp.maximum(1.0, jnp.linalg.norm(p)),
                       1.0).astype(dtype)
        fn, xn, gn, st, ls_ok = line_search(x, f, g, p, st, t0)

        s = xn - x
        yv = gn - g
        sy = jnp.dot(s, yv)
        good = ls_ok & (sy > 1e-10 * jnp.linalg.norm(s) * jnp.linalg.norm(yv))
        j = jnp.mod(k, m)
        S = S.at[j].set(jnp.where(good, s, 0.0))
        Y = Y.at[j].set(jnp.where(good, yv, 0.0))
        rho = rho.at[j].set(jnp.where(good, 1.0 / jnp.where(good, sy, 1.0),
                                      0.0))
        gamma = jnp.where(good, sy / jnp.dot(yv, yv), gamma)

        done = ((k >= 1) & ((f - fn) <= ftol * jnp.maximum(jnp.abs(f), 1.0))) \
            | (jnp.max(jnp.abs(gn)) <= gtol) | (~ls_ok)
        return xn, fn, gn, S, Y, rho, k + 1, done, gamma, st

    init = (x0, f0, g0, S, Y, rho, jnp.asarray(0, jnp.int32),
            jnp.asarray(False), jnp.asarray(1.0, dtype), st)
    x, f, g, _, _, _, k, done, _, st = lax.while_loop(cond, body, init)
    return x, f, st, k, done
