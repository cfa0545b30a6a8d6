"""Laplace-approximation engine for non-Gaussian likelihoods (dense path).

Reference: likelihoods.h:2808 FindModePostRandEffCalcMLLStable (the numerically
stable Rasmussen & Williams formulation with the a = Sigma^-1 mode
parameterization), :4230 CalcGradNegMargLikelihoodLaplaceApproxStable,
:7253 PredictLaplaceApprox*, :9581 PredictResponse.

Approximate negative marginal log-likelihood:

    nll(theta, aux) = -[ -0.5 a' Sigma a + loglik(Sigma a + F) ]
                      + sum log diag chol(I + sqrt(W) Sigma sqrt(W)),
    a solves a = d1(Sigma a + F)    (mode condition; mode b = Sigma a)

Mode finding is a jitted lax.while_loop with Armijo backtracking (c=1e-4, max
20 halvings, delta_conv 1e-8 — likelihoods.h:17261-17277); the mode state a is
carried across optimizer iterations (warm start, mode_previous_value semantics).

Gradients wrt covariance parameters, auxiliary likelihood parameters and fixed
effects F come from ONE implicit-function-theorem custom_vjp around the solved
mode — replacing the reference's ~5k lines of per-structure handwritten
gradient code. The adjoint solve uses (I + Sigma W)^-1 = I - Sigma sqrt(W)
B^-1 sqrt(W) with B = I + sqrt(W) Sigma sqrt(W) (SPD, Cholesky).
"""

from ..ops.jit_utils import lifted_jit
import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .gaussian_gp import DenseSigmaAssembly

DELTA_CONV_MODE = 1e-8
MAXIT_MODE_NEWTON = 1000
MAX_LR_SHRINK_MODE = 20
C_ARMIJO = 1e-4


# ----------------------------------------------------------------------
# Cholesky-only operators for a possibly-negative diagonal W (zero-inflated
# counts with observed-Hessian curvature, likelihoods.h:11565). TPU f64 has
# no LU, and Sigma may be singular (grouped REs), so split W = W+ - W-:
#   B+ = I + sqrt(W+) Sigma sqrt(W+),  T = (I + Sigma W+)^-1 Sigma,
#   D = I - sqrt(W-) T sqrt(W-)
#   log|I + Sigma W| = log|B+| + log|D|
#   (I + Sigma W)^-1 = (I - T W-)^-1 (I + Sigma W+)^-1
#   (I + W Sigma)^-1 = (I + W+ Sigma)^-1 (I - W- T)^-1
# D is SPD exactly when Sigma^-1 + W is (true at any proper Laplace mode).
def _negw_factors(Sigma, W):
    n = Sigma.shape[0]
    sp = jnp.sqrt(jnp.maximum(W, 0.0))
    sm = jnp.sqrt(jnp.maximum(-W, 0.0))
    eye = jnp.eye(n, dtype=Sigma.dtype)
    Bp = eye + (sp[:, None] * Sigma) * sp[None, :]
    Lp = jnp.linalg.cholesky(Bp)
    SW = Sigma * sp[None, :]                  # Sigma sqrt(W+)
    T = Sigma - SW @ jsl.cho_solve((Lp, True), SW.T)
    Ld = jnp.linalg.cholesky(eye - (sm[:, None] * T) * sm[None, :])
    return Lp, Ld, SW, T, sp, sm


def _negw_scale(v, X):
    return v[:, None] * X if X.ndim == 2 else v * X


def _negw_solve_IpSW(factors, g):
    """(I + Sigma W)^-1 g for (n,) or (n, p) g."""
    Lp, Ld, SW, T, sp, sm = factors
    h = g - SW @ jsl.cho_solve((Lp, True), _negw_scale(sp, g))
    return h + T @ _negw_scale(sm, jsl.cho_solve((Ld, True),
                                                 _negw_scale(sm, h)))


def _negw_solve_IpWS(factors, rhs, Sigma):
    """(I + W Sigma)^-1 rhs for (n,) or (n, p) rhs."""
    Lp, Ld, SW, T, sp, sm = factors
    h = rhs + _negw_scale(sm, jsl.cho_solve((Ld, True),
                                            _negw_scale(sm, T @ rhs)))
    return h - _negw_scale(sp, jsl.cho_solve((Lp, True),
                                             _negw_scale(sp, Sigma @ h)))


@jax.custom_vjp
def _negw_half_logdet(Sigma, W):
    """0.5 log|I + Sigma W| for possibly-negative W. The sqrt(max(W,0))
    split is value-correct but not autodiff-safe at W = 0, so the exact
    gradients (0.5 diag((I+Sigma W)^-1 Sigma) wrt W) are supplied by a
    custom VJP."""
    Lp, Ld, _, _, _, _ = _negw_factors(Sigma, W)
    return (jnp.sum(jnp.log(jnp.diagonal(Lp)))
            + jnp.sum(jnp.log(jnp.diagonal(Ld))))


def _negw_hld_fwd(Sigma, W):
    return _negw_half_logdet(Sigma, W), (Sigma, W)


def _negw_hld_bwd(res, ct):
    Sigma, W = res
    n = Sigma.shape[0]
    factors = _negw_factors(Sigma, W)
    G = _negw_solve_IpSW(factors, jnp.eye(n, dtype=Sigma.dtype))
    # d logdet = tr(G dSigma W) + tr(G Sigma dW)
    dW = 0.5 * ct * jnp.diagonal(G @ Sigma)
    dSigma = 0.5 * ct * (G.T * W[None, :])
    return dSigma, dW


_negw_half_logdet.defvjp(_negw_hld_fwd, _negw_hld_bwd)


class LaplaceDenseEngine:
    """Laplace-approximated marginal NLL / gradients / prediction."""

    is_gaussian = False

    def __init__(self, components, num_data, likelihood, cluster_ids=None,
                 dtype=jnp.float64, weights=None):
        self.weights = None if weights is None else jnp.asarray(
            np.asarray(weights, dtype=np.float64), dtype)
        self._assembly = DenseSigmaAssembly(components, num_data,
                                            cluster_ids=cluster_ids, dtype=dtype)
        self.components = self._assembly.components
        self.n = self._assembly.n
        self.dtype = dtype
        self.likelihood = likelihood
        self.par_offsets = self._assembly.par_offsets
        self.num_theta = self._assembly.num_theta     # cov pars (no nugget)
        # num_sets_re = 2 (gaussian_heteroscedastic_fixed_and_random,
        # likelihoods.h:474-485): the SAME random-effects structure is
        # duplicated for the log-variance predictor with its own covariance
        # parameters; the mode vector is 2n-dim and Sigma block-diagonal
        self.num_sets_re = getattr(likelihood, "num_sets_re", 1)
        if self.num_sets_re == 2:
            self.num_theta *= 2
        self.dim_mode = self.n * self.num_sets_re
        self.num_cov_par = self.num_theta             # reference naming
        self.num_aux = likelihood.num_aux
        self.num_par = self.num_theta + self.num_aux
        self._build_jitted()

    # ------------------------------------------------------------------
    def _build_jitted(self):
        n = self.n
        lik = self.likelihood

        w = self.weights
        # two-predictor likelihoods (heteroscedastic / regression zero
        # models, c_api.cpp:132 num_sets_fixed_effects): F is (2n,) with the
        # random effects attached to the FIRST block only; the second block
        # (zeta) enters the per-sample density as an extra argument.
        # two_re (num_sets_re = 2): BOTH blocks carry random effects — the
        # mode/location vector is 2n-dim and Sigma is block-diagonal with
        # separate covariance parameters per set (likelihoods.h:474-485).
        two = getattr(lik, "num_sets_fe", 1) == 2
        two_re = self.num_sets_re == 2
        self.num_sets_fe = 2 if two else 1
        nd = self.dim_mode                 # Sigma / mode dimension

        base_sigma = self._assembly.sigma
        kb = self._assembly.num_theta
        if two_re:
            def sigma_fn(theta_log):
                S1 = base_sigma(theta_log[:kb])
                S2 = base_sigma(theta_log[kb:])
                Z = jnp.zeros((n, n), S1.dtype)
                return jnp.block([[S1, Z], [Z, S2]])
        else:
            sigma_fn = base_sigma

        def _split_F(F):
            if two_re:
                return F, None        # both blocks live in the latent path
            return (F[:n], F[n:]) if two else (F, None)

        def _loglik(y, loc, F2, aux):
            if two_re:
                ll = lik.log_lik2(y, loc[:n], loc[n:], aux)
            elif two:
                ll = lik.log_lik2(y, loc, F2, aux)
            else:
                ll = lik.log_lik(y, loc, aux)
            return jnp.sum(ll if w is None else w * ll)

        def _d1(y, loc, F2, aux):
            return jax.grad(lambda l: _loglik(y, l, F2, aux))(loc)

        def _W_obs(y, loc, F2, aux):
            return -jax.grad(lambda l: jnp.sum(_d1(y, l, F2, aux)))(loc)

        def _W_fisher(y, loc, F2, aux):
            if two_re:
                Wf = lik.fisher_W_stacked(y, loc[:n], loc[n:], aux)
                return Wf if w is None else jnp.concatenate([w, w]) * Wf
            Wf = lik.fisher_W2(y, loc, F2, aux) if two \
                else lik.fisher_W(y, loc, aux)
            return Wf if w is None else w * Wf

        # Laplace-variant routing (likelihoods.h:327-369): "fisher_laplace"
        # uses the (quasi-)Fisher curvature throughout, "combined" only for
        # mode finding (determinant keeps the observed Hessian), "laplace"
        # the observed Hessian throughout.
        has_fisher = hasattr(lik, "fisher_W2") if two \
            else hasattr(lik, "fisher_W")
        use_fisher_mode = has_fisher and lik.approx_type in (
            "fisher_laplace", "combined")
        use_fisher_det = has_fisher and lik.approx_type == "fisher_laplace"
        _W_mode = _W_fisher if use_fisher_mode else _W_obs
        _W_det = _W_fisher if use_fisher_det else _W_obs
        # when the determinant / mode curvature can be negative (zero-inflated
        # counts with observed Hessian, likelihoods.h:11565) the sqrt(W)
        # Cholesky formulation is invalid -> LU/slogdet path
        w_neg = bool(getattr(lik, "W_may_be_negative", False))
        # sqrt(W) is not autodiff-safe when W can be EXACTLY zero (hurdle
        # families at y = 0), so the differentiated determinant also takes
        # the custom-VJP path then; the un-differentiated solves (mode
        # finding, adjoint, prediction) only need it for negative W
        w_det_general = w_neg or bool(getattr(lik, "W_may_be_zero", False))
        w_neg_mode = w_neg and not use_fisher_mode
        if lik.approx_type == "tkc":
            # triangular-kernel curvature (likelihoods.h:13097-13111):
            # constant curvature from a jitted scalar search; Fisher mode
            # finding by default (:449-451)
            from ..likelihoods.tkc import tkc_neg_curvature

            def _W_tkc(y, loc, F2, aux):
                c = tkc_neg_curvature(
                    lambda s: _loglik(y, loc + s, F2, aux), n)
                base = jnp.ones_like(loc) if w is None else w
                return base * c

            _W_mode = _W_tkc if getattr(lik, "mode_finding", None) == \
                "not_fisher" else _W_fisher
            _W_det = _W_tkc
        _W = _W_det     # determinant curvature (used by _g / bwd / predict)


        def _mode_solve(Sigma, aux, y, F, a_init):
            """R&W stable Newton with Armijo backtracking; returns
            (a, mode, obj) with obj = -0.5 a'mode + loglik at the mode."""
            F1, F2 = _split_F(F)
            mode0 = Sigma @ a_init
            obj0 = -0.5 * (a_init @ mode0) + _loglik(y, mode0 + F1, F2, aux)

            def newton_body(carry):
                a, mode, obj, it, done = carry
                loc = mode + F1
                d1 = _d1(y, loc, F2, aux)
                W = _W_mode(y, loc, F2, aux)
                rhs = W * mode + d1
                if w_neg_mode:
                    # observed Hessian can be negative (zero-inflated counts)
                    a_upd = _negw_solve_IpWS(_negw_factors(Sigma, W), rhs,
                                             Sigma)
                else:
                    sW = jnp.sqrt(jnp.maximum(W, 0.0))
                    B = jnp.eye(nd, dtype=Sigma.dtype) \
                        + (sW[:, None] * Sigma) * sW[None, :]
                    L = jnp.linalg.cholesky(B)
                    rhs2 = sW * (Sigma @ rhs)
                    a_upd = rhs - sW * jsl.cho_solve((L, True), rhs2)
                mode_upd = Sigma @ a_upd
                direction = mode_upd - mode
                grad_dot_dir = direction @ (a_upd - a + W * direction)

                def bt_cond(bt):
                    lr, ih, accepted, _, _, _ = bt
                    return jnp.logical_and(~accepted, ih < MAX_LR_SHRINK_MODE)

                def bt_body(bt):
                    lr, ih, _, _, _, _ = bt
                    a_new = jnp.where(ih == 0, 1.0, lr) * a_upd \
                        + jnp.where(ih == 0, 0.0, 1.0 - lr) * a
                    mode_new = jnp.where(ih == 0, 1.0, lr) * mode_upd \
                        + jnp.where(ih == 0, 0.0, 1.0 - lr) * mode
                    obj_new = -0.5 * (a_new @ mode_new) \
                        + _loglik(y, mode_new + F1, F2, aux)
                    ok = obj_new >= (obj + C_ARMIJO * lr * grad_dot_dir)
                    ok = jnp.logical_and(ok, jnp.isfinite(obj_new))
                    lr_next = jnp.where(ok, lr, lr * 0.5)
                    return (lr_next, ih + 1, ok, a_new, mode_new, obj_new)

                bt0 = (jnp.asarray(1.0, Sigma.dtype), 0, False,
                       a, mode, obj)
                _, _, _, a_new, mode_new, obj_new = jax.lax.while_loop(
                    bt_cond, bt_body, bt0)

                rel = DELTA_CONV_MODE * jnp.abs(obj)
                converged = jnp.where(
                    it == 0,
                    jnp.abs(obj_new - obj) < rel,
                    (obj_new - obj) < rel)
                bad = ~jnp.isfinite(obj_new)
                return (a_new, mode_new, obj_new, it + 1,
                        jnp.logical_or(converged, bad))

            def newton_cond(carry):
                _, _, _, it, done = carry
                return jnp.logical_and(~done, it < MAXIT_MODE_NEWTON)

            a_fin, mode_fin, obj_fin, nit, _ = jax.lax.while_loop(
                newton_cond, newton_body,
                (a_init, mode0, obj0, 0, False))
            return a_fin, mode_fin, obj_fin, nit

        def _g(u, F, a, y):
            """nll expression at a FIXED a (mode = Sigma a); the logdet W-term
            depends on a, which the implicit-diff backward pass accounts for."""
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Sigma = sigma_fn(theta_log)
            F1, F2 = _split_F(F)
            mode = Sigma @ a
            loc = mode + F1
            W = _W(y, loc, F2, aux)
            if w_det_general:
                half_logdet = _negw_half_logdet(Sigma, W)
            else:
                sW = jnp.sqrt(jnp.maximum(W, 0.0))
                B = jnp.eye(nd, dtype=Sigma.dtype) \
                    + (sW[:, None] * Sigma) * sW[None, :]
                L = jnp.linalg.cholesky(B)
                half_logdet = jnp.sum(jnp.log(jnp.diagonal(L)))
            return (0.5 * (a @ mode) - _loglik(y, loc, F2, aux) + half_logdet)

        def _r(u, F, a, y):
            """Mode residual r = a - d1(Sigma a + F1)."""
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Sigma = sigma_fn(theta_log)
            F1, F2 = _split_F(F)
            return a - _d1(y, Sigma @ a + F1, F2, aux)

        @jax.custom_vjp
        def nll_fn(u, F, y, a_init):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Sigma = sigma_fn(theta_log)
            a, mode, obj, nit = _mode_solve(Sigma, aux, y, F, a_init)
            nll = _g(u, F, a, y)
            return nll, (a, nit)

        def nll_fwd(u, F, y, a_init):
            out = nll_fn(u, F, y, a_init)
            return out, (u, F, y, out[1][0])

        def nll_bwd(res, ct):
            ct_nll = ct[0]           # cotangent of a (ct[1]) is ignored:
            u, F, y, a = res         # callers never differentiate the mode
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Sigma = sigma_fn(theta_log)
            F1, F2 = _split_F(F)
            loc = Sigma @ a + F1
            g_u, g_F, g_a = jax.grad(_g, argnums=(0, 1, 2))(u, F, a, y)
            # adjoint of the mode residual r = a - d1, with the curvature of
            # the chosen approximation (Fisher for fisher_laplace, observed
            # Hessian for laplace/combined — the reference's gradient code
            # uses the same information it uses for the determinant)
            W = _W(y, loc, F2, aux)
            if w_neg:
                lam = _negw_solve_IpSW(_negw_factors(Sigma, W), g_a)
            else:
                sW = jnp.sqrt(jnp.maximum(W, 0.0))
                B = jnp.eye(nd, dtype=Sigma.dtype) \
                    + (sW[:, None] * Sigma) * sW[None, :]
                L = jnp.linalg.cholesky(B)
                # lam = (I + Sigma W)^-1 g_a = (I - Sigma sW B^-1 sW) g_a
                lam = g_a - Sigma @ (sW * jsl.cho_solve((L, True), sW * g_a))
            _, r_vjp = jax.vjp(lambda uu, FF: _r(uu, FF, a, y), u, F)
            ru_l, rF_l = r_vjp(lam)
            du = (g_u - ru_l) * ct_nll
            dF = (g_F - rF_l) * ct_nll
            return du, dF, None, None

        nll_fn.defvjp(nll_fwd, nll_bwd)

        self._nll_fn = lifted_jit(nll_fn)
        self._nll_raw = nll_fn   # traceable closure for the fully
        # on-device GD loop (models/jit_gd.py gd_fit_laplace_engine)
        self._vag = lifted_jit(jax.value_and_grad(nll_fn, argnums=0, has_aux=True))
        self._vag_F = lifted_jit(jax.value_and_grad(nll_fn, argnums=(0, 1),
                                                 has_aux=True))

        def predict_latent(u, F, y, a_init, Kcross, Kpred_diag):
            """Latent posterior mean/var at prediction points
            (PredictLaplaceApproxStable, likelihoods.h:7253)."""
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Sigma = sigma_fn(theta_log)
            a, mode, obj, nit = _mode_solve(Sigma, aux, y, F, a_init)
            F1, F2 = _split_F(F)
            loc = mode + F1
            W = _W(y, loc, F2, aux)
            mu_p = Kcross.T @ a
            if w_neg:
                # (Sigma + W^-1)^-1 = W (I + Sigma W)^-1
                M = W[:, None] * _negw_solve_IpSW(_negw_factors(Sigma, W),
                                                  Kcross)
                var_red = jnp.sum(Kcross * M, axis=0)
            else:
                sW = jnp.sqrt(jnp.maximum(W, 0.0))
                B = jnp.eye(nd, dtype=Sigma.dtype) \
                    + (sW[:, None] * Sigma) * sW[None, :]
                L = jnp.linalg.cholesky(B)
                V = jsl.cho_solve((L, True), sW[:, None] * Kcross)
                var_red = jnp.sum((sW[:, None] * Kcross) * V, axis=0)
            return mu_p, Kpred_diag - var_red, a

        self._predict_latent = lifted_jit(predict_latent)

        def predict_latent_cov(u, F, y, a_init, Kcross, Kpred):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Sigma = sigma_fn(theta_log)
            a, mode, obj, nit = _mode_solve(Sigma, aux, y, F, a_init)
            F1, F2 = _split_F(F)
            loc = mode + F1
            W = _W(y, loc, F2, aux)
            mu_p = Kcross.T @ a
            if w_neg:
                M = W[:, None] * _negw_solve_IpSW(_negw_factors(Sigma, W),
                                                  Kcross)
                cov_p = Kpred - Kcross.T @ M
            else:
                sW = jnp.sqrt(jnp.maximum(W, 0.0))
                B = jnp.eye(nd, dtype=Sigma.dtype) \
                    + (sW[:, None] * Sigma) * sW[None, :]
                L = jnp.linalg.cholesky(B)
                V = jsl.cho_solve((L, True), sW[:, None] * Kcross)
                cov_p = Kpred - (sW[:, None] * Kcross).T @ V
            return mu_p, cov_p, a

        self._predict_latent_cov = lifted_jit(predict_latent_cov)

    # ------------------------------------------------------------------
    # host-facing API
    def zero_mode(self):
        return jnp.zeros(self.dim_mode, dtype=self.dtype)

    def laplace_nll(self, u, y, F, a_init):
        nll, (a, nit) = self._nll_fn(jnp.asarray(u, self.dtype), F, y, a_init)
        self.last_num_mode_it = int(nit)
        self.total_num_mode_it = getattr(self, "total_num_mode_it", 0) \
            + int(nit)
        return float(nll), a

    def laplace_vag(self, u, y, F, a_init):
        (nll, (a, nit)), grad = self._vag(jnp.asarray(u, self.dtype), F, y,
                                          a_init)
        self.last_num_mode_it = int(nit)
        self.total_num_mode_it = getattr(self, "total_num_mode_it", 0) \
            + int(nit)
        return float(nll), np.asarray(grad), a

    def laplace_vag_F(self, u, y, F, a_init):
        (nll, (a, nit)), (gu, gF) = self._vag_F(jnp.asarray(u, self.dtype),
                                                F, y, a_init)
        self.last_num_mode_it = int(nit)
        self.total_num_mode_it = getattr(self, "total_num_mode_it", 0) \
            + int(nit)
        return float(nll), np.asarray(gu), np.asarray(gF), a

    # parameter transforms (sigma2 = 1 for non-Gaussian, cov_fcts.h:501)
    def _transform_half(self, pars_orig):
        out = []
        for comp, off in zip(self.components, self.par_offsets):
            out.append(pars_orig[off])
            if comp.num_cov_par > 1:
                rho = pars_orig[off + 1: off + comp.num_cov_par]
                out.extend(np.atleast_1d(comp.cov_fn.range_to_transformed(
                    rho, var=pars_orig[off])))
        return np.asarray(out)

    def transform_pars(self, pars_orig):
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        if self.num_sets_re == 2:
            k = len(pars_orig) // 2
            return np.concatenate([self._transform_half(pars_orig[:k]),
                                   self._transform_half(pars_orig[k:])])
        return self._transform_half(pars_orig)

    def _back_transform_half(self, t):
        out = []
        for comp, off in zip(self.components, self.par_offsets):
            out.append(t[off])
            if comp.num_cov_par > 1:
                alphas = t[off + 1: off + comp.num_cov_par]
                out.extend(np.atleast_1d(comp.cov_fn.range_from_transformed(
                    alphas, var=t[off])))
        return np.asarray(out)

    def back_transform_pars(self, pars_internal):
        t = np.asarray(pars_internal, dtype=np.float64)
        if self.num_sets_re == 2:
            k = len(t) // 2
            return np.concatenate([self._back_transform_half(t[:k]),
                                   self._back_transform_half(t[k:])])
        return self._back_transform_half(t)

    def training_re(self, u, a_state, predict_var=False):
        """Per-component posterior (Laplace) means of the random effects at
        the training points. At the mode, a = Sigma^-1 b_total, so component
        j's contribution is R_j a with the reporting covariance R_j
        (re_model_template.h:4420, non-Gaussian branch; variances via the
        Laplace posterior are left to predict())."""
        if predict_var:
            raise ValueError("predict_training_data_random_effects with "
                             "predict_var=True is not implemented for "
                             "non-Gaussian likelihoods; use predict()")
        if self.num_sets_re == 2:
            raise NotImplementedError(
                "predict_training_data_random_effects is not implemented "
                "for num_sets_re = 2 likelihoods; use predict()")
        from .gaussian_gp import report_matrices
        theta_log = jnp.asarray(u[: self.num_theta], self.dtype)
        a = jnp.asarray(a_state, self.dtype)
        Rs = report_matrices(self._assembly, theta_log)
        return np.column_stack([np.asarray(R @ a) for R in Rs]), None

    def predict(self, pars_orig, aux_pars, y, F, pred_data, a_init=None,
                predict_var=False, predict_cov_mat=False, predict_response=False,
                F_pred=None):
        """Laplace-approximate predictions (PredictLaplaceApproxStable +
        PredictResponse, likelihoods.h:7253/:9581)."""
        from .gaussian_gp import assemble_pred_covs
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        t = self.transform_pars(pars_orig)
        u = np.log(t)
        if self.num_aux:
            if aux_pars is None:
                aux_pars = self.likelihood.init_aux(np.asarray(y))
            else:
                aux_pars = self.likelihood.aux_to_internal(aux_pars)
            u = np.concatenate([u, np.log(np.asarray(aux_pars, dtype=np.float64))])
        aux_d = jnp.exp(jnp.asarray(u[self.num_theta:], self.dtype))
        theta_log = jnp.asarray(u[:self.num_theta], self.dtype)
        two_re = self.num_sets_re == 2
        if two_re:
            # block-diagonal cross/pred covariances, one block per RE set
            kb = self.num_theta // 2
            Kc, Kp = [], []
            for s in range(2):
                ts = t[s * kb:(s + 1) * kb]
                ths = theta_log[s * kb:(s + 1) * kb]
                cvs = [ts[off] for off in self.par_offsets]
                kc, kp = assemble_pred_covs(
                    self.components, self.par_offsets, cvs, ths,
                    pred_data, self.n, self.dtype)
                Kc.append(kc)
                Kp.append(kp)
            m_pred = Kc[0].shape[1]
            K_cross = jnp.zeros((2 * self.n, 2 * m_pred), self.dtype)
            K_cross = K_cross.at[:self.n, :m_pred].set(Kc[0])
            K_cross = K_cross.at[self.n:, m_pred:].set(Kc[1])
            K_pred = jnp.zeros((2 * m_pred, 2 * m_pred), self.dtype)
            K_pred = K_pred.at[:m_pred, :m_pred].set(Kp[0])
            K_pred = K_pred.at[m_pred:, m_pred:].set(Kp[1])
        else:
            comp_vars = [t[off] for off in self.par_offsets]
            K_cross, K_pred = assemble_pred_covs(
                self.components, self.par_offsets, comp_vars, theta_log,
                pred_data, self.n, self.dtype)
        yd = jnp.asarray(y, self.dtype)
        Fd = jnp.asarray(F, self.dtype)
        if a_init is None:
            a_init = self.zero_mode()
        ud = jnp.asarray(u, self.dtype)
        out = {}
        if predict_cov_mat:
            mu, cov, _ = self._predict_latent_cov(ud, Fd, yd, a_init,
                                                  K_cross, K_pred)
            var = jnp.diagonal(cov)
        else:
            mu, var, _ = self._predict_latent(ud, Fd, yd, a_init, K_cross,
                                              jnp.diagonal(K_pred))
            cov = None
        if two_re:
            # both blocks are latent: split (2m,) outputs into the mean
            # process (block 0) and the log-variance process (block 1)
            m_pred = len(np.asarray(mu)) // 2
            mu1, mu2 = mu[:m_pred], mu[m_pred:]
            var1, var2 = var[:m_pred], var[m_pred:]
            F1p = F2p = jnp.zeros(m_pred, self.dtype)
            if F_pred is not None:
                Fp = jnp.asarray(F_pred, self.dtype)
                F1p, F2p = Fp[:m_pred], Fp[m_pred:]
            mu1t, mu2t = mu1 + F1p, mu2 + F2p
            if predict_response:
                mm, vv = self.likelihood.response_mean_var_2re(
                    mu1t, jnp.maximum(var1, 0.0), mu2t,
                    jnp.maximum(var2, 0.0), aux_d)
                out["mu"] = np.asarray(mm)
                if predict_var or predict_cov_mat:
                    out["var"] = np.asarray(vv)
            else:
                out["mu"] = np.asarray(mu1t)
                if predict_cov_mat:
                    out["cov"] = np.asarray(cov[:m_pred, :m_pred])
                if predict_var:
                    out["var"] = np.asarray(var1).copy()
            return out
        # two-predictor likelihoods: F_pred carries both blocks stacked
        two = self.num_sets_fe == 2
        np_pred = len(np.asarray(mu))
        F1_pred = zeta_pred = None
        if F_pred is not None:
            Fp = jnp.asarray(F_pred, self.dtype)
            if two:
                F1_pred, zeta_pred = Fp[:np_pred], Fp[np_pred:]
            else:
                F1_pred = Fp
        elif two:
            zeta_pred = jnp.zeros(np_pred, self.dtype)
        if predict_response:
            mu_tot = mu if F1_pred is None else mu + F1_pred
            if two:
                m, v = self.likelihood.response_mean_var2(
                    mu_tot, jnp.maximum(var, 0.0), zeta_pred, aux_d)
            else:
                m, v = self.likelihood.response_mean_var(
                    mu_tot, jnp.maximum(var, 0.0), aux_d)
            out["mu"] = np.asarray(m)
            if predict_var or predict_cov_mat:
                out["var"] = np.asarray(v)
        else:
            mu_out = mu if F1_pred is None else mu + F1_pred
            out["mu"] = np.asarray(mu_out)
            if predict_cov_mat:
                out["cov"] = np.asarray(cov)
            if predict_var:
                out["var"] = np.asarray(var).copy()
        return out

    def neg_log_likelihood(self, pars_orig, y, aux_pars=None, fixed_effects=None):
        t = self.transform_pars(pars_orig)
        if aux_pars is None:
            aux_pars = self.likelihood.init_aux(np.asarray(y))
        else:
            aux_pars = self.likelihood.aux_to_internal(aux_pars)
        u = np.concatenate([np.log(t), np.log(np.asarray(aux_pars, dtype=np.float64))]) \
            if self.num_aux else np.log(t)
        F = jnp.zeros(self.n * self.num_sets_fe, self.dtype) \
            if fixed_effects is None \
            else jnp.asarray(fixed_effects, self.dtype)
        if len(F) != self.n * self.num_sets_fe:
            raise ValueError(
                f"fixed_effects must have length {self.n * self.num_sets_fe} "
                f"(num_sets_fe = {self.num_sets_fe}), got {len(F)}")
        yd = jnp.asarray(y, self.dtype)
        nll, _ = self.laplace_nll(u, yd, F, self.zero_mode())
        return nll
