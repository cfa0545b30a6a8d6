"""Vecchia-Laplace engine: non-Gaussian likelihoods with a Vecchia-approximated
latent GP.

Reference: likelihoods.h:3728 FindModePostRandEffCalcMLLVecchia, :6476
CalcGradNegMargLikelihoodLaplaceApproxVecchia, :7954 PredictLaplaceApproxVecchia.
The latent precision is Q(theta) = B' D^-1 B from the Vecchia factors of the
LATENT covariance (no nugget). The Laplace objective in precision form:

    nll = 0.5 b'Qb - loglik(b + F) + 0.5 ( log|Q + W| - log|Q| ),
    mode: (Q + W) Newton steps;  log|Q| = -sum log D.

Gradients wrt covariance / aux parameters / fixed effects via the same
implicit-function-theorem custom_vjp pattern as the dense Laplace engine —
autodiff flows through the batched Vecchia B/D construction.

This round forms Q densely (n x n) — exact for parity and fine to moderate n;
the O(n m) conjugate-gradient formulation (reference preconditioners
re_model_template.h:5859) is the scale path for a later round.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .vecchia import VecchiaGaussianEngine

DELTA_CONV_MODE = 1e-8
MAXIT_MODE_NEWTON = 1000
MAX_LR_SHRINK_MODE = 20
C_ARMIJO = 1e-4


class VecchiaLaplaceEngine:
    """Laplace-approximated NLL with Vecchia latent precision."""

    is_gaussian = False

    def __init__(self, components, num_data, likelihood, num_neighbors=20,
                 vecchia_ordering="random", seed=0, dtype=jnp.float64):
        # reuse the Gaussian Vecchia machinery for ordering/NN/batched B,D
        self._vecchia = VecchiaGaussianEngine(
            components, num_data, num_neighbors=num_neighbors,
            vecchia_ordering=vecchia_ordering, seed=seed, dtype=dtype)
        self.components = self._vecchia.components
        self.comp = self._vecchia.comp
        self.perm = self._vecchia.perm
        self.n = self._vecchia.n
        self.dtype = dtype
        self.likelihood = likelihood
        self.num_theta = self.comp.num_cov_par
        self.num_cov_par = self.num_theta
        self.par_offsets = [0]
        self.num_aux = likelihood.num_aux
        self.num_par = self.num_theta + self.num_aux
        self._build_jitted()

    # ------------------------------------------------------------------
    def _Q_logdetQ(self, theta_log):
        """Dense latent precision Q = B' D^-1 B and log|Q|."""
        n = self.n
        A, D = self._vecchia._bd(theta_log, latent=True)
        idx = self._vecchia._nn_idx
        # dense B = I - M, M[i, idx[i,k]] = A[i,k]: one-hot contraction
        rows = jnp.arange(n)
        onehot = (idx[:, :, None] == rows[None, None, :]).astype(A.dtype)
        M = jnp.einsum("nm,nmj->nj", A, onehot)
        B = jnp.eye(n, dtype=A.dtype) - M
        Q = B.T @ (B / D[:, None])
        return Q, -jnp.sum(jnp.log(D))

    def _build_jitted(self):
        n = self.n
        lik = self.likelihood

        def _loglik(y, loc, aux):
            return jnp.sum(lik.log_lik(y, loc, aux))

        def _d1(y, loc, aux):
            return jax.grad(lambda l: _loglik(y, l, aux))(loc)

        def _W_obs(y, loc, aux):
            return -jax.grad(lambda l: jnp.sum(_d1(y, l, aux)))(loc)

        def _W_fisher(y, loc, aux):
            return lik.fisher_W(y, loc, aux)

        # variant routing (likelihoods.h:327-369); see models/laplace.py
        has_fisher = hasattr(lik, "fisher_W")
        use_fisher_mode = has_fisher and lik.approx_type in (
            "fisher_laplace", "combined")
        use_fisher_det = has_fisher and lik.approx_type == "fisher_laplace"
        _W_mode = _W_fisher if use_fisher_mode else _W_obs
        _W = _W_fisher if use_fisher_det else _W_obs     # determinant

        def _solve_H(Q, W, rhs):
            """(Q + diag(W))^-1 rhs. Negative W entries are fine as long as
            the full H is SPD (true at any proper Laplace mode); indefinite
            iterates yield NaN and are rejected by the Armijo backtracking."""
            L = jnp.linalg.cholesky(Q + jnp.diag(W))
            return jsl.cho_solve((L, True), rhs)

        def _mode_solve(Q, aux, y, F, b_init):
            obj0 = -0.5 * (b_init @ (Q @ b_init)) + _loglik(y, b_init + F, aux)

            def newton_body(carry):
                b, obj, it, done = carry
                loc = b + F
                d1 = _d1(y, loc, aux)
                W = _W_mode(y, loc, aux)
                grad = d1 - Q @ b
                delta = _solve_H(Q, W, grad)
                gdd = grad @ delta

                def bt_cond(bt):
                    lr, ih, acc, _, _ = bt
                    return jnp.logical_and(~acc, ih < MAX_LR_SHRINK_MODE)

                def bt_body(bt):
                    lr, ih, _, _, _ = bt
                    b_new = b + lr * delta
                    obj_new = -0.5 * (b_new @ (Q @ b_new)) \
                        + _loglik(y, b_new + F, aux)
                    ok = obj_new >= obj + C_ARMIJO * lr * gdd
                    ok = jnp.logical_and(ok, jnp.isfinite(obj_new))
                    return (jnp.where(ok, lr, lr * 0.5), ih + 1, ok, b_new,
                            obj_new)

                _, _, _, b_new, obj_new = jax.lax.while_loop(
                    bt_cond, bt_body,
                    (jnp.asarray(1.0, b.dtype), 0, False, b, obj))
                rel = DELTA_CONV_MODE * jnp.abs(obj)
                conv = jnp.where(it == 0, jnp.abs(obj_new - obj) < rel,
                                 (obj_new - obj) < rel)
                bad = ~jnp.isfinite(obj_new)
                return (b_new, obj_new, it + 1, jnp.logical_or(conv, bad))

            b_fin, obj_fin, nit, _ = jax.lax.while_loop(
                lambda c: jnp.logical_and(~c[3], c[2] < MAXIT_MODE_NEWTON),
                newton_body, (b_init, obj0, 0, False))
            return b_fin

        def _g(u, F, b, y):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Q, logdetQ = self._Q_logdetQ(theta_log)
            loc = b + F
            W = _W(y, loc, aux)
            L = jnp.linalg.cholesky(Q + jnp.diag(W))
            return (0.5 * (b @ (Q @ b)) - _loglik(y, loc, aux)
                    + jnp.sum(jnp.log(jnp.diagonal(L))) - 0.5 * logdetQ)

        def _r(u, F, b, y):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Q, _ = self._Q_logdetQ(theta_log)
            return Q @ b - _d1(y, b + F, aux)

        @jax.custom_vjp
        def nll_fn(u, F, y, b_init):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Q, _ = self._Q_logdetQ(theta_log)
            b = _mode_solve(Q, aux, y, F, b_init)
            return _g(u, F, b, y), b

        def nll_fwd(u, F, y, b_init):
            out = nll_fn(u, F, y, b_init)
            return out, (u, F, y, out[1])

        def nll_bwd(res, ct):
            ct_nll = ct[0]
            u, F, y, b = res
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Q, _ = self._Q_logdetQ(theta_log)
            W = _W(y, b + F, aux)
            g_u, g_F, g_b = jax.grad(_g, argnums=(0, 1, 2))(u, F, b, y)
            lam = _solve_H(Q, W, g_b)   # (Q + W) symmetric
            _, r_vjp = jax.vjp(lambda uu, FF: _r(uu, FF, b, y), u, F)
            ru_l, rF_l = r_vjp(lam)
            return ((g_u - ru_l) * ct_nll, (g_F - rF_l) * ct_nll, None, None)

        nll_fn.defvjp(nll_fwd, nll_bwd)

        self._nll_fn = jax.jit(nll_fn)
        self._vag = jax.jit(jax.value_and_grad(nll_fn, argnums=0, has_aux=True))
        self._vag_F = jax.jit(jax.value_and_grad(nll_fn, argnums=(0, 1),
                                                 has_aux=True))
        self._W_fn = _W
        self._d1_fn = _d1
        self._mode_solve_host = lambda u, F, y, b0: None  # not used

    # ------------------------------------------------------------------
    # host-facing API (permutes data to the Vecchia ordering)
    def zero_mode(self):
        return jnp.zeros(self.n, dtype=self.dtype)

    def _permute(self, v):
        return jnp.asarray(np.asarray(v)[self.perm], self.dtype)

    def laplace_nll(self, u, y, F, a_init):
        nll, b = self._nll_fn(jnp.asarray(u, self.dtype), self._permute(F),
                              self._permute(y), a_init)
        return float(nll), b

    def laplace_vag(self, u, y, F, a_init):
        (nll, b), g = self._vag(jnp.asarray(u, self.dtype), self._permute(F),
                                self._permute(y), a_init)
        return float(nll), np.asarray(g), b

    def laplace_vag_F(self, u, y, F, a_init):
        (nll, b), (gu, gF) = self._vag_F(jnp.asarray(u, self.dtype),
                                         self._permute(F), self._permute(y),
                                         a_init)
        gF_unperm = np.empty(self.n)
        gF_unperm[self.perm] = np.asarray(gF)
        return float(nll), np.asarray(gu), gF_unperm, b

    # parameter transforms (sigma2 = 1 for non-Gaussian)
    def transform_pars(self, pars_orig):
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        out = [pars_orig[0]]
        out.extend(np.atleast_1d(
            self.comp.cov_fn.range_to_transformed(pars_orig[1:])))
        return np.asarray(out)

    def back_transform_pars(self, pars_internal):
        t = np.asarray(pars_internal, dtype=np.float64)
        out = [t[0]]
        out.extend(np.atleast_1d(self.comp.cov_fn.range_from_transformed(t[1:])))
        return np.asarray(out)

    def neg_log_likelihood(self, pars_orig, y, aux_pars=None, fixed_effects=None):
        t = self.transform_pars(pars_orig)
        u = np.log(t)
        if self.num_aux:
            if aux_pars is None:
                aux_pars = self.likelihood.init_aux(np.asarray(y))
            else:
                aux_pars = self.likelihood.aux_to_internal(aux_pars)
            u = np.concatenate([u, np.log(np.asarray(aux_pars, dtype=np.float64))])
        F = np.zeros(self.n) if fixed_effects is None else fixed_effects
        nll, _ = self.laplace_nll(u, y, F, self.zero_mode())
        return nll

    # ------------------------------------------------------------------
    def training_re(self, u, a_state, predict_var=False):
        """Posterior (Laplace) mean of the GP at the training points: the
        mode itself, un-permuted (single-GP Vecchia-Laplace model)."""
        if predict_var:
            raise ValueError("predict_training_data_random_effects with "
                             "predict_var=True is not implemented for "
                             "gp_approx='vecchia' non-Gaussian; use predict()")
        b = np.asarray(a_state)
        out = np.empty(self.n)
        out[self.perm] = b
        return out[:, None], None

    def predict(self, pars_orig, aux_pars, y, F, pred_data, a_init=None,
                predict_var=False, predict_cov_mat=False,
                predict_response=False, F_pred=None, **kwargs):
        """Latent predictions: cross covariances from the exact kernel,
        training precision from Vecchia (PredictLaplaceApproxVecchia)."""
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
        yp = self._permute(y)
        Fp = self._permute(F)
        if a_init is None:
            a_init = self.zero_mode()
        nll, b = self._nll_fn(jnp.asarray(u, self.dtype), Fp, yp, a_init)

        cf = self.comp.cov_fn
        v = t[0]
        alpha = np.exp(np.asarray(theta_log)[1])
        cp = np.asarray(pred_data["comps"][0]["coords_pred"], dtype=np.float64)
        if cp.ndim == 1:
            cp = cp[:, None]
        n_pred = len(cp)
        co = self._vecchia.coords_ord
        d_cross = np.sqrt(np.maximum(
            ((co[:, None, :] - cp[None, :, :]) ** 2).sum(-1), 0))
        d_pp = np.sqrt(np.maximum(
            ((cp[:, None, :] - cp[None, :, :]) ** 2).sum(-1), 0))
        K_cross = v * np.asarray(cf.corr_from_dist(jnp.asarray(d_cross), alpha))
        K_pp = v * np.asarray(cf.corr_from_dist(jnp.asarray(d_pp), alpha))

        loc = b + Fp
        a = np.asarray(self._d1_fn(yp, loc, aux_d))   # = Q b at the mode
        W = np.asarray(self._W_fn(yp, loc, aux_d))
        Q, _ = self._Q_logdetQ(theta_log)
        H = np.asarray(Q) + np.diag(W)
        import scipy.linalg as sla
        if bool(getattr(self.likelihood, "W_may_be_negative", False)):
            _lu = sla.lu_factor(H)
            _h_solve = lambda rhs: sla.lu_solve(_lu, rhs)
        else:
            cho = sla.cho_factor(H, lower=True)
            _h_solve = lambda rhs: sla.cho_solve(cho, rhs)
        mu_p = K_cross.T @ a
        mu_lat = mu_p if F_pred is None else mu_p + np.asarray(F_pred)
        out = {"mu": mu_lat}
        if predict_var or predict_cov_mat:
            # posterior cov: K_pp - K' (Sigma + W^-1)^-1 K, and
            # (Sigma + W^-1)^-1 = W - W H^-1 W  (H = Q + W)
            WK = W[:, None] * K_cross
            M = WK - W[:, None] * _h_solve(WK)
            cov = K_pp - K_cross.T @ M
            if predict_cov_mat:
                out["cov"] = cov
            if predict_var:
                out["var"] = np.diagonal(cov).copy()
        if predict_response:
            mu_tot = mu_p if F_pred is None else mu_p + np.asarray(F_pred)
            var = out.get("var")
            if var is None:
                WK = W[:, None] * K_cross
                M = WK - W[:, None] * _h_solve(WK)
                var = np.maximum(np.diagonal(K_pp - K_cross.T @ M), 0.0)
            m, vv = self.likelihood.response_mean_var(
                jnp.asarray(mu_tot), jnp.asarray(np.maximum(var, 0.0)), aux_d)
            out2 = {"mu": np.asarray(m)}
            if predict_var or predict_cov_mat:
                out2["var"] = np.asarray(vv)
            return out2
        return out
