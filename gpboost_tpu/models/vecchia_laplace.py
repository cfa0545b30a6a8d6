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

from ..ops.jit_utils import lifted_jit
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
                 vecchia_ordering="random", seed=0, dtype=jnp.float64,
                 matrix_inversion_method="cholesky", num_rand_vec_trace=50,
                 cg_max_num_it=1000, cg_delta_conv=1e-6,
                 seed_rand_vec_trace=1, nsim_var_pred=500,
                 cg_preconditioner_type="vadu", piv_chol_rank=50,
                 weights=None):
        # reuse the Gaussian Vecchia machinery for ordering/NN/batched B,D
        self._vecchia = VecchiaGaussianEngine(
            components, num_data, num_neighbors=num_neighbors,
            vecchia_ordering=vecchia_ordering, seed=seed, dtype=dtype)
        # per-observation likelihood weights in Vecchia ordering
        # (re_model.h ctor weights; they scale the log-likelihood terms)
        self._wobs = None if weights is None else jnp.asarray(
            np.asarray(weights, dtype=np.float64)[self._vecchia.perm], dtype)
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
        self.matrix_inversion_method = matrix_inversion_method
        self.num_rand_vec_trace = int(num_rand_vec_trace)
        self.cg_max_num_it = int(cg_max_num_it)
        self.cg_delta_conv = float(cg_delta_conv)
        self.seed_rand_vec_trace = int(seed_rand_vec_trace)
        self.nsim_var_pred = int(nsim_var_pred)
        _pc_aliases = {"Sigma_inv_plus_BtWB": "vadu",
                       "piv_chol_on_Sigma_nn": "pivoted_cholesky",
                       "jacobi": "diagonal"}
        self.cg_preconditioner_type = _pc_aliases.get(
            cg_preconditioner_type, cg_preconditioner_type)
        if self.cg_preconditioner_type not in (
                "vadu", "pivoted_cholesky", "vecchia_response", "diagonal",
                "none"):
            raise ValueError(
                f"cg_preconditioner_type '{cg_preconditioner_type}' is not "
                "supported; use 'vadu' (Sigma_inv_plus_BtWB), "
                "'pivoted_cholesky' (piv_chol_on_Sigma_nn), "
                "'vecchia_response', 'diagonal' or "
                "'none' (re_model_template.h:5859)")
        self.piv_chol_rank = int(piv_chol_rank)
        if matrix_inversion_method == "iterative":
            self._build_jitted_iterative()
        else:
            self._build_jitted()

    # ------------------------------------------------------------------
    def _Q_logdetQ(self, theta_log):
        """Dense latent precision Q = B' D^-1 B and log|Q|."""
        n = self.n
        A, D = self._vecchia._bd(theta_log, latent=True)
        idx = self._vecchia._nn_idx
        # dense B = I - M via a 2-D scatter of the (n, m) coefficients —
        # O(n^2) memory, one scatter op; the earlier one-hot einsum built an
        # (n, m, n) intermediate that capped the dense path at tiny n.
        # Everything downstream is MXU-shaped dense linalg: the n<=~25k
        # regime runs FASTER dense on the systolic array than any
        # latency-bound gather/CG pipeline (measured: one dependent gather
        # costs ~3.5ms at n=20k while a full dense n=20k matmul is ~100ms).
        rows = jnp.broadcast_to(jnp.arange(n)[:, None], idx.shape)
        M = jnp.zeros((n, n), A.dtype).at[rows, idx].add(A)
        B = jnp.eye(n, dtype=A.dtype) - M
        Q = B.T @ (B / D[:, None])
        return Q, -jnp.sum(jnp.log(D))

    def _build_jitted(self):
        n = self.n
        lik = self.likelihood
        # two-predictor likelihoods: F is (2n,), random effects on block 1
        two = getattr(lik, "num_sets_fe", 1) == 2
        self.num_sets_fe = 2 if two else 1

        def _split_F(F):
            return (F[:n], F[n:]) if two else (F, None)

        wobs = self._wobs

        def _loglik(y, loc, F2, aux):
            ll = lik.log_lik2(y, loc, F2, aux) if two \
                else lik.log_lik(y, loc, aux)
            return jnp.sum(ll if wobs is None else wobs * ll)

        def _d1(y, loc, F2, aux):
            return jax.grad(lambda l: _loglik(y, l, F2, aux))(loc)

        def _W_obs(y, loc, F2, aux):
            return -jax.grad(lambda l: jnp.sum(_d1(y, l, F2, aux)))(loc)

        def _W_fisher(y, loc, F2, aux):
            Wf = lik.fisher_W2(y, loc, F2, aux) if two \
                else lik.fisher_W(y, loc, aux)
            return Wf if wobs is None else wobs * Wf

        # variant routing (likelihoods.h:327-369); see models/laplace.py
        has_fisher = hasattr(lik, "fisher_W2") if two \
            else hasattr(lik, "fisher_W")
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
            F1, F2 = _split_F(F)
            obj0 = -0.5 * (b_init @ (Q @ b_init)) \
                + _loglik(y, b_init + F1, F2, aux)

            def newton_body(carry):
                b, obj, it, done = carry
                loc = b + F1
                d1 = _d1(y, loc, F2, aux)
                W = _W_mode(y, loc, F2, aux)
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
                        + _loglik(y, b_new + F1, F2, aux)
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
            return b_fin, nit

        def _g(u, F, b, y):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Q, logdetQ = self._Q_logdetQ(theta_log)
            F1, F2 = _split_F(F)
            loc = b + F1
            W = _W(y, loc, F2, aux)
            L = jnp.linalg.cholesky(Q + jnp.diag(W))
            return (0.5 * (b @ (Q @ b)) - _loglik(y, loc, F2, aux)
                    + jnp.sum(jnp.log(jnp.diagonal(L))) - 0.5 * logdetQ)

        def _r(u, F, b, y):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Q, _ = self._Q_logdetQ(theta_log)
            F1, F2 = _split_F(F)
            return Q @ b - _d1(y, b + F1, F2, aux)

        @jax.custom_vjp
        def nll_fn(u, F, y, b_init):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Q, _ = self._Q_logdetQ(theta_log)
            b, nit = _mode_solve(Q, aux, y, F, b_init)
            return _g(u, F, b, y), (b, jnp.stack([nit, 0]))

        def nll_fwd(u, F, y, b_init):
            out = nll_fn(u, F, y, b_init)
            return out, (u, F, y, out[1][0])

        def nll_bwd(res, ct):
            ct_nll = ct[0]
            u, F, y, b = res
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Q, _ = self._Q_logdetQ(theta_log)
            F1, F2 = _split_F(F)
            W = _W(y, b + F1, F2, aux)
            g_u, g_F, g_b = jax.grad(_g, argnums=(0, 1, 2))(u, F, b, y)
            lam = _solve_H(Q, W, g_b)   # (Q + W) symmetric
            _, r_vjp = jax.vjp(lambda uu, FF: _r(uu, FF, b, y), u, F)
            ru_l, rF_l = r_vjp(lam)
            return ((g_u - ru_l) * ct_nll, (g_F - rF_l) * ct_nll, None, None)

        nll_fn.defvjp(nll_fwd, nll_bwd)

        self._nll_fn = lifted_jit(nll_fn)
        self._nll_raw = nll_fn   # traceable closure for the fully
        # on-device GD loop (models/jit_gd.py gd_fit_laplace_engine)
        self._vag = lifted_jit(jax.value_and_grad(nll_fn, argnums=0, has_aux=True))
        self._vag_F = lifted_jit(jax.value_and_grad(nll_fn, argnums=(0, 1),
                                                 has_aux=True))
        self._W_fn = _W
        self._d1_fn = _d1
        self._mode_solve_host = lambda u, F, y, b0: None  # not used

    # ------------------------------------------------------------------
    # host-facing API (permutes data to the Vecchia ordering)
    def zero_mode(self):
        return jnp.zeros(self.n, dtype=self.dtype)

    def _permute(self, v):
        v = np.asarray(v)
        if len(v) == 2 * self.n:     # two-predictor F: permute each block
            return jnp.asarray(np.concatenate(
                [v[: self.n][self.perm], v[self.n:][self.perm]]), self.dtype)
        return jnp.asarray(v[self.perm], self.dtype)

    def _note_it(self, stats):
        stats = np.asarray(stats).ravel()
        self.last_num_mode_it = int(stats[0])
        self.total_num_mode_it = getattr(self, "total_num_mode_it", 0) \
            + int(stats[0])
        if len(stats) > 1 and int(stats[1]) > 0:
            self.last_num_cg_it = int(stats[1])
            self.total_num_cg_it = getattr(self, "total_num_cg_it", 0) \
                + int(stats[1])

    def laplace_nll(self, u, y, F, a_init):
        nll, (b, nit) = self._nll_fn(jnp.asarray(u, self.dtype),
                                     self._permute(F), self._permute(y),
                                     a_init)
        self._note_it(nit)
        return float(nll), b

    def laplace_vag(self, u, y, F, a_init):
        (nll, (b, nit)), g = self._vag(jnp.asarray(u, self.dtype),
                                       self._permute(F), self._permute(y),
                                       a_init)
        self._note_it(nit)
        return float(nll), np.asarray(g), b

    def laplace_vag_F(self, u, y, F, a_init):
        (nll, (b, nit)), (gu, gF) = self._vag_F(jnp.asarray(u, self.dtype),
                                                self._permute(F),
                                                self._permute(y), a_init)
        self._note_it(nit)
        gF = np.asarray(gF)
        if len(gF) == 2 * self.n:     # two-predictor: un-permute each block
            gF_unperm = np.empty(2 * self.n)
            gF_unperm[self.perm] = gF[: self.n]
            gF_unperm[self.n + self.perm] = gF[self.n:]
        else:
            gF_unperm = np.empty(self.n)
            gF_unperm[self.perm] = gF
        return float(nll), np.asarray(gu), gF_unperm, b

    # parameter transforms (sigma2 = 1 for non-Gaussian)
    def transform_pars(self, pars_orig):
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        out = [pars_orig[0]]
        out.extend(np.atleast_1d(
            self.comp.cov_fn.range_to_transformed(pars_orig[1:],
                                                  var=pars_orig[0])))
        return np.asarray(out)

    def back_transform_pars(self, pars_internal):
        t = np.asarray(pars_internal, dtype=np.float64)
        out = [t[0]]
        out.extend(np.atleast_1d(self.comp.cov_fn.range_from_transformed(
            t[1:], var=t[0])))
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
        nsets = getattr(self, "num_sets_fe", 1)
        F = np.zeros(self.n * nsets) if fixed_effects is None else fixed_effects
        if len(F) != self.n * nsets:
            raise ValueError(
                f"fixed_effects must have length {self.n * nsets} "
                f"(num_sets_fe = {nsets}), got {len(F)}")
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
        nll, (b, _nit) = self._nll_fn(jnp.asarray(u, self.dtype), Fp, yp,
                                      a_init)
        if self.matrix_inversion_method == "iterative":
            return self._predict_iterative(u, yp, Fp, b, pred_data,
                                           predict_var, predict_response,
                                           F_pred)

        cf = self.comp.cov_fn
        v = t[0]
        alpha = np.exp(np.asarray(theta_log)[1:])
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

        two = getattr(self, "num_sets_fe", 1) == 2
        F1p, F2p = (Fp[: self.n], Fp[self.n:]) if two else (Fp, None)
        loc = b + F1p
        a = np.asarray(self._d1_fn(yp, loc, F2p, aux_d))   # = Q b at the mode
        W = np.asarray(self._W_fn(yp, loc, F2p, aux_d))
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
        F1_pred = zeta_pred = None
        if F_pred is not None:
            Fpr = np.asarray(F_pred)
            if two:
                F1_pred, zeta_pred = Fpr[:n_pred], Fpr[n_pred:]
            else:
                F1_pred = Fpr
        elif two:
            zeta_pred = np.zeros(n_pred)
        mu_lat = mu_p if F1_pred is None else mu_p + F1_pred
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
            mu_tot = mu_p if F1_pred is None else mu_p + F1_pred
            var = out.get("var")
            if var is None:
                WK = W[:, None] * K_cross
                M = WK - W[:, None] * _h_solve(WK)
                var = np.maximum(np.diagonal(K_pp - K_cross.T @ M), 0.0)
            if two:
                m, vv = self.likelihood.response_mean_var2(
                    jnp.asarray(mu_tot), jnp.asarray(np.maximum(var, 0.0)),
                    jnp.asarray(zeta_pred), aux_d)
            else:
                m, vv = self.likelihood.response_mean_var(
                    jnp.asarray(mu_tot), jnp.asarray(np.maximum(var, 0.0)), aux_d)
            out2 = {"mu": np.asarray(m)}
            if predict_var or predict_cov_mat:
                out2["var"] = np.asarray(vv)
            return out2
        return out

    # ==================================================================
    # Scalable (iterative) path: no dense Q is ever formed.
    #
    # Reference: CGVecchiaLaplace solvers (CG_utils.h:42-167), preconditioned
    # SLQ log-dets (CG_utils.h:384) with the vadu preconditioner family
    # (re_model_template.h:5859-5867), FindModePostRandEffCalcMLLVecchia with
    # matrix_inversion_method='iterative' (likelihoods.h:3728).
    #
    # TPU-first design: Q v = B'(D^-1 (B v)) where B v is a gather and B' w a
    # scatter-add over the static (n, m) neighbor index array — everything is
    # O(n m) and fully parallel.
    #
    # Preconditioner family (re_model_template.h:5859-5867):
    #   * "vadu" (Sigma_inv_plus_BtWB, the reference default): P = B'(D^-1+W)B.
    #     Exact P^-1 needs sequential sparse triangular solves; on TPU we use
    #     the truncated Neumann series B^-1 = (I - A)^-1 ~= I + A + ... + A^j
    #     (each term one gather, O(n m), fully parallel). Because the
    #     truncated S_j is still unit-triangular (det = 1), the SLQ identity
    #     log|Q+W| = log|M'(Q+W)M| + sum log(D^-1+W), M = S_j (D^-1+W)^-1/2,
    #     stays EXACT for every truncation order — truncation only affects
    #     spectrum clustering, never the estimator's target.
    #   * "pivoted_cholesky" (piv_chol_on_Sigma_nn): rank-k pivoted Cholesky
    #     L of the TRUE kernel matrix (columns evaluated on demand,
    #     CG_utils.h:438), preconditioning (Q + W) with
    #     P = (L L' + eps I)^-1 + W applied via two nested low-rank Woodbury
    #     identities — O(n k) dense matmuls, MXU-friendly.
    #   * "diagonal" / "none": Jacobi / unpreconditioned.
    def _build_jitted_iterative(self):
        import math as _math
        from ..ops.iterative import (make_slq_logdet_congruence, pcg,
                                     pivoted_cholesky_kernel)

        n = self.n
        lik = self.likelihood
        idx = self._vecchia._nn_idx                    # (n, m)
        flat_idx = idx.reshape(-1)
        two = getattr(lik, "num_sets_fe", 1) == 2
        self.num_sets_fe = 2 if two else 1

        def _split_F(F):
            return (F[:n], F[n:]) if two else (F, None)

        wobs = self._wobs

        def _loglik(y, loc, F2, aux):
            ll = lik.log_lik2(y, loc, F2, aux) if two \
                else lik.log_lik(y, loc, aux)
            return jnp.sum(ll if wobs is None else wobs * ll)

        def _d1(y, loc, F2, aux):
            return jax.grad(lambda l: _loglik(y, l, F2, aux))(loc)

        def _W_obs(y, loc, F2, aux):
            return -jax.grad(lambda l: jnp.sum(_d1(y, l, F2, aux)))(loc)

        def _W_fisher(y, loc, F2, aux):
            Wf = lik.fisher_W2(y, loc, F2, aux) if two \
                else lik.fisher_W(y, loc, aux)
            return Wf if wobs is None else wobs * Wf

        has_fisher = hasattr(lik, "fisher_W2") if two \
            else hasattr(lik, "fisher_W")
        use_fisher_mode = has_fisher and lik.approx_type in (
            "fisher_laplace", "combined")
        use_fisher_det = has_fisher and lik.approx_type == "fisher_laplace"
        _W_mode = _W_fisher if use_fisher_mode else _W_obs
        _W = _W_fisher if use_fisher_det else _W_obs

        # ---- matrix-free Vecchia operators over (A, D) -------------------
        def _Bv(A, v):
            return v - jnp.sum(A * v[idx], axis=1)

        def _Btv(A, w):
            return w - jnp.zeros_like(w).at[flat_idx].add(
                (A * w[:, None]).reshape(-1))

        def _Qv(A, D, v):
            return _Btv(A, _Bv(A, v) / D)

        def _diag_Q(A, D):
            return 1.0 / D + jnp.zeros(n, D.dtype).at[flat_idx].add(
                (A * A / D[:, None]).reshape(-1))

        self._Bv, self._Btv, self._Qv, self._diag_Q = _Bv, _Btv, _Qv, _diag_Q

        # strictly-lower neighbor operator: B = I - A_op
        def _Av_op(A, v):
            return jnp.sum(A * v[idx], axis=1)

        def _Atv_op(A, w):
            return jnp.zeros_like(w).at[flat_idx].add(
                (A * w[:, None]).reshape(-1))

        # B^-1 = I + A + A^2 + ... (FINITE series: A is strictly lower
        # triangular in the Vecchia ordering, so it is nilpotent and the
        # series is exact once J exceeds the neighbor-DAG depth). J=32
        # makes S_J an essentially exact B^-1 for m=20 neighbor graphs
        # (measured ||B S_J v - v||/||v|| ~ 2e-9 at n=20k; J=3 left 40%
        # residual, which both RUINED the vadu preconditioner — inner CG
        # stalled at maxit=1000 with rel resid > 1 — and, written as an
        # unrolled chain, triggered an XLA fusion pathology that made one
        # application cost 180ms vs 3ms as a fori_loop). fori_loop keeps
        # the HLO graph O(1) in J.
        NEUMANN_J = 32

        def _SJ(A, v):
            return jax.lax.fori_loop(
                0, NEUMANN_J, lambda i, t: v + _Av_op(A, t), v)

        def _SJt(A, w):
            return jax.lax.fori_loop(
                0, NEUMANN_J, lambda i, t: w + _Atv_op(A, t), w)

        def _qw_matvec(p, v):
            A, D, W = p
            return _Qv(A, D, v) + W * v

        def _vadu_d(p):
            A, D, W = p
            return jnp.maximum(1.0 / D + W, 1e-10)

        def _precond_vadu(p):
            A, D, W = p
            d = _vadu_d(p)
            return lambda r: _SJ(A, _SJt(A, r) / d)

        def _precond_diag(p):
            A, D, W = p
            pd = jnp.maximum(_diag_Q(A, D) + W, 1e-10)
            return lambda r: r / pd

        pc_type = self.cg_preconditioner_type
        cov_fn = self.comp.cov_fn
        coords_d = jnp.asarray(self._vecchia.coords_ord, self.dtype)
        k_rank = min(self.piv_chol_rank, n)

        def _precond_pivchol(p, theta_log):
            """(L L' + eps I)^-1 + W applied by nested Woodbury identities:
            P^-1 r = G r - G (W^-1 + G)^-1 G r,  G = L L' + eps I,
            (W^-1 + eps + L L')^-1 = E - E L (I + L' E L)^-1 L' E,
            E = diag(W / (1 + eps W))  (all O(n k) dense matmuls)."""
            A, D, W = p
            var = jnp.exp(theta_log[0])
            alphas = jnp.exp(theta_log[1:])
            L, d_rem = pivoted_cholesky_kernel(
                coords_d, var, lambda dist: cov_fn.corr_from_dist(dist,
                                                                  alphas),
                k_rank)
            eps = jnp.maximum(jnp.mean(d_rem), 1e-10 * var)
            Wp = jnp.maximum(W, 1e-10)
            E = Wp / (1.0 + eps * Wp)
            EL = E[:, None] * L
            Ik = jnp.eye(k_rank, dtype=L.dtype)
            M_small = Ik + L.T @ EL
            Lc = jnp.linalg.cholesky(M_small)

            def apply(r):
                Gr = L @ (L.T @ r) + eps * r
                u = E * Gr - EL @ jsl.cho_solve((Lc, True), EL.T @ Gr)
                Gu = L @ (L.T @ u) + eps * u
                return Gr - Gu

            return apply

        def _solve_qw_vecchia_response(A, D, W, rhs, theta_log,
                                       want_it=False):
            """(Q + W) x = rhs via the reference's 'Sigma plus W^-1'
            reformulation (CGVecchiaLaplace_Version_SigmaPlusWinvVec,
            CG_utils.h:233): the SPD identity (Sigma + W^-1)(W x) = Sigma r
            turns the solve into a system whose matrix the
            'vecchia_response' factors precondition DIRECTLY —
            P = B~^-1 D~ B~^-T ~ Sigma + W^-1 with (B~, D~) the Vecchia
            factors of the latent covariance plus pseudo-nugget W^-1
            (CalcVecchiaApproxLatentAddDiagonal, re_model_template.h:7465).
            P^-1 r = B~'(D~^-1(B~ r)) is one gather + one scatter. Note the
            Vecchia-response factors must NOT enter a Woodbury subtraction
            for (Q+W)^-1 (their O(25%) approximation error makes that
            indefinite — measured); as a congruent preconditioner the same
            error is harmless. Unlike the reference, gradients still flow
            with this preconditioner: the SLQ log-det rides the vadu
            congruence regardless (class comment)."""
            Wp = jnp.maximum(W, 1e-10)
            At, Dt = self._vecchia._bd_add_diag(theta_log, 1.0 / Wp)

            def sigma_apply(v):            # Sigma v = B^-1 (D (B^-T v))
                return _SJ(A, D * _SJt(A, v))

            def mv(v):
                return sigma_apply(v) + v / Wp

            def pre(r):
                return _Btv(At, _Bv(At, r) / Dt)

            from ..ops.iterative import pcg_it as _pcg_it
            if want_it:
                u, it = _pcg_it(mv, sigma_apply(rhs), precond=pre,
                                tol=cg_tol, maxit=cg_maxit)
                return u / Wp, it
            u = pcg(mv, sigma_apply(rhs), precond=pre, tol=cg_tol,
                    maxit=cg_maxit)
            return u / Wp

        def _make_precond(p, theta_log=None):
            if pc_type == "vadu":
                return _precond_vadu(p)
            if pc_type == "pivoted_cholesky" and theta_log is not None:
                return _precond_pivchol(p, theta_log)
            if pc_type == "vecchia_response" and theta_log is not None:
                return _precond_vecchia_response(p, theta_log)
            if pc_type in ("diagonal", "pivoted_cholesky",
                           "vecchia_response"):
                return _precond_diag(p)
            return lambda r: r

        # SLQ log-det always rides the vadu congruence (exact identity for
        # every truncation order; see class comment) — pivoted_cholesky only
        # changes the CG solves, matching its role in the reference
        slq_logdet = make_slq_logdet_congruence(
            _qw_matvec,
            lambda p, v: _SJ(p[0], v / jnp.sqrt(_vadu_d(p))),
            lambda p, w: _SJt(p[0], w) / jnp.sqrt(_vadu_d(p)),
            lambda p: jnp.sum(jnp.log(_vadu_d(p))),
            _precond_vadu, n,
            rank=min(n, 50), num_probes=self.num_rand_vec_trace,
            seed=self.seed_rand_vec_trace, dtype=self.dtype)

        cg_tol = self.cg_delta_conv
        cg_maxit = self.cg_max_num_it

        from ..ops.iterative import pcg_it

        def _solve_qw(A, D, W, rhs, x0=None, theta_log=None):
            if pc_type == "vecchia_response" and theta_log is not None:
                return _solve_qw_vecchia_response(A, D, W, rhs, theta_log)
            pre = _make_precond((A, D, W), theta_log)
            return pcg(lambda v: _qw_matvec((A, D, W), v), rhs,
                       precond=pre, tol=cg_tol, maxit=cg_maxit,
                       x0=x0)

        def _solve_qw_it(A, D, W, rhs, x0=None, theta_log=None):
            if pc_type == "vecchia_response" and theta_log is not None:
                return _solve_qw_vecchia_response(A, D, W, rhs, theta_log,
                                                  want_it=True)
            pre = _make_precond((A, D, W), theta_log)
            return pcg_it(lambda v: _qw_matvec((A, D, W), v), rhs,
                          precond=pre, tol=cg_tol,
                          maxit=cg_maxit, x0=x0)

        self._solve_qw = _solve_qw

        # ---- mode finding: Newton with PCG inner solves ------------------
        def _mode_solve(A, D, aux, y, F, b_init, theta_log=None):
            F1, F2 = _split_F(F)
            obj0 = -0.5 * (b_init @ _Qv(A, D, b_init)) \
                + _loglik(y, b_init + F1, F2, aux)

            def newton_body(carry):
                b, obj, it, done, cg = carry
                loc = b + F1
                d1 = _d1(y, loc, F2, aux)
                W = _W_mode(y, loc, F2, aux)
                grad = d1 - _Qv(A, D, b)
                delta, cg_it = _solve_qw_it(A, D, W, grad,
                                            theta_log=theta_log)
                cg = cg + cg_it
                gdd = grad @ delta

                def bt_cond(bt):
                    lr, ih, acc, _, _ = bt
                    return jnp.logical_and(~acc, ih < MAX_LR_SHRINK_MODE)

                def bt_body(bt):
                    lr, ih, _, _, _ = bt
                    b_new = b + lr * delta
                    obj_new = -0.5 * (b_new @ _Qv(A, D, b_new)) \
                        + _loglik(y, b_new + F1, F2, aux)
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
                return (b_new, obj_new, it + 1, jnp.logical_or(conv, bad),
                        cg)

            b_fin, _, nit, _, cg_tot = jax.lax.while_loop(
                lambda c: jnp.logical_and(~c[3], c[2] < MAXIT_MODE_NEWTON),
                newton_body, (b_init, obj0, 0, False, 0))
            return b_fin, nit, cg_tot

        def _g(u, F, b, y):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            A, D = self._vecchia._bd(theta_log, latent=True)
            F1, F2 = _split_F(F)
            loc = b + F1
            W = _W(y, loc, F2, aux)
            logdetQ = -jnp.sum(jnp.log(D))
            return (0.5 * (b @ _Qv(A, D, b)) - _loglik(y, loc, F2, aux)
                    + 0.5 * (slq_logdet((A, D, W)) - logdetQ))

        def _r(u, F, b, y):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            A, D = self._vecchia._bd(theta_log, latent=True)
            F1, F2 = _split_F(F)
            return _Qv(A, D, b) - _d1(y, b + F1, F2, aux)

        @jax.custom_vjp
        def nll_fn(u, F, y, b_init):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            A, D = self._vecchia._bd(theta_log, latent=True)
            b, nit, cg = _mode_solve(A, D, aux, y, F, b_init,
                                       theta_log=theta_log)
            return _g(u, F, b, y), (b, jnp.stack([nit, cg]))

        def nll_fwd(u, F, y, b_init):
            out = nll_fn(u, F, y, b_init)
            return out, (u, F, y, out[1][0])

        def nll_bwd(res, ct):
            ct_nll = ct[0]
            u, F, y, b = res
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            A, D = self._vecchia._bd(theta_log, latent=True)
            F1, F2 = _split_F(F)
            W = _W(y, b + F1, F2, aux)
            g_u, g_F, g_b = jax.grad(_g, argnums=(0, 1, 2))(u, F, b, y)
            lam = _solve_qw(A, D, W, g_b, theta_log=theta_log)
            _, r_vjp = jax.vjp(lambda uu, FF: _r(uu, FF, b, y), u, F)
            ru_l, rF_l = r_vjp(lam)
            return ((g_u - ru_l) * ct_nll, (g_F - rF_l) * ct_nll, None, None)

        nll_fn.defvjp(nll_fwd, nll_bwd)

        self._nll_fn = lifted_jit(nll_fn)
        self._nll_raw = nll_fn   # traceable closure for the fully
        # on-device GD loop (models/jit_gd.py gd_fit_laplace_engine)
        self._vag = lifted_jit(jax.value_and_grad(nll_fn, argnums=0, has_aux=True))
        self._vag_F = lifted_jit(jax.value_and_grad(nll_fn, argnums=(0, 1),
                                                 has_aux=True))
        self._W_fn = _W
        self._d1_fn = _d1

    # ------------------------------------------------------------------
    def _predict_iterative(self, u, yp, Fp, b, pred_data, predict_var,
                           predict_response, F_pred):
        """Neighbor-based Vecchia prediction for the iterative engine
        (CalcPredVecchiaObservedFirstOrder + simulation-based predictive
        variances, re_model.h:385 nsim_var_pred): each prediction point
        conditions on its num_neighbors nearest OBSERVED points; posterior
        variances via CG sampling from N(mode, (Q+W)^-1)."""
        from scipy.spatial import cKDTree
        from .vecchia import _corr_sets, _solve_sets

        theta_log = jnp.asarray(u[:self.num_theta], self.dtype)
        aux_d = jnp.exp(jnp.asarray(u[self.num_theta:], self.dtype))
        t0 = float(np.exp(u[0]))                     # latent variance
        m_nb = self._vecchia.m
        cp = np.asarray(pred_data["comps"][0]["coords_pred"], dtype=np.float64)
        if cp.ndim == 1:
            cp = cp[:, None]
        n_pred = len(cp)
        co = self._vecchia.coords_ord
        tree = cKDTree(co)
        _, idx_p = tree.query(cp, k=min(m_nb, self.n))
        idx_p = np.atleast_2d(idx_p)
        if idx_p.shape[1] < m_nb:
            idx_p = np.pad(idx_p, ((0, 0), (0, m_nb - idx_p.shape[1])),
                           mode="edge")
        idx_p = jnp.asarray(idx_p)

        cn = jnp.asarray(co, self.dtype)[idx_p]          # (n_pred, m, d)
        ci = jnp.asarray(cp, self.dtype)
        alphas = jnp.exp(theta_log[1:])
        corr_nn, corr_ni = _corr_sets(self.comp.cov_fn, cn, ci, alphas)
        K_nn = t0 * corr_nn + 1e-10 * jnp.eye(m_nb, dtype=self.dtype)[None]
        k_ni = t0 * corr_ni
        a_p = _solve_sets(K_nn, k_ni, m_nb)              # (n_pred, m)
        d_p = t0 - jnp.sum(a_p * k_ni, axis=1)           # latent cond. var

        mu_p = jnp.sum(a_p * b[idx_p], axis=1)

        var_p = None
        if predict_var or predict_response:
            # simulation-based posterior variances: samples of
            # b_s - mode ~ N(0, (Q+W)^-1) via (Q+W) x = Q^1/2 u1 + W^1/2 u2,
            # Q^1/2 u = B'(D^-1/2 u)  (rhs covariance = Q + W)
            A, D = self._vecchia._bd(theta_log, latent=True)
            F1 = Fp[: self.n] if self.num_sets_fe == 2 else Fp
            F2 = Fp[self.n:] if self.num_sets_fe == 2 else None
            W = self._W_fn(yp, b + F1, F2, aux_d) \
                if self.num_sets_fe == 2 else self._W_fn(yp, b + Fp, None, aux_d)
            Wp_ = jnp.maximum(W, 0.0)
            rng = np.random.RandomState(self.seed_rand_vec_trace)
            nsim = self.nsim_var_pred
            u1 = jnp.asarray(rng.standard_normal((nsim, self.n)), self.dtype)
            u2 = jnp.asarray(rng.standard_normal((nsim, self.n)), self.dtype)

            def draw(us):
                u1i, u2i = us
                rhs = self._Btv(A, u1i / jnp.sqrt(D)) + jnp.sqrt(Wp_) * u2i
                return self._solve_qw(A, D, W, rhs, theta_log=theta_log)

            xs = jax.lax.map(draw, (u1, u2))             # (nsim, n)
            proj = jnp.einsum("pm,spm->sp", a_p, xs[:, idx_p])
            var_p = d_p + jnp.var(proj, axis=0)

        mu_np = np.asarray(mu_p)
        if F_pred is not None:
            Fpr = np.asarray(F_pred)
            if self.num_sets_fe == 2:
                F1_pred, zeta_pred = Fpr[:n_pred], Fpr[n_pred:]
            else:
                F1_pred, zeta_pred = Fpr, None
        else:
            F1_pred = np.zeros(n_pred)
            zeta_pred = np.zeros(n_pred) if self.num_sets_fe == 2 else None
        mu_tot = mu_np + F1_pred
        if predict_response:
            var_lat = jnp.maximum(jnp.asarray(var_p), 0.0)
            if self.num_sets_fe == 2:
                m_, v_ = self.likelihood.response_mean_var2(
                    jnp.asarray(mu_tot), var_lat, jnp.asarray(zeta_pred),
                    aux_d)
            else:
                m_, v_ = self.likelihood.response_mean_var(
                    jnp.asarray(mu_tot), var_lat, aux_d)
            out = {"mu": np.asarray(m_)}
            if predict_var:
                out["var"] = np.asarray(v_)
            return out
        out = {"mu": mu_tot}
        if predict_var:
            out["var"] = np.asarray(var_p)
        return out
