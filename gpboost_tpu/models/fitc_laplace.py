"""FITC-Laplace engine: non-Gaussian likelihoods with a FITC (predictive
process + diagonal residual) latent GP.

Reference: likelihoods.h:4028 FindModePostRandEffCalcMLLFITC, :7000
CalcGradNegMargLikelihoodLaplaceApproxFITC, :8200 PredictLaplaceApproxFITC;
FITC structures re_model_template.h:7751 (CreateREComponentsFITC_FSA),
fitc_resid_diag_ :6049.

Latent prior: Sigma = diag(dd) + U U' with U = sqrt(v) (L_uu^{-1} K_uf)' and
dd the FITC diagonal residual. Every operation is Woodbury-structured
O(n m^2) — no n x n matrix is ever formed, so this is the non-Gaussian
approximation that scales on TPU via dense tall-skinny matmuls (MXU):

    Sigma^{-1} v  : diag + rank-m correction (m x m Cholesky)
    (Sigma^{-1}+W)^{-1} r : second Woodbury with G = diag(1/dd + w)
    log det(I + W Sigma) = sum log(1+w dd) + log det(I_m + U'(w/(1+w dd))U)

Gradients via the same implicit-function-theorem custom_vjp as the dense /
Vecchia Laplace engines.
"""

from ..ops.jit_utils import lifted_jit
import math

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .fitc import FITCGaussianEngine, JITTER

DELTA_CONV_MODE = 1e-8
MAXIT_MODE_NEWTON = 1000
MAX_LR_SHRINK_MODE = 20
C_ARMIJO = 1e-4


class FITCLaplaceEngine:
    """Laplace-approximated NLL with a FITC latent covariance."""

    is_gaussian = False

    def __init__(self, components, num_data, likelihood, num_ind_points=500,
                 ind_points_selection="kmeans++", seed=0, dtype=jnp.float64,
                 weights=None):
        # reuse the Gaussian FITC machinery for inducing points / distances
        self._fitc = FITCGaussianEngine(
            components, num_data, num_ind_points=num_ind_points,
            ind_points_selection=ind_points_selection, seed=seed, dtype=dtype)
        self.components = self._fitc.components
        self.comp = self._fitc.comp
        self.n = self._fitc.n
        self.m = self._fitc.m
        self.ip = self._fitc.ip
        self.dtype = dtype
        self.likelihood = likelihood
        self.num_theta = self.comp.num_cov_par
        self.num_cov_par = self.num_theta
        self.par_offsets = [0]
        self.num_aux = likelihood.num_aux
        self.num_par = self.num_theta + self.num_aux
        self.matrix_inversion_method = "cholesky"
        # per-observation likelihood weights (re_model.h ctor weights)
        self._wobs = None if weights is None else jnp.asarray(
            np.asarray(weights, dtype=np.float64), dtype)
        self._build_jitted()

    # ------------------------------------------------------------------
    def _parts_latent(self, theta_log):
        """(dd (n,), U (n, m)) of the LATENT Sigma = diag(dd) + U U'."""
        cf = self.comp.cov_fn
        v = jnp.exp(theta_log[0])
        alpha = jnp.exp(theta_log[1:])
        K_uu, K_uf = self._fitc._kernel_blocks(alpha)
        K_uu = K_uu + JITTER * jnp.eye(self.m, dtype=self.dtype)
        L_uu = jnp.linalg.cholesky(K_uu)
        V = jsl.solve_triangular(L_uu, K_uf, lower=True)     # (m, n)
        rho = jnp.sum(V * V, axis=0)
        dd = v * jnp.maximum(1.0 - rho, 0.0) + 1e-10
        U = jnp.sqrt(v) * V.T                                # (n, m)
        return dd, U

    def _build_jitted(self):
        n = self.n
        lik = self.likelihood
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

        def _sigma_inv_apply(dd, U, v):
            """Sigma^{-1} v via Woodbury (m x m Cholesky)."""
            e = v / dd
            Mi = jnp.eye(self.m, dtype=self.dtype) \
                + U.T @ (U / dd[:, None])
            L = jnp.linalg.cholesky(Mi)
            return e - (U / dd[:, None]) @ jsl.cho_solve((L, True), U.T @ e)

        def _solve_H(dd, U, w, rhs):
            """(Sigma^{-1} + diag(w))^{-1} rhs, all rank-m."""
            g = 1.0 / dd + w
            Mi = jnp.eye(self.m, dtype=self.dtype) \
                + U.T @ (U / dd[:, None])
            F_ = U / dd[:, None]                       # (n, m)
            S = Mi - F_.T @ (F_ / g[:, None])
            Ls = jnp.linalg.cholesky(S)
            t0 = rhs / g
            t1 = jsl.cho_solve((Ls, True), F_.T @ t0)
            return t0 + (F_ / g[:, None]) @ t1

        def _logdet_ImWSigma(dd, U, w):
            """log det(I + diag(w) Sigma)."""
            s = 1.0 + w * dd
            scale = w / s
            Mw = jnp.eye(self.m, dtype=self.dtype) \
                + U.T @ (U * scale[:, None])
            Lw = jnp.linalg.cholesky(Mw)
            return jnp.sum(jnp.log(s)) \
                + 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lw)))

        def _mode_solve(dd, U, aux, y, F, b_init):
            F1, F2 = _split_F(F)

            def obj_of(b):
                return -0.5 * (b @ _sigma_inv_apply(dd, U, b)) \
                    + _loglik(y, b + F1, F2, aux)

            obj0 = obj_of(b_init)

            def newton_body(carry):
                b, obj, it, done = carry
                loc = b + F1
                d1 = _d1(y, loc, F2, aux)
                w = _W_mode(y, loc, F2, aux)
                grad = d1 - _sigma_inv_apply(dd, U, b)
                delta = _solve_H(dd, U, w, grad)
                gdd = grad @ delta

                def bt_cond(bt):
                    lr, ih, acc, _, _ = bt
                    return jnp.logical_and(~acc, ih < MAX_LR_SHRINK_MODE)

                def bt_body(bt):
                    lr, ih, _, _, _ = bt
                    b_new = b + lr * delta
                    obj_new = obj_of(b_new)
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

            b_fin, _, nit, _ = jax.lax.while_loop(
                lambda c: jnp.logical_and(~c[3], c[2] < MAXIT_MODE_NEWTON),
                newton_body, (b_init, obj0, 0, False))
            return b_fin, nit

        def _g(u, F, b, y):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            dd, U = self._parts_latent(theta_log)
            F1, F2 = _split_F(F)
            loc = b + F1
            w = _W(y, loc, F2, aux)
            return (0.5 * (b @ _sigma_inv_apply(dd, U, b))
                    - _loglik(y, loc, F2, aux)
                    + 0.5 * _logdet_ImWSigma(dd, U, w))

        def _r(u, F, b, y):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            dd, U = self._parts_latent(theta_log)
            F1, F2 = _split_F(F)
            return _sigma_inv_apply(dd, U, b) - _d1(y, b + F1, F2, aux)

        @jax.custom_vjp
        def nll_fn(u, F, y, b_init):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            dd, U = self._parts_latent(theta_log)
            b, nit = _mode_solve(dd, U, aux, y, F, b_init)
            return _g(u, F, b, y), (b, nit)

        def nll_fwd(u, F, y, b_init):
            out = nll_fn(u, F, y, b_init)
            return out, (u, F, y, out[1][0])

        def nll_bwd(res, ct):
            ct_nll = ct[0]
            u, F, y, b = res
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            dd, U = self._parts_latent(theta_log)
            F1, F2 = _split_F(F)
            w = _W(y, b + F1, F2, aux)
            g_u, g_F, g_b = jax.grad(_g, argnums=(0, 1, 2))(u, F, b, y)
            lam = _solve_H(dd, U, w, g_b)
            _, r_vjp = jax.vjp(lambda uu, FF: _r(uu, FF, b, y), u, F)
            ru_l, rF_l = r_vjp(lam)
            return ((g_u - ru_l) * ct_nll, (g_F - rF_l) * ct_nll, None, None)

        nll_fn.defvjp(nll_fwd, nll_bwd)

        self._nll_fn = lifted_jit(nll_fn)
        self._nll_raw = nll_fn   # traceable closure for the fully
        # on-device GD loop (models/jit_gd.py gd_fit_laplace_engine)
        self._vag = lifted_jit(jax.value_and_grad(nll_fn, argnums=0,
                                               has_aux=True))
        self._vag_F = lifted_jit(jax.value_and_grad(nll_fn, argnums=(0, 1),
                                                 has_aux=True))
        self._W_fn = _W
        self._d1_fn = _d1
        self._solve_H_fn = lifted_jit(_solve_H)

    # ------------------------------------------------------------------
    def zero_mode(self):
        return jnp.zeros(self.n, dtype=self.dtype)

    def _cast(self, v):
        return jnp.asarray(np.asarray(v), self.dtype)

    def _note_it(self, nit):
        self.last_num_mode_it = int(nit)
        self.total_num_mode_it = getattr(self, "total_num_mode_it", 0) \
            + int(nit)

    def laplace_nll(self, u, y, F, a_init):
        nll, (b, nit) = self._nll_fn(self._cast(u), self._cast(F),
                                     self._cast(y), a_init)
        self._note_it(nit)
        return float(nll), b

    def laplace_vag(self, u, y, F, a_init):
        (nll, (b, nit)), g = self._vag(self._cast(u), self._cast(F),
                                       self._cast(y), a_init)
        self._note_it(nit)
        return float(nll), np.asarray(g), b

    def laplace_vag_F(self, u, y, F, a_init):
        (nll, (b, nit)), (gu, gF) = self._vag_F(self._cast(u), self._cast(F),
                                                self._cast(y), a_init)
        self._note_it(nit)
        return float(nll), np.asarray(gu), np.asarray(gF), b

    # parameter transforms (sigma2 = 1 for non-Gaussian)
    def transform_pars(self, pars_orig):
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        out = [pars_orig[0]]
        out.extend(np.atleast_1d(
            self.comp.cov_fn.range_to_transformed(pars_orig[1:],
                                                  var=pars_orig[0])))
        return np.asarray(out)

    def back_transform_pars(self, t):
        t = np.asarray(t, dtype=np.float64)
        out = [t[0]]
        out.extend(np.atleast_1d(self.comp.cov_fn.range_from_transformed(
            t[1:], var=t[0])))
        return np.asarray(out)

    def neg_log_likelihood(self, pars_orig, y, aux_pars=None,
                           fixed_effects=None):
        u = np.log(self.transform_pars(pars_orig))
        if self.num_aux:
            if aux_pars is None:
                aux_pars = self.likelihood.init_aux(np.asarray(y))
            else:
                aux_pars = self.likelihood.aux_to_internal(aux_pars)
            u = np.concatenate([u, np.log(np.asarray(aux_pars,
                                                     dtype=np.float64))])
        F = np.zeros(self.n * self.num_sets_fe) if fixed_effects is None \
            else np.asarray(fixed_effects, dtype=np.float64)
        nll, _ = self.laplace_nll(u, y, F, self.zero_mode())
        return nll

    # ------------------------------------------------------------------
    def predict(self, pars_orig, aux_pars, y, F, pred_data, a_init=None,
                predict_var=False, predict_cov_mat=False,
                predict_response=False, F_pred=None, **kwargs):
        """Latent predictions (PredictLaplaceApproxFITC): cross covariance
        through the inducing points, posterior correction rank-m."""
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        t = self.transform_pars(pars_orig)
        u = np.log(t)
        if self.num_aux:
            if aux_pars is None:
                aux_pars = self.likelihood.init_aux(np.asarray(y))
            else:
                aux_pars = self.likelihood.aux_to_internal(aux_pars)
            u = np.concatenate([u, np.log(np.asarray(aux_pars,
                                                     dtype=np.float64))])
        aux_d = jnp.exp(jnp.asarray(u[self.num_theta:], self.dtype))
        theta_log = jnp.asarray(u[:self.num_theta], self.dtype)
        yp = self._cast(y)
        Fp = self._cast(F) if F is not None \
            else jnp.zeros(self.n, self.dtype)
        if a_init is None:
            a_init = self.zero_mode()
        nll, (b, _nit) = self._nll_fn(jnp.asarray(u, self.dtype), Fp, yp,
                                      a_init)

        cf = self.comp.cov_fn
        v = t[0]
        alpha = np.exp(np.asarray(theta_log)[1:])
        cp = np.asarray(pred_data["comps"][0]["coords_pred"],
                        dtype=np.float64)
        if cp.ndim == 1:
            cp = cp[:, None]
        n_pred = len(cp)
        dd, U = self._parts_latent(theta_log)
        dd = np.asarray(dd)
        U = np.asarray(U)
        # U_p = sqrt(v) (L_uu^{-1} K_up)'
        if cf.is_isotropic:
            K_uu = np.asarray(cf.corr_from_dist(self._fitc._d_uu,
                                                jnp.asarray(alpha))) \
                + JITTER * np.eye(self.m)
            d_up = np.sqrt(np.maximum(
                ((np.asarray(self.ip)[:, None, :] - cp[None, :, :]) ** 2
                 ).sum(-1), 0))
            K_up = np.asarray(cf.corr_from_dist(
                jnp.asarray(d_up, self.dtype), jnp.asarray(alpha)))
        else:
            K_uu = np.asarray(cf.corr_from_coords(
                self._fitc._ip_d, self._fitc._ip_d, jnp.asarray(alpha))) \
                + JITTER * np.eye(self.m)
            K_up = np.asarray(cf.corr_from_coords(
                self._fitc._ip_d, jnp.asarray(cp, self.dtype),
                jnp.asarray(alpha)))
        import scipy.linalg as sla
        L_uu = np.linalg.cholesky(K_uu)
        Vp = sla.solve_triangular(L_uu, K_up, lower=True)     # (m, n_pred)
        U_p = math.sqrt(v) * Vp.T                             # (n_pred, m)

        loc = b + Fp
        a = np.asarray(self._d1_fn(yp, loc, None, aux_d))
        w = np.asarray(self._W_fn(yp, loc, None, aux_d))
        mu_p = U_p @ (U.T @ a)
        if F_pred is not None:
            mu_p = mu_p + np.asarray(F_pred, dtype=np.float64)
        out = {"mu": mu_p}
        if predict_var or predict_cov_mat or predict_response:
            # (Sigma + W^{-1})^{-1} = W - W H^{-1} W (H = Sigma^{-1} + W);
            # K_pf = U_p U' is rank m, so only m columns are ever solved
            K_fp = U @ U_p.T                                   # (n, n_pred)
            WK = w[:, None] * K_fp
            HiWK = np.column_stack([
                np.asarray(self._solve_H_fn(jnp.asarray(dd), jnp.asarray(U),
                                            jnp.asarray(w),
                                            jnp.asarray(WK[:, j])))
                for j in range(n_pred)])
            M = WK - w[:, None] * HiWK
            corr = K_fp.T @ M                                  # (np, np)
            q_pp = U_p @ U_p.T
            prior_pp = q_pp + np.diag(np.maximum(v - np.diag(q_pp), 0.0))
            cov = prior_pp - corr
            if predict_cov_mat:
                out["cov"] = cov
            out["var"] = np.maximum(np.diagonal(cov), 0.0).copy()
        if predict_response:
            m_, vv = self.likelihood.response_mean_var(
                jnp.asarray(out["mu"]), jnp.asarray(out["var"]), aux_d)
            out2 = {"mu": np.asarray(m_)}
            if predict_var or predict_cov_mat:
                out2["var"] = np.asarray(vv)
            return out2
        if not predict_var:
            out.pop("var", None)
        return out
