"""Iterative full-scale Vecchia (FSVA / VIF) Gaussian engine at scale.

Reference: the FSVA machinery of re_model_template.h (gp_approx =
"full_scale_vecchia"): inducing-point predictive process plus a Vecchia
approximation of the residual process, estimated with CG + stochastic
log-determinants and the `vifdu` preconditioner (re_model_template.h:5866;
CG solvers CG_utils.h:208-318). The dense small-n parity formulation is
ops/taper.VIFCovarianceFunction + DenseGaussianEngine; this engine is the
O(n·(m + m_ip)) scale path.

TPU-first formulation — congruence by the Vecchia factor B (det B = 1):

    Sigma_y / sigma2 = I + v (V'V + B^-1 D B^-T),   V = L_uu^-1 K_uf
    T := B (Sigma_y / sigma2) B' = B B' + v Vt' Vt + v diag(D),
    Vt = V B'   (computable as a pure GATHER: Vt[:,t] = V[:,t]
                 - sum_j A[t,j] V[:, idx[t,j]])

so the Vecchia residual becomes EXACTLY diagonal, no triangular solves or
Neumann series appear anywhere, and every CG matvec is one neighbor gather,
one scatter (B B'), and two (m_ip, n) MXU matmuls:

    quad:   y' (Sigma/sigma2)^-1 y = (By)' T^-1 (By)
    logdet: log|Sigma/sigma2| = log|T|            (|B| = 1)

The `vifdu` preconditioner is the low-rank-plus-diagonal (FITC-style)
capture of T: P = v Vt'Vt + diag(BB') + v D, applied through the same
eigendecomposition factor as the FSA engine's fitc preconditioner, with an
exact log-determinant for the SLQ congruence.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..ops.jit_utils import lifted_jit
from ..ops.iterative import make_slq_logdet_congruence, make_cg_solve_precond

_JITTER = 1e-10


class FSVAIterativeGaussianEngine:
    """Gaussian marginal NLL / gradients / prediction for
    gp_approx='full_scale_vecchia' at scale."""

    is_gaussian = True
    matrix_inversion_method = "iterative"

    def __init__(self, components, num_data, dtype=jnp.float64,
                 num_rand_vec_trace=50, cg_max_num_it=1000,
                 cg_delta_conv=1e-6, seed_rand_vec_trace=1,
                 nsim_var_pred=500, cg_preconditioner_type="vifdu",
                 **_unused):
        assert len(components) == 1 and components[0].kind == "gp", \
            "iterative FSVA supports a single GP component"
        self.comp = components[0]
        self.components = [self.comp]
        self.n = int(num_data)
        self.dtype = dtype
        adapter = self.comp.cov_fn              # VIFCovarianceFunction
        self.base = adapter.base
        if not self.base.is_isotropic:
            raise NotImplementedError(
                "iterative FSVA requires an isotropic base kernel; use "
                "matrix_inversion_method='cholesky'")
        self.num_theta = self.comp.num_cov_par
        self.num_cov_par = self.num_theta + 1
        self.par_offsets = [0]
        self.num_rand_vec_trace = int(num_rand_vec_trace)
        self.cg_max_num_it = int(cg_max_num_it)
        self.cg_delta_conv = float(cg_delta_conv)
        self.seed_rand_vec_trace = int(seed_rand_vec_trace)
        self.nsim_var_pred = int(nsim_var_pred)
        _aliases = {"predictive_process_plus_diagonal": "vifdu",
                    "fitc": "vifdu"}
        self.cg_preconditioner_type = _aliases.get(cg_preconditioner_type,
                                                   cg_preconditioner_type)
        if self.cg_preconditioner_type not in ("vifdu", "none"):
            raise ValueError(
                f"cg_preconditioner_type '{cg_preconditioner_type}' is not "
                "supported for iterative full_scale_vecchia; use 'vifdu' "
                "or 'none' (re_model_template.h:5866)")

        coords = np.asarray(adapter.train_coords, dtype=np.float64)
        ip = np.asarray(adapter.ip, dtype=np.float64)
        self.m_ip = len(ip)
        self.m_nn = adapter.m_nn
        self._nn_idx = adapter._nn_idx                 # (n, m)
        self._nn_mask = adapter._nn_mask
        self._coords_d = jnp.asarray(coords, dtype)
        d_uu = np.sqrt(((ip[:, None, :] - ip[None, :, :]) ** 2).sum(-1))
        d_un = np.sqrt(((ip[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
        self._d_uu = jnp.asarray(d_uu, dtype)
        self._d_un = jnp.asarray(d_un, dtype)
        # blocked row passes: each block materializes (B, m, m_ip) gathers
        self._ublk = max(8, min(4096,
                                int(2e7 // max(1, self.m_nn * self.m_ip))))
        self._build_jitted()

    # ------------------------------------------------------------------
    def _factors(self, theta_log):
        """Differentiable per-theta pieces: residual Vecchia (A, D), the
        congruence-transformed inducing block Vt = V B', and the
        (stop-gradient) vifdu preconditioner factorization."""
        dt = self.dtype
        n, m, m_ip = self.n, self.m_nn, self.m_ip
        v = jnp.exp(theta_log[0])
        alphas = jnp.exp(theta_log[1:])
        Kuu = self.base.corr_from_dist(self._d_uu, alphas) \
            + _JITTER * jnp.eye(m_ip, dtype=dt)
        Luu = jnp.linalg.cholesky(Kuu)
        E = jsl.solve_triangular(
            Luu, self.base.corr_from_dist(self._d_un, alphas),
            lower=True)                                       # (m_ip, n)
        ET = E.T

        idx, mask = self._nn_idx, self._nn_mask
        coords_d = self._coords_d
        B = self._ublk
        n_pad = -(-n // B) * B
        pad = ((0, n_pad - n), (0, 0))
        idx_p = jnp.pad(idx, pad)
        mask_p = jnp.pad(mask, pad)
        ci_p = jnp.pad(coords_d, pad)
        ET_p = jnp.pad(ET, pad)

        # checkpoint: the (B, m, m_ip) gathered blocks are recomputed in
        # the backward pass instead of being saved across all blocks
        @jax.checkpoint
        def blk(args):
            idx_b, mask_b, ci_b, e_b = args
            cn = coords_d[idx_b]                              # (B, m, d)
            dn = jnp.sqrt(jnp.maximum(
                ((cn[:, :, None, :] - cn[:, None, :, :]) ** 2).sum(-1), 0))
            dni = jnp.sqrt(jnp.maximum(
                ((cn - ci_b[:, None, :]) ** 2).sum(-1), 0))
            c_nn = self.base.corr_from_dist(dn, alphas)
            c_ni = self.base.corr_from_dist(dni, alphas)
            G = ET[idx_b]                                     # (B, m, m_ip)
            r_nn = c_nn - jnp.einsum("bik,bjk->bij", G, G)
            r_ni = c_ni - jnp.einsum("bik,bk->bi", G, e_b)
            r_ii = 1.0 - jnp.sum(e_b * e_b, axis=1)
            pair = mask_b[:, :, None] & mask_b[:, None, :]
            eye = jnp.eye(m, dtype=dt)[None]
            r_nn = jnp.where(pair, r_nn, eye) + _JITTER * eye
            r_ni = jnp.where(mask_b, r_ni, 0.0)
            L = jnp.linalg.cholesky(r_nn)
            A_b = jsl.cho_solve((L, True), r_ni[..., None])[..., 0]
            A_b = jnp.where(mask_b, A_b, 0.0)
            D_b = jnp.maximum(r_ii - jnp.sum(A_b * r_ni, axis=1), 1e-12)
            # Vt block: Vt[:, t] = V[:, t] - sum_j A[t, j] V[:, idx[t, j]]
            VtT_b = e_b - jnp.einsum("bj,bjk->bk", A_b, G)
            return A_b, D_b, VtT_b

        A_p, D_p, VtT_p = jax.lax.map(
            blk, (idx_p.reshape(-1, B, m), mask_p.reshape(-1, B, m),
                  ci_p.reshape(-1, B, coords_d.shape[1]),
                  ET_p.reshape(-1, B, m_ip)))
        A = A_p.reshape(n_pad, m)[:n]
        D = D_p.reshape(n_pad)[:n]
        Vt = VtT_p.reshape(n_pad, m_ip)[:n].T                 # (m_ip, n)

        # ---- vifdu preconditioner (gradients stopped) -------------------
        diag_BBt = 1.0 + jnp.sum(A * A, axis=1)
        Dhat = jax.lax.stop_gradient(diag_BBt + v * D)
        Dinvs = 1.0 / jnp.sqrt(Dhat)
        if self.cg_preconditioner_type == "vifdu":
            Zt = jax.lax.stop_gradient(jnp.sqrt(v) * Vt) * Dinvs[None, :]
            G = Zt @ Zt.T
            lam, Q = jnp.linalg.eigh(G)
            lam = jnp.maximum(lam, 0.0)
            W = Q.T @ Zt                                      # (m_ip, n)
            f = jnp.where(lam > 1e-10,
                          (1.0 - 1.0 / jnp.sqrt(1.0 + lam))
                          / jnp.maximum(lam, 1e-10),
                          0.5 - 3.0 * lam / 8.0)
            ldp = jnp.sum(jnp.log(Dhat)) + jnp.sum(jnp.log1p(lam))
            pc = {"Dinvs": Dinvs, "W": W, "f": f, "ldp": ldp}
        else:
            pc = {"Dinvs": jnp.ones(n, dt), "W": None, "f": None,
                  "ldp": jnp.asarray(0.0, dt)}
        return {"A": A, "D": D, "Vt": Vt, "v": v, "pc": pc}

    # ------------------------------------------------------------------
    def _build_jitted(self):
        n = self.n
        dt = self.dtype
        idx = self._nn_idx
        flat_idx = idx.reshape(-1)
        vifdu = self.cg_preconditioner_type == "vifdu"

        def B_apply(A, x):
            return x - jnp.sum(A * x[idx], axis=1)

        def Bt_apply(A, w):
            return w - jnp.zeros_like(w).at[flat_idx].add(
                (A * w[:, None]).reshape(-1))

        self._B_apply, self._Bt_apply = B_apply, Bt_apply

        def matvec(p, x):
            """T x = B B' x + v Vt'(Vt x) + v D x."""
            r = B_apply(p["A"], Bt_apply(p["A"], x))
            r = r + p["v"] * (p["Vt"].T @ (p["Vt"] @ x))
            return r + p["v"] * p["D"] * x

        def m_apply(p, x):
            pc = p["pc"]
            if vifdu:
                x = x - pc["W"].T @ (pc["f"] * (pc["W"] @ x))
            return pc["Dinvs"] * x

        def mt_apply(p, x):
            pc = p["pc"]
            x = pc["Dinvs"] * x
            if vifdu:
                x = x - pc["W"].T @ (pc["f"] * (pc["W"] @ x))
            return x

        def precond(p):
            return lambda r: m_apply(p, mt_apply(p, r))

        chunk = max(1, min(self.num_rand_vec_trace,
                           int(2e8 // max(1, n * (self.m_nn + self.m_ip)))))
        slq = make_slq_logdet_congruence(
            matvec, m_apply, mt_apply, lambda p: p["pc"]["ldp"], precond,
            n, rank=min(n, 50), num_probes=self.num_rand_vec_trace,
            seed=self.seed_rand_vec_trace, dtype=dt, probe_chunk=chunk,
            cg_tol=max(self.cg_delta_conv, 1e-4 if n > 50_000 else 0.0),
            cg_maxit=self.cg_max_num_it)
        solve = make_cg_solve_precond(matvec, precond,
                                      tol=self.cg_delta_conv,
                                      maxit=self.cg_max_num_it)
        self._matvec, self._precond, self._solve = matvec, precond, solve

        def solve_sigma(p, x):
            """(Sigma/sigma2)^-1 x = B' T^-1 (B x)."""
            return Bt_apply(p["A"], solve(p, B_apply(p["A"], x)))

        self._solve_sigma = solve_sigma

        def quad_logdet(theta_log, y):
            p = self._factors(theta_log)
            By = B_apply(p["A"], y)
            x = solve(p, By)
            return By @ x, slq(p)

        def nll_parts(theta_log, sigma2, y):
            quad, logdet = quad_logdet(theta_log, y)
            return 0.5 * (quad / sigma2 + logdet + n * jnp.log(sigma2)
                          + n * math.log(2.0 * math.pi)), quad

        def nll_scalar(theta_log, sigma2, y):
            return nll_parts(theta_log, sigma2, y)[0]

        def nll_full(u, y):
            return nll_scalar(u[1:], jnp.exp(u[0]), y)

        def _cast(*args):
            return tuple(jnp.asarray(a, dt) for a in args)

        self.nll_parts_raw = lambda t, s2, y: nll_parts(*_cast(t, s2, y))
        self.prep_y_gd = lambda y: jnp.asarray(
            np.asarray(y, dtype=np.float64), dt)
        self.nll_parts = lifted_jit(lambda t, s, y: nll_parts(*_cast(t, s, y)))
        self.grad_profiled = lifted_jit(
            lambda t, s, y: jax.value_and_grad(nll_scalar)(*_cast(t, s, y)))
        self.vag_full = lifted_jit(
            lambda u, y: jax.value_and_grad(nll_full)(*_cast(u, y)))

        def nll_profiled(theta_log, y):
            quad, logdet = quad_logdet(theta_log, y)
            return 0.5 * (logdet + n * jnp.log(quad / n) + n
                          + n * math.log(2.0 * math.pi)), quad

        self.nll_profiled_vag = lifted_jit(
            lambda t, y: jax.value_and_grad(nll_profiled,
                                            has_aux=True)(*_cast(t, y)))
        self.nll_profiled_raw = lambda t, y: nll_profiled(*_cast(t, y))
        self.nll_scalar_raw = lambda t, s2, y: nll_scalar(*_cast(t, s2, y))

        def nll_orig(log_pars_orig, y):
            theta_log, sigma2 = self._orig_to_internal_jnp(
                jnp.exp(log_pars_orig))
            return nll_scalar(theta_log, sigma2, y)

        self.nll_orig_vag = lifted_jit(
            lambda lp, y: jax.value_and_grad(nll_orig)(*_cast(lp, y)))

        def wls_coef(theta_log, y, X):
            p = self._factors(theta_log)
            MiX = jax.lax.map(lambda c: solve_sigma(p, c), X.T).T
            Miy = solve_sigma(p, y)
            Amat = X.T @ MiX
            La = jnp.linalg.cholesky(Amat)
            return jsl.cho_solve((La, True), X.T @ Miy)

        self.wls_coef = lifted_jit(wls_coef)
        self.wls_coef_raw = wls_coef

        def coef_grad(theta_log, sigma2, resid, X):
            p = self._factors(theta_log)
            return -(X.T @ solve_sigma(p, resid)) / sigma2

        self.coef_grad = lifted_jit(coef_grad)

        def fisher_transformed(u, include_error_var=True):
            raise NotImplementedError(
                "fisher_scoring is not supported with iterative "
                "full_scale_vecchia; use lbfgs or gradient_descent")

        self.fisher_transformed = fisher_transformed

        def hess_full(u, y):
            raise NotImplementedError(
                "optimizer_cov='newton' is not supported with iterative "
                "full_scale_vecchia; use lbfgs or gradient_descent")

        self.hess_full = hess_full

    # ------------------------------------------------------------------
    # parameter transforms (identical semantics to the FSA engine)
    def _orig_to_internal_jnp(self, pars_orig):
        from .gaussian_gp import _range_to_transformed_jnp
        sigma2 = pars_orig[0]
        v = pars_orig[1]
        rho = pars_orig[2: 1 + self.num_theta]
        alpha = _range_to_transformed_jnp(self.comp, rho, var=v)
        return jnp.concatenate([jnp.log(v / sigma2)[None],
                                jnp.log(alpha)]), sigma2

    def transform_pars(self, pars_orig):
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        sigma2 = pars_orig[0]
        out = [sigma2, pars_orig[1] / sigma2]
        if self.num_theta > 1:
            out.extend(np.atleast_1d(
                self.comp.cov_fn.range_to_transformed(pars_orig[2:],
                                                      var=pars_orig[1])))
        return np.asarray(out)

    def back_transform_pars(self, pars_internal):
        t = np.asarray(pars_internal, dtype=np.float64)
        out = [t[0], t[1] * t[0]]
        if self.num_theta > 1:
            out.extend(np.atleast_1d(
                self.comp.cov_fn.range_from_transformed(t[2:],
                                                        var=t[1] * t[0])))
        return np.asarray(out)

    def total_re_variance_original(self, pars_orig):
        return float(pars_orig[1])

    def apply_nugget_lower_bound(self, pars_internal):
        r = 1e-10
        orig = self.back_transform_pars(pars_internal)
        other_var = self.total_re_variance_original(orig)
        if not np.isfinite(other_var) or other_var <= 0:
            return pars_internal
        nugget_min = r / (1.0 - r) * other_var
        if np.isfinite(nugget_min) and orig[0] < nugget_min:
            orig[0] = nugget_min
            return self.transform_pars(orig)
        return pars_internal

    def neg_log_likelihood(self, pars_orig, y):
        t = self.transform_pars(pars_orig)
        nll, _ = self.nll_parts(jnp.asarray(np.log(t[1:]), self.dtype),
                                jnp.asarray(t[0], self.dtype),
                                jnp.asarray(y, self.dtype))
        return float(nll)

    def fisher_original(self, pars_orig):
        """Std-error FI: dense (exact) proxy at moderate n; NaN at scale —
        mirrors the reference, which does not support std errors for
        full_scale_vecchia at all (re_model_template.h:1811 REFatal)."""
        if self.n > 4000:
            return jnp.full((self.num_cov_par, self.num_cov_par), jnp.nan)
        from .gaussian_gp import DenseGaussianEngine
        dense = DenseGaussianEngine([self.comp], self.n, dtype=self.dtype)
        return dense.fisher_original(jnp.asarray(pars_orig, self.dtype))

    # ------------------------------------------------------------------
    def predict(self, pars_orig, y_resid, pred_data, predict_var=False,
                predict_cov_mat=False, predict_response=False):
        """Posterior predictive mean / (co)variance: exact-kernel cross
        covariances (the VIF adapter anchors the residual Vecchia graph to
        the training rows, ops/taper.py corr_from_coords), training solves
        through the congruence-CG."""
        from .gaussian_gp import assemble_pred_covs
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        sigma2 = pars_orig[0]
        t = self.transform_pars(pars_orig)
        theta_log = jnp.asarray(np.log(t[1:]), dtype=self.dtype)
        y_resid = jnp.asarray(y_resid, dtype=self.dtype)
        p = self._factors(theta_log)
        K_cross, K_pred = assemble_pred_covs(
            self.components, self.par_offsets, [pars_orig[1]],
            theta_log, pred_data, self.n, self.dtype)
        n_pred = pred_data["n_pred"]
        alpha_v = self._solve_sigma(p, y_resid) / sigma2
        mu = K_cross.T @ alpha_v
        out = {"mu": np.asarray(mu)}
        if predict_cov_mat or predict_var:
            V = jax.lax.map(lambda c: self._solve_sigma(p, c),
                            K_cross.T).T / sigma2
            cov = K_pred - K_cross.T @ V
            if predict_response:
                cov = cov + sigma2 * jnp.eye(n_pred, dtype=self.dtype)
            if predict_cov_mat:
                out["cov"] = np.asarray(cov)
            if predict_var:
                out["var"] = np.asarray(jnp.diagonal(cov)).copy()
        return out

    def training_re(self, pars_orig, y_resid, predict_var=False):
        """Posterior mean of the GP at the training points: with
        y_aux = (Sigma/sigma2)^-1 resid, mean = resid - y_aux (identity
        derived from the congruence: B^-1 T (T^-1 B resid) = resid)."""
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        t = self.transform_pars(pars_orig)
        theta_log = jnp.asarray(np.log(t[1:]), dtype=self.dtype)
        p = self._factors(theta_log)
        y_aux = self._solve_sigma(p, jnp.asarray(y_resid, self.dtype))
        if predict_var:
            raise NotImplementedError(
                "predict_training_data_random_effects with predict_var=True "
                "is not supported with iterative full_scale_vecchia")
        return np.asarray(jnp.asarray(y_resid, self.dtype) - y_aux)[:, None], None
