"""FITC / predictive-process approximation engine (Gaussian likelihood).

Reference: re_model_template.h:7594 CreateREComponentsFITC_FSA, :9576
CalcCovFactorFITC_FSA, :11802 CalcPredFITC_FSA; inducing points via kmeans++
(GP_utils.h:521). On the nugget-scaled parameterization:

    Psi_tilde = Ddiag + W W',  W = sqrt(v) K_fu L_uu^-T  (n, m tall-skinny)
    Ddiag_i   = 1 + v (1 - rho_i),  rho_i = k_i' K_uu^-1 k_i

so the NLL is a Woodbury solve through an m x m system — dense tall-skinny
matmuls, the TPU-friendliest of the scalable approximations (SURVEY §7.7).
All gradients by autodiff.
"""

from ..ops.jit_utils import lifted_jit
import math

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

JITTER = 1e-8


def kmeanspp_indices(coords, k, seed=0, n_iter=10):
    """kmeans++ seeding + Lloyd iterations; returns the k cluster centers
    (GP_utils.h:521 kmeans++ inducing point selection)."""
    rng = np.random.RandomState(seed)
    n = len(coords)
    k = min(k, n)
    centers = np.empty((k, coords.shape[1]))
    idx0 = rng.randint(n)
    centers[0] = coords[idx0]
    d2 = ((coords - centers[0]) ** 2).sum(1)
    for j in range(1, k):
        probs = d2 / d2.sum()
        centers[j] = coords[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, ((coords - centers[j]) ** 2).sum(1))
    for _ in range(n_iter):
        d = ((coords[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        assign = np.argmin(d, axis=1)
        for j in range(k):
            pts = coords[assign == j]
            if len(pts):
                centers[j] = pts.mean(0)
    return centers


class FITCGaussianEngine:
    """FITC-approximated Gaussian marginal NLL / gradients / prediction."""

    def __init__(self, components, num_data, num_ind_points=500,
                 ind_points_selection="kmeans++", seed=0, dtype=jnp.float64,
                 weights=None):
        assert len(components) == 1 and components[0].kind == "gp", (
            "gp_approx='fitc' requires exactly one GP component")
        # per-observation weights: nugget_i = sigma2 / w_i (re_model.h ctor)
        self._winv = None if weights is None else jnp.asarray(
            1.0 / np.asarray(weights, dtype=np.float64), dtype)
        self.components = list(components)
        self.comp = components[0]
        self.n = int(num_data)
        self.dtype = dtype
        self.num_theta = self.comp.num_cov_par
        self.num_cov_par = self.num_theta + 1
        self.par_offsets = [0]
        coords = self.comp.coords
        m = min(num_ind_points, self.n)
        if ind_points_selection == "random":
            rng = np.random.RandomState(seed)
            self.ip = coords[rng.choice(self.n, m, replace=False)]
        else:
            self.ip = kmeanspp_indices(coords, m, seed=seed)
        self.m = len(self.ip)
        # theta-independent distances
        d_uu = np.sqrt(np.maximum(((self.ip[:, None] - self.ip[None, :]) ** 2
                                   ).sum(-1), 0))
        d_uf = np.sqrt(np.maximum(
            ((self.ip[:, None, :] - coords[None, :, :]) ** 2).sum(-1), 0))
        self._d_uu = jnp.asarray(d_uu, dtype)
        self._d_uf = jnp.asarray(d_uf, dtype)
        self._ip_d = jnp.asarray(self.ip, dtype)
        self._coords_d = jnp.asarray(coords, dtype)
        self._build_jitted()

    def _kernel_blocks(self, alpha):
        """(K_uu, K_uf) for isotropic (precomputed distances) or general
        (ARD/space-time/coords-based) kernels."""
        cf = self.comp.cov_fn
        if cf.is_isotropic:
            return (cf.corr_from_dist(self._d_uu, alpha),
                    cf.corr_from_dist(self._d_uf, alpha))
        return (cf.corr_from_coords(self._ip_d, self._ip_d, alpha),
                cf.corr_from_coords(self._ip_d, self._coords_d, alpha))

    def _parts(self, theta_log):
        """Ddiag (n,), W (n, m) of Psi_tilde = Ddiag + W W'."""
        cf = self.comp.cov_fn
        v = jnp.exp(theta_log[0])
        alpha = jnp.exp(theta_log[1:])
        K_uu, K_uf = self._kernel_blocks(alpha)
        K_uu = K_uu + JITTER * jnp.eye(self.m, dtype=self.dtype)
        L_uu = jnp.linalg.cholesky(K_uu)
        V = jsl.solve_triangular(L_uu, K_uf, lower=True)   # L^-1 K_uf (m, n)
        rho = jnp.sum(V * V, axis=0)                       # k' Kuu^-1 k
        nug = 1.0 if self._winv is None else self._winv
        Ddiag = nug + v * jnp.maximum(1.0 - rho, 0.0)
        W = jnp.sqrt(v) * V.T                              # (n, m)
        return Ddiag, W, L_uu, V

    def _build_jitted(self):
        n = self.n

        def quad_logdet(theta_log, y):
            Ddiag, W, _, _ = self._parts(theta_log)
            Dy = y / Ddiag
            WtDy = W.T @ Dy
            A = jnp.eye(self.m, dtype=self.dtype) + W.T @ (W / Ddiag[:, None])
            La = jnp.linalg.cholesky(A)
            quad = y @ Dy - WtDy @ jsl.cho_solve((La, True), WtDy)
            logdet = (2.0 * jnp.sum(jnp.log(jnp.diagonal(La)))
                      + jnp.sum(jnp.log(Ddiag)))
            return quad, logdet

        def nll_parts(theta_log, sigma2, y):
            quad, logdet = quad_logdet(theta_log, y)
            nll = 0.5 * (quad / sigma2 + logdet + n * jnp.log(sigma2)
                         + n * math.log(2.0 * math.pi))
            return nll, quad

        def nll_scalar(theta_log, sigma2, y):
            return nll_parts(theta_log, sigma2, y)[0]

        def nll_full(u, y):
            return nll_scalar(u[1:], jnp.exp(u[0]), y)

        dt = self.dtype

        def _cast(*args):
            return tuple(jnp.asarray(a, dt) for a in args)

        self.nll_parts_raw = lambda t, s2, y: nll_parts(*_cast(t, s2, y))
        self.prep_y_gd = lambda y: jnp.asarray(np.asarray(y, dtype=np.float64), dt)
        self.nll_parts = lifted_jit(lambda t, s, y: nll_parts(*_cast(t, s, y)))
        self.grad_profiled = lifted_jit(
            lambda t, s, y: jax.value_and_grad(nll_scalar)(*_cast(t, s, y)))
        self.vag_full = lifted_jit(
            lambda u, y: jax.value_and_grad(nll_full)(*_cast(u, y)))
        self.hess_full = lifted_jit(lambda u, y: jax.hessian(nll_full)(*_cast(u, y)))

        def nll_profiled(theta_log, y):
            quad, logdet = quad_logdet(theta_log, y)
            return 0.5 * (logdet + n * jnp.log(quad / n) + n
                          + n * math.log(2.0 * math.pi)), quad

        self.nll_profiled_vag = lifted_jit(
            lambda t, y: jax.value_and_grad(nll_profiled, has_aux=True)(
                *_cast(t, y)))
        # raw closures for the on-device L-BFGS loop (ops/lbfgs.py)
        self.nll_profiled_raw = lambda t, y: nll_profiled(*_cast(t, y))
        self.nll_scalar_raw = lambda t, s2, y: nll_scalar(*_cast(t, s2, y))

        def nll_orig(lp, y):
            theta_log, sigma2 = self._orig_to_internal_jnp(jnp.exp(lp))
            return nll_scalar(theta_log, sigma2, y)

        self.nll_orig_vag = lifted_jit(
            lambda lp, y: jax.value_and_grad(nll_orig)(*_cast(lp, y)))

        def psi_inv_apply(theta_log, V):
            Ddiag, W, _, _ = self._parts(theta_log)
            A = jnp.eye(self.m, dtype=self.dtype) + W.T @ (W / Ddiag[:, None])
            La = jnp.linalg.cholesky(A)
            DV = V / Ddiag[:, None]
            return DV - (W / Ddiag[:, None]) @ jsl.cho_solve((La, True), W.T @ DV)

        def wls_coef(theta_log, y, X):
            MiX = psi_inv_apply(theta_log, X)
            Miy = psi_inv_apply(theta_log, y[:, None])[:, 0]
            Ac = X.T @ MiX
            Lc = jnp.linalg.cholesky(Ac)
            return jsl.cho_solve((Lc, True), X.T @ Miy)

        self.wls_coef = lifted_jit(lambda t, y, X: wls_coef(*_cast(t, y, X)))
        self.wls_coef_raw = lambda t, y, X: wls_coef(*_cast(t, y, X))
        # Psi_tilde^-1 M for the GPBoost-algorithm hook (boosting/gbdt.py)
        self.psi_inv_apply_jit = lifted_jit(
            lambda t, V: psi_inv_apply(*_cast(t, V)))

        def coef_grad(theta_log, sigma2, resid, X):
            Mir = psi_inv_apply(theta_log, resid[:, None])[:, 0]
            return -(X.T @ Mir) / sigma2

        self.coef_grad = lifted_jit(
            lambda t, s, r, X: coef_grad(*_cast(t, s, r, X)))

        def fisher_transformed(u, include_error_var=True):
            raise NotImplementedError(
                "fisher_scoring with gp_approx='fitc' is not supported; "
                "use gradient_descent or lbfgs")

        self.fisher_transformed = fisher_transformed

    def _orig_to_internal_jnp(self, pars_orig):
        from .gaussian_gp import _range_to_transformed_jnp
        sigma2 = pars_orig[0]
        alpha = _range_to_transformed_jnp(self.comp, pars_orig[2:], var=v)
        return jnp.concatenate([jnp.log(pars_orig[1] / sigma2)[None],
                                jnp.log(alpha)]), sigma2

    # transforms (same semantics as the Vecchia engine)
    def transform_pars(self, pars_orig):
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        out = [pars_orig[0], pars_orig[1] / pars_orig[0]]
        out.extend(np.atleast_1d(
            self.comp.cov_fn.range_to_transformed(pars_orig[2:])))
        return np.asarray(out)

    def back_transform_pars(self, pars_internal):
        t = np.asarray(pars_internal, dtype=np.float64)
        out = [t[0], t[1] * t[0]]
        out.extend(np.atleast_1d(self.comp.cov_fn.range_from_transformed(
            t[2:], var=t[1] * t[0])))
        return np.asarray(out)

    def total_re_variance_original(self, pars_orig):
        return float(pars_orig[1])

    def apply_nugget_lower_bound(self, pars_internal):
        r = 1e-10
        orig = self.back_transform_pars(pars_internal)
        other = self.total_re_variance_original(orig)
        if not np.isfinite(other) or other <= 0:
            return pars_internal
        nm = r / (1.0 - r) * other
        if np.isfinite(nm) and orig[0] < nm:
            orig[0] = nm
            return self.transform_pars(orig)
        return pars_internal

    def neg_log_likelihood(self, pars_orig, y):
        t = self.transform_pars(pars_orig)
        nll, _ = self.nll_parts(jnp.asarray(np.log(t[1:]), self.dtype),
                                jnp.asarray(t[0], self.dtype),
                                jnp.asarray(y, self.dtype))
        return float(nll)

    def fisher_original(self, pars_orig):
        return jnp.full((self.num_cov_par, self.num_cov_par), jnp.nan)

    # ------------------------------------------------------------------
    def predict(self, pars_orig, y_resid, pred_data, predict_var=False,
                predict_cov_mat=False, predict_response=False, **kwargs):
        """Predictive-process prediction (CalcPredFITC_FSA semantics: the
        cross covariance uses the low-rank part)."""
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        sigma2 = pars_orig[0]
        t = self.transform_pars(pars_orig)
        theta_log = jnp.asarray(np.log(t[1:]), self.dtype)
        y = jnp.asarray(y_resid, self.dtype)
        cf = self.comp.cov_fn
        v = t[1]
        alpha = np.exp(np.asarray(theta_log)[1:])
        cp = np.asarray(pred_data["comps"][0]["coords_pred"], dtype=np.float64)
        if cp.ndim == 1:
            cp = cp[:, None]
        n_pred = len(cp)

        Ddiag, W, L_uu, V = self._parts(theta_log)
        if cf.is_isotropic:
            d_up = np.sqrt(np.maximum(
                ((self.ip[:, None, :] - cp[None, :, :]) ** 2).sum(-1), 0))
            K_up = cf.corr_from_dist(jnp.asarray(d_up, self.dtype),
                                     jnp.asarray(alpha))   # (m, np)
        else:
            K_up = cf.corr_from_coords(self._ip_d,
                                       jnp.asarray(cp, self.dtype),
                                       jnp.asarray(alpha))
        Vp = jsl.solve_triangular(L_uu, K_up, lower=True)
        Wp = np.sqrt(v) * np.asarray(Vp).T                              # (np,m)
        # Psi_tilde^-1 y via Woodbury
        Dy = y / Ddiag
        A = jnp.eye(self.m, dtype=self.dtype) + W.T @ (W / Ddiag[:, None])
        La = jnp.linalg.cholesky(A)
        alpha_v = Dy - (W / Ddiag[:, None]) @ jsl.cho_solve((La, True), W.T @ Dy)
        # cross covariance (scaled): Wp W' ; mean = Wp (W' alpha_v)
        mu = np.asarray(jnp.asarray(Wp) @ (W.T @ alpha_v))
        out = {"mu": mu}
        if predict_var or predict_cov_mat:
            # pred covariance (scaled): Wp Wp' + diag(v(1-rho_p))
            B = jsl.cho_solve((La, True), W.T @ (W / Ddiag[:, None]))
            # Psi^-1-projected cross cov: C' Psi~^-1 C with C = W Wp'
            WtW = W.T @ (W / Ddiag[:, None])
            M1 = jnp.asarray(Wp) @ (WtW - WtW @ jsl.cho_solve((La, True), WtW)) \
                @ jnp.asarray(Wp).T
            rho_p = np.asarray(jnp.sum(Vp * Vp, axis=0))
            prior_diag = v * np.maximum(1.0 - rho_p, 0.0)
            cov = np.asarray(jnp.asarray(Wp) @ jnp.asarray(Wp).T - M1) \
                + np.diag(prior_diag)
            cov = cov * sigma2
            if predict_response:
                cov = cov + sigma2 * np.eye(n_pred)
            if predict_cov_mat:
                out["cov"] = cov
            if predict_var:
                out["var"] = np.diagonal(cov).copy()
        return out
