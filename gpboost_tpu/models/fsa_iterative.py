"""Sparse/structured iterative engine for covariance tapering and
full-scale tapering (FSA) — the n-scaling path.

Reference: the sparse tapered residual (re_comp.h:1293-1312 apply_tapering_)
and the FSA CG/Lanczos solvers CGFSA / CGTridiagFSA / CGFSA_MULTI_RHS
(CG_utils.h:505-975) with the "fitc" preconditioner
P = diag(C_s) + C_nm C_m^-1 C_mn (CG_utils.h:491-506), plus the FITC/FSA
factorization setup (re_model_template.h:9576 CalcCovFactorFITC_FSA).

TPU-first formulation. The scaled covariance is

    M(theta) = I + v * ( E'E + R(theta) ),        E = L_uu^-1 K_un  (m, n)

with R the TAPERED residual: R_ij = T(d_ij) * (k(d_ij) - e_i'e_j) for the
pairs within the taper's compact support, R_ii = 1 - e_i'e_i. Instead of the
reference's CSC sparse matrices + sparse triangular solves, the support
pattern is a STATIC (n, k) neighbor index array found once on the host
(radius search); every product M v is then two (m, n) matmuls (MXU) plus one
(n, k) gather + rowsum (VPU) — O(n(m + k)) and fully parallel. Plain
tapering (gp_approx="tapering") is the same engine without the low-rank
part. Memory is O(n(m + k)): n = 100k runs on one chip.

The quadratic form rides a preconditioned CG with an implicit-diff custom
VJP; the log-determinant rides the EXACT congruence SLQ
(ops/iterative.py make_slq_logdet_congruence) with the FITC preconditioner
applied through a Woodbury symmetric factorization

    P = D + v E'E = D^1/2 (I + Zt'Zt) D^1/2,   Zt = sqrt(v) E D^-1/2,
    P^-1 = M_f M_f',  M_f = D^-1/2 (I - W' f(L) W),  W = Q'Zt,
    Zt Zt' = Q L Q' (m x m eigh),  f(l) = (1 - 1/sqrt(1+l)) / l,

so log|P| enters the SLQ estimate deterministically (zero-variance analogue
of the reference's CalcOptimalC control variates, CG_utils.h:399).
Gradients of both terms come from the custom VJPs (one adjoint CG solve /
stochastic trace with the same fixed Rademacher probes), replacing the
reference's hand-written FSA gradient code (re_model_template.h:2150-2350).
"""

from ..ops.jit_utils import lifted_jit
import math

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..ops.iterative import (make_slq_logdet_congruence,
                             make_cg_solve_precond, pcg)

_JITTER = 1e-10


def taper_neighbors(coords, taper_range, max_neighbors=256):
    """Static (n, k) neighbor structure of the taper's compact support:
    for each point, the other points with d < taper_range (the sparsity
    pattern the reference stores in CSC, re_comp.h:1293). Rows with more
    than `max_neighbors` in-range points keep the nearest ones."""
    from scipy.spatial import cKDTree
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    tree = cKDTree(coords)
    lists = tree.query_ball_tree(tree, r=taper_range * (1.0 - 1e-12))
    k = max(1, min(max_neighbors, max(len(l) - 1 for l in lists)))
    idx = np.zeros((n, k), dtype=np.int32)
    dist = np.zeros((n, k), dtype=np.float64)
    mask = np.zeros((n, k), dtype=bool)
    truncated = 0
    for i, l in enumerate(lists):
        nb = np.asarray([j for j in l if j != i], dtype=np.int64)
        if len(nb) == 0:
            idx[i, :] = i
            continue
        d = np.sqrt(((coords[nb] - coords[i]) ** 2).sum(1))
        if len(nb) > k:
            truncated += 1
            keep = np.argpartition(d, k - 1)[:k]
            nb, d = nb[keep], d[keep]
        idx[i, : len(nb)] = nb
        dist[i, : len(nb)] = d
        mask[i, : len(nb)] = True
        idx[i, len(nb):] = i
    if truncated:
        from ..utils.log import Log
        Log.warning(
            f"taper support truncated to the nearest {k} neighbors for "
            f"{truncated} of {n} points (cov_fct_taper_range is large "
            "relative to the point density); the tapered matrix is "
            "approximated")
    return idx, dist, mask


class FSAIterativeGaussianEngine:
    """Gaussian marginal NLL / gradients / prediction for
    gp_approx in ('tapering', 'full_scale_tapering') at scale."""

    is_gaussian = True
    matrix_inversion_method = "iterative"

    def __init__(self, components, num_data, dtype=jnp.float64,
                 num_rand_vec_trace=50, cg_max_num_it=1000,
                 cg_delta_conv=1e-6, seed_rand_vec_trace=1,
                 piv_chol_rank=50, nsim_var_pred=500,
                 cg_preconditioner_type="fitc", max_taper_neighbors=256):
        assert len(components) == 1 and components[0].kind == "gp", \
            "iterative FSA/tapering supports a single GP component"
        self.comp = components[0]
        self.components = [self.comp]
        self.n = int(num_data)
        self.dtype = dtype
        adapter = self.comp.cov_fn       # Tapered- or FSA-CovarianceFunction
        self.base = adapter.base
        self.taper = adapter.taper
        if not self.base.is_isotropic:
            raise NotImplementedError(
                "iterative tapering/FSA requires an isotropic base kernel; "
                "use matrix_inversion_method='cholesky'")
        self.has_ip = hasattr(adapter, "ip")
        self.num_theta = self.comp.num_cov_par
        self.num_cov_par = self.num_theta + 1
        self.par_offsets = [0]
        self.num_rand_vec_trace = int(num_rand_vec_trace)
        self.cg_max_num_it = int(cg_max_num_it)
        self.cg_delta_conv = float(cg_delta_conv)
        self.seed_rand_vec_trace = int(seed_rand_vec_trace)
        self.piv_chol_rank = int(piv_chol_rank)
        self.nsim_var_pred = int(nsim_var_pred)
        _aliases = {"predictive_process_plus_diagonal": "fitc"}
        self.cg_preconditioner_type = _aliases.get(cg_preconditioner_type,
                                                   cg_preconditioner_type)
        if self.cg_preconditioner_type not in ("fitc", "none"):
            raise ValueError(
                f"cg_preconditioner_type '{cg_preconditioner_type}' is not "
                "supported for FSA/tapering; use 'fitc' "
                "(predictive_process_plus_diagonal) or 'none' "
                "(CG_utils.h:554)")

        idx, dist, mask = taper_neighbors(self.comp.coords,
                                          float(self.taper.taper_range),
                                          max_neighbors=max_taper_neighbors)
        self.k = idx.shape[1]
        self._nb_idx = jnp.asarray(idx)
        self._nb_mask = jnp.asarray(mask)
        self._nb_dist = jnp.asarray(dist, dtype)
        # taper values are parameter-free: evaluate once
        self._nb_taper = jnp.asarray(
            np.asarray(self.taper._wendland_taper(self._nb_dist))
            * mask, dtype)
        if self.has_ip:
            ip = np.asarray(adapter.ip, dtype=np.float64)
            self.m_ip = len(ip)
            d_uu = np.sqrt(((ip[:, None, :] - ip[None, :, :]) ** 2).sum(-1))
            d_un = np.sqrt(((ip[:, None, :]
                             - self.comp.coords[None, :, :]) ** 2).sum(-1))
            self._d_uu = jnp.asarray(d_uu, dtype)
            self._d_un = jnp.asarray(d_un, dtype)
            # row-block size for the blocked neighbor-pair inner products
            self._ublk = max(8, min(2048, int(4e6 // max(1, self.k * self.m_ip))))
        else:
            self.m_ip = 0
        self._build_jitted()

    # ------------------------------------------------------------------
    def _factors(self, theta_log):
        """Differentiable per-theta operator pieces: neighbor values of the
        tapered residual, its diagonal, E, and the (stop_gradient)
        preconditioner factorization."""
        dt = self.dtype
        v = jnp.exp(theta_log[0])
        alphas = jnp.exp(theta_log[1:])
        c_nb = self.base.corr_from_dist(self._nb_dist, alphas)
        if self.has_ip:
            Kuu = self.base.corr_from_dist(self._d_uu, alphas) \
                + _JITTER * jnp.eye(self.m_ip, dtype=dt)
            Luu = jnp.linalg.cholesky(Kuu)
            E = jsl.solve_triangular(Luu, self.base.corr_from_dist(
                self._d_un, alphas), lower=True)            # (m, n)
            ET = E.T
            B = self._ublk
            n_pad = -(-self.n // B) * B
            idx_p = jnp.pad(self._nb_idx, ((0, n_pad - self.n), (0, 0)))
            ET_p = jnp.pad(ET, ((0, n_pad - self.n), (0, 0)))

            # checkpoint: without it the (B, k, m) gathered neighbor blocks
            # are saved for the backward pass across ALL blocks (~5 GB at
            # n=100k) — rematerializing them is one extra gather each
            @jax.checkpoint
            def blk(args):
                idx_b, e_b = args
                return jnp.einsum("bkm,bm->bk", ET[idx_b], e_b)

            u_nb = jax.lax.map(
                blk, (idx_p.reshape(-1, B, self.k),
                      ET_p.reshape(-1, B, self.m_ip))).reshape(n_pad, self.k)
            u_nb = u_nb[: self.n]
            vals = self._nb_taper * (c_nb - u_nb)
            diag_r = 1.0 - jnp.sum(E * E, axis=0)
        else:
            E = None
            vals = self._nb_taper * c_nb
            diag_r = jnp.ones(self.n, dt)

        # ---- FITC preconditioner factorization (gradients stopped: the
        # preconditioner only affects convergence, never the target)
        D = jax.lax.stop_gradient(1.0 + v * diag_r)
        Dinvs = 1.0 / jnp.sqrt(D)
        if self.has_ip and self.cg_preconditioner_type == "fitc":
            Zt = jax.lax.stop_gradient(jnp.sqrt(v) * E) * Dinvs[None, :]
            G = Zt @ Zt.T
            lam, Q = jnp.linalg.eigh(G)
            lam = jnp.maximum(lam, 0.0)
            W = Q.T @ Zt                                     # (m, n)
            f = jnp.where(lam > 1e-10,
                          (1.0 - 1.0 / jnp.sqrt(1.0 + lam))
                          / jnp.maximum(lam, 1e-10),
                          0.5 - 3.0 * lam / 8.0)
            ldp = jnp.sum(jnp.log(D)) + jnp.sum(jnp.log1p(lam))
            pc = {"Dinvs": Dinvs, "W": W, "f": f, "ldp": ldp}
        else:
            if self.cg_preconditioner_type == "none":
                Dinvs = jnp.ones(self.n, dt)
                pc = {"Dinvs": Dinvs, "W": None, "f": None,
                      "ldp": jnp.asarray(0.0, dt)}
            else:
                pc = {"Dinvs": Dinvs, "W": None, "f": None,
                      "ldp": jnp.sum(jnp.log(D))}
        return {"vals": vals, "diag_r": diag_r, "E": E, "v": v, "pc": pc}

    # ------------------------------------------------------------------
    def _build_jitted(self):
        n = self.n
        dt = self.dtype
        nb_idx = self._nb_idx
        has_ip = self.has_ip
        fitc = has_ip and self.cg_preconditioner_type == "fitc"

        def matvec(p, x):
            r = p["diag_r"] * x + jnp.sum(p["vals"] * x[nb_idx], axis=1)
            if has_ip:
                r = r + p["E"].T @ (p["E"] @ x)
            return x + p["v"] * r

        def m_apply(p, x):
            pc = p["pc"]
            if fitc:
                x = x - pc["W"].T @ (pc["f"] * (pc["W"] @ x))
            return pc["Dinvs"] * x

        def mt_apply(p, x):
            pc = p["pc"]
            x = pc["Dinvs"] * x
            if fitc:
                x = x - pc["W"].T @ (pc["f"] * (pc["W"] @ x))
            return x

        def precond(p):
            return lambda r: m_apply(p, mt_apply(p, r))

        # bound the transient gather memory of a probe batch to ~200M f32
        # elements: each batched matvec materializes (chunk, n, k + m) floats
        chunk = max(1, min(self.num_rand_vec_trace,
                           int(2e8 // max(1, n * (self.k + self.m_ip)))))
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

        def quad_logdet(theta_log, y):
            p = self._factors(theta_log)
            x = solve(p, y)
            return y @ x, slq(p)

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
            MiX = jax.lax.map(lambda c: solve(p, c), X.T).T
            Miy = solve(p, y)
            A = X.T @ MiX
            La = jnp.linalg.cholesky(A)
            return jsl.cho_solve((La, True), X.T @ Miy)

        self.wls_coef = lifted_jit(wls_coef)
        self.wls_coef_raw = wls_coef

        def coef_grad(theta_log, sigma2, resid, X):
            p = self._factors(theta_log)
            return -(X.T @ solve(p, resid)) / sigma2

        self.coef_grad = lifted_jit(coef_grad)

        def fisher_transformed(u, include_error_var=True):
            raise NotImplementedError(
                "fisher_scoring is not supported with iterative "
                "tapering/FSA; use lbfgs or gradient_descent")

        self.fisher_transformed = fisher_transformed

        def hess_full(u, y):
            raise NotImplementedError(
                "optimizer_cov='newton' is not supported with iterative "
                "tapering/FSA; use lbfgs or gradient_descent")

        self.hess_full = hess_full

    # ------------------------------------------------------------------
    # parameter transforms (single-GP semantics, as in models/vecchia.py)
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
        """Std-error FI: dense (exact) proxy at moderate n; NaN at scale
        (the stochastic FSA Fisher is not implemented — the reference also
        uses simulation there, re_model_template.h:5130)."""
        if self.n > 4000:
            return jnp.full((self.num_cov_par, self.num_cov_par), jnp.nan)
        from .gaussian_gp import DenseGaussianEngine
        dense = DenseGaussianEngine([self.comp], self.n, dtype=self.dtype)
        return dense.fisher_original(jnp.asarray(pars_orig, self.dtype))

    # ------------------------------------------------------------------
    def predict(self, pars_orig, y_resid, pred_data, predict_var=False,
                predict_cov_mat=False, predict_response=False):
        """Posterior predictive mean / (co)variance. The cross/prediction
        covariances use the exact FSA/tapered kernel (the dense adapter's
        corr evaluation, same as re_model_template.h:11170 CalcPred); the
        training solves are preconditioned CG."""
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
        alpha_v = self._solve(p, y_resid) / sigma2
        mu = K_cross.T @ alpha_v
        out = {"mu": np.asarray(mu)}
        if predict_cov_mat or predict_var:
            V = jax.lax.map(lambda c: self._solve(p, c), K_cross.T).T / sigma2
            cov = K_pred - K_cross.T @ V
            if predict_response:
                cov = cov + sigma2 * jnp.eye(n_pred, dtype=self.dtype)
            if predict_cov_mat:
                out["cov"] = np.asarray(cov)
            if predict_var:
                out["var"] = np.asarray(jnp.diagonal(cov)).copy()
        return out

    def training_re(self, pars_orig, y_resid, predict_var=False):
        """Posterior mean of the GP at the training points:
        mean = (M - I) M^-1 resid (scaled identities; the FSA analogue of
        re_model_template.h:4420 PredictTrainingDataRandomEffects)."""
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        t = self.transform_pars(pars_orig)
        theta_log = jnp.asarray(np.log(t[1:]), dtype=self.dtype)
        p = self._factors(theta_log)
        y_aux = self._solve(p, jnp.asarray(y_resid, self.dtype))
        mean = self._matvec(p, y_aux) - y_aux
        if predict_var:
            raise NotImplementedError(
                "predict_training_data_random_effects with predict_var=True "
                "is not supported with iterative tapering/FSA")
        return np.asarray(mean)[:, None], None
