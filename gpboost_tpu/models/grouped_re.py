"""Woodbury-identity engine for models with only grouped random effects.

Reference semantics: re_model_template.h:7129 InitializeMatricesForUseWoodburyIdentity,
:9691 CalcYAux, :9837 CalcYtilde, CalcGradPars_Only_Grouped_REs_Woodbury /
CalcFisherInformation_Only_Grouped_REs_Woodbury. With

    Psi_tilde = I_n + Z Sigma Z',   Sigma = blockdiag(v_tilde_j I_{m_j}),
    A(theta)  = Sigma^-1 + Z'Z      (q x q, q = total number of RE levels)

everything reduces to q-sized linear algebra:

    y' Psi_tilde^-1 y = y'y - (Z'y)' A^-1 (Z'y)
    log|Psi_tilde|    = log|A| + sum_j m_j log v_tilde_j
    X'Psi_tilde^-1 X  = X'X - (Z'X)' A^-1 (Z'X)     (for GLS coefficients)

TPU-first design: the data-sized reductions (y'y, Z'y, Z'X, X'X) are
theta-independent sufficient statistics computed ONCE per response vector on the
host (numpy scatter — n never enters the jitted graphs, and no scatter op is
ever compiled on TPU, where f64-emulated scatters compile pathologically slowly).
The per-iteration work is a dense q x q Cholesky on the MXU. Gradients via
autodiff of the q-sized NLL; Fisher information via closed-form q x q trace
identities using one-hot block reductions (matmul, not scatter).
"""

from ..ops.jit_utils import lifted_jit
import math

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


class WoodburyGaussianEngine:
    """Marginal NLL / gradients / FI / prediction for grouped-RE-only models."""

    def __init__(self, components, num_data, cluster_ids=None, dtype=jnp.float64,
                 matrix_inversion_method="cholesky", num_rand_vec_trace=200,
                 seed_rand_vec_trace=1, cg_max_num_it=1000, weights=None):
        self.weights = None if weights is None else np.asarray(
            weights, dtype=np.float64)
        self.components = list(components)
        assert all(c.kind == "grouped" for c in self.components)
        self.n = int(num_data)
        self.dtype = dtype
        self.matrix_inversion_method = matrix_inversion_method
        self.num_rand_vec_trace = num_rand_vec_trace
        self.seed_rand_vec_trace = seed_rand_vec_trace
        self.cg_max_num_it = cg_max_num_it
        self.num_theta = len(self.components)
        self.num_cov_par = self.num_theta + 1
        self.par_offsets = list(range(self.num_theta))

        # flat level indexing: comp j occupies [level_off[j], level_off[j+1])
        self.block_sizes = [c.num_groups for c in self.components]
        self.level_off = np.concatenate([[0], np.cumsum(self.block_sizes)])
        self.q = int(self.level_off[-1])

        idx = []
        w = []
        for j, c in enumerate(self.components):
            idx.append(c.group_codes.astype(np.int64) + self.level_off[j])
            w.append(np.ones(self.n) if c.z is None else
                     np.asarray(c.z, dtype=np.float64))
        self._idx = np.stack(idx)            # (ncomp, n)
        self._w = np.stack(w)                # (ncomp, n)

        # static Z' W Z (q, q) with W = diag(weights) (identity if none)
        wvec = np.ones(self.n) if self.weights is None else self.weights
        self._wvec = wvec
        self._logdet_R = float(-np.sum(np.log(wvec)))   # log|diag(1/w)|
        G = np.zeros((self.q, self.q))
        for j in range(self.num_theta):
            for k in range(self.num_theta):
                np.add.at(G, (self._idx[j], self._idx[k]),
                          wvec * self._w[j] * self._w[k])
        self._G = jnp.asarray(G, dtype=dtype)
        # block membership: one-hot (q, ncomp) for scatter-free block reductions
        block_id = np.concatenate([
            np.full(m, j) for j, m in enumerate(self.block_sizes)])
        self._block_id_np = block_id
        oneh = np.zeros((self.q, self.num_theta))
        oneh[np.arange(self.q), block_id] = 1.0
        self._oneh = jnp.asarray(oneh, dtype=dtype)
        self._m_sizes = jnp.asarray(np.asarray(self.block_sizes, dtype=np.float64),
                                    dtype=dtype)

        self._y_cache = {}
        self._X_cache = {}
        self._build_jitted()

    # ------------------------------------------------------------------
    # host-side sufficient statistics
    def _zt(self, v):
        """Z' W v on the host (numpy scatter; W = diag(weights))."""
        out = np.zeros(self.q)
        wv = v if self.weights is None else self.weights * v
        for j in range(self.num_theta):
            np.add.at(out, self._idx[j], self._w[j] * wv)
        return out

    def _stats_y(self, y):
        key = (id(y), getattr(y, "shape", None))
        hit = self._y_cache.get("key")
        if hit == key:
            return self._y_cache["val"]
        yn = np.asarray(y, dtype=np.float64)
        yty = float(yn @ (yn if self.weights is None else self.weights * yn))
        val = (jnp.asarray(self._zt(yn), self.dtype),
               jnp.asarray(yty, self.dtype))
        # keep a strong ref to y so its id() can't be recycled while cached
        self._y_cache = {"key": key, "val": val, "ref": y}
        return val

    def _stats_X(self, X):
        key = (id(X), getattr(X, "shape", None))
        if self._X_cache.get("key") == key:
            return self._X_cache["val"]
        Xn = np.asarray(X, dtype=np.float64)
        ZtX = np.column_stack([self._zt(Xn[:, k]) for k in range(Xn.shape[1])])
        val = (jnp.asarray(ZtX, self.dtype),
               jnp.asarray(Xn.T @ Xn, self.dtype))
        self._X_cache = {"key": key, "val": val, "ref": X}
        return val

    # ------------------------------------------------------------------
    def _A_fn(self, theta_log):
        vt = jnp.exp(theta_log)
        sigma_inv_diag = (self._oneh @ (1.0 / vt))
        return self._G + jnp.diag(sigma_inv_diag)

    def _build_jitted(self):
        n = self.n

        if self.matrix_inversion_method == "iterative":
            # CG solves + stochastic-Lanczos-quadrature log-dets over the
            # q x q system (CG_utils.h:977 CGRandomEffects, :384
            # LogDetStochTridiag); custom VJPs keep autodiff working
            from ..ops.iterative import make_cg_solve, make_slq_logdet

            def matvec(theta_log, v):
                vt = jnp.exp(theta_log)
                return self._G @ v + v * (self._oneh @ (1.0 / vt))

            cg_solve = make_cg_solve(matvec, tol=1e-8, maxit=self.cg_max_num_it)
            slq = make_slq_logdet(matvec, self.q, rank=min(self.q, 100),
                                  num_probes=self.num_rand_vec_trace,
                                  seed=self.seed_rand_vec_trace,
                                  dtype=self.dtype)

            def core(theta_log, Zty, yty):
                AinvZty = cg_solve(theta_log, Zty)
                quad = yty - Zty @ AinvZty
                logdet = slq(theta_log) + jnp.sum(self._m_sizes * theta_log) \
                    + self._logdet_R
                return quad, logdet
        else:
            def core(theta_log, Zty, yty):
                A = self._A_fn(theta_log)
                L = jnp.linalg.cholesky(A)
                AinvZty = jsl.cho_solve((L, True), Zty)
                quad = yty - Zty @ AinvZty
                logdet = (2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
                          + jnp.sum(self._m_sizes * theta_log)
                          + self._logdet_R)
                return quad, logdet

        def nll_parts_i(theta_log, sigma2, Zty, yty):
            quad, logdet = core(theta_log, Zty, yty)
            nll = 0.5 * (quad / sigma2 + logdet
                         + n * jnp.log(sigma2) + n * math.log(2.0 * math.pi))
            return nll, quad

        def nll_scalar_i(theta_log, sigma2, Zty, yty):
            return nll_parts_i(theta_log, sigma2, Zty, yty)[0]

        def nll_full_i(u, Zty, yty):
            return nll_scalar_i(u[1:], jnp.exp(u[0]), Zty, yty)

        self.nll_parts_raw = lambda t, s2, stats: nll_parts_i(t, s2, *stats)
        self.prep_y_gd = lambda y: self._stats_y(np.asarray(y, dtype=np.float64))
        _nll_parts = lifted_jit(nll_parts_i)
        _grad_prof = lifted_jit(lambda t, s, Zty, yty:
                             jax.value_and_grad(nll_scalar_i)(t, s, Zty, yty))
        _vag_full = lifted_jit(jax.value_and_grad(nll_full_i))
        _hess_full = lifted_jit(jax.hessian(nll_full_i))

        def nll_profiled_i(theta_log, Zty, yty):
            quad, logdet = core(theta_log, Zty, yty)
            return 0.5 * (logdet + n * jnp.log(quad / n) + n
                          + n * math.log(2.0 * math.pi)), quad

        _nll_prof_vag = lifted_jit(jax.value_and_grad(nll_profiled_i, has_aux=True))

        def nll_orig_i(log_pars_orig, Zty, yty):
            u = jnp.concatenate([log_pars_orig[:1],
                                 log_pars_orig[1:] - log_pars_orig[0]])
            return nll_full_i(u, Zty, yty)

        _nll_orig_vag = lifted_jit(jax.value_and_grad(nll_orig_i))

        # host-facing wrappers: same signatures as DenseGaussianEngine
        self.nll_parts = lambda t, s, y: _nll_parts(t, s, *self._stats_y(y))
        self.grad_profiled = lambda t, s, y: _grad_prof(t, s, *self._stats_y(y))
        self.vag_full = lambda u, y: _vag_full(u, *self._stats_y(y))
        self.hess_full = lambda u, y: _hess_full(u, *self._stats_y(y))
        self.nll_profiled_vag = lambda t, y: _nll_prof_vag(t, *self._stats_y(y))
        self.nll_orig_vag = lambda lp, y: _nll_orig_vag(lp, *self._stats_y(y))

        def _blocks(M):
            """Per-(comp_j, comp_k) block sums of a (q, q) matrix."""
            return self._oneh.T @ M @ self._oneh

        def fisher_transformed(u, include_error_var=True):
            """FI on the transformed (log) scale via q x q trace identities.

            With P = Psi_tilde^-1, dPsi_j = v_j Z_j Z_j', C = Z' P Z:
              tr(P dPsi_j)          = v_j * sum(diag(C)[block_j])
              tr(P dPsi_j P dPsi_k) = v_j v_k * ||C[b_j, b_k]||_F^2.
            """
            theta_log = u[1:]
            vt = jnp.exp(theta_log)
            A = self._A_fn(theta_log)
            L = jnp.linalg.cholesky(A)
            AinvG = jsl.cho_solve((L, True), self._G)
            C = self._G - self._G @ AinvG          # Z' Psi_tilde^-1 Z
            diag_tr = self._oneh.T @ jnp.diagonal(C)
            tr_PdPsi = vt * diag_tr
            Fkj = _blocks(C * C)
            FI_cc = 0.5 * (vt[:, None] * vt[None, :]) * Fkj
            if include_error_var:
                p = self.num_theta
                FI = jnp.zeros((p + 1, p + 1), self.dtype)
                FI = FI.at[0, 0].set(n / 2.0)
                FI = FI.at[0, 1:].set(0.5 * tr_PdPsi)
                FI = FI.at[1:, 0].set(0.5 * tr_PdPsi)
                FI = FI.at[1:, 1:].set(FI_cc)
                return FI
            return FI_cc

        self.fisher_transformed = lifted_jit(fisher_transformed, static_argnums=1)

        def fisher_original(pars_orig):
            """FI wrt original pars [sigma2, v_j] (transf_scale=false),
            all in q-space (see module docstring for the identities)."""
            sigma2 = pars_orig[0]
            vt = pars_orig[1:] / sigma2
            theta_log = jnp.log(vt)
            A = self._A_fn(theta_log)
            L = jnp.linalg.cholesky(A)
            AinvG = jsl.cho_solve((L, True), self._G)
            C = self._G - self._G @ AinvG
            C2 = self._G - 2.0 * self._G @ AinvG + AinvG.T @ (self._G @ AinvG)
            tr_psi2 = n - 2.0 * jnp.trace(AinvG) + jnp.sum(AinvG * AinvG.T)
            diag_C2 = self._oneh.T @ jnp.diagonal(C2)
            Fkj = _blocks(C * C)
            p = self.num_theta
            FI = jnp.zeros((p + 1, p + 1), self.dtype)
            FI = FI.at[0, 0].set(tr_psi2)
            FI = FI.at[0, 1:].set(diag_C2)
            FI = FI.at[1:, 0].set(diag_C2)
            FI = FI.at[1:, 1:].set(Fkj)
            return 0.5 * FI / (sigma2 * sigma2)

        self.fisher_original = lifted_jit(fisher_original)

        def wls_coef_i(theta_log, ZtX, XtX, Zty, Xty):
            """GLS coefficients entirely in q-space:
            (X'P X) beta = X'P y with X'P X = X'X - (Z'X)' A^-1 (Z'X)."""
            A = self._A_fn(theta_log)
            L = jnp.linalg.cholesky(A)
            AinvZtX = jsl.cho_solve((L, True), ZtX)
            XtPX = XtX - ZtX.T @ AinvZtX
            XtPy = Xty - AinvZtX.T @ Zty
            Lc = jnp.linalg.cholesky(XtPX)
            return jsl.cho_solve((Lc, True), XtPy)

        _wls = lifted_jit(wls_coef_i)

        def wls_coef(theta_log, y, X):
            ZtX, XtX = self._stats_X(X)
            Zty, _ = self._stats_y(y)
            Xty = jnp.asarray(np.asarray(X).T @ np.asarray(y), self.dtype)
            return _wls(theta_log, ZtX, XtX, Zty, Xty)

        self.wls_coef = wls_coef

        def coef_grad_i(theta_log, sigma2, ZtX, Ztr, Xtr):
            A = self._A_fn(theta_log)
            L = jnp.linalg.cholesky(A)
            AinvZtr = jsl.cho_solve((L, True), Ztr)
            return -(Xtr - ZtX.T @ AinvZtr) / sigma2

        _coef_grad = lifted_jit(coef_grad_i)

        def coef_grad(theta_log, sigma2, resid, X):
            ZtX, _ = self._stats_X(X)
            rn = np.asarray(resid, dtype=np.float64)
            Ztr = jnp.asarray(self._zt(rn), self.dtype)
            Xtr = jnp.asarray(np.asarray(X).T @ rn, self.dtype)
            return _coef_grad(theta_log, sigma2, ZtX, Ztr, Xtr)

        self.coef_grad = coef_grad

    # ------------------------------------------------------------------
    # transforms: grouped comps have variance-only parameters
    def transform_pars(self, pars_orig):
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        out = pars_orig.copy()
        out[1:] = pars_orig[1:] / pars_orig[0]
        return out

    def back_transform_pars(self, pars_internal):
        t = np.asarray(pars_internal, dtype=np.float64)
        out = t.copy()
        out[1:] = t[1:] * t[0]
        return out

    def total_re_variance_original(self, pars_orig):
        return float(np.sum(pars_orig[1:]))

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
                                jnp.asarray(t[0], self.dtype), y)
        return float(nll)

    # ------------------------------------------------------------------
    def training_re(self, pars_orig, y_resid, predict_var=False):
        """Per-component posterior means/variances of the random effects at
        the training points: column j = bhat_j[codes_j] with
        bhat = A^-1 Z'W resid, Var(b|y) = sigma2 A^-1
        (re_model_template.h:4420 PredictTrainingDataRandomEffects; random
        coefficients report the latent slope, not slope * covariate)."""
        import scipy.linalg as sla
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        sigma2 = pars_orig[0]
        t = self.transform_pars(pars_orig)
        theta_log = jnp.asarray(np.log(t[1:]), self.dtype)
        A = np.asarray(self._A_fn(theta_log))
        cho = sla.cho_factor(A, lower=True)
        bhat = sla.cho_solve(cho, self._zt(np.asarray(y_resid, np.float64)))
        means = np.column_stack([bhat[self._idx[j]]
                                 for j in range(self.num_theta)])
        if not predict_var:
            return means, None
        Ainv_diag = np.diagonal(sla.cho_solve(cho, np.eye(self.q)))
        vs = np.column_stack([sigma2 * Ainv_diag[self._idx[j]]
                              for j in range(self.num_theta)])
        return means, vs

    # ------------------------------------------------------------------
    def predict(self, pars_orig, y_resid, pred_data, predict_var=False,
                predict_cov_mat=False, predict_response=False):
        """Posterior mean/cov at prediction incidences.

        pred_data comps entries must contain 'codes_pred' (level codes, values
        >= m_j meaning unseen/new groups) and optional 'z_pred'.
        """
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        sigma2 = pars_orig[0]
        t = self.transform_pars(pars_orig)
        theta_log = jnp.asarray(np.log(t[1:]), self.dtype)
        A = np.asarray(self._A_fn(theta_log))
        rn = np.asarray(y_resid, dtype=np.float64)
        import scipy.linalg as sla
        cho = sla.cho_factor(A, lower=True)
        bhat = sla.cho_solve(cho, self._zt(rn))    # posterior mean of b
        # posterior cov of b (original scale) = sigma2 * A^-1

        n_pred = pred_data["n_pred"]
        Zp = np.zeros((n_pred, self.q))
        prior_var = np.zeros((n_pred, n_pred))
        for j, (comp, pd) in enumerate(zip(self.components, pred_data["comps"])):
            codes = pd["codes_pred"]
            zp = pd.get("z_pred")
            zp = np.ones(n_pred) if zp is None else np.asarray(zp, dtype=np.float64)
            seen = codes < self.block_sizes[j]
            rows = np.where(seen)[0]
            Zp[rows, self.level_off[j] + codes[rows]] += zp[rows]
            # unseen groups: prior variance v_j, correlated among equal new codes
            un = np.where(~seen)[0]
            if len(un):
                same = codes[un][:, None] == codes[un][None, :]
                prior_var[np.ix_(un, un)] += pars_orig[1 + j] * same * \
                    np.outer(zp[un], zp[un])
        mu = Zp @ bhat
        out = {"mu": mu}
        if predict_var or predict_cov_mat:
            V = sla.cho_solve(cho, Zp.T)
            cov = sigma2 * (Zp @ V) + prior_var
            if predict_response:
                cov = cov + sigma2 * np.eye(n_pred)
            if predict_cov_mat:
                out["cov"] = cov
            if predict_var:
                out["var"] = np.diagonal(cov).copy()
        return out
