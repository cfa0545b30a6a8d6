"""Dense exact-GP / mixed-effects marginal-likelihood engine (Gaussian likelihood).

TPU-first redesign of the Gaussian branch of REModelTemplate
(re_model_template.h:2862 EvalNegLogLikelihoodGauss, :9302 CalcCovFactor,
:11170 CalcPred): everything is one dense covariance assembly + Cholesky on the
MXU; gradients come from autodiff instead of the handwritten per-structure
gradient code (re_model_template.h:1933-2592).

Internal parameterization (matches re_model.cpp:306 TransformCovPars): the
optimizer state is u = log([sigma2, v_1/sigma2, alpha_1..., v_2/sigma2, ...])
where alpha are transformed ranges (see ops/cov_fcts.py). The scaled covariance

    Psi_tilde(theta) = I + sum_j v_tilde_j * (W_j ∘ K_j(alpha_j))

depends only on theta = u[1:], and

    nll = 0.5 * ( y' Psi_tilde^{-1} y / sigma2 + log|Psi_tilde|
                  + n log sigma2 + n log 2 pi ).

Cluster independence (cluster_ids) is encoded as a block mask on W_j, turning the
reference's per-cluster std::map layout (re_model_template.h:6067-6069) into one
static masked dense matrix — branch-free and jit-compatible.
"""

from ..ops.jit_utils import lifted_jit
import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .components import GPComponent, GroupedComponent


def assemble_pred_covs(components, par_offsets, comp_vars, theta_log,
                       pred_data, n, dtype):
    """Cross (n, n_pred) and prediction (n_pred, n_pred) covariance matrices
    on the original scale (AddPredCovMatrices, re_comp.h:494)."""
    n_pred = pred_data["n_pred"]
    K_cross = jnp.zeros((n, n_pred), dtype=dtype)
    K_pred = jnp.zeros((n_pred, n_pred), dtype=dtype)
    for comp, off, v, pd in zip(components, par_offsets, comp_vars,
                                pred_data["comps"]):
        if comp.kind == "grouped":
            Kc = jnp.asarray(pd["cross_W"], dtype)
            Kp = jnp.asarray(pd["pred_W"], dtype)
            K_cross = K_cross + v * Kc
            K_pred = K_pred + v * Kp
        else:
            alphas = jnp.exp(theta_log[off + 1: off + comp.num_cov_par])
            Kc = comp.cross_corr(pd["coords_pred"], alphas)
            Kp = comp.pred_corr(pd["coords_pred"], alphas)
            if pd.get("cross_W") is not None:
                Kc = Kc * jnp.asarray(pd["cross_W"], dtype)
                Kp = Kp * jnp.asarray(pd["pred_W"], dtype)
            K_cross = K_cross + v * Kc
            K_pred = K_pred + v * Kp
    if pred_data.get("cross_cluster_mask") is not None:
        K_cross = K_cross * jnp.asarray(pred_data["cross_cluster_mask"], dtype)
        K_pred = K_pred * jnp.asarray(pred_data["pred_cluster_mask"], dtype)
    return K_cross, K_pred


def _range_to_transformed_jnp(comp, rho, var=None):
    """Differentiable rho -> alpha transform (mirrors CovarianceFunction)."""
    return comp.cov_fn.range_to_transformed_jnp(rho, var=var)


class DenseSigmaAssembly:
    """Shared dense covariance assembly Sigma(theta) = sum_j v_j (W_j ∘ K_j)
    over the random-effect components, with cluster-independence masking."""

    def __init__(self, components, num_data, cluster_ids=None, dtype=jnp.float64):
        self.components = list(components)
        self.n = int(num_data)
        self.dtype = dtype
        if cluster_ids is not None:
            cluster_ids = np.asarray(cluster_ids)
            codes = np.unique(cluster_ids, return_inverse=True)[1]
            self.cluster_codes = codes
            self._cluster_mask = (codes[:, None] == codes[None, :]).astype(np.float64)
        else:
            self.cluster_codes = None
            self._cluster_mask = None

        self._comp_static = []
        offset = 0
        self.par_offsets = []
        for comp in self.components:
            self.par_offsets.append(offset)
            offset += comp.num_cov_par
            W = None
            if comp.kind == "grouped":
                W = comp.same_group_mask()
                if comp.z is not None:
                    W = W * np.outer(comp.z, comp.z)
            else:
                if comp.z is not None:
                    W = np.outer(comp.z, comp.z)
            if self._cluster_mask is not None:
                W = self._cluster_mask if W is None else W * self._cluster_mask
            D = None
            if comp.kind == "gp" and comp.cov_fn.is_isotropic:
                D = jnp.asarray(comp.dist_matrix(), dtype=dtype)
            self._comp_static.append({
                "W": None if W is None else jnp.asarray(W, dtype=dtype),
                "D": D,
            })
        self.num_theta = offset

    def sigma(self, theta_log):
        """sum_j v_j (W_j ∘ K_j(alpha_j)) with v_j = exp(theta_log[offset_j])."""
        n = self.n
        M = jnp.zeros((n, n), dtype=self.dtype)
        for comp, static, off in zip(self.components, self._comp_static,
                                     self.par_offsets):
            v = jnp.exp(theta_log[off])
            if comp.kind == "grouped":
                K = static["W"] if static["W"] is not None \
                    else jnp.ones((n, n), self.dtype)
                M = M + v * K
            else:
                alphas = jnp.exp(theta_log[off + 1: off + comp.num_cov_par])
                if static["D"] is not None:
                    K = comp.cov_fn.corr_from_dist(static["D"], alphas)
                else:
                    K = comp.corr(None, alphas)
                if static["W"] is not None:
                    K = K * static["W"]
                M = M + v * K
        return M


def report_matrices(assembly, theta_log):
    """Per-component reporting covariances R_j (n, n): row i = Cov of the
    REPORTED latent value of component j at observation i with the total
    random effect at each data point, divided by sigma2.

    For plain components the reported value is the component's contribution
    (R_j = v_j W_j ∘ K_j); for random-coefficient components the reference
    reports the LATENT coefficient (the slope itself, not slope * covariate),
    so only the column side carries the covariate
    (re_model_template.h:4420 PredictTrainingDataRandomEffects)."""
    out = []
    n = assembly.n
    cl = assembly._cluster_mask
    for comp, static, off in zip(assembly.components, assembly._comp_static,
                                 assembly.par_offsets):
        v = jnp.exp(theta_log[off])
        if comp.kind == "grouped":
            R = jnp.asarray(comp.same_group_mask(), assembly.dtype)
        else:
            alphas = jnp.exp(theta_log[off + 1: off + comp.num_cov_par])
            if static["D"] is not None:
                R = comp.cov_fn.corr_from_dist(static["D"], alphas)
            else:
                R = comp.corr(None, alphas)
        if cl is not None:
            R = R * jnp.asarray(cl, assembly.dtype)
        if comp.z is not None:
            R = R * jnp.asarray(comp.z, assembly.dtype)[None, :]
        out.append(v * R)
    return out


class DenseGaussianEngine:
    """Marginal NLL, gradients, Fisher information, prediction — dense path."""

    def __init__(self, components, num_data, cluster_ids=None, dtype=jnp.float64,
                 weights=None):
        self.weights = None if weights is None else np.asarray(
            weights, dtype=np.float64)
        self._assembly = DenseSigmaAssembly(components, num_data,
                                            cluster_ids=cluster_ids, dtype=dtype)
        self.components = self._assembly.components
        self.n = self._assembly.n
        self.dtype = dtype
        self.cluster_codes = self._assembly.cluster_codes
        self._comp_static = self._assembly._comp_static
        self.par_offsets = self._assembly.par_offsets
        self.num_theta = self._assembly.num_theta
        self.num_cov_par = self.num_theta + 1    # + nugget

        self._build_jitted()

    # ------------------------------------------------------------------
    def psi_tilde(self, theta_log):
        """Scaled covariance diag(1/w) + sum_j v_tilde_j (W_j ∘ K_j)
        (weighted Gaussian data: nugget variance sigma2 / w_i)."""
        if self.weights is None:
            eye = jnp.eye(self.n, dtype=self.dtype)
        else:
            eye = jnp.diag(jnp.asarray(1.0 / self.weights, self.dtype))
        return eye + self._assembly.sigma(theta_log)

    def psi_original(self, pars_orig):
        """Unscaled covariance sigma2*I + sum v_j (W_j ∘ K_j(rho_j)) from original pars."""
        theta_log, sigma2 = self._orig_to_internal_jnp(pars_orig)
        return sigma2 * self.psi_tilde(theta_log)

    def _orig_to_internal_jnp(self, pars_orig):
        """Differentiable original -> internal transform (for original-scale FI)."""
        sigma2 = pars_orig[0]
        parts = []
        for comp, off in zip(self.components, self.par_offsets):
            v = pars_orig[1 + off]
            parts.append(jnp.log(v / sigma2)[None])
            if comp.num_range_par > 0:
                rho = pars_orig[2 + off: 1 + off + comp.num_cov_par]
                alpha = _range_to_transformed_jnp(comp, rho, var=v)
                parts.append(jnp.log(alpha))
        return jnp.concatenate(parts), sigma2

    # ------------------------------------------------------------------
    def _build_jitted(self):
        n = self.n

        def nll_parts(theta_log, sigma2, y):
            M = self.psi_tilde(theta_log)
            L = jnp.linalg.cholesky(M)
            alpha_v = jsl.cho_solve((L, True), y)
            quad = y @ alpha_v
            logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
            nll = 0.5 * (quad / sigma2 + logdet
                         + n * jnp.log(sigma2) + n * math.log(2.0 * math.pi))
            return nll, quad

        def nll_scalar(theta_log, sigma2, y):
            return nll_parts(theta_log, sigma2, y)[0]

        def nll_full(u, y):
            return nll_scalar(u[1:], jnp.exp(u[0]), y)

        self.nll_parts_raw = nll_parts       # pure closure for jitted GD
        self.prep_y_gd = lambda y: jnp.asarray(np.asarray(y, dtype=np.float64))
        self.nll_parts = lifted_jit(nll_parts)
        self.grad_profiled = lifted_jit(
            lambda theta_log, sigma2, y:
            jax.value_and_grad(nll_scalar)(theta_log, sigma2, y)
        )
        self.nll_full = lifted_jit(nll_full)
        self.vag_full = lifted_jit(jax.value_and_grad(nll_full))
        self.hess_full = lifted_jit(jax.hessian(nll_full))

        def fisher_transformed(u, include_error_var=True):
            """FI on transformed (log) scale (CalcFisherInformation transf_scale=true).

            FI[0,0]=n/2, FI[0,j]=tr(M^-1 dM_j)/2, FI[j,k]=tr(M^-1 dM_j M^-1 dM_k)/2.
            """
            theta_log = u[1:]
            M = self.psi_tilde(theta_log)
            L = jnp.linalg.cholesky(M)
            dM = jax.jacfwd(self.psi_tilde)(theta_log)          # (n, n, p)
            p = self.num_theta
            dM2 = jnp.moveaxis(dM, -1, 0)                        # (p, n, n)
            A = jax.vmap(lambda G: jsl.cho_solve((L, True), G))(dM2)  # M^-1 dM_j
            FI_cc = 0.5 * jnp.einsum('pij,qji->pq', A, A)
            if include_error_var:
                FI = jnp.zeros((p + 1, p + 1), self.dtype)
                FI = FI.at[0, 0].set(n / 2.0)
                tr = 0.5 * jnp.trace(A, axis1=1, axis2=2)
                FI = FI.at[0, 1:].set(tr)
                FI = FI.at[1:, 0].set(tr)
                FI = FI.at[1:, 1:].set(FI_cc)
                return FI
            return FI_cc

        self.fisher_transformed = lifted_jit(fisher_transformed, static_argnums=1)

        def fisher_original(pars_orig):
            """FI wrt original-scale pars (CalcFisherInformation transf_scale=false)."""
            Psi = self.psi_original(pars_orig)
            L = jnp.linalg.cholesky(Psi)
            dPsi = jax.jacfwd(self.psi_original)(pars_orig)      # (n, n, p+1)
            dPsi = jnp.moveaxis(dPsi, -1, 0)
            A = jax.vmap(lambda G: jsl.cho_solve((L, True), G))(dPsi)
            return 0.5 * jnp.einsum('pij,qji->pq', A, A)

        self.fisher_original = lifted_jit(fisher_original)

        def wls_coef(theta_log, y, X):
            """Closed-form GLS coefficients (re_model_template.h:9942 UpdateCoefGLS)."""
            M = self.psi_tilde(theta_log)
            L = jnp.linalg.cholesky(M)
            MiX = jsl.cho_solve((L, True), X)
            Miy = jsl.cho_solve((L, True), y)
            # X'M^-1X is SPD -> Cholesky solve (TPU has no f64 LU kernel)
            A = X.T @ MiX
            La = jnp.linalg.cholesky(A)
            return jsl.cho_solve((La, True), X.T @ Miy)

        self.wls_coef = lifted_jit(wls_coef)

        def coef_grad(theta_log, sigma2, resid, X):
            """grad_beta = -X' Psi^-1 resid (re_model_template.h:2016)."""
            M = self.psi_tilde(theta_log)
            L = jnp.linalg.cholesky(M)
            return -(X.T @ jsl.cho_solve((L, True), resid)) / sigma2

        self.coef_grad = lifted_jit(coef_grad)

        def nll_profiled(theta_log, y):
            """NLL with the nugget profiled out in closed form
            (optim_utils.h:243 EvalLLforLBFGSpp semantics):
            sigma2_hat = y'M^-1 y / n  =>  quad/sigma2_hat = n.
            Returns quad as aux so callers get sigma2_hat without a second
            compiled graph."""
            M = self.psi_tilde(theta_log)
            L = jnp.linalg.cholesky(M)
            alpha_v = jsl.cho_solve((L, True), y)
            quad = y @ alpha_v
            logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
            return 0.5 * (logdet + n * jnp.log(quad / n) + n
                          + n * math.log(2.0 * math.pi)), quad

        self.nll_profiled_vag = lifted_jit(
            jax.value_and_grad(nll_profiled, has_aux=True))
        # raw closures for the on-device L-BFGS loop (ops/lbfgs.py)
        self.nll_profiled_raw = nll_profiled
        self.wls_coef_raw = wls_coef

        def nll_orig(log_pars_orig, y):
            """NLL as a function of log original-scale pars (no profiling);
            used when variance parameters are held fixed on the original scale
            (re_model_template.h:7836 MaybeKeepVarianceConstant semantics)."""
            theta_log, sigma2 = self._orig_to_internal_jnp(jnp.exp(log_pars_orig))
            return nll_scalar(theta_log, sigma2, y)

        self.nll_orig_vag = lifted_jit(jax.value_and_grad(nll_orig))

    # ------------------------------------------------------------------
    # parameter transforms (host side, numpy)
    def transform_pars(self, pars_orig):
        """Original [sigma2, v_1, rho_1.., ...] -> internal transformed vector."""
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        sigma2 = pars_orig[0]
        out = [sigma2]
        for comp, off in zip(self.components, self.par_offsets):
            v = pars_orig[1 + off]
            out.append(v / sigma2)
            if comp.num_range_par > 0:
                rho = pars_orig[2 + off: 1 + off + comp.num_cov_par]
                out.extend(np.atleast_1d(
                    comp.cov_fn.range_to_transformed(rho, var=v)))
        return np.asarray(out)

    def back_transform_pars(self, pars_internal):
        """Internal transformed vector -> original scale."""
        t = np.asarray(pars_internal, dtype=np.float64)
        sigma2 = t[0]
        out = [sigma2]
        for comp, off in zip(self.components, self.par_offsets):
            v_orig = t[1 + off] * sigma2
            out.append(v_orig)
            if comp.num_range_par > 0:
                alphas = t[2 + off: 1 + off + comp.num_cov_par]
                out.extend(np.atleast_1d(
                    comp.cov_fn.range_from_transformed(alphas, var=v_orig)))
        return np.asarray(out)

    def total_re_variance_original(self, pars_orig):
        return float(sum(pars_orig[1 + off] for off in self.par_offsets))

    def apply_nugget_lower_bound(self, pars_internal):
        """Enforce nugget >= r/(1-r) * total RE variance, r = 1e-10
        (re_model_template.h:7804 ApplyGaussianNuggetLowerBound)."""
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

    # ------------------------------------------------------------------
    def neg_log_likelihood(self, pars_orig, y):
        """NLL at original-scale cov pars (GPB_EvalNegLogLikelihood path)."""
        t = self.transform_pars(pars_orig)
        u_theta = jnp.asarray(np.log(t[1:]), dtype=self.dtype)
        nll, _ = self.nll_parts(u_theta, jnp.asarray(t[0], self.dtype),
                                jnp.asarray(y, self.dtype))
        return float(nll)

    # ------------------------------------------------------------------
    # prediction (re_model_template.h:3392 Predict, :11170 CalcPred)
    def predict(self, pars_orig, y_resid, pred_data, predict_var=False,
                predict_cov_mat=False, predict_response=False):
        """Posterior predictive mean / (co)variance of the random effects part.

        pred_data: list (per component) of dicts from `build_pred_data`, plus
        cluster cross/pred masks if cluster_ids are used.
        """
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        sigma2 = pars_orig[0]
        t = self.transform_pars(pars_orig)
        theta_log = jnp.asarray(np.log(t[1:]), dtype=self.dtype)
        y_resid = jnp.asarray(y_resid, dtype=self.dtype)

        M = self.psi_tilde(theta_log)           # Psi / sigma2
        L = jnp.linalg.cholesky(M)

        K_cross, K_pred = assemble_pred_covs(
            self.components, self.par_offsets,
            [pars_orig[1 + off] for off in self.par_offsets],
            theta_log, pred_data, self.n, self.dtype)
        n_pred = pred_data["n_pred"]

        # Psi^-1 = M^-1 / sigma2
        alpha_v = jsl.cho_solve((L, True), y_resid) / sigma2
        mu = K_cross.T @ alpha_v
        out = {"mu": np.asarray(mu)}
        if predict_cov_mat or predict_var:
            V = jsl.cho_solve((L, True), K_cross) / sigma2    # Psi^-1 K_cross
            cov = K_pred - K_cross.T @ V
            if predict_response:
                cov = cov + sigma2 * jnp.eye(n_pred, dtype=self.dtype)
            if predict_cov_mat:
                out["cov"] = np.asarray(cov)
            if predict_var:
                out["var"] = np.asarray(jnp.diagonal(cov)).copy()
        return out

    # ------------------------------------------------------------------
    def training_re(self, pars_orig, y_resid, predict_var=False):
        """Per-component posterior means (and variances) of the random
        effects AT the training points: mean_j = R_j Psi~^-1 resid,
        var_j = sigma2 (v~_j - diag(R_j Psi~^-1 R_j'))
        (re_model_template.h:4420 PredictTrainingDataRandomEffects)."""
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        sigma2 = pars_orig[0]
        t = self.transform_pars(pars_orig)
        theta_log = jnp.asarray(np.log(t[1:]), dtype=self.dtype)
        L = jnp.linalg.cholesky(self.psi_tilde(theta_log))
        y_aux = jsl.cho_solve((L, True), jnp.asarray(y_resid, self.dtype))
        Rs = report_matrices(self._assembly, theta_log)
        means = np.column_stack([np.asarray(R @ y_aux) for R in Rs])
        if not predict_var:
            return means, None
        vs = np.empty((self.n, len(Rs)))
        for j, (R, off) in enumerate(zip(Rs, self.par_offsets)):
            PiRt = jsl.cho_solve((L, True), R.T)
            vt = np.exp(float(np.log(t[1 + off])))
            vs[:, j] = sigma2 * (vt - np.asarray(
                jnp.sum(R * PiRt.T, axis=1)))
        return means, vs
