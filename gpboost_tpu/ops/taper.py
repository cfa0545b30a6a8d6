"""Covariance tapering and full-scale-tapering (FSA) as kernel adapters.

Reference semantics:
- gp_approx = "tapering": Sigma = T ∘ K with T the compact-support Wendland
  correlation taper (re_comp.h:1293-1312 apply_tapering_, cov_fcts.h:1952-1996
  WendlandCorrelationShape*). The reference exploits the induced sparsity with
  a sparse Cholesky; on TPU a dense Cholesky of the (mostly-zero) matrix is
  faster than emulating sparse triangular solves, so the adapter only changes
  the KERNEL, and the dense engine (MXU Cholesky) does the rest.
- gp_approx = "full_scale_tapering" (FSA): Sigma = U + T ∘ (K - U) with
  U = K_fu' K_uu^-1 K_fu the predictive-process (FITC) part over inducing
  points (re_model_template.h:9576 CalcCovFactorFITC_FSA, CG_utils.h:505-975
  CGFSA solvers). Same dense-engine strategy; the taper defaults follow
  GetTaperMu (re_comp.h:1812-1815): mu = (1 + dim)/2 + taper_shape + 0.5.

Both adapters wrap a base CovarianceFunction and present the coords-based
kernel interface (corr_from_coords), so every dense engine path — NLL,
autodiff gradients, Fisher scoring, prediction cross/pred blocks — works
unchanged. Gradients of the FSA NLL come from autodiff through the inducing-
point Cholesky (replacing the hand-written FSA gradient code,
re_model_template.h:2150-2350).
"""

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .distances import pairwise_dist

_JITTER = 1e-10


class _CovAdapterBase:
    """Delegates the parameter-surface of a base CovarianceFunction while
    overriding the kernel evaluation."""

    is_isotropic = False
    needs_coords = True

    def __init__(self, base):
        self.base = base

    def __getattr__(self, name):
        return getattr(self.base, name)

    @property
    def num_range_par(self):
        return self.base.num_range_par

    @property
    def num_cov_par(self):
        return self.base.num_cov_par

    def _base_corr(self, x1, x2, alphas):
        if self.base.is_isotropic:
            return self.base.corr_from_dist(pairwise_dist(x1, x2), alphas)
        return self.base.corr_from_coords(x1, x2, alphas)


class TaperedCovarianceFunction(_CovAdapterBase):
    """T ∘ K — element-wise Wendland correlation tapering (gp_approx
    'tapering', re_comp.h:1293-1312)."""

    def __init__(self, base, taper):
        super().__init__(base)
        self.taper = taper      # a CovarianceFunction("wendland", ...)

    def corr_from_coords(self, x1, x2, alphas):
        D = pairwise_dist(x1, x2)
        K = (self.base.corr_from_dist(D, alphas) if self.base.is_isotropic
             else self.base.corr_from_coords(x1, x2, alphas))
        return K * self.taper._wendland_taper(D)


class FSACovarianceFunction(_CovAdapterBase):
    """U + T ∘ (K - U), U = k(., u) K_uu^-1 k(u, .) — full-scale tapering
    (re_model_template.h:9576). Inducing points are fixed at construction
    (kmeans++, GP_utils.h:521)."""

    def __init__(self, base, taper, inducing_points, dtype=jnp.float64):
        super().__init__(base)
        self.taper = taper
        self.ip = jnp.asarray(inducing_points, dtype)

    def _low_rank(self, x1, x2, alphas):
        K_uu = self._base_corr(self.ip, self.ip, alphas) \
            + _JITTER * jnp.eye(self.ip.shape[0], dtype=self.ip.dtype)
        L = jnp.linalg.cholesky(K_uu)
        V1 = jsl.solve_triangular(L, self._base_corr(self.ip, x1, alphas),
                                  lower=True)   # (m, n1)
        V2 = jsl.solve_triangular(L, self._base_corr(self.ip, x2, alphas),
                                  lower=True)   # (m, n2)
        return V1.T @ V2

    def corr_from_coords(self, x1, x2, alphas):
        K = self._base_corr(x1, x2, alphas)
        U = self._low_rank(x1, x2, alphas)
        T = self.taper._wendland_taper(pairwise_dist(x1, x2))
        return U + T * (K - U)
