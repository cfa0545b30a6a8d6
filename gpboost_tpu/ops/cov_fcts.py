"""Covariance (kernel) functions on GPBoost's internal "transformed" parameterization.

Reference semantics: include/GPBoost/cov_fcts.h. Each GP component has parameters
[variance, range(s)] on the *original* scale. Internally the optimizer works on a
transformed scale (cov_fcts.h:500-560 TransformCovPars):

    variance  ->  variance / sigma2_error        (Gaussian likelihood; else /1)
    matern    ->  alpha = sqrt(2*shape)/rho      (1/rho, sqrt(3)/rho, sqrt(5)/rho
                                                  for shape 0.5 / 1.5 / 2.5)
    gaussian  ->  alpha = 1/rho^2
    powered_exponential -> alpha = 1/rho^shape
    matern_space_time / matern_ard -> alpha_i = sqrt(2*shape)/rho_i
    gaussian_ard -> alpha_i = 1/rho_i^2

Correlation formulas (cov_fcts.h:2103-2163), with rd = alpha * dist:
    matern 0.5 / exponential : exp(-rd)
    matern 1.5               : (1 + rd) exp(-rd)
    matern 2.5               : (1 + rd + rd^2/3) exp(-rd)
    gaussian                 : exp(-alpha d^2)
    powered_exponential      : exp(-alpha d^shape)

All corr functions are pure jnp and autodiff-friendly; gradients of the NLL wrt
log-transformed parameters come from jax.grad, replacing the reference's ~3k lines
of handwritten gradient code (re_model_template.h:1933-2592, cov_fcts.h:2180-2620).
"""

import math

import numpy as np
import jax.numpy as jnp

from .distances import pairwise_dist, pairwise_dist_sq

SUPPORTED_COV_FUNCTIONS = (
    "exponential",
    "matern",
    "gaussian",
    "powered_exponential",
    "matern_ard",
    "gaussian_ard",
    "matern_space_time",
    "wendland",
)


def _matern_base(scaled_dist, shape):
    """Matern correlation at transformed (scaled) distance, closed-form shapes."""
    if abs(shape - 0.5) < 1e-10:
        return jnp.exp(-scaled_dist)
    if abs(shape - 1.5) < 1e-10:
        return (1.0 + scaled_dist) * jnp.exp(-scaled_dist)
    if abs(shape - 2.5) < 1e-10:
        return (1.0 + scaled_dist + scaled_dist * scaled_dist / 3.0) * jnp.exp(-scaled_dist)
    raise NotImplementedError(
        f"matern shape {shape}: general Bessel-K shapes not yet implemented"
    )


def _safe_sqrt(s):
    """sqrt with zero-gradient (instead of NaN) at exactly-zero entries."""
    zero = s == 0.0
    return jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, s)))


class CovarianceFunction:
    """One GP covariance component (variance excluded — correlation only).

    Parameters on original scale: [range(s)] handled here; the variance parameter
    is applied by the model engine. `num_range_par` ranges; isotropic kernels use a
    precomputed distance matrix, anisotropic ones the raw coordinates.
    """

    def __init__(self, cov_fct_type, shape=None, dim=None,
                 taper_range=1.0, taper_shape=1.0, taper_mu=2.0):
        if cov_fct_type not in SUPPORTED_COV_FUNCTIONS:
            raise ValueError(
                f"cov_function '{cov_fct_type}' is not supported. "
                f"Supported: {SUPPORTED_COV_FUNCTIONS}"
            )
        self.cov_fct_type = cov_fct_type
        if shape is None:
            # reference defaults: matern -> 1.5, powered_exponential -> 1.0
            if cov_fct_type in ("matern", "matern_ard", "matern_space_time"):
                shape = 1.5
            elif cov_fct_type == "powered_exponential":
                shape = 1.0
            elif cov_fct_type == "wendland":
                shape = 1.0
        self.shape = shape
        self.dim = dim
        self.taper_range = taper_range
        self.taper_shape = taper_shape
        self.taper_mu = taper_mu
        if cov_fct_type in ("matern", "powered_exponential") and shape is not None:
            if cov_fct_type == "matern" and shape <= 0:
                raise ValueError("matern shape must be > 0")
            if cov_fct_type == "powered_exponential" and not (0 < shape <= 2):
                raise ValueError("powered_exponential shape must be in (0, 2]")

    # ------------------------------------------------------------------
    @property
    def is_isotropic(self):
        return self.cov_fct_type in (
            "exponential", "matern", "gaussian", "powered_exponential", "wendland",
        )

    @property
    def num_range_par(self):
        if self.is_isotropic:
            return 0 if self.cov_fct_type == "wendland" else 1
        if self.cov_fct_type == "matern_space_time":
            return 2
        # ARD kernels: one range per coordinate dimension
        if self.dim is None:
            raise ValueError("ARD covariance functions need dim")
        return self.dim

    @property
    def num_cov_par(self):
        """variance + ranges (cov_fcts.h num_cov_par_)."""
        return 1 + self.num_range_par

    def _matern_mult_const(self):
        s = self.shape
        if abs(s - 0.5) < 1e-10:
            return 1.0
        if abs(s - 1.5) < 1e-10:
            return math.sqrt(3.0)
        if abs(s - 2.5) < 1e-10:
            return math.sqrt(5.0)
        return math.sqrt(2.0 * s)

    # ------------------------------------------------------------------
    # parameter transforms (original range rho <-> transformed alpha)
    def range_to_transformed(self, ranges):
        r = np.asarray(ranges, dtype=np.float64)
        t = self.cov_fct_type
        if t in ("exponential",):
            return 1.0 / r
        if t in ("matern", "matern_ard", "matern_space_time"):
            return self._matern_mult_const() / r
        if t in ("gaussian", "gaussian_ard"):
            return 1.0 / (r * r)
        if t == "powered_exponential":
            return 1.0 / np.power(r, self.shape)
        if t == "wendland":
            return r  # no range parameter estimated
        raise AssertionError(t)

    def range_from_transformed(self, alphas):
        a = np.asarray(alphas, dtype=np.float64)
        t = self.cov_fct_type
        if t in ("exponential",):
            return 1.0 / a
        if t in ("matern", "matern_ard", "matern_space_time"):
            return self._matern_mult_const() / a
        if t in ("gaussian", "gaussian_ard"):
            return 1.0 / np.sqrt(a)
        if t == "powered_exponential":
            return np.power(a, -1.0 / self.shape)
        if t == "wendland":
            return a
        raise AssertionError(t)

    # ------------------------------------------------------------------
    # correlation matrices
    def corr_from_dist(self, D, alpha):
        """Correlation from a precomputed distance matrix (isotropic kernels).

        alpha: transformed range parameter (scalar jnp value).
        """
        t = self.cov_fct_type
        if t == "exponential":
            return jnp.exp(-alpha * D)
        if t == "matern":
            return _matern_base(alpha * D, self.shape)
        if t == "gaussian":
            return jnp.exp(-alpha * D * D)
        if t == "powered_exponential":
            return jnp.exp(-alpha * jnp.power(D, self.shape))
        if t == "wendland":
            return self._wendland_taper(D)
        raise AssertionError(t)

    def _wendland_taper(self, D):
        """Compact-support Wendland correlation (cov_fcts.h:1957-1986)."""
        x = D / self.taper_range
        inside = x < 1.0
        one_minus = jnp.maximum(1.0 - x, 0.0)
        mu = self.taper_mu
        if abs(self.taper_shape - 0.0) < 1e-10:
            val = jnp.power(one_minus, mu)
        elif abs(self.taper_shape - 1.0) < 1e-10:
            val = jnp.power(one_minus, mu + 1.0) * (1.0 + x * (mu + 1.0))
        elif abs(self.taper_shape - 2.0) < 1e-10:
            val = jnp.power(one_minus, mu + 2.0) * (
                1.0 + x * (mu + 2.0) + x * x * (mu * mu + 4.0 * mu + 3.0) / 3.0
            )
        else:
            raise NotImplementedError(f"wendland taper_shape {self.taper_shape}")
        return jnp.where(inside, val, 0.0)

    def aniso_scale(self, alphas, dim):
        """Per-dimension coordinate scale s so that the anisotropic
        correlation equals base_corr_scaled_dist(||s*(x1-x2)||)
        (re_comp.h:1128-1158 coordinate scaling)."""
        t = self.cov_fct_type
        if t == "matern_space_time":
            return jnp.concatenate(
                [alphas[:1], jnp.full((dim - 1,), alphas[1])])
        if t == "matern_ard":
            return alphas
        if t == "gaussian_ard":
            return jnp.sqrt(alphas)
        raise AssertionError(t)

    def base_corr_scaled_dist(self, d):
        """Correlation at an already coordinate-scaled distance (anisotropic
        kernels only; the range parameters are folded into the coordinates)."""
        t = self.cov_fct_type
        if t in ("matern_ard", "matern_space_time"):
            return _matern_base(d, self.shape)
        if t == "gaussian_ard":
            return jnp.exp(-d * d)
        raise AssertionError(t)

    def corr_from_coords(self, x1, x2, alphas):
        """Correlation from coordinates (anisotropic kernels).

        alphas: (num_range_par,) transformed ranges. For matern_space_time the
        first coordinate column is time (re_comp.h:1128-1158 coordinate scaling).
        """
        t = self.cov_fct_type
        if t in ("matern_ard", "matern_space_time"):
            if t == "matern_space_time":
                scale = jnp.concatenate(
                    [alphas[:1], jnp.full((x1.shape[1] - 1,), alphas[1])]
                )
            else:
                scale = alphas
            ds = _safe_sqrt(pairwise_dist_sq(x1 * scale, x2 * scale, method="direct"))
            return _matern_base(ds, self.shape)
        if t == "gaussian_ard":
            sq = pairwise_dist_sq(
                x1 * jnp.sqrt(alphas), x2 * jnp.sqrt(alphas), method="direct"
            )
            return jnp.exp(-sq)
        if self.is_isotropic:
            D = pairwise_dist(x1, x2)
            return self.corr_from_dist(D, alphas if jnp.ndim(alphas) == 0 else alphas[0])
        raise AssertionError(t)
