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
    "matern_estimate_shape",
    "matern_ard_estimate_shape",
    "space_time_gneiting",
    "hurst",
    "hurst_ard",
    "linear",
)


def _matern_base(scaled_dist, shape):
    """Matern correlation at transformed (scaled) distance. Closed forms for
    shape 0.5/1.5/2.5 (cov_fcts.h:2100-2118); Bessel-K for general shapes
    (cov_fcts.h:2120-2134 CovarianceMaternGeneralShape)."""
    if abs(shape - 0.5) < 1e-10:
        return jnp.exp(-scaled_dist)
    if abs(shape - 1.5) < 1e-10:
        return (1.0 + scaled_dist) * jnp.exp(-scaled_dist)
    if abs(shape - 2.5) < 1e-10:
        return (1.0 + scaled_dist + scaled_dist * scaled_dist / 3.0) * jnp.exp(-scaled_dist)
    from .special_fns import matern_correlation_general
    return matern_correlation_general(scaled_dist, shape)


def _matern_base_traced(scaled_dist, shape):
    """Matern correlation with a traced (estimated) smoothness parameter —
    always the Bessel-K form since the closed-form dispatch needs a static
    shape (space_time_gneiting's nu, cov_fcts.h:2858-2878)."""
    from .special_fns import matern_correlation_general
    return matern_correlation_general(scaled_dist, shape)


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
            elif cov_fct_type == "space_time_gneiting":
                shape = 0.0  # unused; nu is an estimated parameter
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
            "exponential", "matern", "gaussian", "powered_exponential",
            "wendland", "matern_estimate_shape",
        )

    @property
    def needs_coords(self):
        """Kernels not expressible as base_corr(scaled distance) — evaluated
        directly from coordinate pairs (cov_fcts.h cov_calculated_based_on_
        coords_ for space_time_gneiting/hurst; 'linear' analogously)."""
        return self.cov_fct_type in (
            "space_time_gneiting", "hurst", "hurst_ard", "linear",
        )

    @property
    def num_range_par(self):
        t = self.cov_fct_type
        if t == "wendland" or t == "linear":
            return 0
        if t in ("exponential", "matern", "gaussian", "powered_exponential",
                 "hurst"):
            return 1    # hurst: the Hurst exponent H (cov_fcts.h:165)
        if t == "matern_estimate_shape":
            return 2    # range + smoothness (cov_fcts.h:150)
        if t == "matern_space_time":
            return 2
        if t == "space_time_gneiting":
            return 6    # a, c, alpha, nu, beta, delta (cov_fcts.h:162)
        # ARD kernels: one range per coordinate dimension
        if self.dim is None:
            raise ValueError("ARD covariance functions need dim")
        if t == "matern_ard_estimate_shape":
            return self.dim + 1     # ranges + smoothness (cov_fcts.h:156)
        if t == "hurst_ard":
            return self.dim         # H + (dim-1) ranges (cov_fcts.h:154)
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
    def range_to_transformed(self, ranges, var=None):
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
        if t in ("wendland", "linear", "matern_estimate_shape",
                 "matern_ard_estimate_shape", "space_time_gneiting"):
            return r  # identity: estimated on the original scale
        if t in ("hurst", "hurst_ard"):
            # H in (0,1) -> -log(H) > 0; remaining ranges identity
            out = r.copy()
            out[..., 0] = -np.log(r[..., 0])
            return out
        raise AssertionError(t)

    def range_from_transformed(self, alphas, var=None):
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
        if t in ("wendland", "linear", "matern_estimate_shape",
                 "matern_ard_estimate_shape", "space_time_gneiting"):
            return a
        if t in ("hurst", "hurst_ard"):
            out = a.copy()
            out[..., 0] = np.exp(-a[..., 0])
            return out
        raise AssertionError(t)

    def range_to_transformed_jnp(self, rho, var=None):
        """Differentiable rho -> alpha transform (used by the original-scale
        Fisher-information path)."""
        t = self.cov_fct_type
        if t == "exponential":
            return 1.0 / rho
        if t in ("matern", "matern_ard", "matern_space_time"):
            return self._matern_mult_const() / rho
        if t in ("gaussian", "gaussian_ard"):
            return 1.0 / (rho * rho)
        if t == "powered_exponential":
            return jnp.power(rho, -self.shape)
        if t in ("wendland", "linear", "matern_estimate_shape",
                 "matern_ard_estimate_shape", "space_time_gneiting"):
            return rho
        if t in ("hurst", "hurst_ard"):
            return jnp.concatenate([-jnp.log(rho[..., :1]), rho[..., 1:]],
                                   axis=-1)
        raise AssertionError(t)

    # ------------------------------------------------------------------
    # correlation matrices
    def corr_from_dist(self, D, alpha):
        """Correlation from a precomputed distance matrix (isotropic kernels).

        alpha: transformed range parameter(s) — scalar, or the full alphas
        vector for kernels with more than one isotropic parameter
        (matern_estimate_shape: [range, shape]).
        """
        t = self.cov_fct_type
        if t == "wendland":
            return self._wendland_taper(D)
        if t == "matern_estimate_shape":
            # rd = d*sqrt(2 s)/range, range on the original scale
            # (cov_fcts.h:2136-2152 CovarianceMaternEstimateShape)
            from .special_fns import matern_correlation_general
            rng, shp = alpha[0], alpha[1]
            return matern_correlation_general(D * jnp.sqrt(2.0 * shp) / rng,
                                              shp)
        if jnp.ndim(alpha) > 0:
            alpha = alpha[0]
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
        correlation equals base_corr_scaled_dist(||s*(x1-x2)||, alphas)
        (re_comp.h:1128-1158 coordinate scaling)."""
        t = self.cov_fct_type
        if t == "matern_space_time":
            return jnp.concatenate(
                [alphas[:1], jnp.full((dim - 1,), alphas[1])])
        if t == "matern_ard":
            return alphas
        if t == "gaussian_ard":
            return jnp.sqrt(alphas)
        if t == "matern_ard_estimate_shape":
            return 1.0 / alphas[:dim]   # cov_fcts.h:298-301 (coords / range)
        raise AssertionError(t)

    def base_corr_scaled_dist(self, d, alphas=None):
        """Correlation at an already coordinate-scaled distance (anisotropic
        kernels only; the range parameters are folded into the coordinates)."""
        t = self.cov_fct_type
        if t in ("matern_ard", "matern_space_time"):
            return _matern_base(d, self.shape)
        if t == "gaussian_ard":
            return jnp.exp(-d * d)
        if t == "matern_ard_estimate_shape":
            from .special_fns import matern_correlation_general
            shp = alphas[-1]
            return matern_correlation_general(jnp.sqrt(2.0 * shp) * d, shp)
        raise AssertionError(t)

    # ------------------------------------------------------------------
    # coordinate-pair kernels (cov_calculated_based_on_coords_):
    # space_time_gneiting, hurst(+ard), linear
    def corr_pointwise(self, xa, xb, alphas):
        """Kernel value (divided by the variance parameter) between coordinate
        arrays xa, xb of broadcastable shape [..., d]."""
        t = self.cov_fct_type
        if t == "space_time_gneiting":
            # pars [a, c, alpha, nu, beta, delta]; Gneiting (2002) Eq. (16)
            # (cov_fcts.h:2849-2879 SpaceTimeGneitingCovariance_vec)
            a, c, al, nu, beta, delta = (alphas[i] for i in range(6))
            # CapPars (cov_fcts.h:468-479): alpha <= 1, beta <= 1
            al = jnp.minimum(al, 1.0)
            beta = jnp.minimum(beta, 1.0)
            dim_space = xa.shape[-1] - 1
            dist_time = jnp.abs(xa[..., 0] - xb[..., 0])
            dist_space = _safe_sqrt(
                ((xa[..., 1:] - xb[..., 1:]) ** 2).sum(-1))
            d_aux_time = a * jnp.power(
                jnp.where(dist_time > 0.0, dist_time, 1.0), 2.0 * al)
            d_aux_time = jnp.where(dist_time > 0.0, d_aux_time, 0.0) + 1.0
            d_aux = c * dist_space / jnp.power(d_aux_time, beta / 2.0)
            d_aux2 = 1.0 / jnp.power(d_aux_time, delta + beta * dim_space / 2.0)
            return d_aux2 * _matern_base_traced(d_aux, nu)
        if t in ("hurst", "hurst_ard"):
            # fractional-Brownian-field kernel (cov_fcts.h:3047-3055
            # HurstCovariance_vec), H = exp(-alphas[0]); for hurst_ard the
            # non-time coordinates are scaled by 1/range (cov_fcts.h:304-309)
            H = jnp.exp(-alphas[0])
            if t == "hurst_ard":
                scale = jnp.concatenate(
                    [jnp.ones((1,), xa.dtype), 1.0 / alphas[1:]])
                xa = xa * scale
                xb = xb * scale
            na = (xa ** 2).sum(-1)
            nb = (xb ** 2).sum(-1)
            nab = ((xa - xb) ** 2).sum(-1)
            powH = lambda s: jnp.where(
                s > 0.0, jnp.power(jnp.where(s > 0.0, s, 1.0), H), 0.0)
            return 0.5 * (powH(na) + powH(nb) - powH(nab))
        if t == "linear":
            return (xa * xb).sum(-1)
        raise AssertionError(t)

    def corr_from_coords(self, x1, x2, alphas):
        """Correlation from coordinates (anisotropic / coords-based kernels).

        alphas: (num_range_par,) transformed parameters. For matern_space_time
        the first coordinate column is time (re_comp.h:1128-1158).
        """
        t = self.cov_fct_type
        if self.needs_coords:
            return self.corr_pointwise(x1[:, None, :], x2[None, :, :], alphas)
        if t in ("matern_ard", "matern_space_time", "matern_ard_estimate_shape"):
            scale = self.aniso_scale(alphas, x1.shape[1])
            # subtract before scaling so identical points stay exactly zero
            # under XLA FMA contraction (see models/vecchia._corr_sets)
            diff = (x1[:, None, :] - x2[None, :, :]) * scale
            ds = _safe_sqrt(jnp.sum(diff * diff, axis=-1))
            return self.base_corr_scaled_dist(ds, alphas)
        if t == "gaussian_ard":
            sq = pairwise_dist_sq(
                x1 * jnp.sqrt(alphas), x2 * jnp.sqrt(alphas), method="direct"
            )
            return jnp.exp(-sq)
        if self.is_isotropic:
            D = pairwise_dist(x1, x2)
            return self.corr_from_dist(D, alphas)
        raise AssertionError(t)


class AR1MultifidelityCovariance:
    """Two-level AR1 multifidelity covariance (cov_fcts.h:1690
    InitializeAR1Multifidelity, :1798 CalculateCovMatAR1Multifidelity):

        K(x, x') = L(f) L(f') K_low(s, s') + f f' K_disc(s, s'),
        L(f) = 1 + f (rho - 1),

    with s the spatial coordinates, f in {0,1} the fidelity indicator in the
    LAST coordinate column, and rho the (possibly negative) AR1 coefficient.
    User parameter order (after the error variance):
    [var_low, ranges_low..., var_disc, ranges_disc..., rho]. The engine's
    variance slot carries var_low; internally the discrepancy variance is
    kept as the sigma-invariant ratio var_disc/var_low and rho as exp(rho).
    """

    is_isotropic = False
    needs_coords = True

    def __init__(self, base_type, shape=None, dim=None):
        if dim is None or dim < 2:
            raise ValueError(
                "AR1 multifidelity covariance functions require at least one "
                "input coordinate and a fidelity indicator in the last column")
        if base_type in ("wendland",) or base_type.startswith("ar1_mf_"):
            raise ValueError(
                f"invalid base covariance '{base_type}' for AR1 "
                "multifidelity models")
        self.cov_fct_type = "ar1_mf_" + base_type
        self.base_type = base_type
        self.dim = dim
        self.spatial_dim = dim - 1
        self.base_low = CovarianceFunction(base_type, shape=shape,
                                           dim=self.spatial_dim)
        self.base_disc = CovarianceFunction(base_type, shape=shape,
                                            dim=self.spatial_dim)
        self.shape = self.base_low.shape
        self.ncb = self.base_low.num_cov_par      # var + base ranges

    @property
    def num_range_par(self):
        # [ranges_low..., var_disc, ranges_disc..., rho]
        return 2 * self.ncb

    @property
    def num_cov_par(self):
        return 1 + self.num_range_par             # 2*ncb + 1 with var_low

    def _split_user(self, rest):
        nb = self.ncb - 1
        return (rest[..., :nb], rest[..., nb], rest[..., nb + 1: 2 * nb + 1],
                rest[..., -1])

    def range_to_transformed(self, rest, var=None):
        rest = np.asarray(rest, dtype=np.float64)
        rl, vd, rd, rho = self._split_user(rest)
        out = []
        if self.ncb > 1:
            out.append(np.atleast_1d(self.base_low.range_to_transformed(rl)))
        ratio = vd / (var if var is not None else 1.0)
        out.append(np.atleast_1d(ratio))
        if self.ncb > 1:
            out.append(np.atleast_1d(self.base_disc.range_to_transformed(rd)))
        out.append(np.atleast_1d(np.exp(rho)))
        return np.concatenate(out)

    def range_from_transformed(self, a, var=None):
        a = np.asarray(a, dtype=np.float64)
        nb = self.ncb - 1
        out = []
        if nb:
            out.append(np.atleast_1d(
                self.base_low.range_from_transformed(a[:nb])))
        out.append(np.atleast_1d(a[nb] * (var if var is not None else 1.0)))
        if nb:
            out.append(np.atleast_1d(
                self.base_disc.range_from_transformed(a[nb + 1: 2 * nb + 1])))
        out.append(np.atleast_1d(np.log(a[-1])))
        return np.concatenate(out)

    def range_to_transformed_jnp(self, rest, var=None):
        nb = self.ncb - 1
        parts = []
        if nb:
            parts.append(jnp.atleast_1d(
                self.base_low.range_to_transformed_jnp(rest[:nb])))
        ratio = rest[nb] / (var if var is not None else 1.0)
        parts.append(jnp.atleast_1d(ratio))
        if nb:
            parts.append(jnp.atleast_1d(
                self.base_disc.range_to_transformed_jnp(
                    rest[nb + 1: 2 * nb + 1])))
        parts.append(jnp.atleast_1d(jnp.exp(rest[-1])))
        return jnp.concatenate(parts)

    def _base_pointwise(self, base, xa, xb, alphas):
        """Base-kernel correlation between coordinate arrays [..., d]."""
        if base.is_isotropic:
            d = _safe_sqrt(((xa - xb) ** 2).sum(-1))
            return base.corr_from_dist(d, alphas)
        if base.needs_coords:
            return base.corr_pointwise(xa, xb, alphas)
        scale = base.aniso_scale(alphas, xa.shape[-1])
        d = _safe_sqrt((((xa - xb) * scale) ** 2).sum(-1))
        return base.base_corr_scaled_dist(d, alphas)

    def corr_pointwise(self, xa, xb, alphas):
        nb = self.ncb - 1
        a_low = alphas[:nb]
        ratio = alphas[nb]
        a_disc = alphas[nb + 1: 2 * nb + 1]
        rho = jnp.log(alphas[-1])
        sa, fa = xa[..., :-1], xa[..., -1]
        sb, fb = xb[..., :-1], xb[..., -1]
        La = 1.0 + fa * (rho - 1.0)
        Lb = 1.0 + fb * (rho - 1.0)
        c_low = self._base_pointwise(self.base_low, sa, sb, a_low)
        c_disc = self._base_pointwise(self.base_disc, sa, sb, a_disc)
        return La * Lb * c_low + ratio * fa * fb * c_disc

    def corr_from_coords(self, x1, x2, alphas):
        return self.corr_pointwise(x1[:, None, :], x2[None, :, :], alphas)
