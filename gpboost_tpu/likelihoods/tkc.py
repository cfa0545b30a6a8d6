"""Triangular-kernel-curvature (TKC) approximation for kinked likelihoods.

Reference: likelihoods.h:13555 FindDeltaMode_TKC_Approx, :13637
GoodnessFit_TKC_approx, :13510 NegativeHessian_TKC_Approx_AsymLaplace.
The curvature is one constant c = (dll_up + dll_down) / (n * delta^2) where
delta minimizes the unexplained variance of a quadratic fit to the total
log-likelihood at +-delta and +-delta/2 around the current location
parameter. The reference's search (upper-limit doubling from 0.1 followed
by ternary bisection to 1e-3 relative width) is replicated step-for-step so
golden values match; it runs entirely under jit as fixed-bound
lax.while_loops of scalar ops around O(n) log-likelihood reductions.

The returned curvature is differentiable wrt the location parameter with
delta treated as a constant (stop_gradient) -- the same convention as the
reference's hand derivative (likelihoods.h:14110):
d c / d loc_i = (2 d1_i(loc) - d1_i(loc+delta) - d1_i(loc-delta)) / (n d^2).
"""

import jax
import jax.numpy as jnp

TKC_MIN_DECREASE = 0.1           # TKC_MIN_DECREASE_LOG_LIKE_, likelihoods.h:17249
# GOODNESS_FIT_MIN_DECREASE_LOG_LIKE_NOT_MET_ is 1e98 in the reference; the
# TPU runtime's extended-precision f64 keeps f32 RANGE (values above ~3.4e38
# overflow to inf), so the sentinel is lowered to a representable value. The
# search logic only compares against it, so semantics are unchanged as long
# as no legitimate SS_res/SS_tot ratio reaches 1e30.
GF_NOT_MET = 1e30
EPS_NUM = 1e-10                  # EPSILON_NUMBERS, utils.h:24
CURV_FLOOR = 1e-10               # NegativeHessian floor, likelihoods.h:13516


def tkc_neg_curvature(ll_shift, n_data):
    """Constant negative curvature of the TKC approximation.

    ll_shift(s) must return the total (weighted) log-likelihood with the
    location parameter shifted by the scalar s (AddConstantToLocationPar,
    likelihoods.h:13528).
    """
    ll0 = ll_shift(0.0)
    nd = jnp.asarray(n_data, ll0.dtype)

    def _curv(delta, d_up, d_dn):
        return jnp.maximum((d_up + d_dn) / (nd * delta * delta), CURV_FLOOR)

    def gf(delta):
        d_up = ll0 - ll_shift(delta)
        d_dn = ll0 - ll_shift(-delta)
        bad = jnp.logical_or(d_up < TKC_MIN_DECREASE,
                             d_dn < TKC_MIN_DECREASE)
        d_uph = ll0 - ll_shift(delta / 2.0)
        d_dnh = ll0 - ll_shift(-delta / 2.0)
        c = _curv(delta, d_up, d_dn)
        # quadratic-fit differences (Diff_TKC_Approx..., sum_first_deriv = 0)
        a_full = nd * delta * delta * c / 2.0
        a_half = a_full / 4.0
        mean = (d_up + d_uph + d_dn + d_dnh) / 4.0
        ss_res = ((d_up - a_full) ** 2 + (d_uph - a_half) ** 2
                  + (d_dn - a_full) ** 2 + (d_dnh - a_half) ** 2)
        ss_tot = ((d_up - mean) ** 2 + (d_uph - mean) ** 2
                  + (d_dn - mean) ** 2 + (d_dnh - mean) ** 2)
        return jnp.where(bad, GF_NOT_MET, ss_res / ss_tot)

    # ---- upper limit: double from 0.1 until gf stops decreasing ---------
    def up_cond(c):
        it, _, _, done = c
        return jnp.logical_and(~done, it < 100)

    def up_body(c):
        it, upper, u_lim, _ = c
        upper2 = upper * 2.0
        u = gf(upper2)
        stop = jnp.logical_or(
            jnp.logical_and(u < GF_NOT_MET, u >= u_lim * 0.999),
            ~jnp.isfinite(u))
        return (it + 1, upper2, jnp.where(stop, u_lim, u), stop)

    upper0 = jnp.asarray(0.1, ll0.dtype)
    _, upper, _, _ = jax.lax.while_loop(
        up_cond, up_body,
        (0, upper0, gf(upper0), jnp.asarray(False)))

    # ---- ternary search for the minimum of gf on [0, upper] -------------
    def eq1(v):
        return jnp.abs(v - 1.0) < EPS_NUM * jnp.maximum(1.0, jnp.abs(v))

    def t_cond(c):
        it, _, _, done = c
        return jnp.logical_and(~done, it < 100)

    def t_body(c):
        it, lo, hi, _ = c
        mid1 = lo + (hi - lo) / 3.0
        mid2 = lo + 2.0 * (hi - lo) / 3.0
        v1, v2 = gf(mid1), gf(mid2)
        both_one = jnp.logical_and(eq1(v1), eq1(v2))
        go_up = jnp.logical_or(v1 < v2, ~jnp.isfinite(v2))
        lo_n = jnp.where(both_one, mid2, jnp.where(go_up, lo, mid1))
        hi_n = jnp.where(both_one, hi, jnp.where(go_up, mid2, hi))
        done = jnp.abs(hi_n - lo_n) <= 1e-3 * jnp.abs(lo_n)
        return (it + 1, lo_n, hi_n, done)

    _, lo, hi, _ = jax.lax.while_loop(
        t_cond, t_body,
        (0, jnp.zeros_like(upper), upper, jnp.asarray(False)))
    delta = jax.lax.stop_gradient((lo + hi) / 2.0)

    d_up = ll0 - ll_shift(delta)
    d_dn = ll0 - ll_shift(-delta)
    return _curv(delta, d_up, d_dn)
