"""Batched small-matrix Cholesky solves for the Vecchia hot path.

XLA's `jnp.linalg.cholesky` / `triangular_solve` on a (n, m, m) batch of TINY
matrices lowers to a blocked loop with dynamic slicing that is catastrophically
slow on TPU (~240 ms for n=100k, m=20 — vs ~2 ms of HBM-roofline). The Vecchia
hot path needs exactly that shape: one (m, m) solve per data row.

TPU-first alternative: unroll the factorization over the STATIC m dimension at
trace time so every step is a plain batched elementwise op that XLA fuses into
a few VPU kernels at HBM bandwidth (replacing the reference's hand-written
dB/dtheta, dD/dtheta — Vecchia_utils.cpp:1443). Two compile-cost disciplines
learned the hard way on a single-core host / remote-tunnel TPU target:

  * the unroll is written in COLUMN-SWEEP form — O(m) ops on (n, m[, m])
    arrays instead of O(m^2) ops on (n,) slices — keeping the HLO graph small
    enough to compile in seconds;
  * `cho_solve_batched` carries a custom VJP (b̄ = K⁻¹x̄ via the saved factor,
    K̄ = -b̄ xᵀ), so autodiff never unrolls through the factorization — the
    backward pass is just two more triangular sweeps.

Use for m <= ~32 (the practical Vecchia num_neighbors range); fall back to
jnp.linalg.cholesky above that.
"""

import jax
import jax.numpy as jnp
import numpy as np

UNROLL_MAX_M = 32


def chol_cols(K):
    """Cholesky of a (n, m, m) SPD batch, left-looking column sweep.

    Returns C (n, m, m) with C[:, i, j] = L[i, j] (zeros above the diagonal).
    """
    n, m, _ = K.shape
    C = jnp.zeros_like(K)
    for j in range(m):
        # s_i = K[i, j] - sum_{p<j} L[i, p] L[j, p]; columns p >= j of C are
        # still zero, so the full-axis reduction only picks up p < j
        s = K[:, :, j] - jnp.sum(C * C[:, j:j + 1, :], axis=-1)
        d = jnp.sqrt(s[:, j])
        col = s / d[:, None]
        if j > 0:
            col = col * (np.arange(m) >= j).astype(K.dtype)[None, :]
        C = C.at[:, :, j].set(col)
    return C


def solve_lower_cols(C, b):
    """z = L^{ -1} b for the batch: forward column sweep, b (n, m)."""
    m = b.shape[1]
    s = b
    z = jnp.zeros_like(b)
    for j in range(m):
        zj = s[:, j] / C[:, j, j]
        z = z.at[:, j].set(zj)
        # eliminate column j from the remaining equations (rows > j); the
        # j-th row of s is already consumed, over-subtracting it is harmless
        s = s - C[:, :, j] * zj[:, None]
    return z


def solve_upper_cols(C, z):
    """x = L^{-T} z for the batch: backward column sweep."""
    m = z.shape[1]
    s = z
    x = jnp.zeros_like(z)
    for j in range(m - 1, -1, -1):
        xj = s[:, j] / C[:, j, j]
        x = x.at[:, j].set(xj)
        # L' has entry (i, j) = L[j, i] = C[:, j, i]: row j of C
        s = s - C[:, j, :] * xj[:, None]
    return x


def _cho_solve_from_factor(C, b):
    return solve_upper_cols(C, solve_lower_cols(C, b))


@jax.custom_vjp
def cho_solve_batched(K, b):
    """x = K^{-1} b for K (n, m, m) SPD, b (n, m) — unrolled for small m."""
    return _cho_solve_from_factor(chol_cols(K), b)


def _cho_solve_fwd(K, b):
    C = chol_cols(K)
    x = _cho_solve_from_factor(C, b)
    return x, (C, x)


def _cho_solve_bwd(res, x_bar):
    C, x = res
    g = _cho_solve_from_factor(C, x_bar)       # K^{-1} x̄ (K symmetric)
    K_bar = -g[:, :, None] * x[:, None, :]
    return K_bar, g


cho_solve_batched.defvjp(_cho_solve_fwd, _cho_solve_bwd)


def cho_logdet_batched(K):
    """(C, log|K|) per batch row."""
    C = chol_cols(K)
    ld = 2.0 * jnp.sum(jnp.log(jnp.diagonal(C, axis1=1, axis2=2)), axis=1)
    return C, ld


# legacy aliases (round <= 4 API)
def chol_unrolled(K):
    """Columns-as-list view of chol_cols (kept for API compatibility)."""
    C = chol_cols(K)
    return [C[:, :, j] for j in range(K.shape[1])]
