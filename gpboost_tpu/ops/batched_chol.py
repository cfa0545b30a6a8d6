"""Batched small-matrix Cholesky solves, unrolled over the matrix dimension.

XLA's `jnp.linalg.cholesky` / `triangular_solve` on a (n, m, m) batch of TINY
matrices lowers to a blocked loop with dynamic slicing that is catastrophically
slow on TPU (~240 ms for n=100k, m=20 — vs ~2 ms of HBM-roofline). The Vecchia
hot path needs exactly that shape: one (m, m) solve per data row.

TPU-first alternative: unroll the Cholesky–Banachiewicz recurrence over the
STATIC m dimension at trace time. Every step is a plain elementwise op over
the (n,)-batch axis, so XLA fuses the whole factorization+solve into a few
VPU kernels at HBM bandwidth, and autodiff works through it (replacing the
reference's hand-written dB/dtheta, dD/dtheta — Vecchia_utils.cpp:1443).

Use for m <= ~32 (the practical Vecchia num_neighbors range); fall back to
jnp.linalg.cholesky above that (graph size grows as m^2).
"""

import jax.numpy as jnp
import numpy as np

UNROLL_MAX_M = 32


def chol_unrolled(K):
    """Cholesky of a (n, m, m) SPD batch with the m-loop unrolled.

    Returns the columns of L as a list: cols[j] is (n, m) holding L[:, :, j]
    (zeros above the diagonal).
    """
    n, m, _ = K.shape
    cols = []
    for j in range(m):
        s = K[:, :, j]
        for p in range(j):
            s = s - cols[p] * cols[p][:, j:j + 1]
        d = jnp.sqrt(s[:, j])
        col = s / d[:, None]
        if j > 0:
            mask = (np.arange(m) >= j).astype(K.dtype)
            col = col * mask[None, :]
        cols.append(col)
    return cols


def solve_lower_unrolled(cols, b):
    """Solve L z = b for a batch: cols from chol_unrolled, b (n, m)."""
    m = len(cols)
    z = []
    for j in range(m):
        s = b[:, j]
        for p in range(j):
            s = s - cols[p][:, j] * z[p]
        z.append(s / cols[j][:, j])
    return z


def solve_upper_unrolled(cols, z):
    """Solve L' x = z for a batch; z is the list from solve_lower_unrolled."""
    m = len(cols)
    x = [None] * m
    for j in range(m - 1, -1, -1):
        s = z[j]
        for p in range(j + 1, m):
            s = s - cols[j][:, p] * x[p]
        x[j] = s / cols[j][:, j]
    return x


def cho_solve_batched(K, b):
    """x = K^{-1} b for K (n, m, m) SPD, b (n, m) — unrolled for small m."""
    cols = chol_unrolled(K)
    z = solve_lower_unrolled(cols, b)
    x = solve_upper_unrolled(cols, z)
    return jnp.stack(x, axis=1)


def cho_logdet_batched(K):
    """(cols, log|K|) per batch row."""
    cols = chol_unrolled(K)
    m = len(cols)
    ld = 0.0
    for j in range(m):
        ld = ld + jnp.log(cols[j][:, j])
    return cols, 2.0 * ld
