"""Pairwise distance computation, TPU-first.

Two regimes:
  * small/accurate: direct coordinate differences, O(n*m*d) memory. Matches the
    numerics of R's dist() / the reference's Eigen loop (GP_utils.h:51-131) to
    machine precision — used for golden-value parity and moderate n.
  * large/matmul: the |x|^2 + |y|^2 - 2<x,y> expansion. One big GEMM that maps
    straight onto the MXU; used when the (n, m, d) broadcast would blow HBM.
"""

import jax.numpy as jnp

# Above this many pairwise entries, switch to the GEMM-based formula.
_DIRECT_MAX_ENTRIES = 64_000_000  # ~0.5 GB of f64 at d=1 intermediate


def pairwise_dist_sq(x1, x2=None, *, method: str = "auto"):
    """Squared Euclidean distances between rows of x1 (n,d) and x2 (m,d)."""
    if x2 is None:
        x2 = x1
    n, d = x1.shape
    m = x2.shape[0]
    if method == "auto":
        method = "direct" if n * m * d <= _DIRECT_MAX_ENTRIES else "gemm"
    if method == "direct":
        diff = x1[:, None, :] - x2[None, :, :]
        return jnp.sum(diff * diff, axis=-1)
    sq1 = jnp.sum(x1 * x1, axis=1)
    sq2 = jnp.sum(x2 * x2, axis=1)
    cross = x1 @ x2.T
    out = sq1[:, None] + sq2[None, :] - 2.0 * cross
    return jnp.maximum(out, 0.0)


def pairwise_dist(x1, x2=None, *, method: str = "auto"):
    """Euclidean distances between rows of x1 (n,d) and x2 (m,d)."""
    return jnp.sqrt(pairwise_dist_sq(x1, x2, method=method))
