"""Data-parallel Vecchia GP training step over a device mesh.

The Vecchia NLL is a sum of independent per-row terms (each row's conditional
given its neighbors), so it shards perfectly over the data axis: every device
holds a row block of (neighbor distances, response, neighbor responses),
computes its batched (m, m) Cholesky pipeline locally, and one psum over ICI
reduces (quad, logdet, y-moments). One GD step on the profiled objective then
runs replicated.

NOTE — this is a minimal WORKED EXAMPLE (fixed exponential kernel, single
GP) kept as executable documentation; the production sharded Vecchia path
is `VecchiaGaussianEngine(mesh=...)` via `GPModel(num_parallel_devices=N)`.

This is the TPU mapping of SURVEY §2.4's "n-scaling axis is
what gets sharded" — the reference has no distributed GP path at all (its
network layer only serves the tree learners).
"""

from ..ops.jit_utils import lifted_jit
import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:                      # older jax
    from jax.experimental.shard_map import shard_map


def shard_vecchia_inputs(engine, y, n_devices):
    """Pad + reshape a VecchiaGaussianEngine's static data for sharding.

    Returns (d_nn, d_ni, mask, y_ord, y_nbr) padded to a multiple of
    n_devices along axis 0 (padded rows are fully masked).
    """
    n, m = engine._nn_idx.shape
    pad = (-n) % n_devices
    d_nn = np.asarray(engine._d_nn)
    d_ni = np.asarray(engine._d_ni)
    mask = np.asarray(engine._nn_mask)
    y_ord = np.asarray(y, dtype=np.float64)[engine.perm]
    y_nbr = y_ord[np.asarray(engine._nn_idx)]
    if pad:
        d_nn = np.concatenate([d_nn, np.zeros((pad, m, m))])
        d_ni = np.concatenate([d_ni, np.zeros((pad, m))])
        mask = np.concatenate([mask, np.zeros((pad, m), bool)])
        y_ord = np.concatenate([y_ord, np.zeros(pad)])
        y_nbr = np.concatenate([y_nbr, np.zeros((pad, m))])
    # fully masked rows contribute log D = log(v+1) -> track a row-valid flag
    row_valid = np.ones(n + pad)
    row_valid[n:] = 0.0
    return d_nn, d_ni, mask, y_ord, y_nbr, row_valid, n


def make_sharded_vecchia_gd_step(mesh, corr_from_dist, n_total, m, lr=0.1,
                                 axis_name="dp"):
    """Build a jitted data-parallel GD step for the profiled Vecchia NLL.

    Inputs: u = log([v_tilde, alpha]) replicated; per-row arrays sharded over
    `axis_name`. Returns (u_new, profiled nll).
    """

    def local_step(u, d_nn, d_ni, mask, y, y_nbr, row_valid):
        def quad_logdet(u):
            v = jnp.exp(u[0])
            alpha = jnp.exp(u[1])
            K_nn = v * corr_from_dist(d_nn, alpha) \
                + jnp.eye(m, dtype=d_nn.dtype)[None]
            k_ni = v * corr_from_dist(d_ni, alpha)
            pair = mask[:, :, None] & mask[:, None, :]
            K_nn = jnp.where(pair, K_nn, jnp.eye(m, dtype=d_nn.dtype)[None])
            k_ni = jnp.where(mask, k_ni, 0.0)
            L = jnp.linalg.cholesky(K_nn)
            A = jax.vmap(lambda Li, ki: jsl.cho_solve((Li, True), ki))(L, k_ni)
            D = (v + 1.0) - jnp.sum(A * k_ni, axis=1)
            z = y - jnp.sum(A * y_nbr, axis=1)
            quad = jax.lax.psum(jnp.sum(row_valid * z * z / D), axis_name)
            logdet = jax.lax.psum(jnp.sum(row_valid * jnp.log(D)), axis_name)
            return quad, logdet

        def nll_profiled(u):
            quad, logdet = quad_logdet(u)
            return 0.5 * (logdet + n_total * jnp.log(quad / n_total)
                          + n_total + n_total * math.log(2.0 * math.pi))

        nll, g = jax.value_and_grad(nll_profiled)(u)
        return u - lr * g, nll

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P()))
    return lifted_jit(step)
