"""Data-parallel training steps over a jax device mesh.

The reference's distributed story is hand-rolled TCP/MPI collectives feeding
data-parallel tree learners and synced metrics (src/LightGBM/network/,
network.h:116 Allreduce / :127 AllreduceByAllGather). On TPU all of that
collapses into mesh + sharding annotations + lax collectives riding ICI.

NOTE — these are minimal WORKED EXAMPLES of the mesh/collective pattern
(fixed two-parameter models), kept as executable documentation. The
production sharded paths live in the engines themselves:
`VecchiaGaussianEngine(mesh=...)` (per-row arrays sharded, GSPMD psums),
the tree learner's data-/feature-parallel modes
(`boosting/tree_learner.py`), and `__graft_entry__.dryrun_multichip`.

First data-parallel example: the grouped-random-effects LMM. The data-sized
reductions of the Woodbury engine (y'y, Z'y — see models/grouped_re.py) are
plain per-shard contractions followed by one psum; the q-sized solve is
replicated. One optimizer step = psum(local stats) -> q x q Cholesky ->
gradient -> log-scale GD update, all inside a single pjit-compiled program.
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


def make_mesh(n_devices=None, axis_name="dp"):
    devices = jax.devices()[: (n_devices or len(jax.devices()))]
    return Mesh(np.asarray(devices), (axis_name,))


def make_sharded_grouped_lmm_step(mesh, q, lr=0.1, axis_name="dp"):
    """Build a jitted data-parallel GD training step for a single-level
    grouped-RE LMM: y = Zb + e, b ~ N(0, v I_q), e ~ N(0, s2 I_n).

    Inputs of the returned step: u = [log s2, log v_tilde] (replicated),
    y (n,) and one-hot Z (n, q), both sharded over `axis_name` on axis 0.
    Returns (u_new, nll). All collectives are psum over the mesh axis.
    """

    def local_step(u, y_sh, Z_sh):
        n_local = y_sh.shape[0]
        n = jax.lax.psum(jnp.asarray(n_local, y_sh.dtype), axis_name)
        # data-sized reductions: one MXU contraction per shard + psum over ICI
        Zty = jax.lax.psum(Z_sh.T @ y_sh, axis_name)
        yty = jax.lax.psum(y_sh @ y_sh, axis_name)
        counts = jax.lax.psum(jnp.sum(Z_sh, axis=0), axis_name)

        def nll_fn(u):
            s2 = jnp.exp(u[0])
            vt = jnp.exp(u[1])
            # A = (1/vt) I + Z'Z; single-level groups: Z'Z = diag(counts)
            A_diag = 1.0 / vt + counts
            quad = yty - jnp.sum(Zty * Zty / A_diag)
            logdet = jnp.sum(jnp.log(A_diag)) + q * u[1]
            return 0.5 * (quad / s2 + logdet + n * u[0]
                          + n * math.log(2.0 * math.pi))

        nll, g = jax.value_and_grad(nll_fn)(u)
        return u - lr * g, nll

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name, None)),
        out_specs=(P(), P()))
    return lifted_jit(step)
