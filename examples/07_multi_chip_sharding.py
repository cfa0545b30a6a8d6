"""Multi-chip data-parallel training over a jax.sharding.Mesh.

The per-iteration work of a grouped-random-effects model — sufficient
statistics and the profiled-likelihood gradient — is embarrassingly
row-parallel: each chip computes its shard's contribution and a psum over
the mesh reduces them. The q x q core solve is replicated (q is small).
The Vecchia likelihood is a sum of independent per-row conditionals, so it
shards the same way.

This demo runs on 8 *virtual* CPU devices so you can try it anywhere:

    python examples/07_multi_chip_sharding.py

On a real TPU pod slice, drop the XLA_FLAGS override and the same code
shards over the physical mesh (collectives ride ICI).
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np                                    # noqa: E402
import jax                                            # noqa: E402
import jax.numpy as jnp                               # noqa: E402

from gpboost_tpu.parallel import (                    # noqa: E402
    make_mesh, make_sharded_grouped_lmm_step, shard_vecchia_inputs,
    make_sharded_vecchia_gd_step)

print("devices:", jax.device_count())
ndev = jax.device_count()

# ------------------------------------------ grouped random effects, n rows
rng = np.random.RandomState(0)
n, q = 4096, 64
codes = rng.randint(0, q, n)
Z = np.zeros((n, q))
Z[np.arange(n), codes] = 1.0
y = Z @ rng.randn(q) + 0.5 * rng.randn(n)

# the NLL (and its gradient) is O(n), so scale the GD step by 1/n
step = make_sharded_grouped_lmm_step(make_mesh(ndev), q=q, lr=2.0 / n)
u = jnp.asarray(np.log([0.5, 1.0]))        # [log s2, log v_tilde]
for it in range(300):
    u, nll = step(u, jnp.asarray(y), jnp.asarray(Z))
s2, vt = np.exp(np.asarray(u))
print("grouped LMM  error var %.3f  group var %.3f  nll %.2f"
      % (s2, vt * s2, float(nll)))

# ------------------------------------------------ Vecchia GP, row-sharded
from gpboost_tpu.models.components import GPComponent          # noqa: E402
from gpboost_tpu.models.vecchia import VecchiaGaussianEngine   # noqa: E402
from gpboost_tpu.ops.cov_fcts import CovarianceFunction        # noqa: E402

nv, m = 2048, 10
coords = rng.rand(nv, 2)
dm = np.linalg.norm(coords[:, None] - coords[None], axis=-1)
Kv = np.exp(-dm / 0.2) + 1e-8 * np.eye(nv)
yv = np.linalg.cholesky(Kv) @ rng.randn(nv) + 0.5 * rng.randn(nv)
eng = VecchiaGaussianEngine(
    [GPComponent(coords, CovarianceFunction("exponential"))], nv,
    num_neighbors=m, vecchia_ordering="none")
d_nn, d_ni, mask, y_ord, y_nbr, rv, n_eff = shard_vecchia_inputs(eng, yv, ndev)
vstep = make_sharded_vecchia_gd_step(
    make_mesh(ndev), eng.comp.cov_fn.corr_from_dist, n_eff, m, lr=2.0 / nv)
uv = jnp.asarray(np.log([1.0, 5.0]))       # log([v_tilde, alpha])
for it in range(300):
    uv, nllv = vstep(uv, jnp.asarray(d_nn), jnp.asarray(d_ni),
                     jnp.asarray(mask), jnp.asarray(y_ord),
                     jnp.asarray(y_nbr), jnp.asarray(rv))
print("sharded Vecchia  nll per point %.3f  v_tilde %.3f"
      % (float(nllv) / nv, float(jnp.exp(uv[0]))))
