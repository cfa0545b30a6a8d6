"""Decompose compile cost of the Vecchia device-L-BFGS fit.
Usage: python probe_decomp.py [n] [backend]"""
import sys
import time

import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
if len(sys.argv) > 2 and sys.argv[2] == "cpu":
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import gpboost_tpu as gpb
from gpboost_tpu.ops.jit_utils import lifted_jit
from gpboost_tpu.ops.lbfgs import lbfgs_run

print(f"device={jax.devices()[0]}", file=sys.stderr, flush=True)
rng = np.random.RandomState(0)
coords = rng.rand(n, 2)
y = np.sin(6 * coords[:, 0]) * np.cos(4 * coords[:, 1]) + 0.5 * rng.randn(n)

model = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=20,
                    vecchia_ordering="random", dtype="float32")
eng = model._engine
yd = eng.prep_y_gd(y)
th = jnp.asarray(np.log([1.0, 0.1]), jnp.float32)


def bench(tag, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    el = time.time() - t0
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{tag}: compile+run {el:.1f}s warm {time.time()-t0:.4f}s",
          file=sys.stderr, flush=True)


fwd = lifted_jit(lambda t, y_: eng.nll_profiled_raw(t, y_))
bench("fwd nll", fwd, th, yd)

vag = lifted_jit(lambda t, y_: jax.value_and_grad(
    lambda tt: eng.nll_profiled_raw(tt, y_)[0])(t))
bench("value+grad", vag, th, yd)


def vag_fn(t):
    return jax.value_and_grad(lambda tt: eng.nll_profiled_raw(tt, yd)[0])(t)


full = lifted_jit(lambda x0, it: lbfgs_run(vag_fn, x0, it))
bench("full lbfgs", full, th, 3)
