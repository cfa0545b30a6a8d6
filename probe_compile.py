import faulthandler, sys as _s
"""Probe: measure construction time, compile time, and executable size of the
on-device L-BFGS Vecchia fit at a given n. Usage: python probe_compile.py [n]
Writes findings to stderr; exits 0."""
import sys
import time

import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000

t0 = time.time()
import jax
import gpboost_tpu as gpb
print(f"import: {time.time()-t0:.1f}s device={jax.devices()[0]}",
      file=sys.stderr, flush=True)

rng = np.random.RandomState(0)
coords = rng.rand(n, 2)
y = np.sin(6 * coords[:, 0]) * np.cos(4 * coords[:, 1]) + 0.5 * rng.randn(n)

faulthandler.dump_traceback_later(90, repeat=True, file=_s.stderr)
t0 = time.time()
model = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=20,
                    vecchia_ordering="random", dtype="float32")
print(f"construct: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

# time the jit compile of the device L-BFGS path directly
from gpboost_tpu.models import optimize as opt

t0 = time.time()
model.fit(y=y, params={"optimizer_cov": "lbfgs", "maxit": 1,
                       "init_cov_pars": [0.5, 1.0, 0.1]})
print(f"first fit (compile+run, maxit=1): {time.time()-t0:.1f}s",
      file=sys.stderr, flush=True)

t0 = time.time()
model.fit(y=y, params={"optimizer_cov": "lbfgs", "maxit": 30,
                       "init_cov_pars": [0.5, 1.0, 0.1]})
print(f"warm fit maxit=30: {time.time()-t0:.3f}s", file=sys.stderr, flush=True)
