"""Dense (MXU) Vecchia-Laplace at n=20k, f32, on TPU."""
import sys, time, faulthandler
import numpy as np
faulthandler.dump_traceback_later(240, repeat=True, file=sys.stderr)
import jax
import gpboost_tpu as gpb
from scipy.stats import norm
print("device:", jax.devices()[0], file=sys.stderr, flush=True)
n = 20000
rng = np.random.RandomState(3)
coords = rng.rand(n, 2)
f = np.sin(6*coords[:,0])*np.cos(4*coords[:,1])
yv = (rng.rand(n) < norm.cdf(f)).astype(float)
t0=time.time()
m1 = gpb.GPModel(gp_coords=coords, cov_function="exponential", gp_approx="vecchia",
                 num_neighbors=20, likelihood="bernoulli_probit",
                 matrix_inversion_method="cholesky", dtype="float32")
print(f"construct: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
t0=time.time()
m1.fit(y=yv, params={"maxit": 1, "init_cov_pars": [1.0, 0.1]})
print(f"first fit (compile+run maxit=1): {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
t0=time.time()
m1.fit(y=yv, params={"maxit": 20, "init_cov_pars": [1.0, 0.1]})
print(f"warm fit maxit=20: {time.time()-t0:.2f}s nit={m1.get_num_optim_iter()} pars={m1.get_cov_pars()}", file=sys.stderr, flush=True)
