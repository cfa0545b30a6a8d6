"""FSVA iterative at n=100k on one chip (VERDICT task 6 done criterion)."""
import sys, time, faulthandler
import numpy as np
faulthandler.dump_traceback_later(300, repeat=True, file=sys.stderr)
import jax
import gpboost_tpu as gpb
print("device:", jax.devices()[0], file=sys.stderr, flush=True)
n = 100_000
rng = np.random.RandomState(0)
coords = rng.rand(n, 2)
y = np.sin(6*coords[:,0])*np.cos(4*coords[:,1]) + 0.5*rng.randn(n)
t0 = time.time()
m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                gp_approx="full_scale_vecchia", num_ind_points=200,
                num_neighbors=30, matrix_inversion_method="iterative")
print(f"construct: {time.time()-t0:.1f}s engine={type(m._engine).__name__}", file=sys.stderr, flush=True)
t0 = time.time()
m.fit(y=y, params={"maxit": 1, "init_cov_pars": [0.3, 1.0, 0.1]})
print(f"first fit (compile+run maxit=1): {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
t0 = time.time()
m.fit(y=y, params={"maxit": 15, "init_cov_pars": [0.3, 1.0, 0.1]})
print(f"warm fit maxit=15: {time.time()-t0:.2f}s nit={m.get_num_optim_iter()} pars={m.get_cov_pars()}", file=sys.stderr, flush=True)
