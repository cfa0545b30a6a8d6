"""FSVA n=100k fwd-only NLL on TPU (no autodiff graph)."""
import sys, time, faulthandler
import numpy as np
faulthandler.dump_traceback_later(300, repeat=True, file=sys.stderr)
import jax
import gpboost_tpu as gpb
print("device:", jax.devices()[0], file=sys.stderr, flush=True)
n = 50_000
rng = np.random.RandomState(0)
coords = rng.rand(n, 2)
y = np.sin(6*coords[:,0])*np.cos(4*coords[:,1]) + 0.5*rng.randn(n)
t0 = time.time()
m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                gp_approx="full_scale_vecchia", num_ind_points=200,
                num_neighbors=30, matrix_inversion_method="iterative")
print(f"construct: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
t0 = time.time()
nll = m.neg_log_likelihood(cov_pars=[0.3, 1.0, 0.1], y=y)
print(f"first nll (compile+run): {time.time()-t0:.1f}s nll={nll:.2f}", file=sys.stderr, flush=True)
t0 = time.time()
nll = m.neg_log_likelihood(cov_pars=[0.31, 1.0, 0.1], y=y)
print(f"warm nll: {time.time()-t0:.2f}s {nll:.2f}", file=sys.stderr, flush=True)
t0 = time.time()
m.fit(y=y, params={"optimizer_cov": "nelder_mead", "maxit": 40,
                   "init_cov_pars": [0.3, 1.0, 0.1]})
print(f"nelder-mead fit maxit=40: {time.time()-t0:.1f}s nit={m.get_num_optim_iter()} pars={m.get_cov_pars()}", file=sys.stderr, flush=True)
