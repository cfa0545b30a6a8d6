"""Probe: cold construct/compile/warm timings of the iterative Vecchia-Laplace
binary fit (bench w_vl workload, n=20k) and the grouped GLMM (w_glmm)."""
import sys, time, faulthandler
import numpy as np
faulthandler.dump_traceback_later(240, repeat=True, file=sys.stderr)

t0 = time.time()
import jax
import gpboost_tpu as gpb
print(f"import: {time.time()-t0:.1f}s device={jax.devices()[0]}", file=sys.stderr, flush=True)

from scipy.stats import norm
n = 20000
rng = np.random.RandomState(3)
coords = rng.rand(n, 2)
f = np.sin(6 * coords[:, 0]) * np.cos(4 * coords[:, 1])
yv = (rng.rand(n) < norm.cdf(f)).astype(float)

t0 = time.time()
mvl = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                  gp_approx="vecchia", num_neighbors=20,
                  likelihood="bernoulli_probit",
                  matrix_inversion_method="iterative")
print(f"vl construct: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
t0 = time.time()
mvl.fit(y=yv, params={"maxit": 1, "init_cov_pars": [1.0, 0.1]})
print(f"vl first fit (compile, maxit=1): {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
t0 = time.time()
mvl.fit(y=yv, params={"maxit": 20, "init_cov_pars": [1.0, 0.1]})
print(f"vl warm fit maxit=20: {time.time()-t0:.3f}s num_it={mvl._fit_result.num_it}", file=sys.stderr, flush=True)

# grouped GLMM
nq, q = 100000, 1000
rng = np.random.RandomState(5)
g = rng.randint(0, q, nq)
b = 0.8 * rng.normal(size=q)
yg = (rng.rand(nq) < 1.0/(1.0+np.exp(-b[g]))).astype(float)
t0 = time.time()
mg = gpb.GPModel(group_data=g, likelihood="bernoulli_logit")
print(f"glmm construct: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
t0 = time.time()
mg.fit(y=yg, params={"maxit": 50})
print(f"glmm first fit (compile+run maxit=50): {time.time()-t0:.1f}s num_it={mg._fit_result.num_it}", file=sys.stderr, flush=True)
mg._fit_result = None; mg.model_has_been_fitted = False
t0 = time.time()
mg.fit(y=yg, params={"maxit": 50})
print(f"glmm warm fit: {time.time()-t0:.3f}s num_it={mg._fit_result.num_it}", file=sys.stderr, flush=True)
