"""Decompose compile cost of the iterative VL engine at n=20k (CPU)."""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax, jax.numpy as jnp
import gpboost_tpu as gpb
from scipy.stats import norm

n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
rng = np.random.RandomState(3)
coords = rng.rand(n, 2)
f = np.sin(6 * coords[:, 0]) * np.cos(4 * coords[:, 1])
yv = (rng.rand(n) < norm.cdf(f)).astype(float)

mvl = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                  gp_approx="vecchia", num_neighbors=20,
                  likelihood="bernoulli_probit",
                  matrix_inversion_method="iterative")
eng = mvl._engine
u = jnp.asarray(np.log([1.0, 0.1]))
F = jnp.zeros(n); y = jnp.asarray(yv[np.asarray(eng.perm)]); b0 = jnp.zeros(n)

def t(tag, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    el = time.time() - t0
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{tag}: compile+run {el:.1f}s warm {time.time()-t0:.3f}s", file=sys.stderr, flush=True)
    return out

raw = eng._nll_raw
# jaxpr sizes
import jax.core
t0=time.time()
jx = jax.make_jaxpr(raw)(u, F, y, b0)
print(f"trace nll_fn: {time.time()-t0:.1f}s jaxpr_eqns={len(jx.jaxpr.eqns)} str_len={len(str(jx))}", file=sys.stderr, flush=True)
t0=time.time()
jg = jax.make_jaxpr(jax.value_and_grad(raw, has_aux=True))(u, F, y, b0)
print(f"trace vag: {time.time()-t0:.1f}s jaxpr_eqns={len(jg.jaxpr.eqns)} str_len={len(str(jg))}", file=sys.stderr, flush=True)

t("nll_fn fwd", eng._nll_fn, u, F, y, b0)
t("vag", eng._vag, u, F, y, b0)
