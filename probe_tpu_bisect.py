"""Bisect which VL sub-graph crashes the TPU worker."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
print("device:", jax.devices()[0], file=sys.stderr, flush=True)

def t(tag, fn, *args):
    t0 = time.time()
    try:
        out = jax.block_until_ready(fn(*args))
        print(f"{tag}: OK {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
        return out
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:200]}", file=sys.stderr, flush=True)
        raise SystemExit(1)

# 1. f64 eigh of a (50,50) batch
X = jnp.asarray(np.random.RandomState(0).randn(50, 50))
T = X @ X.T + 50*jnp.eye(50)
t("eigh f64 (50,50)", jax.jit(jnp.linalg.eigh), T)
Tb = jnp.broadcast_to(T, (50, 50, 50))
t("vmap eigh f64", jax.jit(jax.vmap(jnp.linalg.eigh)), Tb)

# 2. scatter-add + gather in fori loop, f64, n=20k
n, m = 20000, 20
rng = np.random.RandomState(1)
idx = jnp.asarray(np.minimum(np.arange(n)[:,None], rng.randint(0, n, (n, m))))
A = jnp.asarray(rng.rand(n, m) * 0.1)
v = jnp.asarray(rng.randn(n))
flat = idx.reshape(-1)
def SJ(a, x):
    return jax.lax.fori_loop(0, 32, lambda i, tt: x + jnp.sum(a * tt[idx], axis=1), x)
def SJt(a, w):
    return jax.lax.fori_loop(0, 32, lambda i, tt: w + jnp.zeros_like(tt).at[flat].add((a * tt[:, None]).reshape(-1)), w)
t("fori gather/scatter f64", jax.jit(lambda a, x: SJ(a, SJt(a, x))), A, v)

# 3. pcg with that precond
from gpboost_tpu.ops.iterative import pcg_it, lanczos_tridiag, _slq_logdet_value
D = jnp.asarray(rng.rand(n) + 0.5)
W = jnp.asarray(jnp.ones(n)*0.3)
def Av(a, x): return jnp.sum(a * x[idx], axis=1)
def Atv(a, w): return jnp.zeros_like(w).at[flat].add((a * w[:, None]).reshape(-1))
def Qv(x): return (x - Av(A,x))/D - Atv(A, (x - Av(A,x))/D)
d = 1.0/D + W
t("pcg vadu f64", jax.jit(lambda r: pcg_it(lambda x: Qv(x)+W*x, r,
   precond=lambda rr: SJ(A, SJt(A, rr)/d), tol=1e-6, maxit=1000)), v)

# 4. slq (vmapped lanczos + eigh)
probes = jnp.asarray(rng.randint(0,2,(50,n))*2.0-1.0)
t("slq f64", jax.jit(lambda: _slq_logdet_value(lambda x: Qv(x)+W*x, n, 50, probes)))
