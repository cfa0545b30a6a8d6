import sys, time
import numpy as np, jax, jax.numpy as jnp
n, m = 20000, 20
rng = np.random.RandomState(1)
idx = jnp.asarray(np.minimum(np.arange(n)[:,None], rng.randint(0, n, (n, m))))
rows = jnp.broadcast_to(jnp.arange(n)[:, None], idx.shape)
A = jnp.asarray(rng.rand(n, m) * 0.01, jnp.float32)
D = jnp.asarray(rng.rand(n) + 0.5, jnp.float32)
def t(tag, f, *a):
    t0=time.time(); out = jax.block_until_ready(f(*a)); el=time.time()-t0
    t0=time.time(); jax.block_until_ready(f(*a))
    print(f"{tag}: compile+run {el:.1f}s warm {time.time()-t0:.3f}s", file=sys.stderr, flush=True)
    return out
dens = jax.jit(lambda A: jnp.eye(n, dtype=A.dtype) - jnp.zeros((n, n), A.dtype).at[rows, idx].add(A))
B = t("densify scatter", dens, A)
qf = jax.jit(lambda B, D: B.T @ (B / D[:, None]))
Q = t("Q=B'D^-1B matmul", qf, B, D)
cf = jax.jit(lambda Q: jnp.linalg.cholesky(Q + 0.3*jnp.eye(n, dtype=Q.dtype)))
L = t("cholesky 20k f32", cf, Q)
sf = jax.jit(lambda L, b: jax.scipy.linalg.cho_solve((L, True), b))
t("cho_solve", sf, L, jnp.ones(n, jnp.float32))
