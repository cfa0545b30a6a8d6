import sys, time
import numpy as np, jax, jax.numpy as jnp
which = sys.argv[1]
dt = jnp.float64 if sys.argv[2] == "f64" else jnp.float32
n, m = 20000, 20
rng = np.random.RandomState(1)
idx = jnp.asarray(np.minimum(np.arange(n)[:,None], rng.randint(0, n, (n, m))))
flat = idx.reshape(-1)
A = jnp.asarray(rng.rand(n, m) * 0.1, dt)
v = jnp.asarray(rng.randn(n), dt)
t0 = time.time()
if which == "scatter":
    f = jax.jit(lambda a, w: jnp.zeros_like(w).at[flat].add((a * w[:, None]).reshape(-1)))
elif which == "gatherfori":
    f = jax.jit(lambda a, x: jax.lax.fori_loop(0, 32, lambda i, t: x + jnp.sum(a * t[idx], axis=1), x))
elif which == "scatterfori":
    f = jax.jit(lambda a, w: jax.lax.fori_loop(0, 32, lambda i, t: w + jnp.zeros_like(t).at[flat].add((a * t[:, None]).reshape(-1)), w))
elif which == "scatterloop2":
    f = jax.jit(lambda a, w: jax.lax.fori_loop(0, 2, lambda i, t: w + jnp.zeros_like(t).at[flat].add((a * t[:, None]).reshape(-1)), w))
elif which == "segsum":
    seg = jnp.asarray(np.sort(rng.randint(0, 1000, n)))
    f = jax.jit(lambda a, w: jax.lax.fori_loop(0, 32, lambda i, t: w + jax.ops.segment_sum(t, seg, num_segments=1000)[seg], w))
out = jax.block_until_ready(f(A, v))
el = time.time() - t0
t0 = time.time(); jax.block_until_ready(f(A, v))
print(f"{which} {sys.argv[2]}: compile+run {el:.1f}s warm {time.time()-t0:.4f}s", flush=True)
