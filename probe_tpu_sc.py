import sys, time
import numpy as np, jax, jax.numpy as jnp
which, K, dts = sys.argv[1], int(sys.argv[2]), sys.argv[3]
dt = jnp.float64 if dts == "f64" else jnp.float32
n, m = 20000, 20
rng = np.random.RandomState(1)
idx = jnp.asarray(np.minimum(np.arange(n)[:,None], rng.randint(0, n, (n, m))))
flat = idx.reshape(-1)
A = jnp.asarray(rng.rand(n, m) * 0.1, dt)
v = jnp.asarray(rng.randn(n), dt)
t0 = time.time()
if which == "rtt":
    f = jax.jit(lambda a, x: x + 1.0)
elif which == "scatter":
    def f(a, w):
        for _ in range(K):
            w = w + jnp.zeros_like(w).at[flat].add((a * w[:, None]).reshape(-1)) * 0.01
        return w
    f = jax.jit(f)
elif which == "gather":
    def f(a, x):
        for _ in range(K):
            x = x + jnp.sum(a * x[idx], axis=1) * 0.01
        return x
    f = jax.jit(f)
elif which == "segsorted":
    seg = jnp.asarray(np.sort(np.asarray(flat)))
    order = jnp.asarray(np.argsort(np.asarray(flat)))
    def f(a, w):
        for _ in range(K):
            vals = (a * w[:, None]).reshape(-1)[order]
            w = w + jax.ops.segment_sum(vals, seg, num_segments=n, indices_are_sorted=True) * 0.01
        return w
    f = jax.jit(f)
out = jax.block_until_ready(f(A, v))
el = time.time() - t0
ts = []
for _ in range(5):
    t0 = time.time(); jax.block_until_ready(f(A, v)); ts.append(time.time()-t0)
print(f"{which} K={K} {dts}: compile+run {el:.1f}s warm_med {sorted(ts)[2]*1e3:.2f}ms", flush=True)
