import sys, time
import numpy as np, jax, jax.numpy as jnp
n, m = 20000, 20
rng = np.random.RandomState(1)
idx = jnp.asarray(np.minimum(np.arange(n)[:,None], rng.randint(0, n, (n, m))))
flat = idx.reshape(-1)

def runs(dt, tag_sfx):
    A = jnp.asarray(rng.rand(n, m) * 0.1, dt)
    v = jnp.asarray(rng.randn(n), dt)
    def run(tag, f):
        t0 = time.time()
        g = jax.jit(f)
        out = jax.block_until_ready(g(A, v)); el = time.time()-t0
        ts=[]
        for _ in range(7):
            t0=time.time(); jax.block_until_ready(g(A, v)); ts.append(time.time()-t0)
        print(f"{tag} {tag_sfx}: compile {el:.1f}s warm {sorted(ts)[3]*1e3:.3f}ms", flush=True)
    run("noop", lambda a, x: x + 1.0)
    run("gather x1", lambda a, x: x + jnp.sum(a * x[idx], axis=1))
    run("gather fori32", lambda a, x: jax.lax.fori_loop(0, 32, lambda i, t: x + jnp.sum(a * t[idx], axis=1)*0.01, x))
    run("scatter x1", lambda a, w: jnp.zeros_like(w).at[flat].add((a * w[:, None]).reshape(-1)))
    run("scatter fori8", lambda a, w: jax.lax.fori_loop(0, 8, lambda i, t: w + jnp.zeros_like(t).at[flat].add((a * t[:, None]).reshape(-1))*0.01, w))

runs(jnp.float32, "f32")
runs(jnp.float64, "f64")
