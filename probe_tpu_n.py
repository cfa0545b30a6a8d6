import sys, time
import numpy as np, jax, jax.numpy as jnp
for n in (20000, 100000):
    for dts, dt in (("f32", jnp.float32),):
        m = 20
        rng = np.random.RandomState(1)
        idx = jnp.asarray(np.minimum(np.arange(n)[:,None], rng.randint(0, n, (n, m))))
        A = jnp.asarray(rng.rand(n, m) * 0.1, dt)
        v = jnp.asarray(rng.randn(n), dt)
        g = jax.jit(lambda a, x: jax.lax.fori_loop(0, 32, lambda i, t: x + jnp.sum(a * t[idx], axis=1)*0.01, x))
        t0=time.time(); jax.block_until_ready(g(A, v)); el=time.time()-t0
        ts=[]
        for _ in range(5):
            t0=time.time(); jax.block_until_ready(g(A, v)); ts.append(time.time()-t0)
        print(f"gather fori32 n={n} {dts}: compile {el:.1f}s warm {sorted(ts)[2]*1e3:.1f}ms per-gather {(sorted(ts)[2])/32*1e3:.2f}ms", flush=True)
        # elementwise-only chain for comparison (same loop, no gather)
        g2 = jax.jit(lambda a, x: jax.lax.fori_loop(0, 32, lambda i, t: x + jnp.sum(a, axis=1)*0.01*t, x))
        jax.block_until_ready(g2(A, v))
        ts=[]
        for _ in range(5):
            t0=time.time(); jax.block_until_ready(g2(A, v)); ts.append(time.time()-t0)
        print(f"ew fori32 n={n} {dts}: warm {sorted(ts)[2]*1e3:.1f}ms", flush=True)
