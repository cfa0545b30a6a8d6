"""Benchmark driver: prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Round-1 headline: exact-GP Gaussian hyperparameter fit (L-BFGS on the profiled
marginal likelihood) on n=2000 2-D spatial points, wall-clock seconds excluding
compile (first fit warms the jit cache; second fit is timed). vs_baseline is
the speedup over a single-threaded numpy/scipy implementation of the same
L-BFGS objective run on the host — a stand-in until reference CPU timings are
available (BASELINE.md: the reference publishes none).
"""

import json
import time

import numpy as np


def _sim_data(n=2000, seed=0):
    rng = np.random.RandomState(seed)
    coords = rng.rand(n, 2)
    D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    L = np.linalg.cholesky(np.exp(-D / 0.15) + 1e-10 * np.eye(n))
    y = L @ rng.randn(n) + 0.5 * rng.randn(n)
    return coords, D, y


def _numpy_baseline(D, y, maxiter=50):
    """Single-threaded host implementation of the same profiled objective."""
    from scipy import optimize as sopt
    from scipy import linalg as sla
    n = len(y)

    def obj(x):
        vt, alpha = np.exp(x)
        M = np.eye(n) + vt * np.exp(-alpha * D)
        cf = sla.cho_factor(M, lower=True)
        quad = y @ sla.cho_solve(cf, y)
        logdet = 2.0 * np.sum(np.log(np.diagonal(cf[0])))
        return 0.5 * (logdet + n * np.log(quad / n) + n
                      + n * np.log(2 * np.pi))

    t0 = time.time()
    sopt.minimize(obj, np.log([1.0, 5.0]), method="L-BFGS-B",
                  options={"maxiter": maxiter})
    return time.time() - t0


def main():
    from gpboost_tpu import GPModel

    coords, D, y = _sim_data()
    params = {"optimizer_cov": "lbfgs", "maxit": 50}

    # warm-up fit compiles all kernels
    m = GPModel(gp_coords=coords, cov_function="exponential")
    m.fit(y=y, params=params)
    # timed fit (fresh model, same shapes -> jit cache hit)
    m2 = GPModel(gp_coords=coords, cov_function="exponential")
    t0 = time.time()
    m2.fit(y=y, params=params)
    fit_time = time.time() - t0

    base_time = _numpy_baseline(D, y)
    print(json.dumps({
        "metric": "exact_gp_fit_n2000_wallclock",
        "value": round(fit_time, 3),
        "unit": "seconds",
        "vs_baseline": round(base_time / fit_time, 3),
    }))


if __name__ == "__main__":
    main()
