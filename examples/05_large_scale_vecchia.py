"""Large-scale spatial GP with a Vecchia approximation.

The Vecchia likelihood factorizes p(y) into n univariate conditionals, each
conditioning on m nearest previously-ordered neighbors; on TPU all n
(m x m) Cholesky factorizations run as ONE batched MXU kernel. float32 is
~70x faster than (emulated) float64 on TPU and accurate enough for fitting.

Run `python examples/05_large_scale_vecchia.py --small` on CPU.
"""
import sys
import time
import numpy as np
import gpboost_tpu as gpb

small = "--small" in sys.argv
n = 5_000 if small else 100_000
rng = np.random.RandomState(2)

coords = rng.rand(n, 2)
# fast approximate draw from the spatial field: kernel-weighted random knots
knots = rng.rand(256, 2)
w = np.exp(-np.linalg.norm(coords[:, None] - knots[None], axis=-1) / 0.1)
b = (w / np.sqrt((w ** 2).sum(1, keepdims=True))) @ rng.randn(256)
y = b + 0.5 * rng.randn(n)

t0 = time.time()
model = gpb.fitGPModel(
    gp_coords=coords, cov_function="exponential",
    gp_approx="vecchia", num_neighbors=20, dtype="float32",
    y=y, params={"optimizer_cov": "lbfgs"})
print(f"n={n}: fit in {time.time() - t0:.1f}s, "
      f"cov pars {np.round(model.get_cov_pars(), 3)}")

# prediction at new locations (conditioning on observed points only)
t0 = time.time()
pred = model.predict(gp_coords_pred=rng.rand(1000, 2), y=y, predict_var=True)
print(f"1000 predictions in {time.time() - t0:.1f}s, "
      f"mean sd {np.sqrt(pred['var']).mean():.3f}")

# likelihood evaluation at fixed parameters (e.g. for custom optimizers)
nll = model.neg_log_likelihood(cov_pars=np.array([0.25, 1.0, 0.1]), y=y)
print("nll at (0.25, 1.0, 0.1):", round(float(nll), 2))
