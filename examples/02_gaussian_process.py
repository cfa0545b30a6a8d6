"""Gaussian process regression: covariance functions, prediction, sampling.

Model:  y(s) = F + b(s) + e,  b ~ GP(0, k_theta),  e ~ N(0, sigma^2)

Shows: fitting with different covariance functions, interpolation with
uncertainty, drawing posterior samples, and evaluating the likelihood.
"""
import numpy as np
import gpboost_tpu as gpb

rng = np.random.RandomState(0)

# ----------------------------------------------------------------- simulate
n = 400
coords = rng.rand(n, 2)
d = np.linalg.norm(coords[:, None] - coords[None], axis=-1)
K = 1.0 * np.exp(-d / 0.15)                          # exponential kernel
b = np.linalg.cholesky(K + 1e-10 * np.eye(n)) @ rng.randn(n)
y = b + 0.3 * rng.randn(n)

# ------------------------------------------------- fit several kernels
for cov in ["exponential", "matern", "gaussian"]:
    kw = {"cov_fct_shape": 1.5} if cov == "matern" else {}
    m = gpb.fitGPModel(gp_coords=coords, cov_function=cov, y=y,
                       params={"optimizer_cov": "lbfgs"}, **kw)
    print(f"{cov:12s} cov pars {np.round(m.get_cov_pars(), 4)}  "
          f"nll {m.get_current_neg_log_likelihood():.3f}")

# ----------------------------------------------- predict on a grid
model = gpb.fitGPModel(gp_coords=coords, cov_function="exponential", y=y)
gx = np.linspace(0, 1, 20)
grid = np.stack(np.meshgrid(gx, gx), -1).reshape(-1, 2)
pred = model.predict(gp_coords_pred=grid, y=y, predict_var=True)
print("\ngrid prediction: mu range [%.2f, %.2f], mean sd %.3f"
      % (pred["mu"].min(), pred["mu"].max(), np.sqrt(pred["var"]).mean()))

# --------------------------------------- posterior and prior samples
samp = model.predict(gp_coords_pred=grid[:50], y=y, sample_posterior=True,
                     num_post_samples=200, seed=1)
print("posterior samples shape:", samp["posterior_samples"].shape,
      " (50 locations x 200 draws)")

# ------------------------------------- likelihood at chosen parameters
nll = model.neg_log_likelihood(cov_pars=np.array([0.09, 1.0, 0.15]), y=y)
print("nll at (0.09, 1.0, 0.15):", round(float(nll), 3))
