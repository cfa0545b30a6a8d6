"""GP approximations and covariance breadth tour.

Demonstrates the full gp_approx axis (re_model.h:50) and round-2 kernels:
tapering, full-scale tapering (FSA), full-scale Vecchia (VIF), vecchia_latent,
FITC for non-Gaussian data, general-shape matern via Bessel-K, space-time
Gneiting, and AR1 multifidelity models.

Run: python examples/09_approximations_and_kernels.py
"""

import numpy as np

import gpboost_tpu as gpb

rng = np.random.RandomState(0)
n = 400
coords = rng.rand(n, 2)
D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
lat = np.linalg.cholesky(np.exp(-D / 0.15) + 1e-10 * np.eye(n)) \
    @ rng.randn(n)
y = lat + 0.3 * rng.randn(n)

print("=== The gp_approx axis (same data, same kernel) ===")
for approx, kw in [
    ("none", {}),
    ("vecchia", dict(num_neighbors=30)),
    ("vecchia_latent", dict(num_neighbors=30)),
    ("fitc", dict(num_ind_points=80)),
    ("tapering", dict(cov_fct_taper_shape=1, cov_fct_taper_range=0.5)),
    ("full_scale_tapering", dict(num_ind_points=60, cov_fct_taper_shape=2,
                                 cov_fct_taper_range=0.4)),
    ("full_scale_vecchia", dict(num_ind_points=60, num_neighbors=15)),
]:
    model = gpb.fitGPModel(gp_coords=coords, cov_function="exponential",
                           gp_approx=approx, y=y,
                           params={"optimizer_cov": "lbfgs", "maxit": 100},
                           **kw)
    est = np.asarray(model.get_cov_pars())
    print(f"  {approx:24s} nll={model.get_current_neg_log_likelihood():9.3f}"
          f"  pars={np.round(est, 3)}")

print("\n=== Non-Gaussian + inducing points (FITC-Laplace) ===")
ycnt = rng.poisson(np.exp(0.3 + lat)).astype(float)
model = gpb.fitGPModel(gp_coords=coords, cov_function="exponential",
                       likelihood="poisson", gp_approx="fitc",
                       num_ind_points=80, y=ycnt, params={"maxit": 50})
print("  poisson/fitc cov_pars:", np.round(model.get_cov_pars(), 3),
      " mode-finding Newton steps:", model.get_num_mode_finding_steps())

print("\n=== Kernel breadth ===")
# general-shape matern (Bessel-K, estimated smoothness)
model = gpb.fitGPModel(gp_coords=coords,
                       cov_function="matern_estimate_shape", y=y,
                       params={"optimizer_cov": "lbfgs", "maxit": 200})
print("  matern_estimate_shape pars [err, var, range, shape]:",
      np.round(model.get_cov_pars(), 3))

# space-time Gneiting
time = rng.randint(1, 20, n).astype(float)
model = gpb.GPModel(gp_coords=np.column_stack([time, coords]),
                    cov_function="space_time_gneiting")
nll = model.neg_log_likelihood(
    cov_pars=[0.1, 1, 0.2, 2, 0.5, 1.5, 0.5, 2], y=y)
print(f"  space_time_gneiting NLL at fixed pars: {nll:.3f}")

print("\n=== AR1 multifidelity (low/high fidelity data) ===")
x_low = np.sort(rng.rand(60))
x_high = np.sort(rng.rand(25))
gc = np.vstack([np.column_stack([x_low, np.zeros(60)]),
                np.column_stack([x_high, np.ones(25)])])
f_low = np.sin(6 * gc[:60, 0])
f_high = 0.8 * np.sin(6 * gc[60:, 0]) + 0.3 * np.cos(12 * gc[60:, 0])
y_mf = np.concatenate([f_low, f_high]) + 0.05 * rng.randn(85)
model = gpb.fitGPModel(gp_coords=gc, cov_function="ar1_mf_exponential",
                       y=y_mf, params={"optimizer_cov": "lbfgs",
                                       "maxit": 200})
print("  ar1_mf pars [err, v_low, r_low, v_disc, r_disc, rho]:",
      np.round(model.get_cov_pars(), 3))
pred = model.predict(gp_coords_pred=np.array([[0.5, 1.0], [0.5, 0.0]]),
                     predict_var=True)
print("  high/low-fidelity prediction at x=0.5:",
      np.round(pred["mu"], 3), "+-", np.round(np.sqrt(pred["var"]), 3))
