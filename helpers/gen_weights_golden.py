"""Generate golden values from the COMPILED REFERENCE for weighted models
with gp_approx in (vecchia, fitc). Run once; constants go into
tests/test_weights.py."""
import sys
import types

sys.path.insert(0, "/tmp/refpkg")
for name in ("optuna", "optuna.samplers"):
    sys.modules.setdefault(name, types.ModuleType(name))
sys.modules["optuna"].samplers = sys.modules["optuna.samplers"]
import gpboost as ref  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
from gpboost_tpu.utils.datasim import sim_rand_unif, qnorm  # noqa: E402

n = 200
coords = sim_rand_unif(n * 2, init_c=0.1).reshape(2, n).T
D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
Sigma = 1.0 * np.exp(-D / 0.1) + 1e-20 * np.eye(n)
C = np.linalg.cholesky(Sigma)
b1 = qnorm(sim_rand_unif(n, init_c=0.8))
eps = C @ b1
xi = qnorm(sim_rand_unif(n, init_c=0.3)) / 4.0
weights = 0.5 + sim_rand_unif(n, init_c=0.55) * 2.0
y = eps + xi / np.sqrt(weights)
pars = [0.08, 1.1, 0.12]

out = {}

# Vecchia Gaussian weighted: NLL at fixed pars
m = ref.GPModel(gp_coords=coords, cov_function="exponential",
                gp_approx="vecchia", num_neighbors=30,
                vecchia_ordering="none", likelihood="gaussian",
                weights=weights)
out["vecchia_nll"] = float(m.neg_log_likelihood(cov_pars=np.array(pars),
                                                y=y))
# prediction (cond-obs)
coords_pred = sim_rand_unif(10, init_c=0.33).reshape(2, 5).T
m.set_prediction_data(vecchia_pred_type="order_obs_first_cond_obs_only",
                      num_neighbors_pred=30)
pr = m.predict(y=y, gp_coords_pred=coords_pred, cov_pars=np.array(pars),
               predict_var=True, predict_response=True)
out["vecchia_pred_mu"] = pr["mu"].tolist()
out["vecchia_pred_var"] = pr["var"].tolist()

# FITC weighted
m2 = ref.GPModel(gp_coords=coords, cov_function="exponential",
                 gp_approx="fitc", num_ind_points=60,
                 likelihood="gaussian", weights=weights, seed=1)
out["fitc_nll"] = float(m2.neg_log_likelihood(cov_pars=np.array(pars), y=y))

# Vecchia-Laplace weighted (poisson)
mu_lat = 0.7 * eps
yp = np.floor(sim_rand_unif(n, init_c=0.12) * 4 * np.exp(
    np.clip(mu_lat, -3, 3)))
m3 = ref.GPModel(gp_coords=coords, cov_function="exponential",
                 gp_approx="vecchia", num_neighbors=30,
                 vecchia_ordering="none", likelihood="poisson",
                 weights=weights)
out["vl_poisson_nll"] = float(m3.neg_log_likelihood(
    cov_pars=np.array([1.0, 0.1]), y=yp))

print(repr(out))
