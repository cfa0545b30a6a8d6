import numpy as np, gpboost_tpu as gpb
from gpboost_tpu.utils.datasim import sim_rand_unif, qnorm, r_matrix
n=100
coords = r_matrix(sim_rand_unif(n*2, init_c=0.1), ncol=2)
D = np.sqrt(((coords[:,None,:]-coords[None,:,:])**2).sum(-1))
y = np.linalg.cholesky(np.exp(-D/0.1)+1e-20*np.eye(n)) @ qnorm(sim_rand_unif(n, init_c=0.8)) + qnorm(sim_rand_unif(n, init_c=0.1))/5
m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                gp_approx="full_scale_vecchia", num_ind_points=60, num_neighbors=50)
nll = m.neg_log_likelihood(cov_pars=[0.1,1.6,0.2], y=y)
m0 = gpb.GPModel(gp_coords=coords, cov_function="exponential")
nll0 = m0.neg_log_likelihood(cov_pars=[0.1,1.6,0.2], y=y)
print("TPU VIF nll:", nll, "exact:", nll0, flush=True)
assert abs(nll - nll0) < 0.05
print("DRIVE8 OK", flush=True)
