import numpy as np, gpboost_tpu as gpb
from gpboost_tpu.utils.datasim import sim_rand_unif, qnorm
x_low = np.linspace(0.02, 0.98, 18); x_high = np.linspace(0.04, 0.96, 14) + 0.001
gc = np.vstack([np.column_stack([x_low, np.zeros(18)]), np.column_stack([x_high, np.ones(14)])])
cp = np.array([0.08, 1.1, 0.25, 0.5, 0.12, -0.6])
def K_of(gpc, cp1):
    f = gpc[:,-1]; c = gpc[:,:-1]
    D = np.abs(c[:,None,0]-c[None,:,0])
    Kl = cp1[0]*np.exp(-D/cp1[1]); Kd = cp1[2]*np.exp(-D/cp1[3])
    L = np.where(f==0, 1.0, cp1[4])
    return Kl*np.outer(L,L) + Kd*np.outer(f,f)
K = K_of(gc, cp[1:])
lat = np.linalg.cholesky(K + 1e-10*np.eye(32)) @ qnorm(sim_rand_unif(32, 0.8))
y = lat + np.sqrt(0.08)*qnorm(sim_rand_unif(32, 0.1))
m = gpb.GPModel(gp_coords=gc, cov_function="ar1_mf_exponential")
nll = m.neg_log_likelihood(y=y, cov_pars=cp)
print("TPU ar1_mf nll:", nll, "(ref 32.151882541105891)", flush=True)
assert abs(nll - 32.151882541105891) < 1e-4
print("DRIVE7 OK", flush=True)
