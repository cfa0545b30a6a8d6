import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
import jax; 
import gpboost_tpu as gpb
rng = np.random.RandomState(0)
n, m = 1000, 40
g1 = np.repeat(np.arange(m), n//m).astype(float)
b1 = 0.7*rng.randn(m)
X = rng.rand(n, 5)
lat = np.sin(3*X[:, 0]) + b1[g1.astype(int)]
y = rng.poisson(np.exp(lat)).astype(float)

gp = gpb.GPModel(group_data=g1, likelihood="poisson")
gp.set_optim_params(params={"optimizer_cov": "gradient_descent", "lr_cov": 0.01,
                            "use_nesterov_acc": True, "init_cov_pars": [1.0]})
ds = gpb.Dataset(X, label=y)
t0 = time.time()
bst = gpb.train({"learning_rate": 0.1, "num_leaves": 15, "min_data_in_leaf": 5,
                 "verbose": 0}, ds, num_boost_round=30, gp_model=gp)
dt = time.time() - t0
print("30 rounds:", round(dt, 2), "s ->", round(dt/30*1000), "ms/round", flush=True)
print("cov:", np.asarray(gp.get_cov_pars()).ravel(), flush=True)
p = bst.predict(X[:5], group_data_pred=g1[:5], pred_latent=False)
print("pred:", np.round(p["response_mean"], 3), "y:", y[:5], flush=True)
print("fast path used:", hasattr(gp._engine, "_jit_gd_lap"), flush=True)
# steady-state: 10 more rounds timed separately via continued training
import time
ds2 = gpb.Dataset(X, label=y)
gp2 = gpb.GPModel(group_data=g1, likelihood="poisson")
gp2.set_optim_params(params={"optimizer_cov": "gradient_descent", "lr_cov": 0.01,
                             "use_nesterov_acc": True, "init_cov_pars": [1.0]})
b2 = gpb.train({"learning_rate": 0.1, "num_leaves": 15, "min_data_in_leaf": 5,
                "verbose": 0}, ds2, num_boost_round=3, gp_model=gp2)
t0 = time.time()
for _ in range(10):
    b2.update()
print("steady-state:", round((time.time()-t0)/10*1000), "ms/round", flush=True)
print("DRIVE17 OK", flush=True)
