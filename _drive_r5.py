import numpy as np, gpboost_tpu as gpb
rng = np.random.RandomState(7); n = 200
coords = rng.uniform(size=(n, 2))
D = np.sqrt(((coords[:,None,:]-coords[None,:,:])**2).sum(-1))
y = np.linalg.cholesky(np.exp(-D/0.15)+1e-10*np.eye(n)) @ rng.normal(size=n) \
    + 0.3*rng.normal(size=n)
m = gpb.GPModel(gp_coords=coords, cov_function="exponential")
m.fit(y=y, params={"optimizer_cov": "lbfgs"}); m.summary()
print(m.predict(gp_coords_pred=rng.uniform(size=(5,2)), predict_var=True), flush=True)
# also drive the Vecchia path (this round's hot change) on TPU
mv = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                 gp_approx="vecchia", num_neighbors=20)
mv.fit(y=y, params={"optimizer_cov": "lbfgs"}); mv.summary()
print(mv.predict(gp_coords_pred=rng.uniform(size=(5,2)), predict_var=True), flush=True)
