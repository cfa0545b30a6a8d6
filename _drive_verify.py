import time
import numpy as np
import gpboost_tpu as gpb

t0 = time.time()


def log(*a):
    print(f"[{time.time() - t0:6.1f}s]", *a, flush=True)


rng = np.random.RandomState(7)
n = 200
coords = rng.uniform(size=(n, 2))
D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
y = np.linalg.cholesky(np.exp(-D / 0.15) + 1e-10 * np.eye(n)) \
    @ rng.normal(size=n) + 0.3 * rng.normal(size=n)
m = gpb.GPModel(gp_coords=coords, cov_function="exponential")
m.fit(y=y, params={"optimizer_cov": "lbfgs"})
log("gp nll:", m._fit_result.neg_log_likelihood)
p = m.predict(gp_coords_pred=rng.uniform(size=(5, 2)), predict_var=True)
log("gp pred ok:", np.asarray(p["mu"]).shape)

# grouped GLMM through the on-device safeguarded L-BFGS
g = rng.randint(0, 50, 2000)
b = 0.8 * rng.normal(size=50)
yb2 = (rng.uniform(size=2000) < 1 / (1 + np.exp(-(0.3 + b[g])))).astype(float)
mg = gpb.GPModel(group_data=g, likelihood="bernoulli_logit")
mg.fit(y=yb2, params={"use_device_optimizer": True})
log("glmm device-opt nll:", mg._fit_result.neg_log_likelihood,
    "nit:", mg._fit_result.num_it)

X = rng.randn(400, 5)
yb = X[:, 0] + 0.1 * rng.randn(400)
ds = gpb.Dataset(X, label=yb)
bst = gpb.train({"objective": "regression", "num_leaves": 7, "verbose": 0},
                ds, num_boost_round=4)
log("boost iters:", bst.current_iteration_,
    "resid var:", float(np.var(yb - bst.predict(X))))

# new objectives: huber (fused scan) + binary_lgb (scale_pos_weight)
bh = gpb.train({"objective": "huber", "num_leaves": 7, "verbose": 0},
               gpb.Dataset(X, label=yb), num_boost_round=6)
log("huber resid var:", float(np.var(yb - bh.predict(X))))
ybin = (X[:, 0] > 0).astype(float)
bb = gpb.train({"objective": "binary", "scale_pos_weight": 2.0,
                "num_leaves": 7, "verbose": 0},
               gpb.Dataset(X, label=ybin), num_boost_round=20)
log("binary_lgb mean prob:", float(bb.predict(X).mean()))

# pred_early_stop engages and keeps decisions
bb2 = gpb.train({"objective": "binary", "num_leaves": 7, "verbose": 0},
                gpb.Dataset(X, label=ybin), num_boost_round=20)
base = bb2.predict(X)
es = bb2.predict(X, pred_early_stop=True, pred_early_stop_freq=2,
                 pred_early_stop_margin=1.0)
log("pred_early_stop engaged:", not np.allclose(base, es),
    "decisions kept:", bool(np.all((es > 0.5) == (base > 0.5))))

with gpb.annotate("drive_span"):
    pass
log("annotate ok")
log("DRIVE OK")
