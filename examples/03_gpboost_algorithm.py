"""The GPBoost algorithm: trees for the fixed effects, a random-effects /
GP model for the structured part, trained jointly.

  y = F(X) + Z b + e      F = tree ensemble, b = random effects

Each boosting round: (1) re-estimate the covariance parameters on the
current residuals (warm-started, on device), (2) fit a tree to the
"generalized residuals" Psi^-1 (y - F), (3) update F.

Shows: training, combined prediction, validation + early stopping, CV,
Newton leaf updates, and parameter tuning.
"""
import numpy as np
import gpboost_tpu as gpb

rng = np.random.RandomState(1)

# ----------------------------------------------------------------- simulate
n, p, m = 2000, 6, 50
X = rng.rand(n, p)
F_true = 2 * X[:, 0] + 2 * np.sin(8 * X[:, 1]) + (X[:, 2] > 0.6)
group = rng.randint(0, m, n)
b = 0.8 * rng.randn(m)
y = F_true + b[group] + 0.3 * rng.randn(n)

tr = np.arange(n) < 1600
gp_model = gpb.GPModel(group_data=group[tr])
data_train = gpb.Dataset(X[tr], label=y[tr])

# ------------------------------------------------------------------ train
bst = gpb.train(params={"learning_rate": 0.1, "num_leaves": 31,
                        "min_data_in_leaf": 20},
                train_set=data_train, gp_model=gp_model, num_boost_round=60)
print("estimated (error var, group var):", np.round(gp_model.get_cov_pars(), 3))

pred = bst.predict(X[~tr], group_data_pred=group[~tr])
yhat = pred["response_mean"]
print("test RMSE combined:", round(float(np.sqrt(np.mean((y[~tr] - yhat) ** 2))), 3))
print("test RMSE trees-only:", round(float(np.sqrt(np.mean(
    (y[~tr] - pred["fixed_effect"]) ** 2))), 3))

# ------------------------------------- validation set + early stopping
data_valid = gpb.Dataset(X[~tr], label=y[~tr])
data_valid.gp_valid_data = {"group_data_pred": group[~tr]}
evals = {}
gp2 = gpb.GPModel(group_data=group[tr])
bst2 = gpb.train(params={"learning_rate": 0.1, "num_leaves": 31},
                 train_set=gpb.Dataset(X[tr], label=y[tr]), gp_model=gp2,
                 num_boost_round=200, valid_sets=data_valid,
                 early_stopping_rounds=10, evals_result=evals)
print("early stopping at iteration", bst2.best_iteration,
      "best l2 %.4f" % bst2.best_score)

# ------------------------------------------------------- cross-validation
cvres = gpb.cv(params={"learning_rate": 0.1, "num_leaves": 31},
               train_set=gpb.Dataset(X, label=y),
               gp_model=gpb.GPModel(group_data=group),
               num_boost_round=40, nfold=4, seed=7)
k = [k for k in cvres if "mean" in k][0]
print("CV best iteration:", int(np.argmin(cvres[k]) + 1))

# --------------------------------------------- Newton leaf updates
gp3 = gpb.GPModel(group_data=group[tr])
bst3 = gpb.train(params={"learning_rate": 0.1, "num_leaves": 31,
                         "leaves_newton_update": True},
                 train_set=gpb.Dataset(X[tr], label=y[tr]), gp_model=gp3,
                 num_boost_round=60)
p3 = bst3.predict(X[~tr], group_data_pred=group[~tr])["response_mean"]
print("test RMSE with Newton leaf updates:",
      round(float(np.sqrt(np.mean((y[~tr] - p3) ** 2))), 3))
