"""scikit-learn style interface: GPBoostRegressor / GPBoostClassifier and
grid-search tuning with grouped cross-validation.
"""
import numpy as np
import gpboost_tpu as gpb

rng = np.random.RandomState(4)
n, m = 1500, 40
X = rng.rand(n, 5)
group = rng.randint(0, m, n)
F_true = 2 * X[:, 0] + np.sin(6 * X[:, 1])
y = F_true + 0.7 * rng.randn(m)[group] + 0.3 * rng.randn(n)

# ------------------------------------------------------------- regressor
gp_model = gpb.GPModel(group_data=group)
reg = gpb.GPBoostRegressor(n_estimators=50, learning_rate=0.1, num_leaves=31)
reg.fit(X, y, gp_model=gp_model)
pred = reg.predict(X, group_data_pred=group)["response_mean"]
print("regressor train R^2: %.3f"
      % (1 - np.var(y - pred) / np.var(y)))

# ------------------------------------------------------------ classifier
yb = (y > np.median(y)).astype(int)
clf = gpb.GPBoostClassifier(n_estimators=40, learning_rate=0.1, num_leaves=15)
clf.fit(X, yb)
proba = clf.predict_proba(X)
print("classifier accuracy: %.3f"
      % np.mean(clf.predict(X) == yb))

# ----------------------------------------------------- grid-search tuning
param_grid = {"learning_rate": [0.1, 0.05], "num_leaves": [15, 31]}
best = gpb.grid_search_tune_parameters(
    param_grid, train_set=gpb.Dataset(X, label=y),
    gp_model=gpb.GPModel(group_data=group),
    num_try_random=None, nfold=3, num_boost_round=40,
    early_stopping_rounds=5, seed=11)
print("best params:", best["best_params"],
      "best iter:", best["best_iter"],
      "best score: %.4f" % best["best_score"])
