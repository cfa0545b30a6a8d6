"""Model interpretation (SHAP values, feature importances) and the
alternative boosting modes (DART, GOSS, random forest).
"""
import numpy as np
import gpboost_tpu as gpb

rng = np.random.RandomState(12)
n, p = 3000, 6
X = rng.rand(n, p)
y = 3 * X[:, 0] + np.sin(8 * X[:, 1]) + 2 * X[:, 2] * X[:, 3] \
    + 0.2 * rng.randn(n)                      # features 4, 5 are noise
ds = gpb.Dataset(X, label=y)

bst = gpb.train({"learning_rate": 0.1, "num_leaves": 31}, ds,
                num_boost_round=100)

# ------------------------------------------------- exact TreeSHAP values
phi = bst.predict(X[:500], pred_contrib=True)   # (n, p+1), bias last
print("SHAP local accuracy |sum(phi) - prediction|: %.1e"
      % np.max(np.abs(phi.sum(1) - bst.predict(X[:500]))))
print("mean |SHAP| per feature:", np.round(np.abs(phi[:, :p]).mean(0), 3))
print("  -> features 0-3 matter, 4-5 are noise")

# ------------------------------------------------- feature importances
print("\nsplit importance:", bst.feature_importance("split").astype(int))
print("gain  importance:", np.round(bst.feature_importance("gain"), 0))

# ------------------------------------------------- boosting modes
for params in [{"boosting": "dart", "drop_rate": 0.1},
               {"boosting": "goss"},
               {"boosting": "rf", "bagging_fraction": 0.6,
                "bagging_freq": 1, "min_data_in_leaf": 5}]:
    b = gpb.train({"learning_rate": 0.1, "num_leaves": 31, **params},
                  ds, num_boost_round=100)
    r2 = 1 - np.var(y - b.predict(X)) / np.var(y)
    print("%13s  train R^2 %.3f" % (params["boosting"], r2))

# ------------------------------------------------- continued training
b1 = gpb.train({"num_leaves": 31}, ds, num_boost_round=50)
b2 = gpb.train({"num_leaves": 31}, ds, num_boost_round=50, init_model=b1)
print("\ncontinued training: 50 -> %d trees, mse %.4f -> %.4f"
      % (len(b2.trees), np.mean((y - b1.predict(X)) ** 2),
         np.mean((y - b2.predict(X)) ** 2)))
