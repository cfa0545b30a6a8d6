"""scikit-learn style estimator wrappers.

Reference: python-package/gpboost/sklearn.py (GPBoostModel :185,
GPBoostRegressor :834, GPBoostClassifier :864, GPBoostRanker :1069).
"""

import numpy as np

from .boosting import Dataset, train


class GPBoostModel:
    """Base sklearn-style wrapper around the boosting engine."""

    _objective = "regression"

    def __init__(self, boosting_type="gbdt", num_leaves=31, max_depth=-1,
                 learning_rate=0.1, n_estimators=100, objective=None,
                 min_child_samples=20, reg_lambda=0.0, max_bin=255,
                 random_state=None, **kwargs):
        self.num_leaves = num_leaves
        self.max_depth = max_depth
        self.learning_rate = learning_rate
        self.n_estimators = n_estimators
        self.objective = objective or self._objective
        self.min_child_samples = min_child_samples
        self.reg_lambda = reg_lambda
        self.max_bin = max_bin
        self.kwargs = kwargs
        self._booster = None

    def get_params(self, deep=True):
        return {k: getattr(self, k) for k in
                ("num_leaves", "max_depth", "learning_rate", "n_estimators",
                 "objective", "min_child_samples", "reg_lambda", "max_bin")}

    def set_params(self, **params):
        for k, v in params.items():
            setattr(self, k, v)
        return self

    def fit(self, X, y, gp_model=None, **kwargs):
        ds = Dataset(np.asarray(X), label=np.asarray(y, dtype=np.float64),
                     max_bin=self.max_bin)
        params = {
            "objective": self.objective,
            "num_leaves": self.num_leaves,
            "max_depth": self.max_depth,
            "learning_rate": self.learning_rate,
            "min_data_in_leaf": self.min_child_samples,
            "lambda_l2": self.reg_lambda,
        }
        params.update(self.kwargs)
        self._booster = train(params, ds, num_boost_round=self.n_estimators,
                              gp_model=gp_model)
        self.gp_model_ = gp_model
        return self

    @property
    def booster_(self):
        if self._booster is None:
            raise RuntimeError("fit the estimator first")
        return self._booster

    def predict(self, X, **kwargs):
        return self.booster_.predict(np.asarray(X), **kwargs)


class GPBoostRegressor(GPBoostModel):
    _objective = "regression"


class GPBoostClassifier(GPBoostModel):
    _objective = "binary"

    def predict_proba(self, X, **kwargs):
        p = self.booster_.predict(np.asarray(X), **kwargs)
        if isinstance(p, dict):
            p = p["response_mean"]
        return np.column_stack([1 - p, p])

    def predict(self, X, **kwargs):
        p = self.predict_proba(X, **kwargs)[:, 1]
        return (p > 0.5).astype(int)
