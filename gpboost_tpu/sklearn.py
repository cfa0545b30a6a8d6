"""scikit-learn style estimator wrappers.

Reference: python-package/gpboost/sklearn.py (GPBoostModel :185,
GPBoostRegressor :834, GPBoostClassifier :864, GPBoostRanker :1069).
"""

import copy

import numpy as np

from .boosting import Dataset, train

# constructor args that map 1:1 into booster params (reference sklearn.py
# maps the sklearn-style names through _ConfigAliases)
_PARAM_NAMES = (
    "boosting_type", "num_leaves", "max_depth", "learning_rate",
    "n_estimators", "objective", "min_child_samples", "min_child_weight",
    "min_split_gain", "subsample", "subsample_freq", "colsample_bytree",
    "reg_lambda", "max_bin", "random_state",
)


class GPBoostModel:
    """Base sklearn-style wrapper around the boosting engine
    (sklearn.py:185 GPBoostModel)."""

    _objective = "regression"

    def __init__(self, boosting_type="gbdt", num_leaves=31, max_depth=-1,
                 learning_rate=0.1, n_estimators=100, objective=None,
                 min_split_gain=0.0, min_child_weight=1e-3,
                 min_child_samples=20, subsample=1.0, subsample_freq=0,
                 colsample_bytree=1.0, reg_lambda=0.0, max_bin=255,
                 random_state=None, **kwargs):
        self.boosting_type = boosting_type
        self.num_leaves = num_leaves
        self.max_depth = max_depth
        self.learning_rate = learning_rate
        self.n_estimators = n_estimators
        self.objective = objective
        self.min_split_gain = min_split_gain
        self.min_child_weight = min_child_weight
        self.min_child_samples = min_child_samples
        self.subsample = subsample
        self.subsample_freq = subsample_freq
        self.colsample_bytree = colsample_bytree
        self.reg_lambda = reg_lambda
        self.max_bin = max_bin
        self.random_state = random_state
        self.kwargs = kwargs
        self._booster = None

    # -- sklearn protocol ------------------------------------------------
    def get_params(self, deep=True):
        out = {k: getattr(self, k) for k in _PARAM_NAMES}
        out.update(copy.deepcopy(self.kwargs) if deep else self.kwargs)
        return out

    def set_params(self, **params):
        for k, v in params.items():
            if hasattr(self, k) and k != "kwargs":
                setattr(self, k, v)
            else:
                self.kwargs[k] = v
        return self

    def _booster_params(self):
        params = {
            "objective": self.objective or self._objective,
            "boosting": self.boosting_type,
            "num_leaves": self.num_leaves,
            "max_depth": self.max_depth,
            "learning_rate": self.learning_rate,
            "min_data_in_leaf": self.min_child_samples,
            "min_sum_hessian_in_leaf": self.min_child_weight,
            "min_gain_to_split": self.min_split_gain,
            "bagging_fraction": self.subsample,
            "bagging_freq": self.subsample_freq,
            "feature_fraction": self.colsample_bytree,
            "lambda_l2": self.reg_lambda,
        }
        if self.random_state is not None:
            seed = (self.random_state if isinstance(self.random_state, int)
                    else int(np.random.RandomState(
                        None).randint(2 ** 31)))
            params["bagging_seed"] = seed
            params["feature_fraction_seed"] = seed + 1
            params["drop_seed"] = seed + 2
        params.update(self.kwargs)
        return params

    def fit(self, X, y, gp_model=None, sample_weight=None, eval_set=None,
            eval_names=None, eval_sample_weight=None, eval_metric=None,
            early_stopping_rounds=None, callbacks=None, **kwargs):
        """sklearn.py:553 GPBoostModel.fit: eval_metric (str or callable
        feval), eval_names, per-set eval_sample_weight and callbacks are
        forwarded into train()."""
        y = np.asarray(y, dtype=np.float64)
        params = self._booster_params()
        ds = Dataset(np.asarray(X), label=y, max_bin=self.max_bin,
                     weight=sample_weight)
        valid_sets = None
        if eval_set is not None:
            valid_sets = [
                Dataset(np.asarray(Xv),
                        label=np.asarray(yv, dtype=np.float64),
                        max_bin=self.max_bin,
                        weight=None if eval_sample_weight is None
                        else eval_sample_weight[i])
                for i, (Xv, yv) in enumerate(eval_set)]
        if eval_metric is not None:
            if callable(eval_metric):
                kwargs.setdefault("feval", eval_metric)
            else:
                params["metric"] = eval_metric
        if eval_names is not None:
            kwargs.setdefault("valid_names", list(eval_names))
        if callbacks is not None:
            kwargs.setdefault("callbacks", callbacks)
        evals_result = {}
        kwargs.setdefault("evals_result", evals_result)
        self._booster = train(params, ds,
                              num_boost_round=self.n_estimators,
                              gp_model=gp_model, valid_sets=valid_sets,
                              early_stopping_rounds=early_stopping_rounds,
                              **kwargs)
        self.evals_result_ = kwargs["evals_result"]
        self.gp_model_ = gp_model
        self.best_iteration_ = getattr(self._booster, "best_iteration", -1)
        self.best_score_ = getattr(self._booster, "best_score", None)
        self.n_features_in_ = np.asarray(X).shape[1] \
            if np.asarray(X).ndim > 1 else 1
        return self

    @property
    def booster_(self):
        if self._booster is None:
            raise RuntimeError("fit the estimator first")
        return self._booster

    @property
    def feature_importances_(self):
        return self.booster_.feature_importance(importance_type="split")

    def predict(self, X, **kwargs):
        return self.booster_.predict(np.asarray(X), **kwargs)


class GPBoostRegressor(GPBoostModel):
    """sklearn.py:834 GPBoostRegressor."""
    _objective = "regression"


class GPBoostRanker(GPBoostModel):
    """sklearn.py:1069 GPBoostRanker — lambdarank / rank_xendcg learning to
    rank with per-query `group` arrays (gp_model is not supported for
    ranking, matching the reference)."""
    _objective = "lambdarank"

    def fit(self, X, y, group=None, sample_weight=None, eval_set=None,
            eval_group=None, early_stopping_rounds=None, **kwargs):
        if group is None:
            raise ValueError("GPBoostRanker.fit requires group (per-query "
                             "document counts)")
        y = np.asarray(y, dtype=np.float64)
        ds = Dataset(np.asarray(X), label=y, max_bin=self.max_bin,
                     weight=sample_weight, group=group)
        valid_sets = None
        if eval_set is not None:
            if eval_group is None:
                raise ValueError("eval_set requires eval_group")
            valid_sets = [
                Dataset(np.asarray(Xv),
                        label=np.asarray(yv, dtype=np.float64),
                        max_bin=self.max_bin, group=gv)
                for (Xv, yv), gv in zip(eval_set, eval_group)]
        self._booster = train(self._booster_params(), ds,
                              num_boost_round=self.n_estimators,
                              valid_sets=valid_sets,
                              early_stopping_rounds=early_stopping_rounds,
                              **kwargs)
        self.gp_model_ = None
        self.best_iteration_ = getattr(self._booster, "best_iteration", -1)
        self.n_features_in_ = np.asarray(X).shape[1] \
            if np.asarray(X).ndim > 1 else 1
        return self


class GPBoostClassifier(GPBoostModel):
    """sklearn.py:864 GPBoostClassifier: binary, or multiclass softmax when
    y has more than two classes (objective='multiclass', num_class=k)."""
    _objective = "binary"

    def fit(self, X, y, **kwargs):
        self.classes_ = np.unique(np.asarray(y))
        self.n_classes_ = len(self.classes_)
        if self.n_classes_ < 2:
            raise ValueError("y has a single class")
        if self.n_classes_ == 2:
            y_enc = (np.asarray(y) == self.classes_[1]).astype(np.float64)
        else:
            if self.objective is None:
                self.kwargs = dict(self.kwargs)
                self.kwargs["num_class"] = self.n_classes_
                self.objective = "multiclass"
            codes = {c: i for i, c in enumerate(self.classes_)}
            y_enc = np.asarray([codes[v] for v in np.asarray(y)],
                               dtype=np.float64)
        return super().fit(X, y_enc, **kwargs)

    def predict_proba(self, X, **kwargs):
        p = self.booster_.predict(np.asarray(X), **kwargs)
        if isinstance(p, dict):
            p = p["response_mean"]
        p = np.asarray(p)
        if self.n_classes_ > 2:
            return p.reshape(-1, self.n_classes_)
        p = np.clip(p, 0.0, 1.0)
        return np.column_stack([1 - p, p])

    def predict(self, X, **kwargs):
        p = self.predict_proba(X, **kwargs)
        return self.classes_[np.argmax(p, axis=1)]
