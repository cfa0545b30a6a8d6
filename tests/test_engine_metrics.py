"""Metric-direction handling in train()/cv()/grid search, cv early stopping,
stratified folds, return_cvbooster, and sklearn wrapper param round-trips.

Reference semantics: per-metric greater_is_better (LightGBM metric headers);
cv early stopping on the aggregated metric (engine.py:575)."""

import numpy as np
import pytest

from gpboost_tpu import (Dataset, train, cv, grid_search_tune_parameters,
                         GPBoostClassifier, GPBoostRegressor)
from gpboost_tpu.engine import metric_higher_better, _make_folds


@pytest.fixture(scope="module")
def binary_data():
    rng = np.random.RandomState(7)
    n = 600
    X = rng.randn(n, 5)
    logit = 1.5 * X[:, 0] - 1.0 * X[:, 1] + 0.5 * X[:, 2]
    y = (logit + 0.8 * rng.randn(n) > 0).astype(np.float64)
    return X, y


def test_metric_direction_flags():
    assert metric_higher_better("auc")
    assert not metric_higher_better("l2")
    assert not metric_higher_better("binary_logloss")


def test_train_auc_early_stopping_tracks_best(binary_data):
    X, y = binary_data
    tr, va = np.arange(0, 400), np.arange(400, 600)
    ds = Dataset(X[tr], label=y[tr])
    vs = Dataset(X[va], label=y[va])
    evals = {}
    bst = train({"objective": "binary", "metric": "auc", "num_leaves": 7,
                 "learning_rate": 0.3, "verbose": 0},
                ds, num_boost_round=30, valid_sets=[vs],
                early_stopping_rounds=5, evals_result=evals)
    aucs = evals["valid_0"]["auc"]
    # best_iteration must point at the MAXIMUM auc, not the minimum
    assert bst.best_iteration == int(np.argmax(aucs)) + 1
    assert bst.best_score == pytest.approx(max(aucs))


def test_cv_early_stopping_and_auc(binary_data):
    X, y = binary_data
    ds = Dataset(X, label=y)
    res = cv({"objective": "binary", "num_leaves": 7, "learning_rate": 0.3,
              "verbose": 0}, ds, num_boost_round=50, nfold=3, metrics="auc",
             early_stopping_rounds=3, seed=1)
    means = res["auc-mean"]
    # early stopping must have triggered well before 50 rounds
    assert len(means) < 50
    assert res["best_iter"] == int(np.argmax(means)) + 1


def test_cv_return_cvbooster_and_train_metric(binary_data):
    X, y = binary_data
    ds = Dataset(X, label=y)
    res = cv({"objective": "binary", "num_leaves": 7, "verbose": 0}, ds,
             num_boost_round=5, nfold=3, metrics="binary_logloss",
             eval_train_metric=True, return_cvbooster=True, seed=1)
    assert "cvbooster" in res
    cvb = res["cvbooster"]
    assert len(cvb.boosters) == 3
    assert cvb.best_iteration == res["best_iter"]
    assert len(res["train binary_logloss-mean"]) == 5
    # training loss should be below validation loss by the last iteration
    assert res["train binary_logloss-mean"][-1] <= \
        res["binary_logloss-mean"][-1] + 1e-9


def test_stratified_folds_balance_classes():
    y = np.concatenate([np.ones(30), np.zeros(270)])
    folds = _make_folds(y, 5, None, 0, stratified=True)
    for f in folds:
        assert y[f].sum() == 6          # 30 positives spread evenly
        assert len(f) == 60


def test_grid_search_maximizes_auc(binary_data):
    X, y = binary_data
    ds = Dataset(X, label=y)
    best = grid_search_tune_parameters(
        {"learning_rate": [0.3], "num_leaves": [7]},
        params={"objective": "binary", "verbose": 0}, train_set=ds,
        num_boost_round=8, nfold=3, metrics="auc", seed=1)
    assert 0.5 < best["best_score"] <= 1.0   # an auc, not a loss
    assert best["best_iter"] >= 1


def test_sklearn_param_roundtrip_and_boosting_type(binary_data):
    X, y = binary_data
    est = GPBoostRegressor(boosting_type="dart", random_state=11,
                           n_estimators=5, num_leaves=5)
    params = est.get_params()
    assert params["boosting_type"] == "dart"
    assert params["random_state"] == 11
    clone = GPBoostRegressor(**params)
    assert clone.boosting_type == "dart"
    clone.fit(X, y)
    assert clone.booster_.params["boosting"] == "dart"


def test_sklearn_classifier_contract(binary_data):
    X, y = binary_data
    est = GPBoostClassifier(n_estimators=10, num_leaves=7, random_state=3)
    est.fit(X, y)
    proba = est.predict_proba(X)
    assert proba.shape == (len(y), 2)
    assert np.allclose(proba.sum(axis=1), 1.0)
    pred = est.predict(X)
    assert set(np.unique(pred)) <= set(est.classes_)
    assert (pred == y).mean() > 0.8
    assert len(est.feature_importances_) == X.shape[1]
