"""Analogues of the last unported R plumbing suites.

* test_Predictor.R — integer-input predictions, start_iteration slicing
  (the R finalizer case is R-memory-management-specific: n/a here).
* test_gpb.interprete.R — gpb.interprete is an R-only convenience that
  tabulates per-prediction feature contributions; the underlying engine
  behavior (pred_contrib rows summing to the raw prediction, binary and
  multiclass) is what is pinned here.
* test_gpb.convert_with_rules.R — R data.table factor/character-to-numeric
  conversion; the Python-surface analogue is pandas categorical handling
  with rules (categories) captured at train time and reused at predict
  time.
"""

import numpy as np
import pandas as pd
import pytest

import gpboost_tpu as gpb


@pytest.fixture(scope="module")
def xy():
    rng = np.random.RandomState(3)
    X = rng.rand(400, 4)
    y = (X[:, 0] + 0.5 * X[:, 1] + 0.1 * rng.randn(400) > 0.7).astype(float)
    return X, y


def test_integer_input_predictions(xy):
    """test_Predictor.R:30 — predictions do not fail for integer input."""
    X, y = xy
    Xi = (X * 10).astype(np.int32)
    bst = gpb.train({"objective": "binary", "verbose": 0, "num_leaves": 7,
                     "min_data_in_leaf": 5},
                    gpb.Dataset(Xi, label=y), num_boost_round=5)
    p = bst.predict(Xi)
    assert np.all(np.isfinite(p)) and p.shape == (len(y),)
    np.testing.assert_allclose(p, bst.predict(Xi.astype(np.float64)))


def test_start_iteration(xy):
    """test_Predictor.R:48 — raw-score slices over boosting iterations
    compose: full = [0, k) + [k, end)."""
    X, y = xy
    bst = gpb.train({"objective": "binary", "verbose": 0, "num_leaves": 7,
                     "min_data_in_leaf": 5, "learning_rate": 0.2},
                    gpb.Dataset(X, label=y), num_boost_round=10)
    full = bst.predict(X, raw_score=True)
    head = bst.predict(X, start_iteration=0, num_iteration=4,
                       raw_score=True)
    tail = bst.predict(X, start_iteration=4, raw_score=True)
    np.testing.assert_allclose(head + tail, full, rtol=1e-10, atol=1e-10)
    # num_iteration=0 slice from the start = boost_from_average base only
    head0 = bst.predict(X, start_iteration=0, num_iteration=10,
                        raw_score=True)
    np.testing.assert_allclose(head0, full)


def test_pred_contrib_sums_binary(xy):
    """test_gpb.interprete.R:13 — per-feature contributions + bias sum to
    the raw prediction (binary)."""
    X, y = xy
    bst = gpb.train({"objective": "binary", "verbose": 0, "num_leaves": 7,
                     "min_data_in_leaf": 5},
                    gpb.Dataset(X, label=y), num_boost_round=8)
    contrib = bst.predict(X[:20], pred_contrib=True)
    raw = bst.predict(X[:20], raw_score=True)
    np.testing.assert_allclose(contrib.sum(axis=1), raw, rtol=1e-8,
                               atol=1e-8)


def test_pred_contrib_sums_multiclass():
    """test_gpb.interprete.R:66 — multiclass contributions sum per class."""
    rng = np.random.RandomState(5)
    X = rng.rand(450, 3)
    y = np.digitize(X[:, 0] + 0.3 * rng.randn(450), [0.4, 0.7]).astype(
        float)
    bst = gpb.train({"objective": "multiclass", "num_class": 3,
                     "verbose": 0, "num_leaves": 7, "min_data_in_leaf": 5},
                    gpb.Dataset(X, label=y), num_boost_round=5)
    contrib = bst.predict(X[:15], pred_contrib=True)
    raw = bst.predict(X[:15], raw_score=True)
    contrib = contrib.reshape(15, 3, X.shape[1] + 1)
    np.testing.assert_allclose(contrib.sum(axis=2), raw.reshape(15, 3),
                               rtol=1e-8, atol=1e-8)


def test_pandas_categorical_rules_roundtrip():
    """test_gpb.convert_with_rules.R — category mapping captured at train
    time is reused at predict time (same category -> same code, even when
    the predict-frame's observed category subset differs)."""
    rng = np.random.RandomState(7)
    n = 500
    df = pd.DataFrame({
        "num": rng.rand(n),
        "fac": pd.Categorical(rng.choice(["a", "b", "c"], n)),
        "chr": rng.choice(["x", "y"], n),
    })
    df["chr"] = df["chr"].astype("category")
    y = (df["num"] + (df["fac"] == "b") * 0.5
         + (df["chr"] == "y") * 0.25 + 0.05 * rng.randn(n)).values
    ds = gpb.Dataset(df, label=y)
    bst = gpb.train({"objective": "regression", "verbose": 0,
                     "num_leaves": 15, "min_data_in_leaf": 5},
                    ds, num_boost_round=20)
    p_all = bst.predict(df)
    # a predict frame observing only a SUBSET of categories must map
    # through the train-time rules, not a fresh per-frame encoding
    sub = df[df["fac"] != "c"].reset_index(drop=True)
    sub["fac"] = sub["fac"].cat.remove_unused_categories()
    p_sub = bst.predict(sub)
    mask = (df["fac"] != "c").values
    np.testing.assert_allclose(p_sub, p_all[mask], rtol=1e-10)
