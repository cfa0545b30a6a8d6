"""Grabit (tobit objective) and mean-scale regression.

Reference: src/LightGBM/objective/regression_objective.hpp:875 (TobitLoss),
:1005 (MeanScaleLoss); golden setup from
test_Grabit_mean-scale_regression.R (its own LCG, ported below).

The no-censoring tobit == L2 identity is exact; point predictions after 100
boosting rounds depend on LightGBM's exact binning, so those are asserted
loosely.
"""

import numpy as np
import pytest

import gpboost_tpu as gpb


def sim_rand_unif(n, init_c=0.1):
    """test_Grabit LCG (mod 134456, random0)."""
    mod = 134456
    out = np.empty(n)
    s = np.floor(init_c * mod)
    out[0] = s
    for i in range(1, n):
        s = (8121 * s + 28411) % mod
        out[i] = s
    return out / mod


def friedman3(n, n_irr=5):
    X = np.reshape(sim_rand_unif(4 * n, 0.54234), (4, n)).T.copy()
    X[:, 0] *= 100
    X[:, 1] = X[:, 1] * np.pi * (560 - 40) + 40 * np.pi
    X[:, 3] = X[:, 3] * 10 + 1
    f = np.sqrt(10) * np.arctan(
        (X[:, 1] * X[:, 2] - 1 / (X[:, 1] * X[:, 3])) / X[:, 0])
    X = np.column_stack([np.ones(n), X])
    if n_irr:
        X = np.column_stack(
            [X, np.reshape(sim_rand_unif(n_irr * n, 0.74534), (n_irr, n)).T])
    return X, f


@pytest.fixture(scope="module")
def grabit_data():
    n = 1000
    X, f = friedman3(n)
    yl, yu = 3.5, 4.8
    y = np.clip(f, yl, yu)
    return dict(X=X, y=y, f=f, yl=yl, yu=yu)


class TestGrabit:
    def test_simulation_matches_reference(self, grabit_data):
        got = grabit_data["y"][-6:]
        expected = [4.594936, 3.500000, 3.500000, 3.500000, 4.800000,
                    4.724953]
        assert np.max(np.abs(got - expected)) < 1e-6

    def test_tobit_without_limits_equals_l2(self, grabit_data):
        d = grabit_data
        ds = gpb.Dataset(d["X"], label=d["y"])
        b_tob = gpb.train({"objective": "tobit", "verbose": 0},
                          ds, num_boost_round=100)
        b_l2 = gpb.train({"objective": "regression", "verbose": 0},
                         ds, num_boost_round=100)
        np.testing.assert_allclose(b_tob.predict(d["X"]),
                                   b_l2.predict(d["X"]), atol=1e-12)

    def test_censored_fit_extrapolates_past_bounds(self, grabit_data):
        d = grabit_data
        ds = gpb.Dataset(d["X"], label=d["y"])
        bst = gpb.train({"objective": "tobit", "verbose": 0,
                         "yl": d["yl"], "yu": d["yu"]},
                        ds, num_boost_round=100)
        p = bst.predict(d["X"])
        # latent predictions go beyond the censoring bounds (the whole point
        # of the tobit loss) and track the reference values
        assert p.min() < d["yl"] - 0.5 and p.max() > d["yu"] + 0.5
        ref_tail = [4.5605215, 2.0462860, -0.4051916, 1.6789510, 8.4034647,
                    4.7509841]
        assert np.max(np.abs(p[-6:] - ref_tail)) < 1.0
        # inside the uncensored band the fit is accurate
        mid = (d["f"] > d["yl"] + 0.1) & (d["f"] < d["yu"] - 0.1)
        assert np.mean((p[mid] - d["f"][mid]) ** 2) < 0.02


class TestMeanScale:
    def test_mean_scale_regression(self, grabit_data):
        d = grabit_data
        ds = gpb.Dataset(d["X"], label=d["y"])
        bst = gpb.train({"objective": "mean_scale_regression", "verbose": 0},
                        ds, num_boost_round=100)
        out = bst.predict(d["X"])
        assert set(out) == {"pred_mean", "pred_var"}
        # reference tail (tol 1e-3 there; binning differs -> loose here)
        ref_mean_tail = [3.500960, 3.519618, 4.800027, 4.709582]
        assert np.max(np.abs(out["pred_mean"][-4:] - ref_mean_tail)) < 0.05
        assert np.all(out["pred_var"] > 0)
        # variance pattern tracks the reference (within two orders of
        # magnitude — these are log-scale leaf sums after 100 rounds)
        ref_var_tail = [3.139056e-05, 6.021143e-04, 8.913208e-09,
                        2.193976e-04]
        assert np.max(np.abs(np.log10(out["pred_var"][-4:])
                             - np.log10(ref_var_tail))) < 2.5

    def test_raw_score_layout(self, grabit_data):
        d = grabit_data
        ds = gpb.Dataset(d["X"], label=d["y"])
        bst = gpb.train({"objective": "mean_scale_regression", "verbose": 0},
                        ds, num_boost_round=5)
        raw = bst.predict(d["X"], raw_score=True)
        assert raw.shape == (2 * len(d["X"]),)
