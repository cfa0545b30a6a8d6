"""pred_contrib (exact TreeSHAP) tests: local accuracy, brute-force parity,
native/python agreement, save/load roundtrip."""

import itertools
import math

import numpy as np
import pytest

import gpboost_tpu as gpb
from gpboost_tpu import native


@pytest.fixture(scope="module")
def model():
    rng = np.random.RandomState(0)
    n, p = 600, 5
    X = rng.rand(n, p)
    y = 3 * X[:, 0] + np.sin(8 * X[:, 1]) + X[:, 2] * X[:, 3] \
        + 0.1 * rng.randn(n)
    bst = gpb.train({"num_leaves": 15, "learning_rate": 0.2},
                    gpb.Dataset(X, label=y), num_boost_round=20)
    return bst, X, y


def _brute_force_shap(tree, x, p):
    """Exact Shapley values via subset enumeration of the cover-weighted
    conditional expectation (feasible for small p)."""
    def cond_exp(S):
        def rec(j):
            if tree.is_leaf[j]:
                return tree.leaf_value[j]
            f = int(tree.split_feature[j])
            if f in S:
                nxt = tree.left[j] if x[f] <= tree.threshold_real[j] \
                    else tree.right[j]
                return rec(int(nxt))
            l, r = int(tree.left[j]), int(tree.right[j])
            return (tree.cover[l] * rec(l) + tree.cover[r] * rec(r)) \
                / tree.cover[j]
        return rec(0)

    phi = np.zeros(p + 1)
    phi[p] = cond_exp(frozenset())
    feats = list(range(p))
    for f in feats:
        rest = [g for g in feats if g != f]
        for k in range(len(rest) + 1):
            for S in itertools.combinations(rest, k):
                w = math.factorial(k) * math.factorial(p - k - 1) \
                    / math.factorial(p)
                phi[f] += w * (cond_exp(frozenset(S) | {f})
                               - cond_exp(frozenset(S)))
    return phi


class TestTreeSHAP:
    def test_local_accuracy(self, model):
        """Rows of pred_contrib must sum to the raw prediction."""
        bst, X, _ = model
        phi = bst.predict(X[:100], pred_contrib=True)
        raw = bst.predict(X[:100])
        assert phi.shape == (100, X.shape[1] + 1)
        assert np.allclose(phi.sum(axis=1), raw, atol=1e-10)

    def test_matches_brute_force(self, model):
        bst, X, _ = model
        tree = bst.trees[0]
        p = X.shape[1]
        for i in [0, 7, 42]:
            phi = np.zeros((1, p + 1))
            native.tree_shap(tree, X[i:i + 1], phi)
            bf = _brute_force_shap(tree, X[i], p)
            assert np.allclose(phi[0], bf, atol=1e-10), (phi[0], bf)

    def test_python_fallback_matches_native(self, model, monkeypatch):
        if not native.available():
            pytest.skip("no native library")
        bst, X, _ = model
        tree = bst.trees[1]
        p = X.shape[1]
        phi_native = np.zeros((5, p + 1))
        native.tree_shap(tree, X[:5], phi_native)
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
        phi_py = np.zeros((5, p + 1))
        native.tree_shap(tree, X[:5], phi_py)
        assert np.allclose(phi_native, phi_py, atol=1e-12)

    def test_irrelevant_feature_gets_zero(self):
        rng = np.random.RandomState(1)
        n = 500
        X = np.column_stack([rng.rand(n), rng.rand(n)])
        y = 2.0 * (X[:, 0] > 0.5) + 0.01 * rng.randn(n)
        # num_leaves=2: exactly one split, which must pick feature 0
        bst = gpb.train({"num_leaves": 2, "learning_rate": 1.0},
                        gpb.Dataset(X, label=y), num_boost_round=1)
        phi = bst.predict(X[:50], pred_contrib=True)
        assert np.max(np.abs(phi[:, 1])) < 1e-6       # feature 1 unused
        assert np.max(np.abs(phi[:, 0])) > 0.5        # feature 0 drives it

    def test_save_load_keeps_contribs(self, model, tmp_path):
        bst, X, _ = model
        f = str(tmp_path / "m.json")
        bst.save_model(f)
        bst2 = gpb.Booster(model_file=f)
        assert np.allclose(bst.predict(X[:20], pred_contrib=True),
                           bst2.predict(X[:20], pred_contrib=True))
