"""Learning-to-rank: lambdarank / rank_xendcg objectives, ndcg / map metrics,
GPBoostRanker wrapper.

Modeled on the reference test suite's lambdarank cases
(tests/python_package_test/test_engine.py test_lambdarank /
test_xendcg: synthetic queries, train with ndcg eval, assert
ndcg@k above a threshold) and the DCG semantics of
src/LightGBM/metric/dcg_calculator.cpp.
"""

import numpy as np
import pytest

import gpboost_tpu as gpb
from gpboost_tpu.boosting.ranking import (
    DEFAULT_LABEL_GAIN, dcg_at_k, max_dcg_at_k, ndcg_metric, map_metric,
    query_boundaries, lambdarank_gradients, xendcg_gradients)


def _sim_rank_data(n_queries=80, docs_per_query=20, p=10, seed=7):
    """Synthetic ranking data: relevance in {0,1,2,3} driven by 3 features."""
    rng = np.random.RandomState(seed)
    n = n_queries * docs_per_query
    X = rng.standard_normal((n, p))
    util = 1.2 * X[:, 0] - 0.8 * X[:, 1] + 0.5 * X[:, 2] \
        + 0.3 * rng.standard_normal(n)
    group = np.full(n_queries, docs_per_query)
    y = np.zeros(n)
    qb = query_boundaries(group)
    for qi in range(n_queries):
        s, e = qb[qi], qb[qi + 1]
        r = util[s:e].argsort().argsort()    # within-query ranks
        y[s:e] = np.digitize(r, [docs_per_query * 0.5, docs_per_query * 0.75,
                                 docs_per_query * 0.9])
    return X, y, group


def test_dcg_semantics():
    """Hand-checked DCG values (dcg_calculator.cpp: gain 2^l - 1,
    discount 1/log2(2 + rank))."""
    labels = np.array([3, 2, 0, 1])
    scores = np.array([0.1, 0.4, 0.3, 0.2])   # order: 1, 2, 3, 0
    # ranked labels: [2, 0, 1, 3]
    expect = (3 / np.log2(2) + 0 / np.log2(3)
              + 1 / np.log2(4) + 7 / np.log2(5))
    assert dcg_at_k(labels, scores, 4) == pytest.approx(expect, rel=1e-12)
    expect_max = (7 / np.log2(2) + 3 / np.log2(3)
                  + 1 / np.log2(4) + 0 / np.log2(5))
    assert max_dcg_at_k(labels, 4) == pytest.approx(expect_max, rel=1e-12)
    nd = ndcg_metric(labels, scores, [0, 4], eval_at=[4])
    assert nd[4] == pytest.approx(expect / expect_max, rel=1e-12)
    # perfect ordering -> ndcg 1; queries with all-zero labels count as 1
    nd1 = ndcg_metric(np.array([2, 1, 0, 0, 0, 0]),
                      np.array([9.0, 5.0, 1.0, 3.0, 2.0, 1.0]),
                      [0, 3, 6], eval_at=[3])
    assert nd1[3] == pytest.approx(1.0)


def test_map_semantics():
    labels = np.array([1, 0, 1, 0])
    scores = np.array([0.9, 0.8, 0.7, 0.6])   # relevant at positions 0, 2
    ap = (1.0 / 1.0 + 2.0 / 3.0) / 2.0
    assert map_metric(labels, scores, [0, 4], eval_at=[4])[4] \
        == pytest.approx(ap, rel=1e-12)


def test_lambdarank_gradient_properties():
    X, y, group = _sim_rank_data(n_queries=5, docs_per_query=10)
    qb = query_boundaries(group)
    scores = np.random.RandomState(0).standard_normal(len(y))
    g, h = lambdarank_gradients(y, scores, qb)
    # per-query gradients sum to ~0 (every pair adds +lam to one doc and
    # -lam to the other); hessians are non-negative
    for qi in range(len(qb) - 1):
        assert abs(g[qb[qi]:qb[qi + 1]].sum()) < 1e-10
    assert np.all(h >= 0)
    # the most relevant doc with a low score gets a negative gradient
    # (pushed up: trees fit -gradient)
    s0, e0 = qb[0], qb[1]
    worst_scored_best_doc = np.argmax(y[s0:e0] - 1e-3 * scores[s0:e0])
    assert g[s0 + worst_scored_best_doc] < 0


def test_xendcg_gradient_properties():
    X, y, group = _sim_rank_data(n_queries=5, docs_per_query=10)
    qb = query_boundaries(group)
    scores = np.random.RandomState(0).standard_normal(len(y))
    g, h = xendcg_gradients(y, scores, qb, seed=3)
    assert np.all(np.isfinite(g)) and np.all(h >= 0)
    for qi in range(len(qb) - 1):
        # rho sums to 1, phi/denom sums to 1 -> first-order terms sum to 0
        assert abs(g[qb[qi]:qb[qi + 1]].sum()) < 1e-8


@pytest.mark.parametrize("objective", ["lambdarank", "rank_xendcg"])
def test_rank_training_improves_ndcg(objective):
    X, y, group = _sim_rank_data()
    ds = gpb.Dataset(X, label=y, group=group)
    vX, vy, vgroup = _sim_rank_data(seed=17)
    vds = gpb.Dataset(vX, label=vy, group=vgroup)
    evals = {}
    bst = gpb.train({"objective": objective, "learning_rate": 0.1,
                     "num_leaves": 15, "min_data_in_leaf": 5,
                     "metric": "ndcg", "eval_at": [3]},
                    ds, num_boost_round=50, valid_sets=[vds],
                    evals_result=evals)
    scores = np.asarray(bst.predict(vX))
    qb = query_boundaries(vgroup)
    nd = ndcg_metric(vy, scores, qb, eval_at=[3])[3]
    base = ndcg_metric(vy, np.zeros(len(vy)), qb, eval_at=[3])[3]
    assert nd > 0.80                        # reference-style threshold
    assert nd > base + 0.1
    hist = evals["valid_0"]["ndcg@3"]
    assert hist[-1] > hist[0]               # training improves the metric


def test_rank_requires_group():
    X, y, group = _sim_rank_data(n_queries=3, docs_per_query=5)
    ds = gpb.Dataset(X, label=y)
    with pytest.raises(ValueError, match="query information"):
        gpb.train({"objective": "lambdarank"}, ds, num_boost_round=2)


def test_label_gain_and_validation():
    X, y, group = _sim_rank_data(n_queries=3, docs_per_query=5)
    ds = gpb.Dataset(X, label=y + 0.5, group=group)   # non-integer labels
    with pytest.raises(ValueError, match="integers"):
        gpb.train({"objective": "lambdarank"}, ds, num_boost_round=2)
    assert DEFAULT_LABEL_GAIN[3] == 7.0


def test_sklearn_ranker():
    X, y, group = _sim_rank_data()
    vX, vy, vgroup = _sim_rank_data(seed=23)
    r = gpb.GPBoostRanker(n_estimators=40, num_leaves=15,
                          min_child_samples=5)
    r.fit(X, y, group=group, eval_set=[(vX, vy)], eval_group=[vgroup],
          early_stopping_rounds=20)
    scores = r.predict(vX)
    nd = ndcg_metric(vy, scores, query_boundaries(vgroup), eval_at=[5])[5]
    assert nd > 0.80
    with pytest.raises(ValueError, match="group"):
        gpb.GPBoostRanker(n_estimators=2).fit(X, y)


def test_map_metric_in_training():
    X, y, group = _sim_rank_data()
    ds = gpb.Dataset(X, label=(y > 0).astype(float), group=group)
    vX, vy, vgroup = _sim_rank_data(seed=11)
    vds = gpb.Dataset(vX, label=(vy > 0).astype(float), group=vgroup)
    evals = {}
    gpb.train({"objective": "lambdarank", "metric": "map", "eval_at": [5],
               "num_leaves": 15, "min_data_in_leaf": 5},
              ds, num_boost_round=30, valid_sets=[vds], evals_result=evals)
    hist = evals["valid_0"]["map@5"]
    assert hist[-1] > 0.6 and hist[-1] >= hist[0]
