"""Learning-to-rank and cost-efficient training.

Mirrors the reference's examples/lambdarank (LightGBM-style query data) and
the CEGB feature-cost workflow (cost_effective_gradient_boosting.hpp).

Run: python examples/10_ranking_and_efficiency.py
"""

import numpy as np

import gpboost_tpu as gpb


def make_ranking_data(num_queries=200, docs_per_query=20, p=10, seed=0):
    rng = np.random.RandomState(seed)
    n = num_queries * docs_per_query
    X = rng.normal(size=(n, p))
    # graded relevance 0..4 driven by two features
    score = 2.0 * X[:, 0] + X[:, 1] + 0.5 * rng.normal(size=n)
    rel = np.clip(np.digitize(score, [-2, 0, 1.5, 3]), 0, 4).astype(float)
    group = np.full(num_queries, docs_per_query)
    return X, rel, group


def main():
    X, rel, group = make_ranking_data()
    n_train_q = 160
    docs = 20
    tr = slice(0, n_train_q * docs)
    va = slice(n_train_q * docs, None)

    # ---- lambdarank through the train() API --------------------------------
    dtrain = gpb.Dataset(X[tr], label=rel[tr], group=group[:n_train_q])
    dvalid = gpb.Dataset(X[va], label=rel[va], group=group[n_train_q:])
    bst = gpb.train({"objective": "lambdarank", "metric": "ndcg",
                     "eval_at": [5], "num_leaves": 31,
                     "learning_rate": 0.05, "verbose": 0},
                    dtrain, num_boost_round=50, valid_sets=[dvalid],
                    valid_names=["valid"])
    from gpboost_tpu.boosting.ranking import ndcg_metric, query_boundaries
    scores = bst.predict(X[va], raw_score=True)
    qb = query_boundaries(group[n_train_q:])
    print("lambdarank valid ndcg@5:",
          round(ndcg_metric(rel[va], scores, qb, (5,))[5], 4))

    # ---- sklearn ranker -----------------------------------------------------
    rk = gpb.GPBoostRanker(n_estimators=30, num_leaves=15,
                           learning_rate=0.1)
    rk.fit(X[tr], rel[tr], group=group[:n_train_q])
    print("GPBoostRanker top-3 scores:",
          np.round(np.sort(rk.predict(X[va]))[-3:], 3))

    # ---- cost-effective boosting: expensive features are avoided -----------
    rng = np.random.RandomState(1)
    Xc = rng.rand(3000, 4)
    Xc[:, 1] = Xc[:, 0] + 0.05 * rng.randn(3000)   # cheap near-copy of f0
    yc = 2.0 * Xc[:, 0] + 0.2 * rng.randn(3000)
    costly = gpb.train({"objective": "regression", "num_leaves": 15,
                        "verbose": 0,
                        # feature 0 costs a lot to acquire; 1 is free
                        "cegb_penalty_feature_coupled": [1e6, 0.0, 0.0, 0.0]},
                       gpb.Dataset(Xc, label=yc), num_boost_round=10)
    used = sorted({int(f) for t in costly.trees
                   for i, f in enumerate(t.split_feature[:t.num_nodes])
                   if not t.is_leaf[i]})
    print("CEGB: features used with a high cost on f0:", used)


if __name__ == "__main__":
    main()
