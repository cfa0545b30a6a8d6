"""Learning-to-rank objectives and metrics.

Reference: src/LightGBM/objective/rank_objective.hpp (RankingObjective,
LambdarankNDCG :97-283, RankXENDCG :289-361), metric/rank_metric.hpp (NDCG),
metric/map_metric.hpp (MAP), metric/dcg_calculator.cpp (label gains 2^l - 1,
position discounts 1/log2(2 + rank)).

The per-query pair loops of the reference are expressed as vectorized
(cnt x cnt) numpy computations per query — queries are small (tens to
hundreds of documents), so the host-side cost is negligible next to tree
growth, and the semantics (stable score ordering, truncation level,
delta-NDCG weighting, lambda normalization) match the reference exactly.
The reference approximates the sigmoid with a 2^20-entry lookup table; we
evaluate it exactly.
"""

import numpy as np

# label_gain[l] = 2^l - 1 (dcg_calculator.cpp:33 DefaultLabelGain)
DEFAULT_LABEL_GAIN = np.array([(1 << i) - 1 for i in range(31)],
                              dtype=np.float64)
DEFAULT_EVAL_AT = (1, 2, 3, 4, 5)


def query_boundaries(group):
    """Cumulative boundaries from per-query document counts."""
    group = np.asarray(group, dtype=np.int64)
    return np.concatenate([[0], np.cumsum(group)])


def _discount(ranks):
    return 1.0 / np.log2(2.0 + ranks)


def check_rank_labels(labels, label_gain=DEFAULT_LABEL_GAIN):
    lv = np.asarray(labels)
    if not np.all(lv >= 0):
        raise ValueError("ranking labels must be non-negative integers")
    if not np.all(lv == lv.astype(int)):
        raise ValueError("ranking labels must be integers")
    if lv.max(initial=0) >= len(label_gain):
        raise ValueError(f"ranking label {int(lv.max())} exceeds the "
                         f"label_gain table (size {len(label_gain)})")


def max_dcg_at_k(labels, k, label_gain=DEFAULT_LABEL_GAIN):
    """Max possible DCG@k: labels sorted descending
    (dcg_calculator.cpp:54 CalMaxDCGAtK)."""
    ls = np.sort(np.asarray(labels))[::-1][:k]
    return float(np.sum(label_gain[ls.astype(int)]
                        * _discount(np.arange(len(ls)))))


def dcg_at_k(labels, scores, k, label_gain=DEFAULT_LABEL_GAIN):
    """DCG@k of the score-induced ordering (stable descending sort,
    dcg_calculator.cpp:110 CalDCGAtK)."""
    order = np.argsort(-np.asarray(scores), kind="stable")[:k]
    ls = np.asarray(labels)[order].astype(int)
    return float(np.sum(label_gain[ls] * _discount(np.arange(len(ls)))))


def ndcg_metric(labels, scores, boundaries, eval_at=DEFAULT_EVAL_AT,
                label_gain=DEFAULT_LABEL_GAIN):
    """Mean NDCG@k per k in eval_at (rank_metric.hpp NDCGMetric::Eval;
    queries with no relevant documents count as 1)."""
    labels = np.asarray(labels)
    scores = np.asarray(scores)
    out = {}
    for k in np.atleast_1d(np.asarray(eval_at, dtype=int)):
        vals = []
        for qi in range(len(boundaries) - 1):
            s, e = boundaries[qi], boundaries[qi + 1]
            mx = max_dcg_at_k(labels[s:e], k, label_gain)
            vals.append(1.0 if mx <= 0.0
                        else dcg_at_k(labels[s:e], scores[s:e], k,
                                      label_gain) / mx)
        out[int(k)] = float(np.mean(vals))
    return out


def map_metric(labels, scores, boundaries, eval_at=DEFAULT_EVAL_AT):
    """Mean average precision @k (map_metric.hpp MapMetric::Eval;
    labels > 0 are relevant)."""
    labels = np.asarray(labels)
    scores = np.asarray(scores)
    out = {}
    for k in np.atleast_1d(np.asarray(eval_at, dtype=int)):
        vals = []
        for qi in range(len(boundaries) - 1):
            s, e = boundaries[qi], boundaries[qi + 1]
            order = np.argsort(-scores[s:e], kind="stable")
            rel = (labels[s:e][order] > 0).astype(np.float64)[:k]
            if rel.sum() <= 0:
                vals.append(0.0)
                continue
            prec = np.cumsum(rel) / np.arange(1, len(rel) + 1)
            vals.append(float(np.sum(prec * rel) / rel.sum()))
        out[int(k)] = float(np.mean(vals))
    return out


def lambdarank_gradients(labels, scores, boundaries, sigmoid=1.0, norm=True,
                         truncation_level=30,
                         label_gain=DEFAULT_LABEL_GAIN):
    """LambdaMART gradients/hessians (rank_objective.hpp:138-227
    LambdarankNDCG::GetGradientsForOneQuery), vectorized per query."""
    labels = np.asarray(labels)
    scores = np.asarray(scores, dtype=np.float64)
    n = len(scores)
    grad = np.zeros(n)
    hess = np.zeros(n)
    for qi in range(len(boundaries) - 1):
        s, e = int(boundaries[qi]), int(boundaries[qi + 1])
        c = e - s
        if c <= 1:
            continue
        sc = scores[s:e]
        lb = labels[s:e].astype(int)
        inv_max_dcg = max_dcg_at_k(lb, truncation_level, label_gain)
        if inv_max_dcg <= 0:
            continue
        inv_max_dcg = 1.0 / inv_max_dcg
        order = np.argsort(-sc, kind="stable")
        ssc = sc[order]
        slb = lb[order]
        best, worst = ssc[0], ssc[-1]
        ranks = np.arange(c)
        disc = _discount(ranks)
        gains = label_gain[slb]

        # pair matrices in sorted space: entry (a, b) = unordered pair {a, b}
        lab_ne = slb[:, None] != slb[None, :]
        in_trunc = np.minimum(ranks[:, None], ranks[None, :]) \
            < truncation_level
        valid = lab_ne & in_trunc & (ranks[:, None] != ranks[None, :])
        a_is_high = slb[:, None] > slb[None, :]
        # delta_score = s_high - s_low, from a's perspective:
        ds = np.where(a_is_high, ssc[:, None] - ssc[None, :],
                      ssc[None, :] - ssc[:, None])
        dcg_gap = np.abs(gains[:, None] - gains[None, :])
        paired_disc = np.abs(disc[:, None] - disc[None, :])
        delta_ndcg = dcg_gap * paired_disc * inv_max_dcg
        if norm and best != worst:
            delta_ndcg = delta_ndcg / (0.01 + np.abs(ds))
        with np.errstate(over="ignore"):
            p = 1.0 / (1.0 + np.exp(np.clip(sigmoid * ds, -500, 500)))
        lam = -sigmoid * delta_ndcg * p              # high's contribution
        hs = sigmoid * sigmoid * delta_ndcg * p * (1.0 - p)
        lam = np.where(valid, lam, 0.0)
        hs = np.where(valid, hs, 0.0)
        # grad[a] = sum_b (+lam if a is high else -lam); hess always adds
        ga = np.sum(np.where(a_is_high, lam, -lam), axis=1)
        ha = np.sum(hs, axis=1)
        # sum over unordered pairs of -2*lam == -sum over the full matrix
        sum_lambdas = -float(np.sum(lam))
        if norm and sum_lambdas > 0:
            f = np.log2(1.0 + sum_lambdas) / sum_lambdas
            ga, ha = ga * f, ha * f
        gq = np.zeros(c)
        hq = np.zeros(c)
        gq[order] = ga
        hq[order] = ha
        grad[s:e] = gq
        hess[s:e] = hq
    return grad, hess


def xendcg_gradients(labels, scores, boundaries, seed=0):
    """Rank-XENDCG gradients (rank_objective.hpp:289-361 RankXENDCG;
    arXiv:1911.09798): per-query softmax cross-entropy against a perturbed
    2^l - gumbel-ish target, with third-order corrections."""
    labels = np.asarray(labels)
    scores = np.asarray(scores, dtype=np.float64)
    n = len(scores)
    grad = np.zeros(n)
    hess = np.zeros(n)
    for qi in range(len(boundaries) - 1):
        s, e = int(boundaries[qi]), int(boundaries[qi + 1])
        c = e - s
        if c <= 1:
            continue
        rng = np.random.RandomState(seed + qi)
        sc = scores[s:e]
        lb = labels[s:e]
        m = sc - sc.max()
        rho = np.exp(m) / np.sum(np.exp(m))
        phi = np.power(2.0, lb.astype(int)) - rng.uniform(size=c)
        inv_denom = 1.0 / max(1e-15, float(np.sum(phi)))
        # first-order terms
        l1 = -phi * inv_denom + rho
        params = l1 / (1.0 - rho)
        sum_l1 = float(np.sum(params))
        # second-order terms
        l2 = rho * (sum_l1 - params)
        g = l1 + l2
        params = l2 / (1.0 - rho)
        sum_l2 = float(np.sum(params))
        g = g + rho * (sum_l2 - params)
        grad[s:e] = g
        hess[s:e] = rho * (1.0 - rho)
    return grad, hess
