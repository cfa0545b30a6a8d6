"""Training-loop utilities: cross-validation and parameter search.

Reference: python-package/gpboost/engine.py — train (:22, in boosting/gbdt.py
here), cv (:575), grid_search_tune_parameters (:906).
"""

import itertools

import numpy as np

from .boosting import Dataset, train
from .gp_model import GPModel


def _metric_fn(name):
    name = {"l2": "l2", "mse": "l2", "mean_squared_error": "l2",
            "rmse": "rmse", "root_mean_squared_error": "rmse",
            "l1": "mae", "mae": "mae", "mean_absolute_error": "mae",
            "binary_logloss": "binary_logloss", "binary": "binary_logloss",
            "auc": "auc"}.get(name, name)

    if name == "mae":
        return lambda y, p: float(np.mean(np.abs(y - p)))

    if name == "l2":
        return lambda y, p: float(np.mean((y - p) ** 2))
    if name == "rmse":
        return lambda y, p: float(np.sqrt(np.mean((y - p) ** 2)))
    if name == "binary_logloss":
        return lambda y, p: float(-np.mean(
            y * np.log(np.clip(p, 1e-15, 1)) +
            (1 - y) * np.log(np.clip(1 - p, 1e-15, 1))))
    if name == "auc":
        def auc(y, p):
            order = np.argsort(p)
            ranks = np.empty(len(p))
            ranks[order] = np.arange(1, len(p) + 1)
            n1 = y.sum()
            n0 = len(y) - n1
            return float((ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n0 * n1))
        return auc
    raise ValueError(f"unknown metric '{name}'")


def _default_metric(gp_model, params):
    if gp_model is not None and gp_model.likelihood != "gaussian":
        return "binary_logloss" if "bernoulli" in gp_model.likelihood else "rmse"
    obj = (params or {}).get("objective", "regression")
    return "binary_logloss" if obj in ("binary", "bernoulli_logit") else "l2"


def _make_folds(n, nfold, folds, seed):
    if folds is not None:
        return [np.asarray(f, dtype=int) for f in folds]
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    return [perm[i::nfold] for i in range(nfold)]


def _clone_gp_model(gp_model, idx):
    """Rebuild the GPModel on a row subset."""
    if gp_model is None:
        return None
    kw = dict(likelihood=gp_model.likelihood,
              cov_function=gp_model.cov_function_name,
              cov_fct_shape=gp_model.cov_fct_shape,
              gp_approx=gp_model.gp_approx,
              num_neighbors=gp_model.num_neighbors,
              vecchia_ordering=gp_model.vecchia_ordering)
    if gp_model.group_data is not None:
        kw["group_data"] = gp_model.group_data[idx]
    if gp_model.gp_coords is not None:
        kw["gp_coords"] = gp_model.gp_coords[idx]
    if gp_model.cluster_ids is not None:
        kw["cluster_ids"] = gp_model.cluster_ids[idx]
    m = GPModel(**kw)
    m.set_optim_params({k: v for k, v in gp_model.params.__dict__.items()
                        if k in ("optimizer_cov", "maxit") and v is not None}
                       if gp_model.params else {})
    return m


def cv(params=None, train_set=None, num_boost_round=100, gp_model=None,
       use_gp_model_for_validation=True, folds=None, nfold=5, stratified=False,
       shuffle=True, metrics=None, seed=0, early_stopping_rounds=None,
       eval_train_metric=False, return_cvbooster=False, verbose_eval=False,
       **kwargs):
    """K-fold cross-validation for the (GP)Boost algorithm (engine.py:575).

    Returns {"<metric>-mean": [...per iteration...], "<metric>-stdv": [...]}.
    """
    params = dict(params or {})
    X = train_set.data
    y = train_set.get_label()
    n = len(y)
    fold_idx = _make_folds(n, nfold, folds, seed)
    metric = metrics if isinstance(metrics, str) else (
        metrics[0] if metrics else _default_metric(gp_model, params))
    mfn = _metric_fn(metric)

    per_iter = np.zeros((len(fold_idx), num_boost_round))
    for k, test_idx in enumerate(fold_idx):
        test_mask = np.zeros(n, dtype=bool)
        test_mask[test_idx] = True
        tr = ~test_mask
        ds_tr = Dataset(X[tr], label=y[tr], max_bin=train_set.max_bin)
        gp_tr = _clone_gp_model(gp_model, tr)
        bst = None
        from .boosting.gbdt import Booster
        bst = Booster(params=params, train_set=ds_tr, gp_model=gp_tr)
        pred_kw = {}
        if gp_model is not None and use_gp_model_for_validation:
            if gp_model.group_data is not None:
                pred_kw["group_data_pred"] = gp_model.group_data[test_mask]
            if gp_model.gp_coords is not None:
                pred_kw["gp_coords_pred"] = gp_model.gp_coords[test_mask]
            if gp_model.cluster_ids is not None:
                pred_kw["cluster_ids_pred"] = gp_model.cluster_ids[test_mask]
        for it in range(num_boost_round):
            bst.update()
            pred = bst.predict(X[test_mask], **pred_kw)
            if isinstance(pred, dict):
                p = pred.get("response_mean")
                if p is None:
                    p = pred["fixed_effect"] + pred["random_effect_mean"]
            else:
                p = pred
            per_iter[k, it] = mfn(y[test_mask], p)

    out = {f"{metric}-mean": list(per_iter.mean(axis=0)),
           f"{metric}-stdv": list(per_iter.std(axis=0))}
    out["best_iter"] = int(np.argmin(per_iter.mean(axis=0))) + 1
    return out


def grid_search_tune_parameters(param_grid, params=None, num_try_random=None,
                                folds=None, nfold=5, gp_model=None,
                                use_gp_model_for_validation=True,
                                train_set=None, num_boost_round=100,
                                early_stopping_rounds=None, seed=0,
                                metrics=None, verbose_eval=1, **kwargs):
    """Grid / random search over boosting parameters (engine.py:906).

    Returns {"best_params", "best_iter", "best_score"}.
    """
    keys = list(param_grid)
    combos = list(itertools.product(*[param_grid[k] for k in keys]))
    rng = np.random.RandomState(seed)
    if num_try_random is not None and num_try_random < len(combos):
        sel = rng.choice(len(combos), num_try_random, replace=False)
        combos = [combos[i] for i in sel]
    best = {"best_score": np.inf, "best_params": None, "best_iter": None}
    metric = metrics if isinstance(metrics, str) else (
        metrics[0] if metrics else _default_metric(gp_model, params))
    for combo in combos:
        trial = dict(params or {})
        trial.update(dict(zip(keys, combo)))
        res = cv(params=trial, train_set=train_set,
                 num_boost_round=num_boost_round, gp_model=gp_model,
                 use_gp_model_for_validation=use_gp_model_for_validation,
                 folds=folds, nfold=nfold, metrics=metric, seed=seed)
        scores = res[f"{metric}-mean"]
        sc = float(np.min(scores))
        if sc < best["best_score"]:
            best = {"best_score": sc,
                    "best_params": dict(zip(keys, combo)),
                    "best_iter": int(np.argmin(scores)) + 1}
    return best
