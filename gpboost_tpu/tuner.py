"""Hyperparameter tuning: TPE search over the boosting parameter space.

Reference: python-package/gpboost/engine.py:1234
tune_pars_TPE_algorithm_optuna. Uses optuna's TPESampler when optuna is
installed; otherwise falls back to a built-in Tree-structured Parzen
Estimator (Bergstra et al. 2011): after a random startup phase, trials are
split into good/bad by the top-gamma quantile and new candidates maximize
the good/bad density ratio under per-dimension Parzen (KDE) estimates.
"""

import copy

import numpy as np

# parameter-type groups (engine.py:1428-1448)
_LOG_FLOAT = {"learning_rate", "shrinkage_rate", "min_gain_to_split",
              "min_split_gain", "min_sum_hessian_in_leaf",
              "min_sum_hessian_per_leaf", "min_sum_hessian", "min_hessian",
              "min_child_weight"}
_LIN_FLOAT = {"lambda_l2", "reg_lambda", "lambda", "lambda_l1", "reg_alpha",
              "bagging_fraction", "sub_row", "subsample", "bagging",
              "feature_fraction", "sub_feature", "colsample_bytree",
              "cat_l2", "cat_smooth"}
_LOG_INT = {"num_leaves", "num_leaf", "max_leaves", "max_leaf",
            "min_data_in_leaf", "min_data_per_leaf", "min_data",
            "min_child_samples", "max_bin"}
_LIN_INT = {"max_depth"}
_CATEGORICAL = {"line_search_step_length"}


class _Dim:
    def __init__(self, name, lo, hi):
        self.name = name
        if name in _LOG_FLOAT:
            self.kind = "float"
            self.log = True
        elif name in _LIN_FLOAT:
            self.kind = "float"
            self.log = False
        elif name in _LOG_INT:
            self.kind = "int"
            self.log = True
        elif name in _LIN_INT:
            self.kind = "int"
            self.log = False
        elif name in _CATEGORICAL:
            self.kind = "cat"
            self.log = False
        else:
            raise ValueError(f"Unknown parameter '{name}'")
        self.lo, self.hi = lo, hi

    # internal coordinate: log- or linear-scaled float in [a, b]
    def _bounds(self):
        if self.kind == "cat":
            return 0.0, 1.0
        lo, hi = float(self.lo), float(self.hi)
        if self.log:
            lo = np.log(max(lo, 1e-12))
            hi = np.log(max(hi, 1e-12))
        return lo, hi

    def to_value(self, u):
        if self.kind == "cat":
            return self.lo if u < 0.5 else self.hi
        x = np.exp(u) if self.log else u
        if self.kind == "int":
            return int(np.clip(round(x), min(self.lo, self.hi),
                               max(self.lo, self.hi)))
        return float(np.clip(x, min(self.lo, self.hi), max(self.lo, self.hi)))

    def sample_uniform(self, rng):
        a, b = self._bounds()
        return rng.uniform(a, b)


class TPESampler:
    """Minimal TPE: l(x)/g(x) density-ratio maximization with per-dimension
    Parzen estimators (fallback for optuna.samplers.TPESampler)."""

    def __init__(self, dims, seed=0, n_startup=10, gamma=0.25,
                 n_candidates=24):
        self.dims = dims
        self.rng = np.random.RandomState(seed)
        self.n_startup = n_startup
        self.gamma = gamma
        self.n_candidates = n_candidates
        self.history = []    # (u_vector, score)

    def ask(self):
        if len(self.history) < self.n_startup:
            return np.array([d.sample_uniform(self.rng) for d in self.dims])
        scores = np.asarray([s for _, s in self.history])
        order = np.argsort(scores)          # minimize
        n_good = max(2, int(np.ceil(self.gamma * len(scores))))
        good = np.asarray([self.history[i][0] for i in order[:n_good]])
        bad = np.asarray([self.history[i][0] for i in order[n_good:]])
        best_u, best_ratio = None, -np.inf
        for _ in range(self.n_candidates):
            u = np.empty(len(self.dims))
            for j, d in enumerate(self.dims):
                a, b = d._bounds()
                bw = max((b - a) / max(len(good) ** 0.5, 1.0), 1e-12)
                center = good[self.rng.randint(len(good)), j]
                u[j] = np.clip(self.rng.normal(center, bw), a, b)
            ratio = self._log_density(good, u) - self._log_density(bad, u)
            if ratio > best_ratio:
                best_ratio, best_u = ratio, u
        return best_u

    def _log_density(self, pts, u):
        if len(pts) == 0:
            return 0.0
        tot = 0.0
        for j, d in enumerate(self.dims):
            a, b = d._bounds()
            bw = max((b - a) / max(len(pts) ** 0.5, 1.0), 1e-12)
            z = (u[j] - pts[:, j]) / bw
            tot += np.log(np.mean(np.exp(-0.5 * z * z)) / bw + 1e-300)
        return tot

    def tell(self, u, score):
        self.history.append((np.asarray(u), float(score)))


def tune_pars_TPE_algorithm_optuna(search_space, n_trials, X, y,
                                   gp_model=None, max_num_boost_round=1000,
                                   early_stopping_rounds=None, metric=None,
                                   folds=None, nfold=5, cv_seed=0, tpe_seed=0,
                                   params=None, verbose_train=0,
                                   verbose_eval=1,
                                   use_gp_model_for_validation=True,
                                   train_gp_model_cov_pars=True, feval=None,
                                   **kwargs):
    """Choose tuning parameters with the TPE algorithm (engine.py:1234).

    Returns {'best_params', 'best_iter', 'best_score'}.
    """
    from .boosting import Dataset
    from .engine import cv, metric_higher_better, _METRIC_ALIASES

    if not isinstance(search_space, dict):
        raise ValueError("'search_space' must be a dictionary")
    if not isinstance(n_trials, int) or n_trials <= 0:
        raise ValueError("'n_trials' must be a positive integer")
    params = copy.deepcopy(params) if params else {}
    search_space = copy.deepcopy(search_space)
    for k, v in search_space.items():
        if len(v) != 2:
            raise ValueError(f"search_space['{k}'] must have length 2")

    if metric is not None and not isinstance(metric, str):
        metric = metric[0]
    higher_better = metric_higher_better(metric) if metric else False
    if metric is None and gp_model is not None:
        metric = "test_neg_log_likelihood"

    dims = [_Dim(k, v[0], v[1]) for k, v in search_space.items()]
    best = {"score": -np.inf if higher_better else np.inf,
            "iter": -1, "params": None}

    def run_trial(params_loc):
        data_bst = Dataset(data=X, label=y)
        cvkw = dict(params={**params_loc, "verbose": verbose_train, **params},
                    train_set=data_bst, gp_model=gp_model,
                    use_gp_model_for_validation=use_gp_model_for_validation,
                    num_boost_round=max_num_boost_round,
                    early_stopping_rounds=early_stopping_rounds,
                    folds=folds, nfold=nfold, seed=cv_seed,
                    metrics=metric)
        if feval is not None:
            cvkw["eval"] = feval
        res = cv(**cvkw)
        key = next(k for k in res if k.endswith("-mean"))
        vals = np.asarray(res[key])
        if higher_better:
            return float(np.max(vals)), int(np.argmax(vals)) + 1
        return float(np.min(vals)), int(np.argmin(vals)) + 1

    try:
        import optuna

        def objective(trial):
            params_loc = {}
            for d in dims:
                if d.kind == "cat":
                    params_loc[d.name] = trial.suggest_categorical(
                        d.name, [d.lo, d.hi])
                elif d.kind == "int":
                    params_loc[d.name] = trial.suggest_int(
                        d.name, d.lo, d.hi, log=d.log)
                else:
                    params_loc[d.name] = trial.suggest_float(
                        d.name, d.lo, d.hi, log=d.log)
            try:
                score, it = run_trial(params_loc)
            except Exception as e:
                from .utils.log import Log
                Log.warning(f"trial failed: {e}")
                return -np.inf if higher_better else np.inf
            cmp = score > best["score"] if higher_better \
                else score < best["score"]
            if cmp:
                best.update(score=score, iter=it, params=params_loc)
            return score

        study = optuna.create_study(
            direction="maximize" if higher_better else "minimize",
            sampler=optuna.samplers.TPESampler(seed=tpe_seed))
        study.optimize(objective, n_trials=n_trials)
    except ImportError:
        sampler = TPESampler(dims, seed=tpe_seed)
        for _ in range(n_trials):
            u = sampler.ask()
            params_loc = {d.name: d.to_value(u[j])
                          for j, d in enumerate(dims)}
            try:
                score, it = run_trial(params_loc)
            except Exception as e:
                from .utils.log import Log
                Log.warning(f"trial failed: {e}")
                score, it = (-np.inf if higher_better else np.inf), -1
            # the sampler minimizes
            sampler.tell(u, -score if higher_better else score)
            cmp = score > best["score"] if higher_better \
                else score < best["score"]
            if cmp:
                best.update(score=score, iter=it, params=params_loc)
            if verbose_eval:
                from .utils.log import Log
                Log.info(f"trial {len(sampler.history)}: score={score:g} "
                         f"best={best['score']:g}")

    if best["params"] is None:
        raise ValueError("Did not find any valid parameter combination. "
                         "Check the 'metric', search space, and data")
    return {"best_params": best["params"], "best_iter": best["iter"],
            "best_score": best["score"]}
