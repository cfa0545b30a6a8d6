"""GBDT boosting loop with the GPBoost / LaGaBoost hooks.

Reference: src/LightGBM/boosting/gbdt.cpp:293 (Train), :412 (TrainOneIter)
with the GP hooks of objective/regression_objective.hpp:153-201:

  Gaussian (GPBoost algorithm):
    resid = F - y; gp_model.OptimCovPar(y=resid) re-estimates covariance
    parameters EVERY iteration (warm-started); grad = Psi_tilde^-1 resid;
    hess = 1; trees fit -grad.
  Non-Gaussian (LaGaBoost):
    gp_model.OptimCovPar(fixed_effects=F); grad = d nll_Laplace / dF at the
    mode; hess = 1. Init score via FindInitialValueBoosting.

Standalone (no gp_model) objectives reuse the likelihood registry: grad/hess
are the autodiff d1/d2 of the per-sample log density — "regression" (L2),
"binary" (bernoulli logit), "poisson", "gamma", ...
"""

from functools import partial

import numpy as np
from ..ops.jit_utils import lifted_jit
import jax
import jax.numpy as jnp

from .dataset import Dataset
from .tree import Tree
from .tree_learner import SerialTreeLearner
from ..likelihoods import get_likelihood


def _load_forced_splits(path):
    if not path:
        return None
    import json
    with open(path) as f:
        return json.load(f)


def _parse_interaction_constraints(ic):
    """config.h interaction_constraints: accepts the LightGBM string form
    "[0,1,2],[2,3]" or a list of index lists; returns a list of lists."""
    if ic is None or ic == "":
        return None
    if isinstance(ic, str):
        import json
        return json.loads(f"[{ic}]")
    return [list(s) for s in ic]


def _weighted_percentile(v, w, alpha):
    """Common::Percentile / WeightedPercentileFun (utils/common.h:919-985):
    percentile of v; the weighted variant accumulates sorted weights to the
    alpha cut."""
    v = np.asarray(v, dtype=np.float64)
    if w is None:
        return float(np.percentile(v, alpha * 100.0))
    w = np.asarray(w, dtype=np.float64)
    o = np.argsort(v)
    cw = np.cumsum(w[o])
    i = int(np.searchsorted(cw, alpha * cw[-1]))
    return float(v[o[min(i, len(v) - 1)]])


def _scan_grad_builder(obj_name, obj_args, y, w, aux):
    """Elementwise jax (grad, hess) of the training loss at score F — the
    in-scan analogue of Booster._gradients() for the fused multi-round path
    (objective/regression_objective.hpp GetGradients equivalents)."""
    if obj_name == "gaussian":
        def fn(F):
            return F - y, jnp.ones_like(F)
    elif obj_name == "quantile":
        alpha = float(obj_args[0])

        def fn(F):
            d = F - y
            return jnp.where(d >= 0, 1.0 - alpha, -alpha), jnp.ones_like(F)
    elif obj_name == "l1":
        def fn(F):
            return jnp.sign(F - y), jnp.ones_like(F)
    elif obj_name == "huber":
        alpha = float(obj_args[0])

        def fn(F):
            return jnp.clip(F - y, -alpha, alpha), jnp.ones_like(F)
    elif obj_name == "fair":
        c = float(obj_args[0])

        def fn(F):
            d = F - y
            return c * d / (jnp.abs(d) + c), c * c / (jnp.abs(d) + c) ** 2
    elif obj_name == "mape":
        lw = 1.0 / jnp.maximum(1.0, jnp.abs(y))

        def fn(F):
            return jnp.sign(F - y) * lw, jnp.ones_like(F)
    elif obj_name == "tweedie":
        rho = float(obj_args[0])

        def fn(F):
            e1 = jnp.exp((1.0 - rho) * F)
            e2 = jnp.exp((2.0 - rho) * F)
            return (-y * e1 + e2,
                    jnp.maximum(-y * (1.0 - rho) * e1 + (2.0 - rho) * e2,
                                1e-12))
    elif obj_name == "cross_entropy":
        def fn(F):
            z = 1.0 / (1.0 + jnp.exp(-F))
            return z - y, jnp.maximum(z * (1.0 - z), 1e-12)
    elif obj_name == "binary_lgb":
        sig, w0, w1 = [float(v) for v in obj_args]
        lab = jnp.where(y > 0, 1.0, -1.0)
        lw = jnp.where(y > 0, w1, w0)

        def fn(F):
            resp = -lab * sig / (1.0 + jnp.exp(lab * sig * F))
            ar = jnp.abs(resp)
            return resp * lw, jnp.maximum(ar * (sig - ar) * lw, 1e-12)
    elif obj_name == "cross_entropy_lambda":
        if w is None:
            def fn(F):
                z = 1.0 / (1.0 + jnp.exp(-F))
                return z - y, jnp.maximum(z * (1.0 - z), 1e-12)
        else:
            # the weight sits INSIDE the loss (xentropy_objective.hpp:200)
            def xel(F):
                epf = jnp.exp(F)
                hhat = jnp.log1p(epf)
                z = 1.0 - jnp.exp(-w * hhat)
                g = (1.0 - y / z) * w / (1.0 + 1.0 / epf)
                c = 1.0 / (1.0 - z)
                a = w * epf / (1.0 + epf) ** 2
                b = (c / (c - 1.0) ** 2) * (1.0 + w * epf - c)
                return g, jnp.maximum(a * (1.0 + y * b), 1e-12)
            return xel
    else:
        lik = get_likelihood(obj_name)

        def fn(F):
            return (-lik.d1(y, F, aux),
                    jnp.maximum(-lik.d2(y, F, aux), 1e-12))
    if w is None:
        return fn

    def wfn(F):
        g, h = fn(F)
        return g * w, h * w

    return wfn


def _stats_pos_of(g, h, n_pad):
    """(n_pad, 8) f32 positional stats block [grad, hess, count, 0pad]."""
    n = g.shape[0]
    stats = jnp.zeros((n_pad, 8), jnp.float32)
    stats = stats.at[:n, 0].set(g.astype(jnp.float32))
    stats = stats.at[:n, 1].set(h.astype(jnp.float32))
    stats = stats.at[:n, 2].set(1.0)
    return stats


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _train_rounds_scanned(obj_name, obj_args, grow_cfg, chunk,
                          bins_pos, y, w, aux, F0, lr,
                          l2, min_data, min_hess, min_gain, fm, l1,
                          monotone, cat_mask):
    """Fused multi-round GBDT training: ONE compiled program runs `chunk`
    boosting iterations (gradients -> leaf-partitioned tree growth -> score
    update) under a lax.scan, returning the stacked split records for host
    tree reconstruction. The TPU-native replacement for the reference's
    per-iteration host loop (gbdt.cpp:412 TrainOneIter): device round-trips
    per training run drop from O(rounds) to O(rounds / chunk)."""
    from .tree_learner import _grow_tree_partitioned_impl
    (num_bins, num_leaves, max_depth, use_pallas, row_block, feat_chunk,
     path_smooth, cat_params_t, nan_bin_t) = grow_cfg
    cat_params = jnp.asarray(cat_params_t, jnp.float32)
    n = y.shape[0]
    n_pad = bins_pos.shape[0]
    L = num_leaves
    grad_fn = _scan_grad_builder(obj_name, obj_args, y, w, aux)

    def body(F, _):
        g, h = grad_fn(F)
        rec, lv, node, rgain, rcat, cs = _grow_tree_partitioned_impl(
            bins_pos, _stats_pos_of(g, h, n_pad), num_bins, L, max_depth,
            use_pallas, row_block, feat_chunk, l2, min_data, min_hess,
            min_gain, fm, l1, monotone, cat_mask, path_smooth,
            cat_params=cat_params, nan_bin=nan_bin_t)
        lv64 = lv.astype(F.dtype)
        slot = jnp.clip(node[:n], 0, L - 1)
        contrib = jnp.where(node[:n] < L, lv64[slot], 0.0)
        return F + lr * contrib, (rec, lv64, rgain, rcat, cs)

    return jax.lax.scan(body, F0, None, length=chunk)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _train_rounds_scanned_multi(obj_name, obj_args, K, grow_cfg, chunk,
                                bins_pos, y, w, F0, lr,
                                l2, min_data, min_hess, min_gain, fm, l1,
                                monotone, cat_mask):
    """Fused multi-round training for the K-trees-per-iteration objectives
    (multiclass softmax, mean_scale_regression): one device dispatch runs
    `chunk` iterations of [shared gradients -> K leaf-partitioned trees ->
    per-block score updates] (gbdt.cpp TrainOneIter over num_class_
    models / regression_objective.hpp:1010 MeanScaleLoss)."""
    from .tree_learner import _grow_tree_partitioned_impl
    (num_bins, num_leaves, max_depth, use_pallas, row_block, feat_chunk,
     path_smooth, cat_params_t, nan_bin_t) = grow_cfg
    cat_params = jnp.asarray(cat_params_t, jnp.float32)
    n = y.shape[0]
    n_pad = bins_pos.shape[0]
    L = num_leaves

    if obj_name == "multiclass":
        onehot = jax.nn.one_hot(y.astype(jnp.int32), K, axis=0,
                                dtype=jnp.float64)              # (K, n)
        factor = K / (K - 1.0)

        def grads(F):
            S = F.reshape(K, n)
            S = S - jnp.max(S, axis=0, keepdims=True)
            P = jnp.exp(S)
            P = P / jnp.sum(P, axis=0, keepdims=True)
            g = P - onehot
            h = jnp.maximum(factor * P * (1.0 - P), 1e-12)
            return g, h
    else:                                 # mean_scale_regression
        def grads(F):
            m_ = F[:n]
            sv = F[n:]
            inv_var = jnp.exp(-sv)
            neg_resid = m_ - y
            g1 = inv_var * neg_resid
            h1 = inv_var
            h2 = inv_var * neg_resid ** 2 / 2.0
            g2 = -h2 + 0.5
            g = jnp.stack([g1, g2])
            h = jnp.maximum(jnp.stack([h1, h2]), 1e-12)
            return g, h

    def body(F, _):
        g, h = grads(F)
        if w is not None:
            g, h = g * w[None, :], h * w[None, :]
        outs = []
        for k in range(K):
            rec, lv, node, rgain, rcat, cs = _grow_tree_partitioned_impl(
                bins_pos, _stats_pos_of(g[k], h[k], n_pad), num_bins, L,
                max_depth, use_pallas, row_block, feat_chunk, l2, min_data,
                min_hess, min_gain, fm, l1, monotone, cat_mask, path_smooth,
                cat_params=cat_params, nan_bin=nan_bin_t)
            lv64 = lv.astype(F.dtype)
            slot = jnp.clip(node[:n], 0, L - 1)
            contrib = jnp.where(node[:n] < L, lv64[slot], 0.0)
            F = F.at[k * n:(k + 1) * n].add(lr * contrib)
            outs.append((rec, lv64, rgain, rcat, cs))
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                         *outs)
        return F, stacked

    return jax.lax.scan(body, F0, None, length=chunk)


def _psi_inv_jax_builder(eng):
    """Traceable Psi_tilde^-1 v (the unit-sigma2 scaled covariance) for the
    engines the fused GPBoost scan supports; None when unsupported. The
    in-scan analogue of _psi_tilde_inv_apply."""
    kind = type(eng).__name__
    if kind == "VecchiaGaussianEngine":
        perm = jnp.asarray(eng.perm)
        idx = eng._nn_idx

        def apply(theta_log, v):
            # Psi~^-1 = P' B' D^-1 B P (models/vecchia.py quad_logdet)
            A, D = eng._bd(theta_log)
            vp = v[perm]
            z = vp - jnp.sum(A * vp[idx], axis=1)          # B v
            w = z / D
            out = w - jnp.zeros_like(w).at[idx.reshape(-1)].add(
                (A * w[:, None]).reshape(-1))               # B' D^-1 B v
            return jnp.zeros_like(out).at[perm].set(out)

        return apply
    if kind == "DenseGaussianEngine":
        import jax.scipy.linalg as jsl

        def apply(theta_log, v):
            Psi = eng.psi_tilde(theta_log)
            L = jnp.linalg.cholesky(Psi)
            return jsl.cho_solve((L, True), v)

        return apply
    return None


def _make_fused_lagaboost_scan(eng, chunk, grow_cfg, maxit_gp, lr0_gp,
                               est_aux, delta=1e-6):
    """One compiled program = `chunk` LaGaBoost iterations (non-Gaussian):
    gradient = d nll_Laplace / dF at the mode -> leaf-partitioned tree ->
    score update -> warm-started on-device Laplace GD covariance/aux refit
    (regression_objective.hpp:175-183 OptimCovPar given fixed effects).
    Mode state and parameters warm-start across rounds; the learning rate
    restarts at its default each round (see _refit_gp_cov). Cached on the
    ENGINE; learner arrays come in as arguments."""
    from .tree_learner import _grow_tree_partitioned_impl
    from ..models.jit_gd import make_jitted_gd_laplace
    gd_fit = make_jitted_gd_laplace(eng._nll_raw, eng.num_theta,
                                    eng.num_aux, est_aux)
    vag_F = eng._vag_F
    perm = jnp.asarray(eng.perm) if hasattr(eng, "perm") else None
    (num_bins, L, max_depth, use_pallas, row_block, feat_chunk,
     path_smooth, cat_params_t, nan_bin_t) = grow_cfg
    cat_params = jnp.asarray(cat_params_t, jnp.float32)

    def prep(v):
        return v if perm is None else v[perm]

    def unprep(v):
        return v if perm is None else jnp.zeros_like(v).at[perm].set(v)

    def run(carry, yp, bins_pos, fm, monotone, cat_mask,
            lr_tree, l2, min_data, min_hess, min_gain, l1):
        n = yp.shape[0]
        n_pad = bins_pos.shape[0]

        def body(c, _):
            F, u, a = c
            # gradient at the current params/mode (Booster._gradients,
            # LaGaBoost branch); the mode found here is discarded — the
            # refit chain owns the warm start, mirroring the host path
            (_, (_, _)), (_, gFp) = vag_F(u, prep(F).astype(yp.dtype), yp,
                                          a)
            g = unprep(gFp)
            rec, lv, node, rgain, rcat, cs = _grow_tree_partitioned_impl(
                bins_pos, _stats_pos_of(g, jnp.ones_like(g), n_pad),
                num_bins, L, max_depth, use_pallas, row_block, feat_chunk,
                l2, min_data, min_hess, min_gain, fm, l1, monotone,
                cat_mask, path_smooth, cat_params=cat_params, nan_bin=nan_bin_t)
            lv64 = lv.astype(F.dtype)
            slot = jnp.clip(node[:n], 0, L - 1)
            contrib = jnp.where(node[:n] < L, lv64[slot], 0.0)
            F_new = F + lr_tree * contrib
            u_new, nll, _, _, a_new = gd_fit(
                u, prep(F_new).astype(yp.dtype), yp, a, lr0_gp, maxit_gp,
                delta)
            return (F_new, u_new, a_new), (rec, lv64, rgain, rcat, cs, nll)

        return jax.lax.scan(body, carry, None, length=chunk)

    return lifted_jit(run)


def _make_fused_gpboost_scan(eng, chunk, grow_cfg, maxit_gp, reuse_lr,
                             delta=1e-6):
    """One compiled program = `chunk` GPBoost-algorithm iterations:
    gradient (Psi~^-1 resid / sigma2) -> leaf-partitioned tree -> score
    update -> warm-started on-device GD covariance refit. Mirrors the host
    sequence update()/_refit_gp_cov (gbdt.cpp:412 TrainOneIter + :549
    end-of-iteration Boosting()); cached on the ENGINE so repeated train()
    calls with the same GPModel reuse the executable. The learner arrays
    come in as arguments, not closures, for exactly that reason."""
    from .tree_learner import _grow_tree_partitioned_impl
    from ..models.jit_gd import make_jitted_gd
    psi_inv = _psi_inv_jax_builder(eng)
    gd_fit = make_jitted_gd(eng.nll_parts_raw, eng.n)
    perm = jnp.asarray(eng.perm) if hasattr(eng, "perm") else None
    (num_bins, L, max_depth, use_pallas, row_block, feat_chunk,
     path_smooth, cat_params_t, nan_bin_t) = grow_cfg
    cat_params = jnp.asarray(cat_params_t, jnp.float32)

    def prep(v):
        return v if perm is None else v[perm]

    def run(carry, y, bins_pos, fm, monotone, cat_mask,
            lr_tree, l2, min_data, min_hess, min_gain, l1):
        n = y.shape[0]
        n_pad = bins_pos.shape[0]

        def body(c, _):
            F, u, lr_gp = c
            resid = F - y
            sigma2 = jnp.exp(u[0])
            g = psi_inv(u[1:], resid) / sigma2
            rec, lv, node, rgain, rcat, cs = _grow_tree_partitioned_impl(
                bins_pos, _stats_pos_of(g, jnp.ones_like(g), n_pad),
                num_bins, L, max_depth, use_pallas, row_block, feat_chunk,
                l2, min_data, min_hess, min_gain, fm, l1, monotone,
                cat_mask, path_smooth, cat_params=cat_params, nan_bin=nan_bin_t)
            lv64 = lv.astype(F.dtype)
            slot = jnp.clip(node[:n], 0, L - 1)
            contrib = jnp.where(node[:n] < L, lv64[slot], 0.0)
            F_new = F + lr_tree * contrib
            lr_in = lr_gp if reuse_lr else jnp.asarray(0.1, F.dtype)
            u_new, nll, lr_out, _ = gd_fit(u, prep(F_new - y), lr_in,
                                           maxit_gp, delta)
            lr_carry = jnp.minimum(jnp.maximum(lr_out, 1e-8) * 2.0, 0.1)
            return (F_new, u_new, lr_carry), (rec, lv64, rgain, rcat, cs,
                                              nll)

        return jax.lax.scan(body, carry, None, length=chunk)

    return lifted_jit(run)

_OBJ_ALIASES = {
    "regression": "gaussian", "regression_l2": "gaussian", "l2": "gaussian",
    "mean_squared_error": "gaussian", "mse": "gaussian",
    "binary": "bernoulli_logit", "binary_logloss": "bernoulli_logit",
    "poisson": "poisson", "gamma": "gamma",
    "multiclass": "multiclass", "softmax": "multiclass",
    "quantile": "quantile",
    "regression_l1": "l1", "l1": "l1", "mae": "l1",
    "mean_absolute_error": "l1",
    "huber": "huber", "fair": "fair",
    "mape": "mape", "mean_absolute_percentage_error": "mape",
    "tweedie": "tweedie",
    "cross_entropy": "cross_entropy", "xentropy": "cross_entropy",
    "cross_entropy_lambda": "cross_entropy_lambda",
    "xentlambda": "cross_entropy_lambda",
    "tobit": "tobit", "grabit": "tobit",
    "mean_scale_regression": "mean_scale_regression",
    "lambdarank": "lambdarank", "rank_xendcg": "rank_xendcg",
    "xendcg": "rank_xendcg", "xe_ndcg": "rank_xendcg",
    "xe_ndcg_mart": "rank_xendcg", "xendcg_mart": "rank_xendcg",
}

# objectives handled by dedicated gradient formulas instead of the
# likelihood registry (src/LightGBM/objective/: multiclass_objective.hpp,
# regression_objective.hpp RegressionQuantileloss/L1/Huber/Fair/MAPE/Tweedie,
# xentropy_objective.hpp)
_SPECIAL_OBJECTIVES = ("multiclass", "quantile", "cross_entropy",
                       "tobit", "mean_scale_regression",
                       "lambdarank", "rank_xendcg",
                       "l1", "huber", "fair", "mape", "tweedie",
                       "binary_lgb", "cross_entropy_lambda")

def _nesterov_schedule(i, version=1, rate=0.5, offset=0):
    """Momentum rate at boosting iteration i (gbdt.h:399 NesterovSchedule)."""
    if i < offset:
        return 0.0
    if version == 0:
        return float(rate)
    if version == 1:
        return 1.0 - 3.0 / (6.0 + i)
    return 0.0


_BOOST_PARAM_DEFAULTS = dict(
    boosting="gbdt",                       # gbdt | dart | goss
    drop_rate=0.1, max_drop=50, skip_drop=0.5, drop_seed=4,    # DART
    top_rate=0.2, other_rate=0.1,                              # GOSS
    learning_rate=0.1, num_leaves=31, max_depth=-1, min_data_in_leaf=20,
    lambda_l2=0.0, lambda_l1=0.0, min_sum_hessian_in_leaf=1e-3,
    min_gain_to_split=0.0, monotone_constraints=None, num_class=1,
    alpha=0.9,
    objective="regression", train_gp_model_cov_pars=True,
    use_gp_model_for_validation=True, leaves_newton_update=False,
    line_search_step_length=False,
    # Nesterov-accelerated boosting (config.h:195, nesterov_boosting.h)
    use_nesterov_acc=False, nesterov_acc_rate=0.5, momentum_offset=0,
    momentum_schedule_version=1,
    verbose=1, max_bin=255,
    # ranking (config.h: sigmoid, lambdarank_norm,
    # lambdarank_truncation_level, label_gain, objective_seed, eval_at)
    sigmoid=1.0, lambdarank_norm=True, lambdarank_truncation_level=30,
    # binary class re-weighting (binary_objective.hpp:31-33,91-104)
    is_unbalance=False, scale_pos_weight=1.0,
    # start boosting from the average score / objective init score
    # (config.h boost_from_average); False starts from 0
    boost_from_average=True,
    # leaf-value decay used by Booster.refit (config.h refit_decay_rate)
    refit_decay_rate=0.9,
    # categorical-split regularization (config.h; feature_histogram.hpp
    # :376-443): participation/count smoothing, extra child ridge, max
    # prefix size, min rows per side
    cat_smooth=10.0, cat_l2=10.0, max_cat_threshold=32,
    min_data_per_group=100,
    label_gain=None, objective_seed=5, eval_at=(1, 2, 3, 4, 5),
    # stochastic sampling (config.h: bagging_fraction, bagging_freq,
    # feature_fraction and their seeds)
    bagging_fraction=1.0, bagging_freq=0, feature_fraction=1.0,
    bagging_seed=3, feature_fraction_seed=2,
    # warm-started per-iteration refits need few optimizer steps; when
    # reuse_learning_rates_gp_model (config.h:181) the inner optimizer also
    # keeps its step size between boosting iterations (our default: on — the
    # on-device warm restart is where the speed comes from)
    maxit_gp=10, reuse_learning_rates_gp_model=True,
    # data-parallel tree learner over a device mesh (the TPU-native analogue
    # of tree_learner=data, data_parallel_tree_learner.cpp): rows sharded,
    # histograms psum-merged, split decisions replicated
    num_parallel_devices=None,
    # serial / data(_parallel) / feature(_parallel) / voting(_parallel):
    # which dimension is sharded over the device mesh (config.h tree_learner)
    tree_learner="serial",
    # voting-parallel (PV-tree): local top-k features voted per device,
    # global top-2k histograms merged (config.h top_k,
    # voting_parallel_tree_learner.cpp:465)
    top_k=20,
    # path smoothing (config.h path_smooth): shrink leaf outputs toward the
    # parent, weighted by ps/(n_leaf+ps)
    path_smooth=0.0,
    # cost-effective gradient boosting (config.h cegb_*,
    # cost_effective_gradient_boosting.hpp): split gains are penalized by
    # tradeoff*penalty_split*n_leaf and a once-per-model per-feature cost
    cegb_tradeoff=1.0, cegb_penalty_split=0.0,
    cegb_penalty_feature_coupled=None, cegb_penalty_feature_lazy=None,
    # extra_trees (config.h): extremely-randomized split thresholds — one
    # uniformly random candidate per feature per node
    extra_trees=False, extra_seed=6,
    # forcedsplits_filename (config.h): JSON file with nested
    # {feature, threshold, left, right} splits applied before gain splits
    forcedsplits_filename="",
    # interaction_constraints (config.h): e.g. "[0,1,2],[2,3]" or
    # [[0,1,2],[2,3]] — each branch may only combine features from one set
    interaction_constraints=None,
    # missing-value handling (config.h use_missing / zero_as_missing):
    # NaN (and zeros, with zero_as_missing) get a dedicated bin and follow
    # a per-split learned default direction; use_missing=false treats NaN
    # as zero
    use_missing=True, zero_as_missing=False,
)

_PARAM_ALIASES = {
    "shrinkage_rate": "learning_rate", "eta": "learning_rate",
    "num_leaf": "num_leaves", "min_data": "min_data_in_leaf",
    "min_data_per_leaf": "min_data_in_leaf",
    "min_child_samples": "min_data_in_leaf",
    "lambda": "lambda_l2", "reg_lambda": "lambda_l2",
    "reg_alpha": "lambda_l1", "l1_regularization": "lambda_l1",
    "monotone_constraint": "monotone_constraints",
    "min_split_gain": "min_gain_to_split",
    "num_iterations": "num_boost_round", "num_trees": "num_boost_round",
    "n_estimators": "num_boost_round", "num_round": "num_boost_round",
    "sub_row": "bagging_fraction", "subsample": "bagging_fraction",
    "bagging": "bagging_fraction", "subsample_freq": "bagging_freq",
    "sub_feature": "feature_fraction", "colsample_bytree": "feature_fraction",
    "boosting_type": "boosting", "boost": "boosting",
    "unbalance": "is_unbalance", "unbalanced_sets": "is_unbalance",
}


class Booster:
    """Gradient-boosting model, optionally combined with a GPModel
    (basic.py:2315 Booster; c_api.cpp:1667 LGBM_GPBoosterCreate)."""

    _nsets = 1          # predictor blocks (2 for heteroscedastic-type GPs)
    init_score2 = 0.0
    _cegb_used = None   # CEGB model-wide feature-usage mask

    def __init__(self, params=None, train_set=None, gp_model=None,
                 model_file=None, model_dict=None, init_model=None):
        if model_file is not None or model_dict is not None:
            self._load(model_file, model_dict)
            return
        raw = dict(params or {})
        p = dict(_BOOST_PARAM_DEFAULTS)
        for k, v in raw.items():
            k = _PARAM_ALIASES.get(k, k)
            p[k] = v
        self.params = p
        self.train_set = train_set
        self._pandas_categorical = getattr(train_set, "pandas_categorical",
                                           None)
        self.gp_model = gp_model
        if not train_set._constructed and (
                "use_missing" in raw or "zero_as_missing" in raw):
            # missing-value handling arrives via train params when the
            # Dataset was built without its own params (config.h use_missing)
            train_set.use_missing = bool(p["use_missing"])
            train_set.zero_as_missing = bool(p["zero_as_missing"])
        train_set.construct()
        self.n = train_set.num_data
        self.y = train_set.get_label()
        if self.y is None:
            raise ValueError("train_set has no label")

        mesh = None
        if p.get("num_parallel_devices") and int(p["num_parallel_devices"]) > 1:
            import jax as _jax
            from jax.sharding import Mesh
            k = int(p["num_parallel_devices"])
            devs = _jax.devices()[:k]
            if len(devs) < k:
                raise ValueError(f"num_parallel_devices={k} but only "
                                 f"{len(devs)} devices are available")
            mesh = Mesh(np.asarray(devs), ("data",))
        # tree_learner (config.h): serial / data / feature / voting —
        # which dimension is sharded over the mesh, and for voting, the
        # PV-tree bandwidth-bounded histogram merge
        tl = {"serial": "data", "data": "data", "data_parallel": "data",
              "feature": "feature", "feature_parallel": "feature",
              "voting": "voting", "voting_parallel": "voting"}.get(
                  str(p.get("tree_learner", "serial")))
        if tl is None:
            raise ValueError(f"Unknown tree_learner "
                             f"'{p.get('tree_learner')}'")
        cegb = None
        coupled = p.get("cegb_penalty_feature_coupled")
        lazy = p.get("cegb_penalty_feature_lazy")
        if coupled is not None or lazy is not None \
                or float(p["cegb_penalty_split"]) > 0.0:
            tr = float(p["cegb_tradeoff"])
            cvec = np.zeros(train_set.num_features, dtype=np.float64)
            if coupled is not None:
                cp = np.asarray(coupled, dtype=np.float64)
                if len(cp) != train_set.num_features:
                    raise ValueError(
                        "cegb_penalty_feature_coupled must have one entry "
                        "per feature")
                cvec = cp
            lvec = None
            if lazy is not None:
                lp = np.asarray(lazy, dtype=np.float64)
                if len(lp) != train_set.num_features:
                    raise ValueError(
                        "cegb_penalty_feature_lazy must have one entry "
                        "per feature")
                lvec = tr * lp
            cegb = {"coupled": tr * cvec,
                    "split": tr * float(p["cegb_penalty_split"]),
                    "lazy": lvec}
        self._cegb_used = None
        self.learner = SerialTreeLearner(
            train_set, num_leaves=int(p["num_leaves"]),
            max_depth=int(p["max_depth"]),
            min_data_in_leaf=int(p["min_data_in_leaf"]),
            lambda_l2=float(p["lambda_l2"]),
            lambda_l1=float(p["lambda_l1"]),
            monotone_constraints=p.get("monotone_constraints"),
            min_sum_hessian_in_leaf=float(p["min_sum_hessian_in_leaf"]),
            min_gain_to_split=float(p["min_gain_to_split"]),
            mesh=mesh, parallel_mode=tl,
            path_smooth=float(p["path_smooth"]), cegb=cegb,
            cat_params=(float(p["cat_smooth"]), float(p["cat_l2"]),
                        float(p["max_cat_threshold"]),
                        float(p["min_data_per_group"])),
            extra_trees=bool(p["extra_trees"]),
            forced_splits=_load_forced_splits(
                p.get("forcedsplits_filename")),
            top_k=int(p["top_k"]),
            interaction_constraints=_parse_interaction_constraints(
                p.get("interaction_constraints")))
        if cegb is not None:
            self._cegb_used = np.zeros(self.learner.p_pad, dtype=np.float32)

        if gp_model is not None:
            self.objective_name = gp_model.likelihood
        else:
            self.objective_name = _OBJ_ALIASES.get(
                p["objective"], p["objective"])
        if (gp_model is None and self.objective_name == "bernoulli_logit"
                and (float(p["sigmoid"]) != 1.0 or bool(p["is_unbalance"])
                     or float(p["scale_pos_weight"]) != 1.0)):
            # LightGBM binary loss with sigmoid scaling / class re-weighting
            # (binary_objective.hpp:27-33); the plain case rides the
            # bernoulli_logit likelihood registry
            self.objective_name = "binary_lgb"
        if gp_model is None and self.objective_name in _SPECIAL_OBJECTIVES:
            self._lik = None
            if self.objective_name == "multiclass":
                K = int(p.get("num_class", 1))
                if K < 2:
                    raise ValueError("objective='multiclass' needs "
                                     "num_class >= 2")
                yv = self.y.astype(int)
                if not np.all((yv >= 0) & (yv < K)):
                    raise ValueError("multiclass labels must be in "
                                     f"[0, {K})")
            elif self.objective_name == "cross_entropy":
                if not np.all((self.y >= 0) & (self.y <= 1)):
                    raise ValueError("cross_entropy labels must be in [0, 1]")
            elif self.objective_name == "binary_lgb":
                if not np.all((self.y == 0) | (self.y == 1)):
                    raise ValueError("binary labels must be 0 or 1")
                npos = float(np.sum(self.y > 0))
                nneg = float(self.n) - npos
                w0 = w1 = 1.0
                if bool(p["is_unbalance"]):
                    if float(p["scale_pos_weight"]) != 1.0:
                        raise ValueError("Cannot set is_unbalance and "
                                         "scale_pos_weight at the same time")
                    if npos > 0 and nneg > 0:
                        if npos > nneg:
                            w0 = npos / nneg
                        else:
                            w1 = nneg / npos
                w1 *= float(p["scale_pos_weight"])
                self._binary_lw = (w0, w1)
            elif self.objective_name == "cross_entropy_lambda":
                if not np.all((self.y >= 0) & (self.y <= 1)):
                    raise ValueError("cross_entropy_lambda labels must be "
                                     "in [0, 1]")
                if train_set.weight is not None \
                        and np.any(np.asarray(train_set.weight) <= 0):
                    raise ValueError("cross_entropy_lambda requires "
                                     "positive weights")
            elif self.objective_name in ("lambdarank", "rank_xendcg"):
                from .ranking import (query_boundaries, check_rank_labels,
                                      DEFAULT_LABEL_GAIN)
                if gp_model is not None:
                    raise ValueError("ranking objectives cannot be combined "
                                     "with a gp_model")
                if train_set.group is None:
                    raise ValueError("Ranking tasks require query "
                                     "information: Dataset(..., group=...)")
                if int(np.sum(train_set.group)) != self.n:
                    raise ValueError("sum(group) must equal the number of "
                                     "data points")
                self._label_gain = np.asarray(
                    p["label_gain"], dtype=np.float64) \
                    if p.get("label_gain") is not None else DEFAULT_LABEL_GAIN
                check_rank_labels(self.y, self._label_gain)
                self._query_bounds = query_boundaries(train_set.group)
        elif gp_model is None and self.objective_name != "gaussian":
            self._lik = get_likelihood(self.objective_name)
            self._lik.check_y(self.y)
            self._aux = jnp.asarray(self._lik.init_aux(self.y))
        else:
            self._lik = None

        # two-predictor (heteroscedastic / regression zero-model) GP boosting:
        # num_sets_fixed_effects = 2 (c_api.cpp:132) — two trees per
        # iteration, one per predictor block, interleaved in self.trees
        self._nsets = 1
        self.init_score2 = 0.0
        if gp_model is None and self.objective_name == "multiclass":
            self._nsets = int(p["num_class"])
            if p["boosting"] != "gbdt":
                raise ValueError("objective='multiclass' supports "
                                 "boosting='gbdt' only")
        if gp_model is None and self.objective_name == "mean_scale_regression":
            self._nsets = 2
        if gp_model is not None and gp_model.likelihood != "gaussian" \
                and getattr(gp_model._likelihood_obj, "num_sets_fe", 1) == 2:
            self._nsets = 2
            if p["boosting"] != "gbdt":
                raise ValueError("two-predictor likelihoods support "
                                 "boosting='gbdt' only")
            if init_model is not None:
                raise ValueError("init_model is not supported with "
                                 "two-predictor likelihoods")

        self.trees = []
        if gp_model is None and self.objective_name == "multiclass":
            # boost from the log class priors (multiclass BoostFromScore)
            K = self._nsets
            counts = np.bincount(self.y.astype(int), minlength=K)
            self._init_scores = np.log(np.maximum(counts, 1)
                                       / float(self.n))
            self.init_score = float(self._init_scores[0])
            self.F = np.repeat(self._init_scores, self.n)
        elif gp_model is None \
                and self.objective_name == "mean_scale_regression":
            # BoostFromScore per block: mean and log variance
            # (regression_objective.hpp:1056-1095 MeanScaleLoss)
            self._init_scores = np.array([
                float(np.mean(self.y)),
                float(np.log(max(np.var(self.y), 1e-30)))])
            self.init_score = float(self._init_scores[0])
            self.init_score2 = float(self._init_scores[1])
            self.F = np.repeat(self._init_scores, self.n)
        elif self._nsets == 2:
            self.init_score = self._boost_from_average()
            lik = gp_model._likelihood_obj
            self.init_score2 = float(lik.init_intercept2(
                self.y, self._gp_total_re_var())) \
                if hasattr(lik, "init_intercept2") else 0.0
            self.F = np.concatenate([np.full(self.n, self.init_score),
                                     np.full(self.n, self.init_score2)])
        else:
            self.init_score = self._boost_from_average()
            self.F = np.full(self.n, self.init_score)
        if gp_model is not None and gp_model.likelihood != "gaussian":
            # non-Gaussian GPBoost: the init score(s) are intercept-only ML
            # fits of the Laplace marginal likelihood at the initial
            # covariance parameters — NOT the closed-form moment intercepts,
            # which only provide the starting values
            # (FindInitialValueBoosting, re_model.cpp:634-690)
            c0 = [self.init_score] + ([self.init_score2]
                                      if self._nsets == 2 else [])
            c = self._find_init_scores_gp(c0)
            self.init_score = c[0]
            if self._nsets == 2:
                self.init_score2 = c[1]
            self.F = np.repeat(np.asarray(c, dtype=np.float64), self.n)
        self._gp_init_pars = None
        self._gp_refit_iter = -1
        self._gp_lr_lap = 0.1
        self._F_lag1 = None
        self.current_iteration_ = 0
        self._bag_rng = np.random.RandomState(int(p["bagging_seed"]))
        self._feat_rng = np.random.RandomState(int(p["feature_fraction_seed"]))
        self._row_mask = None
        self._drop_rng = np.random.RandomState(int(p["drop_seed"]))
        if p["boosting"] not in ("gbdt", "gbrt", "dart", "goss", "rf",
                                 "random_forest"):
            raise ValueError(f"unknown boosting type {p['boosting']!r}")
        if p["boosting"] in ("rf", "random_forest"):
            p["boosting"] = "rf"
            if gp_model is not None:
                raise ValueError("boosting='rf' cannot be combined with a "
                                 "gp_model; use boosting='gbdt'")
            if not (int(p["bagging_freq"]) > 0
                    and 0.0 < float(p["bagging_fraction"]) < 1.0):
                raise ValueError(
                    "boosting='rf' requires bagging_freq > 0 and "
                    "0 < bagging_fraction < 1 (rf.hpp Init)")
        self._rf_grad = None
        self._rf_sum = np.zeros(self.n)
        self._num_init_iteration = 0
        if init_model is not None:
            self._continue_from(init_model)

    # ------------------------------------------------------------------
    def _continue_from(self, init_model):
        """Continued training (gbdt.cpp num_init_iteration_): adopt an
        existing model's trees and init score, and resume boosting from its
        training-data score."""
        if isinstance(init_model, str):
            init_model = Booster(model_file=init_model)
        if self.params["boosting"] == "rf":
            raise ValueError("init_model is not supported with boosting='rf'")
        self.trees = [Tree.from_dict(t.to_dict()) for t in init_model.trees]
        self.init_score = float(init_model.init_score)
        X = np.asarray(self.train_set.data, dtype=np.float64)
        F = np.full(self.n, self.init_score)
        for t in self.trees:
            F = F + t.predict_raw(X)
        self.F = F
        self.current_iteration_ = len(self.trees)
        # DART never drops adopted trees (dart.hpp DroppingTrees iterates
        # over trees [num_init_iteration_, ...) only) — their contributions
        # were computed on the ORIGINAL dataset's bins, not this one's
        self._num_init_iteration = len(self.trees)

    # ------------------------------------------------------------------
    def _gp_total_re_var(self):
        """Total variance of the mean-set random-effects components at the
        GP model's initial covariance parameters (GetTotalVarComps(cov, 0),
        re_model_template.h:1240) — the rand_eff_var argument of the
        closed-form FindInitialIntercept starting values."""
        gp = self.gp_model
        init_cov = getattr(gp.params, "init_cov_pars", None)
        if init_cov is None:
            init_cov = gp._default_init_cov_pars(self.y)
        pars = np.asarray(init_cov, dtype=np.float64)
        nsets_re = getattr(gp._engine, "num_sets_re", 1)
        tot, off = 0.0, 0
        for comp in gp.components:
            if off >= len(pars) / nsets_re:
                break
            tot += float(pars[off])       # first par = marginal variance
            off += comp.num_cov_par
        return max(tot, 1e-10)

    # ------------------------------------------------------------------
    def _find_init_scores_gp(self, c0):
        """Intercept-only ML fit for the non-Gaussian GPBoost init score
        (FindInitialValueBoosting, re_model.cpp:634-690): minimize the
        Laplace marginal NLL over one intercept per fixed-effects set, with
        the covariance/aux parameters FIXED at their initial values
        (OptimLinRegrCoefCovPar with learn_covariance_parameters=false,
        only_intercept_for_GPBoost_algo=true). c0 holds the closed-form
        FindInitialIntercept starting values (re_model_template.h:1248)."""
        from scipy.optimize import minimize
        from ..models.optimize import OptimConfig, _laplace_u0
        gp = self.gp_model
        eng = gp._engine
        init_cov = getattr(gp.params, "init_cov_pars", None)
        if init_cov is None:
            init_cov = gp._default_init_cov_pars(self.y)
        cfg = OptimConfig(**{**gp.params.__dict__,
                             "init_cov_pars": np.asarray(init_cov,
                                                         dtype=np.float64)})
        u = _laplace_u0(eng, self.y, cfg)
        yd = jnp.asarray(gp._likelihood_obj.check_y(self.y))
        K, n = self._nsets, self.n
        state = {"a": eng.zero_mode()}

        def fun(c):
            F = jnp.asarray(np.repeat(np.asarray(c, dtype=np.float64), n))
            nll, _, gF, a = eng.laplace_vag_F(u, yd, F, state["a"])
            state["a"] = a        # warm-start the mode across evaluations
            if not np.isfinite(nll):
                return 1e30, np.zeros(K)
            return float(nll), np.asarray(gF).reshape(K, n).sum(axis=1)

        r = minimize(fun, np.asarray(c0, dtype=np.float64), jac=True,
                     method="L-BFGS-B", options={"maxiter": 50})
        x = r.x if np.all(np.isfinite(r.x)) else np.asarray(c0)
        return [float(v) for v in x]

    # ------------------------------------------------------------------
    def _boost_from_average(self):
        """BoostFromScore / FindInitScoreGP (regression_objective.hpp:239-283).

        boost_from_average=False starts from score 0 (config.h
        boost_from_average; only honored without a gp_model, like the
        reference's objective-level switch)."""
        if self.gp_model is None \
                and not self.params.get("boost_from_average", True):
            return 0.0
        w = self.train_set.weight if self.train_set is not None else None
        if self.gp_model is None and self.objective_name == "quantile":
            return _weighted_percentile(
                self.y, w, float(self.params.get("alpha", 0.9)))
        if self.gp_model is None and self.objective_name == "l1":
            return _weighted_percentile(self.y, w, 0.5)
        if self.gp_model is None and self.objective_name == "mape":
            # weighted median with label weights 1/max(1,|y|) (*w)
            # (regression_objective.hpp:744-751)
            lw = 1.0 / np.maximum(1.0, np.abs(self.y))
            if w is not None:
                lw = lw * w
            return _weighted_percentile(self.y, lw, 0.5)
        if self.gp_model is None and self.objective_name in ("huber", "fair"):
            # inherit RegressionL2loss::BoostFromScore (weighted mean)
            return float(np.average(self.y, weights=w))
        if self.gp_model is None and self.objective_name == "tweedie":
            # RegressionPoissonLoss::BoostFromScore: SafeLog(weighted mean)
            return float(np.log(max(np.average(self.y, weights=w), 1e-35)))
        if self.gp_model is None and self.objective_name == "cross_entropy":
            pbar = float(np.clip(np.mean(self.y), 1e-12, 1 - 1e-12))
            return float(np.log(pbar / (1.0 - pbar)))
        if self.gp_model is None and self.objective_name == "binary_lgb":
            # binary_objective.hpp:140-160 (kEpsilon clip, /sigmoid)
            pavg = float(np.clip(np.average(self.y > 0, weights=w),
                                 1e-15, 1 - 1e-15))
            return float(np.log(pavg / (1.0 - pavg))
                         / float(self.params["sigmoid"]))
        if self.gp_model is None \
                and self.objective_name == "cross_entropy_lambda":
            # xentropy_objective.hpp:244-265: log(exp(havg) - 1)
            havg = float(np.average(self.y, weights=w))
            return float(np.log(max(np.exp(havg) - 1.0, 1e-15)))
        if self.gp_model is None and self.objective_name in (
                "lambdarank", "rank_xendcg"):
            # ranking objectives do not boost from an average score
            # (rank_objective.hpp: BoostFromScore not overridden)
            return 0.0
        if self.gp_model is not None:
            if self.gp_model.likelihood == "gaussian":
                return float(np.mean(self.y))
            lik = self.gp_model._likelihood_obj
            # rand_eff_var = total variance of the MEAN-set random effects
            # at the initial covariance parameters
            # (re_model_template.h:1240 GetTotalVarComps(cov_pars, 0))
            return lik.init_intercept(self.y, self._gp_total_re_var())
        if self._lik is not None:
            return self._lik.init_intercept(self.y, 1.0)
        return float(np.mean(self.y))

    # ------------------------------------------------------------------
    def _gradients(self):
        """(grad, hess) at the current score F."""
        gp = self.gp_model
        w = self.train_set.weight if self.train_set is not None else None
        if gp is None:
            if self.objective_name == "gaussian":
                g, h = self.F - self.y, np.ones(self.n)
            elif self.objective_name == "multiclass":
                # softmax gradients (multiclass_objective.hpp:87-108)
                K = self._nsets
                S = self.F.reshape(K, self.n)
                S = S - S.max(0, keepdims=True)
                P = np.exp(S)
                P /= P.sum(0, keepdims=True)
                onehot = np.zeros((K, self.n))
                onehot[self.y.astype(int), np.arange(self.n)] = 1.0
                factor = K / (K - 1.0)
                g = (P - onehot).reshape(-1)
                h = np.maximum(factor * P * (1.0 - P), 1e-12).reshape(-1)
                if w is not None:
                    g, h = g * np.tile(w, K), h * np.tile(w, K)
                return g, h
            elif self.objective_name == "tobit":
                # censored-Gaussian (Grabit) gradients
                # (regression_objective.hpp:938-960)
                from scipy.stats import norm
                sig = float(self.params.get("sigma", 1.0))
                yl = float(self.params.get("yl", -np.inf))
                yu = float(self.params.get("yu", np.inf))
                diff = (self.y - self.F) / sig
                logpdf = norm.logpdf(diff)
                lower = self.y <= yl
                upper = self.y >= yu
                with np.errstate(divide="ignore"):
                    lcdf_lo = norm.logcdf(diff)
                    lcdf_up = norm.logcdf(-diff)
                r_lo = np.exp(logpdf - lcdf_lo)
                r_up = np.exp(logpdf - lcdf_up)
                g = np.where(lower, r_lo / sig,
                             np.where(upper, -r_up / sig, -diff / sig))
                h = np.where(lower,
                             (r_lo * diff + r_lo ** 2) / sig ** 2,
                             np.where(upper,
                                      (-r_up * diff + r_up ** 2) / sig ** 2,
                                      1.0 / sig ** 2))
                h = np.maximum(h, 1e-12)
            elif self.objective_name == "mean_scale_regression":
                # (regression_objective.hpp:1010-1034 MeanScaleLoss)
                m = self.F[: self.n]
                sv = self.F[self.n:]
                inv_var = np.exp(-sv)
                neg_resid = m - self.y
                g1 = inv_var * neg_resid
                h1 = inv_var
                h2 = inv_var * neg_resid ** 2 / 2.0
                g2 = -h2 + 0.5
                g = np.concatenate([g1, g2])
                h = np.maximum(np.concatenate([h1, h2]), 1e-12)
                if w is not None:
                    g, h = g * np.tile(w, 2), h * np.tile(w, 2)
                return g, h
            elif self.objective_name == "lambdarank":
                from .ranking import lambdarank_gradients
                p = self.params
                g, h = lambdarank_gradients(
                    self.y, self.F, self._query_bounds,
                    sigmoid=float(p["sigmoid"]),
                    norm=bool(p["lambdarank_norm"]),
                    truncation_level=int(p["lambdarank_truncation_level"]),
                    label_gain=self._label_gain)
                h = np.maximum(h, 1e-12)
            elif self.objective_name == "rank_xendcg":
                from .ranking import xendcg_gradients
                g, h = xendcg_gradients(self.y, self.F, self._query_bounds,
                                        seed=int(self.params[
                                            "objective_seed"]))
                h = np.maximum(h, 1e-12)
            elif self.objective_name == "quantile":
                # pinball loss (regression_objective.hpp:601-616)
                alpha = float(self.params.get("alpha", 0.9))
                delta = self.F - self.y
                g = np.where(delta >= 0, 1.0 - alpha, -alpha)
                h = np.ones(self.n)
            elif self.objective_name == "l1":
                # RegressionL1loss (regression_objective.hpp:300-330)
                g = np.sign(self.F - self.y)
                h = np.ones(self.n)
            elif self.objective_name == "huber":
                # RegressionHuberLoss (regression_objective.hpp:414-440)
                alpha = float(self.params.get("alpha", 0.9))
                d = self.F - self.y
                g = np.clip(d, -alpha, alpha)
                h = np.ones(self.n)
            elif self.objective_name == "fair":
                # RegressionFairLoss (regression_objective.hpp:466-482)
                c = float(self.params.get("fair_c", 1.0))
                d = self.F - self.y
                g = c * d / (np.abs(d) + c)
                h = c * c / (np.abs(d) + c) ** 2
            elif self.objective_name == "mape":
                # RegressionMAPELOSS (regression_objective.hpp:724-740):
                # label_weight = 1/max(1,|y|); final sample weight (below)
                # multiplies in, matching the reference's weighted branch
                lw = 1.0 / np.maximum(1.0, np.abs(self.y))
                g = np.sign(self.F - self.y) * lw
                h = np.ones(self.n)
            elif self.objective_name == "tweedie":
                # RegressionTweedieLoss (regression_objective.hpp:840-856)
                rho = float(self.params.get("tweedie_variance_power", 1.5))
                e1 = np.exp((1.0 - rho) * self.F)
                e2 = np.exp((2.0 - rho) * self.F)
                g = -self.y * e1 + e2
                h = np.maximum(-self.y * (1.0 - rho) * e1
                               + (2.0 - rho) * e2, 1e-12)
            elif self.objective_name == "cross_entropy":
                # (xentropy_objective.hpp:84-85)
                z = 1.0 / (1.0 + np.exp(-self.F))
                g = z - self.y
                h = np.maximum(z * (1.0 - z), 1e-12)
            elif self.objective_name == "binary_lgb":
                # (binary_objective.hpp:106-137)
                sig = float(self.params["sigmoid"])
                lab = np.where(self.y > 0, 1.0, -1.0)
                lw = np.where(self.y > 0, self._binary_lw[1],
                              self._binary_lw[0])
                resp = -lab * sig / (1.0 + np.exp(lab * sig * self.F))
                ar = np.abs(resp)
                g = resp * lw
                h = np.maximum(ar * (sig - ar) * lw, 1e-12)
            elif self.objective_name == "cross_entropy_lambda":
                # (xentropy_objective.hpp:192-216); the weighted form has
                # the weight INSIDE the loss, so sample weights must not be
                # re-applied below
                if w is None:
                    z = 1.0 / (1.0 + np.exp(-self.F))
                    return z - self.y, np.maximum(z * (1.0 - z), 1e-12)
                epf = np.exp(self.F)
                hhat = np.log1p(epf)
                z = 1.0 - np.exp(-w * hhat)
                enf = 1.0 / epf
                g = (1.0 - self.y / z) * w / (1.0 + enf)
                c = 1.0 / (1.0 - z)
                d = 1.0 + epf
                a = w * epf / (d * d)
                d2 = c - 1.0
                b = (c / (d2 * d2)) * (1.0 + w * epf - c)
                return g, np.maximum(a * (1.0 + self.y * b), 1e-12)
            else:
                Fd = jnp.asarray(self.F)
                yd = jnp.asarray(self.y)
                g = -np.asarray(self._lik.d1(yd, Fd, self._aux))
                h = np.maximum(-np.asarray(self._lik.d2(yd, Fd, self._aux)),
                               1e-12)
            if w is not None:
                g, h = g * w, h * w
            return g, h

        # covariance parameters are (re-)estimated on the residuals AFTER the
        # latest tree (gbdt.cpp:549 calls Boosting() again at the end of each
        # TrainOneIter) — update() triggers the refit post score-update, so
        # here we only fit when no fit for the current F exists yet
        if self._gp_refit_iter != self.current_iteration_:
            self._refit_gp_cov()
        if gp.likelihood == "gaussian":
            resid = self.F - self.y
            eng = gp._engine
            # grad = Sigma^-1 (F - y) = Psi_tilde^-1 resid / sigma2 on the
            # nugget-scaled parameterization (re_model_template.h:9691
            # CalcYAux divides y_aux by marg_variance) — the 1/sigma2 is what
            # makes small-noise fits converge at the reference's rate
            t = eng.transform_pars(gp._fit_result.cov_pars)
            grad = _psi_tilde_inv_apply(eng, t, resid) / float(t[0])
            return grad, np.ones(self.n)
        else:
            # LaGaBoost: gradient of the Laplace marginal NLL wrt F
            eng = gp._engine
            r = gp._fit_result
            u = np.log(eng.transform_pars(r.cov_pars))
            if eng.num_aux:
                # aux pars are carried on the user scale; the optimizer /
                # engine works on the internal positive scale
                aux_int = eng.likelihood.aux_to_internal(r.aux_pars)
                u = np.concatenate([u, np.log(aux_int)])
            _, _, gF, _ = eng.laplace_vag_F(
                u, jnp.asarray(self.y), jnp.asarray(self.F),
                r.mode_state if r.mode_state is not None else eng.zero_mode())
            return np.asarray(gF), np.ones(len(gF))

    # ------------------------------------------------------------------
    def _refit_gp_cov(self):
        """(Re-)estimate the GP model's covariance (and aux) parameters on
        the residuals / fixed effects of the CURRENT ensemble.

        Called after every score update (gbdt.cpp:549 — Boosting() at the end
        of TrainOneIter re-runs OptimCovPar), so get_cov_pars(), predictions
        and the next round's gradients all see parameters fitted to the
        latest trees. Warm-started: first call is a full fit with the user's
        optimizer settings, later calls run the on-device GD loop from the
        previous optimum (the reference's reuse_learning_rates_gp_model,
        config.h:181)."""
        gp = self.gp_model
        train_cov = self.params["train_gp_model_cov_pars"]
        if gp.likelihood == "gaussian":
            resid = self.F - self.y
            if train_cov:
                from ..models.jit_gd import gd_fit_engine
                if self._gp_init_pars is None:
                    gp.fit(y=resid)   # first round: full fit with defaults
                    self._gp_init_pars = gp._fit_result.cov_pars
                    self._gp_lr = 0.1
                else:
                    lr0 = self._gp_lr \
                        if self.params["reuse_learning_rates_gp_model"] \
                        else 0.1
                    pars, nll, lr, it = gd_fit_engine(
                        gp._engine, self._gp_init_pars, resid,
                        lr0=lr0,
                        max_iter=int(self.params["maxit_gp"]))
                    self._gp_lr = min(max(lr, 1e-8) * 2.0, 0.1)
                    self._gp_init_pars = pars
                    gp._fit_result.cov_pars = pars
                    gp._fit_result.neg_log_likelihood = nll
            elif not gp.model_has_been_fitted:
                gp.fit(y=resid)
                self._gp_init_pars = gp._fit_result.cov_pars
        else:
            if train_cov or not gp.model_has_been_fitted:
                eng = gp._engine
                fast = (gp.model_has_been_fitted and gp.X is None
                        and getattr(eng, "num_sets_fe", 1) == 1
                        and hasattr(eng, "_nll_raw"))
                if fast:
                    # warm-started, fully on-device GD refit: ONE device
                    # call per boosting round (the non-Gaussian analogue of
                    # the Gaussian gd_fit_engine path above)
                    from ..models.jit_gd import gd_fit_laplace_engine
                    r = gp._fit_result
                    est_aux = bool(getattr(gp.params, "estimate_aux_pars",
                                           True))
                    a0 = r.mode_state if r.mode_state is not None \
                        else eng.zero_mode()
                    # warm-start the PARAMETERS and mode only; the learning
                    # rate restarts at its default — carrying the
                    # Armijo-shrunk lr across rounds collapses the step size
                    # and stalls the fit (backtracking inside the single
                    # device call re-finds the right lr cheaply)
                    lr0 = float(gp.params.lr_cov) \
                        if getattr(gp.params, "lr_cov", -1) > 0 else 0.1
                    pars, aux, nll, lr, it, a = gd_fit_laplace_engine(
                        eng, r.cov_pars,
                        r.aux_pars if eng.num_aux else None,
                        gp.y, self.F, a0, lr0=lr0,
                        max_iter=int(self.params["maxit_gp"]),
                        est_aux=est_aux)
                    r.cov_pars = pars
                    if aux is not None:
                        r.aux_pars = aux
                    r.neg_log_likelihood = nll
                    r.mode_state = a
                    self._gp_init_pars = pars
                else:
                    # full per-iteration OptimCovPar with the GP model's OWN
                    # optimizer settings (regression_objective.hpp:180-182:
                    # GetGradients runs OptimCovPar to convergence each
                    # iteration; maxit_gp only bounds the warm-started
                    # fast/fused refit paths). Honor the user's configured
                    # init_cov_pars on the first fit; warm-start later fits
                    # at the previous optimum.
                    fp = {}
                    if self._gp_init_pars is not None:
                        fp["init_cov_pars"] = self._gp_init_pars
                    gp.fit(y=self.y, offset=self.F, params=fp)
                    self._gp_init_pars = gp._fit_result.cov_pars
        self._gp_refit_iter = self.current_iteration_

    # ------------------------------------------------------------------
    def _sampling_masks(self):
        """(row_mask, feat_mask) for this iteration, or (None, None).

        Bagging (gbdt.cpp Bagging): every bagging_freq iterations resample a
        bagging_fraction subset; trees are fit on the subset but ALL rows get
        score updates. feature_fraction: fresh column subset per tree."""
        p = self.params
        row_mask = None
        bf = float(p["bagging_fraction"])
        freq = int(p["bagging_freq"])
        if bf < 1.0 and freq > 0:
            if self._row_mask is None or self.current_iteration_ % freq == 0:
                k = max(1, int(round(bf * self.n)))
                sel = self._bag_rng.choice(self.n, size=k, replace=False)
                m = np.zeros(self.n, dtype=np.float32)
                m[sel] = 1.0
                self._row_mask = m
            row_mask = self._row_mask
        feat_mask = None
        ff = float(p["feature_fraction"])
        pfeat = self.train_set.num_features
        if ff < 1.0 and pfeat > 1:
            k = max(1, int(round(ff * pfeat)))
            sel = self._feat_rng.choice(pfeat, size=k, replace=False)
            feat_mask = np.zeros(pfeat, dtype=np.float32)
            feat_mask[sel] = 1.0
        return row_mask, feat_mask

    def _dart_drop(self):
        """DART dropout (dart.hpp:97 DroppingTrees, uniform mode): pick a
        subset of existing trees, remove their contribution from the training
        score; returns (indices, cached per-row contributions)."""
        p = self.params
        if self._drop_rng.rand() < float(p["skip_drop"]):
            return [], []
        drop_rate = float(p["drop_rate"])
        max_drop = int(p["max_drop"])
        n_droppable = len(self.trees) - self._num_init_iteration
        if max_drop > 0:
            drop_rate = min(drop_rate, max_drop / max(n_droppable, 1.0))
        drop_idx = [i for i in range(self._num_init_iteration, len(self.trees))
                    if self._drop_rng.rand() < drop_rate]
        if max_drop > 0:
            drop_idx = drop_idx[:max_drop]
        contribs = []
        bins = self.train_set.bins
        for i in drop_idx:
            c = self.trees[i].predict_binned(bins)
            self.F = self.F - c
            contribs.append(c)
        return drop_idx, contribs

    def _goss_mask(self, grad, hess):
        """Gradient-based one-side sampling (goss.hpp): keep the top_rate
        fraction by |grad*hess|, sample other_rate of the rest and amplify
        them by (1-a)/b. Warm-up: plain GBDT for the first 1/lr iterations."""
        p = self.params
        if self.current_iteration_ < int(1.0 / float(p["learning_rate"])):
            return None
        a, b = float(p["top_rate"]), float(p["other_rate"])
        n = self.n
        top_k = max(1, int(round(a * n)))
        rest_k = max(1, int(round(b * n)))
        order = np.argsort(-np.abs(grad * hess))
        mask = np.zeros(n, dtype=np.float32)
        mask[order[:top_k]] = 1.0
        rest = order[top_k:]
        if len(rest):
            sel = self._bag_rng.choice(len(rest), size=min(rest_k, len(rest)),
                                       replace=False)
            mask[rest[sel]] = (1.0 - a) / b
        return mask

    def update(self, train_set=None, fobj=None):
        """One boosting iteration (gbdt.cpp:412 TrainOneIter; dart.hpp for
        boosting='dart', goss.hpp for boosting='goss')."""
        from ..utils.timer import step_annotation
        with step_annotation("boosting_round",
                             step_num=self.current_iteration_):
            return self._update_inner(train_set=train_set, fobj=fobj)

    def _update_inner(self, train_set=None, fobj=None):
        if self._nsets > 1:
            # one tree per predictor block and iteration: two-predictor
            # likelihoods or multiclass (gbdt.cpp TrainOneIter over
            # num_class_ models)
            grad, hess = self._gradients()
            row_mask, feat_mask = self._sampling_masks()
            lr = float(self.params["learning_rate"])
            for k in range(self._nsets):
                gk = grad[k * self.n:(k + 1) * self.n]
                hk = hess[k * self.n:(k + 1) * self.n]
                tree, slot_of_row, leaf_value_of_slot = self.learner.train(
                    gk, hk, row_mask=row_mask, feat_mask=feat_mask,
                    cegb_used=self._cegb_used,
                    extra_seed=int(self.params["extra_seed"])
                    + 131 * len(self.trees))
                self._note_cegb_usage(tree)
                tree.shrinkage(lr)
                self.F[k * self.n:(k + 1) * self.n] += \
                    lr * leaf_value_of_slot[slot_of_row]
                self.trees.append(tree)
            self.current_iteration_ += 1
            if self.gp_model is not None:
                self._refit_gp_cov()   # gbdt.cpp:549 end-of-iter Boosting()
            return False
        boosting = self.params["boosting"]
        if self.params["use_nesterov_acc"]:
            # momentum step on the training score BEFORE the gradients
            # (gbdt.cpp:421 ApplyMomentumStep; nesterov_boosting.h:19)
            if boosting != "gbdt":
                raise ValueError("use_nesterov_acc requires boosting='gbdt'")
            if self._F_lag1 is None:
                self._F_lag1 = self.F.copy()
            mu = _nesterov_schedule(
                self.current_iteration_,
                int(self.params["momentum_schedule_version"]),
                float(self.params["nesterov_acc_rate"]),
                int(self.params["momentum_offset"]))
            F_new = (1.0 + mu) * self.F - mu * self._F_lag1
            self._F_lag1, self.F = self.F, F_new
            if self.gp_model is not None:
                # with momentum, cov pars are re-optimized on the
                # post-momentum residuals (gbdt.cpp:428 condition iii)
                self._refit_gp_cov()
        drop_idx, drop_contrib = [], []
        if boosting == "dart" and self.trees:
            drop_idx, drop_contrib = self._dart_drop()
        if boosting == "rf":
            # random forest (rf.hpp): gradients are computed ONCE at the
            # constant init score; every tree fits them on a fresh bag and
            # the ensemble output is the AVERAGE of the trees
            if self._rf_grad is None:
                F_save, self.F = self.F, np.full(self.n, self.init_score)
                self._rf_grad = self._gradients()
                self.F = F_save
            grad, hess = self._rf_grad
        else:
            grad, hess = self._gradients()
        row_mask, feat_mask = self._sampling_masks()
        if boosting == "goss":
            gm = self._goss_mask(grad, hess)
            if gm is not None:
                row_mask = gm
        tree, slot_of_row, leaf_value_of_slot = self.learner.train(
            grad, hess, row_mask=row_mask, feat_mask=feat_mask,
            cegb_used=self._cegb_used,
            extra_seed=int(self.params["extra_seed"])
            + 131 * len(self.trees))
        self._note_cegb_usage(tree)
        if self.params.get("linear_tree"):
            _fit_linear_leaves(tree, self.train_set.data, grad, hess,
                               slot_of_row,
                               float(self.params.get("linear_lambda", 0.0))
                               + float(self.params["lambda_l2"]))

        gp = self.gp_model
        if (gp is None and not self.params.get("linear_tree")
                and self.objective_name in ("l1", "quantile", "mape")):
            # RenewTreeOutput (serial_tree_learner.cpp:685 + the per-
            # objective percentile formulas regression_objective.hpp:351/
            # :647/:755): replace each leaf output with the (weighted)
            # residual percentile over the leaf's bagged rows; shrinkage
            # applies afterwards, like the reference (gbdt.cpp:467-494)
            resid = self.y - self.F
            w = self.train_set.weight
            alpha = float(self.params.get("alpha", 0.9)) \
                if self.objective_name == "quantile" else 0.5
            if self.objective_name == "mape":
                lw = 1.0 / np.maximum(1.0, np.abs(self.y))
                w = lw if w is None else lw * w
            sel = np.arange(self.n) if row_mask is None \
                else np.flatnonzero(row_mask)
            for s_ in np.unique(slot_of_row[sel]):
                rows = sel[slot_of_row[sel] == s_]
                v_ = _weighted_percentile(
                    resid[rows], None if w is None else w[rows], alpha)
                leaf_value_of_slot[int(s_)] = v_
                node = tree.slot_to_node.get(int(s_))
                if node is not None:
                    tree.leaf_value[node] = v_
        if gp is not None and gp.likelihood == "gaussian" and (
                self.params["leaves_newton_update"]
                or self.params["line_search_step_length"]):
            eng = gp._engine
            t = eng.transform_pars(gp._fit_result.cov_pars)
            resid = self.y - self.F
            if self.params["leaves_newton_update"]:
                # joint GLS re-solve of leaf values given the found structure:
                # a* = (H' Psi~^-1 H)^-1 H' Psi~^-1 (y - F)
                # (re_model_template.h:4947 NewtonUpdateLeafValues)
                slots = np.unique(slot_of_row)
                H = (slot_of_row[:, None] == slots[None, :]).astype(np.float64)
                PiH = _psi_tilde_inv_mat(eng, t, H)
                HtPiH = H.T @ PiH
                vals = np.linalg.solve(
                    HtPiH + 1e-12 * np.eye(len(slots)), PiH.T @ resid)
                for s_, v_ in zip(slots, vals):
                    leaf_value_of_slot[int(s_)] = v_
                    node = tree.slot_to_node.get(int(s_))
                    if node is not None:
                        tree.leaf_value[node] = v_
            if self.params["line_search_step_length"]:
                # optimal step length for the Gaussian GPBoost algorithm: the
                # 1-D GLS optimum alpha = h' Psi~^-1 r / h' Psi~^-1 h (the
                # reference finds the same optimum iteratively via
                # OptimLinRegrCoefCovPar with the tree output as covariate,
                # re_model.cpp:697 LineSearchLearningRate)
                h = leaf_value_of_slot[slot_of_row]
                Pih = _psi_tilde_inv_apply(eng, t, h)
                denom = float(h @ Pih)
                if denom > 1e-300:
                    alpha = min(max(float(resid @ Pih) / denom, 0.0), 10.0)
                    tree.shrinkage(alpha)
                    leaf_value_of_slot = leaf_value_of_slot * alpha

        if boosting == "rf":
            self._rf_sum = self._rf_sum + leaf_value_of_slot[slot_of_row]
            self.trees.append(tree)
            self.current_iteration_ = len(self.trees)
            self.F = self.init_score + self._rf_sum / len(self.trees)
            return False
        lr = float(self.params["learning_rate"])
        if boosting == "dart":
            # dart.hpp:137: new tree weight lr/(k+1)
            lr = lr / (1.0 + len(drop_idx))
        tree.shrinkage(lr)
        if tree.leaf_linear:
            self.F = self.F + tree.predict_raw(self.train_set.data)
        else:
            self.F = self.F + lr * leaf_value_of_slot[slot_of_row]
        if drop_idx:
            # dart.hpp:158 Normalize: dropped trees keep k/(k+1) of their
            # weight; training score gets the rescaled contribution back
            k = float(len(drop_idx))
            for i, contrib in zip(drop_idx, drop_contrib):
                self.trees[i].shrinkage(k / (k + 1.0))
                self.F = self.F + contrib * (k / (k + 1.0))
        self.trees.append(tree)
        self.current_iteration_ = len(self.trees)
        if self.gp_model is not None:
            # refit cov pars on the post-tree residuals so get_cov_pars(),
            # predictions and next round's gradients reflect the current
            # ensemble (gbdt.cpp:549 end-of-iteration Boosting() call)
            self._refit_gp_cov()
        return False

    def _note_cegb_usage(self, tree):
        """Record the model-wide feature usage for the CEGB coupled
        penalty (cost_effective_gradient_boosting.hpp:93-103 UpdateUsed)."""
        if self._cegb_used is None:
            return
        for i in range(tree.num_nodes):
            if not tree.is_leaf[i]:
                self._cegb_used[int(tree.split_feature[i])] = 1.0

    # ------------------------------------------------------------------
    def can_train_scanned(self):
        """True when training can run through the fused multi-round scan
        (update_many): plain single-set gbdt with an elementwise objective
        and no per-round host-side state (bagging/GOSS RNG, Nesterov lag,
        linear leaves, monotone post-pass, GP refit, device mesh)."""
        p = self.params
        return (self.gp_model is None and self._nsets == 1
                and p["boosting"] == "gbdt"
                and not p["use_nesterov_acc"]
                and not p.get("linear_tree")
                and not (float(p["bagging_fraction"]) < 1.0
                         and int(p["bagging_freq"]) > 0)
                and float(p["feature_fraction"]) >= 1.0
                and self.learner.mesh is None
                and self.learner.cegb is None
                and not self.learner.extra_trees
                and self.learner.forced is None
                and self.learner.inter_groups is None
                and not np.any(self.learner.monotone != 0)
                and (self.objective_name in ("gaussian", "cross_entropy",
                                             "huber", "fair", "tweedie",
                                             "binary_lgb",
                                             "cross_entropy_lambda")
                     or self._lik is not None))
        # quantile / l1 / mape are excluded: they renew leaf outputs to
        # residual percentiles after every tree (RenewTreeOutput), a
        # sorting pass the fused scan does not reproduce

    def can_train_scanned_gpboost(self):
        """True when the Gaussian GPBoost algorithm can run through the
        fused per-round scan (update_many_gpboost): tree + score update +
        on-device GD covariance refit in one dispatch per block of rounds."""
        gp = self.gp_model
        if gp is None or gp.likelihood != "gaussian":
            return False
        p = self.params
        return (self._nsets == 1 and p["boosting"] == "gbdt"
                and not p["use_nesterov_acc"]
                and not p.get("linear_tree")
                and not p["leaves_newton_update"]
                and not p["line_search_step_length"]
                and p["train_gp_model_cov_pars"]
                and not (float(p["bagging_fraction"]) < 1.0
                         and int(p["bagging_freq"]) > 0)
                and float(p["feature_fraction"]) >= 1.0
                and self.learner.mesh is None
                and self.learner.cegb is None
                and not self.learner.extra_trees
                and self.learner.forced is None
                and self.learner.inter_groups is None
                and not np.any(self.learner.monotone != 0)
                and gp.X is None
                and hasattr(gp._engine, "nll_parts_raw")
                and _psi_inv_jax_builder(gp._engine) is not None)

    def can_train_scanned_multi(self):
        """True when the K-trees-per-iteration objectives (multiclass /
        mean_scale_regression) can run through the fused scan."""
        p = self.params
        return (self.gp_model is None and self._nsets > 1
                and self.objective_name in ("multiclass",
                                            "mean_scale_regression")
                and p["boosting"] == "gbdt"
                and not p["use_nesterov_acc"]
                and not p.get("linear_tree")
                and not (float(p["bagging_fraction"]) < 1.0
                         and int(p["bagging_freq"]) > 0)
                and float(p["feature_fraction"]) >= 1.0
                and self.learner.mesh is None
                and self.learner.cegb is None
                and not self.learner.extra_trees
                and self.learner.forced is None
                and self.learner.inter_groups is None
                and not np.any(self.learner.monotone != 0))

    def update_many_multi(self, num_rounds, chunk=25):
        """Fused multi-set training (see _train_rounds_scanned_multi)."""
        le = self.learner
        n, n_pad, L = self.n, le.n_pad, le.num_leaves
        K = self._nsets
        lr = float(self.params["learning_rate"])
        grow_cfg = (le.num_bins, L, le.max_depth, le.use_pallas,
                    le.row_block, le.feat_chunk, le.path_smooth,
                    le.cat_params, le.nan_bin_t)
        fm = np.zeros(le.p_pad, dtype=np.float32)
        fm[:le.p] = 1.0
        w = self.train_set.weight
        w_d = None if w is None else jnp.asarray(
            np.asarray(w, dtype=np.float64))
        y_d = jnp.asarray(self.y)
        F = jnp.asarray(self.F)
        done = 0
        while done < num_rounds:
            c = int(min(chunk, num_rounds - done))
            F, outs = _train_rounds_scanned_multi(
                self.objective_name, (), K, grow_cfg, c,
                le.bins_pos, y_d, w_d, F, jnp.float64(lr),
                jnp.float32(le.lambda_l2),
                jnp.float32(le.min_data_in_leaf),
                jnp.float32(le.min_sum_hessian), jnp.float32(le.min_gain),
                jnp.asarray(fm), jnp.float32(le.lambda_l1),
                jnp.asarray(le.monotone), jnp.asarray(le.cat_mask))
            rec, lv, rgain, rcat, cs = [np.asarray(o) for o in
                                        jax.device_get(outs)]
            for r in range(c):
                for k in range(K):
                    cnt = np.concatenate([cs[r, k], np.zeros(8)])
                    tree, _ = le.build_tree(rec[r, k], lv[r, k],
                                            rgain[r, k], rcat[r, k], cnt)
                    tree.shrinkage(lr)
                    self.trees.append(tree)
            done += c
        self.F = np.asarray(F)
        self.current_iteration_ = len(self.trees) // K

    def can_train_scanned_lagaboost(self):
        """True when the non-Gaussian LaGaBoost algorithm can run through
        the fused per-round scan (update_many_lagaboost)."""
        gp = self.gp_model
        if gp is None or gp.likelihood == "gaussian":
            return False
        p = self.params
        eng = gp._engine
        return (self._nsets == 1 and p["boosting"] == "gbdt"
                and not p["use_nesterov_acc"]
                and not p.get("linear_tree")
                and p["train_gp_model_cov_pars"]
                and not (float(p["bagging_fraction"]) < 1.0
                         and int(p["bagging_freq"]) > 0)
                and float(p["feature_fraction"]) >= 1.0
                and self.learner.mesh is None
                and self.learner.cegb is None
                and not self.learner.extra_trees
                and self.learner.forced is None
                and self.learner.inter_groups is None
                and not np.any(self.learner.monotone != 0)
                and gp.X is None
                and getattr(eng, "num_sets_fe", 1) == 1
                and hasattr(eng, "_nll_raw") and hasattr(eng, "_vag_F"))

    def update_many_lagaboost(self, num_rounds, chunk=25):
        """Fused LaGaBoost training (non-Gaussian): the first covariance
        estimate is a host fit (the reference's first OptimCovPar with
        fixed effects), then blocks of `chunk` rounds run as single device
        dispatches via _make_fused_lagaboost_scan."""
        gp = self.gp_model
        eng = gp._engine
        if not gp.model_has_been_fitted:
            gp.fit(y=self.y, offset=self.F,
                   params={"maxit": int(self.params["maxit_gp"])})
        r = gp._fit_result
        if num_rounds <= 0:
            return
        le = self.learner
        n, n_pad, L = self.n, le.n_pad, le.num_leaves
        lr_tree = float(self.params["learning_rate"])
        grow_cfg = (le.num_bins, L, le.max_depth, le.use_pallas,
                    le.row_block, le.feat_chunk, le.path_smooth,
                    le.cat_params, le.nan_bin_t)
        maxit_gp = int(self.params["maxit_gp"])
        est_aux = bool(getattr(gp.params, "estimate_aux_pars", True)) \
            and eng.num_aux > 0
        lr0 = float(gp.params.lr_cov) \
            if getattr(gp.params, "lr_cov", -1) > 0 else 0.1
        fm = np.zeros(le.p_pad, dtype=np.float32)
        fm[:le.p] = 1.0
        fm = jnp.asarray(fm)
        mono = jnp.asarray(le.monotone)
        catm = jnp.asarray(le.cat_mask)
        yp = jnp.asarray(np.asarray(self.y, dtype=np.float64), eng.dtype)
        if hasattr(eng, "_permute"):
            yp = eng._permute(yp)

        u = np.log(eng.transform_pars(np.asarray(r.cov_pars,
                                                 dtype=np.float64)))
        if eng.num_aux:
            aux_int = eng.likelihood.aux_to_internal(
                np.asarray(r.aux_pars, dtype=np.float64))
            u = np.concatenate([u, np.log(aux_int)])
        a0 = r.mode_state if r.mode_state is not None else eng.zero_mode()
        carry = (jnp.asarray(self.F), jnp.asarray(u, eng.dtype), a0)

        cache = getattr(eng, "_fused_boost_cache", None)
        if cache is None:
            cache = eng._fused_boost_cache = {}
        done = 0
        nll_last = None
        while done < num_rounds:
            c = int(min(chunk, num_rounds - done))
            key = ("lagaboost", c, grow_cfg, maxit_gp, lr0, est_aux)
            if key not in cache:
                cache[key] = _make_fused_lagaboost_scan(
                    eng, c, grow_cfg, maxit_gp, lr0, est_aux)
            carry, outs = cache[key](
                carry, yp, le.bins_pos, fm, mono, catm,
                jnp.float64(lr_tree), jnp.float32(le.lambda_l2),
                jnp.float32(le.min_data_in_leaf),
                jnp.float32(le.min_sum_hessian), jnp.float32(le.min_gain),
                jnp.float32(le.lambda_l1))
            rec, lv, rgain, rcat, cs, nlls = [np.asarray(o) for o in
                                              jax.device_get(outs)]
            for ri in range(c):
                cnt = np.concatenate([cs[ri], np.zeros(8)])
                tree, _ = le.build_tree(rec[ri], lv[ri], rgain[ri],
                                        rcat[ri], cnt)
                tree.shrinkage(lr_tree)
                self.trees.append(tree)
            nll_last = float(nlls[-1])
            done += c
        F, u_f, a_f = carry
        self.F = np.asarray(F)
        self.current_iteration_ = len(self.trees)
        u_f = np.asarray(jax.device_get(u_f), dtype=np.float64)
        pars = eng.back_transform_pars(np.exp(u_f[:eng.num_theta]))
        r.cov_pars = pars
        if eng.num_aux:
            r.aux_pars = eng.likelihood.aux_from_internal(
                np.exp(u_f[eng.num_theta:]))
        r.neg_log_likelihood = nll_last
        r.mode_state = a_f
        self._gp_init_pars = pars
        self._gp_refit_iter = self.current_iteration_

    def update_many_gpboost(self, num_rounds, chunk=25):
        """Fused GPBoost-algorithm training (Gaussian): the first covariance
        estimate is a full host fit (the reference's first OptimCovPar,
        regression_objective.hpp:165), then ALL rounds run as blocks of
        `chunk` single-dispatch scans via _make_fused_gpboost_scan — each
        round = gradient, tree, score update, warm-started GD refit."""
        gp = self.gp_model
        if self._gp_init_pars is None:
            gp.fit(y=self.F - self.y)
            self._gp_init_pars = gp._fit_result.cov_pars
            self._gp_lr = 0.1
        if num_rounds <= 0:
            return
        eng = gp._engine
        le = self.learner
        n, n_pad, L = self.n, le.n_pad, le.num_leaves
        lr_tree = float(self.params["learning_rate"])
        grow_cfg = (le.num_bins, L, le.max_depth, le.use_pallas,
                    le.row_block, le.feat_chunk, le.path_smooth,
                    le.cat_params, le.nan_bin_t)
        maxit_gp = int(self.params["maxit_gp"])
        reuse = bool(self.params["reuse_learning_rates_gp_model"])
        fm = np.zeros(le.p_pad, dtype=np.float32)
        fm[:le.p] = 1.0
        fm = jnp.asarray(fm)
        mono = jnp.asarray(le.monotone)
        catm = jnp.asarray(le.cat_mask)
        y_d = jnp.asarray(self.y)

        cache = getattr(eng, "_fused_boost_cache", None)
        if cache is None:
            cache = eng._fused_boost_cache = {}
        t0 = eng.transform_pars(np.asarray(self._gp_init_pars,
                                           dtype=np.float64))
        carry = (jnp.asarray(self.F), jnp.asarray(np.log(t0)),
                 jnp.asarray(float(getattr(self, "_gp_lr", 0.1))))
        done = 0
        nll_last = None
        while done < num_rounds:
            c = int(min(chunk, num_rounds - done))
            key = (c, grow_cfg, maxit_gp, reuse)
            if key not in cache:
                cache[key] = _make_fused_gpboost_scan(eng, c, grow_cfg,
                                                      maxit_gp, reuse)
            carry, outs = cache[key](
                carry, y_d, le.bins_pos, fm, mono, catm,
                jnp.float64(lr_tree), jnp.float32(le.lambda_l2),
                jnp.float32(le.min_data_in_leaf),
                jnp.float32(le.min_sum_hessian), jnp.float32(le.min_gain),
                jnp.float32(le.lambda_l1))
            rec, lv, rgain, rcat, cs, nlls = [np.asarray(o) for o in
                                              jax.device_get(outs)]
            for r in range(c):
                cnt = np.concatenate([cs[r], np.zeros(8)])
                tree, _ = le.build_tree(rec[r], lv[r], rgain[r], rcat[r],
                                        cnt)
                tree.shrinkage(lr_tree)
                self.trees.append(tree)
            nll_last = float(nlls[-1])
            done += c
        F, u, lr_gp = carry
        self.F = np.asarray(F)
        self.current_iteration_ = len(self.trees)
        pars = eng.back_transform_pars(
            np.exp(np.asarray(jax.device_get(u), dtype=np.float64)))
        gp._fit_result.cov_pars = pars
        gp._fit_result.neg_log_likelihood = nll_last
        self._gp_init_pars = pars
        self._gp_lr = float(jax.device_get(lr_gp))
        self._gp_refit_iter = self.current_iteration_

    def update_many(self, num_rounds, chunk=50):
        """Run `num_rounds` boosting iterations through the fused on-device
        scan (_train_rounds_scanned) in blocks of `chunk`, then rebuild the
        Tree objects on the host from the stacked split records. Semantics
        match repeated update() for the eligible configurations (see
        can_train_scanned); tests pin the equivalence."""
        le = self.learner
        n, n_pad, L = self.n, le.n_pad, le.num_leaves
        lr = float(self.params["learning_rate"])
        obj = self.objective_name
        if obj in ("quantile", "huber"):
            obj_args = (float(self.params.get("alpha", 0.9)),)
        elif obj == "binary_lgb":
            obj_args = (float(self.params["sigmoid"]),) \
                + tuple(self._binary_lw)
        elif obj == "fair":
            obj_args = (float(self.params.get("fair_c", 1.0)),)
        elif obj == "tweedie":
            obj_args = (float(self.params.get("tweedie_variance_power",
                                              1.5)),)
        else:
            obj_args = ()
        grow_cfg = (le.num_bins, L, le.max_depth, le.use_pallas,
                    le.row_block, le.feat_chunk, le.path_smooth,
                    le.cat_params, le.nan_bin_t)
        fm = np.zeros(le.p_pad, dtype=np.float32)
        fm[:le.p] = 1.0
        w = self.train_set.weight
        y_d = jnp.asarray(self.y)
        w_d = None if w is None else jnp.asarray(
            np.asarray(w, dtype=np.float64))
        aux = self._aux if getattr(self, "_lik", None) is not None else None
        F = jnp.asarray(self.F)
        done = 0
        while done < num_rounds:
            c = int(min(chunk, num_rounds - done))
            F, outs = _train_rounds_scanned(
                obj, obj_args, grow_cfg, c,
                le.bins_pos, y_d, w_d, aux, F,
                jnp.float64(lr), jnp.float32(le.lambda_l2),
                jnp.float32(le.min_data_in_leaf),
                jnp.float32(le.min_sum_hessian), jnp.float32(le.min_gain),
                jnp.asarray(fm), jnp.float32(le.lambda_l1),
                jnp.asarray(le.monotone), jnp.asarray(le.cat_mask))
            rec, lv, rgain, rcat, cs = [np.asarray(o) for o in
                                        jax.device_get(outs)]
            for r in range(c):
                cnt = np.concatenate([cs[r], np.zeros(8)])
                tree, _ = le.build_tree(rec[r], lv[r], rgain[r], rcat[r],
                                        cnt)
                tree.shrinkage(lr)
                self.trees.append(tree)
            done += c
        self.F = np.asarray(F)
        self.current_iteration_ = len(self.trees)

    # ------------------------------------------------------------------
    def _shap_matrix(self, used, X):
        """SHAP contribution matrix (n, p+1) for one tree set (TreeSHAP via
        the native kernel; EFB bundle columns decoded back to the row's
        active member feature)."""
        from ..native import tree_shap
        bundles = getattr(self.train_set, "bundles", None)
        if bundles:
            # EFB: SHAP runs in learner (bundled-bin) space — the trees'
            # decisions live there — then each bundle column's attribution
            # is decoded to the row's ACTIVE member (bundle members are
            # mutually exclusive, so the bundled value IS that feature's
            # value; all-zero rows split it equally)
            Xl = self.train_set.encode_raw(X).astype(np.float64)
            phi_l = np.zeros((len(X), Xl.shape[1] + 1))
            import types
            for tree in used:
                n_nodes = tree.num_nodes
                shadow = types.SimpleNamespace(
                    num_nodes=n_nodes,
                    split_feature=tree.split_feature,
                    threshold_real=tree.threshold_bin[:n_nodes].astype(
                        np.float64),
                    left=tree.left, right=tree.right,
                    is_leaf=tree.is_leaf, leaf_value=tree.leaf_value,
                    cover=tree.cover, default_left=tree.default_left)
                tree_shap(shadow, Xl, phi_l)
            phi = np.zeros((len(X), X.shape[1] + 1))
            kept = self.train_set.kept_features
            for lj, j in enumerate(kept):
                phi[:, j] = phi_l[:, lj]
            for bi, b in enumerate(bundles):
                col = phi_l[:, len(kept) + bi]
                members = np.asarray(b.feature_ids)
                active = np.zeros((len(X), len(members)), dtype=bool)
                for mi, f in enumerate(members):
                    v = X[:, f]
                    active[:, mi] = np.isfinite(v) & (v != 0.0)
                any_active = active.any(axis=1)
                first = np.argmax(active, axis=1)
                for mi, f in enumerate(members):
                    hit = any_active & (first == mi)
                    phi[hit, f] += col[hit]
                    phi[~any_active, f] += col[~any_active] / len(members)
            phi[:, -1] = phi_l[:, -1]
        else:
            phi = np.zeros((len(X), X.shape[1] + 1))
            for tree in used:
                tree_shap(tree, X, phi)
        if self.params.get("boosting") == "rf" and used:
            phi /= len(used)
        return phi

    def predict(self, data, start_iteration=0, num_iteration=None,
                raw_score=False, pred_latent=False, pred_contrib=False,
                group_data_pred=None, group_rand_coef_data_pred=None,
                gp_coords_pred=None, gp_rand_coef_data_pred=None,
                cluster_ids_pred=None, predict_var=False,
                predict_cov_mat=False, ignore_gp_model=False,
                pred_early_stop=False, pred_early_stop_freq=10,
                pred_early_stop_margin=10.0, **kwargs):
        """Combined fixed-effect + random-effect prediction
        (basic.py:3455/3628-3770).

        pred_early_stop: per-row prediction early stopping for binary and
        multiclass models (src/LightGBM/prediction_early_stop.cpp): every
        `pred_early_stop_freq` trees, rows whose decision margin (|raw score|
        for binary, top1-top2 for multiclass) already exceeds
        `pred_early_stop_margin` stop accumulating further trees.

        pred_contrib=True returns exact TreeSHAP feature attributions of the
        tree ensemble, shape (n, p+1) with the expected value (bias) in the
        last column; rows sum to the raw fixed-effect prediction
        (basic.py predict(..., pred_contrib); Lundberg et al. 2018)."""
        if hasattr(data, "dtypes") and hasattr(data, "columns"):
            from .dataset import _data_from_pandas
            cats = getattr(self.train_set, "pandas_categorical", None) \
                if getattr(self, "train_set", None) is not None else None
            cats = cats or self._pandas_categorical
            data, _, _, _ = _data_from_pandas(data, pandas_categorical=cats)
        X = np.asarray(data, dtype=np.float64)
        if X.ndim == 1:
            X = X[:, None]
        # missing-type conversions must match training-time binning
        # (io/bin.cpp FindBin): use_missing=false treats NaN as zero;
        # zero_as_missing routes zeros like NaN (learned default direction)
        if not self.params.get("use_missing", True):
            X = np.nan_to_num(X, nan=0.0)
        elif self.params.get("zero_as_missing", False):
            X = np.where(X == 0.0, np.nan, X)
        needed = self._min_num_features()
        if X.shape[1] < needed:
            raise ValueError(
                f"data has {X.shape[1]} feature(s) but the model's trees "
                f"split on feature index {needed - 1}; pass a 2-D array "
                f"with at least {needed} columns")
        if kwargs.pop("pred_leaf", False):
            # predicted leaf index per tree (basic.py predict pred_leaf;
            # shape (n, num_trees_used), multiclass trees interleaved like
            # the reference)
            K = max(1, self._nsets)
            nit = num_iteration if num_iteration else len(self.trees) // K
            used = self.trees[K * start_iteration:
                              K * (start_iteration + nit)]
            return np.stack([t.leaf_index_raw(X) for t in used],
                            axis=1).astype(np.int32)
        if pred_contrib:
            from ..native import tree_shap
            K = max(1, self._nsets)
            nit = num_iteration if num_iteration else len(self.trees) // K
            used_all = self.trees[K * start_iteration:
                                  K * (start_iteration + nit)]
            if K > 1:
                # multiclass / two-predictor: per-class contributions over
                # the interleaved trees, LightGBM layout (n, K*(p+1)); the
                # init scores belong to iteration 0 (slices over
                # start_iteration sum to the full contributions,
                # test_Predictor.R:48)
                mats = [self._shap_matrix([t for i, t in
                                           enumerate(used_all)
                                           if i % K == k], X)
                        for k in range(K)]
                if start_iteration == 0:
                    for k in range(K):
                        mats[k][:, -1] += float(self._init_scores[k])
                return np.concatenate(mats, axis=1)
            phi = self._shap_matrix(used_all, X)
            if start_iteration == 0:
                phi[:, -1] += self.init_score
            return phi
        if self._nsets > 1 and self.gp_model is None \
                and self.objective_name == "mean_scale_regression":
            used = self.trees[2 * start_iteration:]
            if num_iteration:
                used = used[: 2 * num_iteration]
            # init scores belong to iteration 0: raw slices over
            # start_iteration sum to the full prediction (test_Predictor.R)
            m = np.full(len(X),
                        self._init_scores[0] if start_iteration == 0 else 0.0)
            sv = np.full(len(X),
                         self._init_scores[1] if start_iteration == 0 else 0.0)
            for i, tree in enumerate(used):
                if i % 2 == 0:
                    m = m + self._tree_predict(tree, X)
                else:
                    sv = sv + self._tree_predict(tree, X)
            if raw_score:
                return np.concatenate([m, sv])
            return {"pred_mean": m, "pred_var": np.exp(sv)}
        if self._nsets > 1 and self.gp_model is None:
            # standalone multiclass: K interleaved trees per iteration
            K = self._nsets
            nit = num_iteration if num_iteration else len(self.trees) // K
            used = self.trees[K * start_iteration: K * (start_iteration + nit)]
            init = self._init_scores if start_iteration == 0 \
                else np.zeros_like(self._init_scores)
            Fk = np.tile(init[:, None], (1, len(X)))
            if pred_early_stop:
                # multiclass margin = top1 - top2 of the raw scores
                # (prediction_early_stop.cpp:38 MulticlassScoreFunction)
                active = np.ones(len(X), dtype=bool)
                freq = max(1, int(pred_early_stop_freq)) * K
                for i, tree in enumerate(used):
                    if i and i % freq == 0:
                        top2 = np.sort(Fk[:, active], axis=0)[-2:]
                        active[np.flatnonzero(active)[
                            (top2[1] - top2[0])
                            >= float(pred_early_stop_margin)]] = False
                        if not active.any():
                            break
                    Fk[i % K, active] += self._tree_predict(tree, X[active])
            else:
                for i, tree in enumerate(used):
                    Fk[i % K] += self._tree_predict(tree, X)
            if raw_score:
                return Fk.T                       # (n, K) raw scores
            S = Fk - Fk.max(0, keepdims=True)
            P = np.exp(S)
            P /= P.sum(0, keepdims=True)
            return P.T                            # (n, K) probabilities
        if self._nsets == 2:
            # interleaved trees: even -> mean block, odd -> second block
            nit = num_iteration if num_iteration else len(self.trees) // 2
            used = self.trees[2 * start_iteration: 2 * (start_iteration + nit)]
            F1 = np.full(len(X),
                         self.init_score if start_iteration == 0 else 0.0)
            F2 = np.full(len(X),
                         self.init_score2 if start_iteration == 0 else 0.0)
            for i, tree in enumerate(used):
                if i % 2 == 0:
                    F1 = F1 + self._tree_predict(tree, X)
                else:
                    F2 = F2 + self._tree_predict(tree, X)
            F_pred = np.concatenate([F1, F2])
        else:
            F_pred = np.zeros(len(X))
            ntrees = num_iteration if num_iteration else len(self.trees)
            used = self.trees[start_iteration:start_iteration + ntrees]
            if self.params.get("use_nesterov_acc"):
                # replay the training-time momentum recursion
                # (gbdt_prediction.cpp:22-34)
                lag = None
                for i, tree in enumerate(used):
                    it = start_iteration + i
                    if it == 1:
                        lag = F_pred.copy()
                    elif it > 1:
                        mu = _nesterov_schedule(
                            it,
                            int(self.params["momentum_schedule_version"]),
                            float(self.params["nesterov_acc_rate"]),
                            int(self.params["momentum_offset"]))
                        F_pred, lag = (1.0 + mu) * F_pred - mu * lag, F_pred
                    F_pred = F_pred + self._tree_predict(tree, X)
            elif pred_early_stop and self.objective_name in (
                    "bernoulli_logit", "bernoulli_probit",
                    "cross_entropy", "binary_lgb"):
                # binary margin = |raw score| incl. the init score
                # (prediction_early_stop.cpp:60 BinaryScoreFunction)
                active = np.ones(len(X), dtype=bool)
                freq = max(1, int(pred_early_stop_freq))
                for i, tree in enumerate(used):
                    if i and i % freq == 0:
                        active[np.flatnonzero(active)[
                            np.abs(F_pred[active] + self.init_score)
                            >= float(pred_early_stop_margin)]] = False
                        if not active.any():
                            break
                    F_pred[active] += self._tree_predict(tree, X[active])
            else:
                for tree in used:
                    F_pred = F_pred + self._tree_predict(tree, X)
            if self.params.get("boosting") == "rf" and used:
                F_pred = F_pred / len(used)     # rf.hpp: average_output_
            if start_iteration == 0:
                # the init score belongs to iteration 0 so raw slices over
                # start_iteration sum to the full prediction
                F_pred = F_pred + self.init_score

        gp = self.gp_model
        if gp is None or ignore_gp_model:
            if not raw_score and self.objective_name == "cross_entropy":
                return 1.0 / (1.0 + np.exp(-F_pred))
            if not raw_score and self.objective_name == "tweedie":
                # RegressionPoissonLoss::ConvertOutput (inherited)
                return np.exp(F_pred)
            if not raw_score and self.objective_name == "binary_lgb":
                return 1.0 / (1.0 + np.exp(
                    -float(self.params["sigmoid"]) * F_pred))
            if not raw_score and self.objective_name == "cross_entropy_lambda":
                # ConvertOutput is the normalized exponential parameter
                # lambda = log(1+e^F), NOT a probability
                # (xentropy_objective.hpp:218-237)
                return np.log1p(np.exp(F_pred))
            if raw_score or self._lik is None:
                return F_pred
            return np.asarray(self._lik.cond_mean(jnp.asarray(F_pred), self._aux))

        gp_kwargs = {k: kwargs[k] for k in
                     ("cov_pars", "sample_posterior", "sample_prior",
                      "num_post_samples", "num_prior_samples", "seed")
                     if k in kwargs}
        if gp.likelihood == "gaussian":
            resid = self.y - self.F
            pred = gp.predict(
                y=resid, group_data_pred=group_data_pred,
                group_rand_coef_data_pred=group_rand_coef_data_pred,
                gp_coords_pred=gp_coords_pred,
                gp_rand_coef_data_pred=gp_rand_coef_data_pred,
                cluster_ids_pred=cluster_ids_pred,
                predict_var=predict_var, predict_cov_mat=predict_cov_mat,
                predict_response=not pred_latent, **gp_kwargs)
            # random_effect_cov carries the (co-)variances — the matrix when
            # predict_cov_mat, else the variance vector (basic.py:3787)
            out = {"fixed_effect": F_pred, "random_effect_mean": pred["mu"],
                   "random_effect_cov": pred.get("cov") if predict_cov_mat
                   else pred.get("var"),
                   "random_effect_var": pred.get("var"),
                   "response_mean": F_pred + pred["mu"]}
            if not pred_latent:
                # predict_response=True -> var includes the error term
                out["response_var"] = pred.get("var")
            for k in ("posterior_samples", "prior_samples"):
                if pred.get(k) is not None:
                    # samples include the tree ensemble's fixed effect
                    # (R test: mean(posterior_samples) ~ pred_re + pred_fe)
                    out[k] = pred[k] + F_pred[:, None]
            return out
        else:
            # latent: random_effect_mean excludes the trees' fixed effect;
            # the ensemble prediction enters only as offset_pred for
            # response predictions (basic.py:3739/3780)
            pred = gp.predict(
                y=self.y, offset=self.F,
                group_data_pred=group_data_pred,
                group_rand_coef_data_pred=group_rand_coef_data_pred,
                gp_coords_pred=gp_coords_pred,
                gp_rand_coef_data_pred=gp_rand_coef_data_pred,
                cluster_ids_pred=cluster_ids_pred,
                predict_var=predict_var, predict_cov_mat=predict_cov_mat,
                predict_response=not pred_latent,
                **({} if pred_latent else
                   {"fixed_effects_pred": F_pred}), **gp_kwargs)
            out = {"fixed_effect": F_pred, "random_effect_mean": pred["mu"],
                   "random_effect_cov": pred.get("cov") if predict_cov_mat
                   else pred.get("var"),
                   "random_effect_var": pred.get("var")}
            if not pred_latent:
                out["response_mean"] = pred["mu"]
                out["response_var"] = pred.get("var")
            for k in ("posterior_samples", "prior_samples"):
                if pred.get(k) is not None:
                    # latent samples exclude the ensemble; add it back
                    # (basic.py:3759) — response samples already include it
                    out[k] = pred[k] + F_pred[:, None] if pred_latent \
                        else pred[k]
            return out

    def predict_training_data_random_effects(self, predict_var=False):
        """Per-component random-effect estimates at the training points,
        with the current tree ensemble as fixed effects (basic.py:3407)."""
        if self.gp_model is None:
            raise ValueError("predict_training_data_random_effects: "
                             "Booster has no gp_model")
        if self.gp_model.likelihood == "gaussian":
            # the Gaussian hook works on residuals; refresh them to the
            # CURRENT ensemble (gp.y only holds the first-round residual)
            self.gp_model.y = self.y - self.F
            return self.gp_model.predict_training_data_random_effects(
                predict_var=predict_var)
        return self.gp_model.predict_training_data_random_effects(
            predict_var=predict_var, offset=self.F)

    def feature_importance(self, importance_type="split", iteration=None):
        """Per-feature importances over the ensemble (basic.py
        Booster.feature_importance): 'split' counts how often a feature is
        used; 'gain' sums the split gains."""
        ntrees = iteration if iteration else len(self.trees)
        p = self._min_num_features()
        if getattr(self, "train_set", None) is not None:
            p = max(p, self.train_set.num_features)
        out = np.zeros(p)
        for t in self.trees[:ntrees]:
            nn = t.num_nodes
            internal = np.where(~t.is_leaf[:nn])[0]
            feats = t.split_feature[internal]
            if importance_type == "split":
                np.add.at(out, feats, 1.0)
            elif importance_type == "gain":
                np.add.at(out, feats, t.split_gain[internal])
            else:
                raise ValueError(f"unknown importance_type {importance_type!r}")
        return out

    def _min_num_features(self):
        """Highest feature index any tree splits on, + 1 (guards raw-X
        prediction against too-narrow inputs)."""
        needed = 0
        for t in self.trees:
            nn = t.num_nodes
            internal = ~t.is_leaf[:nn]
            if np.any(internal):
                needed = max(needed, int(t.split_feature[:nn][internal].max()) + 1)
        return needed

    def _tree_predict(self, tree, X):
        """Per-tree prediction for raw rows; EFB-bundled datasets re-encode
        into learner-space bins (bundle splits live in bin space)."""
        if getattr(self.train_set, "bundles", None):
            return tree.leaf_value[tree.leaf_index_binned(
                self.train_set.encode_raw(X))]
        return tree.predict_raw(X)

    def _tree_train_contrib(self, tree, slot_of_row, leaf_value_of_slot):
        """Per-row contribution of a freshly grown tree on the training data
        (linear leaves need the raw features, not just the leaf constant)."""
        if tree.leaf_linear:
            return tree.predict_raw(self.train_set.data)
        return leaf_value_of_slot[slot_of_row]

    def refit(self, data, label, decay_rate=None):
        """Refit the leaf values of the existing tree structures on new data
        (basic.py:3804 Booster.refit; gbdt.cpp:314 RefitTree;
        serial_tree_learner.cpp:212 FitByExistingTree):

            leaf_output = decay_rate * old + (1 - decay_rate) * new

        where `new` is the Newton-optimal value on the new data's gradients,
        computed sequentially tree-by-tree (each refit tree updates the score
        the next tree's gradients see). Returns a NEW refitted Booster."""
        if self.gp_model is not None:
            raise NotImplementedError("refit with a gp_model is not "
                                      "supported; retrain instead")
        if self._nsets > 1:
            raise NotImplementedError("refit is not supported for "
                                      "multi-output objectives")
        import copy
        if decay_rate is None:
            decay_rate = float(self.params.get("refit_decay_rate", 0.9))
        X = np.asarray(data, dtype=np.float64)
        if X.ndim == 1:
            X = X[:, None]
        y = np.asarray(label, dtype=np.float64)
        new = copy.copy(self)
        new.trees = [copy.deepcopy(t) for t in self.trees]
        new.train_set = None
        new.y = y
        new.n = len(y)
        new.F = np.full(len(y), self.init_score)
        lam = float(self.params["lambda_l2"])
        l1 = float(self.params["lambda_l1"])
        for tree in new.trees:
            g, h = new._gradients()
            node = tree.leaf_index_raw(X)
            for leaf in np.unique(node):
                sel = node == leaf
                sg, sh = float(g[sel].sum()), float(h[sel].sum()) + 1e-15
                sg = np.sign(sg) * max(abs(sg) - l1, 0.0)
                newv = -sg / (sh + lam) * tree.shrinkage_applied
                tree.leaf_value[leaf] = (decay_rate * tree.leaf_value[leaf]
                                         + (1.0 - decay_rate) * newv)
            new.F = new.F + tree.leaf_value[node]
        return new

    def reset_parameter(self, params):
        """Update training parameters between iterations (used by the
        reset_parameter callback; basic.py Booster.reset_parameter)."""
        for k, v in (params or {}).items():
            kk = _PARAM_ALIASES.get(k, k)
            self.params[kk] = v
        return self

    def num_trees(self):
        return len(self.trees)

    def current_iteration(self):
        return self.current_iteration_

    def eval_train(self):
        grad = self.F - self.y if self.objective_name == "gaussian" else None
        if grad is not None:
            return [("training", "l2", float(np.mean(grad ** 2)), False)]
        return []

    # ------------------------------------------------------------------
    def model_to_dict(self, num_iteration=None, start_iteration=0):
        """num_iteration/start_iteration save a slice of the ensemble
        (basic.py save_model(num_iteration=...); the R suite's gpb.save)."""
        k = max(1, self._nsets)
        trees = self.trees[k * int(start_iteration):]
        if num_iteration:
            trees = trees[: k * int(num_iteration)]
        d = {
            "init_score": self.init_score,
            "objective": self.objective_name,
            "params": {k_: v for k_, v in self.params.items()
                       if isinstance(v, (int, float, str, bool))},
            "trees": [t.to_dict() for t in trees],
            "has_gp_model": 1 if self.gp_model is not None else 0,
            "num_sets": self._nsets,
            "init_score2": self.init_score2,
        }
        if getattr(self, "_init_scores", None) is not None:
            d["init_scores"] = np.asarray(self._init_scores).tolist()
        if getattr(self, "_binary_lw", None) is not None:
            d["binary_label_weights"] = list(self._binary_lw)
        if self._pandas_categorical:
            d["pandas_categorical"] = {str(k): v for k, v
                                       in self._pandas_categorical.items()}
        if getattr(self.train_set, "bundles", None):
            d["efb"] = {
                "kept_features": list(self.train_set.kept_features),
                "kept_upper_bounds": [
                    np.asarray(self.train_set.mappers[j].upper_bounds).tolist()
                    for j in self.train_set.kept_features],
                "bundles": [b.to_dict() for b in self.train_set.bundles],
                "num_features": self.train_set.num_features,
            }
        if self.gp_model is not None and self.gp_model.model_has_been_fitted:
            d["gp_model"] = self.gp_model.model_to_dict()
            d["residual_or_y"] = (self.y - self.F).tolist() \
                if self.gp_model.likelihood == "gaussian" else self.y.tolist()
            d["fixed_effect_train"] = self.F.tolist()
        return d

    def save_model(self, filename, num_iteration=None, start_iteration=0,
                   **kwargs):
        import json
        with open(filename, "w") as f:
            json.dump(self.model_to_dict(num_iteration=num_iteration,
                                         start_iteration=start_iteration), f)
        return self

    def _load(self, model_file, model_dict):
        import json
        if model_dict is None:
            with open(model_file) as f:
                model_dict = json.load(f)
        d = model_dict
        self.init_score = d["init_score"]
        self.objective_name = d["objective"]
        self.params = dict(_BOOST_PARAM_DEFAULTS)
        self.params.update(d.get("params", {}))
        self._pandas_categorical = {int(k): v for k, v in
                                    d.get("pandas_categorical", {}).items()} \
            or None
        self.trees = [Tree.from_dict(td) for td in d["trees"]]
        self.train_set = None
        if d.get("efb"):
            # reconstruct a minimal Dataset carrying the EFB encoder
            from .dataset import Dataset, BinMapper, FeatureBundle
            efb = d["efb"]
            ds = Dataset.__new__(Dataset)
            ds.bundles = [FeatureBundle.from_dict(bd)
                          for bd in efb["bundles"]]
            ds.kept_features = list(efb["kept_features"])
            ds.num_features = efb["num_features"]
            mappers = [None] * efb["num_features"]
            for j, ub in zip(ds.kept_features, efb["kept_upper_bounds"]):
                m = BinMapper.__new__(BinMapper)
                m.upper_bounds = np.asarray(ub)
                m.has_nan = False
                m.num_bins = len(m.upper_bounds)
                m.nan_bin = -1
                mappers[j] = m
            for b in ds.bundles:
                for fid, bm in zip(b.feature_ids, b.mappers):
                    mappers[fid] = bm
            ds.mappers = mappers
            ds._constructed = True
            self.train_set = ds
        self._nsets = int(d.get("num_sets", 1))
        self.init_score2 = d.get("init_score2", 0.0)
        if d.get("init_scores") is not None:
            self._init_scores = np.asarray(d["init_scores"])
        if d.get("binary_label_weights") is not None:
            self._binary_lw = tuple(d["binary_label_weights"])
        self.current_iteration_ = (len(self.trees)
                                   // max(1, self._nsets))
        self.gp_model = None
        # special objectives have dedicated gradient/prediction formulas
        # and no likelihood-registry entry
        if (self.objective_name == "gaussian"
                or self.objective_name in _SPECIAL_OBJECTIVES):
            self._lik = None
            self._aux = None
        else:
            self._lik = get_likelihood(self.objective_name)
            self._aux = jnp.asarray(np.asarray(self._lik.default_aux))
        if d.get("has_gp_model"):
            from ..gp_model import GPModel
            self.gp_model = GPModel(model_dict=d["gp_model"])
            self.y = np.asarray(d["residual_or_y"])
            self.F = np.asarray(d["fixed_effect_train"])
            if self.gp_model.likelihood == "gaussian":
                self.y = self.F + np.asarray(d["residual_or_y"])


def _psi_tilde_inv_mat(eng, t, M):
    """Psi_tilde^-1 M for an (n, L) matrix (Newton leaf updates / line search,
    re_model_template.h:4947 NewtonUpdateLeafValues)."""
    import jax.scipy.linalg as jsl
    theta_log = jnp.asarray(np.log(t[1:]))
    kind = type(eng).__name__
    if kind == "DenseGaussianEngine":
        Psi = eng.psi_tilde(theta_log)
        L = jnp.linalg.cholesky(Psi)
        return np.asarray(jsl.cho_solve((L, True), jnp.asarray(M)))
    if kind == "WoodburyGaussianEngine":
        import scipy.linalg as sla
        if not hasattr(eng, "_G_np"):
            eng._G_np = np.asarray(eng._G)
            eng._block_np = np.asarray(eng._block_id_np)
        vt = np.exp(np.asarray(np.log(t[1:]), dtype=np.float64))
        A = eng._G_np + np.diag(1.0 / vt[eng._block_np])
        cho = sla.cho_factor(A, lower=True)
        ZtM = np.column_stack([eng._zt(M[:, l]) for l in range(M.shape[1])])
        w = sla.cho_solve(cho, ZtM)                       # (q, L)
        out = M.copy() if eng.weights is None else M * eng.weights[:, None]
        for j in range(eng.num_theta):
            out -= (eng._w[j][:, None] if eng.weights is None
                    else (eng._w[j] * eng.weights)[:, None]) * w[eng._idx[j]]
        return out
    if kind == "FITCGaussianEngine":
        return np.asarray(eng.psi_inv_apply_jit(theta_log, jnp.asarray(M)))
    if kind == "VecchiaGaussianEngine":
        A, D = eng._bd(theta_log)
        A = np.asarray(A); D = np.asarray(D)
        idx = np.asarray(eng._nn_idx)
        Mp = np.asarray(M)[eng.perm]                      # (n, L)
        z = Mp - np.einsum("nm,nml->nl", A, Mp[idx])      # B M
        w = z / D[:, None]                                 # D^-1 B M
        out = w.copy()                                     # B' D^-1 B M
        np.subtract.at(out, idx.reshape(-1),
                       (A[:, :, None] * w[:, None, :]).reshape(-1, M.shape[1]))
        inv = np.empty_like(out)
        inv[eng.perm] = out
        return inv
    raise AssertionError(kind)


def _psi_tilde_inv_apply(eng, t, resid):
    """Psi_tilde^-1 resid for whichever Gaussian engine the GPModel holds."""
    return _psi_tilde_inv_mat(eng, t, np.asarray(resid)[:, None])[:, 0]


def train(params, train_set, num_boost_round=100, gp_model=None,
          valid_sets=None, valid_names=None, callbacks=None,
          early_stopping_rounds=None, verbose_eval=False, init_model=None,
          keep_training_booster=False, evals_result=None, **kwargs):
    """Train a (GP)Boost model (engine.py:22 train).

    valid_sets: Dataset(s) with labels for per-iteration validation; with
    early_stopping_rounds, training stops when the first validation metric has
    not improved for that many rounds (gbdt.cpp:587 EvalAndCheckEarlyStopping).
    Validation predictions route through the GP model when
    use_gp_model_for_validation (config.h:187) and the valid Dataset carries
    the prediction inputs in .gp_valid_data (dict of predict kwargs).
    """
    raw = dict(params or {})
    nbr = num_boost_round
    for k in list(raw):
        kk = _PARAM_ALIASES.get(k, k)
        if kk == "num_boost_round":
            nbr = int(raw.pop(k))
    booster = Booster(params=raw, train_set=train_set, gp_model=gp_model,
                      init_model=init_model)

    vsets = []
    if valid_sets is not None:
        vsets = valid_sets if isinstance(valid_sets, (list, tuple)) \
            else [valid_sets]
        vsets = [v for v in vsets if v is not train_set]
    names = valid_names or [f"valid_{i}" for i in range(len(vsets))]

    chosen = raw.get("metric")
    if isinstance(chosen, (list, tuple)):
        chosen = chosen[0] if chosen else None
    feval = kwargs.get("feval")

    from ..engine import (_METRIC_ALIASES, _GP_TRAIN_METRICS, _VAR_METRICS,
                          _RANK_METRICS, _var_metric_fn, metric_higher_better)
    if chosen is None and booster.objective_name in ("lambdarank",
                                                     "rank_xendcg"):
        chosen = "ndcg"
    chosen_canon = _METRIC_ALIASES.get(chosen, chosen) if chosen else None

    def _rank_metric(v, p):
        """ndcg@k / map@k on a validation set with query info
        (rank_metric.hpp / map_metric.hpp; reported at the first eval_at)."""
        from .ranking import (ndcg_metric, map_metric, query_boundaries,
                              DEFAULT_LABEL_GAIN)
        if v.group is None:
            raise ValueError(f"metric '{chosen}' requires query information "
                             "on the validation Dataset (group=...)")
        qb = query_boundaries(v.group)
        ks = np.atleast_1d(np.asarray(booster.params.get(
            "eval_at", (1, 2, 3, 4, 5)), dtype=int))
        if chosen_canon == "ndcg":
            lg = getattr(booster, "_label_gain", DEFAULT_LABEL_GAIN)
            vals = ndcg_metric(v.get_label(), p, qb, ks, lg)
        else:
            vals = map_metric(v.get_label(), p, qb, ks)
        return f"{chosen_canon}@{int(ks[0])}", vals[int(ks[0])]

    def _metric(y, p):
        if chosen:
            from ..engine import _metric_fn
            return chosen, _metric_fn(chosen)(y, p)
        if booster.objective_name == "gaussian":
            return "l2", float(np.mean((y - p) ** 2))
        if "bernoulli" in booster.objective_name:
            pc = np.clip(p, 1e-15, 1 - 1e-15)
            return "binary_logloss", float(-np.mean(
                y * np.log(pc) + (1 - y) * np.log(1 - pc)))
        return "rmse", float(np.sqrt(np.mean((y - p) ** 2)))

    def _eval_var_metric(v, pk, use_gp):
        """test_neg_log_likelihood / crps_gaussian on a validation set
        (regression_metric.hpp:373-494)."""
        yv = v.get_label()
        if use_gp:
            if gp_model.likelihood == "gaussian":
                pred = booster.predict(v.data, predict_var=True, **pk)
                mu = pred["response_mean"]
                var = pred["response_var"]
                return _var_metric_fn(chosen_canon)(yv, mu, var)
            # non-Gaussian: adaptive-GH log predictive density over the
            # LATENT predictive distribution (likelihoods.h:10157)
            if chosen_canon == "crps_gaussian":
                raise ValueError("crps_gaussian requires a Gaussian likelihood")
            pred = booster.predict(v.data, pred_latent=True,
                                   predict_var=True, **pk)
            mu_lat = pred["fixed_effect"] + pred["random_effect_mean"]
            v_lat = pred["random_effect_var"]
            lik = gp_model._likelihood_obj
            aux = getattr(gp_model._engine, "aux_for_metrics", None)
            r = gp_model._fit_result
            aux_pars = getattr(r, "aux_pars", None)
            return float(lik.test_neg_log_likelihood(
                yv, np.asarray(mu_lat), np.asarray(v_lat), aux_pars))
        # no GP model (or not used): plug-in Gaussian with the training
        # residual variance (regression_metric.hpp:473-480)
        F_pred = booster.predict(v.data, ignore_gp_model=True, raw_score=True)
        Ftr = booster.F[: booster.n]
        var_est = float(np.var(booster.y - Ftr, ddof=1))
        return _var_metric_fn(chosen_canon)(yv, F_pred, var_est)

    maximize = metric_higher_better(chosen) if chosen else False
    if feval is not None:
        maximize_feval = None   # discovered from the first feval call

    from ..callback import CallbackEnv, EarlyStopException
    cbs = sorted(callbacks or [], key=lambda c: getattr(c, "order", 0))
    cbs_before = [c for c in cbs if getattr(c, "before_iteration", False)]
    cbs_after = [c for c in cbs if not getattr(c, "before_iteration", False)]
    best_score = -np.inf if maximize else np.inf
    best_iter = -1
    rounds_no_improve = 0
    if evals_result is not None:
        for nm in names:
            evals_result.setdefault(nm, {})
    if not vsets and not cbs and feval is None and nbr > 0:
        # fused fast paths: whole blocks of rounds in one device dispatch
        if booster.can_train_scanned():
            booster.update_many(nbr)
            booster.best_iteration = -1
            booster.best_score = None
            return booster
        if booster.can_train_scanned_gpboost():
            booster.update_many_gpboost(nbr)
            booster.best_iteration = -1
            booster.best_score = None
            return booster
        if booster.can_train_scanned_lagaboost():
            booster.update_many_lagaboost(nbr)
            booster.best_iteration = -1
            booster.best_score = None
            return booster
        if booster.can_train_scanned_multi():
            booster.update_many_multi(nbr)
            booster.best_iteration = -1
            booster.best_score = None
            return booster
    for it in range(nbr):
        for cb in cbs_before:
            cb(CallbackEnv(model=booster, params=booster.params, iteration=it,
                           begin_iteration=0, end_iteration=nbr,
                           evaluation_result_list=[]))
        booster.update()
        eval_list = []
        if vsets:
            for v, nm in zip(vsets, names):
                pk = dict(getattr(v, "gp_valid_data", None) or {})
                use_gp = (gp_model is not None
                          and booster.params["use_gp_model_for_validation"]
                          and pk)
                if chosen_canon in _GP_TRAIN_METRICS:
                    if gp_model is None:
                        raise ValueError(
                            f"metric '{chosen}' requires a gp_model")
                    mname = chosen
                    score = float(
                        gp_model._fit_result.neg_log_likelihood)
                elif chosen_canon in _VAR_METRICS:
                    mname = chosen
                    score = _eval_var_metric(v, pk, use_gp)
                elif feval is not None:
                    pred = booster.predict(v.data, ignore_gp_model=not use_gp,
                                           **pk)
                    if isinstance(pred, dict):
                        pred = pred.get("response_mean",
                                        pred["fixed_effect"]
                                        + pred["random_effect_mean"])
                    mname, score, hib = feval(np.asarray(pred), v)
                    if maximize_feval is None:
                        maximize_feval = bool(hib)
                        maximize = maximize_feval
                        best_score = -np.inf if maximize else np.inf
                elif chosen_canon in _RANK_METRICS:
                    pred = booster.predict(v.data, raw_score=True,
                                           ignore_gp_model=True)
                    mname, score = _rank_metric(v, np.asarray(pred))
                else:
                    pred = booster.predict(v.data, ignore_gp_model=not use_gp,
                                           **pk)
                    if isinstance(pred, dict):
                        pred = pred.get("response_mean",
                                        pred["fixed_effect"]
                                        + pred["random_effect_mean"])
                    mname, score = _metric(v.get_label(), pred)
                if evals_result is not None:
                    evals_result[nm].setdefault(mname, []).append(score)
                eval_list.append((nm, mname, score, maximize))
                if nm == names[0]:
                    improved = (score > best_score + 1e-15) if maximize \
                        else (score < best_score - 1e-15)
                    if improved:
                        best_score = score
                        best_iter = it + 1
                        rounds_no_improve = 0
                    else:
                        rounds_no_improve += 1
            if early_stopping_rounds and rounds_no_improve >= early_stopping_rounds:
                break
        if cbs_after:
            try:
                for cb in cbs_after:
                    cb(CallbackEnv(model=booster, params=booster.params,
                                   iteration=it, begin_iteration=0,
                                   end_iteration=nbr,
                                   evaluation_result_list=eval_list))
            except EarlyStopException as e:
                best_iter = e.best_iteration + 1
                booster.best_iteration = best_iter
                booster.best_score = best_score if vsets else None
                return booster
    booster.best_iteration = best_iter if vsets else -1
    booster.best_score = best_score if vsets else None
    return booster


def _fit_linear_leaves(tree, X, grad, hess, slot_of_row, lam):
    """Fit a ridge-regularized linear model in every leaf against the
    Newton targets (linear_tree_learner.cpp: LinearTreeLearner fits leaf-wise
    linear models on the features used along the split path).

    The constant part replaces leaf_value; slopes go to tree.leaf_linear."""
    # features on the path to each leaf
    path_feats = {0: []}
    for node in range(tree.num_nodes):
        if not tree.is_leaf[node]:
            f = int(tree.split_feature[node])
            base = path_feats.get(node, [])
            path_feats[int(tree.left[node])] = base + [f]
            path_feats[int(tree.right[node])] = base + [f]
    slot_to_node = getattr(tree, "slot_to_node", None)
    if slot_to_node is None:
        return
    cat_feats = {int(tree.split_feature[nd]) for nd in tree.cat_left_bins}
    for slot, node in slot_to_node.items():
        feats = sorted(set(f for f in path_feats.get(node, [])
                           if f not in cat_feats))
        rows = np.where(slot_of_row == slot)[0]
        if len(feats) == 0 or len(rows) < 2 * (len(feats) + 1):
            continue
        Xf = np.nan_to_num(X[np.ix_(rows, feats)])
        A = np.column_stack([np.ones(len(rows)), Xf])
        h = hess[rows]
        g = grad[rows]
        M = A.T @ (A * h[:, None]) + (lam + 1e-8) * np.eye(A.shape[1])
        rhs = -A.T @ g
        try:
            w = np.linalg.solve(M, rhs)
        except np.linalg.LinAlgError:
            continue
        if not np.all(np.isfinite(w)):
            continue
        tree.leaf_value[node] = w[0]
        tree.leaf_linear[node] = (np.asarray(feats, dtype=int), w[1:])
