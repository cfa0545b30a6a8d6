"""Covariance-parameter estimation: the master optimizer loop.

Faithful reimplementation of REModelTemplate::OptimLinRegrCoefCovPar
(re_model_template.h:969) semantics for the Gaussian likelihood:

  * internal optimizers: gradient_descent (Nesterov acceleration + Armijo
    backtracking with permanent learning-rate halving, re_model_template.h:8621
    UpdateCovAuxPars), fisher_scoring, newton (step clipping at log(100),
    :8661-8669), all on the log-transformed parameter scale with the nugget
    variance profiled out for gradient_descent (:1068-1075, :2605
    ProfileOutSigma2);
  * external optimizers: lbfgs / nelder_mead / adam on the profiled objective
    (optim_utils.h:243 EvalLLforLBFGSpp, :562 OptimExternal).

Constants mirror the reference defaults (re_model_template.h:5682-5796):
LR_SHRINKAGE_FACTOR=0.5, c_armijo=1e-4, c_armijo_mom=1e-4,
max_number_lr_shrinkage_steps=30, MAX_GRADIENT_UPDATE_LOG_SCALE=log(100),
acc_rate_cov=0.5, momentum_offset=2.
"""

from ..ops.jit_utils import lifted_jit
import math
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax.numpy as jnp

LR_SHRINKAGE_FACTOR = 0.5
C_ARMIJO = 1e-4
C_ARMIJO_MOM = 1e-4
MAX_NUM_LR_SHRINKAGE_STEPS = 30
MAX_GRADIENT_UPDATE_LOG_SCALE = math.log(100.0)


@dataclass
class OptimConfig:
    optimizer_cov: str = "lbfgs"
    optimizer_coef: str = "wls"
    lr_cov: float = -999.0          # -999 -> default (0.1 gd, 1.0 otherwise)
    lr_coef: float = 0.1
    use_nesterov_acc: bool = True
    acc_rate_cov: float = 0.5
    acc_rate_coef: float = 0.5
    momentum_offset: int = 2
    nesterov_schedule_version: int = 0
    delta_rel_conv: float = -999.0  # -999 -> 1e-6 (1e-8 for nelder_mead)
    convergence_criterion: str = "relative_change_in_log_likelihood"
    max_iter: int = 1000
    init_cov_pars: Optional[np.ndarray] = None
    estimate_cov_par_index: Optional[list] = None
    std_dev: bool = False
    maxit: Optional[int] = None     # alias used by reference tests for lbfgs
    trace: bool = False
    init_aux_pars: Optional[np.ndarray] = None
    estimate_aux_pars: bool = True
    # None -> auto (device loop for large n); True/False forces. The device
    # loop runs the ENTIRE L-BFGS as one jitted lax.while_loop (ops/lbfgs.py)
    # instead of host-driven scipy with one device round-trip per evaluation.
    use_device_optimizer: Optional[bool] = None

    def resolved_lr_cov(self):
        if self.lr_cov < 0:
            return 0.1 if self.optimizer_cov == "gradient_descent" else 1.0
        return self.lr_cov

    def resolved_delta_rel_conv(self):
        if self.delta_rel_conv < 0:
            return 1e-8 if self.optimizer_cov == "nelder_mead" else 1e-6
        return self.delta_rel_conv


@dataclass
class OptimResult:
    cov_pars: np.ndarray = None          # original scale
    cov_pars_internal: np.ndarray = None
    num_it: int = 0
    neg_log_likelihood: float = np.nan
    std_dev_cov_pars: Optional[np.ndarray] = None
    coef: Optional[np.ndarray] = None
    std_dev_coef: Optional[np.ndarray] = None
    converged: bool = False
    trajectory: Optional[list] = None
    aux_pars: Optional[np.ndarray] = None
    mode_state: object = None


def nesterov_mu(it, version, acc_rate, momentum_offset):
    """re_model_template.h:6098 NesterovSchedule."""
    if it < momentum_offset:
        return 0.0
    if version == 0:
        return acc_rate
    if version == 1:
        return 1.0 - (3.0 / (6.0 + it))
    raise ValueError(f"nesterov_schedule_version {version}")


def optimize_gaussian(engine, y, config: OptimConfig,
                      X=None) -> OptimResult:
    """Estimate covariance parameters (and optional linear coefs) for Gaussian y."""
    opt = config.optimizer_cov
    if opt in ("gradient_descent", "fisher_scoring", "newton"):
        res = _optimize_internal(engine, y, config, X)
    elif opt in ("lbfgs", "lbfgs_linesearch_nocedal_wright", "lbfgs_not_profile_out_nugget",
                 "nelder_mead", "adam", "bfgs_optim_lib"):
        res = _optimize_external(engine, y, config, X)
    else:
        raise ValueError(f"optimizer_cov '{opt}' is not supported")
    if config.std_dev:
        FI = np.asarray(engine.fisher_original(jnp.asarray(res.cov_pars)))
        std = np.full(len(res.cov_pars), np.nan)
        try:
            FI_inv = np.linalg.inv(FI)
            d = np.diagonal(FI_inv)
            ok = np.isfinite(d) & (d >= 0)
            std[ok] = np.sqrt(d[ok])
        except np.linalg.LinAlgError:
            pass
        res.std_dev_cov_pars = std
        if X is not None and res.coef is not None and hasattr(engine, "psi_tilde"):
            # CalcStdDevCoef (re_model_template.h:10753): sqrt diag (X'Psi^-1 X)^-1
            import scipy.linalg as sla
            t = engine.transform_pars(res.cov_pars)
            M = np.asarray(engine.psi_tilde(jnp.asarray(np.log(t[1:]))))
            Xn = np.asarray(X, dtype=np.float64)
            XtPX = Xn.T @ sla.cho_solve(sla.cho_factor(M, lower=True), Xn) / t[0]
            res.std_dev_coef = np.sqrt(np.diagonal(np.linalg.inv(XtPX)))
    return res


# ----------------------------------------------------------------------
def _est_mask(engine, config):
    m = np.ones(engine.num_cov_par, dtype=bool)
    if config.estimate_cov_par_index is not None:
        idx = np.asarray(config.estimate_cov_par_index)
        m = idx > 0
    return m


C_MAX_CHANGE_COEF = 10.0


class CovariateHandler:
    """Covariate scaling, intercept detection/initialisation and the
    coefficient learning-rate cap (re_model_template.h:1206-1278 covariate
    scaling, :5393 MaximalLearningRateCoef, likelihoods.h:1435/2593)."""

    def __init__(self, X, scale):
        self.X_orig = np.asarray(X, dtype=np.float64)
        n, k = self.X_orig.shape
        self.k = k
        self.intercept_col = None
        for icol in range(k):
            if np.all(self.X_orig[:, icol] == self.X_orig[0, icol]):
                self.intercept_col = icol
                break
        self.scale = scale and not (self.intercept_col is not None and k == 1)
        if self.scale:
            self.loc = np.zeros(k)
            self.sd = np.ones(k)
            self.X = self.X_orig.copy()
            for icol in range(k):
                if icol == self.intercept_col:
                    continue
                self.loc[icol] = self.X_orig[:, icol].mean()
                centered = self.X_orig[:, icol] - self.loc[icol]
                self.sd[icol] = np.sqrt(np.mean(centered ** 2))
                self.X[:, icol] = centered / self.sd[icol]
        else:
            self.X = self.X_orig

    def init_beta(self, likelihood, y, tot_var, F=None):
        beta = np.zeros(self.k)
        if self.intercept_col is not None:
            if likelihood is None:   # gaussian
                z = y if F is None else y - np.asarray(F)
                beta[self.intercept_col] = float(np.mean(z)) \
                    / self.X_orig[0, self.intercept_col]
            else:
                beta[self.intercept_col] = likelihood.init_intercept(y, tot_var, F) \
                    / self.X_orig[0, self.intercept_col]
        return beta

    def back_transform(self, beta):
        """Scaled-X coefficients -> original-X coefficients."""
        if not self.scale:
            return beta
        out = beta.copy()
        shift = 0.0
        for icol in range(self.k):
            if icol == self.intercept_col:
                continue
            out[icol] = beta[icol] / self.sd[icol]
            shift += self.loc[icol] * out[icol]
        if self.intercept_col is not None:
            out[self.intercept_col] = beta[self.intercept_col] \
                - shift / self.X_orig[0, self.intercept_col]
        return out

    def max_lr(self, beta, neg_step, C_mu, C_sigma2):
        n = self.X.shape[0]
        lp_change = self.X @ neg_step
        lp_lag1 = self.X @ beta
        mean_c = lp_change.mean()
        var_c = np.mean(lp_change ** 2) - mean_c ** 2
        cov_lc = np.mean(lp_change * lp_lag1) - mean_c * lp_lag1.mean()
        out = np.inf
        if abs(mean_c) > 0:
            out = C_mu * C_MAX_CHANGE_COEF / abs(mean_c)
        if var_c > 0:
            max_lr_var = (abs(cov_lc) + np.sqrt(
                cov_lc * cov_lc + 4 * var_c * C_sigma2 * C_MAX_CHANGE_COEF)) \
                / 2.0 / var_c
            out = min(out, max_lr_var)
        return out


def _optimize_internal(engine, y, config: OptimConfig, X=None) -> OptimResult:
    n = engine.n
    opt = config.optimizer_cov
    profile_out = opt == "gradient_descent"  # gaussian-only path
    est = _est_mask(engine, config)
    est_theta = est[1:]
    use_nesterov = config.use_nesterov_acc and opt == "gradient_descent"
    delta_rel_conv = config.resolved_delta_rel_conv()
    has_covariates = X is not None
    handler = None
    C_mu = C_sigma2 = 1.0
    y = np.asarray(y, dtype=np.float64)
    if has_covariates:
        handler = CovariateHandler(
            X, scale=(config.optimizer_coef == "gradient_descent"))
        X = handler.X
        Xd = jnp.asarray(X)
        C_mu = abs(float(np.mean(y)))
        C_sigma2 = float(np.var(y))

    t = engine.transform_pars(np.asarray(config.init_cov_pars, dtype=np.float64))
    u = np.log(t)                      # internal log pars [log s2, log vt, log a]
    yd = jnp.asarray(y)

    beta = None
    if has_covariates:
        beta = (handler.init_beta(None, y, 0.0)
                if config.optimizer_coef == "gradient_descent"
                else np.zeros(X.shape[1]))
    beta_after_grad = beta.copy() if has_covariates else None
    beta_after_grad_lag1 = beta.copy() if has_covariates else None
    lr_coef = config.lr_coef

    resid = y - X @ beta if has_covariates else y
    residd = jnp.asarray(resid)

    nll, quad = [float(v) for v in engine.nll_parts(
        jnp.asarray(u[1:]), jnp.exp(u[0]), residd)]

    lr_cov = config.resolved_lr_cov()
    theta_after_grad = np.exp(u[1:]).copy()       # natural transformed scale
    theta_after_grad_lag1 = np.exp(u[1:]).copy()
    max_iter = config.maxit if config.maxit else config.max_iter
    num_it = max_iter
    converged = False
    nll_new = nll
    trajectory = [] if config.trace else None

    for it in range(max_iter):
        nll_lag1 = nll
        u_lag1 = u.copy()

        # ---- update regression coefficients ----------------------------
        if has_covariates:
            if config.optimizer_coef == "wls":
                beta = np.asarray(engine.wls_coef(jnp.asarray(u[1:]), yd, Xd))
                resid = y - X @ beta
                residd = jnp.asarray(resid)
                nll_coef, quad = [float(v) for v in engine.nll_parts(
                    jnp.asarray(u[1:]), jnp.exp(u[0]), residd)]
                nll_after_coef = nll_coef
            elif config.optimizer_coef == "gradient_descent":
                beta, resid, nll_after_coef, quad, lr_coef, beta_after_grad, \
                    beta_after_grad_lag1 = _update_coef_gd(
                        engine, y, X, beta, u, lr_coef, it, config,
                        nll_lag1, beta_after_grad, beta_after_grad_lag1,
                        handler, C_mu, C_sigma2)
                residd = jnp.asarray(resid)
            else:
                raise ValueError(f"optimizer_coef '{config.optimizer_coef}'")
        else:
            nll_after_coef = nll_lag1

        # ---- profile out the nugget (gradient_descent) -----------------
        # quad = y' Psi_tilde^-1 y is sigma2-free, so sigma2_hat = quad / n
        # (re_model_template.h:2605 ProfileOutSigma2)
        if profile_out and est[0]:
            sigma2 = quad / n
            u[0] = np.log(sigma2)
            u = np.log(engine.apply_nugget_lower_bound(np.exp(u)))

        sigma2 = np.exp(u[0])

        # ---- gradient / step direction ---------------------------------
        if opt == "gradient_descent":
            _, g = engine.grad_profiled(jnp.asarray(u[1:]), jnp.asarray(sigma2), residd)
            g = np.array(g)
            g[~est_theta] = 0.0
            neg_step = g
            # AvoidTooLargeLearningRatesCovAuxPars (permanent cap)
            max_abs = np.max(np.abs(neg_step)) if neg_step.size else 0.0
            if max_abs > 0:
                lr_cov = min(lr_cov, MAX_GRADIENT_UPDATE_LOG_SCALE / max_abs)
            grad_for_armijo = g
        elif opt == "fisher_scoring":
            _, g_full = engine.vag_full(jnp.asarray(u), residd)
            g_full = np.asarray(g_full)
            FI = np.asarray(engine.fisher_transformed(jnp.asarray(u), True))
            neg_step = np.linalg.solve(FI, g_full)
            grad_for_armijo = g_full
        elif opt == "newton":
            _, g_full = engine.vag_full(jnp.asarray(u), residd)
            g_full = np.asarray(g_full)
            H = np.asarray(engine.hess_full(jnp.asarray(u), residd))
            try:
                neg_step = np.linalg.solve(H, g_full)
            except np.linalg.LinAlgError:
                neg_step = g_full
            grad_for_armijo = g_full
        else:
            raise AssertionError(opt)

        dir_deriv = -float(grad_for_armijo @ neg_step)
        if use_nesterov:
            delta_log = u[1:] - np.log(theta_after_grad)
            mom_dir_deriv = float(grad_for_armijo @ delta_log)
        else:
            mom_dir_deriv = 0.0

        # ---- update with learning-rate backtracking --------------------
        lr = lr_cov
        acc_rate = config.acc_rate_cov
        halving_done = False
        decrease_found = False
        for ih in range(MAX_NUM_LR_SHRINKAGE_STEPS):
            step = lr * neg_step
            if opt in ("fisher_scoring", "newton"):
                step = np.clip(step, -MAX_GRADIENT_UPDATE_LOG_SCALE,
                               MAX_GRADIENT_UPDATE_LOG_SCALE)
                u_cand = u - np.where(est, step, 0.0)
                theta_grad_cand = np.exp(u_cand[1:])
                theta_cand = theta_grad_cand
                u0_cand = u_cand[0]
            else:
                theta_grad_cand = np.exp(u[1:] - np.where(est_theta, step, 0.0))
                u0_cand = u[0]
                if use_nesterov:
                    mu = nesterov_mu(it, config.nesterov_schedule_version,
                                     acc_rate, config.momentum_offset)
                    theta_cand = np.exp(
                        (1.0 + mu) * np.log(theta_grad_cand)
                        - mu * np.log(theta_after_grad_lag1))
                else:
                    theta_cand = theta_grad_cand

            cand_full = np.concatenate([[np.exp(u0_cand)], theta_cand])
            cand_full = engine.apply_nugget_lower_bound(cand_full)
            nll_new, quad_new = [float(v) for v in engine.nll_parts(
                jnp.asarray(np.log(cand_full[1:])), jnp.asarray(cand_full[0]), residd)]

            mu = (nesterov_mu(it, config.nesterov_schedule_version, acc_rate,
                              config.momentum_offset) if use_nesterov else 0.0)
            bound = (nll_after_coef + C_ARMIJO * lr * dir_deriv
                     + C_ARMIJO_MOM * mu * mom_dir_deriv)
            if nll_new <= bound:
                decrease_found = True
                break
            halving_done = True
            lr *= LR_SHRINKAGE_FACTOR
            acc_rate *= 0.5

        if halving_done and opt == "gradient_descent":
            lr_cov = lr  # permanent decrease (re_model_template.h:8757)

        theta_after_grad_lag1 = theta_grad_cand.copy()
        theta_after_grad = theta_grad_cand.copy()
        u = np.log(cand_full)
        nll = nll_new
        quad = quad_new
        if trajectory is not None:
            trajectory.append((np.exp(u_lag1), np.exp(u), nll_lag1, nll,
                               lr_cov, lr, ih, dir_deriv))

        # ---- convergence check -----------------------------------------
        if config.convergence_criterion == "relative_change_in_log_likelihood":
            if (nll_lag1 - nll) <= delta_rel_conv * max(abs(nll_lag1), 1.0):
                converged = True
        elif config.convergence_criterion == "relative_change_in_parameters":
            t_now = np.exp(u)
            t_lag = np.exp(u_lag1)
            if np.linalg.norm(t_now - t_lag) <= delta_rel_conv * np.linalg.norm(t_lag):
                converged = True
        else:
            raise ValueError(config.convergence_criterion)
        if not np.all(np.isfinite(u)) or not np.isfinite(nll):
            converged = True  # NA/Inf guard: stop (reference falls back to nelder_mead)
        if converged:
            num_it = it + 1
            break

    result = OptimResult(
        cov_pars=engine.back_transform_pars(np.exp(u)),
        cov_pars_internal=np.exp(u),
        num_it=num_it,
        neg_log_likelihood=nll,
        converged=converged,
        trajectory=trajectory,
    )
    if has_covariates:
        result.coef = handler.back_transform(beta)
    return result


def _update_coef_gd(engine, y, X, beta, u, lr_coef, it, config,
                    nll_lag1, beta_after_grad, beta_after_grad_lag1,
                    handler, C_mu, C_sigma2):
    """One gradient-descent step for linear coefficients
    (re_model_template.h:9106 UpdateLinCoef)."""
    sigma2 = np.exp(u[0])
    resid = y - X @ beta
    g_beta = np.asarray(engine.coef_grad(
        jnp.asarray(u[1:]), jnp.asarray(sigma2), jnp.asarray(resid), jnp.asarray(X)))
    # AvoidTooLargeLearningRateCoef (re_model_template.h:5393)
    lr_coef = min(lr_coef, handler.max_lr(beta, g_beta, C_mu, C_sigma2))
    dir_deriv = -float(g_beta @ g_beta)
    use_acc = config.use_nesterov_acc and config.optimizer_coef == "gradient_descent"
    mom_dir_deriv = float(g_beta @ (beta - beta_after_grad)) if use_acc else 0.0

    lr = lr_coef
    acc_rate = config.acc_rate_coef
    halving_done = False
    nll_new = nll_lag1
    for ih in range(MAX_NUM_LR_SHRINKAGE_STEPS):
        beta_grad_new = beta - lr * g_beta
        if use_acc:
            mu = nesterov_mu(it, config.nesterov_schedule_version, acc_rate,
                             config.momentum_offset)
            beta_new = (1.0 + mu) * beta_grad_new - mu * beta_after_grad_lag1
        else:
            mu = 0.0
            beta_new = beta_grad_new
        resid_new = y - X @ beta_new
        nll_new, quad_new = [float(v) for v in engine.nll_parts(
            jnp.asarray(u[1:]), jnp.asarray(sigma2), jnp.asarray(resid_new))]
        bound = (nll_lag1 + C_ARMIJO * lr * dir_deriv + C_ARMIJO_MOM * mu * mom_dir_deriv)
        if nll_new <= bound:
            break
        halving_done = True
        lr *= LR_SHRINKAGE_FACTOR
        acc_rate *= 0.5
    if halving_done:
        lr_coef = lr
    beta_after_grad_lag1 = beta_grad_new.copy()
    return (beta_new, resid_new, nll_new, quad_new, lr_coef,
            beta_grad_new, beta_after_grad_lag1)


# ----------------------------------------------------------------------
def optimize_laplace(engine, y, config: OptimConfig, X=None,
                     offset=None) -> OptimResult:
    """Estimate (cov pars, aux pars, coefs) for non-Gaussian likelihoods via
    the Laplace approximation (OptimLinRegrCoefCovPar non-Gaussian branch)."""
    opt = config.optimizer_cov
    if opt in ("gradient_descent",):
        if getattr(engine, "num_sets_fe", 1) == 2:
            raise ValueError(
                "optimizer_cov='gradient_descent' is not supported for "
                "two-predictor likelihoods; use 'lbfgs' (the default)")
        return _optimize_laplace_gd(engine, y, config, X, offset)
    if opt in ("lbfgs", "lbfgs_linesearch_nocedal_wright", "nelder_mead", "adam",
               "bfgs_optim_lib"):
        use_device = config.use_device_optimizer
        if use_device is None:
            # auto-enable only for engines whose NLL surface is validated
            # with the on-device safeguarded L-BFGS (device_opt_auto flag);
            # use_device_optimizer=True forces it for any Laplace engine
            use_device = (engine.n >= 20000
                          and getattr(engine, "device_opt_auto", False))
        if (use_device and opt.startswith("lbfgs")
                and hasattr(engine, "_nll_raw")):
            return _optimize_laplace_device(engine, y, config, X, offset)
        return _optimize_laplace_external(engine, y, config, X, offset)
    if opt in ("fisher_scoring", "newton"):
        raise ValueError(
            f"optimizer_cov '{opt}' is not supported for non-Gaussian likelihoods")
    raise ValueError(f"optimizer_cov '{opt}' is not supported")


def _laplace_u0(engine, y, config):
    """Initial internal parameter vector [log cov pars (transformed), log aux]."""
    t = engine.transform_pars(np.asarray(config.init_cov_pars, dtype=np.float64))
    u = np.log(t)
    if engine.num_aux:
        if getattr(config, "init_aux_pars", None) is not None:
            aux0 = engine.likelihood.aux_to_internal(
                np.asarray(config.init_aux_pars, dtype=np.float64))
        else:
            aux0 = engine.likelihood.init_aux(np.asarray(y))
        u = np.concatenate([u, np.log(aux0)])
    return u


def _laplace_est_mask(engine, config):
    est = np.ones(engine.num_par, dtype=bool)
    if config.estimate_cov_par_index is not None:
        idx = np.asarray(config.estimate_cov_par_index)
        est[:engine.num_theta] = idx > 0
    if engine.num_aux and not getattr(config, "estimate_aux_pars", True):
        est[engine.num_theta:] = False
    return est


def _optimize_laplace_gd(engine, y, config: OptimConfig, X=None, offset=None):
    import jax.numpy as jnp

    n = engine.n
    est = _laplace_est_mask(engine, config)
    p_cov = engine.num_theta
    use_nesterov = config.use_nesterov_acc
    delta_rel_conv = config.resolved_delta_rel_conv()
    yd = jnp.asarray(np.asarray(y, dtype=np.float64))
    has_covariates = X is not None
    offs = np.zeros(n) if offset is None else np.asarray(offset, dtype=np.float64)
    u = _laplace_u0(engine, y, config)
    handler = None
    beta = None
    C_mu = C_sigma2 = 1.0
    if has_covariates:
        handler = CovariateHandler(X, scale=True)
        X = handler.X
        tot_var = float(np.sum(np.asarray(config.init_cov_pars)[
            [off for off in engine.par_offsets]]))
        beta = handler.init_beta(engine.likelihood, y, tot_var,
                                 None if offset is None else offs)
        C_mu, C_sigma2 = engine.likelihood.cap_constants(np.asarray(y), offs)
    beta_after_grad = beta.copy() if has_covariates else None
    beta_after_grad_lag1 = beta.copy() if has_covariates else None
    lr_coef = config.lr_coef

    def F_of(beta_):
        F = offs.copy()
        if has_covariates and beta_ is not None:
            F = F + X @ beta_
        return jnp.asarray(F)
    a_state = engine.zero_mode()
    Fd = F_of(beta)
    nll, a_state = engine.laplace_nll(u, yd, Fd, a_state)

    lr_cov = config.resolved_lr_cov()
    lr_aux = lr_cov
    pars_after_grad = np.exp(u).copy()
    pars_after_grad_lag1 = np.exp(u).copy()
    max_iter = config.maxit if config.maxit else config.max_iter
    num_it = max_iter
    converged = False

    for it in range(max_iter):
        nll_lag1 = nll
        u_lag1 = u.copy()

        # ---- coefficient gradient-descent step --------------------------
        if has_covariates:
            nll_b, gu, gF, _ = engine.laplace_vag_F(u, yd, F_of(beta), a_state)
            g_beta = X.T @ gF
            lr_coef = min(lr_coef, handler.max_lr(beta, g_beta, C_mu, C_sigma2))
            dird_b = -float(g_beta @ g_beta)
            mom_b = float(g_beta @ (beta - beta_after_grad)) if use_nesterov else 0.0
            lr_b = lr_coef
            acc_b = config.acc_rate_coef
            halved = False
            for ih in range(MAX_NUM_LR_SHRINKAGE_STEPS):
                beta_grad_new = beta - lr_b * g_beta
                mu = (nesterov_mu(it, config.nesterov_schedule_version, acc_b,
                                  config.momentum_offset) if use_nesterov else 0.0)
                beta_new = (1.0 + mu) * beta_grad_new - mu * beta_after_grad_lag1
                nll_new_b, a_cand = engine.laplace_nll(u, yd, F_of(beta_new), a_state)
                if nll_new_b <= (nll_lag1 + C_ARMIJO * lr_b * dird_b
                                 + C_ARMIJO_MOM * mu * mom_b):
                    break
                halved = True
                lr_b *= LR_SHRINKAGE_FACTOR
                acc_b *= 0.5
            if halved:
                lr_coef = lr_b
            beta = beta_new
            beta_after_grad = beta_grad_new
            beta_after_grad_lag1 = beta_grad_new.copy()
            a_state = a_cand
            nll_after_coef = nll_new_b
        else:
            nll_after_coef = nll_lag1
        Fd = F_of(beta)

        # ---- covariance/aux parameter step ------------------------------
        _, g, a_state = engine.laplace_vag(u, yd, Fd, a_state)
        g = np.array(g)
        g[~est] = 0.0
        g_cov, g_aux = g[:p_cov], g[p_cov:]
        if np.max(np.abs(g_cov), initial=0.0) > 0:
            lr_cov = min(lr_cov, MAX_GRADIENT_UPDATE_LOG_SCALE / np.max(np.abs(g_cov)))
        if g_aux.size and np.max(np.abs(g_aux), initial=0.0) > 0:
            lr_aux = min(lr_aux, MAX_GRADIENT_UPDATE_LOG_SCALE / np.max(np.abs(g_aux)))
        dir_cov = -float(g_cov @ g_cov)
        dir_aux = -float(g_aux @ g_aux) if g_aux.size else 0.0
        if use_nesterov:
            delta_log = u - np.log(pars_after_grad)
            mom_cov = float(g_cov @ delta_log[:p_cov])
            mom_aux = float(g_aux @ delta_log[p_cov:]) if g_aux.size else 0.0
        else:
            mom_cov = mom_aux = 0.0

        lrc, lra = lr_cov, lr_aux
        acc_rate = config.acc_rate_cov
        halving_done = False
        for ih in range(MAX_NUM_LR_SHRINKAGE_STEPS):
            step = np.concatenate([lrc * g_cov, lra * g_aux])
            u_grad_new = u - np.where(est, step, 0.0)
            if use_nesterov:
                mu = nesterov_mu(it, config.nesterov_schedule_version, acc_rate,
                                 config.momentum_offset)
                u_cand = (1.0 + mu) * u_grad_new - mu * np.log(pars_after_grad_lag1)
            else:
                mu = 0.0
                u_cand = u_grad_new
            nll_new, a_cand = engine.laplace_nll(u_cand, yd, Fd, a_state)
            ok = nll_new <= (nll_after_coef + C_ARMIJO * lrc * dir_cov
                             + C_ARMIJO_MOM * mu * mom_cov)
            if g_aux.size:
                ok = ok and nll_new <= (nll_after_coef + C_ARMIJO * lra * dir_aux
                                        + C_ARMIJO_MOM * mu * mom_aux)
            if ok:
                break
            halving_done = True
            lrc *= LR_SHRINKAGE_FACTOR
            lra *= LR_SHRINKAGE_FACTOR
            acc_rate *= 0.5
            # mode was advanced by the rejected candidate: keep warm-starting
            # from the accepted base point instead (ResetModeToPreviousValue)
        if halving_done:
            lr_cov, lr_aux = lrc, lra
        pars_after_grad_lag1 = np.exp(u_grad_new).copy()
        pars_after_grad = np.exp(u_grad_new).copy()
        u = u_cand
        nll = nll_new
        a_state = a_cand

        # ---- convergence ------------------------------------------------
        if config.convergence_criterion == "relative_change_in_log_likelihood":
            if (nll_lag1 - nll) <= delta_rel_conv * max(abs(nll_lag1), 1.0):
                converged = True
        elif config.convergence_criterion == "relative_change_in_parameters":
            t_now, t_lag = np.exp(u), np.exp(u_lag1)
            if np.linalg.norm(t_now - t_lag) <= delta_rel_conv * np.linalg.norm(t_lag):
                converged = True
        if not np.all(np.isfinite(u)) or not np.isfinite(nll):
            converged = True
        if converged:
            num_it = it + 1
            break

    beta_out = handler.back_transform(beta) if has_covariates else None
    return _laplace_result(engine, u, nll, num_it, converged, beta_out, a_state)


def _laplace_result(engine, u, nll, num_it, converged, beta, a_state):
    p_cov = engine.num_theta
    result = OptimResult(
        cov_pars=engine.back_transform_pars(np.exp(u[:p_cov])),
        cov_pars_internal=np.exp(u[:p_cov]),
        num_it=num_it,
        neg_log_likelihood=nll,
        converged=converged,
    )
    result.coef = beta
    result.aux_pars = engine.likelihood.aux_from_internal(np.exp(u[p_cov:])) \
        if engine.num_aux else None
    result.mode_state = a_state
    return result


def _optimize_laplace_external(engine, y, config: OptimConfig, X=None, offset=None):
    from scipy import optimize as sopt
    import jax.numpy as jnp

    n = engine.n
    nsets = getattr(engine, "num_sets_fe", 1)
    est = _laplace_est_mask(engine, config)
    yd = jnp.asarray(np.asarray(y, dtype=np.float64))
    has_covariates = X is not None
    if offset is None:
        offs = np.zeros(n * nsets)
    else:
        offs = np.asarray(offset, dtype=np.float64)
        if nsets == 2 and len(offs) == n:
            offs = np.concatenate([offs, np.zeros(n)])
    u0 = _laplace_u0(engine, y, config)
    handler = None
    beta0 = None
    if has_covariates:
        handler = CovariateHandler(
            X, scale=config.optimizer_cov in ("lbfgs", "bfgs_optim_lib",
                                              "lbfgs_linesearch_nocedal_wright"))
        X = handler.X
        k = X.shape[1]
        tot_var = float(np.sum(np.asarray(config.init_cov_pars)[
            [off for off in engine.par_offsets]]))
        beta0 = handler.init_beta(engine.likelihood, y, tot_var,
                                  None if offset is None else offs[:n])
        if nsets == 2:
            # second (zeta) block: intercept from init_intercept2
            # (FindInitialIntercept ind_set_re = 1)
            beta0_2 = np.zeros(k)
            lik = engine.likelihood
            if handler.intercept_col is not None \
                    and hasattr(lik, "init_intercept2"):
                beta0_2[handler.intercept_col] = lik.init_intercept2(
                    y, tot_var, None if offset is None else offs) \
                    / handler.X_orig[0, handler.intercept_col]
            beta0 = np.concatenate([beta0, beta0_2])

    def F_of(beta):
        if not has_covariates:
            return offs
        if nsets == 2:
            return offs + np.concatenate([X @ beta[:k], X @ beta[k:]])
        return offs + X @ beta

    state = {"a": engine.zero_mode()}

    def unpack(x):
        u = u0.copy()
        u[est] = x[:est.sum()]
        beta = x[est.sum():] if has_covariates else None
        return u, beta

    def obj(x):
        u, beta = unpack(x)
        F = F_of(beta)
        if has_covariates:
            nll, gu, gF, a = engine.laplace_vag_F(u, yd, jnp.asarray(F), state["a"])
            if nsets == 2:
                g = np.concatenate([gu[est], X.T @ gF[:n], X.T @ gF[n:]])
            else:
                g = np.concatenate([gu[est], X.T @ gF])
        else:
            nll, gu, a = engine.laplace_vag(u, yd, jnp.asarray(F), state["a"])
            g = gu[est]
        if not (np.isfinite(nll) and np.all(np.isfinite(g))):
            # NaN guard with Laplace-mode reset: keep the previous (finite)
            # mode so the diverged evaluation does not poison the warm start
            # (ResetLaplaceApproxModeToPreviousValue,
            # re_model_template.h:2593); return a large finite value so the
            # line search backtracks
            return 1e12, np.zeros_like(g)
        state["a"] = a
        return nll, g

    x0 = u0[est]
    if has_covariates:
        x0 = np.concatenate([x0, beta0])
    max_iter = config.maxit if config.maxit else config.max_iter

    opt = config.optimizer_cov
    if opt == "nelder_mead":
        r = sopt.minimize(lambda x: obj(x)[0], x0, method="Nelder-Mead",
                          options={"maxiter": max_iter * 10, "xatol": 1e-10,
                                   "fatol": config.resolved_delta_rel_conv()})
        nit = r.nit
    elif opt == "adam":
        import optax
        opt_adam = optax.adam(1e-2)
        st = opt_adam.init(x0)
        x = x0.copy()
        f_prev = np.inf
        drc = config.resolved_delta_rel_conv()
        nit = max_iter * 10
        for i in range(max_iter * 10):
            f, gg = obj(x)
            upd, st = opt_adam.update(gg, st)
            x = x + np.asarray(upd)
            if abs(f_prev - f) <= drc * max(abs(f_prev), 1.0) and i > 50:
                nit = i + 1
                break
            f_prev = f
        r = type("R", (), {"x": x})
    else:
        r = sopt.minimize(obj, x0, jac=True, method="L-BFGS-B",
                          options={"maxiter": max_iter, "ftol": 1e-16,
                                   "gtol": 1e-10, "maxcor": 20})
        nit = r.nit
    u, beta = unpack(r.x)
    F = F_of(beta)
    nll, a = engine.laplace_nll(u, yd, jnp.asarray(F), state["a"])
    if has_covariates:
        if nsets == 2:
            beta_out = np.concatenate([handler.back_transform(beta[:k]),
                                       handler.back_transform(beta[k:])])
        else:
            beta_out = handler.back_transform(beta)
    else:
        beta_out = None
    return _laplace_result(engine, u, nll, int(nit), True, beta_out, a)


def _optimize_laplace_device(engine, y, config: OptimConfig, X=None,
                             offset=None):
    """The whole non-Gaussian (Laplace) L-BFGS fit as ONE device dispatch:
    the engine's custom-VJP marginal NLL (with its inner Newton/CG mode
    finding) evaluated inside the state-threaded on-device L-BFGS
    (ops/lbfgs.lbfgs_run_state). The Laplace mode is warm-started across
    every objective evaluation exactly like the host loop's ``state["a"]``
    carry, and a non-finite trial keeps the previous finite mode
    (ResetLaplaceApproxModeToPreviousValue, re_model_template.h:2593;
    mode warm starts likelihoods.h:3746-3752). Replaces host-driven scipy
    at large n, where per-evaluation device round-trips dominate, and
    stops at the configured relative-objective tolerance (LBFGSpp `delta`
    = delta_rel_conv, optim_utils.h:653-674) instead of running to maxit."""
    import jax
    from ..ops.lbfgs import lbfgs_run_state

    n = engine.n
    nsets = getattr(engine, "num_sets_fe", 1)
    est = _laplace_est_mask(engine, config)
    dt = getattr(engine, "dtype", jnp.float64)
    yd = jnp.asarray(np.asarray(y, dtype=np.float64), dt)
    has_covariates = X is not None
    if offset is None:
        offs = np.zeros(n * nsets)
    else:
        offs = np.asarray(offset, dtype=np.float64)
        if nsets == 2 and len(offs) == n:
            offs = np.concatenate([offs, np.zeros(n)])
    u0 = _laplace_u0(engine, y, config)
    handler = None
    beta0 = None
    k = 0
    if has_covariates:
        handler = CovariateHandler(X, scale=True)
        k = handler.X.shape[1]
        tot_var = float(np.sum(np.asarray(config.init_cov_pars)[
            [off for off in engine.par_offsets]]))
        beta0 = handler.init_beta(engine.likelihood, y, tot_var,
                                  None if offset is None else offs[:n])
        if nsets == 2:
            beta0_2 = np.zeros(k)
            lik = engine.likelihood
            if handler.intercept_col is not None \
                    and hasattr(lik, "init_intercept2"):
                beta0_2[handler.intercept_col] = lik.init_intercept2(
                    y, tot_var, None if offset is None else offs) \
                    / handler.X_orig[0, handler.intercept_col]
            beta0 = np.concatenate([beta0, beta0_2])
        Xd = jnp.asarray(handler.X, dt)

    est_idx = np.where(est)[0]
    ne = len(est_idx)
    nll_raw = engine._nll_raw

    def make_run():
        est_ij = jnp.asarray(est_idx)

        def run(x0, b0, yd_, offs_, u0f, Xd_, it, ft):
            def obj(x, b):
                u = u0f.at[est_ij].set(x[:ne])
                if has_covariates:
                    beta = x[ne:]
                    if nsets == 2:
                        F = offs_ + jnp.concatenate(
                            [Xd_ @ beta[:k], Xd_ @ beta[k:]])
                    else:
                        F = offs_ + Xd_ @ beta
                else:
                    F = offs_
                nll, aux = nll_raw(u, F, yd_, b)
                return nll, aux[0]

            def vag(x, st):
                (f, b_new), g = jax.value_and_grad(
                    obj, has_aux=True)(x, st)
                return f, g, b_new

            return lbfgs_run_state(vag, x0, b0, it, ftol=ft)

        return lifted_jit(run)

    key = ("laplace_lbfgs_device", has_covariates, tuple(est_idx),
           k, nsets, str(dt))
    cache = getattr(engine, "_device_opt_cache", None)
    if cache is None:
        cache = engine._device_opt_cache = {}
    if key not in cache:
        cache[key] = make_run()
    run = cache[key]

    x0 = u0[est_idx]
    if has_covariates:
        x0 = np.concatenate([x0, beta0])
    max_iter = config.maxit if config.maxit else min(config.max_iter, 1000)
    ftol = config.resolved_delta_rel_conv()
    x, _f, b_state, nit, conv = run(
        jnp.asarray(x0, dt), engine.zero_mode(), yd,
        jnp.asarray(offs, dt), jnp.asarray(u0, dt),
        Xd if has_covariates else jnp.zeros((0,), dt),
        jnp.asarray(max_iter, jnp.int32), jnp.asarray(ftol, dt))

    x = np.asarray(x, dtype=np.float64)
    u = u0.copy()
    u[est_idx] = x[:ne]
    beta = x[ne:] if has_covariates else None
    F = offs.copy()
    if has_covariates:
        if nsets == 2:
            F = offs + np.concatenate([handler.X @ beta[:k],
                                       handler.X @ beta[k:]])
        else:
            F = offs + handler.X @ beta
    nll, a = engine.laplace_nll(u, yd, jnp.asarray(F, dt), b_state)
    if has_covariates:
        if nsets == 2:
            beta_out = np.concatenate([handler.back_transform(beta[:k]),
                                       handler.back_transform(beta[k:])])
        else:
            beta_out = handler.back_transform(beta)
    else:
        beta_out = None
    return _laplace_result(engine, u, float(nll), int(nit), bool(conv),
                           beta_out, a)


# ----------------------------------------------------------------------
def _optimize_external_origscale(engine, y, config: OptimConfig, X, est) -> OptimResult:
    """External optimization on log-original-scale pars with true fixing."""
    from scipy import optimize as sopt

    y = np.asarray(y, dtype=np.float64)
    yd = jnp.asarray(y)
    has_covariates = X is not None
    if has_covariates:
        X = np.asarray(X, dtype=np.float64)
        Xd = jnp.asarray(X)
    lp0 = np.log(np.asarray(config.init_cov_pars, dtype=np.float64))

    def obj(x):
        lp = lp0.copy()
        lp[est] = x
        if has_covariates:
            t = engine.transform_pars(np.exp(lp))
            beta = np.asarray(engine.wls_coef(jnp.asarray(np.log(t[1:])), yd, Xd))
            residd = jnp.asarray(y - X @ beta)
        else:
            residd = yd
        val, grad = engine.nll_orig_vag(jnp.asarray(lp), residd)
        return float(val), np.asarray(grad)[est]

    x0 = lp0[est]
    max_iter = config.maxit if config.maxit else config.max_iter
    if config.optimizer_cov == "nelder_mead":
        r = sopt.minimize(lambda x: obj(x)[0], x0, method="Nelder-Mead",
                          options={"maxiter": max_iter * 10, "xatol": 1e-12,
                                   "fatol": 1e-12})
    else:
        r = sopt.minimize(obj, x0, jac=True, method="L-BFGS-B",
                          options={"maxiter": max_iter, "ftol": 1e-14,
                                   "gtol": 1e-9})
    lp = lp0.copy()
    lp[est] = r.x
    pars = np.exp(lp)
    beta = None
    if has_covariates:
        t = engine.transform_pars(pars)
        beta = np.asarray(engine.wls_coef(jnp.asarray(np.log(t[1:])), yd, Xd))
        residd = jnp.asarray(y - X @ beta)
    else:
        residd = yd
    nll = float(engine.nll_orig_vag(jnp.asarray(lp), residd)[0])
    result = OptimResult(
        cov_pars=pars,
        cov_pars_internal=engine.transform_pars(pars),
        num_it=int(r.nit),
        neg_log_likelihood=nll,
        converged=True,
    )
    result.coef = beta
    return result


def _optimize_external_device(engine, y, config: OptimConfig, X, est):
    """The whole L-BFGS fit as ONE device dispatch (ops/lbfgs.py): profiled
    objective (+ closed-form GLS coefficients when X is given) inside a
    jitted lax.while_loop. Replaces host-driven scipy for large n, where
    per-evaluation device round-trips dominate wall-clock."""
    import jax
    from ..ops.lbfgs import lbfgs_run

    n = engine.n
    est_theta = est[1:]
    dt = getattr(engine, "dtype", jnp.float64)
    y = np.asarray(y, dtype=np.float64)
    yd = jnp.asarray(y, dt)
    rs = getattr(engine, "_row_sharding", None)
    if rs is not None:
        yd = jax.device_put(yd, rs)
    has_covariates = X is not None
    Xd = jnp.asarray(np.asarray(X, dtype=np.float64), dt) if has_covariates \
        else None

    t0 = engine.transform_pars(np.asarray(config.init_cov_pars, dtype=np.float64))
    theta0 = np.log(t0[1:])
    free_idx = np.where(est_theta)[0]
    theta0_d = jnp.asarray(theta0, dt)

    def vag_builder():
        def obj(theta_free):
            theta = theta0_d.at[jnp.asarray(free_idx)].set(theta_free) \
                if len(free_idx) < len(theta0) else theta_free
            if has_covariates:
                beta = engine.wls_coef_raw(theta, yd, Xd)
                resid = yd - Xd @ beta
            else:
                beta = jnp.zeros((0,), dt)
                resid = yd
            val, quad = engine.nll_profiled_raw(theta, resid)
            return val, (quad, beta)

        def vag(x):
            # quad & beta ride along as aux so the final covariance state
            # needs NO separate compiled evaluation after the run
            (f, aux), g = jax.value_and_grad(obj, has_aux=True)(x)
            return f, g, aux

        return vag

    key = ("lbfgs_device", has_covariates, tuple(free_idx))
    cache = getattr(engine, "_device_opt_cache", None)
    if cache is None:
        cache = engine._device_opt_cache = {}
    if key not in cache:
        vag = vag_builder()
        cache[key] = lifted_jit(
            lambda x0, it, ft: lbfgs_run(vag, x0, it, ftol=ft,
                                         has_aux=True))
    run = cache[key]

    max_iter = config.maxit if config.maxit else min(config.max_iter, 1000)
    # converge at the configured relative-objective tolerance (LBFGSpp's
    # `delta` = delta_rel_conv, optim_utils.h:653-674) instead of running
    # to maxit
    ftol = config.resolved_delta_rel_conv()
    x0 = jnp.asarray(theta0[free_idx], dt)
    x, nll, (quad, beta_d), k, _conv = run(x0, max_iter, ftol)
    theta = theta0.copy()
    theta[free_idx] = np.asarray(x, dtype=np.float64)
    # final state came back as L-BFGS aux — no extra compiled evaluation
    beta = np.asarray(beta_d, dtype=np.float64) if has_covariates else None
    sigma2 = float(quad) / n
    internal = np.concatenate([[sigma2], np.exp(theta)])
    internal = engine.apply_nugget_lower_bound(internal)
    result = OptimResult(
        cov_pars=engine.back_transform_pars(internal),
        cov_pars_internal=internal,
        num_it=int(k),
        neg_log_likelihood=float(nll),
        converged=True,
    )
    result.coef = beta
    return result


def _optimize_external(engine, y, config: OptimConfig, X=None) -> OptimResult:
    """lbfgs / nelder_mead / adam on the profiled objective (optim_utils.h:562)."""
    from scipy import optimize as sopt

    n = engine.n
    est = _est_mask(engine, config)
    use_device = config.use_device_optimizer
    if use_device is None:
        use_device = n >= 20000
    if (use_device and config.optimizer_cov.startswith("lbfgs")
            and config.optimizer_cov != "lbfgs_not_profile_out_nugget"
            and est[0] and hasattr(engine, "nll_profiled_raw")
            and (X is None or hasattr(engine, "wls_coef_raw"))):
        return _optimize_external_device(engine, y, config, X, est)
    est_theta = est[1:]
    y = np.asarray(y, dtype=np.float64)
    has_covariates = X is not None
    if has_covariates:
        X = np.asarray(X, dtype=np.float64)
        Xd = jnp.asarray(X)
    yd = jnp.asarray(y)

    t0 = engine.transform_pars(np.asarray(config.init_cov_pars, dtype=np.float64))
    theta0 = np.log(t0[1:])
    log_s2_fixed = math.log(t0[0])
    profile_sigma2 = bool(est[0])

    neval = [0]

    def obj_and_grad(theta_free):
        theta = theta0.copy()
        theta[est_theta] = theta_free
        if has_covariates:
            beta = np.asarray(engine.wls_coef(jnp.asarray(theta), yd, Xd))
            residd = jnp.asarray(y - X @ beta)
        else:
            residd = yd
        if profile_sigma2:
            (val, _quad), grad = engine.nll_profiled_vag(jnp.asarray(theta), residd)
        else:
            val, grad = engine.grad_profiled(
                jnp.asarray(theta), jnp.asarray(math.exp(log_s2_fixed)), residd)
        neval[0] += 1
        g = np.asarray(grad)[est_theta]
        return float(val), g

    x0 = theta0[est_theta]
    opt = config.optimizer_cov
    max_iter = config.maxit if config.maxit else config.max_iter

    if x0.size == 0:
        # nothing to estimate except possibly the profiled nugget
        res_x = x0
        nit = 0
    elif opt in ("lbfgs", "lbfgs_linesearch_nocedal_wright", "bfgs_optim_lib",
                 "lbfgs_not_profile_out_nugget"):
        r = sopt.minimize(obj_and_grad, x0, jac=True, method="L-BFGS-B",
                          options={"maxiter": max_iter, "ftol": 1e-16,
                                   "gtol": 1e-12, "maxcor": 20})
        res_x, nit = r.x, r.nit
    elif opt == "nelder_mead":
        drc = config.resolved_delta_rel_conv()
        f0 = obj_and_grad(x0)[0]
        r = sopt.minimize(lambda x: obj_and_grad(x)[0], x0, method="Nelder-Mead",
                          options={"maxiter": max_iter * 10,
                                   "fatol": drc * max(abs(f0), 1.0),
                                   "xatol": 1e-12})
        res_x, nit = r.x, r.nit
    elif opt == "adam":
        import optax
        opt_adam = optax.adam(1e-2)
        state = opt_adam.init(x0)
        x = x0.copy()
        f_prev = np.inf
        drc = config.resolved_delta_rel_conv()
        nit = 0
        for i in range(max_iter * 10):
            f, g = obj_and_grad(x)
            upd, state = opt_adam.update(g, state)
            x = x + np.asarray(upd)
            if abs(f_prev - f) <= drc * max(abs(f_prev), 1.0) and i > 50:
                nit = i + 1
                break
            f_prev = f
        res_x = x
        if nit == 0:
            nit = max_iter * 10
    else:
        raise AssertionError(opt)

    theta = theta0.copy()
    theta[est_theta] = res_x
    if has_covariates:
        beta = np.asarray(engine.wls_coef(jnp.asarray(theta), yd, Xd))
        resid = y - X @ beta
        residd = jnp.asarray(resid)
    else:
        beta = None
        residd = yd
    if profile_sigma2:
        # the profiled objective returns quad as aux: sigma2_hat = quad / n and
        # nll(theta, sigma2_hat) equals the profiled value — no second graph
        (nll, quad), _ = engine.nll_profiled_vag(jnp.asarray(theta), residd)
        sigma2 = float(quad) / n
    else:
        nll, _ = engine.grad_profiled(
            jnp.asarray(theta), jnp.asarray(math.exp(log_s2_fixed)), residd)
        sigma2 = math.exp(log_s2_fixed)

    internal = np.concatenate([[sigma2], np.exp(theta)])
    internal = engine.apply_nugget_lower_bound(internal)
    cov_pars_out = engine.back_transform_pars(internal)
    # Fixed variance parameters are reported at their original-scale values
    # even though the internal (nugget-scaled) coordinate was what was held
    # fixed (MaybeKeepVarianceConstant, re_model_template.h:7836).
    if config.estimate_cov_par_index is not None and est[0]:
        variance_idx = np.asarray([1 + off for off in engine.par_offsets])
        fixed_var = variance_idx[~est[variance_idx]]
        init_orig = np.asarray(config.init_cov_pars, dtype=np.float64)
        cov_pars_out[fixed_var] = init_orig[fixed_var]
    result = OptimResult(
        cov_pars=cov_pars_out,
        cov_pars_internal=internal,
        num_it=int(nit),
        neg_log_likelihood=float(nll),
        converged=True,
    )
    if has_covariates:
        result.coef = beta
    return result
