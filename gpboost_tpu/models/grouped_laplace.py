"""RE-scale Laplace engine for grouped-random-effects-only non-Gaussian models.

Reference: likelihoods.h:2959 FindModePostRandEffCalcMLLGroupedRE (sparse
q-dimensional mode finding) and :3223
FindModePostRandEffCalcMLLOnlyOneGroupedRECalculationsOnREScale (diagonal
q-scale path for a single grouping), :4469/:5069
CalcGradNegMargLikelihoodLaplaceApproxGroupedRE / OnlyOneGroupedRE,
:7253ff PredictLaplaceApprox* (grouped variants).

The latent vector is b in R^q (q = total number of RE levels across
components), with prior b ~ N(0, Sigma_b), Sigma_b = blockdiag(v_j I_{m_j}),
and observation design Zb (Z has one entry per (row, component): an indicator
for intercepts, the covariate value for random slopes). The Laplace objective:

    nll = 0.5 b' Sigma_b^-1 b - loglik(y, Zb + F)
          + 0.5 log|I_q + Sigma_b (Z'WZ)|,
    mode: H db = Z'd1 - Sigma_b^-1 b with H = Sigma_b^-1 + Z'WZ  (q x q).

Everything data-sized is a gather (Zb) or a scatter-add (Z'v, Z'WZ); the
per-iteration factorization is a q x q Cholesky (dense, MXU-friendly) — or
fully diagonal when there is a single grouped component, in which case the
whole engine is O(n + q) per Newton step and scales to millions of levels.

Gradients wrt covariance parameters, auxiliary parameters and fixed effects F
come from one implicit-function-theorem custom_vjp around the solved mode
(same pattern as models/laplace.py), replacing the reference's per-structure
hand-written gradient code. Negative Hessian entries (zero-inflated counts)
need no special casing here: H is assembled directly (no sqrt(W)), its
Cholesky fails only when H is indefinite, and such iterates are rejected by
the Armijo backtracking — mirroring the reference's NaN guards.
"""

from ..ops.jit_utils import lifted_jit
import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

DELTA_CONV_MODE = 1e-8
MAXIT_MODE_NEWTON = 1000
MAX_LR_SHRINK_MODE = 20
C_ARMIJO = 1e-4


class GroupedRELaplaceEngine:
    """Laplace-approximated NLL / gradients / prediction on the RE scale."""

    is_gaussian = False
    # the on-device safeguarded L-BFGS (_optimize_laplace_device) is
    # validated against the host path for this engine and auto-enabled at
    # large n; other Laplace engines need use_device_optimizer=True
    device_opt_auto = True

    def __init__(self, components, num_data, likelihood, cluster_ids=None,
                 dtype=jnp.float64, weights=None):
        self.components = list(components)
        assert all(c.kind == "grouped" for c in self.components)
        if cluster_ids is not None:
            # independence across clusters == refining each grouping by the
            # cluster id (re_model_template.h:6775 SetUpClusterIds)
            for comp in self.components:
                comp.refine_by_cluster(np.asarray(cluster_ids))
        self.n = int(num_data)
        self.dtype = dtype
        self.likelihood = likelihood
        self.weights = None if weights is None else jnp.asarray(
            np.asarray(weights, dtype=np.float64), dtype)
        self.num_theta = len(self.components)
        self.num_cov_par = self.num_theta
        self.par_offsets = list(range(self.num_theta))
        self.num_aux = likelihood.num_aux
        self.num_par = self.num_theta + self.num_aux

        self.block_sizes = [c.num_groups for c in self.components]
        self.level_off = np.concatenate([[0], np.cumsum(self.block_sizes)])
        self.q = int(self.level_off[-1])
        self.diag_path = (self.num_theta == 1)

        idx = []
        w = []
        for j, c in enumerate(self.components):
            idx.append(c.group_codes.astype(np.int64) + self.level_off[j])
            w.append(np.ones(self.n) if c.z is None else
                     np.asarray(c.z, dtype=np.float64))
        self._idx_np = np.stack(idx)                    # (ncomp, n)
        self._w_np = np.stack(w)
        self._idx = jnp.asarray(self._idx_np)
        self._wmat = jnp.asarray(self._w_np, dtype)
        self._flat_idx = self._idx.reshape(-1)
        if not self.diag_path:
            # flattened (j, k)-pair indices for the q x q Z'WZ scatter
            pf, pw = [], []
            for j in range(self.num_theta):
                for k in range(self.num_theta):
                    pf.append(self._idx_np[j] * self.q + self._idx_np[k])
                    pw.append(self._w_np[j] * self._w_np[k])
            self._pair_flat = jnp.asarray(np.concatenate(pf))
            self._pair_w = jnp.asarray(np.concatenate(pw), dtype)
        # ---- padded-by-group layout (TPU-native segment elimination) ----
        # For the single-grouping case, rows regrouped into a (q, s_max)
        # padded matrix turn every per-Newton-iteration segment_sum /
        # gather of the mode finder into dense masked row reductions —
        # scatters on this TPU cost ~ms each while a (q, s_max) masked
        # reduction is microseconds. Only used when padding inflates the
        # cell count by <= 4x (pathologically imbalanced groups fall back
        # to the scatter path).
        self._padded = None
        if self.diag_path:
            codes = self._idx_np[0]
            counts = np.bincount(codes, minlength=self.q)
            s_max = int(counts.max()) if len(counts) else 0
            if s_max > 0 and self.q * s_max <= 4 * self.n:
                order = np.argsort(codes, kind="stable")
                pad_idx = np.zeros((self.q, s_max), dtype=np.int64)
                pad_mask = np.zeros((self.q, s_max), dtype=bool)
                pos = 0
                for g in range(self.q):
                    c = counts[g]
                    pad_idx[g, :c] = order[pos:pos + c]
                    pad_mask[g, :c] = True
                    pos += c
                self._padded = {
                    "idx": jnp.asarray(pad_idx),
                    "mask": jnp.asarray(pad_mask.astype(np.float64), dtype),
                    "s_max": s_max,
                }
        block_id = np.concatenate([
            np.full(m, j) for j, m in enumerate(self.block_sizes)])
        self._block_id = jnp.asarray(block_id)
        oneh = np.zeros((self.q, self.num_theta))
        oneh[np.arange(self.q), block_id] = 1.0
        self._oneh = jnp.asarray(oneh, dtype=dtype)
        self._m_sizes = jnp.asarray(
            np.asarray(self.block_sizes, dtype=np.float64), dtype)
        self._build_jitted()

    # ------------------------------------------------------------------
    def _build_jitted(self):
        n, q = self.n, self.q
        lik = self.likelihood
        idx, wmat, flat_idx = self._idx, self._wmat, self._flat_idx
        oneh, m_sizes = self._oneh, self._m_sizes
        wobs = self.weights
        two = getattr(lik, "num_sets_fe", 1) == 2
        self.num_sets_fe = 2 if two else 1

        def _split_F(F):
            return (F[:n], F[n:]) if two else (F, None)

        def _loglik(y, loc, F2, aux):
            ll = lik.log_lik2(y, loc, F2, aux) if two \
                else lik.log_lik(y, loc, aux)
            return jnp.sum(ll if wobs is None else wobs * ll)

        def _d1(y, loc, F2, aux):
            return jax.grad(lambda l: _loglik(y, l, F2, aux))(loc)

        def _W_obs(y, loc, F2, aux):
            return -jax.grad(lambda l: jnp.sum(_d1(y, l, F2, aux)))(loc)

        def _W_fisher(y, loc, F2, aux):
            Wf = lik.fisher_W2(y, loc, F2, aux) if two \
                else lik.fisher_W(y, loc, aux)
            return Wf if wobs is None else wobs * Wf

        # Laplace-variant routing (likelihoods.h:327-369; see models/laplace.py)
        has_fisher = hasattr(lik, "fisher_W2") if two \
            else hasattr(lik, "fisher_W")
        use_fisher_mode = has_fisher and lik.approx_type in (
            "fisher_laplace", "combined")
        use_fisher_det = has_fisher and lik.approx_type == "fisher_laplace"
        _W_mode = _W_fisher if use_fisher_mode else _W_obs
        _W = _W_fisher if use_fisher_det else _W_obs     # determinant
        if lik.approx_type == "tkc":
            # triangular-kernel curvature (likelihoods.h:13097-13111): one
            # constant curvature from a jitted scalar search; Fisher mode
            # finding by default (:449-451), '_not_fisher_mode_finding'
            # recomputes the TKC information at every Newton iterate
            from ..likelihoods.tkc import tkc_neg_curvature

            def _W_tkc(y, loc, F2, aux):
                c = tkc_neg_curvature(
                    lambda s: _loglik(y, loc + s, F2, aux), n)
                base = jnp.ones_like(loc) if wobs is None else wobs
                return base * c

            _W_mode = _W_tkc if getattr(lik, "mode_finding", None) == \
                "not_fisher" else _W_fisher
            _W = _W_tkc

        # ---- Z operators (gathers / scatter-adds over static index arrays)
        def _Zb(b):
            return jnp.sum(wmat * b[idx], axis=0)

        def _Zt(v):
            return jnp.zeros(q, v.dtype).at[flat_idx].add(
                (wmat * v[None, :]).reshape(-1))

        if self.diag_path:
            def _ZtWZ_diag(Wv):
                return jnp.zeros(q, Wv.dtype).at[flat_idx].add(
                    (wmat * wmat * Wv[None, :]).reshape(-1))
        else:
            pair_flat, pair_w = self._pair_flat, self._pair_w

            def _ZtWZ(Wv):
                vals = pair_w * jnp.tile(Wv, self.num_theta ** 2)
                return jnp.zeros(q * q, Wv.dtype).at[pair_flat].add(
                    vals).reshape(q, q)

        self._Zb_fn, self._Zt_fn = _Zb, _Zt

        def _sbinv_diag(theta_log):
            return oneh @ jnp.exp(-theta_log)

        def _H_solve_factors(theta_log, Wv):
            """Factorize H = Sigma_b^-1 + Z'WZ; returns opaque factors."""
            sbinv = _sbinv_diag(theta_log)
            if self.diag_path:
                return sbinv + _ZtWZ_diag(Wv)
            H = _ZtWZ(Wv) + jnp.diag(sbinv)
            return jnp.linalg.cholesky(H)

        def _H_solve(factors, rhs):
            if self.diag_path:
                return rhs / factors
            return jsl.cho_solve((factors, True), rhs)

        def _half_logdet(theta_log, Wv):
            """0.5 log|I + Sigma_b Z'WZ| (differentiable: no sqrt(W))."""
            sbinv = _sbinv_diag(theta_log)
            if self.diag_path:
                h = sbinv + _ZtWZ_diag(Wv)
                return 0.5 * (jnp.sum(jnp.log(h))
                              + jnp.sum(m_sizes * theta_log))
            H = _ZtWZ(Wv) + jnp.diag(sbinv)
            L = jnp.linalg.cholesky(H)
            return (jnp.sum(jnp.log(jnp.diagonal(L)))
                    + 0.5 * jnp.sum(m_sizes * theta_log))

        self._H_solve_factors = _H_solve_factors
        self._H_solve_apply = _H_solve

        # ---- padded-by-group mode finding (see __init__): the whole
        # Newton loop runs on dense (q, s_max) masked tensors — zero
        # gathers/scatters per iteration (three gathers total per call)
        padded = self._padded \
            if (not two and lik.approx_type != "tkc") else None

        def _mode_solve_padded(theta_log, aux, y, F, b_init):
            pidx, pmask = padded["idx"], padded["mask"]
            y_pad = y[pidx]
            F_pad = F[pidx] * pmask
            w_pad = wmat[0][pidx] * pmask
            wo_pad = None if wobs is None else wobs[pidx] * pmask
            sbinv = _sbinv_diag(theta_log)

            shp = y_pad.shape

            def ll_pad(loc_pad):
                # likelihood kernels assume 1-D location vectors (e.g. the
                # Tweedie Dunn-Smyth series broadcasts internal axes) —
                # flatten the padded layout for every lik call
                ll = lik.log_lik(y_pad.ravel(), loc_pad.ravel(),
                                 aux).reshape(shp)
                ll = ll if wo_pad is None else wo_pad * ll
                return jnp.sum(pmask * ll)

            def d1_pad(loc_pad):
                return jax.grad(ll_pad)(loc_pad)

            def W_pad(loc_pad):
                if use_fisher_mode:
                    Wf = lik.fisher_W(y_pad.ravel(), loc_pad.ravel(),
                                      aux).reshape(shp)
                    return pmask * (Wf if wo_pad is None else wo_pad * Wf)
                return -jax.grad(lambda l: jnp.sum(d1_pad(l)))(loc_pad)

            def obj_of(b):
                loc = w_pad * b[:, None] + F_pad
                return -0.5 * jnp.sum(sbinv * b * b) + ll_pad(loc)

            def newton_body(carry):
                b, obj, it, done = carry
                loc = w_pad * b[:, None] + F_pad
                d1 = d1_pad(loc)
                W = W_pad(loc)
                grad = jnp.sum(w_pad * d1, axis=1) - sbinv * b
                h = sbinv + jnp.sum(w_pad * w_pad * W, axis=1)
                delta = grad / jnp.maximum(jnp.abs(h), 1e-10)
                gdd = grad @ delta

                def bt_cond(bt):
                    lr, ih, acc, _, _ = bt
                    return jnp.logical_and(~acc, ih < MAX_LR_SHRINK_MODE)

                def bt_body(bt):
                    lr, ih, _, _, _ = bt
                    b_new = b + lr * delta
                    obj_new = obj_of(b_new)
                    ok = obj_new >= obj + C_ARMIJO * lr * gdd
                    ok = jnp.logical_and(ok, jnp.isfinite(obj_new))
                    return (jnp.where(ok, lr, lr * 0.5), ih + 1, ok, b_new,
                            obj_new)

                _, _, _, b_new, obj_new = jax.lax.while_loop(
                    bt_cond, bt_body,
                    (jnp.asarray(1.0, b.dtype), 0, False, b, obj))
                rel = DELTA_CONV_MODE * jnp.abs(obj)
                conv = jnp.where(it == 0, jnp.abs(obj_new - obj) < rel,
                                 (obj_new - obj) < rel)
                bad = ~jnp.isfinite(obj_new)
                return (b_new, obj_new, it + 1, jnp.logical_or(conv, bad))

            b_fin, _, nit, _ = jax.lax.while_loop(
                lambda c: jnp.logical_and(~c[3], c[2] < MAXIT_MODE_NEWTON),
                newton_body, (b_init, obj_of(b_init), 0, False))
            return b_fin, nit

        # ---- mode finding: q-dim Newton with Armijo backtracking ---------
        def _mode_solve_rows(theta_log, aux, y, F, b_init):
            F1, F2 = _split_F(F)
            sbinv = _sbinv_diag(theta_log)
            obj0 = -0.5 * jnp.sum(sbinv * b_init * b_init) \
                + _loglik(y, _Zb(b_init) + F1, F2, aux)

            def newton_body(carry):
                b, obj, it, done = carry
                loc = _Zb(b) + F1
                d1 = _d1(y, loc, F2, aux)
                W = _W_mode(y, loc, F2, aux)
                grad = _Zt(d1) - sbinv * b
                factors = _H_solve_factors(theta_log, W)
                if self.diag_path:
                    # saddle-free safeguard: observed W can make a group's
                    # Hessian diagonal non-positive away from the mode
                    # (censored/zero-inflated likelihoods); |h| keeps the
                    # direction ascent-aligned, Armijo handles the rest
                    # (the dense engine's negative-W path analogue)
                    delta = grad / jnp.maximum(jnp.abs(factors), 1e-10)
                else:
                    delta = _H_solve(factors, grad)
                    # indefinite H -> Cholesky NaN / descent dir -> gradient
                    bad = jnp.logical_or(~jnp.all(jnp.isfinite(delta)),
                                         grad @ delta <= 0)
                    delta = jnp.where(bad, grad, delta)
                gdd = grad @ delta

                def bt_cond(bt):
                    lr, ih, acc, _, _ = bt
                    return jnp.logical_and(~acc, ih < MAX_LR_SHRINK_MODE)

                def bt_body(bt):
                    lr, ih, _, _, _ = bt
                    b_new = b + lr * delta
                    obj_new = -0.5 * jnp.sum(sbinv * b_new * b_new) \
                        + _loglik(y, _Zb(b_new) + F1, F2, aux)
                    ok = obj_new >= obj + C_ARMIJO * lr * gdd
                    ok = jnp.logical_and(ok, jnp.isfinite(obj_new))
                    return (jnp.where(ok, lr, lr * 0.5), ih + 1, ok, b_new,
                            obj_new)

                _, _, _, b_new, obj_new = jax.lax.while_loop(
                    bt_cond, bt_body,
                    (jnp.asarray(1.0, b.dtype), 0, False, b, obj))
                rel = DELTA_CONV_MODE * jnp.abs(obj)
                conv = jnp.where(it == 0, jnp.abs(obj_new - obj) < rel,
                                 (obj_new - obj) < rel)
                bad = ~jnp.isfinite(obj_new)
                return (b_new, obj_new, it + 1, jnp.logical_or(conv, bad))

            b_fin, _, nit, _ = jax.lax.while_loop(
                lambda c: jnp.logical_and(~c[3], c[2] < MAXIT_MODE_NEWTON),
                newton_body, (b_init, obj0, 0, False))
            return b_fin, nit

        _mode_solve = _mode_solve_padded if padded is not None \
            else _mode_solve_rows

        def _g_rows(u, F, b, y):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            F1, F2 = _split_F(F)
            loc = _Zb(b) + F1
            W = _W(y, loc, F2, aux)
            sbinv = _sbinv_diag(theta_log)
            return (0.5 * jnp.sum(sbinv * b * b) - _loglik(y, loc, F2, aux)
                    + _half_logdet(theta_log, W))

        def _r_rows(u, F, b, y):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            F1, F2 = _split_F(F)
            return _sbinv_diag(theta_log) * b - _Zt(_d1(y, _Zb(b) + F1, F2,
                                                        aux))

        # padded-layout objective/residual: the duplicate y/F/w gathers CSE
        # with the mode finder's inside one jitted value-and-grad graph, so
        # these remove the per-evaluation scatters for free
        def _pad_parts(F, y, aux):
            pidx, pmask = padded["idx"], padded["mask"]
            y_pad = y[pidx]
            F_pad = F[pidx] * pmask
            w_pad = wmat[0][pidx] * pmask
            wo_pad = None if wobs is None else wobs[pidx] * pmask

            shp = y_pad.shape

            def ll_pad(loc_pad):
                # flatten for the likelihood kernels (see _mode_solve_padded)
                ll = lik.log_lik(y_pad.ravel(), loc_pad.ravel(),
                                 aux).reshape(shp)
                ll = ll if wo_pad is None else wo_pad * ll
                return jnp.sum(pmask * ll)

            return y_pad, F_pad, w_pad, wo_pad, pmask, ll_pad

        def _g_padded(u, F, b, y):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            y_pad, F_pad, w_pad, wo_pad, pmask, ll_pad = _pad_parts(F, y,
                                                                    aux)
            loc = w_pad * b[:, None] + F_pad
            if use_fisher_det:
                Wf = lik.fisher_W(y_pad.ravel(), loc.ravel(),
                                  aux).reshape(y_pad.shape)
                W = pmask * (Wf if wo_pad is None else wo_pad * Wf)
            else:
                W = -jax.grad(
                    lambda l: jnp.sum(jax.grad(ll_pad)(l)))(loc)
            sbinv = _sbinv_diag(theta_log)
            h = sbinv + jnp.sum(w_pad * w_pad * W, axis=1)
            half_logdet = 0.5 * (jnp.sum(jnp.log(h))
                                 + jnp.sum(m_sizes * theta_log))
            return (0.5 * jnp.sum(sbinv * b * b) - ll_pad(loc)
                    + half_logdet)

        def _r_padded(u, F, b, y):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            _, F_pad, w_pad, _, _, ll_pad = _pad_parts(F, y, aux)
            loc = w_pad * b[:, None] + F_pad
            d1 = jax.grad(ll_pad)(loc)
            return _sbinv_diag(theta_log) * b - jnp.sum(w_pad * d1, axis=1)

        if padded is not None and lik.approx_type not in ("tkc",):
            _g, _r = _g_padded, _r_padded
        else:
            _g, _r = _g_rows, _r_rows

        @jax.custom_vjp
        def nll_fn(u, F, y, b_init):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            b, nit = _mode_solve(theta_log, aux, y, F, b_init)
            return _g(u, F, b, y), (b, nit)

        def nll_fwd(u, F, y, b_init):
            out = nll_fn(u, F, y, b_init)
            return out, (u, F, y, out[1][0])

        def nll_bwd(res, ct):
            ct_nll = ct[0]
            u, F, y, b = res
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            F1, F2 = _split_F(F)
            W = _W(y, _Zb(b) + F1, F2, aux)
            g_u, g_F, g_b = jax.grad(_g, argnums=(0, 1, 2))(u, F, b, y)
            lam = _H_solve(_H_solve_factors(theta_log, W), g_b)
            _, r_vjp = jax.vjp(lambda uu, FF: _r(uu, FF, b, y), u, F)
            ru_l, rF_l = r_vjp(lam)
            return ((g_u - ru_l) * ct_nll, (g_F - rF_l) * ct_nll, None, None)

        nll_fn.defvjp(nll_fwd, nll_bwd)

        self._nll_fn = lifted_jit(nll_fn)
        self._nll_raw = nll_fn   # traceable closure for the fully
        # on-device GD loop (models/jit_gd.py gd_fit_laplace_engine)
        self._vag = lifted_jit(jax.value_and_grad(nll_fn, argnums=0, has_aux=True))
        self._vag_F = lifted_jit(jax.value_and_grad(nll_fn, argnums=(0, 1),
                                                 has_aux=True))
        self._W_fn = _W
        self._d1_fn = _d1
        self._split_F_fn = _split_F

        def _mode_and_W(u, F, y, b_init):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            b, nit = _mode_solve(theta_log, aux, y, F, b_init)
            F1, F2 = _split_F(F)
            W = _W(y, _Zb(b) + F1, F2, aux)
            return b, W

        self._mode_and_W = lifted_jit(_mode_and_W)

    # ------------------------------------------------------------------
    # host-facing API (interface parity with LaplaceDenseEngine)
    def zero_mode(self):
        return jnp.zeros(self.q, dtype=self.dtype)

    def _note_it(self, nit):
        self.last_num_mode_it = int(nit)
        self.total_num_mode_it = getattr(self, "total_num_mode_it", 0) \
            + int(nit)

    def laplace_nll(self, u, y, F, a_init):
        nll, (b, nit) = self._nll_fn(jnp.asarray(u, self.dtype),
                                     jnp.asarray(F, self.dtype),
                                     jnp.asarray(y, self.dtype), a_init)
        self._note_it(nit)
        return float(nll), b

    def laplace_vag(self, u, y, F, a_init):
        (nll, (b, nit)), g = self._vag(jnp.asarray(u, self.dtype),
                                       jnp.asarray(F, self.dtype),
                                       jnp.asarray(y, self.dtype), a_init)
        self._note_it(nit)
        return float(nll), np.asarray(g), b

    def laplace_vag_F(self, u, y, F, a_init):
        (nll, (b, nit)), (gu, gF) = self._vag_F(
            jnp.asarray(u, self.dtype), jnp.asarray(F, self.dtype),
            jnp.asarray(y, self.dtype), a_init)
        self._note_it(nit)
        return float(nll), np.asarray(gu), np.asarray(gF), b

    # parameter transforms: grouped comps are variance-only, no nugget for
    # non-Gaussian likelihoods -> identity
    def transform_pars(self, pars_orig):
        return np.asarray(pars_orig, dtype=np.float64).copy()

    def back_transform_pars(self, pars_internal):
        return np.asarray(pars_internal, dtype=np.float64).copy()

    def neg_log_likelihood(self, pars_orig, y, aux_pars=None,
                           fixed_effects=None):
        t = self.transform_pars(pars_orig)
        if aux_pars is None:
            aux_pars = self.likelihood.init_aux(np.asarray(y))
        else:
            aux_pars = self.likelihood.aux_to_internal(aux_pars)
        u = np.concatenate([np.log(t),
                            np.log(np.asarray(aux_pars, dtype=np.float64))]) \
            if self.num_aux else np.log(t)
        F = np.zeros(self.n * self.num_sets_fe) if fixed_effects is None \
            else np.asarray(fixed_effects, dtype=np.float64)
        if len(F) != self.n * self.num_sets_fe:
            raise ValueError(
                f"fixed_effects must have length {self.n * self.num_sets_fe} "
                f"(num_sets_fe = {self.num_sets_fe}), got {len(F)}")
        nll, _ = self.laplace_nll(u, y, F, self.zero_mode())
        return nll

    # ------------------------------------------------------------------
    def _u_from_pars(self, pars_orig, aux_pars, y):
        t = self.transform_pars(pars_orig)
        u = np.log(t)
        if self.num_aux:
            if aux_pars is None:
                aux_pars = self.likelihood.init_aux(np.asarray(y))
            else:
                aux_pars = self.likelihood.aux_to_internal(aux_pars)
            u = np.concatenate([u, np.log(np.asarray(aux_pars,
                                                     dtype=np.float64))])
        return u

    def training_re(self, u, a_state, predict_var=False):
        """Posterior (Laplace) means of the random effects at the training
        points: column j = b_hat[codes_j] (re_model_template.h:4420; random
        coefficients report the latent slope, not slope * covariate).
        Variances require y/F context -> via predict() (parity with the
        dense engine)."""
        if predict_var:
            raise ValueError("predict_training_data_random_effects with "
                             "predict_var=True is not implemented for "
                             "non-Gaussian likelihoods; use predict()")
        b = np.asarray(a_state)
        means = np.column_stack([b[self._idx_np[j]]
                                 for j in range(self.num_theta)])
        return means, None

    def predict(self, pars_orig, aux_pars, y, F, pred_data, a_init=None,
                predict_var=False, predict_cov_mat=False,
                predict_response=False, F_pred=None):
        """Laplace predictions for grouped REs on the RE scale
        (PredictLaplaceApproxGroupedRE, likelihoods.h:7253ff grouped
        variants): posterior of b is N(b_hat, H^-1)."""
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        u = self._u_from_pars(pars_orig, aux_pars, y)
        aux_d = jnp.exp(jnp.asarray(u[self.num_theta:], self.dtype))
        yd = jnp.asarray(y, self.dtype)
        Fd = jnp.asarray(F, self.dtype)
        if a_init is None:
            a_init = self.zero_mode()
        ud = jnp.asarray(u, self.dtype)
        b_hat, W = self._mode_and_W(ud, Fd, yd, a_init)
        b_np = np.asarray(b_hat)
        W_np = np.asarray(W)

        # posterior precision H = Sigma_b^-1 + Z'WZ on the host (q-sized)
        import scipy.linalg as sla
        sbinv = np.concatenate([np.full(m, 1.0 / pars_orig[j])
                                for j, m in enumerate(self.block_sizes)])
        # optional predictive-variance correction of the information
        # (CalcInformationLogLik, likelihoods.h:12736-12786)
        var_cor = getattr(self.likelihood, "var_correction", None)
        fi_np = None
        if var_cor == "freq_asymptotic":
            if self.likelihood.name != "asymmetric_laplace":
                raise ValueError(
                    "var_cor_pred_version 'freq_asymptotic' is not "
                    "implemented for this likelihood")
            qq = self.likelihood.q
            sigma = float(np.exp(u[self.num_theta]))
            fi_np = np.full(self.n, qq * (1.0 - qq) / (sigma * sigma))
        elif var_cor == "learning_rate":
            W_np = W_np * float(getattr(self.likelihood,
                                        "likelihood_learning_rate", 1.0))

        wz = self._w_np * W_np[None, :]
        if self.diag_path:
            zt_w = np.bincount(self._idx_np.reshape(-1),
                               weights=(self._w_np * wz).reshape(-1),
                               minlength=self.q)
            if fi_np is not None:
                # RE-scale correction: (Zt W Z)^2 / (Zt FI Z) per level
                zt_fi = np.bincount(
                    self._idx_np.reshape(-1),
                    weights=np.broadcast_to(
                        fi_np, self._idx_np.shape).reshape(-1).copy(),
                    minlength=self.q)
                zt_w = zt_w * zt_w / np.maximum(zt_fi, 1e-300)
            h_diag = sbinv + zt_w
            h_solve = lambda rhs: rhs / (h_diag[:, None]
                                         if rhs.ndim == 2 else h_diag)
        else:
            if fi_np is not None:
                # data-scale correction: W_i^2 / FI_i per datum
                W_np = W_np * W_np / fi_np
                wz = self._w_np * W_np[None, :]
            H = np.diag(sbinv)
            for j in range(self.num_theta):
                for k in range(self.num_theta):
                    np.add.at(H, (self._idx_np[j], self._idx_np[k]),
                              self._w_np[j] * wz[k])
            cho = sla.cho_factor(H, lower=True)
            h_solve = lambda rhs: sla.cho_solve(cho, rhs)

        n_pred = pred_data["n_pred"]
        # prediction incidence: Zp (n_pred, q) built sparsely per comp
        Zp = np.zeros((n_pred, self.q))
        prior_var = np.zeros((n_pred, n_pred))
        for j, (comp, pd) in enumerate(zip(self.components,
                                           pred_data["comps"])):
            codes = pd["codes_pred"]
            zp = pd.get("z_pred")
            zp = np.ones(n_pred) if zp is None else np.asarray(
                zp, dtype=np.float64)
            seen = codes < self.block_sizes[j]
            rows = np.where(seen)[0]
            Zp[rows, self.level_off[j] + codes[rows]] += zp[rows]
            un = np.where(~seen)[0]
            if len(un):
                same = codes[un][:, None] == codes[un][None, :]
                prior_var[np.ix_(un, un)] += pars_orig[j] * same * \
                    np.outer(zp[un], zp[un])
        mu = Zp @ b_np

        two = self.num_sets_fe == 2
        F1_pred = zeta_pred = None
        if F_pred is not None:
            Fp = np.asarray(F_pred, dtype=np.float64)
            if two:
                F1_pred, zeta_pred = Fp[:n_pred], Fp[n_pred:]
            else:
                F1_pred = Fp
        elif two:
            zeta_pred = np.zeros(n_pred)
        mu_tot = mu if F1_pred is None else mu + F1_pred

        cov = var = None
        if predict_var or predict_cov_mat or predict_response:
            V = h_solve(Zp.T)
            if predict_cov_mat:
                cov = Zp @ V + prior_var
                var = np.diagonal(cov).copy()
            else:
                var = np.einsum("pq,qp->p", Zp, V) + np.diagonal(prior_var)
        out = {}
        if predict_response:
            if two:
                m, v = self.likelihood.response_mean_var2(
                    jnp.asarray(mu_tot), jnp.asarray(np.maximum(var, 0.0)),
                    jnp.asarray(zeta_pred), aux_d)
            else:
                m, v = self.likelihood.response_mean_var(
                    jnp.asarray(mu_tot), jnp.asarray(np.maximum(var, 0.0)),
                    aux_d)
            out["mu"] = np.asarray(m)
            if predict_var or predict_cov_mat:
                out["var"] = np.asarray(v)
        else:
            out["mu"] = mu_tot
            if predict_cov_mat:
                out["cov"] = cov
            if predict_var:
                out["var"] = var
        return out
