"""Combined Vecchia GP + grouped-random-effects Laplace engine.

Reference: re_model_template.h:7042-7045 — when a model has BOTH grouped
random effects and a Vecchia-approximated GP, the reference sets
`grouped_RE_and_vecchia_GP_ = true` and `gauss_likelihood_ = false`: the
whole model runs through the Laplace machinery over the JOINT latent vector
[gp values (n_unique), grouped effects (q_total)], which is exact for a
Gaussian likelihood (whose error variance becomes the likelihood aux
parameter, like `vecchia_latent`). The latent GP lives on the UNIQUE
coordinates (has_duplicates_coords_ semantics) with an incidence map Zu from
data rows, so duplicate locations are supported. Mode finding / determinants
use the joint precision

    P(theta) = blockdiag( Q_gp = B' D^-1 B,  SigmaI_g = diag(1/sigma_j^2) )
    H = P + Zfull' W Zfull,   Zfull = [Zu | Zg],   loc = F + Zfull b

(likelihoods.h FindModePostRandEffCalcMLLVecchia with additional RE
components; re_model_template.h:4650/4684). Gradients wrt all covariance /
aux parameters and fixed effects come from one implicit-function-theorem
custom_vjp around the solved mode, exactly like the other Laplace engines.

This engine forms H densely ((n_u+q) x (n_u+q)) — the parity formulation for
moderate n (the reference's own default for this case is sparse Cholesky /
SSOR-CG, re_model_template.h:7085); combined models at large n should use
grouped REs + `gp_approx='fitc'` or pure Vecchia until an iterative variant
lands here.
"""

from ..ops.jit_utils import lifted_jit
import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .vecchia import VecchiaGaussianEngine

DELTA_CONV_MODE = 1e-8
MAXIT_MODE_NEWTON = 1000
MAX_LR_SHRINK_MODE = 20
C_ARMIJO = 1e-4


class VecchiaGroupedLaplaceEngine:
    """Laplace NLL over the joint [Vecchia GP, grouped REs] latent vector."""

    is_gaussian = False
    wants_codes_pred = True   # _build_pred_data: codes-form grouped pred data

    def __init__(self, components, num_data, likelihood, num_neighbors=20,
                 vecchia_ordering="random", seed=0, dtype=jnp.float64,
                 weights=None, **_unused):
        gp_comps = [c for c in components if c.kind == "gp"]
        self.g_comps = [c for c in components if c.kind == "grouped"]
        if len(gp_comps) != 1 or gp_comps[0].z is not None:
            raise NotImplementedError(
                "gp_approx='vecchia' with grouped random effects requires "
                "exactly one GP component without random coefficients")
        self.components = list(components)
        # theta ordering follows the components order (grouped first, then
        # the GP — matching the exact engine's cov_pars layout)
        self.par_offsets = []
        off = 0
        self._gp_off = None
        for c in self.components:
            self.par_offsets.append(off)
            if c.kind == "gp":
                self._gp_off = off
            off += c.num_cov_par
        self.num_theta = off
        self.n = int(num_data)
        n = self.n

        # latent GP on the UNIQUE coordinates (has_duplicates_coords_):
        # data row i maps to unique point data_to_u[i]
        gp = gp_comps[0]
        u_coords, first_idx, data_to_u = np.unique(
            gp.coords, axis=0, return_index=True, return_inverse=True)
        # keep unique points in FIRST-OCCURRENCE order (the reference's
        # duplicate detection preserves data order, GP_utils.h:26)
        order = np.argsort(first_idx)
        u_coords = u_coords[order]
        remap = np.empty(len(order), dtype=np.int64)
        remap[order] = np.arange(len(order))
        data_to_u = remap[data_to_u.ravel()]
        self.n_u = len(u_coords)
        from .components import GPComponent
        gp_u = GPComponent(u_coords, gp.cov_fn, name=gp.name)
        nn = min(int(num_neighbors), self.n_u - 1)
        self._vecchia = VecchiaGaussianEngine(
            [gp_u], self.n_u, num_neighbors=nn,
            vecchia_ordering=vecchia_ordering, seed=seed, dtype=dtype)
        self.comp = self._vecchia.comp             # the (unique-coords) GP
        self.perm = self._vecchia.perm             # over unique points
        self.dtype = dtype
        self.likelihood = likelihood
        self.num_cov_par = self.num_theta
        self.num_aux = likelihood.num_aux
        self.num_par = self.num_theta + self.num_aux
        self.matrix_inversion_method = "cholesky"

        # data row -> position of its unique point in the Vecchia ordering
        inv_perm = np.empty(self.n_u, dtype=np.int64)
        inv_perm[self.perm] = np.arange(self.n_u)
        self._row_pos = inv_perm[data_to_u]
        Zu = np.zeros((n, self.n_u), dtype=np.float64)
        Zu[np.arange(n), self._row_pos] = 1.0
        self._Zu = jnp.asarray(Zu, dtype)

        # grouped incidence in ORIGINAL data order: Zg (n, q_total) dense,
        # column blocks per component; entries are the slope covariate for
        # random-coefficient groupings (re_comp.h:227 RECompGroup Z)
        self.q_sizes = [c.num_groups for c in self.g_comps]
        self.q_total = int(sum(self.q_sizes))
        Zg = np.zeros((n, self.q_total), dtype=np.float64)
        col = 0
        for c in self.g_comps:
            codes = np.asarray(c.group_codes)
            vals = np.ones(n) if c.z is None else np.asarray(c.z)
            Zg[np.arange(n), col + codes] = vals
            col += c.num_groups
        self._Zg = jnp.asarray(Zg, dtype)
        # prior-precision expansion: variance index of each latent column
        rep = np.concatenate([np.full(q, j) for j, q in
                              enumerate(self.q_sizes)]) if self.q_total \
            else np.zeros(0)
        self._gvar_of_col = jnp.asarray(rep, jnp.int32)
        self._wobs = None if weights is None else jnp.asarray(
            np.asarray(weights, dtype=np.float64), dtype)
        self._build_jitted()

    # ------------------------------------------------------------------
    def _theta_split(self, theta_log):
        """(group log-variances (G,), GP theta_log [log v, log alphas])."""
        gvars = jnp.stack([theta_log[self.par_offsets[j]]
                           for j, c in enumerate(self.components)
                           if c.kind == "grouped"]) if self.q_total else \
            jnp.zeros(0, self.dtype)
        gp = theta_log[self._gp_off:
                       self._gp_off + self.comp.num_cov_par]
        return gvars, gp

    def _prior(self, theta_log):
        """(Q_gp dense (n_u, n_u), prior diag of the grouped block (q,),
        log|prior precision|)."""
        gvars_log, gp_log = self._theta_split(theta_log)
        nu = self.n_u
        A, D = self._vecchia._bd(gp_log, latent=True)
        idx = self._vecchia._nn_idx
        rows = jnp.arange(nu)
        onehot = (idx[:, :, None] == rows[None, None, :]).astype(A.dtype)
        M = jnp.einsum("nm,nmj->nj", A, onehot)
        B = jnp.eye(nu, dtype=A.dtype) - M
        Q = B.T @ (B / D[:, None])
        logdet_prec = -jnp.sum(jnp.log(D))
        if self.q_total:
            prior_dg = jnp.exp(-gvars_log)[self._gvar_of_col]
            logdet_prec = logdet_prec + jnp.sum(jnp.log(prior_dg))
        else:
            prior_dg = jnp.zeros(0, self.dtype)
        return Q, prior_dg, logdet_prec

    def _build_jitted(self):
        nu, q = self.n_u, self.q_total
        N = nu + q
        lik = self.likelihood
        if getattr(lik, "num_sets_fe", 1) == 2 \
                or getattr(lik, "num_sets_re", 1) == 2:
            raise NotImplementedError(
                "two-predictor likelihoods are not supported with "
                "gp_approx='vecchia' plus grouped random effects")
        self.num_sets_fe = 1
        Zu, Zg = self._Zu, self._Zg
        row_pos = jnp.asarray(self._row_pos)
        wobs = self._wobs

        def _loglik(y, loc, aux):
            ll = lik.log_lik(y, loc, aux)
            return jnp.sum(ll if wobs is None else wobs * ll)

        def _d1(y, loc, aux):
            return jax.grad(lambda l: _loglik(y, l, aux))(loc)

        def _W_obs(y, loc, aux):
            return -jax.grad(lambda l: jnp.sum(_d1(y, l, aux)))(loc)

        def _W_fisher(y, loc, aux):
            Wf = lik.fisher_W(y, loc, aux)
            return Wf if wobs is None else wobs * Wf

        has_fisher = hasattr(lik, "fisher_W")
        use_fisher_mode = has_fisher and lik.approx_type in (
            "fisher_laplace", "combined")
        use_fisher_det = has_fisher and lik.approx_type == "fisher_laplace"
        _W_mode = _W_fisher if use_fisher_mode else _W_obs
        _W = _W_fisher if use_fisher_det else _W_obs

        def _loc_of(b, F):
            loc = b[row_pos] + F       # Zu @ b[:nu] as a gather
            if q:
                loc = loc + Zg @ b[nu:]
            return loc

        def _prior_quad(Q, prior_dg, b):
            quad = b[:nu] @ (Q @ b[:nu])
            if q:
                quad = quad + jnp.sum(prior_dg * b[nu:] ** 2)
            return quad

        def _H(Q, prior_dg, W):
            """Dense joint Hessian P + Zfull' W Zfull, Zfull = [Zu | Zg]."""
            H11 = Q + Zu.T @ (W[:, None] * Zu)
            if not q:
                return H11
            WZg = W[:, None] * Zg
            H12 = Zu.T @ WZg
            H22 = jnp.diag(prior_dg) + Zg.T @ WZg
            return jnp.block([[H11, H12], [H12.T, H22]])

        def _grad_b(Q, prior_dg, b, d1):
            g_gp = jax.ops.segment_sum(d1, row_pos, num_segments=nu) \
                - Q @ b[:nu]
            if not q:
                return g_gp
            g_g = Zg.T @ d1 - prior_dg * b[nu:]
            return jnp.concatenate([g_gp, g_g])

        def _mode_solve(Q, prior_dg, aux, y, F, b_init):
            obj0 = -0.5 * _prior_quad(Q, prior_dg, b_init) \
                + _loglik(y, _loc_of(b_init, F), aux)

            def newton_body(carry):
                b, obj, it, done = carry
                loc = _loc_of(b, F)
                d1 = _d1(y, loc, aux)
                W = _W_mode(y, loc, aux)
                grad = _grad_b(Q, prior_dg, b, d1)
                L = jnp.linalg.cholesky(_H(Q, prior_dg, W))
                delta = jsl.cho_solve((L, True), grad)
                gdd = grad @ delta

                def bt_cond(bt):
                    lr, ih, acc, _, _ = bt
                    return jnp.logical_and(~acc, ih < MAX_LR_SHRINK_MODE)

                def bt_body(bt):
                    lr, ih, _, _, _ = bt
                    b_new = b + lr * delta
                    obj_new = -0.5 * _prior_quad(Q, prior_dg, b_new) \
                        + _loglik(y, _loc_of(b_new, F), aux)
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

            b_fin, obj_fin, nit, _ = jax.lax.while_loop(
                lambda c: jnp.logical_and(~c[3], c[2] < MAXIT_MODE_NEWTON),
                newton_body, (b_init, obj0, 0, False))
            return b_fin, nit

        def _g(u, F, b, y):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Q, prior_dg, logdet_prec = self._prior(theta_log)
            loc = _loc_of(b, F)
            W = _W(y, loc, aux)
            L = jnp.linalg.cholesky(_H(Q, prior_dg, W))
            return (0.5 * _prior_quad(Q, prior_dg, b) - _loglik(y, loc, aux)
                    + jnp.sum(jnp.log(jnp.diagonal(L))) - 0.5 * logdet_prec)

        def _r(u, F, b, y):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Q, prior_dg, _ = self._prior(theta_log)
            d1 = _d1(y, _loc_of(b, F), aux)
            return -_grad_b(Q, prior_dg, b, d1)

        @jax.custom_vjp
        def nll_fn(u, F, y, b_init):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Q, prior_dg, _ = self._prior(theta_log)
            b, nit = _mode_solve(Q, prior_dg, aux, y, F, b_init)
            return _g(u, F, b, y), (b, jnp.stack([nit, 0]))

        def nll_fwd(u, F, y, b_init):
            out = nll_fn(u, F, y, b_init)
            return out, (u, F, y, out[1][0])

        def nll_bwd(res, ct):
            ct_nll = ct[0]
            u, F, y, b = res
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            Q, prior_dg, _ = self._prior(theta_log)
            W = _W(y, _loc_of(b, F), aux)
            g_u, g_F, g_b = jax.grad(_g, argnums=(0, 1, 2))(u, F, b, y)
            L = jnp.linalg.cholesky(_H(Q, prior_dg, W))
            lam = jsl.cho_solve((L, True), g_b)
            _, r_vjp = jax.vjp(lambda uu, FF: _r(uu, FF, b, y), u, F)
            ru_l, rF_l = r_vjp(lam)
            return ((g_u - ru_l) * ct_nll, (g_F - rF_l) * ct_nll, None, None)

        nll_fn.defvjp(nll_fwd, nll_bwd)

        self._nll_fn = lifted_jit(nll_fn)
        self._nll_raw = nll_fn
        self._vag = lifted_jit(jax.value_and_grad(nll_fn, argnums=0,
                                               has_aux=True))
        self._vag_F = lifted_jit(jax.value_and_grad(nll_fn, argnums=(0, 1),
                                                 has_aux=True))
        self._W_fn = _W
        self._d1_fn = _d1
        self._loc_of = _loc_of

    # ------------------------------------------------------------------
    # host-facing API (data vectors stay in the original row order; only the
    # latent GP block lives in the Vecchia ordering of the unique points)
    def zero_mode(self):
        return jnp.zeros(self.n_u + self.q_total, dtype=self.dtype)

    def _note_it(self, stats):
        stats = np.asarray(stats).ravel()
        self.last_num_mode_it = int(stats[0])
        self.total_num_mode_it = getattr(self, "total_num_mode_it", 0) \
            + int(stats[0])

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
        (nll, (b, nit)), (gu, gF) = self._vag_F(jnp.asarray(u, self.dtype),
                                                jnp.asarray(F, self.dtype),
                                                jnp.asarray(y, self.dtype),
                                                a_init)
        self._note_it(nit)
        return float(nll), np.asarray(gu), np.asarray(gF), b

    # parameter transforms: grouped variances pass through; GP ranges use
    # the kernel's transform (optimization on the transformed log scale)
    def transform_pars(self, pars_orig):
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        out = np.array(pars_orig)
        o = self._gp_off
        gp = pars_orig[o: o + self.comp.num_cov_par]
        out[o + 1: o + self.comp.num_cov_par] = np.atleast_1d(
            self.comp.cov_fn.range_to_transformed(gp[1:], var=gp[0]))
        return out

    def back_transform_pars(self, pars_internal):
        t = np.asarray(pars_internal, dtype=np.float64)
        out = np.array(t)
        o = self._gp_off
        out[o + 1: o + self.comp.num_cov_par] = np.atleast_1d(
            self.comp.cov_fn.range_from_transformed(
                t[o + 1: o + self.comp.num_cov_par], var=t[o]))
        return out

    def neg_log_likelihood(self, pars_orig, y, aux_pars=None,
                           fixed_effects=None):
        t = self.transform_pars(pars_orig)
        u = np.log(t)
        if self.num_aux:
            if aux_pars is None:
                aux_pars = self.likelihood.init_aux(np.asarray(y))
            else:
                aux_pars = self.likelihood.aux_to_internal(aux_pars)
            u = np.concatenate([u, np.log(np.asarray(aux_pars,
                                                     dtype=np.float64))])
        F = np.zeros(self.n) if fixed_effects is None else fixed_effects
        nll, _ = self.laplace_nll(u, y, F, self.zero_mode())
        return nll

    # ------------------------------------------------------------------
    def training_re(self, u, a_state, predict_var=False):
        """Per-component posterior (Laplace) means at the training points,
        columns in components order (grouped first, then the GP) — matching
        PredictTrainingDataRandomEffects (re_model_template.h:4420)."""
        if predict_var:
            raise ValueError(
                "predict_training_data_random_effects with predict_var=True "
                "is not implemented for gp_approx='vecchia' with grouped "
                "random effects; use predict()")
        b = np.asarray(a_state)
        cols = []
        col = 0
        nu = self.n_u
        for c in self.g_comps:
            codes = np.asarray(c.group_codes)
            # the reference reports the latent coefficient itself (not
            # coefficient * covariate) for random-slope components
            cols.append(b[nu + col + codes])
            col += c.num_groups
        cols.append(b[self._row_pos])
        return np.column_stack(cols), None

    def predict(self, pars_orig, aux_pars, y, F, pred_data, a_init=None,
                predict_var=False, predict_cov_mat=False,
                predict_response=False, F_pred=None, **kwargs):
        """Joint latent prediction: GP part via exact cross-covariances with
        the Vecchia training precision, grouped part via the posterior of the
        group effects, with all cross terms through the joint H^-1
        (PredictLaplaceApproxVecchia + grouped components)."""
        pars_orig = np.asarray(pars_orig, dtype=np.float64)
        t = self.transform_pars(pars_orig)
        u = np.log(t)
        if self.num_aux:
            if aux_pars is None:
                aux_pars = self.likelihood.init_aux(np.asarray(y))
            else:
                aux_pars = self.likelihood.aux_to_internal(aux_pars)
            u = np.concatenate([u, np.log(np.asarray(aux_pars,
                                                     dtype=np.float64))])
        aux_d = jnp.exp(jnp.asarray(u[self.num_theta:], self.dtype))
        theta_log = jnp.asarray(u[:self.num_theta], self.dtype)
        yd = jnp.asarray(y, self.dtype)
        Fd = jnp.asarray(F, self.dtype)
        if a_init is None:
            a_init = self.zero_mode()
        _nll, (b, _nit) = self._nll_fn(jnp.asarray(u, self.dtype), Fd, yd,
                                       a_init)
        b = np.asarray(b)
        nu, q = self.n_u, self.q_total

        # GP cross-covariances (exact kernel, Vecchia training precision)
        gvars_log, gp_log = (np.asarray(x) for x in
                             self._theta_split(theta_log))
        v = float(np.exp(gp_log[0]))
        alpha = np.exp(gp_log[1:])
        cf = self.comp.cov_fn
        gp_pd = next(p for p, c in zip(pred_data["comps"], self.components)
                     if c.kind == "gp")
        cp = np.asarray(gp_pd["coords_pred"], dtype=np.float64)
        if cp.ndim == 1:
            cp = cp[:, None]
        n_pred = len(cp)
        co = self._vecchia.coords_ord
        d_cross = np.sqrt(np.maximum(
            ((co[:, None, :] - cp[None, :, :]) ** 2).sum(-1), 0))
        d_pp = np.sqrt(np.maximum(
            ((cp[:, None, :] - cp[None, :, :]) ** 2).sum(-1), 0))
        K_cross = v * np.asarray(cf.corr_from_dist(jnp.asarray(d_cross),
                                                   alpha))
        K_pp = v * np.asarray(cf.corr_from_dist(jnp.asarray(d_pp), alpha))

        # grouped prediction incidence Zp (n_pred, q_total) over EXISTING
        # levels; new levels contribute prior variance only
        gvars = np.exp(gvars_log)
        Zp = np.zeros((n_pred, q), dtype=np.float64)
        new_var = np.zeros((n_pred, n_pred), dtype=np.float64)
        col = 0
        jg = 0
        for pd_c, c in zip(pred_data["comps"], self.components):
            if c.kind != "grouped":
                continue
            codes_pred = np.asarray(pd_c["codes_pred"])
            z_pred = pd_c.get("z_pred")
            vals = np.ones(n_pred) if z_pred is None else np.asarray(z_pred)
            old = codes_pred < c.num_groups
            rows = np.arange(n_pred)[old]
            Zp[rows, col + codes_pred[old]] = vals[old]
            # new levels: prior variance v_j, shared across pred rows with
            # the SAME new level
            newm = ~old
            if newm.any():
                same = (codes_pred[:, None] == codes_pred[None, :]) \
                    & np.outer(newm, newm)
                new_var += gvars[jg] * same * np.outer(vals, vals)
            col += c.num_groups
            jg += 1

        loc = np.asarray(self._loc_of(jnp.asarray(b, self.dtype), Fd))
        d1 = np.asarray(self._d1_fn(yd, jnp.asarray(loc, self.dtype), aux_d))
        W = np.asarray(self._W_fn(yd, jnp.asarray(loc, self.dtype), aux_d))
        Q, prior_dg, _ = self._prior(theta_log)
        Q = np.asarray(Q)
        prior_dg = np.asarray(prior_dg)
        Zu = np.asarray(self._Zu)

        # posterior mean: GP part K' Q b_gp = K' Zu' d1 (mode condition),
        # plus the grouped posterior means
        a = Zu.T @ d1
        mu_p = K_cross.T @ a
        if q:
            mu_p = mu_p + Zp @ b[nu:]
        mu_lat = mu_p if F_pred is None else mu_p + np.asarray(F_pred)
        out = {"mu": mu_lat}
        if predict_var or predict_cov_mat or predict_response:
            # U = [K' Q, Zp]: mapping from the joint latent posterior to the
            # predictions; cov = K_pp - K'QK + U H^-1 U' + new-level priors
            Zg = np.asarray(self._Zg)
            WZu = W[:, None] * Zu
            H11 = Q + Zu.T @ WZu
            if q:
                H12 = WZu.T @ Zg
                H = np.block([[H11, H12],
                              [H12.T, np.diag(prior_dg)
                               + Zg.T @ (W[:, None] * Zg)]])
            else:
                H = H11
            import scipy.linalg as sla
            QK = Q @ K_cross
            U = np.concatenate([QK, Zp.T]) if q else QK
            if bool(getattr(self.likelihood, "W_may_be_negative", False)):
                HU = sla.lu_solve(sla.lu_factor(H), U)
            else:
                HU = sla.cho_solve(sla.cho_factor(H, lower=True), U)
            cov = K_pp - K_cross.T @ QK + U.T @ HU + new_var
            if predict_cov_mat:
                out["cov"] = cov
            if predict_var or predict_response:
                out["var"] = np.diagonal(cov).copy()
        if predict_response:
            var = np.maximum(out.pop("var"), 0.0)
            out.pop("cov", None)
            m, vv = self.likelihood.response_mean_var(
                jnp.asarray(mu_lat), jnp.asarray(var), aux_d)
            out2 = {"mu": np.asarray(m)}
            if predict_var or predict_cov_mat:
                out2["var"] = np.asarray(vv)
            return out2
        return out
