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

Two formulations, selected by `matrix_inversion_method`:

* "cholesky": H formed densely ((n_u+q) x (n_u+q)) — the parity formulation
  for moderate n.
* "iterative" (the default at scale, mirroring the reference's sparse
  Cholesky / SSOR-CG default for this case, re_model_template.h:7085):
  fully matrix-free. H·v costs O(n + n_u·m + q) via neighbor gathers
  (Q_gp), row gathers (Zu), and segment sums (Zg' W Zg); mode finding is
  Newton + PCG with a block preconditioner (GP block: vadu
  B'(D^-1+W̃u)B applied through the exact finite Neumann B^-1; grouped
  block: Jacobi); log|H| via the exact-congruence SLQ
  (ops/iterative.make_slq_logdet_congruence); predictive (co)variances via
  batched-CG solves of H X = U.
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
                 weights=None, matrix_inversion_method="cholesky",
                 num_rand_vec_trace=50, cg_max_num_it=1000,
                 cg_delta_conv=1e-6, seed_rand_vec_trace=1,
                 nsim_var_pred=500, cg_preconditioner_type="vadu",
                 **_unused):
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

        # grouped incidence in ORIGINAL data order, stored as index/value
        # arrays per component (codes into the component's column block,
        # values = slope covariate for random-coefficient groupings,
        # re_comp.h:227 RECompGroup Z). The dense Zu/Zg matrices exist only
        # in the "cholesky" formulation.
        self.q_sizes = [c.num_groups for c in self.g_comps]
        self.q_total = int(sum(self.q_sizes))
        self._g_codes = []
        self._g_vals = []
        self._g_cols = []
        col = 0
        for c in self.g_comps:
            self._g_codes.append(np.asarray(c.group_codes, dtype=np.int64))
            self._g_vals.append(np.ones(n) if c.z is None
                                else np.asarray(c.z, dtype=np.float64))
            self._g_cols.append(col)
            col += c.num_groups
        # prior-precision expansion: variance index of each latent column
        rep = np.concatenate([np.full(q, j) for j, q in
                              enumerate(self.q_sizes)]) if self.q_total \
            else np.zeros(0)
        self._gvar_of_col = jnp.asarray(rep, jnp.int32)
        self._wobs = None if weights is None else jnp.asarray(
            np.asarray(weights, dtype=np.float64), dtype)
        self.matrix_inversion_method = matrix_inversion_method
        self.num_rand_vec_trace = int(num_rand_vec_trace)
        self.cg_max_num_it = int(cg_max_num_it)
        self.cg_delta_conv = float(cg_delta_conv)
        self.seed_rand_vec_trace = int(seed_rand_vec_trace)
        self.nsim_var_pred = int(nsim_var_pred)
        _pc_aliases = {"Sigma_inv_plus_BtWB": "vadu", "jacobi": "diagonal"}
        self.cg_preconditioner_type = _pc_aliases.get(
            cg_preconditioner_type, cg_preconditioner_type)
        if matrix_inversion_method == "iterative":
            self._build_jitted_iterative()
        else:
            Zu = np.zeros((n, self.n_u), dtype=np.float64)
            Zu[np.arange(n), self._row_pos] = 1.0
            self._Zu = jnp.asarray(Zu, dtype)
            Zg = np.zeros((n, self.q_total), dtype=np.float64)
            for codes, vals, c0 in zip(self._g_codes, self._g_vals,
                                       self._g_cols):
                Zg[np.arange(n), c0 + codes] = vals
            self._Zg = jnp.asarray(Zg, dtype)
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
        # 2-D scatter densify (see vecchia_laplace._Q_logdetQ)
        rows = jnp.broadcast_to(jnp.arange(nu)[:, None], idx.shape)
        M = jnp.zeros((nu, nu), A.dtype).at[rows, idx].add(A)
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
    def _build_jitted_iterative(self):
        """Matrix-free joint-latent formulation (see module docstring).

        Reference: the sparse-matrix CG/SSOR machinery the reference runs
        for grouped REs + Vecchia GPs (re_model_template.h:7085,
        CG_utils.h:977-1078); here every operator is a gather/segment-sum
        over static index arrays so the whole fit jits into one executable.
        """
        from ..ops.iterative import (make_slq_logdet_congruence, pcg,
                                     pcg_it)

        nu, q, n = self.n_u, self.q_total, self.n
        N = nu + q
        lik = self.likelihood
        if getattr(lik, "num_sets_fe", 1) == 2 \
                or getattr(lik, "num_sets_re", 1) == 2:
            raise NotImplementedError(
                "two-predictor likelihoods are not supported with "
                "gp_approx='vecchia' plus grouped random effects")
        self.num_sets_fe = 1
        idx = self._vecchia._nn_idx                    # (nu, m)
        flat_idx = idx.reshape(-1)
        row_pos = jnp.asarray(self._row_pos)
        g_codes = [jnp.asarray(c) for c in self._g_codes]
        g_vals = [jnp.asarray(v, self.dtype) for v in self._g_vals]
        g_cols = list(self._g_cols)
        q_sizes = list(self.q_sizes)
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

        # ---- matrix-free structure operators ----------------------------
        def _Z_apply(b):
            """Zfull @ b as gathers: (N,) latent -> (n,) per-row effects."""
            loc = b[row_pos]
            for cd, vl, c0 in zip(g_codes, g_vals, g_cols):
                loc = loc + vl * b[nu + c0 + cd]
            return loc

        def _Zt_apply(x):
            """Zfull' @ x as segment sums: (n,) -> (N,)."""
            parts = [jax.ops.segment_sum(x, row_pos, num_segments=nu)]
            for cd, vl, qj in zip(g_codes, g_vals, q_sizes):
                parts.append(jax.ops.segment_sum(vl * x, cd,
                                                 num_segments=qj))
            return jnp.concatenate(parts) if q else parts[0]

        def _loc_of(b, F):
            return _Z_apply(b) + F

        # GP-block Vecchia operators over (A, D) at the unique points
        def _Av_op(A, v):
            return jnp.sum(A * v[idx], axis=1)

        def _Atv_op(A, w):
            return jnp.zeros_like(w).at[flat_idx].add(
                (A * w[:, None]).reshape(-1))

        def _Bv(A, v):
            return v - _Av_op(A, v)

        def _Btv(A, w):
            return w - _Atv_op(A, w)

        def _Qv(A, D, v):
            return _Btv(A, _Bv(A, v) / D)

        def _diag_Q(A, D):
            return 1.0 / D + jnp.zeros(nu, D.dtype).at[flat_idx].add(
                (A * A / D[:, None]).reshape(-1))

        # exact finite Neumann B^-1 (A strictly lower triangular in the
        # Vecchia ordering => nilpotent; see models/vecchia_laplace.py)
        NEUMANN_J = 32

        def _SJ(A, v):
            return jax.lax.fori_loop(
                0, NEUMANN_J, lambda i, t: v + _Av_op(A, t), v)

        def _SJt(A, w):
            return jax.lax.fori_loop(
                0, NEUMANN_J, lambda i, t: w + _Atv_op(A, t), w)

        def _theta_parts(theta_log):
            gvars_log, gp_log = self._theta_split(theta_log)
            A, D = self._vecchia._bd(gp_log, latent=True)
            prior_dg = jnp.exp(-gvars_log)[self._gvar_of_col] if q \
                else jnp.zeros(0, self.dtype)
            return A, D, prior_dg

        def _prior_quad(A, D, prior_dg, b):
            quad = b[:nu] @ _Qv(A, D, b[:nu])
            if q:
                quad = quad + jnp.sum(prior_dg * b[nu:] ** 2)
            return quad

        def _Hv(p, v):
            """(P + Zfull' W Zfull) v, all gathers/segment sums."""
            A, D, prior_dg, W = p
            t = _Zt_apply(W * _Z_apply(v))
            gp = _Qv(A, D, v[:nu]) + t[:nu]
            if not q:
                return gp
            return jnp.concatenate([gp, prior_dg * v[nu:] + t[nu:]])

        def _grad_b(A, D, prior_dg, b, d1):
            g = _Zt_apply(d1)
            g_gp = g[:nu] - _Qv(A, D, b[:nu])
            if not q:
                return g_gp
            return jnp.concatenate([g_gp, g[nu:] - prior_dg * b[nu:]])

        # ---- block preconditioner ---------------------------------------
        # GP block: vadu B'(D^-1 + W~u)B with W~u = diag(Zu' W Zu) (a
        # segment sum of W over duplicate rows); grouped block: Jacobi on
        # prior_dg + diag(Zg' W Zg).
        pc_type = self.cg_preconditioner_type
        if pc_type not in ("vadu", "ssor", "diagonal", "none"):
            raise ValueError(
                f"cg_preconditioner_type '{pc_type}' is not supported for "
                "grouped REs + Vecchia GP; use 'vadu' "
                "(Sigma_inv_plus_BtWB), 'ssor', 'diagonal' or 'none'")

        def _block_diags(p):
            A, D, prior_dg, W = p
            Wu = jax.ops.segment_sum(W, row_pos, num_segments=nu)
            d_gp = jnp.maximum(1.0 / D + Wu, 1e-10)
            parts = [prior_dg[c0:c0 + qj]
                     + jax.ops.segment_sum(vl * vl * W, cd, num_segments=qj)
                     for cd, vl, c0, qj in zip(g_codes, g_vals, g_cols,
                                               q_sizes)]
            d_g = jnp.maximum(jnp.concatenate(parts), 1e-10) if q \
                else jnp.zeros(0, self.dtype)
            return d_gp, d_g

        def _ssor_grouped(p, d_g, r_g):
            """SSOR sweep over the grouped block's component structure
            (CG_utils.h:977-1078 P_SSOR for Sigma^-1 + Z'WZ): within one
            component Z_j' W Z_j is diagonal, so the sweep runs component
            by component — (D+L) D^-1 (D+L)' with L the cross-component
            blocks Z_i' W Z_j applied as gather + segment-sum pairs. For a
            single grouped component this equals Jacobi exactly."""
            A, D, prior_dg, W = p
            K = len(g_codes)
            dsplit = []
            o = 0
            for qj in q_sizes:
                dsplit.append((o, qj))
                o += qj
            # forward sweep: (D + L) y = r
            y = [None] * K
            acc = jnp.zeros(n, self.dtype)
            for j in range(K):
                o, qj = dsplit[j]
                rhs = r_g[o:o + qj]
                if j > 0:
                    rhs = rhs - jax.ops.segment_sum(
                        g_vals[j] * acc, g_codes[j], num_segments=qj)
                y[j] = rhs / d_g[o:o + qj]
                if j < K - 1:
                    acc = acc + W * g_vals[j] * y[j][g_codes[j]]
            # scale: z = D y
            z = [y[j] * d_g[dsplit[j][0]:dsplit[j][0] + dsplit[j][1]]
                 for j in range(K)]
            # backward sweep: (D + L)' x = z
            x = [None] * K
            acc = jnp.zeros(n, self.dtype)
            for j in range(K - 1, -1, -1):
                o, qj = dsplit[j]
                rhs = z[j]
                if j < K - 1:
                    rhs = rhs - jax.ops.segment_sum(
                        g_vals[j] * acc, g_codes[j], num_segments=qj)
                x[j] = rhs / d_g[o:o + qj]
                if j > 0:
                    acc = acc + W * g_vals[j] * x[j][g_codes[j]]
            return jnp.concatenate(x)

        def _precond(p):
            A, D, prior_dg, W = p
            if pc_type == "none":
                return lambda r: r
            d_gp, d_g = _block_diags(p)
            if pc_type == "diagonal":
                pd = jnp.concatenate([_diag_Q(A, D) + d_gp - 1.0 / D, d_g]) \
                    if q else (_diag_Q(A, D) + d_gp - 1.0 / D)
                return lambda r: r / pd

            def apply(r):
                gp = _SJ(A, _SJt(A, r[:nu]) / d_gp)
                if not q:
                    return gp
                if pc_type == "ssor":
                    return jnp.concatenate([gp, _ssor_grouped(p, d_g,
                                                              r[nu:])])
                return jnp.concatenate([gp, r[nu:] / d_g])

            return apply

        # exact-congruence SLQ: M = blockdiag(S_J d_gp^-1/2, d_g^-1/2),
        # det S_J = 1 so -2 log|det M| = sum log d_gp + sum log d_g
        def _m_apply(p, v):
            A, D, prior_dg, W = p
            d_gp, d_g = _block_diags(p)
            gp = _SJ(A, v[:nu] / jnp.sqrt(d_gp))
            if not q:
                return gp
            return jnp.concatenate([gp, v[nu:] / jnp.sqrt(d_g)])

        def _mt_apply(p, w):
            A, D, prior_dg, W = p
            d_gp, d_g = _block_diags(p)
            gp = _SJt(A, w[:nu]) / jnp.sqrt(d_gp)
            if not q:
                return gp
            return jnp.concatenate([gp, w[nu:] / jnp.sqrt(d_g)])

        def _logdet_p(p):
            d_gp, d_g = _block_diags(p)
            out = jnp.sum(jnp.log(d_gp))
            if q:
                out = out + jnp.sum(jnp.log(d_g))
            return out

        slq_logdet = make_slq_logdet_congruence(
            _Hv, _m_apply, _mt_apply, _logdet_p, _precond, N,
            rank=min(N, 50), num_probes=self.num_rand_vec_trace,
            seed=self.seed_rand_vec_trace, dtype=self.dtype)

        cg_tol = self.cg_delta_conv
        cg_maxit = self.cg_max_num_it

        def _solve_H(p, rhs, x0=None):
            return pcg(lambda v: _Hv(p, v), rhs, precond=_precond(p),
                       tol=cg_tol, maxit=cg_maxit, x0=x0)

        def _solve_H_it(p, rhs):
            return pcg_it(lambda v: _Hv(p, v), rhs, precond=_precond(p),
                          tol=cg_tol, maxit=cg_maxit)

        self._Hv_op = _Hv
        self._precond_op = _precond
        self._solve_H_op = _solve_H
        self._Z_apply_op = _Z_apply
        self._Zt_apply_op = _Zt_apply
        self._theta_parts_op = _theta_parts
        self._Qv_op = _Qv
        self._Btv_op = _Btv

        # ---- mode finding: Newton + PCG ---------------------------------
        def _mode_solve(A, D, prior_dg, aux, y, F, b_init):
            p_of = lambda W: (A, D, prior_dg, W)
            obj0 = -0.5 * _prior_quad(A, D, prior_dg, b_init) \
                + _loglik(y, _loc_of(b_init, F), aux)

            def newton_body(carry):
                b, obj, it, done, cg = carry
                loc = _loc_of(b, F)
                d1 = _d1(y, loc, aux)
                W = _W_mode(y, loc, aux)
                grad = _grad_b(A, D, prior_dg, b, d1)
                delta, cg_it = _solve_H_it(p_of(W), grad)
                cg = cg + cg_it
                gdd = grad @ delta

                def bt_cond(bt):
                    lr, ih, acc, _, _ = bt
                    return jnp.logical_and(~acc, ih < MAX_LR_SHRINK_MODE)

                def bt_body(bt):
                    lr, ih, _, _, _ = bt
                    b_new = b + lr * delta
                    obj_new = -0.5 * _prior_quad(A, D, prior_dg, b_new) \
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
                return (b_new, obj_new, it + 1, jnp.logical_or(conv, bad),
                        cg)

            b_fin, _, nit, _, cg_tot = jax.lax.while_loop(
                lambda c: jnp.logical_and(~c[3], c[2] < MAXIT_MODE_NEWTON),
                newton_body, (b_init, obj0, 0, False, 0))
            return b_fin, nit, cg_tot

        def _g(u, F, b, y):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            A, D, prior_dg = _theta_parts(theta_log)
            loc = _loc_of(b, F)
            W = _W(y, loc, aux)
            logdet_prec = -jnp.sum(jnp.log(D))
            if q:
                logdet_prec = logdet_prec + jnp.sum(jnp.log(prior_dg))
            return (0.5 * _prior_quad(A, D, prior_dg, b)
                    - _loglik(y, loc, aux)
                    + 0.5 * (slq_logdet((A, D, prior_dg, W)) - logdet_prec))

        def _r(u, F, b, y):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            A, D, prior_dg = _theta_parts(theta_log)
            d1 = _d1(y, _loc_of(b, F), aux)
            return -_grad_b(A, D, prior_dg, b, d1)

        @jax.custom_vjp
        def nll_fn(u, F, y, b_init):
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            A, D, prior_dg = _theta_parts(theta_log)
            b, nit, cg = _mode_solve(A, D, prior_dg, aux, y, F, b_init)
            return _g(u, F, b, y), (b, jnp.stack([nit, cg]))

        def nll_fwd(u, F, y, b_init):
            out = nll_fn(u, F, y, b_init)
            return out, (u, F, y, out[1][0])

        def nll_bwd(res, ct):
            ct_nll = ct[0]
            u, F, y, b = res
            theta_log = u[:self.num_theta]
            aux = jnp.exp(u[self.num_theta:])
            A, D, prior_dg = _theta_parts(theta_log)
            W = _W(y, _loc_of(b, F), aux)
            g_u, g_F, g_b = jax.grad(_g, argnums=(0, 1, 2))(u, F, b, y)
            lam = _solve_H((A, D, prior_dg, W), g_b)
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
        if len(stats) > 1 and int(stats[1]) > 0:
            self.last_num_cg_it = int(stats[1])
            self.total_num_cg_it = getattr(self, "total_num_cg_it", 0) \
                + int(stats[1])

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

    def _pred_setup(self, pars_orig, aux_pars, y, pred_data):
        """Shared host-side prediction setup: internal parameter vector u,
        pred coords, grouped incidence Zp and new-level prior variances."""
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
        theta_log = jnp.asarray(u[:self.num_theta], self.dtype)
        gvars_log, gp_log = (np.asarray(x) for x in
                             self._theta_split(theta_log))
        gp_pd = next(p for p, c in zip(pred_data["comps"], self.components)
                     if c.kind == "gp")
        cp = np.asarray(gp_pd["coords_pred"], dtype=np.float64)
        if cp.ndim == 1:
            cp = cp[:, None]
        n_pred = len(cp)
        q = self.q_total
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
            newm = ~old
            if newm.any():
                same = (codes_pred[:, None] == codes_pred[None, :]) \
                    & np.outer(newm, newm)
                new_var += gvars[jg] * same * np.outer(vals, vals)
            col += c.num_groups
            jg += 1
        return u, theta_log, gvars_log, gp_log, cp, n_pred, Zp, new_var

    def _predict_iterative(self, pars_orig, aux_pars, y, F, pred_data,
                           a_init=None, predict_var=False,
                           predict_cov_mat=False, predict_response=False,
                           F_pred=None, **kwargs):
        """Matrix-free joint prediction: identical posterior algebra to the
        dense path (cov = K_pp - K' Q K + U H^-1 U' + new-level priors,
        U = [Q K; Zp']) with Q applied as gathers and the n_pred H-solves
        batched through one PCG loop (ops/iterative.pcg_batched)."""
        from ..ops.iterative import pcg_batched
        (u, theta_log, gvars_log, gp_log, cp, n_pred, Zp_np,
         new_var) = self._pred_setup(pars_orig, aux_pars, y, pred_data)
        aux_d = jnp.exp(jnp.asarray(u[self.num_theta:], self.dtype))
        yd = jnp.asarray(y, self.dtype)
        Fd = jnp.asarray(F, self.dtype)
        if a_init is None:
            a_init = self.zero_mode()
        _nll, (b, _nit) = self._nll_fn(jnp.asarray(u, self.dtype), Fd, yd,
                                       a_init)
        nu, q = self.n_u, self.q_total

        v = float(np.exp(gp_log[0]))
        alpha = jnp.asarray(np.exp(gp_log[1:]), self.dtype)
        cf = self.comp.cov_fn
        co = jnp.asarray(self._vecchia.coords_ord, self.dtype)
        cpd = jnp.asarray(cp, self.dtype)
        d_cross = jnp.sqrt(jnp.maximum(
            ((co[:, None, :] - cpd[None, :, :]) ** 2).sum(-1), 0))
        K_cross = v * cf.corr_from_dist(d_cross, alpha)    # (nu, n_pred)

        loc = self._loc_of(b, Fd)
        d1 = self._d1_fn(yd, loc, aux_d)
        W = self._W_fn(yd, loc, aux_d)
        A, D, prior_dg = self._theta_parts_op(theta_log)

        # posterior mean: mode condition gives Q b_gp = Zu' d1 = a
        a = jax.ops.segment_sum(d1, jnp.asarray(self._row_pos),
                                num_segments=nu)
        mu_p = K_cross.T @ a
        if q:
            mu_p = mu_p + jnp.asarray(Zp_np, self.dtype) @ b[nu:]
        mu_np = np.asarray(mu_p)
        mu_lat = mu_np if F_pred is None else mu_np + np.asarray(F_pred)
        out = {"mu": mu_lat}
        if predict_var or predict_cov_mat or predict_response:
            d_pp = jnp.sqrt(jnp.maximum(
                ((cpd[:, None, :] - cpd[None, :, :]) ** 2).sum(-1), 0))
            K_pp = v * cf.corr_from_dist(d_pp, alpha)
            QK = jax.vmap(lambda k: self._Qv_op(A, D, k),
                          in_axes=1, out_axes=1)(K_cross)   # (nu, n_pred)
            U = jnp.concatenate(
                [QK, jnp.asarray(Zp_np.T, self.dtype)]) if q else QK
            p = (A, D, prior_dg, W)
            HU = pcg_batched(lambda vv: self._Hv_op(p, vv), U.T,
                             precond=self._precond_op(p),
                             tol=self.cg_delta_conv,
                             maxit=self.cg_max_num_it).T      # (N, n_pred)
            cov = K_pp - K_cross.T @ QK + U.T @ HU \
                + jnp.asarray(new_var, self.dtype)
            if predict_cov_mat:
                out["cov"] = np.asarray(cov)
            if predict_var or predict_response:
                out["var"] = np.asarray(jnp.diagonal(cov)).copy()
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

    def predict(self, pars_orig, aux_pars, y, F, pred_data, a_init=None,
                predict_var=False, predict_cov_mat=False,
                predict_response=False, F_pred=None, **kwargs):
        """Joint latent prediction: GP part via exact cross-covariances with
        the Vecchia training precision, grouped part via the posterior of the
        group effects, with all cross terms through the joint H^-1
        (PredictLaplaceApproxVecchia + grouped components)."""
        if self.matrix_inversion_method == "iterative":
            return self._predict_iterative(
                pars_orig, aux_pars, y, F, pred_data, a_init=a_init,
                predict_var=predict_var, predict_cov_mat=predict_cov_mat,
                predict_response=predict_response, F_pred=F_pred, **kwargs)
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
