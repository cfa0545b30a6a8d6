"""Iterative methods: preconditioned CG and stochastic Lanczos quadrature.

Reference: include/GPBoost/CG_utils.h — preconditioned CG solvers specialized
per structure (:42-1078), CG-tridiagonal (Lanczos) for stochastic log-dets
(:81-384), Rademacher probe vectors (:351-370). The TPU rebuild expresses all
of it over an abstract SPD matvec inside jitted lax.while_loop/scan:

  * pcg:        Jacobi/SSOR-style preconditioned conjugate gradients
  * slq_logdet: log|A| ~= mean_z ||z||^2 e1' log(T_k) e1 over Rademacher
                probes z, T_k the Lanczos tridiagonal of A in K_k(A, z)

Both carry custom VJPs so they compose with the autodiff-driven optimizers:
d(A^-1 b) uses one extra CG solve (adjoint), and d log|A| uses the saved probe
solves for an unbiased stochastic trace tr(A^-1 dA) — the same estimator the
reference uses for its iterative gradients (CG_utils.h:399 CalcOptimalC).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def pcg(matvec, b, precond=None, tol=1e-6, maxit=1000, x0=None):
    """Solve A x = b for SPD A given matvec; optionally M^-1 via precond."""
    if precond is None:
        precond = lambda r: r
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = precond(r)
    p = z
    rz = jnp.vdot(r, z)
    bnorm = jnp.linalg.norm(b)

    def cond(carry):
        x, r, p, rz, it = carry
        return jnp.logical_and(jnp.linalg.norm(r) > tol * bnorm, it < maxit)

    def body(carry):
        x, r, p, rz, it = carry
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, p, rz_new, it + 1)

    x, r, p, rz, it = jax.lax.while_loop(cond, body, (x, r, p, rz, 0))
    return x


def pcg_it(matvec, b, precond=None, tol=1e-6, maxit=1000, x0=None):
    """pcg variant that also returns the iteration count (the reference's
    GetNumCGSteps introspection, re_model.h:145)."""
    import jax
    bnorm = jnp.linalg.norm(b)
    x = jnp.zeros_like(b) if x0 is None else x0
    if precond is None:
        precond = lambda v: v
    r = b - matvec(x)
    z = precond(r)
    p = z
    rz = jnp.vdot(r, z)

    def cond(carry):
        x, r, p, rz, it = carry
        return jnp.logical_and(jnp.linalg.norm(r) > tol * bnorm, it < maxit)

    def body(carry):
        x, r, p, rz, it = carry
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, p, rz_new, it + 1)

    x, r, p, rz, it = jax.lax.while_loop(cond, body, (x, r, p, rz, 0))
    return x, it


def pcg_batched(matvec, B, precond=None, tol=1e-6, maxit=1000):
    """Solve A X = B column-wise for a batch of right-hand sides.

    B is (k, n) (one system per ROW); matvec/precond act on a single (n,)
    vector and are vmapped here. One while_loop drives all systems — it
    stops when EVERY system's residual is below tol (relative to its own
    rhs norm); already-converged systems keep iterating harmlessly (their
    alpha is guarded to 0 when the search direction degenerates). The
    reference solves multi-rhs systems column-by-column on the host
    (CG_utils.h:208 CGVecchiaLaplaceSimProbe loops); one batched device
    loop replaces that."""
    if precond is None:
        precond = lambda r: r
    mv = jax.vmap(matvec)
    pc = jax.vmap(precond)
    bnorm = jnp.linalg.norm(B, axis=1)
    tol_b = tol * jnp.maximum(bnorm, 1e-300)
    X = jnp.zeros_like(B)
    R = B - mv(X)
    Z = pc(R)
    P = Z
    rz = jnp.einsum("kn,kn->k", R, Z)

    def cond(carry):
        X, R, P, rz, it = carry
        return jnp.logical_and(
            jnp.any(jnp.linalg.norm(R, axis=1) > tol_b), it < maxit)

    def body(carry):
        X, R, P, rz, it = carry
        AP = mv(P)
        pAp = jnp.einsum("kn,kn->k", P, AP)
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp > 0, pAp, 1.0), 0.0)
        X = X + alpha[:, None] * P
        R = R - alpha[:, None] * AP
        Z = pc(R)
        rz_new = jnp.einsum("kn,kn->k", R, Z)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        P = Z + beta[:, None] * P
        return (X, R, P, rz_new, it + 1)

    X, R, P, rz, it = jax.lax.while_loop(cond, body, (X, R, P, rz, 0))
    return X


def lanczos_tridiag(matvec, z, rank):
    """Lanczos tridiagonalization of A restricted to K_rank(A, z).

    Returns (alphas (rank,), betas (rank-1,)) of the tridiagonal T.
    """
    q = z / jnp.linalg.norm(z)

    def step(carry, _):
        q, q_prev, beta_prev = carry
        w = matvec(q) - beta_prev * q_prev
        alpha = jnp.vdot(q, w)
        w = w - alpha * q
        beta = jnp.linalg.norm(w)
        q_next = jnp.where(beta > 1e-12, w / jnp.maximum(beta, 1e-300), q)
        return (q_next, q, beta), (alpha, beta)

    (_, _, _), (alphas, betas) = jax.lax.scan(
        step, (q, jnp.zeros_like(q), jnp.asarray(0.0, z.dtype)),
        None, length=rank)
    return alphas, betas[:-1]


def _slq_logdet_value(matvec, n, rank, probes, probe_chunk=None):
    """Stochastic Lanczos quadrature estimate of log|A| (CG_utils.h:384).

    probe_chunk: how many probes run vmapped at once (the rest via a
    sequential lax.map over chunks). Each probe's Lanczos holds transient
    (chunk, n, neighbors)-sized gathers in the matvec — at n=100k a fully
    vmapped 50-probe batch exhausts HBM; chunking bounds the peak."""

    def one(z):
        alphas, betas = lanczos_tridiag(matvec, z, rank)
        T = jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1)
        evals, evecs = jnp.linalg.eigh(T)
        evals = jnp.maximum(evals, 1e-300)
        weights = evecs[0, :] ** 2
        return jnp.vdot(z, z) * jnp.sum(weights * jnp.log(evals))

    m = probes.shape[0]
    if probe_chunk is None or probe_chunk >= m:
        return jnp.mean(jax.vmap(one)(probes))
    g = m // probe_chunk
    vals = jax.lax.map(lambda pz: jax.vmap(one)(pz),
                       probes[: g * probe_chunk].reshape(
                           g, probe_chunk, n)).reshape(-1)
    if m > g * probe_chunk:
        vals = jnp.concatenate(
            [vals, jax.vmap(one)(probes[g * probe_chunk:])])
    return jnp.mean(vals)


def make_slq_logdet(matvec_of_theta, n, rank=50, num_probes=50, seed=0,
                    dtype=jnp.float64):
    """Build logdet(theta) ~= log|A(theta)| with a custom VJP.

    matvec_of_theta(theta, v) -> A(theta) v must be pure jax and
    differentiable in theta. Probes are fixed Rademacher vectors
    (reuse_rand_vec_trace semantics: the same probes across optimizer
    iterations make the objective a smooth deterministic function).
    """
    rng = np.random.RandomState(seed)
    probes = jnp.asarray(
        rng.randint(0, 2, size=(num_probes, n)) * 2.0 - 1.0, dtype)

    @jax.custom_vjp
    def logdet(theta):
        return _slq_logdet_value(lambda v: matvec_of_theta(theta, v), n, rank,
                                 probes)

    def fwd(theta):
        val = logdet(theta)
        return val, theta

    def bwd(theta, ct):
        # d log|A| = tr(A^-1 dA) ~= mean_z (A^-1 z)' dA z  (same probes)
        def solve_one(z):
            return pcg(lambda v: matvec_of_theta(theta, v), z,
                       tol=1e-6, maxit=1000)

        Ainv_z = jax.vmap(solve_one)(probes)

        def trace_fn(th):
            Az = jax.vmap(lambda z: matvec_of_theta(th, z))(probes)
            return jnp.mean(jnp.sum(Ainv_z * Az, axis=1))

        g = jax.grad(trace_fn)(theta)
        return (g * ct,)

    logdet.defvjp(fwd, bwd)
    return logdet


def make_slq_logdet_precond(matvec_of_p, precond_diag_of_p, n, rank=50,
                            num_probes=50, seed=0, dtype=jnp.float64):
    """Diagonally-preconditioned stochastic Lanczos quadrature log-det with
    a custom VJP, over an arbitrary parameter PYTREE `p`.

    log|A(p)| = log|P| + log|P^-1/2 A P^-1/2| with P = diag(precond_diag);
    the second term is estimated by SLQ on the preconditioned (better
    conditioned) operator. This is the TPU-parallel analogue of the
    reference's preconditioned SLQ (CG_utils.h:384 LogDetStochTridiag with
    the vadu/Jacobi preconditioners, re_model_template.h:5859-5867) — a
    diagonal P keeps every op a gather/scatter/elementwise instead of the
    sequential sparse triangular solves vadu would need.

    Gradients: d log|A| = tr(A^-1 dA) estimated with the same fixed
    Rademacher probes (reuse_rand_vec_trace semantics) and Jacobi-PCG
    solves A^-1 z.
    """
    rng = np.random.RandomState(seed)
    probes = jnp.asarray(
        rng.randint(0, 2, size=(num_probes, n)) * 2.0 - 1.0, dtype)

    @jax.custom_vjp
    def logdet(p):
        d = precond_diag_of_p(p)
        sqd = jnp.sqrt(d)

        def mv(v):
            return matvec_of_p(p, v / sqd) / sqd

        return (_slq_logdet_value(mv, n, rank, probes)
                + jnp.sum(jnp.log(d)))

    def fwd(p):
        return logdet(p), p

    def bwd(p, ct):
        d = precond_diag_of_p(p)

        def solve_one(z):
            return pcg(lambda v: matvec_of_p(p, v), z,
                       precond=lambda r: r / d, tol=1e-6, maxit=1000)

        Ainv_z = jax.vmap(solve_one)(probes)

        def trace_fn(pp):
            Az = jax.vmap(lambda z: matvec_of_p(pp, z))(probes)
            return jnp.mean(jnp.sum(Ainv_z * Az, axis=1))

        g = jax.grad(trace_fn)(p)
        return (jax.tree_util.tree_map(lambda x: x * ct, g),)

    logdet.defvjp(fwd, bwd)
    return logdet


def make_slq_logdet_congruence(matvec_of_p, m_apply_of_p, mt_apply_of_p,
                               logdet_p_of_p, precond_of_p, n, rank=50,
                               num_probes=50, seed=0, dtype=jnp.float64,
                               probe_chunk=None, cg_tol=1e-6, cg_maxit=1000):
    """Preconditioned SLQ log-det via an EXACT congruence identity.

    Given a preconditioner P^-1 = M M' (M = m_apply, M' = mt_apply, both
    linear in v and possibly parameter-dependent), the congruent operator
    A_tilde = M' A M is SPD and

        log|A| = log|A_tilde| - 2 log|det M| = log|A_tilde| + logdet_p

    EXACTLY (logdet_p_of_p must return -2 log|det M|). SLQ only estimates
    log|A_tilde|, whose spectrum is clustered near 1 when P ~= A — this is
    the reference's preconditioned stochastic Lanczos quadrature
    (CG_utils.h:384 LogDetStochTridiag with the vadu preconditioner,
    re_model_template.h:5859) with the control-variate step (CalcOptimalC,
    CG_utils.h:399) collapsed: the preconditioner's log-determinant enters
    deterministically instead of being estimated, so the variance the
    reference's optimal-c weights remove is zero by construction here.

    Gradients: d log|A| = tr(A^-1 dA), estimated with the same fixed
    Rademacher probes and P-preconditioned CG solves (precond_of_p(p)
    -> function r -> P^-1 r).
    """
    rng = np.random.RandomState(seed)
    probes = jnp.asarray(
        rng.randint(0, 2, size=(num_probes, n)) * 2.0 - 1.0, dtype)

    @jax.custom_vjp
    def logdet(p):
        def mv(v):
            return mt_apply_of_p(p, matvec_of_p(p, m_apply_of_p(p, v)))

        return _slq_logdet_value(mv, n, rank, probes,
                                 probe_chunk=probe_chunk) + logdet_p_of_p(p)

    def fwd(p):
        return logdet(p), p

    def bwd(p, ct):
        pinv = precond_of_p(p)

        def solve_one(z):
            return pcg(lambda v: matvec_of_p(p, v), z, precond=pinv,
                       tol=cg_tol, maxit=cg_maxit)

        # probe_chunk-sized vmapped batches under a sequential lax.map:
        # bounds the live gather/matvec intermediates to one chunk (a fully
        # vmapped batch exhausts HBM at n=100k, a fully sequential map
        # wastes the chip). checkpoint drops the matvec internals from the
        # autodiff tape (recomputed in its backward pass).
        def chunked(f, xs):
            leaves = jax.tree_util.tree_leaves(xs)
            mtot = leaves[0].shape[0]
            ck = probe_chunk or mtot
            g = mtot // ck
            head = jax.tree_util.tree_map(
                lambda a: a[: g * ck].reshape((g, ck) + a.shape[1:]), xs)
            out = jax.lax.map(lambda c: jax.vmap(f)(c), head)
            out = jax.tree_util.tree_map(
                lambda a: a.reshape((g * ck,) + a.shape[2:]), out)
            if mtot > g * ck:
                tail = jax.tree_util.tree_map(lambda a: a[g * ck:], xs)
                out = jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a, b]), out,
                    jax.vmap(f)(tail))
            return out

        Ainv_z = chunked(solve_one, probes)

        def trace_fn(pp):
            @jax.checkpoint
            def one(args):
                z, az = args
                return jnp.vdot(az, matvec_of_p(pp, z))

            return jnp.mean(chunked(one, (probes, Ainv_z)))

        g = jax.grad(trace_fn)(p)
        return (jax.tree_util.tree_map(lambda x: x * ct, g),)

    logdet.defvjp(fwd, bwd)
    return logdet


def pivoted_cholesky_kernel(coords, var, corr_of_dist, rank, jitter=1e-10):
    """Rank-k pivoted Cholesky of the kernel matrix Sigma_nn WITHOUT forming
    it (CG_utils.h:438 PivotedCholsekyFactorizationSigma): columns are
    evaluated on demand from the covariance function. Fully jittable — the
    greedy diagonal pivot is a dynamic index inside a lax.fori_loop.

    coords (n, d); corr_of_dist maps a distance vector to correlations.
    Returns (L, d_rem): L (n, rank) with Sigma ~= L L', d_rem the remaining
    diagonal of the Schur complement (a measure of the approximation error,
    used to pick the jitter of the inverse-form preconditioner).
    """
    n = coords.shape[0]
    d0 = jnp.full(n, var, coords.dtype)
    L0 = jnp.zeros((n, rank), coords.dtype)

    def body(j, carry):
        d, L = carry
        i = jnp.argmax(d)
        ci = jax.lax.dynamic_index_in_dim(coords, i, keepdims=False)
        dist = jnp.sqrt(jnp.maximum(
            jnp.sum((coords - ci[None, :]) ** 2, axis=1), 0.0))
        col = var * corr_of_dist(dist) - L @ L[i, :]
        piv = jnp.sqrt(jnp.maximum(d[i], jitter))
        lcol = col / piv
        # the pivot row must come out exactly: enforce it (numerical noise in
        # `col` at the pivot otherwise leaks into the Schur complement)
        lcol = lcol.at[i].set(piv)
        L = L.at[:, j].set(lcol)
        d = jnp.maximum(d - lcol * lcol, 0.0)
        return (d, L)

    d_rem, L = jax.lax.fori_loop(0, rank, body, (d0, L0))
    return L, d_rem


def make_cg_solve_precond(matvec_of_p, precond_of_p, tol=1e-6, maxit=1000):
    """Build solve(p, b) = A(p)^-1 b over a parameter pytree `p`, with a
    P-preconditioned CG (precond_of_p(p) -> r -> P^-1 r) and an
    implicit-diff custom VJP (one adjoint CG solve; the reference's iterative
    gradient pattern, CG_utils.h:505 CGFSA + re_model_template.h gradients)."""

    @jax.custom_vjp
    def solve(p, b):
        return pcg(lambda v: matvec_of_p(p, v), b, precond=precond_of_p(p),
                   tol=tol, maxit=maxit)

    def fwd(p, b):
        x = solve(p, b)
        return x, (p, x)

    def bwd(res, ct):
        p, x = res
        lam = pcg(lambda v: matvec_of_p(p, v), ct, precond=precond_of_p(p),
                  tol=tol, maxit=maxit)

        def quad(pp):
            return -jnp.vdot(lam, matvec_of_p(pp, x))

        g_p = jax.grad(quad)(p)
        return (g_p, lam)

    solve.defvjp(fwd, bwd)
    return solve


def make_cg_solve(matvec_of_theta, tol=1e-6, maxit=1000):
    """Build solve(theta, b) = A(theta)^-1 b with implicit-diff custom VJP."""

    @jax.custom_vjp
    def solve(theta, b):
        return pcg(lambda v: matvec_of_theta(theta, v), b, tol=tol, maxit=maxit)

    def fwd(theta, b):
        x = solve(theta, b)
        return x, (theta, x)

    def bwd(res, ct):
        theta, x = res
        lam = pcg(lambda v: matvec_of_theta(theta, v), ct, tol=tol, maxit=maxit)
        # d theta: -lam' dA x
        def quad(th):
            return -jnp.vdot(lam, matvec_of_theta(th, x))
        g_theta = jax.grad(quad)(theta)
        return (g_theta, lam)

    solve.defvjp(fwd, bwd)
    return solve
