"""Iterative methods (CG + stochastic Lanczos quadrature) tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpboost_tpu.ops.iterative import pcg, make_cg_solve, make_slq_logdet
from gpboost_tpu import GPModel, fitGPModel

pytestmark = pytest.mark.slow  # compile-heavy tier (pytest.ini)

TOL_ITERATIVE = 1e-1  # reference TOLERANCE_ITERATIVE


class TestPrimitives:
    def test_pcg_solves(self):
        rng = np.random.RandomState(0)
        q = 80
        M = rng.randn(q, q)
        A = M @ M.T + q * np.eye(q)
        b = rng.randn(q)
        x = np.asarray(pcg(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                           tol=1e-10))
        assert np.allclose(A @ x, b, atol=1e-6)

    def test_slq_logdet_accuracy_and_gradient(self):
        rng = np.random.RandomState(1)
        q = 60
        M = rng.randn(q, q)
        G = M @ M.T + q * np.eye(q)
        Gd = jnp.asarray(G)

        def matvec(theta, v):
            return Gd @ v + jnp.exp(theta[0]) * v

        logdet = make_slq_logdet(matvec, q, rank=q, num_probes=400, seed=0)
        theta = jnp.asarray([0.3])
        exact = np.linalg.slogdet(G + np.exp(0.3) * np.eye(q))[1]
        est = float(logdet(theta))
        assert abs(est - exact) < 0.05 * abs(exact)
        # gradient: d logdet / d theta = exp(theta) tr((G + e^t I)^-1)
        g = float(jax.grad(lambda t: logdet(t))(theta)[0])
        exact_g = np.exp(0.3) * np.trace(
            np.linalg.inv(G + np.exp(0.3) * np.eye(q)))
        assert abs(g - exact_g) < 0.05 * abs(exact_g)

    def test_cg_solve_gradient(self):
        rng = np.random.RandomState(2)
        q = 40
        M = rng.randn(q, q)
        G = jnp.asarray(M @ M.T + q * np.eye(q))
        b = jnp.asarray(rng.randn(q))

        def matvec(theta, v):
            return G @ v + jnp.exp(theta[0]) * v

        solve = make_cg_solve(matvec, tol=1e-12)

        def f(theta):
            return jnp.sum(solve(theta, b) ** 2)

        g = float(jax.grad(f)(jnp.asarray([0.1]))[0])
        eps = 1e-6
        fd = (float(f(jnp.asarray([0.1 + eps])))
              - float(f(jnp.asarray([0.1 - eps])))) / (2 * eps)
        assert abs(g - fd) < 1e-5 * max(abs(fd), 1.0)


class TestIterativeGroupedRE:
    def test_matches_cholesky(self):
        rng = np.random.RandomState(0)
        n = 800
        g1 = rng.randint(0, 80, n)
        g2 = rng.randint(0, 40, n)
        y = rng.randn(80)[g1] + 0.7 * rng.randn(40)[g2] + 0.5 * rng.randn(n)
        G = np.column_stack([g1, g2])
        nll_c = GPModel(group_data=G).neg_log_likelihood(
            cov_pars=[0.25, 1.0, 0.5], y=y)
        nll_i = GPModel(group_data=G, matrix_inversion_method="iterative"
                        ).neg_log_likelihood(cov_pars=[0.25, 1.0, 0.5], y=y)
        assert abs(nll_c - nll_i) < max(TOL_ITERATIVE * 10, 1.0)
        fc = fitGPModel(group_data=G, y=y, params=dict(optimizer_cov="lbfgs"))
        fi = fitGPModel(group_data=G, matrix_inversion_method="iterative",
                        y=y, params=dict(optimizer_cov="lbfgs"))
        assert np.sum(np.abs(fc.get_cov_pars() - fi.get_cov_pars())) \
            < TOL_ITERATIVE
