"""On-device GD loops (models/jit_gd.py): the fused/warm-started per-round
refits must optimize the SAME objective as the host fit.

Regression: gd_fit_laplace_engine previously passed unpermuted (F, y) to
Vecchia-Laplace engines whose traceable NLL expects Vecchia-ordered inputs
(models/vecchia_laplace.py _permute) — the refit then optimized the wrong
model.
"""

import numpy as np
import jax.numpy as jnp

import gpboost_tpu as gpb
from gpboost_tpu.models.jit_gd import (gd_fit_engine, gd_fit_laplace_engine)


def _vl_model(n=400, seed=4):
    rng = np.random.RandomState(seed)
    coords = rng.rand(n, 2)
    f = np.sin(6 * coords[:, 0]) * np.cos(4 * coords[:, 1])
    y = rng.poisson(np.exp(0.7 * f)).astype(float)
    m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    likelihood="poisson", gp_approx="vecchia",
                    num_neighbors=10, matrix_inversion_method="cholesky")
    return m, y, rng


def test_gd_laplace_refit_optimizes_the_true_nll():
    m, y, rng = _vl_model()
    eng = m._engine
    F = 0.3 * rng.rand(len(y))
    init = np.array([1.0, 0.15])
    nll0 = float(eng.laplace_vag_F(
        jnp.asarray(np.log(eng.transform_pars(init))), jnp.asarray(y),
        jnp.asarray(F), eng.zero_mode())[0])
    pars, aux, nll, lr, it, a = gd_fit_laplace_engine(
        eng, init, None, y, F, eng.zero_mode(), lr0=0.1, max_iter=15)
    # the reported nll must BE the true (host-API) nll at the found pars
    nll_true = float(eng.laplace_vag_F(
        jnp.asarray(np.log(eng.transform_pars(pars))), jnp.asarray(y),
        jnp.asarray(F), eng.zero_mode())[0])
    assert nll < nll0, (nll, nll0)
    assert abs(nll - nll_true) < 1e-5 * max(1.0, abs(nll_true)), \
        (nll, nll_true)


def test_gd_laplace_refit_matches_host_fit():
    m, y, rng = _vl_model()
    eng = m._engine
    F = np.zeros(len(y))
    pars, _, nll, _, _, _ = gd_fit_laplace_engine(
        eng, np.array([1.0, 0.15]), None, y, F, eng.zero_mode(),
        lr0=0.1, max_iter=40)
    m2, _, _ = _vl_model()
    m2.fit(y=y, params={"optimizer_cov": "gradient_descent", "maxit": 40,
                        "init_cov_pars": [1.0, 0.15]})
    np.testing.assert_allclose(
        np.ravel(pars), np.ravel(m2.get_cov_pars()), rtol=0.15)
