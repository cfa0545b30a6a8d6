"""Preconditioner family for the iterative engines.

The acceptance evidence VERDICT asked for: each preconditioner is reachable
through ``cg_preconditioner_type`` and measurably REDUCES the CG iteration
counter relative to an unpreconditioned / diagonal solve on the same
problem. References: re_model_template.h:5859-5867 (supported set),
CG_utils.h:977-1078 (SSOR), re_model_template.h:7465 (vecchia_response).
"""

import numpy as np
import pytest
from scipy.stats import norm

import gpboost_tpu as gpb

pytestmark = pytest.mark.slow  # compile-heavy tier (pytest.ini)


@pytest.fixture(scope="module")
def vl_data():
    n = 3000
    rng = np.random.RandomState(11)
    coords = rng.rand(n, 2)
    f = np.sin(6 * coords[:, 0]) * np.cos(4 * coords[:, 1])
    y = (rng.rand(n) < norm.cdf(f)).astype(float)
    return coords, y


def _vl_model(coords, pc, cov_function="exponential", **kw):
    m = gpb.GPModel(gp_coords=coords, cov_function=cov_function,
                    gp_approx="vecchia", num_neighbors=15,
                    likelihood="bernoulli_probit",
                    matrix_inversion_method="iterative", **kw)
    m.set_optim_params({"cg_preconditioner_type": pc})
    return m


@pytest.mark.parametrize("pc", ["vadu", "vecchia_response"])
def test_vl_preconditioners_cut_cg_iterations(vl_data, pc):
    coords, y = vl_data
    pars = [1.0, 0.1]
    base = _vl_model(coords, "diagonal")
    base.neg_log_likelihood(cov_pars=pars, y=y)
    its_diag = base.get_total_num_cg_steps()
    m = _vl_model(coords, pc)
    m.neg_log_likelihood(cov_pars=pars, y=y)
    its_pc = m.get_total_num_cg_steps()
    assert its_pc > 0
    assert its_pc < its_diag, (pc, its_pc, its_diag)


def test_vl_pivoted_cholesky_cuts_cg_iterations_smooth_kernel():
    """The rank-k pivoted-Cholesky preconditioner pays off when Sigma_nn
    is near-low-rank (smooth kernels; piv_chol_on_Sigma_nn,
    re_model_template.h:5859). The exponential kernel's eigenvalues decay
    too slowly for a rank-50 capture at ANY range (measured: rank-50
    pivchol loses to a plain diagonal there) — the Gaussian kernel is the
    kernel class this preconditioner is for."""
    n = 2000
    rng = np.random.RandomState(13)
    coords = rng.rand(n, 2)
    f = np.sin(2 * coords[:, 0])
    y = (rng.rand(n) < norm.cdf(f)).astype(float)
    pars = [1.0, 0.5]
    base = _vl_model(coords, "diagonal", cov_function="matern",
                     cov_fct_shape=2.5)
    base.neg_log_likelihood(cov_pars=pars, y=y)
    its_diag = base.get_total_num_cg_steps()
    m = _vl_model(coords, "pivoted_cholesky", cov_function="matern",
                  cov_fct_shape=2.5)
    m.neg_log_likelihood(cov_pars=pars, y=y)
    its_pc = m.get_total_num_cg_steps()
    assert 0 < its_pc < its_diag, (its_pc, its_diag)


def test_vl_vecchia_response_nll_matches_vadu(vl_data):
    coords, y = vl_data
    pars = [1.0, 0.1]
    nv = _vl_model(coords, "vadu").neg_log_likelihood(cov_pars=pars, y=y)
    nr = _vl_model(coords, "vecchia_response").neg_log_likelihood(
        cov_pars=pars, y=y)
    # identical SLQ probes/congruence; only the CG solves differ
    assert abs(nv - nr) / abs(nv) < 1e-4


def test_vl_vecchia_response_fit_and_gradients(vl_data):
    """The reference cannot compute gradients under 'vecchia_response'
    (likelihoods.h:6525 REFatal); here the SLQ log-det rides the vadu
    congruence so the full fit works with it."""
    coords, y = vl_data
    m = _vl_model(coords, "vecchia_response")
    m.fit(y=y, params={"maxit": 8, "init_cov_pars": [1.0, 0.1]})
    assert np.all(np.isfinite(m.get_cov_pars()))
    assert m.get_num_optim_iter() > 0


@pytest.fixture(scope="module")
def combo_crossed_data():
    """Two crossed grouped components + a Vecchia GP: the case where the
    grouped block of H has cross-component coupling and SSOR beats
    Jacobi."""
    n, q1, q2 = 2500, 60, 40
    rng = np.random.RandomState(5)
    coords = rng.rand(n, 2)
    g1 = rng.randint(0, q1, n)
    g2 = rng.randint(0, q2, n)
    b1 = 0.8 * rng.normal(size=q1)
    b2 = 0.6 * rng.normal(size=q2)
    f = np.sin(5 * coords[:, 0])
    y = (rng.rand(n) < norm.cdf(f + b1[g1] + b2[g2])).astype(float)
    return coords, np.column_stack([g1, g2]), y


def _combo_model(coords, groups, pc):
    m = gpb.GPModel(group_data=groups, gp_coords=coords,
                    cov_function="exponential", gp_approx="vecchia",
                    num_neighbors=15, likelihood="bernoulli_probit",
                    matrix_inversion_method="iterative")
    m.set_optim_params({"cg_preconditioner_type": pc})
    return m


def test_combined_ssor_beats_jacobi(combo_crossed_data):
    coords, groups, y = combo_crossed_data
    pars = [0.5, 0.4, 1.0, 0.12]
    mj = _combo_model(coords, groups, "vadu")     # grouped block = Jacobi
    mj.neg_log_likelihood(cov_pars=pars, y=y)
    its_j = mj.get_total_num_cg_steps()
    ms = _combo_model(coords, groups, "ssor")
    ns = ms.neg_log_likelihood(cov_pars=pars, y=y)
    its_s = ms.get_total_num_cg_steps()
    nj = mj.neg_log_likelihood(cov_pars=pars, y=y)
    assert np.isfinite(ns) and abs(ns - nj) / abs(nj) < 1e-4
    assert 0 < its_s <= its_j, (its_s, its_j)


def test_combined_ssor_param_rebuild(combo_crossed_data):
    """cg_preconditioner_type passed through set_optim_params rebuilds the
    jitted engine (config surface, gp_model.py:521-559)."""
    coords, groups, y = combo_crossed_data
    m = _combo_model(coords, groups, "vadu")
    m.set_optim_params({"cg_preconditioner_type": "ssor"})
    assert m._engine.cg_preconditioner_type == "ssor"
    nll = m.neg_log_likelihood(cov_pars=[0.5, 0.4, 1.0, 0.12], y=y)
    assert np.isfinite(nll)
