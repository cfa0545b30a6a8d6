"""RE-scale grouped Laplace engine: dispatch, parity vs the dense engine,
and scalability smoke tests.

Reference semantics: likelihoods.h:2959 FindModePostRandEffCalcMLLGroupedRE,
:3223 ...OnlyOneGroupedRECalculationsOnREScale. The q-dimensional formulation
is mathematically identical to the dense n-dimensional one
(|I_n + Z Sb Z' W| = |I_q + Sb Z'WZ|), so parity here is exact-tier.
"""

import numpy as np
import pytest

from gpboost_tpu import GPModel
from gpboost_tpu.models.grouped_laplace import GroupedRELaplaceEngine
from gpboost_tpu.models.laplace import LaplaceDenseEngine
from gpboost_tpu.likelihoods import get_likelihood

from conftest import TOLERANCE_STRICT, TOLERANCE_MEDIUM


def _sim(n, q, seed=0, ncomp=1):
    rng = np.random.RandomState(seed)
    groups = rng.randint(0, q, size=(n, ncomp))
    b = [0.7 * rng.standard_normal(q) for _ in range(ncomp)]
    eta = 0.3 + sum(bj[groups[:, j]] for j, bj in enumerate(b))
    return groups, eta, rng


def test_dispatch_grouped_nongaussian_uses_re_scale():
    groups, eta, rng = _sim(200, 20)
    y = (rng.uniform(size=200) < 1 / (1 + np.exp(-eta))).astype(float)
    m = GPModel(group_data=groups[:, 0], likelihood="bernoulli_logit")
    assert isinstance(m._engine, GroupedRELaplaceEngine)
    assert m._engine.diag_path
    m2 = GPModel(group_data=np.column_stack([groups[:, 0], groups[:, 0] // 2]),
                 likelihood="poisson")
    assert isinstance(m2._engine, GroupedRELaplaceEngine)
    assert not m2._engine.diag_path


@pytest.mark.parametrize("likelihood,ncomp", [
    ("bernoulli_probit", 1),
    ("bernoulli_logit", 2),
    ("poisson", 2),
    ("gamma", 1),
])
def test_q_scale_matches_dense_engine(likelihood, ncomp):
    """NLL and gradients of the q-scale engine equal the dense n x n
    engine's (same Laplace approximation, different parameterization)."""
    n, q = 120, 15
    groups, eta, rng = _sim(n, q, seed=3, ncomp=ncomp)
    if likelihood.startswith("bernoulli"):
        y = (rng.uniform(size=n) < 1 / (1 + np.exp(-eta))).astype(float)
    elif likelihood == "poisson":
        y = rng.poisson(np.exp(0.3 * eta)).astype(float)
    else:
        y = rng.gamma(2.0, np.exp(0.2 * eta) / 2.0)

    from gpboost_tpu.models.components import GroupedComponent
    comps_q = [GroupedComponent(groups[:, j], name=f"G{j}")
               for j in range(ncomp)]
    comps_d = [GroupedComponent(groups[:, j], name=f"G{j}")
               for j in range(ncomp)]
    lik_q = get_likelihood(likelihood, None)
    lik_d = get_likelihood(likelihood, None)
    eng_q = GroupedRELaplaceEngine(comps_q, n, lik_q)
    eng_d = LaplaceDenseEngine(comps_d, n, lik_d)

    pars = np.linspace(0.5, 0.9, ncomp)
    aux0 = lik_q.init_aux(y) if lik_q.num_aux else None
    u = np.log(pars) if aux0 is None else np.concatenate(
        [np.log(pars), np.log(aux0)])
    F = 0.1 * rng.standard_normal(n)
    nll_q, gu_q, gF_q, _ = eng_q.laplace_vag_F(u, y, F, eng_q.zero_mode())
    nll_d, gu_d, gF_d, _ = eng_d.laplace_vag_F(u, y, F, eng_d.zero_mode())
    assert nll_q == pytest.approx(nll_d, abs=TOLERANCE_STRICT)
    np.testing.assert_allclose(gu_q, gu_d, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(gF_q, gF_d, atol=1e-6, rtol=1e-6)


def test_q_scale_predict_matches_dense():
    n, q = 150, 12
    groups, eta, rng = _sim(n, q, seed=7)
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-eta))).astype(float)
    gd_pred = np.array([0, 1, 5, q + 3, q + 3])   # incl. unseen groups

    outs = {}
    for dense in (False, True):
        m = GPModel(group_data=groups[:, 0], likelihood="bernoulli_logit")
        if dense:
            from gpboost_tpu.models.components import GroupedComponent
            lik = get_likelihood("bernoulli_logit", None)
            m._engine = LaplaceDenseEngine(
                [GroupedComponent(groups[:, 0])], n, lik)
            m._likelihood_obj = lik
            m._use_woodbury = False
        m.fit(y, params={"optimizer_cov": "gradient_descent", "lr_cov": 0.1,
                         "use_nesterov_acc": True, "maxit": 50})
        out_lat = m.predict(group_data_pred=gd_pred, predict_var=True,
                            predict_response=False)
        out_resp = m.predict(group_data_pred=gd_pred, predict_var=True,
                             predict_response=True)
        outs[dense] = (m.get_cov_pars(), out_lat, out_resp)

    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-4, atol=1e-5)
    for k in range(2):
        np.testing.assert_allclose(outs[0][1 + k]["mu"], outs[1][1 + k]["mu"],
                                   atol=TOLERANCE_MEDIUM)
        np.testing.assert_allclose(outs[0][1 + k]["var"],
                                   outs[1][1 + k]["var"],
                                   atol=TOLERANCE_MEDIUM)
    # unseen groups: prior-mean latent prediction with prior variance
    assert outs[0][1]["mu"][3] == pytest.approx(0.0, abs=1e-10)
    assert outs[0][1]["var"][3] == pytest.approx(
        float(outs[0][0][0]), abs=1e-10)


def test_scale_smoke_n50k_q2k():
    """BASELINE config #5 shape: bernoulli GLMM at scale on one host —
    impossible with the dense O(n^2) engine, routine on the RE scale."""
    n, q = 50_000, 2000
    groups, eta, rng = _sim(n, q, seed=1)
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-eta))).astype(float)
    m = GPModel(group_data=groups[:, 0], likelihood="bernoulli_logit")
    assert isinstance(m._engine, GroupedRELaplaceEngine)
    m.fit(y, params={"optimizer_cov": "lbfgs", "maxit": 50})
    v = float(m.get_cov_pars()[0])
    assert 0.2 < v < 1.2      # true variance 0.49
    out = m.predict(group_data_pred=groups[:5, 0], predict_var=True,
                    predict_response=True)
    assert np.all(np.isfinite(out["mu"])) and np.all(out["var"] > 0)
