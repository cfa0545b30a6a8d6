"""cluster_ids with gp_approx='vecchia' (independent realizations).

Reference semantics: conditioning sets never cross cluster boundaries
(re_model_template.h SetUpGPIds; the per-cluster covariance blocks of the
dense engine). With num_neighbors = n-1 and ordering 'none', the
per-cluster Vecchia factorization is the exact block Cholesky, so the NLL
must equal the dense engine's clustered NLL exactly.

Round-5 regression note: before this round, cluster_ids with
gp_approx='vecchia' were silently IGNORED (the model fit a single
realization) — test_silent_ignore_regression pins the fix.
"""

import numpy as np
import pytest

import gpboost_tpu as gpb


@pytest.fixture(scope="module")
def clustered_data():
    n = 160
    rng = np.random.RandomState(3)
    coords = rng.rand(n, 2)
    cid = np.repeat([1, 2, 3, 4], n // 4)
    y = np.sin(4 * coords[:, 0]) + 0.4 * rng.randn(n)
    return coords, cid, y


def test_exact_parity_with_dense_clustered(clustered_data):
    coords, cid, y = clustered_data
    n = len(y)
    pars = [0.15, 1.0, 0.12]
    dense = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                        cluster_ids=cid)
    vec = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                      gp_approx="vecchia", num_neighbors=n - 1,
                      vecchia_ordering="none", cluster_ids=cid)
    nd = dense.neg_log_likelihood(cov_pars=pars, y=y)
    nv = vec.neg_log_likelihood(cov_pars=pars, y=y)
    assert abs(nd - nv) < 1e-6 * abs(nd)


def test_silent_ignore_regression(clustered_data):
    """Clustered and unclustered Vecchia NLLs must differ (the clustered
    model treats realizations as independent)."""
    coords, cid, y = clustered_data
    pars = [0.15, 1.0, 0.3]
    m_c = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                      gp_approx="vecchia", num_neighbors=30,
                      vecchia_ordering="none", cluster_ids=cid)
    m_u = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                      gp_approx="vecchia", num_neighbors=30,
                      vecchia_ordering="none")
    nc = m_c.neg_log_likelihood(cov_pars=pars, y=y)
    nu = m_u.neg_log_likelihood(cov_pars=pars, y=y)
    assert abs(nc - nu) > 1e-3


def test_fit_clustered_vecchia(clustered_data):
    coords, cid, y = clustered_data
    m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=20,
                    cluster_ids=cid)
    m.fit(y=y, params={"maxit": 20, "init_cov_pars": [0.2, 1.0, 0.15]})
    assert np.all(np.isfinite(m.get_cov_pars()))
    # m = n-1 clustered fit matches the dense clustered fit
    d = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    cluster_ids=cid)
    d.fit(y=y, params={"maxit": 20, "init_cov_pars": [0.2, 1.0, 0.15],
                       "optimizer_cov": "lbfgs"})
    v = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=len(y) - 1,
                    vecchia_ordering="none", cluster_ids=cid)
    v.fit(y=y, params={"maxit": 20, "init_cov_pars": [0.2, 1.0, 0.15],
                       "optimizer_cov": "lbfgs"})
    np.testing.assert_allclose(v.get_cov_pars(), d.get_cov_pars(),
                               rtol=1e-3)


def test_predict_and_nongaussian_guards(clustered_data):
    coords, cid, y = clustered_data
    m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=20,
                    cluster_ids=cid)
    with pytest.raises(NotImplementedError):
        m.predict(y=y, gp_coords_pred=coords[:3],
                  cluster_ids_pred=cid[:3], cov_pars=[0.2, 1.0, 0.15])
    with pytest.raises(NotImplementedError):
        gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=20,
                    likelihood="bernoulli_probit", cluster_ids=cid)
