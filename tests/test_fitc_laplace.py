"""FITC-Laplace engine: non-Gaussian likelihoods with inducing-point latent
GPs (likelihoods.h:4028 FindModePostRandEffCalcMLLFITC).

Oracle: with ALL training points as inducing points the FITC prior equals the
exact covariance, so the dense Laplace engine is an exact reference.
"""

import numpy as np
import pytest

import gpboost_tpu as gpb


@pytest.fixture(scope="module")
def pois_data():
    rng = np.random.RandomState(0)
    n = 200
    coords = rng.rand(n, 2)
    D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    lat = np.linalg.cholesky(np.exp(-D / 0.2) + 1e-8 * np.eye(n)) \
        @ rng.randn(n)
    y = rng.poisson(np.exp(0.3 + lat)).astype(float)
    return dict(coords=coords, y=y, pred=rng.rand(6, 2))


class TestFITCLaplace:
    def test_nll_exact_at_m_equals_n(self, pois_data):
        d = pois_data
        md = gpb.GPModel(gp_coords=d["coords"], cov_function="exponential",
                         likelihood="poisson")
        nll_d = md.neg_log_likelihood(cov_pars=[1.0, 0.2], y=d["y"])
        mf = gpb.GPModel(gp_coords=d["coords"], cov_function="exponential",
                         likelihood="poisson", gp_approx="fitc",
                         num_ind_points=len(d["y"]),
                         ind_points_selection="random")
        nll_f = mf.neg_log_likelihood(cov_pars=[1.0, 0.2], y=d["y"])
        assert abs(nll_f - nll_d) < 1e-3

    def test_nll_approx_close(self, pois_data):
        d = pois_data
        md = gpb.GPModel(gp_coords=d["coords"], cov_function="exponential",
                         likelihood="poisson")
        nll_d = md.neg_log_likelihood(cov_pars=[1.0, 0.2], y=d["y"])
        mf = gpb.GPModel(gp_coords=d["coords"], cov_function="exponential",
                         likelihood="poisson", gp_approx="fitc",
                         num_ind_points=60)
        nll_f = mf.neg_log_likelihood(cov_pars=[1.0, 0.2], y=d["y"])
        assert abs(nll_f - nll_d) < 5.0

    def test_fit_close_to_dense(self, pois_data):
        d = pois_data
        m_dense = gpb.fitGPModel(gp_coords=d["coords"],
                                 cov_function="exponential",
                                 likelihood="poisson", y=d["y"],
                                 params={"maxit": 50})
        m_fitc = gpb.fitGPModel(gp_coords=d["coords"],
                                cov_function="exponential",
                                likelihood="poisson", gp_approx="fitc",
                                num_ind_points=len(d["y"]),
                                ind_points_selection="random",
                                y=d["y"], params={"maxit": 50})
        np.testing.assert_allclose(np.asarray(m_fitc.get_cov_pars()),
                                   np.asarray(m_dense.get_cov_pars()),
                                   rtol=0.05)

    def test_predict_matches_dense_at_m_equals_n(self, pois_data):
        d = pois_data
        pars = [0.8, 0.18]
        md = gpb.GPModel(gp_coords=d["coords"], cov_function="exponential",
                         likelihood="poisson")
        pd_ = md.predict(gp_coords_pred=d["pred"], cov_pars=pars, y=d["y"],
                         predict_var=True, predict_response=False)
        mf = gpb.GPModel(gp_coords=d["coords"], cov_function="exponential",
                         likelihood="poisson", gp_approx="fitc",
                         num_ind_points=len(d["y"]),
                         ind_points_selection="random")
        pf = mf.predict(gp_coords_pred=d["pred"], cov_pars=pars, y=d["y"],
                        predict_var=True, predict_response=False)
        np.testing.assert_allclose(pf["mu"], pd_["mu"], atol=5e-3)
        np.testing.assert_allclose(pf["var"], pd_["var"], atol=5e-3)

    def test_response_scale_prediction(self, pois_data):
        d = pois_data
        m = gpb.fitGPModel(gp_coords=d["coords"], cov_function="exponential",
                           likelihood="poisson", gp_approx="fitc",
                           num_ind_points=60, y=d["y"],
                           params={"maxit": 20})
        p = m.predict(gp_coords_pred=d["pred"], predict_var=True,
                      predict_response=True)
        assert np.all(np.isfinite(p["mu"])) and np.all(p["mu"] > 0)
        assert np.all(p["var"] > 0)

    def test_gamma_aux_par_estimation(self, pois_data):
        d = pois_data
        ygam = d["y"] + 0.5
        m = gpb.fitGPModel(gp_coords=d["coords"], cov_function="exponential",
                           likelihood="gamma", gp_approx="fitc",
                           num_ind_points=60, y=ygam,
                           params={"maxit": 30})
        r = m._fit_result
        assert r.aux_pars is not None and np.all(np.isfinite(r.aux_pars))
        assert np.isfinite(m.get_current_neg_log_likelihood())
