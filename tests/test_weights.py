"""Weights support: weighted Gaussian nugget, weighted Laplace, binomial."""

import numpy as np
import pytest

from gpboost_tpu import GPModel, fitGPModel
from gpboost_tpu.utils.datasim import sim_rand_unif, qnorm


def _sim(n, c):
    return sim_rand_unif(n, init_c=c, mod_lcg=134456, mult=8121, inc=28411)


class TestWeights:
    def test_near_one_weights_reproduce_unweighted(self):
        """test_GPModel_grouped_random_effects.R:66-71: weights 1.000000001
        give the unweighted golden results."""
        n, m = 1000, 100
        group = np.zeros(n, dtype=int)
        for i in range(m):
            group[i * (n // m):(i + 1) * (n // m)] = i + 1
        y = qnorm(_sim(m, 0.546))[group - 1] + np.sqrt(0.5) * qnorm(_sim(n, 0.1))
        mw = GPModel(group_data=group, weights=np.full(n, 1.000000001))
        mw.fit(y=y, params=dict(
            optimizer_cov="fisher_scoring", std_dev=True,
            convergence_criterion="relative_change_in_parameters"))
        exp = np.array([0.49348532, 0.02326312, 1.22299521, 0.17995161])
        got = np.asarray(mw.get_cov_pars(std_err=True)).T.ravel()
        assert np.sum(np.abs(got - exp)) < 1e-6
        assert mw.get_num_optim_iter() == 5

    def test_heteroscedastic_weights_fix_nugget_bias(self):
        rng = np.random.RandomState(0)
        n = 500
        g = rng.randint(0, 50, n)
        w = np.where(np.arange(n) < n // 2, 4.0, 0.25)
        y = rng.randn(50)[g] + 0.5 * rng.randn(n) / np.sqrt(w)
        mf = fitGPModel(group_data=g, weights=w, y=y,
                        params=dict(optimizer_cov="lbfgs"))
        assert abs(mf.get_cov_pars()[0] - 0.25) < 0.08   # true nugget 0.25

    def test_binomial_logit(self):
        rng = np.random.RandomState(3)
        n = 400
        g = rng.randint(0, 20, n)
        b = 0.9 * rng.randn(20)
        trials = rng.randint(1, 30, n).astype(float)
        p = 1 / (1 + np.exp(-b[g]))
        yfrac = rng.binomial(trials.astype(int), p) / trials
        m = GPModel(group_data=g, likelihood="binomial_logit", weights=trials)
        m.fit(y=yfrac, params=dict(optimizer_cov="lbfgs"))
        pred = m.predict(group_data_pred=np.arange(20), y=yfrac,
                         predict_response=True)
        emp = np.array([(yfrac * trials)[g == j].sum() / trials[g == j].sum()
                        for j in range(20)])
        assert np.corrcoef(pred["mu"], emp)[0, 1] > 0.98

    def test_binomial_rejects_out_of_range(self):
        with pytest.raises(ValueError):
            GPModel(group_data=np.arange(10) % 3,
                    likelihood="binomial_logit").fit(
                        y=np.linspace(-0.5, 1.5, 10))


class TestWeightsWithApproximations:
    """Weights beyond gp_approx='none' (re_model.h ctor weights): golden
    values produced by the COMPILED reference library (bench_reference.py
    build) on this exact data — see _gen_weights_golden.py provenance."""

    @pytest.fixture(scope="class")
    def wdata(self):
        n = 200
        coords = sim_rand_unif(n * 2, init_c=0.1).reshape(2, n).T
        D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
        C = np.linalg.cholesky(np.exp(-D / 0.1) + 1e-20 * np.eye(n))
        eps = C @ qnorm(sim_rand_unif(n, init_c=0.8))
        xi = qnorm(sim_rand_unif(n, init_c=0.3)) / 4.0
        w = 0.5 + sim_rand_unif(n, init_c=0.55) * 2.0
        y = eps + xi / np.sqrt(w)
        return dict(n=n, coords=coords, eps=eps, w=w, y=y)

    def test_vecchia_weighted_nll_golden(self, wdata):
        m = GPModel(gp_coords=wdata["coords"], cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=30,
                    vecchia_ordering="none", weights=wdata["w"])
        nll = m.neg_log_likelihood(cov_pars=[0.08, 1.1, 0.12], y=wdata["y"])
        assert abs(nll - 241.55287211671592) < 1e-8

    def test_vecchia_weighted_prediction_golden(self, wdata):
        m = GPModel(gp_coords=wdata["coords"], cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=30,
                    vecchia_ordering="none", weights=wdata["w"])
        coords_pred = sim_rand_unif(10, init_c=0.33).reshape(2, 5).T
        m.num_neighbors_pred = 30
        pr = m.predict(y=wdata["y"], gp_coords_pred=coords_pred,
                       cov_pars=[0.08, 1.1, 0.12], predict_var=True,
                       predict_response=True)
        np.testing.assert_allclose(
            pr["mu"], [1.4732118381279045, -0.9869788575603993,
                       -0.2663048755724224, 1.4559654078664808,
                       1.3439075488558712], atol=1e-6)
        np.testing.assert_allclose(
            pr["var"], [0.4786700113750881, 0.3903457583038167,
                        0.49713344618967853, 0.49443042752430216,
                        0.16753331560112428], atol=1e-6)

    def test_vecchia_laplace_weighted_nll_golden(self, wdata):
        mu_lat = 0.7 * wdata["eps"]
        yp = np.floor(sim_rand_unif(wdata["n"], init_c=0.12) * 4
                      * np.exp(np.clip(mu_lat, -3, 3)))
        m = GPModel(gp_coords=wdata["coords"], cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=30,
                    vecchia_ordering="none", likelihood="poisson",
                    weights=wdata["w"], matrix_inversion_method="cholesky")
        nll = m.neg_log_likelihood(cov_pars=[1.0, 0.1], y=yp)
        # reference golden 553.8941697328762 (mode-finding tolerance differs)
        assert abs(nll - 553.8941697328762) / 553.89 < 1e-4

    def test_fitc_weighted_vs_dense_oracle(self, wdata):
        """The reference's FITC picks different kmeans++ inducing points, so
        parity is checked against an exact dense reconstruction of OUR FITC
        covariance (D + U U' + diag(sigma2/w)) instead."""
        import math
        m = GPModel(gp_coords=wdata["coords"], cov_function="exponential",
                    gp_approx="fitc", num_ind_points=60, seed=1,
                    weights=wdata["w"])
        pars = [0.08, 1.1, 0.12]
        ours = m.neg_log_likelihood(cov_pars=pars, y=wdata["y"])
        ip = np.asarray(m._engine.ip)
        coords, w, y, n = (wdata["coords"], wdata["w"], wdata["y"],
                           wdata["n"])
        s2, v, rho = pars
        d_uu = np.sqrt(((ip[:, None] - ip[None, :]) ** 2).sum(-1))
        d_uf = np.sqrt(((ip[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
        Kuu = np.exp(-d_uu / rho) + 1e-10 * np.eye(len(ip))
        Kuf = np.exp(-d_uf / rho)
        U = Kuf.T @ np.linalg.inv(Kuu) @ Kuf
        Sigma = v * (U + np.diag(np.maximum(1.0 - np.diag(U), 0.0))) \
            + s2 * np.diag(1.0 / w)
        L = np.linalg.cholesky(Sigma)
        nll = 0.5 * (y @ np.linalg.solve(Sigma, y)
                     + 2 * np.sum(np.log(np.diag(L)))
                     + n * math.log(2 * math.pi))
        assert abs(ours - nll) < 1e-5
