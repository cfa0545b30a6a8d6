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
