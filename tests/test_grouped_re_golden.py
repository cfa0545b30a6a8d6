"""Golden-value parity tests for grouped random effects.

Expected numbers from R-package/tests/testthat/test_GPModel_grouped_random_effects.R
(note: that file uses its own LCG constants and TOLERANCE_STRICT = 1e-6).
"""

import numpy as np
import pytest

from gpboost_tpu import GPModel, fitGPModel
from gpboost_tpu.utils.datasim import sim_rand_unif, qnorm

TOL_STRICT = 1e-6
TOL_MEDIUM = 1e-3
TOL_LOOSE = 1e-2


def _sim(n, init_c):
    return sim_rand_unif(n, init_c=init_c, mod_lcg=134456, mult=8121, inc=28411)


@pytest.fixture(scope="module")
def re_sim_data():
    """test_GPModel_grouped_random_effects.R:25-49."""
    n = 1000
    m = 100
    group = np.zeros(n, dtype=int)
    for i in range(m):
        group[i * (n // m):(i + 1) * (n // m)] = i + 1
    b1 = qnorm(_sim(m, 0.546))
    n_gr = n // 20
    group2 = np.tile(np.arange(1, n_gr + 1), n // n_gr)
    b2 = qnorm(_sim(n_gr, 0.46))
    x = np.cos((np.arange(1, n + 1) - n / 2) ** 2 * 5.5 * np.pi / n)
    b3 = qnorm(_sim(m, 0.69))
    xi = np.sqrt(0.5) * qnorm(_sim(n, 0.1))
    X = np.column_stack([np.ones(n),
                         np.sin((np.arange(1, n + 1) - n / 2) ** 2 * 2 * np.pi / n)])
    cluster_ids = np.concatenate([np.ones(int(0.4 * n)), 2 * np.ones(int(0.6 * n))])
    return {"n": n, "m": m, "group": group, "group2": group2, "b1": b1,
            "b2": b2, "b3": b3, "x": x, "xi": xi, "X": X,
            "cluster_ids": cluster_ids}


class TestSingleLevelGrouped:
    """test_GPModel_grouped_random_effects.R:52-120."""

    def test_fisher_scoring(self, re_sim_data):
        d = re_sim_data
        y = d["b1"][d["group"] - 1] + d["xi"]
        gp_model = GPModel(group_data=d["group"])
        gp_model.fit(y=y, params=dict(
            optimizer_cov="fisher_scoring", std_dev=True,
            convergence_criterion="relative_change_in_parameters"))
        expected = np.array([0.49348532, 0.02326312, 1.22299521, 0.17995161])
        interleaved = np.asarray(gp_model.get_cov_pars(std_err=True)).T.ravel()
        assert np.sum(np.abs(interleaved - expected)) < TOL_STRICT
        assert gp_model.get_num_optim_iter() == 5

    def test_gradient_descent(self, re_sim_data):
        d = re_sim_data
        y = d["b1"][d["group"] - 1] + d["xi"]
        gp_model = fitGPModel(group_data=d["group"], y=y, params=dict(
            optimizer_cov="gradient_descent", lr_cov=0.1,
            use_nesterov_acc=False, maxit=1000,
            convergence_criterion="relative_change_in_parameters"))
        expected = np.array([0.49348532, 1.22299521])
        assert np.sum(np.abs(gp_model.get_cov_pars() - expected)) < 1e-5

    def test_gradient_descent_nesterov(self, re_sim_data):
        d = re_sim_data
        y = d["b1"][d["group"] - 1] + d["xi"]
        gp_model = fitGPModel(group_data=d["group"], y=y, params=dict(
            optimizer_cov="gradient_descent", lr_cov=0.2,
            use_nesterov_acc=True, acc_rate_cov=0.1, maxit=1000,
            convergence_criterion="relative_change_in_parameters"))
        expected = np.array([0.49348532, 1.22299521])
        assert np.sum(np.abs(gp_model.get_cov_pars() - expected)) < 1e-5

    def test_gradient_descent_large_lr(self, re_sim_data):
        d = re_sim_data
        y = d["b1"][d["group"] - 1] + d["xi"]
        gp_model = fitGPModel(group_data=d["group"], y=y, params=dict(
            optimizer_cov="gradient_descent", lr_cov=10.0,
            use_nesterov_acc=False, maxit=1000,
            convergence_criterion="relative_change_in_parameters"))
        expected = np.array([0.49348532, 1.22299521])
        assert np.sum(np.abs(gp_model.get_cov_pars() - expected)) < TOL_STRICT

    def test_nelder_mead(self, re_sim_data):
        d = re_sim_data
        y = d["b1"][d["group"] - 1] + d["xi"]
        gp_model = fitGPModel(group_data=d["group"], y=y, params=dict(
            optimizer_cov="nelder_mead", delta_rel_conv=1e-6, std_dev=True))
        expected = np.array([0.49348532, 0.02326312, 1.22299521, 0.17995161])
        interleaved = np.asarray(gp_model.get_cov_pars(std_err=True)).T.ravel()
        assert np.sum(np.abs(interleaved - expected)) < TOL_MEDIUM

    def test_lbfgs_fixed_pars(self, re_sim_data):
        d = re_sim_data
        y = d["b1"][d["group"] - 1] + d["xi"]
        gp_model = fitGPModel(group_data=d["group"], y=y, params=dict(
            optimizer_cov="lbfgs", estimate_cov_par_index=[1, 0],
            init_cov_pars=[0.23, 0.45], std_dev=True))
        expected = np.array([0.50600551128, 0.02385332856, 0.45, 0.07083578226])
        interleaved = np.asarray(gp_model.get_cov_pars(std_err=True)).T.ravel()
        assert np.sum(np.abs(interleaved - expected)) < TOL_STRICT
        assert abs(gp_model.get_current_neg_log_likelihood() - 1229.514733) \
            < TOL_STRICT


class TestTwoLevelGrouped:
    def test_two_random_effects_plus_slope(self, re_sim_data):
        """Two crossed grouped REs + random slope, Gaussian
        (test_GPModel_grouped_random_effects.R 'multiple grouped random effects')."""
        d = re_sim_data
        y = (d["b1"][d["group"] - 1] + d["b2"][d["group2"] - 1]
             + d["x"] * d["b3"][d["group"] - 1] + d["xi"])
        gp_model = fitGPModel(
            group_data=np.column_stack([d["group"], d["group2"]]),
            group_rand_coef_data=d["x"],
            ind_effect_group_rand_coef=[1],
            y=y, params=dict(optimizer_cov="lbfgs"))
        pars = gp_model.get_cov_pars()
        # sanity bounds: simulated variances are ~(0.5, 1, 1, 1)
        assert pars.shape[0] == 4
        assert np.all(pars > 0.05)
        assert abs(pars[0] - 0.5) < 0.3
