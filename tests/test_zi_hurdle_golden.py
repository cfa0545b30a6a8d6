"""Golden-value parity for zero-inflated count and hurdle likelihoods.

Expected numbers from
R-package/tests/testthat/test_GPModel_zero_inflated_hurdle.R (LCG-simulated
deterministic data, :20-60; golden blocks GRP :63-76, FISH :252-254,
vecchia :306-311, hurdle GPD/EGPD :95-118).
"""

import numpy as np
import pytest
from scipy import stats

from gpboost_tpu import GPModel, fitGPModel
from gpboost_tpu.utils.datasim import sim_rand_unif, qnorm

TOL_STRICT = 1e-5
TOL_MED = 1e-3
TOL_LOOSE = 1e-2


def _relerr(a, b):
    a = np.atleast_1d(np.asarray(a, dtype=np.float64))
    b = np.atleast_1d(np.asarray(b, dtype=np.float64))
    return np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-10))


@pytest.fixture(scope="module")
def zi_data():
    n, m = 500, 50
    group = np.repeat(np.arange(1, m + 1), n // m)
    b1 = qnorm(sim_rand_unif(m, 0.15))
    u1 = sim_rand_unif(n, 0.271)
    u2 = sim_rand_unif(n, 0.55)
    d = 2
    coords = sim_rand_unif(n * d, 0.63).reshape(d, n).T   # R column-major
    Dm = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    Sig = np.exp(-Dm / 0.2) + np.eye(n) * 1e-8
    gp_re = np.linalg.cholesky(Sig) @ qnorm(sim_rand_unif(n, 0.9))
    X = np.ones((n, 1))
    return dict(n=n, m=m, group=group, b1=b1, u1=u1, u2=u2, coords=coords,
                gp_re=gp_re, X=X)


def sim_y(fam, eta, u1, u2):
    mu = np.exp(eta)
    p0 = 0.3
    if fam == "zero_inflated_poisson":
        pos = stats.poisson.ppf(u2, mu)
    elif fam == "zero_inflated_negative_binomial":
        pos = stats.nbinom.ppf(u2, 2, 2.0 / (2.0 + mu))
    elif fam == "zero_inflated_negative_binomial_1":
        r = mu / 0.6
        pos = stats.nbinom.ppf(u2, r, 1.0 / 1.6)
    elif fam == "hurdle_gamma":
        pos = stats.gamma.ppf(u2, a=2, scale=mu / 2.0)
    else:   # hurdle_lognormal
        pos = np.exp(stats.norm.ppf(u2, np.log(mu) - 0.25, np.sqrt(0.5)))
    return np.where(u1 < p0, 0.0, pos)


AUX0 = {"zero_inflated_poisson": [0.3],
        "zero_inflated_negative_binomial": [2, 0.3],
        "zero_inflated_negative_binomial_1": [0.6, 0.3],
        "hurdle_gamma": [2, 0.3],
        "hurdle_lognormal": [0.5, 0.3]}

FAMS = list(AUX0)


def _is_count(fam):
    return "poisson" in fam or "negative_binomial" in fam


def _lik(fam):
    # the GRP golden values were generated with ordinary Laplace for the
    # count families (test_GPModel_zero_inflated_hurdle.R:46-48)
    return fam + "_laplace" if _is_count(fam) else fam


def _eta_true(fam, re):
    return (-0.2 if _is_count(fam) else 0.5) + re


# golden block GRP (test_GPModel_zero_inflated_hurdle.R:63-76)
GRP = {
    "zero_inflated_poisson": dict(
        eval=512.05, est=[0.273824, -0.387411, 0.273181, 504.945],
        mu=[0.371826, 0.698981, 0.565764], var=[0.455206, 0.956973, 0.824791]),
    "zero_inflated_negative_binomial": dict(
        eval=515.749, est=[0.288551, -0.686769, 0.821462, 0.0012576, 509.700],
        mu=[0.443883, 0.740021, 0.580566], var=[0.764349, 1.57599, 1.24213]),
    "zero_inflated_negative_binomial_1": dict(
        eval=510.889, est=[0.257704, -0.671678, 0.88514, 0.0173243, 503.876],
        mu=[0.390796, 0.767784, 0.571036], var=[0.766432, 1.53756, 1.17978]),
    "hurdle_gamma": dict(
        eval=783.714, est=[0.298766, 0.348024, 2.16364, 0.276, 774.962],
        mu=[0.656338, 1.38272, 1.19058], var=[0.500369, 2.11542, 2.44205]),
    "hurdle_lognormal": dict(
        eval=761.289, est=[0.290816, 0.344675, 0.460094, 0.276, 751.84],
        mu=[0.636183, 1.3212, 1.18189], var=[0.536284, 2.24374, 2.69135]),
}


class TestGroupedRE:
    @pytest.mark.parametrize("fam", FAMS)
    def test_eval(self, zi_data, fam):
        y = sim_y(fam, _eta_true(fam, 0.7 * zi_data["b1"][zi_data["group"] - 1]),
                  zi_data["u1"], zi_data["u2"])
        gpm = GPModel(group_data=zi_data["group"], likelihood=_lik(fam))
        nll = gpm.neg_log_likelihood(cov_pars=[0.5], y=y,
                                     fixed_effects=np.zeros(zi_data["n"]),
                                     aux_pars=AUX0[fam])
        assert _relerr(nll, GRP[fam]["eval"]) < TOL_STRICT

    @pytest.mark.parametrize("fam", FAMS)
    def test_estimation_prediction(self, zi_data, fam):
        y = sim_y(fam, _eta_true(fam, 0.7 * zi_data["b1"][zi_data["group"] - 1]),
                  zi_data["u1"], zi_data["u2"])
        gp = fitGPModel(group_data=zi_data["group"], likelihood=_lik(fam),
                        y=y, X=zi_data["X"], params=dict(maxit=100))
        est = np.concatenate([gp.get_cov_pars(), np.atleast_1d(gp.get_coef()),
                              gp.get_aux_pars(),
                              [gp.get_current_neg_log_likelihood()]])
        golden = GRP[fam]["est"]
        # NLL at the optimum: tight. Parameters: medium for the identified
        # families; the ZI-NB variants are weakly identified (zero-inflation
        # vs. NB overdispersion ridge — reference test notes) so different
        # optimizer trajectories land elsewhere on the ridge with the same
        # NLL; assert only cov par + coef there, loosely.
        assert _relerr(est[-1], golden[-1]) < TOL_MED
        if fam in ("zero_inflated_poisson", "hurdle_gamma",
                   "hurdle_lognormal"):
            assert _relerr(est[:-1], golden[:-1]) < TOL_MED
        else:
            assert _relerr(est[0], golden[0]) < TOL_LOOSE * 5
            assert abs(est[1] - golden[1]) < 0.15
        pd = gp.predict(group_data_pred=np.array([1, 2, zi_data["m"] + 1]),
                        X_pred=np.ones((3, 1)), predict_var=True,
                        predict_response=True)
        ptol = TOL_MED * 5 if fam in ("zero_inflated_poisson", "hurdle_gamma",
                                      "hurdle_lognormal") else TOL_LOOSE * 3
        assert _relerr(pd["mu"], GRP[fam]["mu"]) < ptol
        assert _relerr(pd["var"], GRP[fam]["var"]) < ptol


class TestFisherLaplaceVariants:
    """test_GPModel_zero_inflated_hurdle.R:250-283."""

    FISH = {
        "zero_inflated_poisson": dict(
            eval=512.132, est=[0.270959, -0.381861, 0.289847, 504.594]),
        "zero_inflated_negative_binomial": dict(
            eval=516.2, est=[0.289737, -0.716779, 0.826161, 0.00125802,
                             509.484]),
    }

    @pytest.mark.parametrize("fam", list(FISH))
    def test_fisher_eval_and_variant_relations(self, zi_data, fam):
        y = sim_y(fam, _eta_true(fam, 0.7 * zi_data["b1"][zi_data["group"] - 1]),
                  zi_data["u1"], zi_data["u2"])
        n = zi_data["n"]
        F0 = np.zeros(n)
        gpf = GPModel(group_data=zi_data["group"],
                      likelihood=fam + "_fisher_laplace")
        nll_f = gpf.neg_log_likelihood(cov_pars=[0.5], y=y, fixed_effects=F0,
                                       aux_pars=AUX0[fam])
        assert _relerr(nll_f, self.FISH[fam]["eval"]) < TOL_STRICT
        default = GPModel(group_data=zi_data["group"], likelihood=fam)
        combined = GPModel(group_data=zi_data["group"],
                           likelihood=fam + "_fisher_laplace_combined")
        ordinary = GPModel(group_data=zi_data["group"],
                           likelihood=fam + "_laplace")
        nll_d = default.neg_log_likelihood(cov_pars=[0.5], y=y,
                                           fixed_effects=F0, aux_pars=AUX0[fam])
        nll_c = combined.neg_log_likelihood(cov_pars=[0.5], y=y,
                                            fixed_effects=F0, aux_pars=AUX0[fam])
        nll_o = ordinary.neg_log_likelihood(cov_pars=[0.5], y=y,
                                            fixed_effects=F0, aux_pars=AUX0[fam])
        assert _relerr(nll_d, nll_c) < TOL_STRICT
        assert _relerr(nll_d, nll_o) < TOL_MED
        assert _relerr(nll_f, nll_d) > 1e-6   # full Fisher is distinct


class TestVecchiaEval:
    """test_GPModel_zero_inflated_hurdle.R:306-320 (Cholesky evals)."""

    GOLDEN = {"zero_inflated_poisson": 699.975,
              "zero_inflated_negative_binomial": 698.102,
              "zero_inflated_negative_binomial_1": 695.676,
              "hurdle_gamma": 993.845,
              "hurdle_lognormal": 975.656}

    @pytest.mark.parametrize("fam", ["zero_inflated_poisson", "hurdle_gamma",
                                     "hurdle_lognormal"])
    def test_vecchia_eval(self, zi_data, fam):
        y = sim_y(fam, _eta_true(fam, zi_data["gp_re"]),
                  zi_data["u1"], zi_data["u2"])
        gpm = GPModel(gp_coords=zi_data["coords"], cov_function="exponential",
                      likelihood=_lik(fam), gp_approx="vecchia",
                      num_neighbors=15, vecchia_ordering="none")
        nll = gpm.neg_log_likelihood(cov_pars=[1.0, 0.2], y=y,
                                     fixed_effects=np.zeros(zi_data["n"]),
                                     aux_pars=AUX0[fam])
        assert _relerr(nll, self.GOLDEN[fam]) < TOL_STRICT


class TestHurdleGPDFamilies:
    """test_GPModel_zero_inflated_hurdle.R:95-118."""

    @staticmethod
    def _qgpd(u, sigma, xi):
        return sigma / xi * ((1.0 - u) ** (-xi) - 1.0)

    def test_hurdle_gpd(self, zi_data):
        sigma = np.exp(0.2 + 0.7 * zi_data["b1"][zi_data["group"] - 1])
        yg = np.where(zi_data["u1"] < 0.3, 0.0,
                      self._qgpd(zi_data["u2"], sigma, 0.2))
        gpm = GPModel(group_data=zi_data["group"], likelihood="hurdle_gpd")
        nll = gpm.neg_log_likelihood(cov_pars=[0.5], y=yg,
                                     fixed_effects=np.zeros(zi_data["n"]),
                                     aux_pars=[0.2, 0.3])
        assert _relerr(nll, 769.366) < TOL_STRICT
        gp = fitGPModel(group_data=zi_data["group"], likelihood="hurdle_gpd",
                        y=yg, X=zi_data["X"], params=dict(maxit=100))
        est = np.concatenate([gp.get_cov_pars(), np.atleast_1d(gp.get_coef()),
                              gp.get_aux_pars(),
                              [gp.get_current_neg_log_likelihood()]])
        assert _relerr(est, [0.313569, 0.0602354, 0.181543, 0.276, 767.427]) \
            < TOL_MED * 5
        pd = gp.predict(group_data_pred=np.array([1, 2, zi_data["m"] + 1]),
                        X_pred=np.ones((3, 1)), predict_var=True,
                        predict_response=True)
        assert _relerr(pd["mu"], [0.713328, 1.2867, 1.09925]) < TOL_MED * 5
        assert _relerr(pd["var"], [1.57714, 4.85236, 4.66652]) < TOL_MED * 5

    def test_hurdle_egpd_power(self, zi_data):
        sigma = np.exp(0.2 + 0.7 * zi_data["b1"][zi_data["group"] - 1])
        u = zi_data["u2"] ** (1.0 / 1.5)
        ye = np.where(zi_data["u1"] < 0.3, 0.0, self._qgpd(u, sigma, 0.2))
        gpm = GPModel(group_data=zi_data["group"],
                      likelihood="hurdle_egpd_power")
        nll = gpm.neg_log_likelihood(cov_pars=[0.5], y=ye,
                                     fixed_effects=np.zeros(zi_data["n"]),
                                     aux_pars=[0.2, 1.5, 0.3])
        assert _relerr(nll, 867.777) < TOL_STRICT

    def test_zero_inflated_gpd_alias(self, zi_data):
        sigma = np.exp(0.2 + 0.7 * zi_data["b1"][zi_data["group"] - 1])
        yg = np.where(zi_data["u1"] < 0.3, 0.0,
                      self._qgpd(zi_data["u2"], sigma, 0.2))
        gp = fitGPModel(group_data=zi_data["group"],
                        likelihood="zero_inflated_gpd", y=yg, X=zi_data["X"],
                        params=dict(maxit=5))
        assert gp._likelihood_obj.name == "hurdle_gpd"
