"""Golden-value parity for the gaussian_heteroscedastic_fixed_and_random
likelihood (likelihoods.h:474-485): BOTH the mean and the log-error-variance
predictors carry a GP (num_sets_re = 2), each with its own covariance
parameters, and BOTH carry fixed effects (num_sets_fe = 2).

Expected numbers from test_GPModel_non_Gaussian_data.R:3976-4132 (the
gp_approx = "vecchia", num_neighbors = n-1, vecchia_ordering = "none"
cholesky branch, which equals the exact dense model this engine runs).
"""

import numpy as np
import pytest
from scipy.spatial.distance import pdist, squareform

from gpboost_tpu import GPModel
from gpboost_tpu.utils.datasim import sim_rand_unif, qnorm, r_matrix

TOL_MED = 1e-3
TOL_LOOSE = 1e-2
TOL_ITERATIVE = 1e-1


@pytest.fixture(scope="module")
def het2_data():
    n, d = 100, 2
    coords = r_matrix(sim_rand_unif(n * d, init_c=0.1), ncol=d)
    D = squareform(pdist(coords))
    Sigma = np.exp(-D / 0.1) + np.eye(n) * 1e-20
    L = np.linalg.cholesky(Sigma)
    b_1 = qnorm(sim_rand_unif(n, init_c=0.8))
    # the R test sets L2 <- t(chol(Sigma)) (the FIRST Sigma; its Sigma2 with
    # range 0.2 is constructed but unused) — reproduce that exactly
    b_2 = qnorm(sim_rand_unif(n, init_c=0.834))
    y = L @ b_1 + qnorm(sim_rand_unif(n, init_c=0.1234)) * np.exp(0.5 * (L @ b_2))
    i = np.arange(1, n + 1)
    X = np.column_stack([np.ones(n), np.sin((i - n / 2) ** 2 * 2 * np.pi / n)])
    return dict(n=n, coords=coords, y=y, X=X,
                mean_dist=float(np.mean(pdist(coords))))


def test_nll_evaluation(het2_data):
    gp = GPModel(gp_coords=het2_data["coords"], cov_function="exponential",
                 likelihood="gaussian_heteroscedastic_fixed_and_random",
                 gp_approx="none")
    nll = gp.neg_log_likelihood(cov_pars=np.array([1, 0.2, 0.1, 0.2]),
                                y=het2_data["y"])
    assert abs(nll - 199.6831947) < TOL_MED


def test_estimation_and_prediction(het2_data):
    md = het2_data["mean_dist"]
    gp = GPModel(gp_coords=het2_data["coords"], cov_function="exponential",
                 likelihood="gaussian_heteroscedastic_fixed_and_random",
                 gp_approx="none")
    gp.fit(y=het2_data["y"], X=het2_data["X"],
           params=dict(optimizer_cov="lbfgs", optimizer_coef="lbfgs",
                       maxit=1000, init_coef_aux_pars_from_iid_model=False,
                       init_cov_pars=[1, md / 3, 0.1, md / 3]))
    cov_pars = np.asarray(gp.get_cov_pars(std_err=False))
    coefs = np.asarray(gp.get_coef(std_err=False))
    exp_cov = [0.29257505689, 0.16019690150, 0.20398810623, 0.02123292904]
    exp_coef = [0.2573774906, -0.1120390282, 0.6360477105, 0.2961457581]
    assert np.sum(np.abs(cov_pars - exp_cov)) < TOL_ITERATIVE
    assert np.sum(np.abs(coefs - exp_coef)) < TOL_ITERATIVE
    # nll_est = 191.2306375 with the reference's L-BFGS stopping (15 its);
    # our on-device L-BFGS converges slightly deeper (the NLL surface is
    # flat here) — accept iterative-level agreement
    assert abs(gp.get_current_neg_log_likelihood() - 191.2306375) < TOL_ITERATIVE

    # prediction at explicit cov_pars + init_coef override
    # (set_optim_params(init_coef) overwrites coef_, re_model.cpp:320-324)
    X_test = np.column_stack([np.ones(3), [-0.5, 0.2, 1.0]])
    coord_test = np.column_stack([[0.1, 0.11, 0.7], [0.9, 0.91, 0.55]])
    gp.set_optim_params(params=dict(init_coef=[0.5, 0.1, 0.5, 0.1],
                                    init_coef_aux_pars_from_iid_model=False))
    exp_mu = [0.06126291, 0.07337373, 0.30807230]
    pred = gp.predict(y=het2_data["y"], gp_coords_pred=coord_test,
                      predict_var=True, predict_response=False,
                      cov_pars=np.array([1, 0.2, 0.1, 0.2]), X_pred=X_test)
    assert np.sum(np.abs(pred["mu"] - exp_mu)) < TOL_LOOSE
    assert np.sum(np.abs(pred["var"] - [0.5994207, 0.6014515, 0.3936357])) \
        < TOL_LOOSE
    pred = gp.predict(y=het2_data["y"], gp_coords_pred=coord_test,
                      predict_var=True, predict_response=True,
                      cov_pars=np.array([1, 0.2, 0.1, 0.2]), X_pred=X_test)
    assert np.sum(np.abs(pred["mu"] - exp_mu)) < TOL_LOOSE
    assert np.sum(np.abs(pred["var"] - [2.147623, 2.268682, 2.010216])) \
        < TOL_ITERATIVE
