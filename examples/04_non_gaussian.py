"""Non-Gaussian likelihoods: latent Gaussian models fit with a Laplace
approximation (binary classification, counts, and LaGaBoost with trees).

  y ~ p(y | g(F(X) + Z b)),  b ~ N(0, Sigma(theta))
"""
import numpy as np
import gpboost_tpu as gpb

rng = np.random.RandomState(10)

# --------------------------------------------- binary GLMM (logit link)
n, m = 1500, 60
group = rng.randint(0, m, n)
b = 1.0 * rng.randn(m)
X = np.column_stack([np.ones(n), rng.rand(n)])
lp = X @ np.array([0.2, 1.5]) + b[group]
y = (rng.rand(n) < 1 / (1 + np.exp(-lp))).astype(float)

model = gpb.fitGPModel(group_data=group, likelihood="bernoulli_logit",
                       y=y, X=X, params={"std_dev": True})
print("bernoulli_logit  group var:", np.round(model.get_cov_pars(), 3),
      " coefs:", np.round(model.get_coef(), 3))
pred = model.predict(group_data_pred=group[:5], X_pred=X[:5], y=y,
                     predict_response=True)
print("first 5 predicted probabilities:", np.round(pred["mu"], 3))

# --------------------------------------------------------- Poisson counts
mu_count = np.exp(0.3 + 0.5 * b[group])
yc = rng.poisson(mu_count).astype(float)
pois = gpb.fitGPModel(group_data=group, likelihood="poisson", y=yc)
print("\npoisson  group var:", np.round(pois.get_cov_pars(), 3))

# ----------------------------------------- Student-t: robust regression
yt = X @ np.array([0.2, 1.5]) + b[group] + 0.3 * rng.standard_t(4, n)
tmod = gpb.fitGPModel(group_data=group, likelihood="t", y=yt, X=X)
print("t  cov pars:", np.round(tmod.get_cov_pars(), 3),
      " aux (scale, df):", np.round(tmod.get_aux_pars(), 3))

# ----------------------------- LaGaBoost: trees + REs, binary response
Xb = rng.rand(n, 5)
F_true = 2.0 * np.sin(7 * Xb[:, 0]) + Xb[:, 1]
yb = (rng.rand(n) < 1 / (1 + np.exp(-(F_true - 1 + b[group])))).astype(float)
gp_model = gpb.GPModel(group_data=group, likelihood="bernoulli_logit")
bst = gpb.train(params={"learning_rate": 0.1, "num_leaves": 15},
                train_set=gpb.Dataset(Xb, label=yb),
                gp_model=gp_model, num_boost_round=30)
phat = bst.predict(Xb, group_data_pred=group)["response_mean"]
acc = np.mean((phat > 0.5) == (yb > 0.5))
print("\nLaGaBoost train accuracy: %.3f (base rate %.3f)"
      % (acc, max(yb.mean(), 1 - yb.mean())))
