"""Linear mixed effects models: grouped random effects + fixed effects.

Model:  y = X beta + Z b + e,   b ~ N(0, sigma_b^2 I),  e ~ N(0, sigma^2 I)

Shows: fitting, standard errors, summary, prediction for seen AND unseen
groups, nested/crossed effects, and random coefficients (random slopes).
"""
import numpy as np
import gpboost_tpu as gpb

rng = np.random.RandomState(42)

# ----------------------------------------------------------------- simulate
n, m = 2000, 100                      # n observations, m groups
group = rng.randint(0, m, n)
b = 0.8 * rng.randn(m)                # random effects, var 0.64
X = np.column_stack([np.ones(n), rng.rand(n)])
beta = np.array([1.0, 2.0])
y = X @ beta + b[group] + 0.5 * rng.randn(n)   # error var 0.25

# ---------------------------------------------------------------- fit + SEs
model = gpb.GPModel(group_data=group, likelihood="gaussian")
model.fit(y=y, X=X, params={"std_dev": True})
model.summary()
print("cov pars (error var, group var):", model.get_cov_pars())
print("coefficients:", model.get_coef())

# -------------------------------------------------------------- prediction
# groups 0..4 are known (posterior mean of b shrinks to the data); group
# 10**6 is new (prediction = fixed effects only, variance includes sigma_b^2)
gp_new = np.array([0, 1, 2, 3, 4, 10 ** 6])
Xp = np.column_stack([np.ones(6), np.full(6, 0.5)])
pred = model.predict(group_data_pred=gp_new, X_pred=Xp, y=y,
                     predict_var=True, predict_response=True)
print("\npredictions  mu:", np.round(pred["mu"], 3))
print("predictions var:", np.round(pred["var"], 3),
      "(last one is a new group -> largest variance)")

# ------------------------------------------------- two crossed random effects
group2 = rng.randint(0, 20, n)
y2 = y + 0.5 * rng.randn(20)[group2]
crossed = gpb.fitGPModel(group_data=np.column_stack([group, group2]), y=y2, X=X)
print("\ncrossed REs cov pars:", crossed.get_cov_pars())

# ------------------------------------------------------- random coefficients
# random slope in x for each group: y = .. + b0_g + x * b1_g + e
x_slope = rng.rand(n)
y3 = X @ beta + b[group] + x_slope * (0.6 * rng.randn(m))[group] \
    + 0.5 * rng.randn(n)
rc = gpb.fitGPModel(group_data=group, group_rand_coef_data=x_slope,
                    ind_effect_group_rand_coef=[1], y=y3, X=X)
print("random-coefficient cov pars:", rc.get_cov_pars())
