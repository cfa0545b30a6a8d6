"""Measure the REFERENCE GPBoost library on the bench-matrix workloads.

Builds the reference (fabsig/GPBoost at /root/reference) with g++ -O3 if the
compiled artifacts are missing, runs each workload single-threaded on the
host CPU, and records the wall-clocks to BASELINE_MEASURED.json. bench.py
reads that file to compute reproducible `vs_baseline` ratios (VERDICT round 2
weak #8: the comparison must be produced by a checked-in script, not a
docstring constant).

The build (one-time, ~10 min):
    cmake -S /root/reference -B /tmp/refbuild -DCMAKE_BUILD_TYPE=Release
    make -C /tmp/refbuild -j _gpboost
    cp -r /root/reference/python-package/gpboost /tmp/refpkg/gpboost
    cp /tmp/refbuild/lib_gpboost.so /tmp/refpkg/gpboost/compile/

Usage: python bench_reference.py [--rounds-gpboost 1000] [--skip-slow]
"""

import argparse
import json
import os
import subprocess
import sys
import time
import types

REFBUILD = "/tmp/refbuild"
REFPKG = "/tmp/refpkg"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "BASELINE_MEASURED.json")


def ensure_reference_built():
    lib = os.path.join(REFPKG, "gpboost", "compile", "lib_gpboost.so")
    if os.path.exists(lib):
        return
    os.makedirs(REFBUILD, exist_ok=True)
    subprocess.check_call(["cmake", "-S", "/root/reference", "-B", REFBUILD,
                           "-DCMAKE_BUILD_TYPE=Release"])
    subprocess.check_call(["make", "-C", REFBUILD, "-j2", "_gpboost"])
    os.makedirs(REFPKG, exist_ok=True)
    subprocess.check_call(["cp", "-r", "/root/reference/python-package/gpboost",
                           os.path.join(REFPKG, "gpboost")])
    os.makedirs(os.path.join(REFPKG, "gpboost", "compile"), exist_ok=True)
    subprocess.check_call(["cp", os.path.join(REFBUILD, "lib_gpboost.so"),
                           os.path.join(REFPKG, "gpboost", "compile")])


def import_reference():
    sys.path.insert(0, REFPKG)
    # optional deps the reference imports unconditionally but never uses here
    for name in ("optuna", "optuna.samplers"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["optuna"].samplers = sys.modules["optuna.samplers"]
    import gpboost
    return gpboost


# ---- identical data generators to bench.py (same seeds, same shapes) ----
def sim_vecchia(n=100_000, seed=0):
    import numpy as np
    rng = np.random.RandomState(seed)
    coords = rng.rand(n, 2)
    y = np.sin(6 * coords[:, 0]) * np.cos(4 * coords[:, 1]) \
        + 0.5 * rng.randn(n)
    return coords, y


def sim_gpboost(n=10_000, p=5, seed=1):
    import numpy as np
    rng = np.random.RandomState(seed)
    coords = rng.rand(n, 2)
    X = rng.rand(n, p)
    f = np.sin(3 * X[:, 0]) + X[:, 1] ** 2
    b = np.sin(6 * coords[:, 0]) * np.cos(4 * coords[:, 1])
    y = f + b + 0.3 * rng.randn(n)
    return coords, X, y


def sim_boost(n=200_000, p=50, seed=2):
    import numpy as np
    rng = np.random.RandomState(seed)
    X = rng.rand(n, p)
    y = X[:, 0] * 2 + np.sin(5 * X[:, 1]) + X[:, 2] * X[:, 3] \
        + 0.5 * rng.randn(n)
    return X, y


def sim_lagab(n=50_000, p=5, seed=4):
    import numpy as np
    rng = np.random.RandomState(seed)
    coords = rng.rand(n, 2)
    X = rng.rand(n, p)
    lat = (np.sin(3 * X[:, 0]) + X[:, 1] ** 2 - 1.0
           + 0.8 * np.sin(6 * coords[:, 0]) * np.cos(4 * coords[:, 1]))
    from scipy.stats import norm
    y = (rng.rand(n) < norm.cdf(lat)).astype(float)
    return coords, X, y


def sim_glmm(n=100_000, q=1000, seed=5):
    import numpy as np
    rng = np.random.RandomState(seed)
    g = rng.randint(0, q, n)
    b = 0.8 * rng.normal(size=q)
    y = (rng.rand(n) < 1.0 / (1.0 + np.exp(-b[g]))).astype(float)
    return g, y


def sim_vl(n=20_000, seed=3):
    import numpy as np
    rng = np.random.RandomState(seed)
    coords = rng.rand(n, 2)
    f = np.sin(6 * coords[:, 0]) * np.cos(4 * coords[:, 1])
    from scipy.stats import norm
    y = (rng.rand(n) < norm.cdf(f)).astype(float)
    return coords, y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds-gpboost", type=int, default=1000)
    ap.add_argument("--skip-slow", action="store_true",
                    help="skip the n=100k Vecchia fit (~95 s single-thread)")
    args = ap.parse_args()
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    ensure_reference_built()
    gpb = import_reference()
    import numpy as np

    results = {"library": "reference GPBoost (g++ -O3, /root/reference)",
               "version": gpb.__version__,
               "threads": os.environ["OMP_NUM_THREADS"],
               "measured_unix_time": time.time(),
               "workloads": {}}

    def record(key, seconds, **extra):
        results["workloads"][key] = {"seconds": round(seconds, 3), **extra}
        print(f"[reference] {key}: {seconds:.2f}s {extra}", flush=True)

    # 1. Vecchia GP fit, n=100k, m=20, exponential, L-BFGS
    if not args.skip_slow:
        coords, y = sim_vecchia()
        m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                        gp_approx="vecchia", num_neighbors=20,
                        vecchia_ordering="random")
        t0 = time.time()
        m.fit(y=y, params={"optimizer_cov": "lbfgs", "maxit": 30,
                           "init_cov_pars": [0.5, 1.0, 0.1]})
        record("vecchia_gp_fit_n100k_m20", time.time() - t0,
               num_it=int(m._get_num_optim_iter()), maxit=30,
               note="reference L-BFGS may converge in fewer iterations than "
                    "maxit; num_it records the actual count")

    # 2. GPBoost algorithm: 1000 boosting rounds + per-round GP refit
    coords, X, y = sim_gpboost()
    gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                     gp_approx="vecchia", num_neighbors=20)
    ds = gpb.Dataset(X, label=y)
    # warm-up 5 rounds (excluded), then the timed run on a fresh model
    bst = gpb.train({"objective": "regression_l2", "learning_rate": 0.1,
                     "num_leaves": 31, "verbose": -1}, ds,
                    num_boost_round=5, gp_model=gp)
    gp2 = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                      gp_approx="vecchia", num_neighbors=20)
    ds2 = gpb.Dataset(X, label=y)
    t0 = time.time()
    bst = gpb.train({"objective": "regression_l2", "learning_rate": 0.1,
                     "num_leaves": 31, "verbose": -1}, ds2,
                    num_boost_round=args.rounds_gpboost, gp_model=gp2)
    record("gpboost_1000round_spatial_n10k", time.time() - t0,
           rounds=args.rounds_gpboost, n=10_000, num_leaves=31)

    # 3. boosting-only rounds: n=200k, p=50, 31 and 255 leaves
    Xb, yb = sim_boost()
    for leaves in (31, 255):
        dsb = gpb.Dataset(Xb, label=yb)
        gpb.train({"objective": "regression_l2", "num_leaves": leaves,
                   "learning_rate": 0.1, "verbose": -1}, dsb,
                  num_boost_round=3)      # warm-up
        dsb2 = gpb.Dataset(Xb, label=yb)
        t0 = time.time()
        gpb.train({"objective": "regression_l2", "num_leaves": leaves,
                   "learning_rate": 0.1, "verbose": -1}, dsb2,
                  num_boost_round=20)
        record(f"boosting_n200k_p50_leaves{leaves}_20rounds",
               time.time() - t0, rounds=20, n=200_000, p=50)

    # 4. LaGaBoost: binary Vecchia GPBoost, n=50k, 10 rounds
    if not args.skip_slow:
        coords, Xl, yl = sim_lagab()
        gpl = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                          gp_approx="vecchia", num_neighbors=20,
                          likelihood="bernoulli_probit",
                          matrix_inversion_method="iterative")
        dsl = gpb.Dataset(Xl, label=yl)
        t0 = time.time()
        gpb.train({"objective": "binary", "learning_rate": 0.1,
                   "num_leaves": 31, "verbose": -1}, dsl,
                  num_boost_round=10, gp_model=gpl)
        record("lagaboost_binary_vecchia_n50k_10rounds", time.time() - t0,
               rounds=10, n=50_000)

    # 4b. LaGaBoost at n=20k (the size our TPU bench runs: the remote
    # compiler does not survive the n=50k Laplace executables)
    coords, Xl, yl = sim_lagab(n=20_000)
    gpl = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                      gp_approx="vecchia", num_neighbors=20,
                      likelihood="bernoulli_probit",
                      matrix_inversion_method="iterative")
    dsl = gpb.Dataset(Xl, label=yl)
    t0 = time.time()
    gpb.train({"objective": "binary", "learning_rate": 0.1,
               "num_leaves": 31, "verbose": -1}, dsl,
              num_boost_round=10, gp_model=gpl)
    record("lagaboost_binary_vecchia_n20k_10rounds", time.time() - t0,
           rounds=10, n=20_000)

    # 5. RE-scale grouped Laplace GLMM: bernoulli, n=100k, q=1k
    gg, yg2 = sim_glmm()
    mg = gpb.GPModel(group_data=gg, likelihood="bernoulli_logit")
    t0 = time.time()
    mg.fit(y=yg2, params={"maxit": 50})
    record("grouped_glmm_bernoulli_n100k_q1k_fit", time.time() - t0,
           num_it=int(mg._get_num_optim_iter()), maxit=50)

    # 6. iterative Vecchia-Laplace fit: bernoulli_probit, n=20k, m=20
    coords, y = sim_vl()
    m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=20,
                    likelihood="bernoulli_probit",
                    matrix_inversion_method="iterative")
    t0 = time.time()
    m.fit(y=y, params={"maxit": 20, "init_cov_pars": [1.0, 0.1]})
    record("vecchia_laplace_fit_n20k_binary", time.time() - t0,
           num_it=int(m._get_num_optim_iter()), maxit=20)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
