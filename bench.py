"""Benchmark driver: prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}
to stdout (the driver contract) and writes the full benchmark matrix to
BENCH_MATRIX.json. Progress goes to stderr.

Headline = the first north-star workload (BASELINE.md): Vecchia-approximated
GP hyperparameter fit on n=100k 2-D spatial points (num_neighbors=20,
exponential kernel, on-device L-BFGS on the profiled marginal likelihood,
float32). Wall-clock excludes jit compile (a warm-up fit runs first).

The matrix adds the second north-star (1000-round GPBoost spatial train =
per-round tree + warm-started GP refit), boosting-only throughput at
n=200k/p=50 for 31 and 255 leaves, and an iterative Vecchia-Laplace binary
fit at n=20k.

vs_baseline ratios divide the REFERENCE library's measured wall-clock by
ours. The reference numbers come from BASELINE_MEASURED.json, produced by the
checked-in `bench_reference.py` (compiles /root/reference with g++ -O3 and
runs the IDENTICAL data generators single-threaded on the host). The file
records the reference's actual L-BFGS iteration counts — where they differ
from ours the per-iteration advantage is understated, and the per-workload
"note" says so. A perfectly-scaling 64-core reference run would be
(single-thread seconds / 64): beating that bound means beating the
BASELINE.md north star "faster than 64-core CPU GPBoost"; the matrix reports
that bound per workload as `ref_64core_bound_s`.
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

# BENCH_SMOKE=1 shrinks every workload ~100x to validate the script logic
# (e.g. on CPU); timings are then meaningless and vs_baseline is suppressed.
SMOKE = os.environ.get("BENCH_SMOKE", "") not in ("", "0")


def _scale(n):
    return max(200, n // 100) if SMOKE else n


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# ---- identical data generators to bench_reference.py (same seeds) ----
def sim_vecchia(n=None, seed=0):
    n = _scale(100_000) if n is None else n
    rng = np.random.RandomState(seed)
    coords = rng.rand(n, 2)
    y = np.sin(6 * coords[:, 0]) * np.cos(4 * coords[:, 1]) \
        + 0.5 * rng.randn(n)
    return coords, y


def sim_gpboost(n=None, p=5, seed=1):
    n = _scale(10_000) if n is None else n
    rng = np.random.RandomState(seed)
    coords = rng.rand(n, 2)
    X = rng.rand(n, p)
    f = np.sin(3 * X[:, 0]) + X[:, 1] ** 2
    b = np.sin(6 * coords[:, 0]) * np.cos(4 * coords[:, 1])
    y = f + b + 0.3 * rng.randn(n)
    return coords, X, y


def sim_boost(n=None, p=50, seed=2):
    n = _scale(200_000) if n is None else n
    rng = np.random.RandomState(seed)
    X = rng.rand(n, p)
    y = X[:, 0] * 2 + np.sin(5 * X[:, 1]) + X[:, 2] * X[:, 3] \
        + 0.5 * rng.randn(n)
    return X, y


def sim_lagab(n=None, p=5, seed=4):
    n = _scale(50_000) if n is None else n
    rng = np.random.RandomState(seed)
    coords = rng.rand(n, 2)
    X = rng.rand(n, p)
    lat = (np.sin(3 * X[:, 0]) + X[:, 1] ** 2 - 1.0
           + 0.8 * np.sin(6 * coords[:, 0]) * np.cos(4 * coords[:, 1]))
    from scipy.stats import norm
    y = (rng.rand(n) < norm.cdf(lat)).astype(float)
    return coords, X, y


def sim_glmm(n=None, q=None, seed=5):
    n = _scale(100_000) if n is None else n
    q = max(10, _scale(1000)) if q is None else q
    rng = np.random.RandomState(seed)
    g = rng.randint(0, q, n)
    b = 0.8 * rng.normal(size=q)
    y = (rng.rand(n) < 1.0 / (1.0 + np.exp(-b[g]))).astype(float)
    return g, y


def sim_vl(n=None, seed=3):
    n = _scale(20_000) if n is None else n
    rng = np.random.RandomState(seed)
    coords = rng.rand(n, 2)
    f = np.sin(6 * coords[:, 0]) * np.cos(4 * coords[:, 1])
    from scipy.stats import norm
    y = (rng.rand(n) < norm.cdf(f)).astype(float)
    return coords, y


def load_reference():
    path = os.path.join(HERE, "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"workloads": {}}


def main():
    # persistent compilation cache: the fused multi-round scans are
    # compile-heavy; repeated bench runs (driver rounds, warm-ups after
    # restarts) reuse the executables
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import gpboost_tpu as gpb

    ref = load_reference()
    matrix = {"device": None, "workloads": {}}
    try:
        import jax
        matrix["device"] = str(jax.devices()[0])
    except Exception:
        pass

    def record(key, seconds, flops=None, **extra):
        w = {"seconds": round(seconds, 3), **extra}
        r = None if SMOKE else ref["workloads"].get(key)
        if r:
            w["reference_1core_s"] = r["seconds"]
            w["ref_64core_bound_s"] = round(r["seconds"] / 64.0, 3)
            w["vs_baseline_1core"] = round(r["seconds"] / seconds, 2)
            w["beats_64core_bound"] = bool(seconds < r["seconds"] / 64.0)
            if "num_it" in r:
                w["reference_num_it"] = r["num_it"]
        if flops is not None:
            # v5e peak ~197 TFLOP/s bf16, ~98 TFLOP/s fp32 MXU
            w["est_flops"] = float(flops)
            w["est_tflops_per_s"] = round(flops / seconds / 1e12, 4)
            w["est_mxu_util_fp32"] = round(flops / seconds / 98e12, 5)
        matrix["workloads"][key] = w
        log(f"[bench] {key}: {w}")
        return w

    # ---- 1. headline: Vecchia GP fit n=100k -------------------------------
    log("workload 1/6: vecchia fit n=100k")
    coords, y = sim_vecchia()
    MAXIT = 30
    model = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                        gp_approx="vecchia", num_neighbors=20,
                        vecchia_ordering="random", dtype="float32")
    model.fit(y=y, params={"optimizer_cov": "lbfgs", "maxit": 1,
                           "init_cov_pars": [0.5, 1.0, 0.1]})   # compile
    t0 = time.time()
    model.fit(y=y, params={"optimizer_cov": "lbfgs", "maxit": MAXIT,
                           "init_cov_pars": [0.5, 1.0, 0.1]})
    fit_time = time.time() - t0
    # per L-BFGS iteration: value+grad of the profiled NLL = 2x the batched
    # (n, m, m) Cholesky pipeline: ~ n*(m^3/3 + 2 m^2 + m*d) * 2 (fwd+bwd)
    n, m = _scale(100_000), 20
    flops_it = 2 * 2 * n * (m ** 3 / 3 + 4 * m * m)
    head = record("vecchia_gp_fit_n100k_m20", fit_time,
                  flops=flops_it * MAXIT, maxit=MAXIT, dtype="float32",
                  note="our L-BFGS runs all 30 iterations; the reference "
                       "converged earlier (see reference_num_it) so the "
                       "ratio understates the per-iteration advantage. "
                       "Gather/latency-bound: m=20 Cholesky blocks barely "
                       "touch the MXU (see est_mxu_util_fp32)")

    # ---- 2. north-star #2: 1000-round GPBoost spatial train ---------------
    log("workload 2/6: gpboost 1000 rounds n=10k")
    coords, X, yg = sim_gpboost()
    ROUNDS = 20 if SMOKE else 1000

    def make_model():
        gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                         gp_approx="vecchia", num_neighbors=20,
                         dtype="float32")
        ds = gpb.Dataset(X, label=yg)
        return gp, ds

    # warm-up with the SAME GPModel instance and the fused-scan block size
    # (25): the compiled round-block caches on the engine, so the timed run
    # is compile-free. Booster/GP fit state resets per train() call — the
    # timed run still includes the initial full covariance fit.
    gp2, ds_w = make_model()
    gpb.train({"objective": "regression", "learning_rate": 0.1,
               "num_leaves": 31, "verbose": 0}, ds_w,
              num_boost_round=25 if not SMOKE else ROUNDS,
              gp_model=gp2)                                     # compile
    ds2 = gpb.Dataset(X, label=yg)
    t0 = time.time()
    gpb.train({"objective": "regression", "learning_rate": 0.1,
               "num_leaves": 31, "verbose": 0}, ds2,
              num_boost_round=ROUNDS, gp_model=gp2)
    record("gpboost_1000round_spatial_n10k", time.time() - t0,
           rounds=ROUNDS, n=10_000, num_leaves=31,
           note="fused scan: one device dispatch per 25-round block "
                "(gradient + 31-leaf tree + warm-started GD cov refit); "
                "includes the initial full covariance fit")

    # ---- 3. boosting-only throughput: n=200k p=50 -------------------------
    Xb, yb = sim_boost()
    for leaves in (31, 255):
        log(f"workload 3/6: boosting n=200k p=50 leaves={leaves}")
        dsb = gpb.Dataset(Xb, label=yb)
        gpb.train({"objective": "regression", "num_leaves": leaves,
                   "learning_rate": 0.1, "verbose": 0}, dsb,
                  num_boost_round=20)   # compile the 20-round fused scan
        dsb2 = gpb.Dataset(Xb, label=yb)
        t0 = time.time()
        gpb.train({"objective": "regression", "num_leaves": leaves,
                   "learning_rate": 0.1, "verbose": 0}, dsb2,
                  num_boost_round=20)
        el = time.time() - t0
        record(f"boosting_n200k_p50_leaves{leaves}_20rounds", el,
               rounds=20, rounds_per_s=round(20 / el, 2),
               note="fused scan (all 20 rounds in one dispatch) over "
                    "leaf-partitioned histogram growth: cost scales with "
                    "sum-of-smaller-child sizes, not leaves*n")

    # ---- 4. LaGaBoost: binary Vecchia GPBoost, n=50k, 10 rounds -----------
    log("workload 4/6: lagaboost binary vecchia n=50k")
    coords, Xl, yl = sim_lagab()
    gpl = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                      gp_approx="vecchia", num_neighbors=20,
                      likelihood="bernoulli_probit",
                      matrix_inversion_method="iterative")
    gpb.train({"objective": "binary", "learning_rate": 0.1,
               "num_leaves": 31, "verbose": 0}, gpb.Dataset(Xl, label=yl),
              num_boost_round=10, gp_model=gpl)                 # compile
    # reset the GP fit state so the timed run repeats the full initial
    # covariance fit (the engine keeps the compiled fused-scan executable)
    gpl._fit_result = None
    gpl.model_has_been_fitted = False
    dsl = gpb.Dataset(Xl, label=yl)
    t0 = time.time()
    gpb.train({"objective": "binary", "learning_rate": 0.1,
               "num_leaves": 31, "verbose": 0}, dsl,
              num_boost_round=10, gp_model=gpl)
    record("lagaboost_binary_vecchia_n50k_10rounds", time.time() - t0,
           rounds=10, n=50_000,
           note="fused LaGaBoost scan: per round = Laplace dNLL/dF "
                "gradient + tree + warm-started on-device GD cov refit; "
                "includes the initial full covariance fit")

    # ---- 5. RE-scale grouped Laplace GLMM: bernoulli, n=100k, q=1k --------
    log("workload 5/6: grouped GLMM bernoulli n=100k q=1k")
    gg, yg2 = sim_glmm()
    mg = gpb.GPModel(group_data=gg, likelihood="bernoulli_logit")
    mg.fit(y=yg2, params={"maxit": 1})                          # compile
    mg2 = gpb.GPModel(group_data=gg, likelihood="bernoulli_logit")
    t0 = time.time()
    mg2.fit(y=yg2, params={"maxit": 50})
    record("grouped_glmm_bernoulli_n100k_q1k_fit", time.time() - t0,
           maxit=50,
           note="RE-scale (q-dim) grouped Laplace engine — BASELINE "
                "config #5 class; O(n) memory")

    # ---- 6. iterative Vecchia-Laplace binary fit n=20k --------------------
    log("workload 6/6: vecchia-laplace binary n=20k")
    coords, yv = sim_vl()
    mvl = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                      gp_approx="vecchia", num_neighbors=20,
                      likelihood="bernoulli_probit",
                      matrix_inversion_method="iterative")
    mvl.fit(y=yv, params={"maxit": 1, "init_cov_pars": [1.0, 0.1]})  # compile
    mvl2 = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                       gp_approx="vecchia", num_neighbors=20,
                       likelihood="bernoulli_probit",
                       matrix_inversion_method="iterative")
    t0 = time.time()
    mvl2.fit(y=yv, params={"maxit": 20, "init_cov_pars": [1.0, 0.1]})
    record("vecchia_laplace_fit_n20k_binary", time.time() - t0, maxit=20,
           note="matrix-free O(n*m) mode finding + CG/SLQ log-dets "
                "(vadu preconditioner)")

    if not SMOKE:      # smoke timings are meaningless — don't persist them
        with open(os.path.join(HERE, "BENCH_MATRIX.json"), "w") as f:
            json.dump(matrix, f, indent=1)
        log("wrote BENCH_MATRIX.json")

    print(json.dumps({
        "metric": "vecchia_gp_fit_n100000_m20_wallclock",
        "value": round(fit_time, 3),
        "unit": "seconds",
        "vs_baseline": head.get("vs_baseline_1core", None),
    }))


if __name__ == "__main__":
    main()
