"""Benchmark driver: prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}
to stdout (the driver contract) and writes the full benchmark matrix to
BENCH_MATRIX.json. Progress goes to stderr.

Headline = the first north-star workload (BASELINE.md): Vecchia-approximated
GP hyperparameter fit on n=100k 2-D spatial points (num_neighbors=20,
exponential kernel, on-device L-BFGS on the profiled marginal likelihood,
float32). Wall-clock excludes jit compile (a warm-up fit runs first).

The matrix adds the second north-star (1000-round GPBoost spatial train =
per-round tree + warm-started GP refit), boosting-only throughput at
n=200k/p=50 for 31 and 255 leaves, a LaGaBoost binary Vecchia train, a
RE-scale grouped GLMM fit, and an iterative Vecchia-Laplace binary fit.

TIME BUDGET: the driver runs this script under an external timeout; a
timed-out bench emits NOTHING and scores worse than a partial one. So the
script is budget-aware: after the headline it runs the remaining workloads
cheapest-first, skipping any whose estimated cost exceeds the remaining
budget (BENCH_BUDGET_S, default 360 s; BENCH_FULL=1 removes the cap for
manual full-matrix runs — the committed BENCH_MATRIX.json comes from one).
A SIGALRM backstop guarantees the headline JSON line is printed even if the
device tunnel stalls mid-workload, and the matrix file is rewritten after
every workload so partial progress persists.

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
import signal
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
START = time.time()

# BENCH_SMOKE=1 shrinks every workload ~100x to validate the script logic
# (e.g. on CPU); timings are then meaningless and vs_baseline is suppressed.
SMOKE = os.environ.get("BENCH_SMOKE", "") not in ("", "0")
FULL = os.environ.get("BENCH_FULL", "") not in ("", "0")
BUDGET = float(os.environ.get("BENCH_BUDGET_S", "360"))


def _scale(n):
    return max(200, n // 100) if SMOKE else n


def log(msg):
    print(f"[{time.time() - START:7.1f}s] {msg}", file=sys.stderr, flush=True)


def remaining():
    return float("inf") if (FULL or SMOKE) else BUDGET - (time.time() - START)


# the headline record, filled by workload 1. It is printed to stdout ONCE —
# immediately after workload 1 finishes (so a later external kill cannot lose
# it); the SIGALRM backstop prints it only if workload 1 itself stalled.
_HEADLINE = {"metric": "vecchia_gp_fit_n100000_m20_wallclock",
             "value": None, "unit": "seconds", "vs_baseline": None}
_HEADLINE_PRINTED = False


def _print_headline_once():
    global _HEADLINE_PRINTED
    if not _HEADLINE_PRINTED:
        print(json.dumps(_HEADLINE), flush=True)
        _HEADLINE_PRINTED = True


def _emit_headline_and_exit(signum=None, frame=None):
    if signum is not None:
        log("SIGALRM backstop fired — emitting headline and exiting")
    _print_headline_once()
    os._exit(0)


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
    # hard backstop: whatever happens (tunnel stall, slow compile), the
    # headline JSON line gets printed before the driver's external timeout.
    # The alarm sits well past the budget so a slow-tunnel workload 1 can
    # still land a real headline value (later workloads are budget-gated
    # and simply get skipped). SIGALRM alone is not enough — Python runs
    # signal handlers between bytecodes, and a main thread blocked inside a
    # jax runtime call (stalled device tunnel) never reaches one — so a
    # daemon Timer thread does the same emit from outside the GIL-holder.
    if not (FULL or SMOKE):
        signal.signal(signal.SIGALRM, _emit_headline_and_exit)
        signal.alarm(int(BUDGET + 150))
        import threading
        t = threading.Timer(BUDGET + 165, _emit_headline_and_exit, args=(0,))
        t.daemon = True
        t.start()

    # persistent compilation cache: the fused multi-round scans are
    # compile-heavy; repeated bench runs (driver rounds, warm-ups after
    # restarts) reuse the executables
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import gpboost_tpu as gpb

    ref = load_reference()
    matrix = {"device": None, "budget_s": None if (FULL or SMOKE) else BUDGET,
              "workloads": {}}
    if os.environ.get("BENCH_ONLY", ""):
        # single-workload child: keep the already-recorded workloads so the
        # matrix file stays cumulative
        try:
            with open(os.path.join(HERE, "BENCH_MATRIX.json")) as f:
                matrix["workloads"] = json.load(f).get("workloads", {})
        except Exception:
            pass
    try:
        matrix["device"] = str(jax.devices()[0])
    except Exception:
        pass

    def flush_matrix():
        if SMOKE:       # smoke timings are meaningless — don't persist them
            return
        with open(os.path.join(HERE, "BENCH_MATRIX.json"), "w") as f:
            json.dump(matrix, f, indent=1)

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
        flush_matrix()
        log(f"[bench] {key}: {w}")
        return w

    _only = os.environ.get("BENCH_ONLY", "")
    if not _only:      # a BENCH_ONLY child re-runs ONE matrix workload
        # ---- 1. headline: Vecchia GP fit n=100k (ALWAYS runs) -----------------
        log("workload 1: vecchia fit n=100k")
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
        _HEADLINE["value"] = round(fit_time, 3)
        _HEADLINE["vs_baseline"] = head.get("vs_baseline_1core", None)
        _print_headline_once()     # to stdout NOW — a later kill cannot lose it
        del model

    # ---- remaining workloads: cheapest first, each gated on the budget ----
    def w_glmm():
        # RE-scale grouped Laplace GLMM: bernoulli, n=100k, q=1k. The
        # engine's jitted closures are per-instance, so the timed fit
        # reuses the SAME model with its fit state reset (the compiled
        # on-device L-BFGS run stays cached on the engine).
        gg, yg2 = sim_glmm()
        mg = gpb.GPModel(group_data=gg, likelihood="bernoulli_logit")
        mg.fit(y=yg2, params={"maxit": 50})                     # compile
        mg.reset_fit()
        t0 = time.time()
        mg.fit(y=yg2, params={"maxit": 50})
        el = time.time() - t0
        record("grouped_glmm_bernoulli_n100k_q1k_fit", el,
               maxit=50, num_it=int(mg.get_num_optim_iter()),
               note="RE-scale (q-dim) grouped Laplace engine, whole fit = "
                    "one on-device safeguarded L-BFGS dispatch — BASELINE "
                    "config #5 class; O(n) memory")

    def w_vl():
        # Vecchia-Laplace binary fit n=20k. Formulation: dense-precision
        # Cholesky on the MXU (f32). At this n the dense factorization is
        # ~0.2 s of systolic-array time per Newton step, while any
        # gather/CG pipeline is latency-bound on TPU (one data-dependent
        # gather ~3.5 ms) — dense IS the TPU-native scale choice here;
        # the matrix-free CG/SLQ engine takes over where n^2 won't fit.
        coords, yv = sim_vl()
        kw = dict(gp_coords=coords, cov_function="exponential",
                  gp_approx="vecchia", num_neighbors=20,
                  likelihood="bernoulli_probit",
                  matrix_inversion_method="cholesky", dtype="float32")
        mvl = gpb.GPModel(**kw)
        mvl.fit(y=yv, params={"maxit": 20,
                              "init_cov_pars": [1.0, 0.1]})     # compile
        mvl.reset_fit()
        t0 = time.time()
        mvl.fit(y=yv, params={"maxit": 20, "init_cov_pars": [1.0, 0.1]})
        record("vecchia_laplace_fit_n20k_binary", time.time() - t0,
               maxit=20, num_it=int(mvl.get_num_optim_iter()),
               note="dense-precision Laplace on the MXU (f32): scatter "
                    "densify + blocked Cholesky per Newton step; exact "
                    "log-dets (no SLQ)")

    def w_boost():
        # boosting-only throughput: n=200k p=50, 31 and 255 leaves
        Xb, yb = sim_boost()
        for leaves in (31, 255):
            if remaining() < (60 if leaves == 31 else 90):
                log(f"skipping boosting leaves={leaves} (budget)")
                matrix["workloads"][
                    f"boosting_n200k_p50_leaves{leaves}_20rounds"] = {
                        "skipped": "budget"}
                flush_matrix()
                continue
            dsb = gpb.Dataset(Xb, label=yb)
            gpb.train({"objective": "regression", "num_leaves": leaves,
                       "learning_rate": 0.1, "verbose": 0}, dsb,
                      num_boost_round=20)   # compile the 20-round scan
            dsb2 = gpb.Dataset(Xb, label=yb)
            t0 = time.time()
            gpb.train({"objective": "regression", "num_leaves": leaves,
                       "learning_rate": 0.1, "verbose": 0}, dsb2,
                      num_boost_round=20)
            el = time.time() - t0
            record(f"boosting_n200k_p50_leaves{leaves}_20rounds", el,
                   rounds=20, rounds_per_s=round(20 / el, 2),
                   note="fused scan (all 20 rounds in one dispatch) over "
                        "leaf-partitioned histogram growth: cost scales "
                        "with sum-of-smaller-child sizes, not leaves*n")

    def w_lagab():
        # LaGaBoost: binary spatial GPBoost, 10 rounds, n=20k. GP part:
        # dense-precision Vecchia-Laplace on the MXU (f32) — the ONLY
        # Laplace formulation whose executable this stack's remote
        # compiler survives (the iterative Vecchia-Laplace and FITC
        # n=50k graphs both crash the TPU worker during compilation;
        # n^2 dense does not fit HBM at n=50k). The reference baseline
        # for this n is measured by bench_reference.py with the same
        # generator (lagaboost_binary_vecchia_n20k_10rounds).
        coords, Xl, yl = sim_lagab(n=_scale(20_000))
        gpl = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                          gp_approx="vecchia", num_neighbors=20,
                          likelihood="bernoulli_probit",
                          matrix_inversion_method="cholesky",
                          dtype="float32")
        gpb.train({"objective": "binary", "learning_rate": 0.1,
                   "num_leaves": 31, "verbose": 0},
                  gpb.Dataset(Xl, label=yl),
                  num_boost_round=10, gp_model=gpl)             # compile
        # reset the GP fit state so the timed run repeats the full initial
        # covariance fit (the engine keeps the compiled scan executable)
        gpl.reset_fit()
        dsl = gpb.Dataset(Xl, label=yl)
        t0 = time.time()
        gpb.train({"objective": "binary", "learning_rate": 0.1,
                   "num_leaves": 31, "verbose": 0}, dsl,
                  num_boost_round=10, gp_model=gpl)
        record("lagaboost_binary_vecchia_n20k_10rounds", time.time() - t0,
               rounds=10, n=20_000,
               note="fused LaGaBoost scan: per round = Laplace dNLL/dF "
                    "gradient + tree + warm-started on-device GD cov "
                    "refit; includes the initial full covariance fit; "
                    "dense-MXU Laplace (f32)")

    def w_gpboost1000():
        # north-star #2: 1000-round GPBoost spatial train
        coords, X, yg = sim_gpboost()
        ROUNDS = 20 if SMOKE else 1000
        gp2 = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                          gp_approx="vecchia", num_neighbors=20,
                          dtype="float32")
        ds_w = gpb.Dataset(X, label=yg)
        # warm-up with the SAME GPModel instance and the fused-scan block
        # size (25): the compiled round-block caches on the engine, so the
        # timed run is compile-free. Booster/GP fit state resets per
        # train() call — the timed run still includes the initial fit.
        gpb.train({"objective": "regression", "learning_rate": 0.1,
                   "num_leaves": 31, "verbose": 0}, ds_w,
                  num_boost_round=25 if not SMOKE else ROUNDS,
                  gp_model=gp2)                                 # compile
        ds2 = gpb.Dataset(X, label=yg)
        t0 = time.time()
        gpb.train({"objective": "regression", "learning_rate": 0.1,
                   "num_leaves": 31, "verbose": 0}, ds2,
                  num_boost_round=ROUNDS, gp_model=gp2)
        record("gpboost_1000round_spatial_n10k", time.time() - t0,
               rounds=ROUNDS, n=10_000, num_leaves=31,
               note="fused scan: one device dispatch per 25-round block "
                    "(gradient + 31-leaf tree + warm-started GD cov "
                    "refit); includes the initial full covariance fit")

    # (name, fn, estimated cost in seconds on a warm compile cache).
    # lagaboost runs LAST: its iterative Vecchia-Laplace executable has
    # crashed the remote TPU worker during compilation before, and a dead
    # worker poisons every later in-process workload.
    queue = [
        ("grouped_glmm", w_glmm, 45),
        ("vecchia_laplace", w_vl, 60),
        ("boosting", w_boost, 150),
        ("gpboost_1000round", w_gpboost1000, 400),
        ("lagaboost", w_lagab, 120),
    ]
    for name, fn, est in queue:
        if _only and name != _only:
            continue
        if remaining() < est:
            log(f"skipping {name} (est {est}s > {remaining():.0f}s left)")
            matrix["workloads"].setdefault(name, {"skipped": "budget"})
            flush_matrix()
            continue
        log(f"workload: {name}")
        if FULL and not _only:
            # subprocess isolation: a TPU-worker crash (or OOM) in one
            # workload must not take down the rest of the matrix run. The
            # child shares the persistent compile cache and writes its own
            # workload into BENCH_MATRIX.json; the parent merges and
            # rewrites the accumulated matrix after each child.
            import subprocess
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "BENCH_ONLY": name, "BENCH_FULL": "1"},
                cwd=HERE, timeout=7200)
            if r.returncode != 0:
                log(f"workload {name} subprocess FAILED rc={r.returncode}")
                matrix["workloads"].setdefault(
                    name, {"error": f"subprocess rc={r.returncode}"})
            else:
                try:
                    with open(os.path.join(HERE, "BENCH_MATRIX.json")) as f:
                        matrix["workloads"].update(
                            json.load(f).get("workloads", {}))
                except Exception:
                    pass
            flush_matrix()
            continue
        try:
            fn()
        except Exception as e:                          # never lose headline
            log(f"workload {name} FAILED: {type(e).__name__}: {e}")
            matrix["workloads"][name] = {"error": f"{type(e).__name__}: {e}"}
            flush_matrix()

    _emit_headline_and_exit()


if __name__ == "__main__":
    main()
