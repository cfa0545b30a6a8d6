"""Test configuration: run on CPU with 8 virtual devices so multi-chip sharding
paths are exercised on a single host (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip)."""

import os

# Force CPU with 8 virtual devices. The ambient environment pins JAX_PLATFORMS
# to the TPU platform AND its sitecustomize overrides jax's platform config at
# interpreter startup, so both the env var and the jax.config update below are
# required to actually land on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the Laplace-engine graphs (nested autodiff
# through while_loops) are compile-heavy; caching makes repeated test runs
# compile-free. The cache is keyed by a host-CPU fingerprint — XLA:CPU AOT
# artifacts bake in machine features (+prefer-no-scatter etc.), and loading
# a cache written on a different host executes mismatched code (SIGILL /
# silent NaNs; this was the round-2 "full-suite segfault").
import hashlib  # noqa: E402
import platform  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _cpu_id = [ln for ln in _f if ln.startswith(("flags", "model name"))]
    _cpu_id = "".join(sorted(set(_cpu_id)))
except OSError:
    _cpu_id = platform.processor() or platform.machine()
_fp = hashlib.md5(_cpu_id.encode()).hexdigest()[:10]
_cache_dir = os.path.join(os.path.dirname(__file__), f".jax_cache_{_fp}")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gpboost_tpu.utils.datasim import sim_rand_unif, qnorm, r_matrix  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_jit_caches_between_modules():
    """Release compiled executables + live engine buffers after each test
    module. ~30 engine-heavy modules in one process otherwise accumulate
    jit caches and dense Laplace buffers until XLA's host allocator fails
    (historically a SIGSEGV at ~70% of the one-process run). The persistent
    on-disk compilation cache (above) keeps re-compilation cheap."""
    yield
    import gc
    gc.collect()
    jax.clear_caches()
    gc.collect()


# Tolerance tiers (R-package/tests/testthat/test_GPModel_gaussian_process.R:6-9)
TOLERANCE_ITERATIVE = 1e-1
TOLERANCE_LOOSE = 1e-2
TOLERANCE_MEDIUM = 1e-3
TOLERANCE_STRICT = 1e-5


@pytest.fixture(scope="session")
def gp_sim_data():
    """The deterministic dataset of test_GPModel_gaussian_process.R:43-75."""
    n = 100
    d = 2
    coords = r_matrix(sim_rand_unif(n * d, init_c=0.1), ncol=d)
    D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    sigma2_1 = 1.0
    rho = 0.1
    Sigma = sigma2_1 * np.exp(-D / rho) + np.eye(n) * 1e-20
    C = np.linalg.cholesky(Sigma)
    b_1 = qnorm(sim_rand_unif(n, init_c=0.8))
    eps = C @ b_1
    Z_SVC = r_matrix(sim_rand_unif(n * 2, init_c=0.6), ncol=2)
    b_2 = qnorm(sim_rand_unif(n, init_c=0.17))
    b_3 = qnorm(sim_rand_unif(n, init_c=0.42))
    eps_svc = C @ b_1 + Z_SVC[:, 0] * (C @ b_2) + Z_SVC[:, 1] * (C @ b_3)
    xi = qnorm(sim_rand_unif(n, init_c=0.1)) / 5.0
    X = np.column_stack([np.ones(n),
                         np.sin((np.arange(1, n + 1) - n / 2) ** 2 * 2 * np.pi / n)])
    beta = np.array([2.0, 2.0])
    cluster_ids = np.concatenate([np.ones(int(0.4 * n)), 2 * np.ones(int(0.6 * n))])
    coords_multiple = r_matrix(sim_rand_unif(n * d // 4, init_c=0.1), ncol=d)
    coords_multiple = np.vstack([coords_multiple] * 4)
    D_multiple = np.sqrt(
        ((coords_multiple[:, None, :] - coords_multiple[None, :, :]) ** 2).sum(-1))
    Sigma_multiple = sigma2_1 * np.exp(-D_multiple / rho) + np.eye(n) * 1e-10
    C_multiple = np.linalg.cholesky(Sigma_multiple)
    b_multiple = qnorm(sim_rand_unif(n, init_c=0.8))
    eps_multiple = C_multiple @ b_multiple
    return {
        "n": n, "coords": coords, "D": D, "eps": eps, "eps_svc": eps_svc,
        "xi": xi, "X": X, "beta": beta, "cluster_ids": cluster_ids,
        "Z_SVC": Z_SVC, "coords_multiple": coords_multiple,
        "eps_multiple": eps_multiple,
        "y": eps + xi,
    }


DEFAULT_OPTIM_PARAMS = dict(
    optimizer_cov="gradient_descent", lr_cov=0.1, use_nesterov_acc=True,
    acc_rate_cov=0.5, delta_rel_conv=1e-6, optimizer_coef="gradient_descent",
    lr_coef=0.1, convergence_criterion="relative_change_in_log_likelihood",
)

DEFAULT_OPTIM_PARAMS_FISHER = dict(
    optimizer_cov="fisher_scoring", delta_rel_conv=1e-6,
    optimizer_coef="gradient_descent", lr_coef=0.1,
    convergence_criterion="relative_change_in_log_likelihood",
)


@pytest.fixture
def default_optim_params():
    return dict(DEFAULT_OPTIM_PARAMS)


@pytest.fixture
def default_optim_params_fisher():
    return dict(DEFAULT_OPTIM_PARAMS_FISHER)
