"""gpboost_tpu — a TPU-native (JAX/XLA/Pallas) reimplementation of the GPBoost framework.

Combines tree-boosting with Gaussian-process and grouped-random-effects models:
    y = F(X) + Zb + xi                       (Gaussian likelihoods)
    y ~ p(y | m),  m = G(F(X) + Zb)          (non-Gaussian likelihoods)

Reference capability surface: fabsig/GPBoost (see /root/reference, README.md:19).
This is a from-scratch TPU-first design: dense/batched linear algebra on the MXU,
sharding via jax mesh + collectives, Pallas kernels for hot ops — not a port.

Double precision is load-bearing for covariance-parameter estimation (the reference
forces float64 throughout, include/GPBoost/type_defs.h:54-62), so x64 is enabled at
import. Individual compute paths may downcast where tolerances allow.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from .gp_model import GPModel  # noqa: E402
from .sklearn_utils import fitGPModel  # noqa: E402
from .boosting import Dataset, Booster, train  # noqa: E402
from .engine import cv, grid_search_tune_parameters  # noqa: E402
from .tuner import tune_pars_TPE_algorithm_optuna  # noqa: E402
from .sklearn import (GPBoostModel, GPBoostRegressor,  # noqa: E402
                      GPBoostClassifier, GPBoostRanker)
from .utils.log import Log, register_logger, set_log_level  # noqa: E402
from .utils.timer import (Timer, global_timer, device_trace,  # noqa: E402
                          annotate, step_annotation,
                          start_profiler_server,
                          save_device_memory_profile)
from . import callback  # noqa: E402
from .plotting import (plot_importance, plot_metric,  # noqa: E402
                       plot_split_value_histogram, plot_tree,
                       create_tree_digraph)

__all__ = [
    "GPModel",
    "fitGPModel",
    "Dataset",
    "Booster",
    "train",
    "cv",
    "grid_search_tune_parameters",
    "tune_pars_TPE_algorithm_optuna",
    "GPBoostModel",
    "GPBoostRegressor",
    "GPBoostClassifier",
    "GPBoostRanker",
    "callback",
    "plot_importance",
    "plot_metric",
    "plot_split_value_histogram",
    "plot_tree",
    "create_tree_digraph",
    "Log",
    "Timer",
    "global_timer",
    "device_trace",
    "annotate",
    "step_annotation",
    "start_profiler_server",
    "save_device_memory_profile",
    "register_logger",
    "set_log_level",
    "__version__",
]
