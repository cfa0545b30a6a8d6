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
from .sklearn import (GPBoostModel, GPBoostRegressor,  # noqa: E402
                      GPBoostClassifier)

__all__ = [
    "GPModel",
    "fitGPModel",
    "Dataset",
    "Booster",
    "train",
    "cv",
    "grid_search_tune_parameters",
    "GPBoostModel",
    "GPBoostRegressor",
    "GPBoostClassifier",
    "__version__",
]
