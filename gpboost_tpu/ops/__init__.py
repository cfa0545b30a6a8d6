from .distances import pairwise_dist
from .cov_fcts import CovarianceFunction, SUPPORTED_COV_FUNCTIONS

__all__ = ["pairwise_dist", "CovarianceFunction", "SUPPORTED_COV_FUNCTIONS"]
