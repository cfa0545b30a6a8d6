"""Convenience wrappers (reference: fitGPModel in the R package / Python docs)."""

from .gp_model import GPModel


def fitGPModel(y=None, X=None, params=None, **kwargs):
    """Create and fit a GPModel in one call (R-package fitGPModel)."""
    model = GPModel(**kwargs)
    model.fit(y=y, X=X, params=params)
    return model
