from .datasim import sim_rand_unif, qnorm

__all__ = ["sim_rand_unif", "qnorm"]
