from .data_parallel import make_sharded_grouped_lmm_step, make_mesh

__all__ = ["make_sharded_grouped_lmm_step", "make_mesh"]
