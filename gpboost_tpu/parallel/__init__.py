from .data_parallel import make_sharded_grouped_lmm_step, make_mesh
from .vecchia_dp import make_sharded_vecchia_gd_step, shard_vecchia_inputs

__all__ = ["make_sharded_grouped_lmm_step", "make_mesh",
           "make_sharded_vecchia_gd_step", "shard_vecchia_inputs"]
