from .mesh import (make_mesh, replicate, shard_leading_axis,
                   dp_constrain_batch, render_full_nerf_st_sharded,
                   render_full_nerf_sharded)
