"""Multi-chip distribution over a jax.sharding.Mesh.

The reference's MPI communication (collectives + sparse P2P, SURVEY.md
section 2.11) maps here onto XLA collectives inside shard_map: allreduce ->
psum/pmin/pmax, allgatherv -> all_gather, particle/halo exchange ->
all_to_all/ppermute with static-padded buffers.
"""

from .mesh import make_mesh, rank_axis
from .global_tree import compute_global_octree, global_bounds
