"""Per-node geometric centers and sizes for traversal criteria.

Equivalent of the reference's nodeFpCenters / geo centers used by
OctreeNsView (reference: include/cstone/focus/source_center.hpp:146-168,
tree/octree.hpp:295-317), computed for all nodes in one vectorized pass.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..sfc.box import Box, center_and_size
from ..sfc.encode import HILBERT, sfc_ibox
from ..tree.octree import LinkedOctree, node_keys_and_levels

__all__ = ["node_geometry", "leaf_geometry"]


def node_geometry(
    tree: LinkedOctree, box: Box, curve: str = HILBERT
) -> Tuple[jax.Array, jax.Array]:
    """(centers, sizes) of every octree node, shape (cap_nodes, 3).

    Padded slots get the root geometry; they are never visited by
    traversals because they are unreachable through child_offsets.
    """
    start, _, level = node_keys_and_levels(tree)
    ibox = sfc_ibox(start, level, curve)
    centers, sizes = center_and_size(ibox, box, tree.prefixes.dtype)
    return centers, sizes


def leaf_geometry(
    leaves: jax.Array, n_leaf, box: Box, curve: str = HILBERT
) -> Tuple[jax.Array, jax.Array]:
    """(centers, sizes) of cornerstone leaves in leaf order, (cap_leaf, 3)."""
    from ..sfc.keys import max_tree_level, node_range, tree_level

    dt = leaves.dtype
    key = leaves[:-1]
    rng = leaves[1:] - key
    safe_rng = jnp.where(rng > 0, rng, node_range(dt, max_tree_level(dt)))
    level = tree_level(safe_rng)
    ibox = sfc_ibox(key, level, curve)
    return center_and_size(ibox, box, dt)
